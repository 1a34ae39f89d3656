"""Unit tests for the training-data ops layer (dedup / similarity / textstats
/ multimodal) over small crafted inputs.

Run under the session fixture's 4-CPU budget on purpose: the dedup pipelines
deadlocked at exactly this budget before the materialize + autoscaling-pool
fixes (engine/ops/dedup.py), so completion here is itself a regression gate.
"""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    )


@pytest.fixture(scope="module")
def crafted_docs(ray_session):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,                                   # 0
        base,                                   # 1 exact dup of 0
        base + " extra",                        # 2 near dup of 0 (high jaccard)
        "one two three four five six seven",    # 3 unrelated
        base.replace("gamma", "zzz"),           # 4 near dup, lower jaccard
        "",                                     # 5 empty
        base,                                   # 6 exact dup of 0
    ]
    return _docs_ds(texts)


def test_sorted_group_map_helpers(ray_session):
    """The map_groups replacements: typed empty blocks (no zero-column
    RefBundles from OUR operators), whole-block vs per-group semantics, and
    key co-location (a key's rows never split across fn calls)."""
    import ray.data

    from engine.ops.dedup import _quiet_map_groups, _sorted_group_map

    t = pa.table(
        {
            "k": pa.array([3, 1, 2, 1, 3, 1], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
        }
    )
    schema = pa.schema([("k", pa.int64()), ("n", pa.int64()), ("s", pa.int64())])

    calls = []

    def per_group(g: pa.Table) -> pa.Table:
        ks = np.unique(g["k"].to_numpy(zero_copy_only=False))
        calls.append(len(ks))
        return pa.table(
            {
                "k": pa.array([int(ks[0])], pa.int64()),
                "n": pa.array([g.num_rows], pa.int64()),
                "s": pa.array([int(pa.compute.sum(g["v"]).as_py())], pa.int64()),
            }
        )

    # _quiet_map_groups: EXACTLY one key per call
    got = (
        _quiet_map_groups(ray.data.from_arrow(t).repartition(4), "k", per_group, schema)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert list(zip(got["k"], got["n"], got["s"])) == [(1, 3, 120), (2, 1, 30), (3, 2, 60)]

    # _sorted_group_map: fn sees whole blocks but a key never splits; a
    # run-segmenting fn computes identical per-key results
    def whole_block(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k_s, v_s = k[order], v[order]
        first = np.r_[0, np.flatnonzero(np.diff(k_s)) + 1]
        n = np.diff(np.r_[first, len(k_s)])
        return pa.table(
            {
                "k": pa.array(k_s[first], pa.int64()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(np.add.reduceat(v_s, first), pa.int64()),
            }
        )

    got2 = (
        _sorted_group_map(ray.data.from_arrow(t).repartition(4), "k", whole_block, schema)
        .to_pandas()
        .groupby("k", as_index=False)
        .sum()  # a key is never split, so this sum folds nothing — asserted below
        .sort_values("k", ignore_index=True)
    )
    assert list(zip(got2["k"], got2["n"], got2["s"])) == [(1, 3, 120), (2, 1, 30), (3, 2, 60)]

    # many sort partitions, ONE key: sort-born empty partitions bypass the
    # map UDF entirely (zero-column passthrough — why the RefBundle warning
    # is handled by the engine/__init__ logging filter, not the wrapper);
    # every NON-empty block must be schema-typed and the result exact
    one_key = pa.table(
        {"k": pa.array([7] * 8, pa.int64()), "v": pa.array(range(8), pa.int64())}
    )
    out = _sorted_group_map(
        ray.data.from_arrow(one_key).repartition(6), "k", whole_block, schema
    )
    import ray as _ray

    blocks = [_ray.get(r) for r in out.to_arrow_refs()]
    assert all(b.schema.names == ["k", "n", "s"] for b in blocks if b.num_rows)
    tbl = out.to_pandas().groupby("k", as_index=False).sum()
    assert list(zip(tbl["k"], tbl["n"], tbl["s"])) == [(7, 8, 28)]


def test_exact_dedup(crafted_docs):
    from engine.ops.dedup import exact_dedup

    out = exact_dedup(crafted_docs).to_pandas().sort_values("doc_id", ignore_index=True)
    kept = dict(zip(out["doc_id"], out["n_copies"]))
    assert kept[0] == 3          # docs 0, 1, 6 collapse to lowest id 0
    assert 1 not in kept and 6 not in kept
    assert kept[2] == 1 and kept[3] == 1 and kept[4] == 1 and kept[5] == 1


def test_jaccard_and_minhash_agree(crafted_docs):
    from engine.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(crafted_docs, threshold_num=4, threshold_den=5).to_pandas()
    mh = minhash_lsh_pairs(crafted_docs, threshold_num=4, threshold_den=5).to_pandas()
    # MinHash verifies candidates with exact Jaccard -> subset of exact pairs;
    # on identical docs recall is guaranteed (identical signatures)
    exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
    mh_pairs = set(zip(mh["doc_a"], mh["doc_b"]))
    assert mh_pairs <= exact_pairs
    assert {(0, 1), (0, 6), (1, 6)} <= mh_pairs  # exact dups always found
    # doc 3 (unrelated) never pairs
    assert all(3 not in p for p in exact_pairs)


def test_simhash_identical_docs_distance_zero(crafted_docs):
    from engine.ops.dedup import simhash_pairs

    out = simhash_pairs(crafted_docs, max_hamming=3).to_pandas()
    got = {(a, b): h for a, b, h in zip(out["doc_a"], out["doc_b"], out["hamming"])}
    assert got[(0, 1)] == 0 and got[(0, 6)] == 0 and got[(1, 6)] == 0
    assert all(3 not in p for p in got)


def test_embedding_dup_pairs(ray_session):
    import ray.data

    from engine.ops.dedup import embedding_dup_pairs

    vecs = np.array(
        [[1.0, 0.0], [0.999, 0.01], [0.0, 1.0], [-1.0, 0.0]], dtype=np.float64
    )
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(4), pa.int64()), "embedding": pa.array(list(vecs))})
    )
    out = embedding_dup_pairs(ds, threshold=0.95).to_pandas()
    assert list(zip(out["doc_a"], out["doc_b"])) == [(0, 1)]


def test_embedding_dup_pairs_ivf_recall(ray_session):
    """IVF-bucketed near-dup (VERDICT r2 #2) vs exact all-pairs: every IVF
    pair exists in the exact result with the same cosine (precision exact),
    and recall over clustered synthetic dups is high."""
    import ray.data

    from engine.ops.dedup import embedding_dup_pairs, embedding_dup_pairs_ivf

    rng = np.random.default_rng(3)
    # 6 well-separated anchor directions, 30 jittered near-dups each
    anchors = rng.normal(size=(6, 16))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    vecs = np.repeat(anchors, 30, axis=0) + rng.normal(scale=0.03, size=(180, 16))
    ds = ray.data.from_arrow(
        pa.table(
            {"vec_id": pa.array(range(180), pa.int64()), "embedding": pa.array(list(vecs))}
        )
    )
    exact = embedding_dup_pairs(ds, threshold=0.95).to_pandas()
    ivf = embedding_dup_pairs_ivf(
        ds, threshold=0.95, n_centroids=6, probes=2, seed=42
    ).to_pandas()
    exact_map = {
        (a, b): c for a, b, c in zip(exact["doc_a"], exact["doc_b"], exact["cosine"])
    }
    assert len(exact_map) > 100  # scenario is non-trivial
    for a, b, c in zip(ivf["doc_a"], ivf["doc_b"], ivf["cosine"]):
        assert (a, b) in exact_map  # precision: IVF ⊆ exact
        assert abs(exact_map[(a, b)] - c) < 1e-9  # same float64 cosine
    assert len(ivf) / len(exact_map) >= 0.9  # recall on clustered dups


def test_brute_vs_ivf_topk_consistency(ray_session, tmp_path):
    """IVF with nprobe == n_centroids probes everything -> identical to brute,
    through BOTH query paths (partitioned-parquet index and streaming scan);
    partial probing (nprobe=2) stays a subset with exact scores."""
    import ray.data

    from engine.ops.similarity import IvfIndex, brute_topk, ivf_topk_scan

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(200, 16))
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(200), pa.int64()), "embedding": pa.array(list(mat))})
    )
    queries = rng.normal(size=(3, 16))
    brute = brute_topk(ds, queries, np.arange(3), k=5).to_pandas()

    ivf = IvfIndex(n_centroids=4, n_iter=5, seed=42).build(ds, str(tmp_path / "ivf"))
    for qi in range(3):
        ids, sims = ivf.topk(queries[qi], k=5, nprobe=4)
        b = brute[brute["query_id"] == qi].sort_values("rank")
        assert list(ids) == list(b["vec_id"])
        np.testing.assert_allclose(sims, b["cosine"].to_numpy(), rtol=1e-9)
        # partial probe: exact scores for whatever it returns
        pids, psims = ivf.topk(queries[qi], k=5, nprobe=2)
        got = {int(v): s for v, s in zip(pids, psims)}
        brute_all = brute_topk(ds, queries[qi : qi + 1], np.array([qi]), k=200).to_pandas()
        exact = dict(zip(brute_all["vec_id"], brute_all["cosine"]))
        for v, s in got.items():
            np.testing.assert_allclose(s, exact[v], rtol=1e-9)

    scan = ivf_topk_scan(ds, queries, np.arange(3), k=5, n_centroids=4, nprobe=4,
                         n_iter=5, seed=42).to_pandas()
    pd_brute = brute[["query_id", "rank", "vec_id"]].reset_index(drop=True)
    pd_scan = scan[["query_id", "rank", "vec_id"]].reset_index(drop=True)
    assert pd_brute.equals(pd_scan)


def test_textstats_batches():
    from engine.ops.textstats import fingerprint_batch, lang_id_batch, quality_batch

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["The quick brown fox and the lazy dog.", "el perro y el gato y la casa", ""]),
        }
    )
    q = quality_batch(batch)
    assert q.num_rows == 3
    assert q["n_tokens"][2].as_py() == 0
    lang = lang_id_batch(batch)
    assert lang["pred_lang"][0].as_py() == "en"
    fp1 = fingerprint_batch(batch)
    fp2 = fingerprint_batch(batch)
    assert fp1.equals(fp2)  # deterministic


def test_multimodal_featurize_plumbing(ray_session):
    import ray.data

    from engine.ops.multimodal import featurize, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(50, seed=1))
    out = featurize(ds, dim=8, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 50
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic across runs
    out2 = featurize(ray.data.from_arrow(synth_media_table(50, seed=1)), dim=8).to_pandas()
    a = np.stack(out.sort_values("media_id")["feature"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["feature"].to_numpy())
    np.testing.assert_array_equal(a, b)


def test_dedup_clusters_transitive_chain(ray_session):
    """A-B and B-C above threshold but A-C below: one 3-doc cluster (the
    pair list alone cannot express this). Oracle = brute-force union-find."""
    from engine.ops.dedup import dedup_clusters, ngram_jaccard_pairs

    base = ["w%02d" % i for i in range(12)]
    texts = [
        " ".join(base),                      # 0: A
        " ".join(base[1:] + ["x1"]),         # 1: B (near A)
        " ".join(base[2:] + ["x1", "x2"]),   # 2: C (near B, farther from A)
        "totally different words here now",  # 3: unrelated
        " ".join(base),                      # 4: exact dup of A
    ]
    ds = _docs_ds(texts)
    pairs = ngram_jaccard_pairs(ds, threshold_num=7, threshold_den=10, k=2).to_pandas()
    edges = set(map(tuple, pairs[["doc_a", "doc_b"]].itertuples(index=False)))
    parent = list(range(5))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for d in range(5):
        r = find(d)
        if any(find(o) == r for o in range(5) if o != d):
            want[d] = r

    import ray.data

    # VERDICT r2 #1: the driver must never materialize the edge list — no
    # to_arrow_refs / take_all / to_pandas on ANY dataset inside
    # dedup_clusters (labels + edges stay Datasets; driver sees only the
    # per-round changed-label count)
    calls = []
    orig = ray.data.Dataset.to_arrow_refs
    ray.data.Dataset.to_arrow_refs = lambda self, *a, **k: (
        calls.append(1) or orig(self, *a, **k)
    )
    try:
        got_df = dedup_clusters(ds, threshold_num=7, threshold_den=10, k=2).to_pandas()
    finally:
        ray.data.Dataset.to_arrow_refs = orig
    assert not calls, "dedup_clusters pulled blocks to the driver"
    got = dict(zip(got_df["doc_id"].tolist(), got_df["cluster_rep"].tolist()))
    assert got == want
    # the scenario must actually exercise transitivity: A-C edge absent
    assert (0, 2) not in edges and got.get(2) == 0


def test_asof_join_semantics(ray_session, tmp_path, monkeypatch):
    """Crafted as-of cases: latest-at-or-before wins, equal-date ties break
    by highest orderkey, order-after-event and orderless customers drop out
    (inner semantics)."""
    import os

    import pyarrow.parquet as pq

    from engine.ops import relational as rel

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    ts = lambda s: np.datetime64(s, "us")
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([ts("2024-01-10"), ts("2024-01-05"), ts("2024-01-01"), ts("2024-01-10")], pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 9], pa.int64()),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([100, 101, 102, 200, 300], pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 8, 9], pa.int64()),
            "o_orderdate": pa.array(
                [ts("2024-01-05"), ts("2024-01-05"), ts("2024-01-02"), ts("2024-01-01"), ts("2024-02-01")],
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
        }
    )
    pq.write_table(events, f"{sf}/events.parquet")
    pq.write_table(orders, f"{sf}/orders.parquet")
    out = rel.asof_join_events_orders(sf, num_buckets=2).to_pandas()
    got = {int(r.event_id): (int(r.o_orderkey), float(r.o_totalprice)) for r in out.itertuples()}
    assert got == {
        1: (101, 2.0),  # latest date 01-05; tie 100 vs 101 -> higher key
        2: (101, 2.0),  # o_orderdate == ts counts (<= semantics)
        # 3: no order at-or-before 01-01 -> dropped
        # 4: user 9's only order is AFTER the event -> dropped
    }


def test_sliding_window_semantics(ray_session, tmp_path):
    """Boundary cases: exactly-window-ago included (RANGE inclusive),
    same-timestamp peers counted on BOTH sides of the row, users isolated."""
    import os

    import pyarrow.parquet as pq

    from engine.ops import relational as rel

    sf = str(tmp_path / "sfw")
    os.makedirs(sf)
    ts = lambda s: np.datetime64(s, "us")
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array(
                [
                    ts("2024-01-01T10:00"), ts("2024-01-01T11:00"),  # u1: exactly 60min apart
                    ts("2024-01-01T11:00"),                          # u1: same-ts peer of 2
                    ts("2024-01-01T12:30"),                          # u1: outside window of 2,3
                    ts("2024-01-01T11:00"), ts("2024-01-01T09:00"),  # u2: isolated from u1
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0], pa.float64()),
        }
    )
    pq.write_table(events, f"{sf}/events.parquet")
    out = rel.sliding_window_events(sf, window_minutes=60, num_buckets=2).to_pandas()
    got = {int(r.event_id): (int(r.w_count), int(r.w_sum_c)) for r in out.itertuples()}
    assert got == {
        1: (1, 100),        # own row only
        2: (3, 700),        # 10:00 is exactly 60min ago -> included; + same-ts peer 3
        3: (3, 700),        # RANGE frame: same result as its same-ts peer
        4: (1, 800),        # 11:00 is 90min ago -> excluded
        5: (1, 1600),       # u2 at 11:00 sees nothing of u1; 09:00 is 120min ago
        6: (1, 3200),
    }


def test_range_join_event_pairs_semantics(ray_session, tmp_path):
    """Band boundaries: exactly-60-min gap included, beyond excluded,
    same-ts pair appears once (lower event_id first), users isolated."""
    import os

    import pyarrow.parquet as pq

    from engine.ops import relational as rel

    sf = str(tmp_path / "sfr")
    os.makedirs(sf)
    ts = lambda s: np.datetime64(s, "us")
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(
                [
                    ts("2024-01-01T10:00"), ts("2024-01-01T11:00"),  # u1: exactly 60min
                    ts("2024-01-01T12:01"),                          # u1: 61min after 2
                    ts("2024-01-01T10:30"), ts("2024-01-01T10:30"),  # u2: same-ts pair
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        }
    )
    pq.write_table(events, f"{sf}/events.parquet")
    out = rel.range_join_event_pairs(sf, minutes=60, num_buckets=2).to_pandas()
    got = {(int(r.event_a), int(r.event_b)): int(r.gap_us) for r in out.itertuples()}
    assert got == {
        (1, 2): 3_600_000_000,  # exactly 60 min: included
        (4, 5): 0,              # same-ts pair: once, lower event_id first
    }  # (2,3) 61 min and (1,3) 121 min are beyond the band; users isolated


def _write_sf(tmp_path, **tables):
    import os

    import pyarrow.parquet as pq

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    for name, tbl in tables.items():
        pq.write_table(tbl, f"{sf}/{name}.parquet")
    return sf


def test_top_orders_per_customer_ranks_and_ties(ray_session, tmp_path):
    """Grouped top-k: price desc, orderkey-asc tie-break, short groups kept."""
    from engine.ops import relational as rel

    orders = pa.table(
        {
            "o_orderkey": pa.array([5, 2, 3, 4, 1, 9], pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
            "o_totalprice": pa.array([10.0, 10.0, 9.0, 8.0, 7.0, 1.5], pa.float64()),
        }
    )
    sf = _write_sf(tmp_path, orders=orders)
    out = rel.top_orders_per_customer(sf, k=3).to_pandas()
    rows = [tuple(map(int, r)) for r in out[["o_custkey", "rk", "o_orderkey", "price_c"]].to_numpy()]
    assert rows == [
        (1, 1, 2, 1000),  # tie at 10.00 -> lower orderkey first
        (1, 2, 5, 1000),
        (1, 3, 3, 900),
        (2, 1, 9, 150),   # group smaller than k survives
    ]


def test_distinct_users_daily_dedups_within_day(ray_session, tmp_path):
    from engine.ops import relational as rel

    ts = lambda s: np.datetime64(s, "us")
    events = pa.table(
        {
            "ts": pa.array(
                [ts("2024-01-01T03:00"), ts("2024-01-01T17:59"), ts("2024-01-01T09:00"),
                 ts("2024-01-02T00:00"), ts("2024-01-02T23:59")],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 8, 7, 7], pa.int64()),
        }
    )
    sf = _write_sf(tmp_path, events=events)
    out = rel.distinct_users_daily(sf).to_pandas()
    got = {str(r.day)[:10]: int(r.n_users) for r in out.itertuples()}
    assert got == {"2024-01-01": 2, "2024-01-02": 1}


def test_grouped_price_quantiles_nearest_rank_lower(ray_session, tmp_path):
    """Exact rank formula ((n-1)*q)//100 over a value-count histogram,
    including duplicate-value collapse."""
    from engine.ops import relational as rel

    lineitem = pa.table(
        {
            "l_returnflag": pa.array(["A"] * 4 + ["B"] * 4, pa.string()),
            "l_extendedprice": pa.array([1.0, 2.0, 3.0, 4.0, 1.0, 1.0, 1.0, 2.0], pa.float64()),
        }
    )
    sf = _write_sf(tmp_path, lineitem=lineitem)
    out = rel.grouped_price_quantiles(sf).to_pandas().set_index("l_returnflag")
    a, b = out.loc["A"], out.loc["B"]
    # A: cents [100,200,300,400]; ranks p50=(3*50)//100=1, p90=2, p99=2
    assert (int(a.n), int(a.p50_c), int(a.p90_c), int(a.p99_c)) == (4, 200, 300, 300)
    # B: [100,100,100,200] -> histogram collapse; all quantiles at 100 except none
    assert (int(b.n), int(b.p50_c), int(b.p90_c), int(b.p99_c)) == (4, 100, 100, 100)


def test_customers_without_orders_cutoff(ray_session, tmp_path):
    from engine.ops import relational as rel

    ts = lambda s: np.datetime64(s, "us")
    customer = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_name": pa.array(["a", "b", "c"], pa.string()),
            "c_acctbal": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array([ts("2001-06-01"), ts("1999-06-01")], pa.timestamp("us")),
        }
    )
    sf = _write_sf(tmp_path, customer=customer, orders=orders)
    out = rel.customers_without_orders(sf, cutoff="2000-01-01").to_pandas()
    # cust 1 has a recent order; cust 2's is pre-cutoff; cust 3 has none
    assert out["c_custkey"].tolist() == [2, 3]


def test_hash_buckets_wraparound_exact():
    """numpy uint64 wraparound == exact big-int arithmetic, incl. ids > 2^32."""
    from engine.ops.sampling import hash_buckets

    ids = np.array([0, 1, 42, 2**31, 2**33 + 7, 2**62 + 12345], dtype=np.int64)
    got = hash_buckets(ids)
    want = [((int(i) * 2654435761) % (2**32)) % 1000 for i in ids]
    assert got.tolist() == want


def test_hash_split_fraction_and_determinism(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from engine.ops.sampling import hash_split

    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    n = 5000
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(["x"] * n)}),
        f"{sf}/documents.parquet",
    )
    a = hash_split(sf, test_permille=100).to_pandas()
    b = hash_split(sf, test_permille=100).to_pandas()
    assert a.equals(b)
    frac = (a["split"] == "test").mean()
    assert 0.06 < frac < 0.14  # ~10% within hash noise
    assert ((a["bucket"] < 100) == (a["split"] == "test")).all()


def test_facet_counts_vs_naive(ray_session, tmp_path):
    """facet_counts == brute-force per-(query, source) matched-doc count."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from engine.build import build_index
    from engine.query import facet_counts
    from engine.tokenize import tokenize_text

    texts = ["alpha beta", "beta gamma", "gamma delta", "alpha", "epsilon", ""]
    sources = ["web", "web", "chat", "chat", "mail", "web"]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(sources),
        }
    )
    pq.write_table(tbl, f"{sf}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(
        ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"]),
        idx, id_col="doc_id", n_buckets=2, n_salts=1, hot_fraction=0.5,
    )
    items = [
        {"query_id": "QA", "text": "alpha gamma"},
        {"query_id": "QB", "text": "epsilon"},
        {"query_id": "QC", "text": "zzznope"},
    ]
    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "source"])
    out = facet_counts(idx, items, docs).to_pandas()
    got = {(r.query_id, r.source): int(r.n_docs) for r in out.itertuples()}
    want = {}
    for it in items:
        qterms = set(tokenize_text(it["text"]))
        for d, (t, s) in enumerate(zip(texts, sources)):
            if qterms & set(tokenize_text(t)):
                key = (it["query_id"], s)
                want[key] = want.get(key, 0) + 1
    assert got == want


def test_multimodal_resize_plumbing(ray_session):
    import ray.data

    from engine.ops.multimodal import ImageResizer, resize_images, synth_media_table

    tbl = synth_media_table(30, seed=2)
    out = resize_images(ray.data.from_arrow(tbl), out_w=8, out_h=4).to_pandas()
    n_images = sum(1 for k in tbl["kind"].to_pylist() if k == "image")
    assert len(out) == n_images
    assert all(len(p) == 8 * 4 for p in out["payload"])
    assert (out["width"] == 8).all() and (out["height"] == 4).all()
    # nearest-neighbor gather matches a hand computation for one row
    row = tbl.filter(
        __import__("pyarrow").compute.equal(tbl["kind"], "image")
    ).slice(0, 1)
    got = dict(zip(out["media_id"], out["payload"]))[row["media_id"][0].as_py()]
    w, h = row["width"][0].as_py(), row["height"][0].as_py()
    buf = np.frombuffer(row["payload"][0].as_py(), dtype=np.uint8)
    grid = np.zeros(h * w, dtype=np.uint8)
    grid[: min(len(buf), h * w)] = buf[: h * w]
    grid = grid.reshape(h, w)
    want = grid[(np.arange(4) * h) // 4][:, (np.arange(8) * w) // 8].tobytes()
    assert got == want


def test_multimodal_frame_sample_plumbing(ray_session):
    import ray.data

    from engine.ops.multimodal import sample_frames, synth_media_table

    tbl = synth_media_table(30, seed=3)
    out = sample_frames(ray.data.from_arrow(tbl), every=7).to_pandas()
    vids = {
        m: (n, p)
        for m, k, n, p in zip(
            tbl["media_id"].to_pylist(), tbl["kind"].to_pylist(),
            tbl["n_frames"].to_pylist(), tbl["payload"].to_pylist(),
        )
        if k == "video"
    }
    # every video contributes ceil(n_frames / 7) rows with the right slices
    got = out.groupby("media_id")
    assert set(out["media_id"]) == set(vids)
    for m, (nf, payload) in vids.items():
        rows = out[out["media_id"] == m].sort_values("frame_idx")
        assert list(rows["frame_idx"]) == list(range(0, nf, 7))
        fsize = max(len(payload) // nf, 1)
        for j, fr in zip(rows["frame_idx"], rows["frame"]):
            assert fr == payload[j * fsize : (j + 1) * fsize]


def test_multimodal_real_decode_is_marked(ray_session):
    from engine.ops.multimodal import FrameSampler, ImageResizer, MediaFeaturizer

    import pytest as _pytest

    for cls in (MediaFeaturizer, ImageResizer, FrameSampler):
        with _pytest.raises(NotImplementedError):
            cls(decode="real")


def test_jaccard_hot_shingle_cap(ray_session):
    """max_shingle_df drops stop-shingle runs inside the group body (run
    length == global df): docs related ONLY through the hot shingle stop
    pairing; near-identical docs still pair, their `common` reduced by
    exactly the dropped shingle."""
    import pyarrow as pa
    import ray.data

    from engine.ops.dedup import ngram_jaccard_pairs

    hot = "the quick brown"  # one 3-gram shared by ALL docs
    texts = [
        f"{hot} fox jumps high",          # 0: near-dup of 1
        f"{hot} fox jumps high today",    # 1
        f"{hot} entirely different words here",  # 2: only the hot shingle shared
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)})
    )
    exact = ngram_jaccard_pairs(ds, threshold_num=1, threshold_den=2).to_pandas()
    capped = ngram_jaccard_pairs(
        ds, threshold_num=1, threshold_den=2, max_shingle_df=2
    ).to_pandas()
    e = {(r.doc_a, r.doc_b): r.common for r in exact.itertuples()}
    c = {(r.doc_a, r.doc_b): r.common for r in capped.itertuples()}
    assert (0, 1) in e and (0, 1) in c
    assert c[(0, 1)] == e[(0, 1)] - 1  # hot shingle no longer counted
    assert all(p == (0, 1) for p in c)  # hot-only relations gone


def _events_sf(tmp_path, rows):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    ts = [pa.scalar(t, pa.timestamp("us")) for t in rows["ts"]]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array([t.as_py() for t in ts], pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array([1.0] * len(ts), pa.float64()),
            "props": pa.array(["{}"] * len(ts), pa.string()),
        }
    )
    pq.write_table(tbl, f"{sf}/events.parquet")
    return sf


def test_funnel_counts_order_sensitivity(ray_session, tmp_path):
    """u1 completes signup->view->purchase in order; u2 has all three but the
    purchase PRECEDES the view (stage 3 not reached); u3 only signs up."""
    import numpy as np

    from engine.ops.relational import funnel_counts

    d = np.datetime64("2024-01-01T00:00", "us")
    m = np.timedelta64(1, "m")
    sf = _events_sf(
        tmp_path,
        {
            "ts": [d, d + m, d + 2 * m, d, d + m, d + 2 * m, d],
            "user_id": [1, 1, 1, 2, 2, 2, 3],
            "event_type": [
                "signup", "view", "purchase",
                "signup", "purchase", "view",
                "signup",
            ],
        },
    )
    out = funnel_counts(sf).to_pandas()
    assert list(zip(out["stage_idx"], out["stage"], out["n_users"])) == [
        (1, "signup", 3),
        (2, "view", 2),
        (3, "purchase", 1),
    ]


def test_cohort_retention_offsets(ray_session, tmp_path):
    """u1 cohort day0 active days {0,2}; u2 cohort day0 active {0}; u3 cohort
    day2 active {2,3}; duplicate same-day events count once."""
    import numpy as np

    from engine.ops.relational import cohort_retention

    day = lambda k, h=0: np.datetime64("2024-01-01T00:00", "us") + np.timedelta64(
        k * 24 + h, "h"
    )
    sf = _events_sf(
        tmp_path,
        {
            "ts": [day(0), day(0, 5), day(2), day(0), day(2), day(3)],
            "user_id": [1, 1, 1, 2, 3, 3],
            "event_type": ["view"] * 6,
        },
    )
    out = cohort_retention(sf).to_pandas()
    got = [
        (str(r.cohort_day)[:10], int(r.day_offset), int(r.n_users))
        for r in out.itertuples()
    ]
    assert got == [
        ("2024-01-01", 0, 2),
        ("2024-01-01", 2, 1),
        ("2024-01-03", 0, 1),
        ("2024-01-03", 1, 1),
    ]


def test_sq8_topk_recall_vs_brute(ray_session, tmp_path):
    """SQ8 selection + exact re-rank: recall@10 vs brute >= 0.95 and every
    returned cosine is the EXACT float value (re-ranked), not a quantized
    approximation."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops.similarity import brute_topk, sq8_topk

    rng = np.random.default_rng(7)
    n, d = 600, 32
    mat = rng.normal(size=(n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    qv, qi = mat[:5], np.arange(5)
    b = brute_topk(ds, qv, qi, k=10).to_pandas()
    s = sq8_topk(ds, qv, qi, k=10).to_pandas()
    recalls = []
    for qid in range(5):
        bs = set(b[b.query_id == qid].vec_id)
        ss = set(s[s.query_id == qid].vec_id)
        recalls.append(len(bs & ss) / len(bs))
    assert np.mean(recalls) >= 0.95, recalls
    # exact re-rank: overlapping hits agree with brute to accumulation-order
    # ULPs (einsum vs matmul sum the same float64 products in different
    # order), far below any quantization error (~1e-2)
    m = b.merge(s, on=["query_id", "vec_id"], suffixes=("_b", "_s"))
    np.testing.assert_allclose(
        m["cosine_b"].to_numpy(), m["cosine_s"].to_numpy(), rtol=0, atol=1e-12
    )


def test_kmv_distinct_sketch(ray_session):
    """Below k distinct values the sketch is EXACT; above, the estimate is
    within ~3/sqrt(k) of truth and deterministic across block layouts
    (mergeability: per-batch k-minima union to the global k-minima)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.ops.sketch import kmv_distinct_shingles

    # 2 docs, 5 distinct 3-gram shingles total -> exact
    small = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b c d e", "c d e f g"]),
            }
        )
    )
    row = kmv_distinct_shingles(small).to_pandas()
    assert row["k"].iloc[0] == 5 and row["est"].iloc[0] == 5.0

    # ~2000 distinct shingles, far above k=256: estimate within 3/sqrt(k)
    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{rng.integers(0, 400)}" for _ in range(60)) for _ in range(80)]
    ds1 = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(80), pa.int64()), "text": pa.array(texts)})
    )
    import duckdb

    truth = duckdb.sql(
        "SELECT count(DISTINCT t1 || ' ' || t2 || ' ' || t3) FROM ("
        " SELECT doc_id, tok AS t1, lead(tok,1) OVER w AS t2, lead(tok,2) OVER w AS t3"
        " FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,"
        "       generate_subscripts(string_split(text, ' '), 1) AS i"
        "       FROM (SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") v(doc_id, text)))"
        " WINDOW w AS (PARTITION BY doc_id ORDER BY i)) WHERE t3 IS NOT NULL"
    ).fetchone()[0]
    est1 = kmv_distinct_shingles(ds1).to_pandas()["est"].iloc[0]
    assert abs(est1 - truth) / truth < 3 / np.sqrt(256), (est1, truth)
    # block-layout independence (mergeable partials): same estimate at 8 blocks
    est2 = kmv_distinct_shingles(ds1.repartition(8)).to_pandas()["est"].iloc[0]
    assert est1 == est2


def test_partitioned_sink_resume(ray_session, tmp_path):
    """Resumable partitioned sink: full write commits every bucket; after
    deleting two buckets' commit markers, a rerun rewrites ONLY those (other
    bucket files untouched — verified by mtime) and the readback is exact."""
    import os
    import shutil
    import time

    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.sinks import (
        completed_buckets,
        read_partitioned_parquet,
        write_partitioned_parquet,
    )

    n = 5000
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "val": pa.array(np.arange(n) * 3, pa.int64()),
        }
    )
    out = str(tmp_path / "sink")
    rep = write_partitioned_parquet(
        ray.data.from_arrow(tbl).repartition(4), out, "doc_id", num_buckets=16
    )
    assert rep["rows_written"] == n and len(completed_buckets(out)) == 16

    # invalidate two buckets (simulate a crash before their commit)
    for bk in (3, 7):
        shutil.rmtree(os.path.join(out, f"bucket={bk:05d}"))
    untouched = os.path.join(out, "bucket=00001")
    mtimes = {f: os.path.getmtime(os.path.join(untouched, f)) for f in os.listdir(untouched)}
    time.sleep(0.05)

    rep2 = write_partitioned_parquet(
        ray.data.from_arrow(tbl).repartition(4), out, "doc_id", num_buckets=16
    )
    assert rep2["buckets_skipped"] == 14 and rep2["buckets_committed_this_run"] == 2
    assert rep2["rows_written"] == sum(1 for i in range(n) if i % 16 in (3, 7))
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(untouched, f)) == m  # never rewritten

    back = read_partitioned_parquet(out).to_pandas().sort_values("doc_id", ignore_index=True)
    assert len(back) == n
    assert (back["val"].to_numpy() == back["doc_id"].to_numpy() * 3).all()


def test_partitioned_sink_duplicate_key_batches(ray_session, tmp_path):
    """Regression (ADVICE r2): two different blocks whose slice for a bucket
    has IDENTICAL key values and row count must not collide on file name —
    on-disk rows must equal reported rows, and every payload must survive."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.sinks import read_partitioned_parquet, write_partitioned_parquet

    # two 100-row blocks, every row key=5, different payloads
    t1 = pa.table(
        {
            "key": pa.array(np.full(100, 5), pa.int64()),
            "payload": pa.array(np.arange(100), pa.int64()),
        }
    )
    t2 = pa.table(
        {
            "key": pa.array(np.full(100, 5), pa.int64()),
            "payload": pa.array(np.arange(100, 200), pa.int64()),
        }
    )
    ds = ray.data.from_arrow([t1, t2])
    out = str(tmp_path / "dupsink")
    rep = write_partitioned_parquet(ds, out, "key", num_buckets=8)
    assert rep["rows_written"] == 200
    back = read_partitioned_parquet(out).to_pandas()
    assert len(back) == 200  # was 100 with content-only file names
    assert sorted(back["payload"].tolist()) == list(range(200))


def test_kmv_grouped_block_layout_independent(ray_session, tmp_path):
    """Grouped KMV (distinct users per day): mergeable partials — the answer
    is identical across block layouts, and for groups under k it is EXACT
    (equals the true distinct count)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    from engine.ops.sketch import kmv_distinct_by_group

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    rng = np.random.default_rng(11)
    n = 3000
    days = rng.integers(0, 3, size=n)
    users = rng.integers(0, 40, size=n)
    base = np.datetime64("2024-02-01T00:00", "us")
    tbl = pa.table(
        {
            "ts": pa.array(base + days * np.timedelta64(24, "h") + np.arange(n) % 7200,
                           pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
        }
    )
    pq.write_table(tbl, f"{sf}/events.parquet")
    out = kmv_distinct_by_group(sf, k=64).to_pandas()
    truth = {
        f"2024-02-0{d+1}": len(set(users[days == d])) for d in range(3)
    }
    assert len(out) == 3
    for r in out.itertuples():
        assert r.k_used == truth[r.day] and r.est == float(truth[r.day])  # < k: exact
    # same rows split across 6 files (events.parquet as a DIRECTORY — the
    # reader takes both layouts): partials merge to the identical sketch
    os.remove(f"{sf}/events.parquet")
    os.makedirs(f"{sf}/events.parquet")
    for i in range(6):
        pq.write_table(tbl.slice(i * 500, 500), f"{sf}/events.parquet/part{i}.parquet")
    out2 = kmv_distinct_by_group(sf, k=64).to_pandas()
    assert out.equals(out2)


def test_clean_corpus_chain(ray_session):
    """Composite prep chain: the short doc is gated out, the duplicate text
    keeps its lowest docID with n_copies=2, and redaction applies to the
    survivors only."""
    import pyarrow as pa
    import ray.data

    from engine.pipelines import clean_corpus

    texts = [
        "spark engine turns rows into vector columns fast",   # 0: kept, 2 hits
        "tiny",                                               # 1: gated (dl<5)
        "plain words that survive the quality gate easily",   # 2: kept
        "plain words that survive the quality gate easily",   # 3: dup of 2
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    )
    out = clean_corpus(ds).to_pandas()
    assert list(out["doc_id"]) == [0, 2]
    assert list(out["n_copies"]) == [1, 2]
    assert list(out["n_matches"]) == [2, 0]
    assert "[TOOL]" in out["text_clean"][0] and "spark" not in out["text_clean"][0]


def test_passage_dedup_window_semantics(ray_session):
    """Sub-document dedup: window-4 passages dedup across docs; keeper is the
    minimum (doc_id, passage_idx); trailing partials are separate passages."""
    from engine.ops.dedup import passage_dedup

    texts = [
        "a b c d e f g h",      # 0: passages [a b c d] [e f g h]
        "e f g h a b c d",      # 1: same two passages, swapped order
        "a b c d x",            # 2: dup head passage + partial [x]
        "x",                    # 3: partial equal to doc2's tail
    ]
    out = (
        passage_dedup(_docs_ds(texts), window=4)
        .to_pandas()
        .sort_values(["doc_id", "passage_idx"], ignore_index=True)
    )
    rows = {(r.doc_id, r.passage_idx): r.n_copies for r in out.itertuples()}
    # [a b c d] appears in docs 0/1/2 -> kept at (0, 0) with 3 copies
    # [e f g h] appears in docs 0/1 -> kept at (0, 1) with 2 copies
    # [x] appears in docs 2/3 -> kept at (2, 1) with 2 copies
    assert rows == {(0, 0): 3, (0, 1): 2, (2, 1): 2}


def test_tfidf_similar_pairs_vs_numpy(ray_session):
    """Distributed sparse all-pairs cosine == dense numpy tf-idf reference
    (same idf = ln(N/df), same L2 norm, rounded to 4)."""
    import re

    from engine.ops.similarity import tfidf_similar_pairs

    texts = [
        "apple banana apple cherry",
        "apple banana cherry",
        "dog cat mouse",
        "dog cat mouse dog",
        "apple dog zebra",
        "",
    ]
    got = (
        tfidf_similar_pairs(_docs_ds(texts), threshold=0.5, round_to=4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    # dense reference
    toks = [re.findall(r"[a-z0-9]+", t.lower()) for t in texts]
    vocab = sorted({w for t in toks for w in t})
    n = len(texts)
    df = {w: sum(w in set(t) for t in toks) for w in vocab}
    mat = np.zeros((n, len(vocab)))
    for i, t in enumerate(toks):
        for w in t:
            mat[i, vocab.index(w)] += 1
    for j, w in enumerate(vocab):
        if df[w]:
            mat[:, j] *= np.log(n / df[w])
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(nrm == 0, 1.0, nrm)
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            c = round(float(mat[a] @ mat[b]), 4)
            if c >= 0.5:
                want[(a, b)] = c
    got_pairs = {(r.doc_a, r.doc_b): r.cosine_r for r in got.itertuples()}
    assert set(got_pairs) == set(want)
    for k in want:
        assert got_pairs[k] == pytest.approx(want[k], abs=2e-4), k


def test_kmeans_train_matches_numpy_lloyd(ray_session):
    """Distributed Lloyd (broadcast centroids + per-batch partial sufficient
    statistics) == single-machine numpy Lloyd with the same seeded init and
    empty-cluster convention, independent of block layout."""
    import ray.data

    from engine.ops.similarity import kmeans_train

    rng = np.random.default_rng(3)
    n, d, k = 400, 8, 5
    mat = np.concatenate(
        [rng.normal(loc=c * 3.0, scale=0.5, size=(n // 4, d)) for c in range(4)]
    )
    ids = np.arange(len(mat), dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(list(mat))})
    ds = ray.data.from_arrow(tbl).repartition(3)  # multi-block on purpose

    got = kmeans_train(ds, k=k, n_iter=4, seed=7, init_sample=2048).to_pandas()

    # numpy reference: identical init (first init_sample rows in ds order ==
    # original order for a from_arrow dataset), identical update rule
    rng2 = np.random.default_rng(7)
    cent = mat[rng2.choice(len(mat), size=k, replace=False)].copy()
    for _ in range(4):
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        inertia = float(d2[np.arange(len(mat)), a].sum())
        counts = np.bincount(a, minlength=k)
        for c in range(k):
            if counts[c]:
                cent[c] = mat[a == c].mean(axis=0)
    got = got.sort_values("centroid_id", ignore_index=True)
    assert got["count"].to_numpy().tolist() == counts.tolist()
    assert got["inertia_r"].iloc[0] == pytest.approx(inertia, rel=1e-9)
    got_cent = np.stack(got["centroid"].to_numpy())
    np.testing.assert_allclose(got_cent, np.round(cent, 9), atol=1e-8)


def test_ngram_containment_asymmetric(ray_session):
    """Containment mode flags small-in-big inclusion pairs that the symmetric
    Jaccard threshold misses (|common|/min >= t vs |common|/union >= t)."""
    from engine.ops.dedup import ngram_jaccard_pairs

    big = "a b c d e f g h i j k l m n o p q r s t"
    small = "a b c d e f g"  # 5 of big's 3-gram shingles, tiny union share
    texts = [big, small, "x y z w v u t s"]
    ds = _docs_ds(texts)
    jac = ngram_jaccard_pairs(ds, 4, 5).to_pandas()
    cont = ngram_jaccard_pairs(ds, 4, 5, containment=True).to_pandas()
    assert len(jac) == 0  # union-based threshold misses it
    pairs = {(r.doc_a, r.doc_b) for r in cont.itertuples()}
    assert pairs == {(0, 1)}  # small's shingles are 100% inside big


def test_value_outliers_zscore_semantics(ray_session, tmp_path, monkeypatch):
    """Per-user z-score screen: flags exactly the events >= T population
    stddevs from that user's own mean; zero-variance users emit nothing."""
    import pyarrow.parquet as pq

    from engine.ops.relational import value_outliers

    vals_u1 = [10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 100.0]
    tbl = pa.table(
        {
            "event_id": pa.array(range(12), pa.int64()),
            "user_id": pa.array([1] * 10 + [2, 2], pa.int64()),
            "value": pa.array(vals_u1 + [5.0, 5.0], pa.float64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    out = value_outliers(str(d), threshold=2.5).to_pandas()
    # user 1: mean 19, sd = sqrt(sum((x-m)^2)/10) -> only the 100.0 event is
    # >= 2.5 sd out; user 2 has zero variance -> excluded entirely
    arr = np.array(vals_u1)
    z = (100.0 - arr.mean()) / arr.std()
    assert out["event_id"].tolist() == [9]
    assert out["z_r"].iloc[0] == pytest.approx(round(z, 6), abs=1e-9)


def test_grouped_quantile_sketch_error_bound(ray_session, tmp_path):
    """Log-bin quantile sketch: estimate is the bin lower edge, so it sits
    within a (1+eps) factor BELOW the exact nearest-rank-lower quantile, for
    every group and q — and is invariant to block layout (mergeable)."""
    import pyarrow.parquet as pq

    from engine.ops.sketch import grouped_quantile_sketch

    rng = np.random.default_rng(5)
    vals = np.abs(rng.lognormal(mean=2.0, sigma=1.0, size=4000)) + 0.001
    types = np.array(["a", "b"])[rng.integers(0, 2, 4000)]
    tbl = pa.table(
        {"event_type": pa.array(types), "value": pa.array(vals, pa.float64())}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    eps = 0.02
    out = grouped_quantile_sketch(str(d), qs=(50, 90, 99), eps=eps).to_pandas()
    assert len(out) == 6
    for r in out.itertuples():
        grp = vals[types == r.event_type]
        grp.sort()
        exact = grp[(len(grp) - 1) * r.q // 100]
        assert r.est_r <= exact * (1 + 1e-9)
        assert r.est_r >= exact / (1 + eps) * (1 - 1e-9)


def test_connected_components_random_graphs(ray_session):
    """Distributed min-label propagation vs a local union-find reference on
    random graphs of varying density (includes multi-hop chains — the
    O(diameter) convergence path)."""
    import ray.data

    from engine.ops.dedup import connected_components

    for seed, n_nodes, n_edges in ((1, 60, 30), (2, 80, 120), (3, 50, 49)):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        keep = a != b
        lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
        edges = pa.table(
            {"doc_a": pa.array(lo, pa.int64()), "doc_b": pa.array(hi, pa.int64())}
        )
        # local union-find reference
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(lo.tolist(), hi.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        want = {
            int(v): min(u for u in range(n_nodes) if find(u) == find(v))
            for v in set(lo.tolist()) | set(hi.tolist())
        }
        got_df = connected_components(
            ray.data.from_arrow(edges).repartition(3), num_partitions=4
        ).to_pandas()
        got = dict(zip(got_df["doc_id"].tolist(), got_df["cluster_rep"].tolist()))
        assert got == want, f"seed {seed}"


def test_connected_components_star_matches_and_beats_diameter(ray_session):
    """VERDICT r3 #8: method="star" (large-star/small-star contraction) —
    (a) identical output to hash_to_min on random graphs, (b) a 10,000-node
    PATH graph (diameter 9,999 — hash-to-min would need ~10k rounds) labels
    correctly within a 20-round cap: star contraction is O(log n) rounds and
    the built-in hash-to-min verification then exits in one stable round."""
    import ray.data

    from engine.ops.dedup import connected_components

    for seed, n_nodes, n_edges in ((1, 60, 30), (2, 80, 120)):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        keep = a != b
        edges = pa.table(
            {
                "doc_a": pa.array(np.minimum(a, b)[keep], pa.int64()),
                "doc_b": pa.array(np.maximum(a, b)[keep], pa.int64()),
            }
        )
        ref = connected_components(
            ray.data.from_arrow(edges).repartition(3), num_partitions=4
        ).to_pandas()
        star = connected_components(
            ray.data.from_arrow(edges).repartition(3), num_partitions=4,
            method="star",
        ).to_pandas()
        assert ref.equals(star), f"seed {seed}"

    n = 10_000
    path = pa.table(
        {
            "doc_a": pa.array(np.arange(n - 1, dtype=np.int64)),
            "doc_b": pa.array(np.arange(1, n, dtype=np.int64)),
        }
    )
    got = connected_components(
        ray.data.from_arrow(path), max_rounds=20, method="star"
    ).to_pandas()
    assert len(got) == n and set(got["cluster_rep"]) == {0}


def test_connected_components_nonconvergence_raises(ray_session):
    """ADVICE r3: a component whose diameter exceeds max_rounds must RAISE,
    not silently return wrong cluster_rep values (a 12-node path graph needs
    ~11 hash-to-min rounds; cap at 2)."""
    import ray.data

    from engine.ops.dedup import connected_components

    n = 12
    edges = pa.table(
        {
            "doc_a": pa.array(np.arange(n - 1, dtype=np.int64)),
            "doc_b": pa.array(np.arange(1, n, dtype=np.int64)),
        }
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ray.data.from_arrow(edges), max_rounds=2).to_pandas()
    # and with enough rounds the same graph converges to rep 0 everywhere
    got = connected_components(ray.data.from_arrow(edges), max_rounds=16).to_pandas()
    assert set(got["cluster_rep"]) == {0} and len(got) == n


def test_graph_ops_reject_negative_ids(ray_session):
    """ADVICE r3: negative node ids collide with the in-band -1 adjacency
    sentinels; connected_components and pagerank must raise, not corrupt."""
    import ray.data

    from engine.ops.dedup import connected_components, pagerank

    edges = pa.table(
        {
            "doc_a": pa.array([-3, 1], pa.int64()),
            "doc_b": pa.array([1, 2], pa.int64()),
        }
    )
    for fn in (connected_components, pagerank):
        with pytest.raises(Exception, match="nonnegative"):
            fn(ray.data.from_arrow(edges)).to_pandas()


def test_pricing_rollup_levels(ray_session, tmp_path):
    """ROLLUP(rflag, lstatus): finest rows exact, subtotal rows == sum of
    their finest children, grand total == sum of all; 'ALL' fills rolled-up
    key slots; cutoff filter applies to every level."""
    import os

    import pyarrow.parquet as pq

    from engine.ops import relational as rel

    sf = str(tmp_path / "sfr")
    os.makedirs(sf)
    ts = lambda s: np.datetime64(s, "us")
    li = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", "B", "B", "B"]),
            "l_linestatus": pa.array(["F", "O", "F", "F", "O"]),
            "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0, 100.0], pa.float64()),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0, 999.0], pa.float64()),
            "l_discount": pa.array([0.10, 0.00, 0.05, 0.00, 0.0], pa.float64()),
            "l_shipdate": pa.array(
                [ts("1998-01-01")] * 4 + [ts("1998-12-31")],  # last row cut off
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(li, f"{sf}/lineitem.parquet")
    out = rel.pricing_rollup(sf).to_pandas()
    got = {
        (r.rflag, r.lstatus): (int(r.sum_qty_c), int(r.revenue_c4), int(r.count_order))
        for r in out.itertuples()
    }
    # rev_c4 = price_cents * (100 - disc_cents)
    assert got[("A", "F")] == (100, 1000 * 90, 1)
    assert got[("A", "O")] == (200, 2000 * 100, 1)
    assert got[("B", "F")] == (700, 3000 * 95 + 4000 * 100, 2)
    assert got[("A", "ALL")] == (300, 1000 * 90 + 2000 * 100, 2)
    assert got[("B", "ALL")] == got[("B", "F")]
    assert got[("ALL", "ALL")] == (
        1000,
        1000 * 90 + 2000 * 100 + 3000 * 95 + 4000 * 100,
        4,
    )
    assert len(got) == 6  # 3 finest + 2 subtotal + 1 grand total


def test_running_totals_semantics(ray_session, tmp_path):
    """Per-user cumulative sums reset between users; ties break by event_id;
    fixed-point cents exact."""
    import os

    import pyarrow.parquet as pq

    from engine.ops import relational as rel

    sf = str(tmp_path / "sfrt")
    os.makedirs(sf)
    ts = lambda s: np.datetime64(s, "us")
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 7, 9, 9], pa.int64()),
            "ts": pa.array(
                [ts("2024-01-01"), ts("2024-01-02"), ts("2024-01-02"), ts("2024-01-01"), ts("2024-01-03")],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.25, 2.00, 0.50, 10.00, 0.01], pa.float64()),
        }
    )
    pq.write_table(ev, f"{sf}/events.parquet")
    out = rel.running_totals(sf, num_buckets=2).to_pandas()
    got = dict(zip(out["event_id"].astype(int), out["running_c"].astype(int)))
    # user 7: 125 -> (tie at 01-02 ordered by event_id) 325 -> 375
    # user 9 resets: 1000 -> 1001
    assert got == {1: 125, 2: 325, 3: 375, 4: 1000, 5: 1001}


def test_rrf_fuse_hand_computed():
    """RRF fusion: hand-checked scores, lexical-first add order, docID ties,
    one-sided docs, and the k cut."""
    import numpy as np

    from engine.ops.hybrid import rrf_fuse

    lex = np.array([5, 3, 9], dtype=np.int64)      # ranks 1,2,3
    dense = np.array([3, 7], dtype=np.int64)       # ranks 1,2
    d, s = rrf_fuse(lex, dense, k=10, c=60)
    want = {
        3: 1 / 62 + 1 / 61,   # both lists, lexical term first
        5: 1 / 61,
        7: 1 / 62,
        9: 1 / 63,
    }
    assert d.tolist() == sorted(want, key=lambda x: (-want[x], x))
    np.testing.assert_array_equal(
        s, np.array([want[x] for x in d.tolist()]).view(np.float64)
    )
    # exact-bits contract: both-lists sum equals the two-operand add
    assert s[0] == (1.0 / 62 + 1.0 / 61)
    # k cut + empty sides
    d2, _ = rrf_fuse(lex, dense, k=2, c=60)
    assert d2.tolist() == d.tolist()[:2]
    d3, s3 = rrf_fuse(np.empty(0, np.int64), dense, k=5)
    assert d3.tolist() == [3, 7] and s3[0] == 1.0 / 61
    d4, _ = rrf_fuse(np.empty(0, np.int64), np.empty(0, np.int64), k=5)
    assert len(d4) == 0


def test_role_transitions_hand_computed(ray_session):
    """Dialogue-flow Markov counts: hand-checked transitions + distinct-conv
    reach, a turn-index gap breaks adjacency."""
    import pyarrow as pa
    import ray.data

    from engine.ops.transcripts import role_transitions

    rows = [
        ("A", 0, "user"), ("A", 1, "assistant"), ("A", 2, "user"), ("A", 3, "assistant"),
        ("B", 0, "user"), ("B", 1, "assistant"), ("B", 2, "assistant"),
        ("C", 0, "user"), ("C", 2, "assistant"),  # gap: no transition
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
        }
    )
    out = role_transitions(ray.data.from_arrow(t), num_partitions=4).to_pandas()
    got = {
        (r.role_from, r.role_to): (int(r.n_transitions), int(r.n_convs))
        for r in out.itertuples()
    }
    assert got == {
        ("user", "assistant"): (3, 2),
        ("assistant", "user"): (1, 1),
        ("assistant", "assistant"): (1, 1),
    }


def test_chunk_documents_bruteforce(ray_session):
    """RAG chunker vs a per-doc Python reference: window starts every
    `stride` tokens while a window adds unseen tokens; one chunk when
    n <= window; no tail chunk fully contained in its predecessor;
    token-less docs emit nothing."""
    import ray.data

    from engine.ops.textstats import chunk_documents
    from engine.tokenize import tokenize_text

    W, S = 8, 5
    texts = [
        "a b c",                                        # n < W: 1 chunk
        " ".join(f"t{i}" for i in range(8)),            # n == W: 1 chunk
        " ".join(f"u{i}" for i in range(9)),            # n = W+1: 2 chunks
        " ".join(f"v{i}" for i in range(13)),           # W + S: 2 chunks exactly
        " ".join(f"w{i}" for i in range(14)),           # W + S + 1: 3 chunks
        "",                                             # no tokens: nothing
        "!!! ???",                                      # tokenizes to nothing
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        chunk_documents(ray.data.from_arrow(tbl), window=W, stride=S)
        .to_arrow_refs()
    )
    import ray as _ray

    got = pa.concat_tables([t for t in _ray.get(got) if t.num_rows]).to_pylist()
    got.sort(key=lambda r: (r["doc_id"], r["chunk_idx"]))

    want = []
    for d, tx in enumerate(texts):
        toks = tokenize_text(tx)
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 if n <= W else -(-(n - W) // S) + 1
        for k in range(n_chunks):
            sl = toks[k * S : k * S + W]
            want.append(
                {
                    "doc_id": d,
                    "chunk_idx": k,
                    "n_tokens": len(sl),
                    "chunk_text": " ".join(sl),
                }
            )
    assert got == want
    # every token of every doc appears in at least one of its chunks
    covered = {}
    for r in got:
        covered.setdefault(r["doc_id"], set()).update(r["chunk_text"].split())
    for d, tx in enumerate(texts):
        toks = set(tokenize_text(tx))
        if toks:
            assert toks <= covered[d], d
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(ray.data.from_arrow(tbl), window=4, stride=5)


def test_mmr_topk_vs_bruteforce(ray_session):
    """MMR rerank vs a pure-Python greedy over the FULL corpus (fetch_k =
    corpus size, so candidate truncation can't differ): identical ids and
    scores; lam=1 equals plain cosine ranking."""
    import ray.data

    from engine.ops.similarity import brute_topk, mmr_topk

    rng = np.random.RandomState(7)
    n, d = 40, 8
    vecs = rng.randn(n, d)
    # two tight clusters: diversity must pull from both
    vecs[:20] = vecs[0] + 0.01 * rng.randn(20, d)
    vecs[20:] = vecs[20] + 0.01 * rng.randn(20, d)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(map(list, vecs)), pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    q = vecs[[0, 25]]
    qids = np.array([100, 101])
    lam, k = 0.5, 6
    got = mmr_topk(ds, q, qids, k=k, fetch_k=n, lam=lam).to_pylist()

    def unit(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    U, Q = unit(vecs), unit(q)
    want = []
    for qi, qid in enumerate(qids.tolist()):
        rel = Q[qi] @ U.T
        sel, alive = [], set(range(n))
        for rank in range(1, k + 1):
            best_j, best_s = None, -np.inf
            for j in sorted(alive):
                pen = max((float(U[j] @ U[s]) for s in sel), default=0.0)
                s = lam * rel[j] - (1 - lam) * (pen if sel else 0.0)
                if s > best_s + 1e-15:
                    best_j, best_s = j, s
            sel.append(best_j)
            alive.discard(best_j)
            want.append((qid, rank, best_j))
    assert [(r["query_id"], r["rank"], r["vec_id"]) for r in got] == want
    # diversity sanity: top-6 plain cosine stays in the query's own cluster,
    # MMR at lam=0.5 crosses clusters
    ids_q0 = {r["vec_id"] for r in got if r["query_id"] == 100}
    assert ids_q0 & set(range(20)) and ids_q0 & set(range(20, 40))
    # lam=1 == plain cosine order
    plain = brute_topk(ds, q, qids, k=k).to_pylist()
    lam1 = mmr_topk(ds, q, qids, k=k, fetch_k=n, lam=1.0).to_pylist()
    assert [(r["query_id"], r["vec_id"]) for r in lam1] == [
        (r["query_id"], r["vec_id"]) for r in plain
    ]
    with pytest.raises(ValueError, match="lam"):
        mmr_topk(ds, q, qids, k=k, lam=1.5)


def test_gopher_filter_brute(ray_session):
    """Composite Gopher gate vs a per-doc pure-Python recompute."""
    import re

    from engine.ops.textstats import STOPWORDS, gopher_filter

    texts = [
        " ".join(["the", "a"] + [f"word{i}" for i in range(30)]),  # passes
        "the a short doc",                               # too few tokens
        " ".join(["the", "a"] + ["word"] * 30),          # uniq ratio fails
        " ".join(["alpha beta gamma"] * 12),             # no stopwords
        " ".join(["the", "a"] + ["xy"] * 40),            # mean len < 3 (and uniq)
        " ".join(["the", "a"] + [f"{'w' * 14}{i}" for i in range(40)]),  # mean len > 10
        "",                                              # empty
    ]
    got = sorted(
        gopher_filter(_docs_ds(texts)).to_pandas()["doc_id"].tolist()
    )
    want = []
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        nt, nu = len(toks), len(set(toks))
        ns = sum(w in STOPWORDS for w in toks)
        sl = sum(len(w) for w in toks)
        if (
            20 <= nt <= 100_000
            and 30 * nt <= 10 * sl <= 100 * nt
            and ns >= 2
            and 1000 * nu >= 200 * nt
        ):
            want.append(i)
    assert got == want == [0]


def test_domain_mix_rates_integer_math():
    from engine.ops.sampling import domain_mix_rates

    counts = {"en": 800, "de": 100, "zh": 100}
    targets = {"en": 500, "de": 250, "zh": 250}
    rates = domain_mix_rates(counts, targets)
    # de/zh are binding (100 avail for 250permille): scale = 100*1e6//250
    scale = 100 * 1_000_000 // 250
    assert rates == {
        "en": min(1000, 500 * scale // (800 * 1000)),
        "de": min(1000, 250 * scale // (100 * 1000)),
        "zh": min(1000, 250 * scale // (100 * 1000)),
    }
    assert rates["de"] == rates["zh"] == 1000  # binding domains keep ~all
    assert rates["en"] == 250  # 800 avail, need 200 => 250 permille
    # degenerate inputs
    assert domain_mix_rates({}, targets) == {}
    assert domain_mix_rates(counts, {"en": 0}) == {}


def test_domain_mix_sample_respects_rates(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from engine.ops.sampling import domain_mix_rates, domain_mix_sample, hash_buckets

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    n = 4000
    langs = ["en"] * 3000 + ["de"] * 500 + ["zh"] * 500
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array(langs),
                "text": pa.array(["x"] * n),
            }
        ),
        f"{sf}/documents.parquet",
    )
    targets = {"en": 500, "de": 250, "zh": 250}
    out = domain_mix_sample(sf, target_permille=targets).to_pandas()
    rates = domain_mix_rates({"en": 3000, "de": 500, "zh": 500}, targets)
    # row-level gate: exactly the rows whose hash bucket < their lang's rate
    ids = np.arange(n, dtype=np.int64)
    buckets = hash_buckets(ids)
    thr = np.array([rates[l] for l in langs])
    assert sorted(out["doc_id"]) == ids[buckets < thr].tolist()
    # mixture realized within hash noise: en share near 50%
    share_en = (out["lang"] == "en").mean()
    assert 0.40 < share_en < 0.60


def test_dedup_incremental_brute(ray_session):
    """Window-overlap incremental dedup vs brute-force set logic, including
    token-poor new docs (no window) surviving."""
    from engine.ops.dedup import dedup_incremental

    base = " ".join(f"w{i}" for i in range(20))          # 20 tokens
    other = " ".join(f"v{i}" for i in range(20))
    texts = [
        base,                       # 0 old
        other,                      # 1 new: shares nothing -> kept
        base + " tail stuff here",  # 2 old
        "w5 " + base,               # 3 new: contains old windows -> dropped
        "short new doc",            # 4 old (even)
        "tiny",                     # 5 new, no 16-gram -> kept
        other + " " + base,         # 6 old
        other,                      # 7 new: shares windows with nothing old?
    ]
    # doc 7 == doc 1 (both new) but doc 6 (old) CONTAINS other's windows
    got = sorted(dedup_incremental(_docs_ds(texts), k=16).to_pandas()["doc_id"])

    def windows(t):
        toks = t.split()
        return {" ".join(toks[i : i + 16]) for i in range(len(toks) - 15)}

    old_w = set().union(*(windows(texts[i]) for i in range(0, len(texts), 2)))
    want = sorted(
        i for i in range(1, len(texts), 2) if not (windows(texts[i]) & old_w)
    )
    assert got == want
    assert 5 in got and 3 not in got and 1 not in got  # 1 dropped via doc 6


def test_lm_quality_buckets_brute(ray_session):
    """CCNet tercile bucketing vs a pure-Python recompute of the unigram LM,
    the fixed-point thresholds, and the labels."""
    import math
    import re
    from collections import Counter

    from engine.ops.textstats import lm_quality_buckets

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    langs = ["en", "de"]
    texts, doc_langs = [], []
    for i in range(40):
        k = int(rng.integers(5, 25))
        texts.append(" ".join(rng.choice(vocab, size=k)))
        doc_langs.append(langs[i % 2])
    texts.append("")  # token-less: must be excluded
    doc_langs.append("en")
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "lang": pa.array(doc_langs),
                "text": pa.array(texts),
            }
        )
    )
    got = (
        lm_quality_buckets(ds)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    toks = [
        [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w] for t in texts
    ]
    tc = Counter(w for ws in toks for w in ws)
    total = sum(tc.values())
    score_c, scores = {}, {}
    for i, ws in enumerate(toks):
        if not ws:
            continue
        s = round(sum(math.log(tc[w] / total) for w in ws) / len(ws), 6)
        scores[i] = s
        score_c[i] = round(s * 1e6)
    want_rows = []
    for lg in langs:
        sc = sorted(score_c[i] for i in score_c if doc_langs[i] == lg)
        n = len(sc)
        t_lo = sc[((n - 1) * 33) // 100]
        t_hi = sc[((n - 1) * 66) // 100]
        for i in sorted(score_c):
            if doc_langs[i] != lg:
                continue
            b = (
                "head"
                if score_c[i] >= t_hi
                else "middle" if score_c[i] >= t_lo else "tail"
            )
            want_rows.append((i, lg, scores[i], b))
    want_rows.sort()
    assert len(got) == len(want_rows) == 40  # empty doc excluded
    for (i, lg, s, b), row in zip(want_rows, got.itertuples(index=False)):
        assert (row.doc_id, row.lang, row.bucket) == (i, lg, b)
        assert abs(row.avg_logprob_r - s) < 1e-9
    # roughly thirds per lang
    en = got[got["lang"] == "en"]["bucket"].value_counts()
    assert set(en.index) == {"head", "middle", "tail"}


def test_lm_quality_buckets_sketch_mode_tolerance(ray_session):
    """mode="sketch" (the bounded-exchange 100-TB threshold path) must agree
    with exact mode everywhere except docs whose score falls inside the
    tercile boundary bin: scores/langs identical, label agreement bounded
    below, and disagreements confined to one sketch bin around each exact
    threshold (relative magnitude width eps)."""
    import ray.data

    from engine.ops.textstats import lm_quality_buckets

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(5, 40))))
        for _ in range(120)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "lang": pa.array(["en", "de"][i % 2] for i in range(len(texts))),
                "text": pa.array(texts),
            }
        )
    )
    # this synthetic corpus packs scores into ~0.3 logprob units, so use a
    # resolution finer than the default 0.02 (still bounded: ~10k bins for
    # the whole [-50, 0] logprob range)
    eps = 0.005
    exact = lm_quality_buckets(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    sk = (
        lm_quality_buckets(ds, mode="sketch", eps=eps)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert exact["doc_id"].equals(sk["doc_id"])
    assert exact["avg_logprob_r"].equals(sk["avg_logprob_r"])  # scoring unchanged
    agree = (exact["bucket"] == sk["bucket"]).to_numpy()
    assert agree.mean() >= 0.85, f"only {agree.mean():.2%} label agreement"
    # every disagreement sits within one sketch bin (absolute logprob width
    # eps) of an exact tercile threshold
    sc = np.round(exact["avg_logprob_r"].to_numpy() * 1e6).astype(np.int64)
    w = round(eps * 1e6)
    for lg in ("en", "de"):
        m = (exact["lang"] == lg).to_numpy()
        sl = np.sort(sc[m])
        n = len(sl)
        near_any = np.zeros(len(sc), dtype=bool)
        for pct in (33, 66):
            t = sl[((n - 1) * pct) // 100]
            near_any |= np.abs(sc - t) <= w
        bad = m & ~agree & ~near_any
        assert not bad.any(), exact[bad]


def test_training_mix_brute(ray_session):
    """The composed selection chain vs a pure-Python recompute: Gopher gate,
    min-id exact dedup, eval exclusion, 3-gram decontamination, and the
    integer mixture gate each exercised by a purpose-built doc."""
    import ray.data

    from engine.pipelines import training_mix

    base = ["the", "and"] + [f"word{i:02d}" for i in range(22)]

    def uniq_doc(tag: str) -> str:
        return " ".join(["the", "and"] + [f"{tag}x{i:02d}" for i in range(20)])

    docs = {
        100: (" ".join(base), "en"),  # eval-slice doc: excluded, but its
        #                               3-grams decontaminate trainers
        101: (uniq_doc("a"), "en"),  # clean en survivor
        102: (uniq_doc("b"), "en"),  # clean en, duplicated by 103
        103: (uniq_doc("b"), "en"),  # exact dup -> dropped (102 kept)
        104: ("short doc", "en"),  # fails Gopher min_tokens
        105: (" ".join(base[:5] + [f"cx{i:02d}" for i in range(18)]), "en"),
        #      shares "the and word00" etc. with the eval doc -> contaminated
        106: (uniq_doc("d"), "de"),  # clean de survivor
        107: (uniq_doc("e"), "de"),  # clean de survivor
    }
    ids = sorted(docs)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([docs[i][0] for i in ids]),
                "lang": pa.array([docs[i][1] for i in ids]),
            }
        )
    )
    got = training_mix(ds).to_pandas()

    # brute recompute: survivors then integer mixture rates + Knuth gate
    survivors = {101: "en", 102: "en", 106: "de", 107: "de"}
    counts = {"en": 2, "de": 2}
    targets = {"en": 400, "de": 150}
    scale = min(counts[d] * 1_000_000 // targets[d] for d in counts)
    rates = {
        d: min(1000, targets[d] * scale // (counts[d] * 1000)) for d in counts
    }
    want = []
    for i, lg in sorted(survivors.items()):
        b = (i * 2654435761) % (1 << 32) % 1000
        if b < rates[lg]:
            want.append((i, lg, b))
    assert list(zip(got["doc_id"], got["lang"], got["bucket"])) == want
    assert rates == {"en": 1000, "de": 375}  # the de gate is actually binding


def test_cms_heavy_hitters_overcount_and_rank(ray_session):
    """CMS invariants vs exact counts: estimates never under-count, exact
    heavy hitters surface in rank order, and the estimate is partitioning-
    independent (2-block run == 1-block run)."""
    from collections import Counter

    import ray.data

    from engine.ops.sketch import cms_heavy_hitters

    rng = np.random.default_rng(3)
    vocab = [f"t{i:03d}" for i in range(120)]
    weights = np.arange(len(vocab), 0, -1, dtype=np.float64)
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(10, 60)), p=weights))
        for _ in range(300)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    got = cms_heavy_hitters(
        ray.data.from_arrow(tbl), width=512, depth=4, topn=10
    ).to_pandas()
    exact = Counter(w for t in texts for w in t.split())
    # CMS only over-counts
    for r in got.itertuples(index=False):
        assert r.est >= exact[r.term], r.term
    # rank order is (est desc, term asc) and ranks are 1..n
    assert got["rank"].tolist() == list(range(1, len(got) + 1))
    keys = list(zip(-got["est"], got["term"]))
    assert keys == sorted(keys)
    # partitioning independence
    got2 = cms_heavy_hitters(
        ray.data.from_arrow(tbl).repartition(7), width=512, depth=4, topn=10
    ).to_pandas()
    assert got.equals(got2)


def test_near_dedup_incremental_brute(ray_session):
    """Cross-snapshot near-dup: new docs near an old doc (Jaccard >= 4/5 on
    3-gram shingles) drop; new-vs-new near-dups and unique docs survive."""
    from engine.ops.dedup import near_dedup_incremental

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,                                 # 0 old
        base + " extra",                      # 1 new: near-dup of old 0 -> drop
        "one two three four five six seven",  # 2 old
        "unrelated words entirely here now",  # 3 new: unique -> keep
        "completely different text block",    # 4 old
        "pair text aa bb cc dd ee ff gg",     # 5 new
        "fill fill fill fill fill",           # 6 old
        "pair text aa bb cc dd ee ff gg hh",  # 7 new: near-dup of NEW 5 -> keep
        "tiny",                               # 8 old
        "xy",                                 # 9 new: shingle-less -> keep
    ]
    got = sorted(
        near_dedup_incremental(
            _docs_ds(texts), threshold_num=4, threshold_den=5
        ).to_pandas()["doc_id"]
    )
    assert got == [3, 5, 7, 9]


def test_trim_repeated_windows_brute(ray_session):
    """Repeated-window removal vs brute force: corpus-wide AND within-doc
    repeats trim, overlapping spans merge, untouched/empty docs pass
    through, and surviving text is the space-joined kept tokens."""
    from engine.ops.textstats import trim_repeated_windows

    boiler = "standard legal boilerplate footer text here now"  # 7 tokens
    texts = [
        boiler + " unique alpha tail",                 # shares 7-gram w/ 1? k=4 below
        boiler + " different omega ending",
        "one two three four five six seven eight",     # unique -> untouched
        "rep rep rep rep rep rep rep rep",             # within-doc repeats
        "",                                            # empty
    ]
    k = 4
    got = (
        trim_repeated_windows(_docs_ds(texts), k=k, min_count=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    tok = [t.split() for t in texts]
    wins = {}
    for i, ws in enumerate(tok):
        for p in range(len(ws) - k + 1):
            wins.setdefault(" ".join(ws[p : p + k]), []).append((i, p))
    dup = {w: occ for w, occ in wins.items() if len(occ) >= 2}
    want = []
    for i, ws in enumerate(tok):
        cov = np.zeros(len(ws), dtype=bool)
        for occ in dup.values():
            for j, p in occ:
                if j == i:
                    cov[p : p + k] = True
        kept = [w for w, c in zip(ws, cov) if not c]
        want.append((i, len(ws), int(cov.sum()), " ".join(kept)))
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    # sanity on the shape of the scenario itself
    assert got.loc[0, "n_removed"] > 0          # boilerplate trimmed
    assert got.loc[2, "n_removed"] == 0         # unique doc untouched
    assert got.loc[2, "text_clean"] == texts[2]
    assert got.loc[3, "n_removed"] == len(tok[3])  # all-repeat doc emptied
    assert got.loc[3, "text_clean"] == ""
    assert got.loc[4, "n_tokens"] == 0


def test_vocab_drift_brute(ray_session):
    """Drift report vs brute force: per-slice df, smoothing, floor, rank
    order, and partitioning independence."""
    import math
    import re

    from engine.ops.textstats import vocab_drift

    rng = np.random.default_rng(11)
    old_vocab = ["alpha", "beta", "gamma", "shared1", "shared2"]
    new_vocab = ["delta", "epsilon", "shared1", "shared2", "riser"]
    texts = []
    for i in range(200):
        pool = old_vocab if i % 2 == 0 else new_vocab
        texts.append(" ".join(rng.choice(pool, size=8)))
    got = vocab_drift(_docs_ds(texts), topn=6, min_df=5).to_pandas()

    df_old, df_new = {}, {}
    for i, t in enumerate(texts):
        toks = set(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
        tgt = df_old if i % 2 == 0 else df_new
        for w in toks:
            tgt[w] = tgt.get(w, 0) + 1
    rows = []
    for w in set(df_old) | set(df_new):
        o, n = df_old.get(w, 0), df_new.get(w, 0)
        if o + n >= 5:
            rows.append((w, o, n, round(math.log((n + 1) / (o + 1)), 6)))
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    want = [(i + 1, *r) for i, r in enumerate(rows[:6])]
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    got2 = vocab_drift(_docs_ds(texts).repartition(5), topn=6, min_df=5).to_pandas()
    assert got.equals(got2)


def test_tool_chains_brute(ray_session):
    """Tool-chain mining vs brute force: filtered-sequence adjacency (turns
    without tools are skipped), per-pair chain and distinct-conv counts,
    multi-block independence."""
    from collections import Counter

    import ray.data

    from engine.ops.transcripts import tool_chains

    rows = []
    seqs = {
        "c1": ["search", "", "code", "search", "", "code"],
        "c2": ["code", "search", ""],
        "c3": ["", "", ""],
        "c4": ["search"],
    }
    for conv, tools in seqs.items():
        for i, tool in enumerate(tools):
            rows.append((conv, i, "assistant", f"turn {i}", tool, i))
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "tool": pa.array([r[4] for r in rows]),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
        }
    )
    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        got = tool_chains(ds, num_partitions=2).to_pandas()
        chains, convs = Counter(), {}
        for conv, tools in seqs.items():
            seq = [t for t in tools if t]
            for a, b in zip(seq, seq[1:]):
                chains[(a, b)] += 1
                convs.setdefault((a, b), set()).add(conv)
        want = sorted(
            (a, b, n, len(convs[(a, b)])) for (a, b), n in chains.items()
        )
        assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_profile_columns_brute(ray_session, tmp_path):
    """Profiler vs brute force incl. nulls and a duplicated value column."""
    import os

    import pyarrow.parquet as pq

    from engine.ops.relational import profile_columns

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    tbl = pa.table(
        {
            "a": pa.array([1, 2, 2, None, 3], pa.int64()),
            "b": pa.array(["x", None, None, "x", "y"], pa.string()),
            "c": pa.array([1.5, 1.5, 1.5, 1.5, 1.5], pa.float64()),
        }
    )
    pq.write_table(tbl, f"{sf}/events.parquet")
    got = profile_columns(sf, table="events").to_pandas()
    want = [("a", 5, 1, 3), ("b", 5, 2, 2), ("c", 5, 0, 1)]
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_sft_pairs_brute(ray_session):
    """SFT pair extraction vs brute force: only immediate user->assistant
    adjacency pairs, texts and token counts carried, multi-block safe."""
    import ray.data

    from engine.ops.transcripts import sft_pairs

    rows = [
        ("c1", 0, "user", "how do i scan", "", 0),
        ("c1", 1, "assistant", "use the fast scan", "", 1),
        ("c1", 2, "assistant", "follow-up not paired", "", 2),
        ("c1", 3, "user", "dangling user", "", 3),
        ("c2", 0, "assistant", "starts with assistant", "", 0),
        ("c2", 1, "user", "then user", "", 1),
        ("c2", 2, "assistant", "paired here", "t1", 2),
        ("c3", 0, "user", "gap next", "", 0),
        ("c3", 2, "assistant", "turn gap: not adjacent", "", 2),
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "tool": pa.array([r[4] for r in rows]),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
        }
    )
    got = sft_pairs(ray.data.from_arrow(tbl).repartition(3)).to_pandas()
    want = [
        ("c1", 1, "how do i scan", "use the fast scan", 4, 4),
        ("c2", 2, "then user", "paired here", 2, 2),
    ]
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_weak_label_brute(ray_session):
    """Weak labeling vs hand-computed votes: distinct-term votes, argmax
    with lexicographic ties, abstain rows dropped."""
    from engine.ops.textstats import weak_label

    texts = [
        "table scan join today",            # db 3
        "slow fast window",                 # perf 3
        "table slow",                       # db 1, perf 1 -> tie -> 'db'
        "spark vector stream part extras",  # infra 4
        "nothing matching here",            # abstain
        "table table table scan",           # distinct votes: db 2
    ]
    got = weak_label(_docs_ds(texts)).to_pandas().sort_values("doc_id", ignore_index=True)
    want = [
        (0, "db", 3),
        (1, "perf", 3),
        (2, "db", 1),
        (3, "infra", 4),
        (5, "db", 2),
    ]
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_trim_repeated_windows_property(ray_session):
    """Property test: random small-vocab corpora (repeats guaranteed) — the
    engine's distributed trim equals the brute-force window-coverage trim
    for every doc, across several seeds and partitionings."""
    from engine.ops.textstats import trim_repeated_windows

    for seed in (0, 1, 2, 3):
        rng = np.random.default_rng(seed)
        vocab = [f"t{i}" for i in range(6)]  # tiny vocab -> dense repeats
        texts = [
            " ".join(rng.choice(vocab, size=int(rng.integers(0, 24))))
            for _ in range(40)
        ]
        k = int(rng.integers(2, 5))
        got = (
            trim_repeated_windows(
                _docs_ds(texts).repartition(int(rng.integers(1, 5))), k=k, min_count=2
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        wins = {}
        tok = [t.split() for t in texts]
        for i, ws in enumerate(tok):
            for p in range(len(ws) - k + 1):
                wins.setdefault(" ".join(ws[p : p + k]), []).append((i, p))
        want = []
        for i, ws in enumerate(tok):
            cov = np.zeros(len(ws), dtype=bool)
            for occ in wins.values():
                if len(occ) < 2:
                    continue
                for j, p in occ:
                    if j == i:
                        cov[p : p + k] = True
            kept = [w for w, c in zip(ws, cov) if not c]
            want.append((i, len(ws), int(cov.sum()), " ".join(kept)))
        assert [tuple(r) for r in got.itertuples(index=False)] == want, (seed, k)


def test_pack_conversations_brute(ray_session):
    """Conversation packing vs brute force: per-conv token prefix sums,
    chunk boundaries, zero-token turns, multi-block conv reassembly."""
    import ray.data

    from engine.ops.transcripts import pack_conversations

    rows = [
        ("c1", 0, "a b c"),        # 3 tok, before 0 -> chunk 0
        ("c1", 1, "d e f g"),      # before 3 -> chunk 0
        ("c1", 2, "h i"),          # before 7 -> chunk 1 (budget 5)
        ("c1", 3, ""),             # before 9 -> chunk 1
        ("c2", 0, "x y z w v u"),  # before 0 -> chunk 0
        ("c2", 1, "q"),            # before 6 -> chunk 1
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array([r[2] for r in rows]),
            "tool": pa.array([""] * len(rows)),
            "ts": pa.array(range(len(rows)), pa.timestamp("us")),
        }
    )
    got = pack_conversations(
        ray.data.from_arrow(tbl).repartition(3), budget=5
    ).to_pandas()
    want = [
        ("c1", 0, 0, 3), ("c1", 1, 0, 4), ("c1", 2, 1, 2), ("c1", 3, 1, 0),
        ("c2", 0, 0, 6), ("c2", 1, 1, 1),
    ]
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_boilerplate_turns_brute(ray_session):
    """Prefix boilerplate detection vs brute force: distinct-conv threshold,
    prefix keying, whole-text mode."""
    import ray.data

    from engine.ops.transcripts import boilerplate_turns

    rows = [
        ("c1", 0, "hello how can i help with this"),
        ("c2", 0, "hello how can you do that thing"),
        ("c3", 0, "hello how can someone fix it"),
        ("c1", 1, "totally unique turn one"),
        ("c2", 1, "hello how can"),  # same prefix, 4th conv? no — c2 again
        ("c4", 0, "different opening entirely here"),
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array([r[2] for r in rows]),
            "tool": pa.array([""] * len(rows)),
            "ts": pa.array(range(len(rows)), pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    got = boilerplate_turns(ds, min_convs=3, prefix_tokens=3).to_pandas()
    assert [tuple(r) for r in got.itertuples(index=False)] == [
        ("hello how can", 3, 4)
    ]
    # whole-text mode: nothing repeats across 3 convs
    got2 = boilerplate_turns(ds, min_convs=3).to_pandas()
    assert len(got2) == 0


def test_embedding_drift_brute(ray_session, tmp_path):
    """Centroid-shift drift vs brute numpy: per-label per-slice means, L2
    distance, one-sided labels dropped."""
    import os

    import pyarrow.parquet as pq

    from engine.ops.similarity import embedding_drift

    rng = np.random.default_rng(13)
    n, d = 120, 8
    labels = rng.integers(0, 3, size=n)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    # label 2 exists only on the even (old) side -> must be dropped
    keep = ~((labels == 2) & (np.arange(n) % 2 == 1))
    ids = np.arange(n)[keep]
    labels, emb = labels[keep], emb[keep]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{sf}/embeddings.parquet",
    )
    got = embedding_drift(sf).to_pandas()
    want = []
    for lab in sorted(set(labels.tolist())):
        mo = emb[(labels == lab) & (ids % 2 == 0)]
        mn = emb[(labels == lab) & (ids % 2 == 1)]
        if not len(mo) or not len(mn):
            continue
        shift = np.sqrt(
            ((mn.astype(np.float64).mean(0) - mo.astype(np.float64).mean(0)) ** 2).sum()
        )
        want.append((lab, len(mo), len(mn), round(float(shift), 6)))
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert {r[0] for r in want} == {0, 1}  # label 2 dropped as one-sided


def test_tokenizer_fertility_brute(ray_session):
    """Fertility vs brute counts incl. the zero-whitespace-token group."""
    import re

    import pyarrow.compute as pc
    import ray.data

    from engine.ops.textstats import BPE_SPLIT_PATTERN, tokenizer_fertility

    texts = ["hello world's test", "unsplittable", "", "a b c d"]
    langs = ["en", "en", "zz", "de"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "lang": pa.array(langs),
                "text": pa.array(texts),
            }
        )
    )
    got = tokenizer_fertility(ds).to_pandas()
    want = []
    for lang in sorted(set(langs)):
        nb = nw = nd = 0
        for l, t in zip(langs, texts):
            if l != lang:
                continue
            nd += 1
            nb += int(pc.count_substring_regex(pa.array([t]), BPE_SPLIT_PATTERN)[0].as_py())
            nw += len(re.findall(r"\S+", t))
        fert = round(nb / nw, 6) if nw else 0.0
        want.append((lang, nd, nb, nw, fert))
    assert [tuple(r) for r in got.itertuples(index=False)] == want


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=0, max_value=10**12),
        min_size=1,
        max_size=4,
    ),
    targets=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=0, max_value=1000),
        min_size=1,
        max_size=5,
    ),
)
def test_domain_mix_rates_invariants(counts, targets):
    """Property test of the integer mixture-rate math: rates bounded, the
    binding domain keeps ~everything, realized counts never exceed targets'
    proportion of the implied output, and big-int inputs never overflow."""
    from engine.ops.sampling import domain_mix_rates

    rates = domain_mix_rates(counts, targets)
    live = {d for d, p in targets.items() if p > 0 and counts.get(d)}
    assert set(rates) == live
    for d, r in rates.items():
        assert 0 <= r <= 1000
    if not live:
        return
    scale = min((counts[d] * 1_000_000) // targets[d] for d in live)
    # the binding domain's unclamped rate is within one floor step of 1000
    binding = min(live, key=lambda d: (counts[d] * 1_000_000) // targets[d])
    unclamped = targets[binding] * scale // (counts[binding] * 1000)
    assert rates[binding] == min(1000, unclamped) and unclamped >= 999
    # expected kept mass tracks the target mixture: rate*count is
    # proportional to target (within integer-floor slack)
    for d in live:
        assert rates[d] * counts[d] * 1000 <= targets[d] * scale + counts[d] * 1000


def test_source_lang_mix_brute(ray_session, tmp_path):
    from collections import Counter

    import os

    import pyarrow.parquet as pq

    from engine.ops.relational import source_lang_mix

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    rng = np.random.default_rng(21)
    srcs = rng.choice(["s1", "s2"], size=200)
    langs = rng.choice(["en", "de", "zh"], size=200)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(200), pa.int64()),
                "source": pa.array(srcs),
                "lang": pa.array(langs),
                "text": pa.array(["x"] * 200),
            }
        ),
        f"{sf}/documents.parquet",
    )
    got = source_lang_mix(sf).to_pandas()
    cells = Counter(zip(srcs.tolist(), langs.tolist()))
    tot = Counter(srcs.tolist())
    want = sorted(
        (s, l, n, round(n / tot[s], 6)) for (s, l), n in cells.items()
    )
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert abs(got.groupby("source")["share_r"].sum() - 1.0).max() < 1e-5
