"""Mergeable cardinality sketches.

KMV (k-minimum-values, Bar-Yossef et al. 2002): keep the k smallest DISTINCT
64-bit hashes of a stream; the cardinality estimate is (k-1) / F(h_k) where
F(h_k) = h_k / 2^64 is the k-th minimum's normalized position. The sketch is
MERGEABLE (union = k smallest of the concatenation), making it the canonical
distributed distinct-count: each batch emits its local k-minima (k rows, not
its cardinality), partials union on the driver in O(k x blocks).

Unlike probabilistic-seeming sketches, KMV over a FIXED hash is fully
deterministic — and because the hash here is ``md5_lower64`` (bit-identical
to DuckDB ``md5_number_lower``), the exact same sketch, k-th minimum, and
estimate are restated by oracle SQL: a value-hash-checked APPROXIMATE
operator. Only the accuracy (~1/sqrt(k) relative error) is probabilistic;
the output is not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tokenize import md5_lower64


def _batch_kmins(strs: pa.Array | pa.ChunkedArray, k: int) -> np.ndarray:
    """k smallest distinct md5 hashes of a string array (uint64)."""
    h = np.unique(md5_lower64(strs))
    return h[:k] if len(h) > k else h


def kmv_distinct_shingles(
    ds,
    k: int = 256,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """KMV distinct-count of the corpus's word ``shingle_k``-gram shingle set.

    Per batch: shingle explode -> local k smallest distinct hashes (k rows
    leave each batch regardless of batch cardinality); driver: union of the
    tiny partials -> global k minima -> estimate. Returns one row
    (k, kth_min, est) with kth_min as the int64 two's-complement view and
    est = (k-1) * 2^64 / kth_min computed in IEEE double — the identical
    multiply/divide the oracle SQL performs, so even the APPROXIMATE estimate
    value-hash-matches bit-for-bit."""
    import ray

    from .dedup import _shingle_table

    def partial(batch: pa.Table) -> pa.Table:
        sh = _shingle_table(batch, shingle_k, id_col, text_col)
        mins = _batch_kmins(sh["shingle"], k)
        return pa.table({"h": pa.array(mins.view(np.int64))})

    parts = [
        t
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    empty = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "kth_min": pa.array([], pa.int64()),
            "est": pa.array([], pa.float64()),
        }
    )
    if not parts:
        return empty
    allh = np.unique(
        np.concatenate([t["h"].to_numpy(zero_copy_only=False) for t in parts]).view(
            np.uint64
        )
    )
    if len(allh) < k:
        # fewer than k distinct values: the sketch IS the exact distinct set
        return pa.table(
            {
                "k": pa.array([len(allh)], pa.int64()),
                "kth_min": pa.array([allh[-1].astype(np.int64)] if len(allh) else [], pa.int64()),
                "est": pa.array([float(len(allh))], pa.float64()),
            }
        )
    kth = allh[k - 1]
    est = (k - 1) * float(2**64) / float(kth)
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "kth_min": pa.array([kth.astype(np.int64)], pa.int64()),
            "est": pa.array([est], pa.float64()),
        }
    )


def kmv_distinct_by_group(
    sf_dir: str,
    k: int = 64,
    table: str = "events",
    group_expr: str = "day",
    key_col: str = "user_id",
) -> pa.Table:
    """GROUPED KMV distinct-count: approximate distinct ``key_col`` per day
    over the events table — the sketch as a mergeable grouped AGGREGATE
    (each batch emits at most k hash rows PER GROUP; the per-group union of
    partials is the exact same sketch a single pass would build, so block
    layout cannot change the answer).

    Exchange rows are bounded by groups x k x blocks — at a million groups
    still orders of magnitude below the raw event count a naive
    count-distinct shuffle would move. The per-group body unions partials,
    takes the k minima, and emits (day, k_used, kth_min, est): one IEEE
    multiply/divide, restated bit-for-bit by the oracle SQL."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=["ts", key_col])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        day = pc_.strftime(batch["ts"], format="%Y-%m-%d")
        keys = pc_.binary_join_element_wise(
            day, batch[key_col].cast(pa.int64()).cast(pa.string()), "\x1f"
        )
        # one md5 per DISTINCT (day, key) pair in the batch
        t = pa.table({"day": day, "h": pa.array(md5_lower64(keys).view(np.int64))})
        t = t.group_by(["day", "h"], use_threads=False).aggregate([])
        d = t["day"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h.view(np.uint64), d))
        d_s, h_s = d[order], h[order]
        first = np.empty(len(d_s), dtype=bool)
        if not len(d_s):
            return pa.table({"day": pa.array([], pa.string()), "h": pa.array([], pa.int64())})
        first[0] = True
        np.not_equal(d_s[1:], d_s[:-1], out=first[1:])
        rank = np.arange(len(d_s)) - np.maximum.accumulate(
            np.where(first, np.arange(len(d_s)), 0)
        )
        keep = rank < k  # k smallest per group in this batch
        return pa.table(
            {"day": pa.array(d_s[keep], pa.string()), "h": pa.array(h_s[keep])}
        )

    def finish(group: pa.Table) -> pa.Table:
        h = np.unique(group["h"].to_numpy(zero_copy_only=False).view(np.uint64))
        kk = min(k, len(h))
        kth = h[kk - 1]
        est = float(kk) if len(h) < k else (k - 1) * float(2**64) / float(kth)
        return pa.table(
            {
                "day": group["day"].slice(0, 1),
                "k_used": pa.array([kk], pa.int64()),
                "kth_min": pa.array([kth.astype(np.int64)], pa.int64()),
                "est": pa.array([est], pa.float64()),
            }
        )

    return pa.concat_tables(
        [
            t
            for t in ray.get(
                ds.map_batches(partial, batch_format="pyarrow")
                .groupby("day")
                .map_groups(finish, batch_format="pyarrow")
                .to_arrow_refs()
            )
            if t.num_rows
        ]
    ).sort_by("day")


def grouped_quantile_sketch(
    sf_dir: str,
    qs: tuple[int, ...] = (50, 90, 99),
    eps: float = 0.02,
):
    """Approximate grouped quantiles as a MERGEABLE log-bin histogram sketch —
    the bounded-memory scale path beside ``relational.grouped_price_quantiles``
    (whose exact value-count histogram is only mergeable because money is
    fixed-point): positive doubles hash to geometric bins
    ``bin = floor(ln(v) / ln(1+eps))``, so each group's sketch is at most a
    few hundred (bin, count) pairs regardless of row count, partials merge by
    addition (A1 partial-agg -> tiny groupby), and the rank-r estimate — the
    LOWER EDGE (1+eps)^bin of the bin containing rank ``((n-1)*q)//100`` —
    under-reads the true quantile by at most a factor (1+eps).

    Deterministic and cross-engine exact (same float expressions in the SQL
    oracle; bin-edge collisions would need ln(v)/ln(1+eps) to be an exact
    integer). Returns (event_type, q, bin, est_r), sorted.
    """
    import ray.data

    ln_base = np.log1p(eps)

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        dic = et.dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        labels = dic.dictionary
        v = batch["value"].to_numpy(zero_copy_only=False)
        if (v <= 0).any():
            raise ValueError("log-bin quantile sketch requires positive values")
        b = np.floor(np.log(v) / ln_base).astype(np.int64)
        packed = codes * (np.int64(1) << 32) + (b + (np.int64(1) << 20))
        u, counts = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "event_type": labels.take(pa.array((u >> np.int64(32)).astype(np.int64))),
                "bin": pa.array((u & ((np.int64(1) << 32) - 1)) - (1 << 20), pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        et = group["event_type"][0].as_py()
        b = group["bin"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        o = np.argsort(b)
        b, n = b[o], n[o]
        # partials of the same bin from different batches merge by addition
        first = np.empty(len(b), dtype=bool)
        first[0] = True
        np.not_equal(b[1:], b[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        b = b[starts]
        n = np.add.reduceat(n, starts)
        cum = np.cumsum(n)
        total = int(cum[-1])
        rows_q, rows_b = [], []
        for q in qs:
            rank = (total - 1) * q // 100  # 0-based nearest-rank-lower
            i = int(np.searchsorted(cum, rank + 1))
            rows_q.append(q)
            rows_b.append(int(b[i]))
        est = np.power(1.0 + eps, np.array(rows_b, dtype=np.float64))
        return pa.table(
            {
                "event_type": pa.array([et] * len(rows_q), pa.string()),
                "q": pa.array(rows_q, pa.int64()),
                "bin": pa.array(rows_b, pa.int64()),
                "est_r": pa.array(np.round(est, 6), pa.float64()),
            }
        )

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pyarrow")
        .sort(["event_type", "q"])
    )


def cms_heavy_hitters(
    ds,
    width: int = 1024,
    depth: int = 4,
    topn: int = 25,
    text_col: str = "text",
):
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005): the
    corpus's ``topn`` most frequent tokens ranked by their CMS ESTIMATE —
    ``est(t) = min over rows d of counter[d][cell(d, t)]`` with
    ``cell(d, t) = md5_lower64(f"{d}:{t}") % width``. Counters are pure
    sums, so the sketch is mergeable and the estimate is independent of
    partitioning; with the md5_number_lower-parity hash the WHOLE sketch —
    counters, estimates, ranking — is restated exactly by the oracle SQL
    (the KMV pattern: a value-hash-checked approximate operator; only
    accuracy is probabilistic, the output is not). Estimates only ever
    OVER-count (CMS guarantee), so true heavy hitters cannot be pushed out
    by light ones, only joined by collided ones.

    Shape: per-batch (row, cell) bincount partials -> one TINY groupby
    (<= depth x width cells cross the exchange per batch, regardless of
    batch size) -> the depth x width counter matrix broadcast once via
    ray.put -> per-batch distinct-term estimation with a local top-``topn``
    partial, so the final sort sees <= topn x blocks rows, never the
    vocabulary. Returns (rank, term, est) — est int64.
    """
    import ray

    from ..tokenize import _explode_tokens

    if width < 1 or depth < 1 or topn < 1:
        raise ValueError("require width, depth, topn >= 1")

    def cells_of(terms: pa.Array) -> np.ndarray:
        """(depth, n_terms) CMS cell ids, md5_number_lower-exact."""
        out = np.empty((depth, len(terms)), dtype=np.int64)
        for d in range(depth):
            salted = pa.array([f"{d}:{t}" for t in terms.to_pylist()])
            out[d] = (md5_lower64(salted) % np.uint64(width)).astype(np.int64)
        return out

    def partial(batch: pa.Table) -> pa.Table:
        flat, _parent, _dl = _explode_tokens(batch[text_col])
        if not len(flat):
            return pa.table(
                {
                    "d": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        dic = flat.dictionary_encode()
        counts = np.bincount(
            dic.indices.to_numpy(zero_copy_only=False),
            minlength=len(dic.dictionary),
        ).astype(np.int64)
        cells = cells_of(dic.dictionary)  # md5 per UNIQUE term only
        ds_, cs_, ns_ = [], [], []
        for d in range(depth):
            cnt = np.bincount(cells[d], weights=counts, minlength=width)
            nz = np.flatnonzero(cnt)
            ds_.append(np.full(len(nz), d, dtype=np.int64))
            cs_.append(nz.astype(np.int64))
            ns_.append(cnt[nz].astype(np.int64))
        return pa.table(
            {
                "d": pa.array(np.concatenate(ds_)),
                "cell": pa.array(np.concatenate(cs_)),
                "n": pa.array(np.concatenate(ns_)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["d", "cell"])
        .aggregate(Sum("n"))
        .to_pandas()  # bounded: <= depth x width rows by construction
    )
    counters = np.zeros((depth, width), dtype=np.int64)
    counters[agg["d"].to_numpy(), agg["cell"].to_numpy()] = agg["sum(n)"].to_numpy()
    ref = ray.put(counters)

    def estimate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cnts = ray.get(ref)
        flat, _parent, _dl = _explode_tokens(batch[text_col])
        if not len(flat):
            return pa.table(
                {"term": pa.array([], pa.string()), "est": pa.array([], pa.int64())}
            )
        terms = pc.unique(flat)
        cells = cells_of(terms)
        est = cnts[np.arange(depth)[:, None], cells].min(axis=0)
        t_np = np.asarray(terms.to_pylist(), dtype=object)
        order = np.lexsort((t_np, -est))[:topn]  # local partial top-n
        return pa.table(
            {
                "term": pa.array(t_np[order].tolist(), pa.string()),
                "est": pa.array(est[order], pa.int64()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        t = group["term"].to_numpy(zero_copy_only=False)
        e = group["est"].to_numpy(zero_copy_only=False)
        # a term estimated in several batches repeats with the SAME global
        # estimate — dedupe before the final rank
        tu, first = np.unique(t, return_index=True)
        eu = e[first]
        order = np.lexsort((tu, -eu))[:topn]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "term": pa.array(tu[order].tolist(), pa.string()),
                "est": pa.array(eu[order], pa.int64()),
            }
        )

    # the final rank runs over <= topn x blocks partial rows on ONE task
    return (
        ds.map_batches(estimate, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )
