"""End-to-end training-data + retrieval story: the full user journey chained
through real engine ops — synthesize -> quality-gate (Gopher) -> repeated-
substring trim -> exact dedup -> build the inverted index over the CLEANED
corpus -> BM25 query -> _rank_eval sanity. Every stage consumes the previous
stage's Dataset/table; nothing is mocked. Guards the cross-op contracts
(schemas, id threading, analyzer consistency) that per-op tests can't see.
"""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def raw_docs(ray_session):
    import ray.data

    rng = np.random.default_rng(99)
    vocab = [f"word{i}" for i in range(40)]
    boiler = "the a standard footer boilerplate appended everywhere uniformly"
    texts = []
    for i in range(120):
        body = " ".join(rng.choice(vocab, size=int(rng.integers(25, 60))))
        t = "the a " + body
        if i % 3 == 0:
            t = t + " " + boiler  # repeated-window contamination
        if i % 17 == 0:
            t = "tiny"  # fails the Gopher gate
        if i % 29 == 0 and i > 1:
            t = texts[1]  # exact duplicate
        texts.append(t)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


def test_clean_build_query_eval(ray_session, raw_docs, tmp_path):
    import ray.data

    from engine.build import build_index
    from engine.ops.dedup import exact_dedup
    from engine.ops.serving import rank_eval
    from engine.ops.textstats import gopher_filter, trim_repeated_windows
    from engine.query import Bm25Index

    # 1. Gopher gate: survivors only
    kept_ids = set(
        gopher_filter(raw_docs).to_pandas()["doc_id"].tolist()
    )
    assert 0 < len(kept_ids) < 120  # the gate actually fired

    # 2. trim repeated windows over the gated corpus
    def gate(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.is_in(b["doc_id"], value_set=pa.array(sorted(kept_ids))))

    gated = raw_docs.map_batches(gate, batch_format="pyarrow")
    trimmed = trim_repeated_windows(gated, k=6, min_count=2)
    tp = trimmed.to_pandas()
    assert (tp["n_removed"] > 0).any()  # boilerplate was actually trimmed
    assert set(tp["doc_id"]) == kept_ids

    # 3. exact dedup over the CLEANED text
    clean_ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(tp["doc_id"].to_numpy(), pa.int64()),
                "text": pa.array(tp["text_clean"].tolist(), pa.string()),
            }
        )
    )
    final_ids = set(exact_dedup(clean_ds).to_pandas()["doc_id"].tolist())
    assert final_ids <= kept_ids and len(final_ids) < len(kept_ids)

    # 4. build the index over the final corpus (id threading end to end)
    def keep_final(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.is_in(b["doc_id"], value_set=pa.array(sorted(final_ids))))

    idx = str(tmp_path / "clean_idx")
    build_index(
        clean_ds.map_batches(keep_final, batch_format="pyarrow"), idx,
        id_col="doc_id", n_buckets=8, n_salts=2,
    )
    bm = Bm25Index(idx)
    import json

    with open(f"{idx}/stats.json") as f:
        assert json.load(f)["n_docs"] == len(final_ids)

    # 5. query: hits come only from the cleaned survivor set
    doc, score = bm.topk("word0 word1", 10, rank_round=9)
    assert len(doc) > 0
    assert set(doc.tolist()) <= final_ids
    assert all(a >= b for a, b in zip(score, score[1:]))  # ranked

    # 6. rank_eval over the cleaned index: metrics well-formed
    ev = rank_eval(
        idx, [{"query_id": "q", "text": "word0 word1", "k": 10}], rank_round=9
    ).to_pandas()
    row = ev.iloc[0]
    assert 0.0 <= row.p_at_k_r <= 1.0 and 0.0 <= row.mrr_r <= 1.0
    assert row.n_hits <= row.n_relevant or row.n_relevant == 0
