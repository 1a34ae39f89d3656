"""Time-aware serving surfaces over a transcript index plus its RAW corpus
table: date-histogram aggregation of hits and recency-rescored ranking — the
Lucene/ES ``date_histogram`` sub-aggregation and ``rescore``/``function_score``
(decay) surfaces. The reference's analog is its post-candidate exact-scoring
window over assembled hits (CORE/core/DefaultStrucmotifRuntime.java:98-115):
a bounded second pass that refines a cheap first-pass ranking with a signal
the index itself doesn't carry.

Scale shape: the inverted index's docmap carries no timestamp, so both ops
join the BOUNDED per-query hit set (n_queries x window rows, never anything
corpus-sized) back to the raw parquet in ONE streamed ``map_batches`` filter
pass — the hit-key set is broadcast once via ``ray.put``, each task does a
vectorized ``is_in`` membership test on a packed (conv_id, turn_idx) key, and
only matched rows (plus one per-batch max-ts marker row that folds into the
global reference time) leave the pass. Work over the corpus is one pruned
3-column scan regardless of query count.

Determinism: day buckets are exact integer division of epoch-microseconds;
the recency multiplier is one divide of exactly-representable int64s
(``D / (D + age_us)``, both < 2^53) followed by one multiply — the identical
IEEE op sequence the DuckDB oracle performs, so combined scores match
bit-for-bit before any rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

DAY_US = 86_400_000_000
KEY_SEP = "\x1f"


def _hit_ts_lookup(
    corpus_path: str, keys: list[str]
) -> tuple[dict[str, int], int]:
    """One streamed pass over the raw corpus: return ``{packed_key: ts_us}``
    for the bounded ``keys`` set plus the global max ts (the rescore
    reference time). The key set rides the object store once; each task
    filters with a vectorized ``is_in`` and piggybacks its batch max ts as a
    single marker row (the same marker-row trick the keyword-extraction df
    pass uses), so the collected result is O(len(keys) + n_batches)."""
    key_arr = pa.array(sorted(set(keys)), pa.string())
    key_ref = ray.put(key_arr)

    def match(batch: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        key = pc.binary_join_element_wise(
            batch["conv_id"], pc.cast(batch["turn_idx"], pa.string()), KEY_SEP
        )
        ts_us = pc.cast(batch["ts"], pa.int64())
        mask = pc.is_in(key, value_set=ks)
        sub = pa.table(
            {"key": pc.filter(key, mask), "ts_us": pc.filter(ts_us, mask)}
        )
        if len(batch):  # marker row: batch max ts, keyed by the empty string
            marker = pa.table(
                {
                    "key": pa.array([""], pa.string()),
                    "ts_us": pa.array([pc.max(ts_us).as_py()], pa.int64()),
                }
            )
            sub = pa.concat_tables([sub, marker])
        return sub

    ds = ray.data.read_parquet(
        corpus_path, columns=["conv_id", "turn_idx", "ts"]
    ).map_batches(match, batch_format="pyarrow")
    ts_of: dict[str, int] = {}
    tref = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        for k, t in zip(b["key"].to_pylist(), b["ts_us"].to_pylist()):
            if k == "":
                tref = max(tref, t)
            else:
                ts_of[k] = t
    return ts_of, tref


def _hit_keys(bm, docs: np.ndarray) -> list[str]:
    """Pack each hit docID's (conv_id, turn_idx) docmap row into the join
    key — hydrated through the row-group-pruned doc store, so metadata reads
    scale with hit count, never the corpus."""
    if getattr(bm, "_docstore", None) is None:
        from engine.docstore import DocStore

        bm._docstore = DocStore(bm.index_dir)
    meta = bm._docstore.rows(docs, ["conv_id", "turn_idx"])
    return [
        f"{meta[int(d)][0]}{KEY_SEP}{meta[int(d)][1]}" for d in docs.tolist()
    ]


def hits_date_histogram(
    bm,
    corpus_path: str,
    queries: list[dict],
    k_docs: int = 50,
    rank_round: int | None = None,
) -> pa.Table:
    """ES ``date_histogram`` over search hits: per query, UTC-day bucket
    counts of the top-``k_docs`` BM25 hits' timestamps. Returns an arrow
    table (query_id, day_idx, n_hits) ordered by (query_id, day_idx) —
    integer columns only, no cross-engine float surface beyond the ranking.
    """
    per_q: dict[str, np.ndarray] = {}
    all_docs: list[np.ndarray] = []
    for q in queries:
        d, _ = bm.topk(q["text"], k_docs, rank_round=rank_round)
        per_q[q["query_id"]] = d
        all_docs.append(d)
    flat = np.unique(np.concatenate(all_docs)) if all_docs else np.empty(0, np.int64)
    if not len(flat):
        return pa.table(
            {
                "query_id": pa.array([], pa.string()),
                "day_idx": pa.array([], pa.int64()),
                "n_hits": pa.array([], pa.int64()),
            }
        )
    keys = _hit_keys(bm, flat)
    ts_of, _ = _hit_ts_lookup(corpus_path, keys)
    key_of = dict(zip(flat.tolist(), keys))
    qids, days, counts = [], [], []
    for qid in sorted(per_q):
        d = per_q[qid]
        if not len(d):
            continue
        day = np.array(
            [ts_of[key_of[int(x)]] // DAY_US for x in d.tolist()], dtype=np.int64
        )
        u, c = np.unique(day, return_counts=True)
        qids.extend([qid] * len(u))
        days.extend(u.tolist())
        counts.extend(c.tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "day_idx": pa.array(days, pa.int64()),
            "n_hits": pa.array(counts, pa.int64()),
        }
    )


def rescore_recency(
    bm,
    corpus_path: str,
    queries: list[dict],
    window: int = 50,
    decay_days: int = 30,
    rank_round: int | None = None,
) -> pa.Table:
    """Recency rescore window (the ES ``rescore`` + ``function_score`` decay
    surface): per query, take the top-``window`` BM25 hits, multiply each
    score by the rational decay ``D / (D + age_us)`` with ``D =
    decay_days`` of microseconds and ``age_us = max_corpus_ts - hit_ts``,
    and keep the per-query top-``k`` by (rounded combined desc, docID asc).

    ALL queries' windows share ONE corpus lookup pass (the bounded-hit-set
    join above); first-pass ranking uses the same deterministic contract as
    ``topk``, and the decay is exact-int division so the rescored floats are
    bit-identical to the SQL oracle's. Returns an arrow table
    (query_id, rank, doc_id, combined_r, score_r)."""
    first: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    all_docs: list[np.ndarray] = []
    for q in queries:
        d, s = bm.topk(q["text"], window, rank_round=rank_round)
        first[q["query_id"]] = (d, s)
        all_docs.append(d)
    flat = np.unique(np.concatenate(all_docs)) if all_docs else np.empty(0, np.int64)
    D = np.int64(decay_days) * DAY_US
    ts_of: dict[str, int] = {}
    tref = 0
    key_of: dict[int, str] = {}
    if len(flat):
        keys = _hit_keys(bm, flat)
        ts_of, tref = _hit_ts_lookup(corpus_path, keys)
        key_of = dict(zip(flat.tolist(), keys))
    qids, ranks, dids, combs, bases = [], [], [], [], []
    by_k = {q["query_id"]: q["k"] for q in queries}
    for qid in sorted(first):
        d, s = first[qid]
        if not len(d):
            continue
        ts = np.array(
            [ts_of[key_of[int(x)]] for x in d.tolist()], dtype=np.int64
        )
        age = tref - ts
        combined = s * (np.float64(D) / (D + age).astype(np.float64))
        key = (
            np.round(combined, rank_round)
            if rank_round is not None
            else combined
        )
        order = np.lexsort((d, -key))[: by_k[qid]]
        qids.extend([qid] * len(order))
        ranks.extend(range(1, len(order) + 1))
        dids.extend(d[order].tolist())
        combs.extend(combined[order].tolist())
        bases.extend(s[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(dids, pa.int64()),
            "combined": pa.array(combs, pa.float64()),
            "score": pa.array(bases, pa.float64()),
        }
    )


def rank_eval(
    index_dir: str,
    queries: list[dict],
    rank_round: int | None = None,
    round_to: int = 6,
) -> pa.Table:
    """Ranking-evaluation API (the Lucene/ES ``_rank_eval`` endpoint):
    precision@k, recall@k and MRR of each query's BM25 top-k against
    DERIVED relevance judgments — a doc is relevant iff it contains ALL the
    query's terms (the conjunctive containment set, so judgments are a pure
    function of the corpus and the oracle can recompute them). ES
    conventions: P@k divides by the REQUESTED k even when fewer docs are
    retrieved or relevant; recall divides by |relevant| (0.0 when none);
    MRR is 1/rank of the first relevant retrieved doc (0.0 when none).

    Scale shape: per-query work is the existing pruned top-k plus one
    posting intersection over the query's terms (rarest-first early-exit
    order, the reference's candidate-intersection loop,
    DefaultTargetAssembler.java:79-112) — no corpus pass, no judgment file.
    Emits (query_id, n_relevant, n_hits, p_at_k_r, recall_r, mrr_r)."""
    from ..query import Bm25Index

    bm = Bm25Index(index_dir)
    qids, n_rel_l, n_hits_l, p_l, r_l, mrr_l = [], [], [], [], [], []
    for q in queries:
        doc, _score = bm.topk(q["text"], q["k"], rank_round=rank_round)
        terms = sorted(set(bm._terms(q["text"])))
        # conjunctive judgment set, rarest-first with early exit
        terms.sort(key=lambda t: bm.reader.df(t))
        rel = None
        for t in terms:
            d, _tf = bm.reader.postings(t)
            rel = d if rel is None else rel[np.isin(rel, d, assume_unique=True)]
            if rel is None or not len(rel):
                break
        rel = rel if rel is not None else np.empty(0, dtype=np.int64)
        hits = np.isin(doc, rel, assume_unique=True)
        n_hits = int(hits.sum())
        nz = np.flatnonzero(hits)
        first = int(nz[0]) + 1 if n_hits else 0
        qids.append(q["query_id"])
        n_rel_l.append(len(rel))
        n_hits_l.append(n_hits)
        p_l.append(round(n_hits / q["k"], round_to))
        r_l.append(round(n_hits / len(rel), round_to) if len(rel) else 0.0)
        mrr_l.append(round(1.0 / first, round_to) if first else 0.0)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "n_relevant": pa.array(n_rel_l, pa.int64()),
            "n_hits": pa.array(n_hits_l, pa.int64()),
            "p_at_k_r": pa.array(p_l, pa.float64()),
            "recall_r": pa.array(r_l, pa.float64()),
            "mrr_r": pa.array(mrr_l, pa.float64()),
        }
    )


def hard_negatives(
    index_dir: str,
    queries: list[dict],
    n_neg: int = 3,
    rank_round: int | None = None,
) -> pa.Table:
    """Hard-negative mining for retriever training (the BM25-negatives
    recipe of DPR, Karpukhin et al. 2020, arXiv 2004.04906 §3.2): for each
    query, positives are its conjunctive-containment docs (same derived
    judgments as :func:`rank_eval`) and hard negatives are the TOP-RANKED
    BM25 hits that are NOT positive — lexically close, semantically wrong,
    exactly what contrastive training wants. Each positive pairs with the
    query's ``n_neg`` highest-ranked negatives. Emits
    (query_id, pos_doc, neg_doc, neg_rank) — integer-exact, fully
    SQL-restatable (no model in the loop; swap the scorer for a model to
    get the ANCE-style iterated variant).

    Scale shape: per-query work is one pruned top-k + one rarest-first
    posting intersection; output is |positives| x n_neg rows per query."""
    from ..query import Bm25Index

    bm = Bm25Index(index_dir)
    qids, pos_l, neg_l, rk_l = [], [], [], []
    for q in queries:
        # rank the FULL match set: on conjunctive-friendly corpora the top-k
        # band can be entirely positive, so negatives come from the first
        # non-relevant docs anywhere in the ranking (partial matchers)
        doc, score = bm.score_all(q["text"])
        key = np.round(score, rank_round) if rank_round is not None else score
        order = np.lexsort((doc, -key))
        doc = doc[order]
        terms = sorted(set(bm._terms(q["text"])))
        terms.sort(key=lambda t: bm.reader.df(t))
        rel = None
        for t in terms:
            d, _tf = bm.reader.postings(t)
            rel = d if rel is None else rel[np.isin(rel, d, assume_unique=True)]
            if rel is None or not len(rel):
                break
        rel = rel if rel is not None else np.empty(0, dtype=np.int64)
        if not len(rel):
            continue  # no positives -> nothing to contrast
        is_pos = np.isin(doc, rel)
        negs = doc[~is_pos][:n_neg]
        neg_ranks = (np.flatnonzero(~is_pos)[:n_neg] + 1).astype(np.int64)
        for p in rel:
            for nd, nr in zip(negs.tolist(), neg_ranks.tolist()):
                qids.append(q["query_id"])
                pos_l.append(int(p))
                neg_l.append(nd)
                rk_l.append(nr)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "pos_doc": pa.array(pos_l, pa.int64()),
            "neg_doc": pa.array(neg_l, pa.int64()),
            "neg_rank": pa.array(rk_l, pa.int64()),
        }
    )


class _StubCrossEncoder:
    """Deterministic stand-in for a cross-encoder reranker: 'loads' its
    model once per actor (__init__ — where a real implementation deserializes
    weights) and scores (query, doc_text) pairs per batch (__call__ — where a
    real one runs batched inference). The score is the md5_number_lower hash
    of "query_id:text" scaled to [0, 1) — deterministic and restated exactly
    by the oracle SQL, so the WHOLE serving path (hit hydration, batching,
    actor-pool plumbing, re-ranking) is value-hash-gated while the model
    itself stays a brief-sanctioned stub (no inference libs in the image)."""

    def __init__(self, scale: int = 1_000_000):
        from ..tokenize import md5_lower64  # "model load" happens here, once

        self._hash = md5_lower64
        self._scale = scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        key = pc.binary_join_element_wise(
            batch["query_id"].cast(pa.string()), batch["text"], ":"
        )
        h = self._hash(key)
        s = (h % np.uint64(self._scale)).astype(np.float64) / float(self._scale)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "doc_id": batch["doc_id"],
                "stub_r": pa.array(np.round(s, 6), pa.float64()),
            }
        )


def rerank_stub_topk(
    index_dir: str,
    queries: list[dict],
    rank_round: int | None = None,
    concurrency: int = 2,
) -> pa.Table:
    """Two-stage retrieve-then-rerank serving (the cross-encoder topology of
    every production neural search stack): stage 1 is the exact BM25 top-k;
    stage 2 hydrates the hits' stored texts through the row-group-pruned doc
    store and re-scores them in a STATEFUL ACTOR POOL (model in __init__,
    batched scoring in __call__ — :class:`_StubCrossEncoder`), then re-ranks
    by (rounded stub score desc, doc asc). Work scales with hit count, never
    the corpus. Emits (query_id, rank, doc_id, stub_r)."""
    import ray.data

    from ..docstore import DocStore
    from ..query import Bm25Index

    bm = Bm25Index(index_dir)
    store = DocStore(index_dir)
    qids, dids, texts = [], [], []
    for q in queries:
        doc, _score = bm.topk(q["text"], q["k"], rank_round=rank_round)
        hydrated = store.texts(doc)
        for d in doc.tolist():
            qids.append(q["query_id"])
            dids.append(int(d))
            texts.append(hydrated[int(d)])
    if not qids:
        return pa.table(
            {
                "query_id": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "stub_r": pa.array([], pa.float64()),
            }
        )
    hits = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(qids, pa.string()),
                "doc_id": pa.array(dids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    scored = hits.map_batches(
        _StubCrossEncoder,
        batch_format="pyarrow",
        concurrency=(1, concurrency),  # never pin pool == CPU budget
        num_cpus=1,
    ).to_arrow_refs()
    import ray as _ray

    tbl = pa.concat_tables([t for t in _ray.get(scored) if t.num_rows])
    qs = tbl["query_id"].to_numpy(zero_copy_only=False)
    ds_ = tbl["doc_id"].to_numpy(zero_copy_only=False)
    ss = tbl["stub_r"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ds_, -ss, qs))
    qs, ds_, ss = qs[order], ds_[order], ss[order]
    first = np.empty(len(qs), dtype=bool)
    first[0] = True
    np.not_equal(qs[1:], qs[:-1], out=first[1:])
    rank = np.arange(len(qs), dtype=np.int64)
    starts = np.flatnonzero(first)
    rank -= np.repeat(rank[starts], np.diff(np.r_[starts, len(qs)]))
    return pa.table(
        {
            "query_id": pa.array(qs.tolist(), pa.string()),
            "rank": pa.array(rank + 1, pa.int64()),
            "doc_id": pa.array(ds_, pa.int64()),
            "stub_r": pa.array(ss, pa.float64()),
        }
    )
