"""Hybrid retrieval: lexical BM25 fused with dense cosine ranking by
Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR'09 — the standard
score-free fusion every hybrid-search stack ships).

Scale shape: each side produces a BOUNDED top-``depth`` ranking — BM25 through
the inverted-index actor path, cosine through the brute/IVF ``map_batches``
sweep over the embeddings Dataset — and fusion touches only those two lists:
2*depth rows per query on the driver, never anything corpus-sized. At the
100-TB design point both sides stay distributed; only ranks cross.

Determinism: an RRF contribution is one division of exact integers
(``1.0 / (c + rank)``), and a doc present in both lists sums lexical-first —
the same two-operand IEEE adds the SQL oracle's ``coalesce(l,0)+coalesce(v,0)``
performs — so fused scores match DuckDB bit-for-bit with no rounding.
"""

from __future__ import annotations

import numpy as np


def rrf_fuse(
    lex_docs: np.ndarray,
    dense_docs: np.ndarray,
    k: int,
    c: int = 60,
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse two docID arrays given in rank order (rank = position + 1) into
    the top-``k`` by reciprocal-rank-fusion score ``sum 1/(c + rank)``,
    ties broken ascending docID. Returns (doc_ids, rrf_scores)."""
    scores: dict[int, float] = {}
    for r, d in enumerate(np.asarray(lex_docs, dtype=np.int64).tolist(), 1):
        scores[d] = 1.0 / (c + r)
    for r, d in enumerate(np.asarray(dense_docs, dtype=np.int64).tolist(), 1):
        scores[d] = scores.get(d, 0.0) + 1.0 / (c + r)
    if not scores:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    doc = np.fromiter(scores.keys(), np.int64, len(scores))
    sc = np.fromiter(scores.values(), np.float64, len(scores))
    order = np.lexsort((doc, -sc))[:k]
    return doc[order], sc[order]
