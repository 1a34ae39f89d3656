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
