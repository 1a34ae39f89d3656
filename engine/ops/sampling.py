"""Deterministic sampling / dataset-split operators.

A 100-TB training-data pipeline needs splits and samples that are (a) stable
across runs and cluster sizes, (b) computable per batch with no shuffle and no
global state, and (c) reproducible by any other engine from the row key alone.
Multiplicative (Knuth) hashing over the document key gives all three: the
assignment is a pure function of ``doc_id``, so re-runs, resumes, and the
DuckDB oracle all agree bit-for-bit.

Scale notes: the tag is embarrassingly parallel (one ``map_batches``, no
exchange); numpy uint64 wraparound is EXACT for the mod-2^32 hash because
2^32 divides 2^64 — so arbitrarily large docIDs hash identically to the
oracle's HUGEINT arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def hash_buckets(ids: np.ndarray, n_buckets: int = 1000) -> np.ndarray:
    """(id * 2654435761) mod 2^32 mod n_buckets, exact for any int64 >= 0."""
    h = (ids.astype(np.uint64) * _KNUTH) % _M32
    return (h % np.uint64(n_buckets)).astype(np.int64)


def hash_split(sf_dir: str, test_permille: int = 100, id_col: str = "doc_id"):
    """Deterministic train/test split of the documents table.

    Emits (doc_id, bucket, split): bucket in [0, 1000), split = 'test' when
    bucket < ``test_permille`` else 'train'. Pure per-batch transform — the
    pruned read touches only the key column.
    """

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = hash_buckets(ids)
        is_test = bucket < test_permille
        labels = pa.array(["train", "test"], pa.string())
        split = labels.take(pa.array(is_test.astype(np.int8)))
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(bucket, pa.int64()),
                "split": split,
            }
        )

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=[id_col])
        .map_batches(tag, batch_format="pyarrow")
        .sort(id_col)
    )


#: per-source keep rates in permille; sources not listed use DEFAULT_RATE.
#: Fixed contract shared verbatim with the oracle SQL.
STRATA_RATES_PERMILLE: dict[str, int] = {"src0": 1000, "src1": 500, "src2": 250}
DEFAULT_RATE_PERMILLE = 100


def stratified_sample(
    sf_dir: str,
    rates_permille: dict[str, int] | None = None,
    default_permille: int = DEFAULT_RATE_PERMILLE,
    id_col: str = "doc_id",
    strata_col: str = "source",
):
    """Deterministic per-stratum downsampling: keep a row iff its hash bucket
    (same multiplicative hash as hash_split, over doc_id alone) falls below
    the stratum's permille rate — the source-mix rebalancing step of a
    training-data pipeline. Pure per-batch map, no shuffle, no global state;
    re-runs and resumes keep EXACTLY the same rows, and the rate table rides
    into the task closure (a few entries — below broadcast size)."""
    rates = dict(STRATA_RATES_PERMILLE if rates_permille is None else rates_permille)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = hash_buckets(ids)
        src = batch[strata_col].to_numpy(zero_copy_only=False)
        thr = np.full(len(src), default_permille, dtype=np.int64)
        for s, r in rates.items():
            thr[src == s] = r
        keep = bucket < thr
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                strata_col: batch[strata_col],
                "bucket": pa.array(bucket, pa.int64()),
            }
        ).filter(pa.array(keep))

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=[id_col, strata_col])
        .map_batches(tag, batch_format="pyarrow")
        .sort(id_col)
    )


def uniform_sample_k(sf_dir: str, k: int = 64, id_col: str = "doc_id"):
    """Deterministic uniform k-sample of the documents table: the k rows with
    the smallest (hash(doc_id), doc_id) — order-by-hash sampling, the exact-k
    companion to the rate-based gates above (same Knuth hash, full 32-bit
    value). Per-batch lexsort keeps only k candidate rows per block, so the
    final sort touches <= k x n_blocks rows, never the corpus."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids.astype(np.uint64) * _KNUTH) % _M32).astype(np.int64)
        if len(ids) > k:
            sel = np.lexsort((ids, h))[:k]
            ids, h = ids[sel], h[sel]
        return pa.table({id_col: pa.array(ids, pa.int64()), "h": pa.array(h, pa.int64())})

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=[id_col])
        .map_batches(partial, batch_format="pyarrow")
        .sort(["h", id_col])
        .limit(k)
    )


def group_sample_k(
    sf_dir: str,
    k: int = 16,
    id_col: str = "doc_id",
    group_col: str = "source",
    num_buckets: int = 32,
):
    """Exact-k deterministic sample PER GROUP (k docs per source — the
    balanced-evaluation-set builder): within each group keep the k rows with
    the smallest (hash(doc_id), doc_id), rank included.

    Same two-stage grouped-top-k shape as top_orders_per_customer: a
    per-batch partial top-k per group bounds every block's contribution to
    k rows per (group, block); the shuffle key is a GROUP-HASH BUCKET (many
    groups per bucket, one vectorized lexsort + segment-rank pass per
    bucket), so group cardinality never becomes per-group Python calls."""
    import polars as pl

    def select(tbl: pa.Table, emit_rank: bool) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids.astype(np.uint64) * _KNUTH) % _M32).astype(np.int64)
        src = tbl[group_col]
        codes = src.combine_chunks().dictionary_encode() if isinstance(
            src, pa.ChunkedArray
        ) else src.dictionary_encode()
        g = codes.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, g))
        g_s = g[order]
        n = len(g_s)
        is_new = np.empty(n, dtype=bool)
        if n:
            is_new[0] = True
            np.not_equal(g_s[1:], g_s[:-1], out=is_new[1:])
        starts = np.flatnonzero(is_new)
        seg = np.cumsum(is_new, dtype=np.int64) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg]
        keep = rank < k
        sel = order[keep]
        cols = {
            id_col: pa.array(ids[sel], pa.int64()),
            group_col: src.take(pa.array(sel)),
            "h": pa.array(h[sel], pa.int64()),
        }
        if emit_rank:
            cols["rk"] = pa.array(rank[keep] + 1, pa.int64())
        return pa.table(cols)

    def partial(batch: pa.Table) -> pa.Table:
        t = select(batch, emit_rank=False)
        gh = pl.from_arrow(t.select([group_col]))[group_col].hash(seed=11)
        return t.append_column(
            "bucket", pa.array((gh.to_numpy() % num_buckets).astype(np.int64))
        )

    def final(group: pa.Table) -> pa.Table:
        t = select(group, emit_rank=True)
        return t.select([id_col, group_col, "rk"])

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=[id_col, group_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(final, batch_format="pyarrow")
        .sort([group_col, "rk"])
    )


#: target corpus mixture in permille per domain (lang), the fixed contract
#: shared verbatim with the oracle SQL; domains not listed are dropped.
MIX_TARGET_PERMILLE: dict[str, int] = {
    "en": 400, "de": 150, "es": 150, "fr": 150, "zh": 150,
}


def domain_mix_rates(
    counts: dict[str, int], targets: dict[str, int]
) -> dict[str, int]:
    """Per-domain keep rates (permille) that realize the largest corpus with
    mixture ``targets`` given per-domain availability ``counts`` — the data
    mixing step of a pre-training pipeline (fixed target proportions per
    domain, downsample the over-represented ones).

    Pure INTEGER arithmetic (Python bigints, overflow-free at any corpus
    size) so the rate table is bit-reproducible by the HUGEINT oracle SQL:

        scale  = min over domains of (count_d * 1_000_000) // target_d
        rate_d = min(1000, (target_d * scale) // (count_d * 1000))

    The binding (scarcest-relative-to-target) domain keeps ~100%; every
    other domain is hash-downsampled to match the mixture."""
    live = {d: p for d, p in targets.items() if p > 0 and counts.get(d)}
    if not live:
        return {}
    scale = min((int(counts[d]) * 1_000_000) // int(p) for d, p in live.items())
    return {
        d: min(1000, (int(p) * scale) // (int(counts[d]) * 1000))
        for d, p in live.items()
    }


def domain_mix_sample(
    sf_dir: str,
    target_permille: dict[str, int] | None = None,
    id_col: str = "doc_id",
    domain_col: str = "lang",
):
    """Deterministic mixture sampling of the documents table: downsample each
    domain (language) so the output approximates ``target_permille``
    proportions, keeping a row iff its Knuth hash bucket falls below the
    domain's computed rate. Emits (doc_id, lang, bucket).

    Scale shape: ONE tiny groupby-count (#domains rows) feeds the driver-side
    integer rate computation (bounded: one int per domain), then a stateless
    per-batch filter over a 2-column pruned read — the rate table rides in
    the task closure. Same multiplicative hash as hash_split, so re-runs,
    resumes and the DuckDB oracle agree bit-for-bit."""
    targets = dict(MIX_TARGET_PERMILLE if target_permille is None else target_permille)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=[id_col, domain_col]
    )
    counts = {
        r[domain_col]: int(r["count()"])
        for r in ds.groupby(domain_col).count().take_all()  # bounded: #domains
    }
    rates = domain_mix_rates(counts, targets)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = hash_buckets(ids)
        dom = batch[domain_col].to_numpy(zero_copy_only=False)
        thr = np.zeros(len(dom), dtype=np.int64)  # unlisted domains drop
        for d, r in rates.items():
            thr[dom == d] = r
        keep = bucket < thr
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                domain_col: batch[domain_col],
                "bucket": pa.array(bucket, pa.int64()),
            }
        ).filter(pa.array(keep))

    return ds.map_batches(tag, batch_format="pyarrow").sort(id_col)
