"""Composite pipelines: the multi-stage jobs a corpus owner actually runs,
built from the operator library with the MINIMUM number of exchanges.

``clean_corpus`` is the canonical pre-training prep chain — quality gate ->
exact dedup -> redaction — expressed as ONE streamed map (filter + counters +
bucket stamp), ONE bucketed groupby (dedup: all copies of a text share a
bucket), and a final streamed map (redact + output counters). A naive
composition of the standalone ops would run three pipelines and semi-join
kept-ID sets between them (an O(n_docs) broadcast); carrying the columns
through the single exchange is the scale-correct shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tokenize import doc_length_batch


def clean_corpus(
    ds,
    min_tokens: int = 5,
    max_chars: int = 400,
    pattern: str = "(spark|vector)",
    replacement: str = "[TOOL]",
    num_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Quality-gate -> exact-dedup -> redact, one exchange end to end.

    Keeps docs with ``min_tokens <= dl`` and ``len(text) <= max_chars``,
    keeps the LOWEST docID per distinct surviving text (counting its copies),
    then redacts ``pattern``. Emits (doc_id, dl, n_copies, n_matches,
    text_clean) sorted by doc_id. Every rule is integer/RE2-exact so the
    DuckDB oracle restates the whole chain."""

    def gate(batch: pa.Table) -> pa.Table:
        import polars as pl

        dl_t = doc_length_batch(batch, id_col=id_col, text_col=text_col)
        dl = dl_t["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        nchars = pc.utf8_length(batch[text_col]).to_numpy(zero_copy_only=False)
        keep = (dl >= min_tokens) & (nchars <= max_chars)
        t = pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                text_col: batch[text_col],
                "dl": pa.array(dl),
            }
        ).filter(pa.array(keep))
        h = pl.from_arrow(t.select([text_col]))[text_col].hash(seed=42)
        return t.append_column(
            "bucket", pa.array((h.to_numpy() % num_buckets).astype(np.int64))
        )

    def keep_first(group: pa.Table) -> pa.Table:
        agg = group.group_by([text_col], use_threads=False).aggregate(
            [("doc_id", "min"), ("doc_id", "count"), ("dl", "min")]
        )
        return pa.table(
            {
                "doc_id": agg["doc_id_min"].cast(pa.int64()),
                "dl": agg["dl_min"].cast(pa.int64()),  # text-constant
                "n_copies": agg["doc_id_count"].cast(pa.int64()),
                text_col: agg[text_col],
            }
        )

    def redact(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "dl": batch["dl"],
                "n_copies": batch["n_copies"],
                "n_matches": pc.count_substring_regex(
                    batch[text_col], pattern=pattern
                ).cast(pa.int64()),
                "text_clean": pc.replace_substring_regex(
                    batch[text_col], pattern=pattern, replacement=replacement
                ),
            }
        )

    return (
        ds.map_batches(gate, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keep_first, batch_format="pyarrow")
        .map_batches(redact, batch_format="pyarrow")
        .sort("doc_id")
    )


def clean_corpus_near(
    ds,
    min_tokens: int = 5,
    max_chars: int = 400,
    threshold_num: int = 4,
    threshold_den: int = 5,
    k: int = 3,
    pattern: str = "(spark|vector)",
    replacement: str = "[TOOL]",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
):
    """Quality-gate -> NEAR-dup cluster keep -> redact: the `clean_corpus`
    chain with exact dedup upgraded to n-gram-Jaccard clustering (one doc
    survives per near-dup component, not just per identical text — the
    real pre-training reduction).

    Composition: gate (streamed map, materialized once — consumed by both
    the pair pipeline and the final pass) -> :func:`ops.dedup.ngram_jaccard_pairs`
    over the GATED docs -> :func:`ops.dedup.connected_components` (both fully
    distributed) -> the DROP-list (non-representative cluster members,
    bounded by the duplicate mass) broadcast into one final streamed
    filter + redact pass. Emits (doc_id, dl, n_matches, text_clean) sorted
    by doc_id; every rule is integer/RE2-exact so the DuckDB oracle restates
    the whole chain including the recursive closure."""
    import ray

    from .ops.dedup import connected_components, ngram_jaccard_pairs

    def gate(batch: pa.Table) -> pa.Table:
        dl_t = doc_length_batch(batch, id_col=id_col, text_col=text_col)
        dl = dl_t["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        nchars = pc.utf8_length(batch[text_col]).to_numpy(zero_copy_only=False)
        keep = (dl >= min_tokens) & (nchars <= max_chars)
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                text_col: batch[text_col],
                "dl": pa.array(dl),
            }
        ).filter(pa.array(keep))

    gated = ds.map_batches(gate, batch_format="pyarrow").materialize()
    pairs = ngram_jaccard_pairs(
        gated,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        k=k,
        id_col="doc_id",
        text_col=text_col,
        num_partitions=num_partitions,
    ).select_columns(["doc_a", "doc_b"])
    clusters = connected_components(pairs, num_partitions=num_partitions)

    def drop_rows(batch: pa.Table) -> pa.Table:
        m = pc.not_equal(batch["doc_id"], batch["cluster_rep"])
        return batch.filter(m).select(["doc_id"])

    drop_blocks = [
        t
        for t in ray.get(
            clusters.map_batches(drop_rows, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    drop = (
        np.sort(
            np.concatenate(
                [t["doc_id"].to_numpy(zero_copy_only=False) for t in drop_blocks]
            )
        )
        if drop_blocks
        else np.array([], dtype=np.int64)
    )
    drop_ref = ray.put(drop)

    def finish(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(d):
            pos = np.searchsorted(d, ids)
            dead = (pos < len(d)) & (d[np.minimum(pos, len(d) - 1)] == ids)
            batch = batch.filter(pa.array(~dead))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "dl": batch["dl"],
                "n_matches": pc.count_substring_regex(
                    batch[text_col], pattern=pattern
                ).cast(pa.int64()),
                "text_clean": pc.replace_substring_regex(
                    batch[text_col], pattern=pattern, replacement=replacement
                ),
            }
        )

    return gated.map_batches(finish, batch_format="pyarrow").sort("doc_id")
