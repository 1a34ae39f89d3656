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
    distributed) -> the DROP stream (non-representative cluster members)
    unions with the gated payload stream into ONE doc-bucket groupby that
    keeps unflagged payload rows (the `_surviving_new` pattern — at
    raw-crawl dup rates the drop set is a large fraction of the corpus and
    must never be a driver collect or broadcast) -> one streamed redact
    pass. Emits (doc_id, dl, n_matches, text_clean) sorted by doc_id; every
    rule is integer/RE2-exact so the DuckDB oracle restates the whole chain
    including the recursive closure."""
    from .ops.dedup import _sorted_group_map, connected_components, ngram_jaccard_pairs

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
        d = batch.filter(m)["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "flag": pa.array(np.ones(len(d), dtype=np.int64)),
                "dl": pa.array(np.zeros(len(d), dtype=np.int64)),
                text_col: pa.array([""] * len(d), pa.string()),
                "docbucket": pa.array(d % num_partitions, pa.int64()),
            }
        )

    def payload(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "flag": pa.array(np.zeros(len(d), dtype=np.int64)),
                "dl": batch["dl"],
                text_col: batch[text_col],
                "docbucket": pa.array(d % num_partitions, pa.int64()),
            }
        )

    def keep(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        f = group["flag"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        fmax = np.zeros(len(ud), dtype=np.int64)
        np.maximum.at(fmax, inv, f)
        sel = (f == 0) & (fmax[inv] == 0)
        t = group.filter(pa.array(sel))
        return pa.table(
            {"doc_id": t["doc_id"], "dl": t["dl"], text_col: t[text_col]}
        )

    kept = _sorted_group_map(
        clusters.map_batches(drop_rows, batch_format="pyarrow").union(
            gated.map_batches(payload, batch_format="pyarrow")
        ),
        "docbucket",
        keep,
        pa.schema(
            [("doc_id", pa.int64()), ("dl", pa.int64()), (text_col, pa.string())]
        ),
    )

    def redact(batch: pa.Table) -> pa.Table:
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

    return kept.map_batches(redact, batch_format="pyarrow").sort("doc_id")


def training_mix(
    ds,
    *,
    eval_mod: int = 100,
    shingle_k: int = 3,
    target_permille: dict[str, int] | None = None,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_len_x10: int = 30,
    max_mean_len_x10: int = 100,
    min_stop_hits: int = 2,
    min_uniq_permille: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "lang",
    num_buckets: int = 64,
):
    """The END-TO-END training-data selection chain, composed from the
    operator library with bounded exchanges throughout:

        Gopher quality gate  ->  exact dedup (min-id per text)
          ->  eval-slice exclusion + decontamination (k-gram overlap
              with the ``doc_id % eval_mod == 0`` held-out slice)
          ->  deterministic domain mixture downsampling

    Emits (doc_id, lang, bucket) for every SELECTED doc, sorted.

    Composition shape: (1) one fused streamed map applies the integer-exact
    Gopher gates AND the eval exclusion AND stamps the text-hash dedup
    bucket; (2) one bucket groupby keeps the min-id doc per distinct text
    (carrying its lang); (3) the decontamination flag stream
    (:func:`engine.ops.dedup.decontaminate`, its own two bucketed
    exchanges) unions with the survivor presence stream into one doc-bucket
    groupby that drops flagged docs join-free (the `_surviving_new`
    pattern); (4) the survivor set — narrow (doc_id, lang) rows, object-
    store-materialized because it feeds BOTH the #domains-row count and the
    final gate — is downsampled by the Knuth-hash mixture gate with rates
    from :func:`engine.ops.sampling.domain_mix_rates`. Driver state: one
    int per domain. Every rule is integer/hash-exact, so the whole chain is
    restated verbatim by the ``training_mix`` oracle SQL.

    Reference analog: the staged select-filter-commit chain of the
    reference's update pipeline (strucmotif-search
    UPD/StrucmotifUpdate.java:114-387 — per-record quality gate at write
    (CORE/io/DefaultStructureWriter.java:80-86), known-set anti-join,
    then commit), recomposed over text-corpus semantics (Rae et al. 2021
    gates, Lee et al. 2021 dedup, eval decontamination, fixed-mixture
    sampling)."""
    import polars as pl

    from .ops.dedup import _sorted_group_map, decontaminate
    from .ops.sampling import MIX_TARGET_PERMILLE, domain_mix_rates, hash_buckets
    from .ops.textstats import quality_batch

    targets = dict(MIX_TARGET_PERMILLE if target_permille is None else target_permille)

    def gate(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch, id_col=id_col, text_col=text_col)
        nt = q["n_tokens"].to_numpy(zero_copy_only=False)
        nu = q["n_uniq"].to_numpy(zero_copy_only=False)
        ns = q["n_stop"].to_numpy(zero_copy_only=False)
        sl = q["sum_token_len"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (
            (nt >= min_tokens)
            & (nt <= max_tokens)
            & (10 * sl >= min_mean_len_x10 * nt)
            & (10 * sl <= max_mean_len_x10 * nt)
            & (ns >= min_stop_hits)
            & (1000 * nu >= min_uniq_permille * nt)
            & (ids % eval_mod != 0)  # the held-out slice never trains
        )
        t = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                domain_col: batch[domain_col],
                text_col: batch[text_col],
            }
        ).filter(pa.array(keep))
        h = pl.from_arrow(t.select([text_col]))[text_col].hash(seed=42)
        return t.append_column(
            "bucket", pa.array((h.to_numpy() % num_buckets).astype(np.int64))
        )

    def keep_first(group: pa.Table) -> pa.Table:
        """Min-id doc per distinct text, carrying the KEEPER's lang."""
        t_np = group[text_col].to_numpy(zero_copy_only=False).astype(object)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t_np))
        t_s, d_s = t_np[order], d[order]
        first = np.empty(len(d_s), dtype=bool)
        first[0] = True
        np.not_equal(t_s[1:], t_s[:-1], out=first[1:])
        sel = order[first]
        return pa.table(
            {
                "doc_id": pa.array(d[sel], pa.int64()),
                domain_col: group[domain_col].take(pa.array(sel)),
            }
        )

    survivors = _sorted_group_map(
        ds.map_batches(gate, batch_format="pyarrow"),
        "bucket",
        keep_first,
        pa.schema([("doc_id", pa.int64()), (domain_col, pa.string())]),
    )

    # decontamination flag stream unions with the survivor presence stream;
    # one doc-bucket groupby drops flagged docs join-free
    def presence(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                domain_col: batch[domain_col],
                "flag": pa.array(np.zeros(len(d), dtype=np.int64)),
                "docbucket": pa.array(d % num_buckets, pa.int64()),
            }
        )

    def flagged(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                domain_col: pa.array([""] * len(d), pa.string()),
                "flag": pa.array(np.ones(len(d), dtype=np.int64)),
                "docbucket": pa.array(d % num_buckets, pa.int64()),
            }
        )

    decon = decontaminate(
        ds, k=shingle_k, eval_mod=eval_mod, id_col=id_col, text_col=text_col
    ).map_batches(flagged, batch_format="pyarrow")

    def keep_unflagged(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        f = group["flag"].to_numpy(zero_copy_only=False)
        lg = group[domain_col].to_numpy(zero_copy_only=False).astype(object)
        order = np.lexsort((lg, d))  # per doc: "" (flag row) sorts first
        d_s, lg_s = d[order], lg[order]
        first = np.empty(len(d_s), dtype=bool)
        first[0] = True
        np.not_equal(d_s[1:], d_s[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        fmax = np.zeros(len(starts), dtype=np.int64)
        np.maximum.at(fmax, np.cumsum(first) - 1, f[order])
        # the presence row's lang is the lexicographically LAST per doc
        ends = np.r_[starts[1:], len(d_s)] - 1
        keep = fmax == 0
        return pa.table(
            {
                "doc_id": pa.array(d_s[starts][keep], pa.int64()),
                domain_col: pa.array(lg_s[ends][keep].astype(str), pa.string()),
            }
        )

    # narrow (doc_id, lang) survivor rows; materialized because BOTH the
    # mixture-count pass and the final gate consume it (a lazy re-run would
    # re-execute the decontamination exchanges)
    survivors2 = _sorted_group_map(
        survivors.map_batches(presence, batch_format="pyarrow").union(decon),
        "docbucket",
        keep_unflagged,
        pa.schema([("doc_id", pa.int64()), (domain_col, pa.string())]),
    ).materialize()

    counts = {
        r[domain_col]: int(r["count()"])
        for r in survivors2.groupby(domain_col).count().take_all()  # #domains rows
    }
    rates = domain_mix_rates(counts, targets)

    def mix_gate(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = hash_buckets(ids)
        dom = batch[domain_col].to_numpy(zero_copy_only=False)
        thr = np.zeros(len(dom), dtype=np.int64)
        for dname, r in rates.items():
            thr[dom == dname] = r
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                domain_col: batch[domain_col],
                "bucket": pa.array(bucket, pa.int64()),
            }
        ).filter(pa.array(bucket < thr))

    return survivors2.map_batches(mix_gate, batch_format="pyarrow").sort("doc_id")
