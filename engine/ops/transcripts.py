"""Transcript-table analytics: per-conversation profiling over the raw
(conv_id, turn_idx, role, text, tool, ts) table — the corpus-side statistics
a transcript pipeline wants NEXT to the inverted index (turn mix, tool-call
rate, token mass, wall-clock span, user→assistant response latency).

Shapes: narrow projections pushed into the parquet read; per-batch Arrow
``group_by`` partial aggregation BEFORE the exchange (conversations are
contiguous on disk, so partial rows ≈ #convs + #blocks); ONE bucketed
groupby merges partials (a conversation's rows all land in one bucket, each
bucket holds many conversations). Sums/extrema are integers (token counts,
epoch-us timestamps), so results are bit-exact against the SQL oracle.

Reference analog: corpus-level stats the reference tracks per update cycle
(UPD/StrucmotifUpdate.java context counters + stats.json in our build);
latency pairing is the transcript-domain positional/windowed operation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_of(conv: pa.Array, num_partitions: int) -> pa.Array:
    import polars as pl

    h = pl.from_arrow(pa.table({"c": conv}))["c"].hash(seed=3).to_numpy()
    return pa.array((h % num_partitions).astype(np.int64))


def conv_stats(ds, num_partitions: int = 8):
    """Per-conversation profile: (conv_id, n_turns, n_assistant,
    n_tool_calls, total_tokens, duration_us), sorted by conv_id.

    ``total_tokens`` uses the index tokenizer's dl contract (one maximal
    [a-z0-9] run per token); ``duration_us`` = max(ts) - min(ts) in exact
    integer microseconds."""
    from ..schema import TOKEN_MATCH_REGEX

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        dl = pc.coalesce(
            pc.count_substring_regex(pc.utf8_lower(text), TOKEN_MATCH_REGEX),
            pa.scalar(0, pa.int32()),
        ).cast(pa.int64())
        t = pa.table(
            {
                "conv_id": batch["conv_id"],
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "is_assistant": pc.cast(
                    pc.equal(batch["role"], "assistant"), pa.int64()
                ),
                "is_tool": pc.cast(pc.not_equal(batch["tool"], ""), pa.int64()),
                "dl": dl,
                "ts_us": batch["ts"].cast(pa.int64()),
            }
        )
        g = t.group_by(["conv_id"], use_threads=False).aggregate(
            [
                ("one", "sum"),
                ("is_assistant", "sum"),
                ("is_tool", "sum"),
                ("dl", "sum"),
                ("ts_us", "min"),
                ("ts_us", "max"),
            ]
        )
        return g.append_column("bucket", _bucket_of(g["conv_id"].combine_chunks(), num_partitions))

    def merge(group: pa.Table) -> pa.Table:
        g = group.group_by(["conv_id"], use_threads=False).aggregate(
            [
                ("one_sum", "sum"),
                ("is_assistant_sum", "sum"),
                ("is_tool_sum", "sum"),
                ("dl_sum", "sum"),
                ("ts_us_min", "min"),
                ("ts_us_max", "max"),
            ]
        )
        dur = pc.subtract(g["ts_us_max_max"], g["ts_us_min_min"])
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "n_turns": g["one_sum_sum"].cast(pa.int64()),
                "n_assistant": g["is_assistant_sum_sum"].cast(pa.int64()),
                "n_tool_calls": g["is_tool_sum_sum"].cast(pa.int64()),
                "total_tokens": g["dl_sum_sum"].cast(pa.int64()),
                "duration_us": dur.cast(pa.int64()),
            }
        )

    return (
        ds.select_columns(["conv_id", "turn_idx", "role", "text", "tool", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .sort("conv_id")
    )


def tool_usage(ds, num_partitions: int = 8):
    """Per-(tool, role) call counts and distinct-conversation reach over the
    raw transcripts table (tool rows only). (tool, role, n_calls, n_convs),
    sorted. Same partial-agg + bucketed-merge shape as :func:`conv_stats`;
    the distinct-conv count is exact because ALL of a conversation's rows for
    a (tool, role) land in one bucket (bucket keys on tool)."""

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.not_equal(batch["tool"], "")
        t = batch.select(["conv_id", "role", "tool"]).filter(mask)
        g = t.group_by(["tool", "role", "conv_id"], use_threads=False).aggregate(
            [("conv_id", "count")]
        )
        return g.append_column(
            "bucket", _bucket_of(g["tool"].combine_chunks(), num_partitions)
        )

    def merge(group: pa.Table) -> pa.Table:
        g = group.group_by(["tool", "role", "conv_id"], use_threads=False).aggregate(
            [("conv_id_count", "sum")]
        )
        g2 = g.group_by(["tool", "role"], use_threads=False).aggregate(
            [("conv_id_count_sum", "sum"), ("conv_id", "count")]
        )
        return pa.table(
            {
                "tool": g2["tool"],
                "role": g2["role"],
                "n_calls": g2["conv_id_count_sum_sum"].cast(pa.int64()),
                "n_convs": g2["conv_id_count"].cast(pa.int64()),
            }
        )

    return (
        ds.select_columns(["conv_id", "role", "tool"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .sort(["tool", "role"])
    )


def response_latency(ds, num_partitions: int = 8):
    """Per-conversation user→assistant response latency: for every user turn
    whose IMMEDIATE successor (turn_idx + 1) is an assistant turn, the ts
    gap; returns (conv_id, n_pairs, total_latency_us) for conversations with
    at least one such pair, sorted by conv_id. Exact integer sums.

    Shape: narrow projection (no text) -> bucketed groupby; the group body
    sorts its conversations by (conv, turn) once and pairs adjacent rows
    vectorized — the transcript-domain windowed/LAG operation."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].cast(pa.int64()),
                "is_user": pc.cast(pc.equal(batch["role"], "user"), pa.int8()),
                "is_assistant": pc.cast(
                    pc.equal(batch["role"], "assistant"), pa.int8()
                ),
                "ts_us": batch["ts"].cast(pa.int64()),
                "bucket": _bucket_of(
                    batch["conv_id"].combine_chunks()
                    if isinstance(batch["conv_id"], pa.ChunkedArray)
                    else batch["conv_id"],
                    num_partitions,
                ),
            }
        )

    def pair(group: pa.Table) -> pa.Table:
        conv = group["conv_id"].combine_chunks().dictionary_encode()
        codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        turn = group["turn_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, codes))
        c_s, t_s = codes[order], turn[order]
        user = group["is_user"].to_numpy(zero_copy_only=False)[order]
        asst = group["is_assistant"].to_numpy(zero_copy_only=False)[order]
        ts = group["ts_us"].to_numpy(zero_copy_only=False)[order]
        ok = (
            (c_s[1:] == c_s[:-1])
            & (t_s[1:] == t_s[:-1] + 1)
            & (user[:-1] == 1)
            & (asst[1:] == 1)
        )
        i = np.flatnonzero(ok)
        if not len(i):
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    "total_latency_us": pa.array([], pa.int64()),
                }
            )
        lat = ts[i + 1] - ts[i]
        cc = c_s[i]
        first = np.empty(len(cc), dtype=bool)
        first[0] = True
        np.not_equal(cc[1:], cc[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        n_pairs = np.diff(np.r_[starts, len(cc)])
        return pa.table(
            {
                "conv_id": conv.dictionary.take(pa.array(cc[starts])),
                "n_pairs": pa.array(n_pairs.astype(np.int64)),
                "total_latency_us": pa.array(np.add.reduceat(lat, starts).astype(np.int64)),
            }
        )

    return (
        ds.select_columns(["conv_id", "turn_idx", "role", "ts"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair, batch_format="pyarrow")
        .sort("conv_id")
    )


def role_transitions(ds, num_partitions: int = 8):
    """Dialogue-flow Markov counts: for every adjacent turn pair
    (turn_idx + 1) within a conversation, count (role_from -> role_to)
    transitions plus the distinct conversations exhibiting each transition.
    Returns (role_from, role_to, n_transitions, n_convs), sorted.

    Shape: conv-bucketed groupby (a conversation's turns land in ONE bucket,
    so adjacency pairing and per-bucket distinct-conv counts are exact and
    disjoint across buckets); the final merge shuffles <= |roles|^2 rows per
    bucket — a bounded dim-table exchange, never corpus-sized."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].cast(pa.int64()),
                "role": batch["role"],
                "bucket": _bucket_of(
                    batch["conv_id"].combine_chunks()
                    if isinstance(batch["conv_id"], pa.ChunkedArray)
                    else batch["conv_id"],
                    num_partitions,
                ),
            }
        )

    def pair(group: pa.Table) -> pa.Table:
        conv = group["conv_id"].combine_chunks().dictionary_encode()
        codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        role = group["role"].combine_chunks().dictionary_encode()
        rcodes = role.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        turn = group["turn_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, codes))
        c_s, t_s, r_s = codes[order], turn[order], rcodes[order]
        ok = (c_s[1:] == c_s[:-1]) & (t_s[1:] == t_s[:-1] + 1)
        i = np.flatnonzero(ok)
        empty = pa.table(
            {
                "role_from": pa.array([], pa.string()),
                "role_to": pa.array([], pa.string()),
                "n_transitions": pa.array([], pa.int64()),
                "n_convs": pa.array([], pa.int64()),
            }
        )
        if not len(i):
            return empty
        nr = len(role.dictionary)
        pair_code = r_s[i] * nr + r_s[i + 1]
        n_trans = np.bincount(pair_code, minlength=nr * nr)
        # distinct convs per transition: unique (pair, conv) rows
        uniq = np.unique(pair_code * (c_s.max() + 1) + c_s[i])
        n_convs = np.bincount(
            (uniq // (c_s.max() + 1)).astype(np.int64), minlength=nr * nr
        )
        live = np.flatnonzero(n_trans)
        return pa.table(
            {
                "role_from": role.dictionary.take(pa.array(live // nr)),
                "role_to": role.dictionary.take(pa.array(live % nr)),
                "n_transitions": pa.array(n_trans[live].astype(np.int64)),
                "n_convs": pa.array(n_convs[live].astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    grouped = (
        ds.select_columns(["conv_id", "turn_idx", "role"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair, batch_format="pyarrow")
        .groupby(["role_from", "role_to"])
        .aggregate(Sum("n_transitions"), Sum("n_convs"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "role_from": batch["role_from"],
                "role_to": batch["role_to"],
                "n_transitions": batch["sum(n_transitions)"].cast(pa.int64()),
                "n_convs": batch["sum(n_convs)"].cast(pa.int64()),
            }
        )

    return grouped.map_batches(rename, batch_format="pyarrow").sort(
        ["role_from", "role_to"]
    )


def tool_chains(ds, num_partitions: int = 8):
    """Tool-call chain mining: for every conversation, the ORDERED sequence
    of non-empty ``tool`` values (by turn_idx); count each consecutive pair
    (tool_from -> tool_to) — consecutive IN THE TOOL SEQUENCE, turns
    without a tool call in between are skipped — plus the distinct
    conversations exhibiting each pair. The agent-behavior analytics a
    transcript pipeline wants: which tools chain into which.
    Returns (tool_from, tool_to, n_chains, n_convs), sorted.

    Shape: identical to role_transitions — conv-bucketed groupby (one
    bucket holds a conversation's full sequence, so chain pairing is exact
    and disjoint across buckets), per-bucket vectorized pairing, then a
    bounded (<= |tools|^2 rows per bucket) dim-table exchange."""

    def project(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].cast(pa.int64()),
                "tool": batch["tool"],
            }
        ).filter(pc.not_equal(batch["tool"], ""))
        return t.append_column(
            "bucket", _bucket_of(t["conv_id"].combine_chunks(), num_partitions)
        )

    def pair(group: pa.Table) -> pa.Table:
        conv = group["conv_id"].combine_chunks().dictionary_encode()
        codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tool = group["tool"].combine_chunks().dictionary_encode()
        tcodes = tool.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        turn = group["turn_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, codes))
        c_s, t_s = codes[order], tcodes[order]
        ok = c_s[1:] == c_s[:-1]  # adjacency in the FILTERED tool sequence
        i = np.flatnonzero(ok)
        empty = pa.table(
            {
                "tool_from": pa.array([], pa.string()),
                "tool_to": pa.array([], pa.string()),
                "n_chains": pa.array([], pa.int64()),
                "n_convs": pa.array([], pa.int64()),
            }
        )
        if not len(i):
            return empty
        nt = len(tool.dictionary)
        pair_code = t_s[i] * nt + t_s[i + 1]
        n_chains = np.bincount(pair_code, minlength=nt * nt)
        uniq = np.unique(pair_code * (c_s.max() + 1) + c_s[i])
        n_convs = np.bincount(
            (uniq // (c_s.max() + 1)).astype(np.int64), minlength=nt * nt
        )
        live = np.flatnonzero(n_chains)
        return pa.table(
            {
                "tool_from": tool.dictionary.take(pa.array(live // nt)),
                "tool_to": tool.dictionary.take(pa.array(live % nt)),
                "n_chains": pa.array(n_chains[live].astype(np.int64)),
                "n_convs": pa.array(n_convs[live].astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    grouped = (
        ds.select_columns(["conv_id", "turn_idx", "tool"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair, batch_format="pyarrow")
        .groupby(["tool_from", "tool_to"])
        .aggregate(Sum("n_chains"), Sum("n_convs"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tool_from": batch["tool_from"],
                "tool_to": batch["tool_to"],
                "n_chains": batch["sum(n_chains)"].cast(pa.int64()),
                "n_convs": batch["sum(n_convs)"].cast(pa.int64()),
            }
        )

    return grouped.map_batches(rename, batch_format="pyarrow").sort(
        ["tool_from", "tool_to"]
    )


def sft_pairs(ds, num_partitions: int = 8):
    """Transcripts -> supervised-fine-tuning pairs: every assistant turn
    whose IMMEDIATE predecessor (turn_idx - 1) is a user turn becomes one
    training record (conv_id, turn_idx of the assistant turn, prompt =
    the user text, response = the assistant text, n_prompt_tokens,
    n_response_tokens under the index tokenizer's dl contract). The bridge
    from raw agent transcripts to instruction-tuning data — the op a
    transcript pipeline exists to feed.

    Shape: the response_latency pairing one column wider — conv-bucketed
    groupby (a conversation's turns land in ONE bucket, so adjacency is
    exact across input blocks), vectorized pair detection, texts carried
    through the single exchange only for the rows that pair."""
    from ..schema import TOKEN_MATCH_REGEX

    def project(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ntok = pc.coalesce(
            pc.count_substring_regex(pc.utf8_lower(text), TOKEN_MATCH_REGEX),
            pa.scalar(0, pa.int32()),
        ).cast(pa.int64())
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].cast(pa.int64()),
                "is_user": pc.cast(pc.equal(batch["role"], "user"), pa.int8()),
                "is_assistant": pc.cast(
                    pc.equal(batch["role"], "assistant"), pa.int8()
                ),
                "text": text,
                "ntok": ntok,
                "bucket": _bucket_of(
                    batch["conv_id"].combine_chunks()
                    if isinstance(batch["conv_id"], pa.ChunkedArray)
                    else batch["conv_id"],
                    num_partitions,
                ),
            }
        )

    def pair(group: pa.Table) -> pa.Table:
        conv = group["conv_id"].combine_chunks().dictionary_encode()
        codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        turn = group["turn_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, codes))
        c_s, t_s = codes[order], turn[order]
        user = group["is_user"].to_numpy(zero_copy_only=False)[order]
        asst = group["is_assistant"].to_numpy(zero_copy_only=False)[order]
        ntok = group["ntok"].to_numpy(zero_copy_only=False)[order]
        text = group["text"].combine_chunks().take(pa.array(order))
        ok = (
            (c_s[1:] == c_s[:-1])
            & (t_s[1:] == t_s[:-1] + 1)
            & (user[:-1] == 1)
            & (asst[1:] == 1)
        )
        i = np.flatnonzero(ok)
        if not len(i):
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int64()),
                    "prompt": pa.array([], pa.string()),
                    "response": pa.array([], pa.string()),
                    "n_prompt_tokens": pa.array([], pa.int64()),
                    "n_response_tokens": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "conv_id": conv.dictionary.take(pa.array(c_s[i])),
                "turn_idx": pa.array(t_s[i + 1], pa.int64()),
                "prompt": text.take(pa.array(i)),
                "response": text.take(pa.array(i + 1)),
                "n_prompt_tokens": pa.array(ntok[i], pa.int64()),
                "n_response_tokens": pa.array(ntok[i + 1], pa.int64()),
            }
        )

    return (
        ds.select_columns(["conv_id", "turn_idx", "role", "text"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair, batch_format="pyarrow")
        .sort(["conv_id", "turn_idx"])
    )


def pack_conversations(ds, budget: int = 128, num_partitions: int = 8):
    """Context-window packing of conversations: within each conversation
    (turn_idx order), turn ``t`` lands in chunk ``tokens_before(t) //
    budget`` — the deterministic fixed-budget split of a long conversation
    into training context windows (the conversation-level companion of
    ``textstats.pack_sequences``). Emits (conv_id, turn_idx, chunk_idx,
    n_tokens); token counts under the index tokenizer's dl contract.

    Shape: conv-bucketed groupby; the group body is one lexsort + one
    segment cumsum (global cumsum minus per-conv offset) — no per-conv
    loop, no driver state."""
    from ..schema import TOKEN_MATCH_REGEX

    if budget < 1:
        raise ValueError("budget must be >= 1")

    def project(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ntok = pc.coalesce(
            pc.count_substring_regex(pc.utf8_lower(text), TOKEN_MATCH_REGEX),
            pa.scalar(0, pa.int32()),
        ).cast(pa.int64())
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"].cast(pa.int64()),
                "ntok": ntok,
                "bucket": _bucket_of(
                    batch["conv_id"].combine_chunks()
                    if isinstance(batch["conv_id"], pa.ChunkedArray)
                    else batch["conv_id"],
                    num_partitions,
                ),
            }
        )

    def pack(group: pa.Table) -> pa.Table:
        conv = group["conv_id"].combine_chunks().dictionary_encode()
        codes = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        turn = group["turn_idx"].to_numpy(zero_copy_only=False)
        ntok = group["ntok"].to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, codes))
        c_s, t_s, n_s = codes[order], turn[order], ntok[order]
        cum = np.cumsum(n_s, dtype=np.int64)
        first = np.empty(len(c_s), dtype=bool)
        if len(c_s):
            first[0] = True
            np.not_equal(c_s[1:], c_s[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        # tokens BEFORE each turn within its conv: cum shifted, minus the
        # cumulative total at the conv's start
        before = np.zeros(len(c_s), dtype=np.int64)
        before[1:] = cum[:-1]
        conv_base = np.repeat(before[starts], np.diff(np.r_[starts, len(c_s)]))
        before -= conv_base
        return pa.table(
            {
                "conv_id": conv.dictionary.take(pa.array(c_s)),
                "turn_idx": pa.array(t_s, pa.int64()),
                "chunk_idx": pa.array(before // budget, pa.int64()),
                "n_tokens": pa.array(n_s, pa.int64()),
            }
        )

    return (
        ds.select_columns(["conv_id", "turn_idx", "text"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack, batch_format="pyarrow")
        .sort(["conv_id", "turn_idx"])
    )


def boilerplate_turns(
    ds, min_convs: int = 3, prefix_tokens: int | None = None, num_partitions: int = 8
):
    """Cross-conversation boilerplate detection: turn TEXTS (or, with
    ``prefix_tokens`` set, their first-N-token prefixes — templated
    greetings and canned system prompts share openings long before they
    share whole turns) appearing in at least ``min_convs`` DISTINCT
    conversations — the transcript-domain boilerplate a dedup pass should
    strip before training. Emits (text, n_convs, n_turns), sorted by
    (-n_convs, text).

    Shape: per-batch partial (key, conv) dedup + counts, ONE key-hash
    bucket groupby whose body groups by the TRUE key string (hash
    collisions cannot merge keys) and counts distinct convs; only keys
    crossing the threshold leave the final groupby."""
    import polars as pl

    from ..tokenize import _explode_tokens

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if prefix_tokens is not None:
            flat, _parent, dl = _explode_tokens(text)
            offs = np.zeros(len(dl) + 1, dtype=np.int64)
            np.cumsum(dl, out=offs[1:])
            lists = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), flat)
            text = pc.binary_join(
                pc.list_slice(lists, 0, prefix_tokens), " "
            )
        t = pa.table({"text": text, "conv_id": batch["conv_id"]})
        g = t.group_by(["text", "conv_id"], use_threads=False).aggregate(
            [("conv_id", "count")]
        )
        h = pl.from_arrow(g.select(["text"]))["text"].hash(seed=11).to_numpy()
        return pa.table(
            {
                "text": g["text"],
                "conv_id": g["conv_id"],
                "n_turns": g["conv_id_count"].cast(pa.int64()),
                "hbucket": pa.array((h % (num_partitions * 8)).astype(np.int64)),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        g = group.group_by(["text"], use_threads=False).aggregate(
            [("conv_id", "count_distinct"), ("n_turns", "sum")]
        )
        keep = pc.greater_equal(g["conv_id_count_distinct"], min_convs)
        g = g.filter(keep)
        return pa.table(
            {
                "text": g["text"],
                "n_convs": g["conv_id_count_distinct"].cast(pa.int64()),
                "n_turns": g["n_turns_sum"].cast(pa.int64()),
            }
        )

    return (
        ds.select_columns(["conv_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("hbucket")
        .map_groups(finish, batch_format="pyarrow")
        .sort(["n_convs", "text"], descending=[True, False])
    )
