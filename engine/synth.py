"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Plays the role of the reference's golden test corpus (the packaged
``known.list`` + ``renum/*.bcif.gz`` fixtures behind
StructureIntegrationTest.java:59-108): a seeded generator whose output is
bit-stable across runs and parallelism levels, with

- schema exactly per BASELINE.json ``input_hint``
  (conv_id, turn_idx, role, text, tool, ts),
- Zipf(s~1.1) token frequencies over a synthetic vocabulary -> guaranteed
  head-term skew (the "ribosome problem", Partition.java:27-28 analog),
- planted rare marker tokens in known turns so fixed queries have known
  answers (the "exactly 788 hits" anchoring pattern).

Generation is numpy-vectorized + Arrow ``binary_join`` (no per-turn Python
string building), so bench-scale corpora (~10^6 turns) generate in seconds.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .schema import TRANSCRIPT_SCHEMA

VOCAB_SIZE = 50_000
ZIPF_S = 1.1
MARKER_STRIDE = 97  # convs with idx % 97 == 3 carry a marker token in turn 0
N_MARKERS = 5
TOOL_NAMES = [f"tool_{i:02d}" for i in range(20)]
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds


def marker_token(m: int) -> str:
    return f"zqmarker{m}"


#: conversations per generation chunk: bounds the flat token buffer of one
#: chunk under Arrow's 2^31-byte single-array cap (hit at ~250k convs) while
#: keeping every corpus <= this size BIT-IDENTICAL to the unchunked generator
CHUNK_CONVS = 100_000


def generate_transcripts(n_convs: int, seed: int = 42) -> pa.Table:
    """Generate the full corpus as one Arrow table (deterministic in seed).

    Corpora above ``CHUNK_CONVS`` conversations are generated in independent
    deterministic chunks (RNG stream seeded by ``[seed, chunk_idx]``) and
    concatenated — chunk columns stay under Arrow's single-array byte cap.
    """
    if n_convs <= CHUNK_CONVS:
        return _generate_range(n_convs, np.random.default_rng(seed), conv_base=0)
    tables = []
    for ci, start in enumerate(range(0, n_convs, CHUNK_CONVS)):
        cnt = min(CHUNK_CONVS, n_convs - start)
        tables.append(
            _generate_range(cnt, np.random.default_rng([seed, ci]), conv_base=start)
        )
    return pa.concat_tables(tables)


def _generate_range(n_convs: int, rng, conv_base: int) -> pa.Table:
    """One chunk of conversations [conv_base, conv_base + n_convs)."""
    # conversation lengths: Zipf-truncated in [1, 64]
    conv_len = np.minimum(rng.zipf(1.3, n_convs), 64).astype(np.int64)
    n_turns = int(conv_len.sum())
    conv_of_turn = conv_base + np.repeat(np.arange(n_convs), conv_len)
    turn_idx = (np.arange(n_turns) - np.repeat(np.cumsum(conv_len) - conv_len, conv_len)).astype(np.int32)

    # tokens per turn: 5..200, skewed short
    toks_per_turn = np.minimum(5 + rng.zipf(1.4, n_turns) * 3, 200).astype(np.int64)
    total_tokens = int(toks_per_turn.sum())

    # Zipf token ids over the vocabulary (head-term skew by construction);
    # out-of-vocab tail mass is folded back with modulo so the head stays
    # Zipf-shaped instead of piling onto one clipped bucket
    tok_ids = (rng.zipf(ZIPF_S, total_tokens) - 1) % VOCAB_SIZE
    # dictionary-encode instead of materializing a numpy unicode array:
    # pa.array() on a large U-dtype array returns a ChunkedArray (which
    # ListArray.from_arrays rejects) and costs 4 bytes/char; the dictionary
    # cast builds the flat utf8 buffer once in C.
    vocab_arr = pa.array([f"w{i:05d}" for i in range(VOCAB_SIZE)], pa.string())
    flat_arr = pa.DictionaryArray.from_arrays(
        pa.array(tok_ids.astype(np.int32)), vocab_arr
    ).cast(pa.string())
    if isinstance(flat_arr, pa.ChunkedArray):
        flat_arr = flat_arr.combine_chunks()

    # per-turn text via Arrow list offsets + binary_join (vectorized)
    offsets = np.zeros(n_turns + 1, dtype=np.int32)
    np.cumsum(toks_per_turn, out=offsets[1:])
    word_lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat_arr)
    text = pc.binary_join(word_lists, " ")

    # plant rare markers: conv idx % MARKER_STRIDE == 3 -> marker on turn 0
    marked = (conv_of_turn % MARKER_STRIDE == 3) & (turn_idx == 0)
    if marked.any():
        m_ids = (conv_of_turn[marked] // MARKER_STRIDE) % N_MARKERS
        suffix = np.array([""] * n_turns, dtype=object)
        suffix[marked] = [" " + marker_token(int(m)) for m in m_ids]
        text = pc.binary_join_element_wise(text, pa.array(suffix, pa.string()), "")

    # roles: deterministic cycle user/assistant with every 5th turn a tool turn
    role_cycle = np.where(turn_idx % 5 == 4, 2, turn_idx % 2)
    roles = np.array(["user", "assistant", "tool"])[role_cycle]
    tools = np.where(
        role_cycle == 2,
        np.array(TOOL_NAMES)[(conv_of_turn + turn_idx) % len(TOOL_NAMES)],
        "",
    )

    conv_ids = np.char.add("conv-", np.char.zfill(conv_of_turn.astype(str), 8))
    ts = EPOCH_US + conv_of_turn * 3_600_000_000 + turn_idx.astype(np.int64) * 1_000_000

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": text,
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def write_corpus(
    out_dir: str, n_convs: int, seed: int = 42, n_shards: int = 8
) -> str:
    """Write the corpus as ``n_shards`` parquet files (idempotent: if the
    directory already holds a matching ``_synth_manifest.json``, it is reused).

    Shards split on conversation boundaries so ``(conv_id, turn_idx)`` ordering
    is globally ascending across shard filenames — the stable-ordering
    invariant holds on disk.
    """
    import json

    manifest_path = os.path.join(out_dir, "_synth_manifest.json")
    # version 2: chunked generation (content changes above CHUNK_CONVS only)
    want = {"n_convs": n_convs, "seed": seed, "n_shards": n_shards, "version": 2}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == want:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    table = generate_transcripts(n_convs, seed)
    # shard on conv boundaries: conv idx -> shard by contiguous range
    conv_sorted = table  # generator already emits ascending (conv_id, turn_idx)
    n = conv_sorted.num_rows
    bounds = np.linspace(0, n, n_shards + 1).astype(np.int64)
    # snap bounds forward to conversation starts (turn_idx == 0)
    turn0 = conv_sorted["turn_idx"].to_numpy()
    for i in range(1, n_shards):
        b = bounds[i]
        while b < n and turn0[b] != 0:
            b += 1
        bounds[i] = b
    for i in range(n_shards):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        pq.write_table(conv_sorted.slice(lo, hi - lo), os.path.join(out_dir, f"part-{i:05d}.parquet"))
    with open(manifest_path, "w") as f:
        json.dump(want, f)
    return out_dir
