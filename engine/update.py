"""Incremental index maintenance — the ``Operation.ADD / REMOVE / RECOVER``
analog (UPD/StrucmotifUpdate.java:493-546) plus a compaction pass.

Semantics mirror the reference's delta planning:

- ADD: ``requested - known`` (anti-join vs the docmap, the known.list analog)
  is tokenized and merged into the existing segments. New postings land as
  ADDITIONAL RUNS per term — run ids are offset by ``generation * n_salts`` so
  they never collide with base or earlier-delta runs; the segment reader
  already merges a term's runs by concat+argsort, so queries see deltas with
  no reader changes (the concat-onto-existing-bucket merge of
  DefaultInvertedIndex.java:197-231, without decoding the existing bucket).
- REMOVE: affected doc_ids are masked out of every posting (decode -> filter
  -> re-encode per part, parallel Ray tasks) and dropped from the docmap.
- COMPACT: decode + re-encode every part under the CURRENT corpus stats,
  collapsing delta runs back to canonical salt runs and refreshing the
  block-max bounds baseline.

DocID minting for ADD follows the reference (next free index,
DefaultStructureIndexProvider.java:115-122): new docs get ids above the
current max, ordered by ``(conv_id, turn_idx)`` among themselves. The global
sorted-order invariant therefore holds per epoch, not across epochs — a
from-scratch rebuild reassigns; COMPACT does not renumber.

Block-max safety under drifting stats: block maxes are computed against the
avgdl at BASE-build time (``bounds_avgdl`` in stats.json) and deltas are
encoded against that same value. Scoring always uses the live avgdl; pruning
scales the stored bounds by ``max(1, avgdl_live / bounds_avgdl)``, a provable
upper bound on the impact ratio (the denominator ``tf + k1*(1-b+b*dl/avgdl)``
makes impact_new/impact_old <= max(1, avgdl_new/avgdl_old) for all tf, dl), so
pruned top-k stays exact without re-encoding after every update.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from . import state
from .build import _Router
from .segments import decode_posting, encode_bucket
from .tokenize import doc_length_batch, hash64_text, hash_scheme, tokenize_batch


def _docmap_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "docmap")


def _read_docmap(index_dir: str, columns=None) -> pa.Table:
    return pq.read_table(_docmap_dir(index_dir), columns=columns)


def _rewrite_docmap_marker(index_dir: str) -> tuple[int, float]:
    # per-file shard tasks fold (n, dl_sum) off-driver — the driver never
    # reads an O(n_docs) column (same discipline as build._build_dl_lookup;
    # per-file integer sums are exact in float64, so avgdl is layout-stable)
    from .build import _build_dl_lookup

    _ref, n_docs, avgdl, _fit, _meta = _build_dl_lookup(_docmap_dir(index_dir))
    state.atomic_write_bytes(
        json.dumps({"n_docs": n_docs, "avgdl": avgdl}).encode(),
        os.path.join(_docmap_dir(index_dir), "_SUCCESS.json"),
    )
    return n_docs, avgdl


def _refresh_stats(index_dir: str, n_docs: int, avgdl: float, generation: int) -> dict:
    stats = state.read_stats(index_dir)
    parts = state.committed_parts(index_dir)
    stats.update(
        n_docs=n_docs,
        avgdl=avgdl,
        bounds_avgdl=stats.get("bounds_avgdl", stats["avgdl"] if generation else avgdl),
        generation=generation,
        n_parts=len(parts),
        n_term_runs=int(sum(p["n_terms"] for p in parts.values())),
        n_postings=int(sum(p["n_postings"] for p in parts.values())),
    )
    state.write_stats(index_dir, stats)
    return stats


def _key_strings(conv: pa.Array | pa.ChunkedArray, turn: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """(conv_id, turn_idx) -> one sortable string key per row (vectorized)."""
    k = pc.binary_join_element_wise(
        conv, turn.cast(pa.int64()).cast(pa.string()), "\x1f"
    )
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    return k.to_numpy(zero_copy_only=False).astype(str)


@ray.remote
def _nrows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _assign_delta_ids(tbl: pa.Table, first_id: int) -> pa.Table:
    """Delta docID minting: block of the key-sorted delta + its global offset."""
    out = tbl.append_column(
        "doc_id", pa.array(first_id + np.arange(tbl.num_rows), pa.int64())
    )
    return out.drop_columns(["old_doc_id"]) if "old_doc_id" in out.column_names else out


@ray.remote(num_returns=2)
def _read_known_shard(path: str, transcripts: bool, has_hash: bool):
    """One docmap file -> sorted known-key shard (keys, doc_ids, hashes) kept
    in the object store; the driver folds only the O(1) metadata."""
    cols = (["conv_id", "turn_idx", "doc_id"] if transcripts else ["doc_id"]) + (
        ["content_hash"] if has_hash else []
    )
    t = pq.read_table(path, columns=cols)
    if transcripts:
        keys = _key_strings(t["conv_id"], t["turn_idx"])
    else:
        keys = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(keys, kind="stable")
    keys = keys[o]
    dids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[o]
    hs = (
        t["content_hash"].to_numpy(zero_copy_only=False).astype(np.int64)[o]
        if has_hash
        else None
    )
    n = len(keys)
    meta = {
        "n": n,
        "min": keys[0] if n else None,
        "max": keys[-1] if n else None,
        "max_doc": int(dids.max()) if n else -1,
    }
    return meta, (keys, dids, hs)


@ray.remote
def _merge_known_shards(*shards):
    """Overlap fallback: one merged sorted snapshot, assembled WORKER-side."""
    keys = np.concatenate([s[0] for s in shards])
    dids = np.concatenate([s[1] for s in shards])
    hs = (
        np.concatenate([s[2] for s in shards])
        if shards and shards[0][2] is not None
        else None
    )
    o = np.argsort(keys, kind="stable")
    return keys[o], dids[o], (hs[o] if hs is not None else None)


class KnownKeys:
    """Range-sharded known-key snapshot (the ``known.list`` analog,
    io/DefaultStateRepository.java:40-116) — VERDICT-r2-style scale shape:
    driver/task state is O(#shards) (sorted shard minima + ObjectRefs); each
    classify task fetches only the shards its batch's keys touch (plasma-
    cached per node), so nothing O(corpus keys) is ever broadcast whole."""

    def __init__(self, mins: np.ndarray, shard_refs: list):
        self.mins = mins
        self.shard_refs = shard_refs

    def lookup(self, bk: np.ndarray):
        """-> (found mask, known doc_id or -1, known content_hash or 0)."""
        n = len(bk)
        found = np.zeros(n, dtype=bool)
        dids = np.full(n, -1, dtype=np.int64)
        hsh = np.zeros(n, dtype=np.int64)
        if not len(self.mins) or n == 0:
            return found, dids, hsh
        sid = np.searchsorted(self.mins, bk, side="right") - 1
        for s in np.unique(sid):
            if s < 0:
                continue  # below every shard's min: unknown
            rows = np.flatnonzero(sid == s)
            ks, ds_, hs = ray.get(self.shard_refs[int(s)])
            kk = bk[rows]
            pos = np.searchsorted(ks, kk)
            inb = pos < len(ks)
            f = np.zeros(len(kk), dtype=bool)
            f[inb] = ks[pos[inb]] == kk[inb]
            hit_rows = rows[f]
            found[hit_rows] = True
            dids[hit_rows] = ds_[pos[f]]
            if hs is not None:
                hsh[hit_rows] = hs[pos[f]]
        return found, dids, hsh


def _build_known_keys(index_dir: str, transcripts: bool, has_hash: bool):
    """-> (KnownKeys, next_id). Per-docmap-file shard tasks + O(#files)
    driver metadata; overlapping key ranges (delta docmaps interleaving the
    base) fall back to a worker-side merged single shard."""
    files = sorted(
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(_docmap_dir(index_dir))
        for f in fs
        if f.endswith(".parquet")
    )
    meta_refs, data_refs = [], []
    for p in files:
        m, d = _read_known_shard.remote(p, transcripts, has_hash)
        meta_refs.append(m)
        data_refs.append(d)
    metas = ray.get(meta_refs)
    next_id = max((m["max_doc"] for m in metas), default=-1) + 1
    live = [(m, r) for m, r in zip(metas, data_refs) if m["n"]]
    live.sort(key=lambda x: x[0]["min"])
    disjoint = all(
        live[i + 1][0]["min"] > live[i][0]["max"] for i in range(len(live) - 1)
    )
    if not live:
        return KnownKeys(np.array([], dtype=np.int64), []), next_id
    if disjoint:
        mins = np.array([m["min"] for m, _ in live])
        return KnownKeys(mins, [r for _, r in live]), next_id
    merged = _merge_known_shards.remote(*[r for _, r in live])
    return KnownKeys(np.array([live[0][0]["min"]]), [merged]), next_id


@ray.remote
def _merge_part(index_dir: str, part: int, bounds_avgdl: float, codec: str, *tables) -> int | None:
    """One touched part: concat this part's delta sub-tables, encode the delta
    rows as NEW RUNS, append to the existing segment (existing runs are NOT
    decoded — the concat-onto-existing-bucket merge of
    DefaultInvertedIndex.java:197-231), atomic rewrite + manifest."""
    live = [t for t in tables if t is not None and t.num_rows]
    if not live:
        return None
    delta_seg = encode_bucket(pa.concat_tables(live), bounds_avgdl, codec=codec)
    path = state.segment_path(index_dir, part)
    if os.path.exists(path):
        merged = pa.concat_tables([pq.read_table(path), delta_seg]).sort_by(
            [("term", "ascending"), ("run", "ascending")]
        )
    else:
        merged = delta_seg
    tmp = path + ".tmp"
    pq.write_table(merged, tmp, row_group_size=16384)
    os.replace(tmp, path)
    state.write_part_manifest(
        index_dir,
        part,
        {
            "n_terms": merged.num_rows,
            "n_postings": int(pc.sum(merged["df"]).as_py() or 0),
            "n_tokens": int(pc.sum(merged["cf"]).as_py() or 0),
        },
    )
    return part


def add_documents(
    index_dir: str,
    source,
    *,
    text_col: str = "text",
    id_col: str | None = None,
    return_delta: bool = False,
) -> dict:
    """Merge new documents into an existing index — a RAY PIPELINE end to end
    (the delta never passes through the driver as data, only as object refs):

    1. classify (streaming map_batches): anti-join every delta row against the
       broadcast known-key snapshot (``pc.is_in``-style searchsorted filter —
       the known.list plan of StrucmotifUpdate.java:493-523). Revision-aware:
       a known key whose ``content_hash`` changed is a MODIFIED doc
       (known.list (major, minor) analog, DefaultStateRepository.java:57-61)
       — its old postings are purged and its new text re-indexed under a new
       docID. Unchanged known keys are skipped (idempotent ADD,
       StrucmotifUpdate.java:229-233).
    2. mint docIDs: key-sort the delta (Ray sort), per-block row counts ->
       driver prefix-sum over #blocks ints, per-block assign tasks.
    3. docmap delta: streaming write_parquet of (doc_id, key, dl, hash) rows.
    4. postings: tokenize -> committed routing -> per-part split ->
       ONE RAY TASK PER TOUCHED PART appends the delta as new runs
       (run ids offset by ``generation * n_salts``; existing runs untouched).

    Scale note: the known-key snapshot is RANGE-SHARDED per docmap file
    (:class:`KnownKeys`): one Ray task per file builds its sorted shard in
    the object store, the driver folds O(#files) metadata, and each classify
    task fetches only the shards its batch's keys touch — nothing
    O(corpus keys) is driver-resident or shipped whole. Overlapping key
    ranges fall back to a worker-side merged shard.
    """
    stats = state.read_stats(index_dir)
    # revision hashes written at build time are compared against hashes this
    # run computes — a scheme flip (e.g. polars removed from the env) would
    # silently classify every re-submitted known doc as MODIFIED and force a
    # full purge + re-index pass, so hard-fail instead (ADVICE r2)
    stored_scheme = stats.get("hash_scheme")
    if stored_scheme is not None and stored_scheme != hash_scheme():
        raise RuntimeError(
            f"content-hash scheme mismatch: index built with {stored_scheme!r} "
            f"but this environment computes {hash_scheme()!r}; rebuild the "
            "index or restore the original hash backend"
        )
    transcripts = bool(stats.get("transcripts_mode"))
    generation = int(stats.get("generation", 0)) + 1
    bounds_avgdl = float(stats.get("bounds_avgdl", stats["avgdl"]))
    n_buckets, n_salts = int(stats["n_buckets"]), int(stats["n_salts"])
    codec = stats.get("postings_codec", "varint")  # delta runs match the bundle

    ds = ray.data.read_parquet(source) if isinstance(source, str) else source

    # --- known-key snapshot (broadcast once) -----------------------------
    dm_schema = pq.read_schema(
        next(
            os.path.join(_docmap_dir(index_dir), f)
            for f in sorted(os.listdir(_docmap_dir(index_dir)))
            if f.endswith(".parquet")
        )
    )
    has_hash = "content_hash" in dm_schema.names
    cat_col = stats.get("category_col") if "category" in dm_schema.names else None
    # doc-values passthrough: deltas must carry every docvalues column the
    # base docmap has, or field sorts / range filters would KeyError on
    # delta-minted docIDs (and mixed-schema docmap reads would fail)
    dv_cols = [c for c in (stats.get("docvalues") or []) if c in dm_schema.names]
    if transcripts:
        ds = ds.select_columns(
            sorted(
                {"conv_id", "turn_idx", text_col}
                | ({cat_col} if cat_col else set())
                | set(dv_cols)
            )
        )
    else:
        id_col = id_col or "doc_id"
        ds = ds.select_columns(
            sorted(
                {id_col, text_col}
                | ({cat_col} if cat_col else set())
                | set(dv_cols)
            )
        )
    known_keys, next_id = _build_known_keys(index_dir, transcripts, has_hash)
    kref = ray.put(known_keys)  # O(#shards) object; shard data ships on demand

    # --- stage 1: classify ------------------------------------------------
    def classify(batch: pa.Table) -> pa.Table:
        kk: KnownKeys = ray.get(kref)
        if transcripts:
            bk = _key_strings(batch["conv_id"], batch["turn_idx"])
        else:
            bk = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        found, dids, hs = kk.lookup(bk)
        old_id = np.full(len(bk), -1, dtype=np.int64)
        if has_hash and found.any():
            bh = hash64_text(batch[text_col]).astype(np.int64)
            changed = found & (hs != bh)
            old_id[changed] = dids[changed]
            keep = ~found | changed
        else:
            keep = ~found
        out = batch.filter(pa.array(keep))
        return out.append_column("old_doc_id", pa.array(old_id[keep], pa.int64()))

    delta = ds.map_batches(classify, batch_format="pyarrow").materialize()
    n_delta = delta.count()
    if n_delta == 0:
        return {"added": 0, "replaced": 0, "generation": generation - 1, "parts_touched": 0}

    # --- purge superseded postings of modified docs -----------------------
    changed_blocks = [
        t
        for t in ray.get(
            delta.filter(expr="old_doc_id >= 0").select_columns(["old_doc_id"]).to_arrow_refs()
        )
        if t.num_rows
    ]
    replaced = 0
    if changed_blocks:
        changed_ids = np.sort(
            pa.concat_tables(changed_blocks)["old_doc_id"].to_numpy(zero_copy_only=False)
        )
        replaced = int(len(changed_ids))
        _purge_doc_ids(index_dir, changed_ids, bounds_avgdl, codec=codec)

    # --- stage 2: mint docIDs (key-sorted delta + per-block offsets) ------
    if transcripts:
        sort_keys = ["conv_id", "turn_idx"]
        blocks = delta.sort(sort_keys).to_arrow_refs()
        counts = ray.get([_nrows.remote(r) for r in blocks])
        offsets = next_id + np.concatenate(([0], np.cumsum(counts)[:-1]))
        assigned = [
            _assign_delta_ids.remote(r, int(off)) for r, off in zip(blocks, offsets)
        ]
        delta_ds = ray.data.from_arrow_refs(assigned).materialize()
        id_col = "doc_id"
    else:
        delta_ds = delta.drop_columns(["old_doc_id"]).materialize()

    # --- stage 3: docmap delta (streaming write) ---------------------------
    has_text = "text" in dm_schema.names  # index built with a doc store

    def docmap_fn(b: pa.Table) -> pa.Table:
        dl = doc_length_batch(b, id_col=id_col, text_col=text_col,
                              stopwords=stats.get("stopwords") or None)
        cols = {"doc_id": dl["doc_id"]}
        if transcripts:
            cols.update(conv_id=b["conv_id"], turn_idx=b["turn_idx"])
        cols["dl"] = dl["dl"]
        cols["content_hash"] = pa.array(hash64_text(b[text_col]).astype(np.int64), pa.int64())
        if has_text:
            cols["text"] = b[text_col]
        if cat_col:
            cols["category"] = b[cat_col].cast(pa.string())
        for c in dv_cols:
            if c not in cols:
                if c not in b.schema.names:
                    raise ValueError(
                        f"ADD delta is missing doc-values column {c!r} "
                        "required by the base index's docmap schema"
                    )
                cols[c] = b[c].cast(dm_schema.field(c).type)
        return pa.table(cols)

    delta_dir = os.path.join(_docmap_dir(index_dir), f"delta-{generation:04d}")
    delta_ds.map_batches(docmap_fn, batch_format="pyarrow").write_parquet(delta_dir)
    if bounds_avgdl <= 0.0:
        # base index was EMPTY (avgdl 0): the delta defines the block-max
        # encoding baseline; persist it so query-time bound scaling
        # (max(1, avgdl_live / bounds_avgdl)) uses the same value
        bounds_avgdl = max(
            1.0, float(pc.mean(pq.read_table(delta_dir, columns=["dl"])["dl"]).as_py() or 0.0)
        )
        stats["bounds_avgdl"] = bounds_avgdl
        state.write_stats(index_dir, stats)

    # --- stage 4: tokenize -> committed routing -> per-part merge tasks ---
    hot_ref = ray.put(stats.get("hot_terms", []))
    router = _Router(hot_ref, n_buckets, n_salts)
    run_offset = generation * n_salts
    positional = bool(stats.get("positional"))
    analyzer = str(stats.get("analyzer", "standard"))
    stop_list = stats.get("stopwords") or None

    def route_offset(batch: pa.Table) -> pa.Table:
        rows = router(
            tokenize_batch(batch, id_col=id_col, text_col=text_col,
                           positions=positional, analyzer=analyzer,
                           stopwords=stop_list)
        )
        return rows.set_column(
            rows.schema.get_field_index("salt"),
            "salt",
            pc.add(rows["salt"], pa.scalar(run_offset, pa.int32())).cast(pa.int32()),
        )

    n_parts_total = n_buckets * n_salts

    @ray.remote(num_returns=n_parts_total)
    def split_block(tbl: pa.Table):
        if tbl.num_rows == 0 or "part" not in tbl.column_names:
            # empty upstream blocks skip the map UDF and keep the input schema
            return tuple(None for _ in range(n_parts_total))
        part = tbl["part"].to_numpy(zero_copy_only=False)
        o = np.argsort(part, kind="stable")
        s = tbl.take(pa.array(o))
        bounds = np.searchsorted(part[o], np.arange(n_parts_total + 1))
        return tuple(
            s.slice(int(lo), int(hi - lo)) for lo, hi in zip(bounds[:-1], bounds[1:])
        )

    routed_refs = delta_ds.map_batches(route_offset, batch_format="pyarrow").to_arrow_refs()
    if len(routed_refs) == 0:
        split_refs = []
    else:
        split_refs = [split_block.remote(r) for r in routed_refs]
    merge_refs = [
        _merge_part.remote(
            index_dir, p, bounds_avgdl, codec,
            *[split_refs[i][p] for i in range(len(split_refs))]
        )
        for p in range(n_parts_total)
    ]
    parts_touched = sum(1 for r in ray.get(merge_refs) if r is not None)

    n_docs, avgdl = _rewrite_docmap_marker(index_dir)
    _refresh_stats(index_dir, n_docs, avgdl, generation)
    report = {
        "added": int(n_delta),
        "replaced": replaced,
        "generation": generation,
        "parts_touched": parts_touched,
    }
    if return_delta:
        # the freshly indexed rows (doc_id + text), for post-ADD consumers
        # (e.g. standing-query percolation — update_and_percolate)
        report["delta_ds"] = delta_ds
    return report


def _reencode_part(
    index_dir: str,
    part: int,
    avgdl_for_bounds: float,
    remove_ids: np.ndarray | None,
    dl_lookup: tuple[np.ndarray, np.ndarray],
    collapse_runs: bool = False,
    n_salts: int = 1,
    codec: str = "varint",
) -> dict | None:
    """Decode one part -> exploded rows -> (filter) -> encode -> rewrite.
    Returns the new manifest info, or None if the part becomes empty."""
    path = state.segment_path(index_dir, part)
    if not os.path.exists(path):
        return None
    tbl = pq.read_table(path)
    # bulk column conversion once (vs per-row .as_py() — ~3x on wide parts)
    docs_enc = tbl["doc_ids_enc"].to_pylist()
    tfs_enc = tbl["tfs_enc"].to_pylist()
    runs_col = tbl["run"].to_numpy(zero_copy_only=False)
    terms_col = tbl["term"].to_pylist()
    has_pos = "pos_enc" in tbl.column_names
    pos_enc_l = tbl["pos_enc"].to_pylist() if has_pos else None
    from .codec import get_codec

    cdc = get_codec(codec)
    terms, salts, docs, tfs, pos_vals, pos_counts = [], [], [], [], [], []
    for i in range(tbl.num_rows):
        d, t = decode_posting(docs_enc[i], tfs_enc[i], codec=codec)
        keep = None
        if remove_ids is not None and len(d):
            keep = ~np.isin(d, remove_ids, assume_unique=True)
        if has_pos and len(d):
            # reconstruct absolute positions, then drop removed docs' spans
            deltas = cdc.decode(pos_enc_l[i]).astype(np.int64)
            vb = np.zeros(len(d) + 1, dtype=np.int64)
            np.cumsum(t, out=vb[1:])
            c = np.cumsum(deltas)
            corr = np.zeros(len(d), dtype=np.int64)
            corr[1:] = c[vb[1:-1] - 1]
            abs_pos = c - np.repeat(corr, t)
            if keep is not None:
                abs_pos = abs_pos[np.repeat(keep, t)]
        if keep is not None:
            d, t = d[keep], t[keep]
        if not len(d):
            continue
        run = int(runs_col[i])
        terms.append(np.full(len(d), terms_col[i], dtype=object))
        salts.append(np.full(len(d), run % n_salts if collapse_runs else run, dtype=np.int32))
        docs.append(d)
        tfs.append(t)
        if has_pos:
            pos_vals.append(abs_pos)
            pos_counts.append(t)
    if not docs:
        os.remove(path)
        mp = state.manifest_path(index_dir, part)
        if os.path.exists(mp):
            os.remove(mp)
        return None
    doc_all = np.concatenate(docs)
    if hasattr(dl_lookup, "gather"):  # range-sharded lookup (build.ShardedDl)
        dl_all = dl_lookup.gather(doc_all).astype(np.int64)
    else:
        ids_sorted, dl_sorted = dl_lookup
        dl_all = dl_sorted[np.searchsorted(ids_sorted, doc_all)]
    cols = {
        "term": pa.array(np.concatenate(terms), pa.string()),
        "salt": pa.array(np.concatenate(salts), pa.int32()),
        "doc_id": pa.array(doc_all, pa.int64()),
        "tf": pa.array(np.concatenate(tfs).astype(np.int32)),
        "dl": pa.array(dl_all.astype(np.int32)),
    }
    if has_pos:
        counts = np.concatenate(pos_counts)
        offs = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        cols["pos"] = pa.ListArray.from_arrays(
            pa.array(offs), pa.array(np.concatenate(pos_vals).astype(np.int32), pa.int32())
        )
    rows = pa.table(cols)
    # collapsed runs may merge docs of the same (term, salt): encode_bucket
    # requires strictly ascending docs per group, which holds because runs
    # are doc-disjoint and docs are unique per term
    seg = encode_bucket(rows, avgdl_for_bounds, codec=codec)
    tmp = path + ".tmp"
    pq.write_table(seg, tmp, row_group_size=16384)
    os.replace(tmp, path)
    info = {
        "n_terms": seg.num_rows,
        "n_postings": int(pc.sum(seg["df"]).as_py() or 0),
        "n_tokens": int(pc.sum(seg["cf"]).as_py() or 0),
    }
    state.write_part_manifest(index_dir, part, info)
    return info


_reencode_part_remote = ray.remote(_reencode_part)


def _recover_docmap_swap(ddir: str) -> None:
    """Roll back a docmap swap that crashed mid-flight (see _purge_doc_ids).

    No backup dir -> nothing to do. Backup WITHOUT the COMMIT marker ->
    crash during evacuation: ddir still holds only originals; move the
    evacuated ones back. Backup WITH the marker -> crash during populate:
    ddir parquet files are partial new-generation output; drop them and
    restore the complete originals (postings may already be purged — a
    docmap superset is query-consistent, and re-running the remove
    converges). A ``.old.deleting`` dir is a backup already RENAMED AWAY
    after a completed swap (the rename is the commit point of the delete) —
    pure garbage, removed without looking inside; a crash mid-rmtree can
    therefore never be mistaken for a mid-evacuation crash and restore
    stale-generation files over new ones. Every path ends with a complete
    docmap and no backup dir."""
    import shutil

    backup = ddir + ".old"
    shutil.rmtree(backup + ".deleting", ignore_errors=True)
    if not os.path.isdir(backup):
        return
    marker = os.path.join(backup, "COMMIT")
    if os.path.exists(marker):
        for name in os.listdir(ddir):
            path = os.path.join(ddir, name)
            shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
        os.remove(marker)
    for name in os.listdir(backup):
        os.replace(os.path.join(backup, name), os.path.join(ddir, name))
    os.rmdir(backup)


def _purge_doc_ids(index_dir: str, remove: np.ndarray, bounds_avgdl: float,
                   codec: str = "varint") -> int:
    """Mask the given doc_ids out of every posting (ONE RAY TASK PER PART —
    the decode->filter->re-encode work is embarrassingly parallel across
    bucket files) and drop them from the docmap (consolidated rewrite).
    Returns the number of parts touched."""
    _recover_docmap_swap(_docmap_dir(index_dir))
    remove = np.unique(np.asarray(remove, dtype=np.int64))
    # removed ids may still appear inside postings being decoded; the
    # range-sharded lookup covers every doc (value unused for removed docs —
    # they are filtered before encode). O(removal) driver state only.
    from .build import _build_dl_lookup

    ddir = _docmap_dir(index_dir)
    dl_ref, _n, _avg, _fit, _meta = _build_dl_lookup(ddir)
    rref = ray.put(remove)
    parts = sorted(state.committed_parts(index_dir))
    results = ray.get(
        [
            _reencode_part_remote.remote(index_dir, p, bounds_avgdl, rref, dl_ref, codec=codec)
            for p in parts
        ]
    )

    # rewrite docmap STREAMING (delta dirs folded in): Ray Data filter pass
    # into a temp dir, then swap — the docmap never passes through the driver
    import shutil

    files = sorted(
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(ddir)
        for f in fs
        if f.endswith(".parquet")
    )
    schema = pq.read_schema(files[0])

    def drop_removed(batch: pa.Table) -> pa.Table:
        rem = ray.get(rref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rem, ids)
        dead = (pos < len(rem)) & (rem[np.minimum(pos, len(rem) - 1)] == ids)
        return batch.filter(pa.array(~dead))

    tmp_dir = ddir + ".rewrite"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ray.data.read_parquet(files).map_batches(
        drop_removed, batch_format="pyarrow"
    ).write_parquet(tmp_dir)
    os.makedirs(tmp_dir, exist_ok=True)  # zero surviving rows: no files emitted
    new_files = sorted(f for f in os.listdir(tmp_dir) if f.endswith(".parquet"))
    if not new_files:  # every doc removed: keep a schema-complete empty docmap
        pq.write_table(schema.empty_table(), os.path.join(tmp_dir, "part-empty.parquet"))
        new_files = ["part-empty.parquet"]
    # Crash-safe swap (ADVICE r3): every intermediate state keeps a complete
    # docmap on disk. Phase 1 renames originals into a backup dir; a COMMIT
    # marker then declares the backup authoritative; phase 2 renames the
    # rewrite in; only then is the backup dropped. _recover_docmap_swap
    # rolls a crashed swap back from whichever side is complete.
    backup = ddir + ".old"
    shutil.rmtree(backup, ignore_errors=True)
    os.makedirs(backup)
    for name in os.listdir(ddir):
        os.replace(os.path.join(ddir, name), os.path.join(backup, name))
    with open(os.path.join(backup, "COMMIT"), "w") as f:
        f.write("docmap evacuation complete; ddir parquet is new-generation\n")
    for i, f in enumerate(new_files):
        os.replace(
            os.path.join(tmp_dir, f), os.path.join(ddir, f"docmap-{i:04d}.parquet")
        )
    # commit the delete with ONE atomic rename before any unlink: a crash
    # mid-rmtree must never leave a marker-less backup that the next
    # _recover_docmap_swap would "restore" over the new generation
    doomed = backup + ".deleting"
    shutil.rmtree(doomed, ignore_errors=True)
    os.rename(backup, doomed)
    shutil.rmtree(doomed)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return sum(1 for r in results if r is not None)


def remove_documents(index_dir: str, *, conv_ids=None, doc_ids=None) -> dict:
    """Remove documents (by conv_id or doc_id) from the index + docmap."""
    stats = state.read_stats(index_dir)
    generation = int(stats.get("generation", 0)) + 1
    bounds_avgdl = float(stats.get("bounds_avgdl", stats["avgdl"]))

    # victim resolution STREAMS the docmap; only matching ids (bounded by
    # the removal size) reach the driver
    cols = ["doc_id", "conv_id"] if conv_ids is not None else ["doc_id"]
    conv_set = pa.array(list(conv_ids), pa.string()) if conv_ids is not None else None
    id_set = (
        pa.array(sorted(int(d) for d in doc_ids), pa.int64())
        if doc_ids is not None and conv_ids is None
        else None
    )

    def match(batch: pa.Table) -> pa.Table:
        if conv_set is not None:
            m = pc.is_in(batch["conv_id"], value_set=conv_set)
        else:
            m = pc.is_in(batch["doc_id"], value_set=id_set)
        return pa.table({"doc_id": batch.filter(m)["doc_id"]})

    hit_blocks = [
        t
        for t in ray.get(
            ray.data.read_parquet(_docmap_dir(index_dir), columns=cols)
            .map_batches(match, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    remove = (
        np.sort(
            np.concatenate(
                [t["doc_id"].to_numpy(zero_copy_only=False) for t in hit_blocks]
            )
        )
        if hit_blocks
        else np.array([], dtype=np.int64)
    )
    if len(remove) == 0:
        return {"removed": 0, "generation": generation - 1}

    parts_touched = _purge_doc_ids(
        index_dir, remove, bounds_avgdl, codec=stats.get("postings_codec", "varint")
    )
    n_docs, avgdl = _rewrite_docmap_marker(index_dir)
    _refresh_stats(index_dir, n_docs, avgdl, generation)
    return {
        "removed": int(len(remove)),
        "generation": generation,
        "parts_touched": parts_touched,
    }


def compact_index(index_dir: str) -> dict:
    """Re-encode every part under the live corpus stats: delta runs collapse
    back into canonical salt runs, ``bounds_avgdl`` snaps to the live avgdl
    (restoring tight block-max bounds), generation resets."""
    stats = state.read_stats(index_dir)
    n_salts = int(stats["n_salts"])
    from .build import _build_dl_lookup

    lref, _n, _avg, _fit, _meta = _build_dl_lookup(_docmap_dir(index_dir))
    avgdl = float(stats["avgdl"])
    ray.get(
        [
            _reencode_part_remote.remote(
                index_dir, p, avgdl, None, lref, collapse_runs=True,
                n_salts=n_salts, codec=stats.get("postings_codec", "varint")
            )
            for p in sorted(state.committed_parts(index_dir))
        ]
    )
    new_stats = _refresh_stats(index_dir, int(stats["n_docs"]), avgdl, 0)
    new_stats["bounds_avgdl"] = avgdl
    state.write_stats(index_dir, new_stats)
    return {"parts": new_stats["n_parts"], "bounds_avgdl": avgdl}


def reindex(
    src_dir: str,
    dst_dir: str,
    *,
    analyzer: str | None = None,
    stopwords: list[str] | None = None,
    postings_codec: str | None = None,
    positions: bool | None = None,
    n_buckets=None,
    n_salts: int | None = None,
) -> dict:
    """Rebuild an index FROM ITS OWN DOC STORE under a new analyzer chain /
    codec / positional setting — the ES ``_reindex`` lifecycle verb. The
    reference's analog is re-running the update pipeline over the persisted
    renumbered structures (CORE/io/DefaultStructureDataProvider.java: the
    renumbered store is the system of record once ingested); here the docmap
    text column is that system of record, so no raw corpus access is needed.

    ``None`` params inherit the source index's setting (stats.json), so
    ``reindex(src, dst, analyzer="s_stem")`` changes ONLY the analyzer.
    DocIDs are preserved: id-mode rebuilds on the stored ``doc_id``;
    transcripts mode re-mints from the stored ``(conv_id, turn_idx)``, and
    the minting invariant (dense ids in sorted key order) reproduces the
    identical assignment. Category + doc-values columns are carried through.
    The destination build is resumable like any other (per-part manifests);
    re-running a crashed reindex with the same args resumes it.

    Scale shape: one streaming read of the docmap (pruned to the needed
    columns) feeding the normal build exchange — never materializes the
    corpus on the driver.
    """
    stats = state.read_stats(src_dir)
    dm_schema = pq.read_schema(
        next(
            os.path.join(r, f)
            for r, _d, fs in os.walk(_docmap_dir(src_dir))
            for f in sorted(fs)
            if f.endswith(".parquet")
        )
    )
    if "text" not in dm_schema.names:
        raise ValueError(
            "reindex requires an index built with store_text=True "
            "(the docmap is the system of record; this one has no text column)"
        )
    transcripts = bool(stats.get("transcripts_mode"))
    cat_col = stats.get("category_col")
    dv = [c for c in (stats.get("docvalues") or []) if c in dm_schema.names]
    cols = ["text"] + dv
    if transcripts:
        cols += ["conv_id", "turn_idx"]
    else:
        cols += ["doc_id"]
    if cat_col and "category" in dm_schema.names and "category" not in cols:
        cols.append("category")
    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(_docmap_dir(src_dir))
        for f in fs
        if f.endswith(".parquet")
    )
    ds = ray.data.read_parquet(files, columns=sorted(set(cols)))
    if cat_col and cat_col != "category" and "category" in ds.schema().names:
        # the docmap stores the class column under the fixed name "category";
        # build_index(category_col=...) wants the ORIGINAL source name back
        ds = ds.rename_columns({"category": cat_col})

    from .build import build_index

    return build_index(
        ds,
        dst_dir,
        id_col=None if transcripts else "doc_id",
        n_buckets=stats["n_buckets"] if n_buckets is None else n_buckets,
        n_salts=int(stats["n_salts"]) if n_salts is None else int(n_salts),
        positions=bool(stats.get("positional")) if positions is None else bool(positions),
        store_text=True,
        category_col=cat_col,
        postings_codec=stats.get("postings_codec", "varint")
        if postings_codec is None
        else postings_codec,
        docvalues=dv,
        analyzer=str(stats.get("analyzer", "standard")) if analyzer is None else analyzer,
        stopwords=list(stats.get("stopwords") or []) if stopwords is None else stopwords,
    )


@ray.remote
def _graft_part(dst_dir: str, part: int, src_path: str, run_offset: int) -> int:
    """Append one src segment file to dst part ``part`` with run ids offset —
    postings blobs move verbatim, nothing is decoded. IDEMPOTENT: a part
    whose max run id already reaches this generation's offset was grafted by
    a previous (crashed) attempt — the segment rewrite is atomic, so it is
    either fully grafted or untouched — and is skipped, which is what makes
    a crashed merge safely re-runnable."""
    src = pq.read_table(src_path)
    i = src.schema.get_field_index("run")
    src = src.set_column(
        i, "run", pc.add(src["run"], pa.scalar(run_offset, pa.int32())).cast(pa.int32())
    )
    path = state.segment_path(dst_dir, part)
    if os.path.exists(path):
        dst_tbl = pq.read_table(path)
        prior_max = pc.max(dst_tbl["run"]).as_py()
        if prior_max is not None and int(prior_max) >= run_offset:
            return part  # this generation's runs are already in
        merged = pa.concat_tables([dst_tbl, src]).sort_by(
            [("term", "ascending"), ("run", "ascending")]
        )
    else:
        merged = src
    tmp = path + ".tmp"
    pq.write_table(merged, tmp, row_group_size=16384)
    os.replace(tmp, path)
    state.write_part_manifest(
        dst_dir,
        part,
        {
            "n_terms": merged.num_rows,
            "n_postings": int(pc.sum(merged["df"]).as_py() or 0),
            "n_tokens": int(pc.sum(merged["cf"]).as_py() or 0),
        },
    )
    return part


@ray.remote
def _copy_file(src: str, dst: str) -> None:
    import shutil

    tmp = dst + ".tmp"
    shutil.copyfile(src, tmp)
    os.replace(tmp, dst)


@ray.remote
def _id_collisions(dst_dl, path: str) -> int:
    """#src docIDs (one docmap file) already present in dst — routed through
    dst's range-sharded id shards, nothing O(corpus) anywhere."""
    ids = np.sort(
        pq.read_table(path, columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if not hasattr(dst_dl, "mins"):  # overlap-fallback single sorted lookup
        shard_ids, _dls = dst_dl
        if not len(shard_ids) or not len(ids):
            return 0
        pos = np.clip(np.searchsorted(shard_ids, ids), 0, len(shard_ids) - 1)
        return int((shard_ids[pos] == ids).sum())
    sid = np.searchsorted(dst_dl.mins, ids, side="right") - 1
    n = 0
    for s in np.unique(sid[sid >= 0]):
        m = sid == s
        shard_ids, dls, lo = dst_dl._shard(int(s))
        d = ids[m]
        if shard_ids is None:  # dense shard: presence == in-range
            n += int(((d >= lo) & (d < lo + len(dls))).sum())
        else:
            pos = np.clip(np.searchsorted(shard_ids, d), 0, len(shard_ids) - 1)
            n += int((shard_ids[pos] == d).sum())
    return n


def merge_indexes(dst_dir: str, src_dir: str) -> dict:
    """Graft every posting run of ``src_dir`` into ``dst_dir`` — the
    two-bundle variant of the reference's concat-onto-existing-bucket merge
    (CORE/io/DefaultInvertedIndex.java:197-231): src segment rows append to
    dst parts as NEW RUNS (run ids offset by ``generation * n_salts``, the
    same scheme ADD uses), existing runs untouched, posting blobs never
    decoded. Docmap rows copy over as a delta generation; corpus stats
    recompute from the merged docmap; ``hot_terms`` becomes the union (a
    term hot in either bundle is probed across all salted parts, which
    always includes the cold bucket, so every run stays reachable);
    ``bounds_avgdl`` becomes the MIN of the two so every stored block-max
    bound remains an upper bound under merged stats (the query-side
    ``_bound_scale`` covers the avgdl drift; scores are exact regardless).

    Refuses on mismatched routing/codec contracts and on any docID
    collision (checked distributed: one task per src docmap file against
    dst's range-sharded id shards). Requires id-mode indexes — transcripts
    bundles both mint dense ids from 0 and always collide."""
    dst = state.read_stats(dst_dir)
    src = state.read_stats(src_dir)
    for key in ("n_buckets", "n_salts", "postings_codec", "hash_scheme",
                "positional", "category_col", "transcripts_mode", "docvalues",
                "analyzer", "stopwords"):
        a, b = dst.get(key), src.get(key)
        if key == "docvalues":  # absent (pre-docvalues index) == empty
            a, b = list(a or []), list(b or [])
        elif key == "analyzer":  # absent (pre-analyzer index) == standard
            a, b = a or "standard", b or "standard"
        elif key == "stopwords":  # absent == no stop filter
            a, b = list(a or []), list(b or [])
        if a != b:
            raise ValueError(
                f"merge refused: routing/format contract mismatch on {key!r} "
                f"({dst.get(key)!r} vs {src.get(key)!r})"
            )
    if dst.get("transcripts_mode"):
        raise ValueError(
            "merge refused: transcripts-mode bundles mint overlapping dense "
            "docIDs; merge id-mode indexes (or re-ADD the raw transcripts)"
        )
    # docmap SCHEMA equality (the old standalone-merge guard): src rows copy
    # into dst verbatim, so any column-set/type drift — store_text on one
    # side, a differently-typed docvalue — would produce a mixed-schema
    # docmap whose text/values surfaces fail long after the merge "succeeded"
    def _docmap_schema(d: str) -> dict[str, str]:
        files = sorted(
            os.path.join(root, f)
            for root, _dirs, fs in os.walk(_docmap_dir(d))
            for f in fs
            if f.endswith(".parquet")
        )
        s = pq.read_schema(files[0])
        return {n: str(t) for n, t in zip(s.names, s.types)}

    a, b = _docmap_schema(dst_dir), _docmap_schema(src_dir)
    if a != b:
        raise ValueError(
            f"merge refused: docmap schemas differ (dst {sorted(a.items())} "
            f"vs src {sorted(b.items())}); rebuild one side with matching "
            "store_text/category/docvalues settings"
        )

    src_files = sorted(
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(_docmap_dir(src_dir))
        for f in fs
        if f.endswith(".parquet")
    )
    src_docs = sum(pq.read_metadata(p).num_rows for p in src_files)

    # Crash-resume journal: the collision check is only valid BEFORE any src
    # docmap rows land in dst, and the generation must stay fixed across
    # attempts (it is the part-graft idempotency key). Journal first; a
    # re-run with a matching journal resumes — skips the collision check,
    # reuses the journaled generation — and every later step is idempotent
    # (part grafts skip via run-id marker, docmap copies overwrite the same
    # delta file names, stats recompute from what is on disk).
    jpath = os.path.join(dst_dir, "merge-journal.json")
    src_key = os.path.realpath(src_dir)
    if os.path.exists(jpath):
        with open(jpath) as f:
            journal = json.load(f)
        if journal.get("src") != src_key:
            raise ValueError(
                f"merge refused: unfinished merge of {journal.get('src')!r} "
                "in progress; re-run that merge (or remove merge-journal.json "
                "after manual repair) first"
            )
        generation = int(journal["generation"])
    else:
        from .build import _build_dl_lookup

        dl_ref, _dst_docs, _dst_avgdl, _fit, _meta = _build_dl_lookup(
            _docmap_dir(dst_dir)
        )
        # dl_ref auto-dereferences inside each task (ShardedDl or the legacy
        # merged (ids, dls) overlap fallback — _id_collisions handles both)
        collisions = sum(
            ray.get([_id_collisions.remote(dl_ref, p) for p in src_files])
        )
        if collisions:
            raise ValueError(
                f"merge refused: docID spaces overlap — {collisions} src "
                "docIDs already present in dst"
            )
        generation = int(dst.get("generation", 0)) + 1
        state.atomic_write_bytes(
            json.dumps({"src": src_key, "generation": generation}).encode(), jpath
        )

    run_offset = generation * int(dst["n_salts"])
    src_parts = state.committed_parts(src_dir)
    ray.get(
        [
            _graft_part.remote(
                dst_dir, p, state.segment_path(src_dir, p), run_offset
            )
            for p in sorted(src_parts)
        ]
    )

    delta_dir = os.path.join(_docmap_dir(dst_dir), f"delta-{generation:04d}")
    os.makedirs(delta_dir, exist_ok=True)
    # one task per docmap file (names deterministic -> re-copy on resume
    # overwrites, never duplicates); the driver never streams docmap bytes
    ray.get(
        [
            _copy_file.remote(p, os.path.join(delta_dir, f"merged-{i:05d}.parquet"))
            for i, p in enumerate(src_files)
        ]
    )

    n_docs, avgdl = _rewrite_docmap_marker(dst_dir)
    new_stats = _refresh_stats(dst_dir, n_docs, avgdl, generation)
    new_stats["bounds_avgdl"] = min(
        float(dst.get("bounds_avgdl", dst["avgdl"])),
        float(src.get("bounds_avgdl", src["avgdl"])),
    )
    new_stats["hot_terms"] = sorted(
        set(dst.get("hot_terms", [])) | set(src.get("hot_terms", []))
    )
    new_stats["inputs"] = list(dst.get("inputs", [])) + list(src.get("inputs", []))
    state.write_stats(dst_dir, new_stats)
    # keep the build-resume routing contract in step with the union hot set
    rpath = os.path.join(dst_dir, "routing.json")
    if os.path.exists(rpath):
        with open(rpath) as f:
            contract = json.load(f)
        contract["hot_terms"] = new_stats["hot_terms"]
        state.atomic_write_bytes(
            json.dumps(contract, sort_keys=True).encode(), rpath
        )
    os.remove(jpath)  # merge committed; journal no longer claims the dir
    return {
        "merged_docs": src_docs,
        "n_docs": n_docs,
        "parts_touched": len(src_parts),
        "generation": generation,
    }


def update_and_percolate(
    index_dir: str,
    source,
    queries: list[dict],
    *,
    mode: str = "any",
    text_col: str = "text",
    id_col: str | None = None,
    concurrency: int = 4,
):
    """Incremental ADD + standing-query alerts over the freshly indexed docs
    — the detect-motifs-on-update composite (the reference percolates new
    structures against its motif registry during the update cycle,
    Strucmotif.detectMotifs + StrucmotifUpdate ADD).

    Runs :func:`add_documents`, then streams ONLY the delta (the docs that
    were actually indexed this call — re-submitted unchanged docs never
    re-alert, the idempotent-ADD contract) through the actor-pool percolator
    against the UPDATED index stats. Returns ``(report, alerts)`` where
    ``alerts`` is a Dataset of (doc_id, query_id, score) matches.
    """
    from .percolate import percolate_dataset

    report = add_documents(
        index_dir, source, text_col=text_col, id_col=id_col, return_delta=True
    )
    delta_ds = report.pop("delta_ds", None)
    if delta_ds is None or report["added"] == 0:
        import ray.data as _rd

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "query_id": pa.array([], pa.string()),
                "score": pa.array([], pa.float64()),
            }
        )
        return report, _rd.from_arrow(empty)
    alerts = percolate_dataset(
        delta_ds, index_dir, queries, mode=mode, concurrency=concurrency,
        id_col="doc_id", text_col=text_col,
    )
    return report, alerts
