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
from .tokenize import doc_length_batch, tokenize_batch


def _docmap_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "docmap")


def _read_docmap(index_dir: str, columns=None) -> pa.Table:
    return pq.read_table(_docmap_dir(index_dir), columns=columns)


def _rewrite_docmap_marker(index_dir: str) -> tuple[int, float]:
    dm = _read_docmap(index_dir, columns=["dl"])
    n_docs = dm.num_rows
    avgdl = float(pc.mean(dm["dl"]).as_py() or 0.0)
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


def add_documents(
    index_dir: str,
    source,
    *,
    text_col: str = "text",
    id_col: str | None = None,
) -> dict:
    """Merge new documents into an existing index (idempotent: already-known
    keys are skipped, StrucmotifUpdate.java:229-233)."""
    stats = state.read_stats(index_dir)
    transcripts = bool(stats.get("transcripts_mode"))
    generation = int(stats.get("generation", 0)) + 1
    bounds_avgdl = float(stats.get("bounds_avgdl", stats["avgdl"]))
    n_buckets, n_salts = int(stats["n_buckets"]), int(stats["n_salts"])

    ds = ray.data.read_parquet(source) if isinstance(source, str) else source

    if transcripts:
        known = _read_docmap(index_dir, columns=["conv_id", "turn_idx", "doc_id"])
        known_keys = set(
            zip(known["conv_id"].to_pylist(), known["turn_idx"].to_pylist())
        )
        next_id = (
            int(pc.max(known["doc_id"]).as_py()) + 1 if known.num_rows else 0
        )
        new_tbl = pa.concat_tables(
            [t for t in ray.get(ds.select_columns(["conv_id", "turn_idx", "text"]).to_arrow_refs()) if t.num_rows]
        ) if ds.count() else pa.table({"conv_id": pa.array([], pa.string()), "turn_idx": pa.array([], pa.int32()), "text": pa.array([], pa.string())})
        mask = [
            (c, t) not in known_keys
            for c, t in zip(new_tbl["conv_id"].to_pylist(), new_tbl["turn_idx"].to_pylist())
        ]
        new_tbl = new_tbl.filter(pa.array(mask, pa.bool_()))
        order = pc.sort_indices(
            new_tbl, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        new_tbl = new_tbl.take(order)
        new_tbl = new_tbl.append_column(
            "doc_id", pa.array(next_id + np.arange(new_tbl.num_rows), pa.int64())
        )
        id_col = "doc_id"
        docmap_delta = pa.table(
            {
                "doc_id": new_tbl["doc_id"],
                "conv_id": new_tbl["conv_id"],
                "turn_idx": new_tbl["turn_idx"],
                "dl": doc_length_batch(new_tbl, id_col="doc_id", text_col=text_col)["dl"],
            }
        )
    else:
        id_col = id_col or "doc_id"
        known = _read_docmap(index_dir, columns=["doc_id"])
        known_ids = pa.array(known["doc_id"].to_pylist(), pa.int64())
        blocks = [t for t in ray.get(ds.select_columns([id_col, text_col]).to_arrow_refs()) if t.num_rows]
        new_tbl = (
            pa.concat_tables(blocks)
            if blocks
            else pa.table({id_col: pa.array([], pa.int64()), text_col: pa.array([], pa.string())})
        )
        new_tbl = new_tbl.filter(
            pc.invert(pc.is_in(new_tbl[id_col].cast(pa.int64()), value_set=known_ids))
        )
        docmap_delta = doc_length_batch(new_tbl, id_col=id_col, text_col=text_col)

    if new_tbl.num_rows == 0:
        return {"added": 0, "generation": generation - 1, "parts_touched": 0}

    # tokenize + route with the COMMITTED routing (hot set pinned in stats),
    # then offset run ids into this generation's namespace
    hot_ref = ray.put(stats.get("hot_terms", []))
    router = _Router(hot_ref, n_buckets, n_salts)
    rows = router(tokenize_batch(new_tbl, id_col=id_col, text_col=text_col))
    run_offset = generation * n_salts
    rows = rows.set_column(
        rows.schema.get_field_index("salt"),
        "salt",
        pc.add(rows["salt"], pa.scalar(run_offset, pa.int32())).cast(pa.int32()),
    )

    # merge per touched part: append the delta rows as new runs (existing
    # rows are NOT decoded), atomic rewrite + manifest update
    parts_touched = 0
    for part in sorted(set(rows["part"].to_pylist())):
        sub = rows.filter(pc.equal(rows["part"], part))
        delta_seg = encode_bucket(sub, bounds_avgdl)
        path = state.segment_path(index_dir, int(part))
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
            int(part),
            {
                "n_terms": merged.num_rows,
                "n_postings": int(pc.sum(merged["df"]).as_py() or 0),
                "n_tokens": int(pc.sum(merged["cf"]).as_py() or 0),
            },
        )
        parts_touched += 1

    pq.write_table(
        docmap_delta, os.path.join(_docmap_dir(index_dir), f"delta-{generation:04d}.parquet")
    )
    n_docs, avgdl = _rewrite_docmap_marker(index_dir)
    _refresh_stats(index_dir, n_docs, avgdl, generation)
    return {"added": new_tbl.num_rows, "generation": generation, "parts_touched": parts_touched}


def _reencode_part(
    index_dir: str,
    part: int,
    avgdl_for_bounds: float,
    remove_ids: np.ndarray | None,
    dl_lookup: tuple[np.ndarray, np.ndarray],
    collapse_runs: bool = False,
    n_salts: int = 1,
) -> dict | None:
    """Decode one part -> exploded rows -> (filter) -> encode -> rewrite.
    Returns the new manifest info, or None if the part becomes empty."""
    path = state.segment_path(index_dir, part)
    if not os.path.exists(path):
        return None
    tbl = pq.read_table(path)
    terms, salts, docs, tfs = [], [], [], []
    for i in range(tbl.num_rows):
        d, t = decode_posting(tbl["doc_ids_enc"][i].as_py(), tbl["tfs_enc"][i].as_py())
        if remove_ids is not None and len(d):
            keep = ~np.isin(d, remove_ids, assume_unique=True)
            d, t = d[keep], t[keep]
        if not len(d):
            continue
        run = int(tbl["run"][i].as_py())
        terms.append(np.full(len(d), tbl["term"][i].as_py(), dtype=object))
        salts.append(np.full(len(d), run % n_salts if collapse_runs else run, dtype=np.int32))
        docs.append(d)
        tfs.append(t)
    if not docs:
        os.remove(path)
        mp = state.manifest_path(index_dir, part)
        if os.path.exists(mp):
            os.remove(mp)
        return None
    ids_sorted, dl_sorted = dl_lookup
    doc_all = np.concatenate(docs)
    dl_all = dl_sorted[np.searchsorted(ids_sorted, doc_all)]
    rows = pa.table(
        {
            "term": pa.array(np.concatenate(terms), pa.string()),
            "salt": pa.array(np.concatenate(salts), pa.int32()),
            "doc_id": pa.array(doc_all, pa.int64()),
            "tf": pa.array(np.concatenate(tfs).astype(np.int32)),
            "dl": pa.array(dl_all.astype(np.int32)),
        }
    )
    # collapsed runs may merge docs of the same (term, salt): encode_bucket
    # requires strictly ascending docs per group, which holds because runs
    # are doc-disjoint and docs are unique per term
    seg = encode_bucket(rows, avgdl_for_bounds)
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


def remove_documents(index_dir: str, *, conv_ids=None, doc_ids=None) -> dict:
    """Remove documents (by conv_id or doc_id) from the index + docmap."""
    stats = state.read_stats(index_dir)
    generation = int(stats.get("generation", 0)) + 1
    bounds_avgdl = float(stats.get("bounds_avgdl", stats["avgdl"]))

    dm = _read_docmap(index_dir)
    if conv_ids is not None:
        mask = pc.is_in(dm["conv_id"], value_set=pa.array(list(conv_ids), pa.string()))
    else:
        mask = pc.is_in(
            dm["doc_id"], value_set=pa.array([int(d) for d in doc_ids], pa.int64())
        )
    remove = np.sort(dm.filter(mask)["doc_id"].to_numpy(zero_copy_only=False))
    if len(remove) == 0:
        return {"removed": 0, "generation": generation - 1}
    keep_dm = dm.filter(pc.invert(mask))

    order = np.argsort(keep_dm["doc_id"].to_numpy(zero_copy_only=False), kind="stable")
    ids_sorted = keep_dm["doc_id"].to_numpy(zero_copy_only=False)[order]
    dl_sorted = keep_dm["dl"].to_numpy(zero_copy_only=False)[order]
    # removed ids may still appear inside postings being decoded; extend the
    # lookup with their dl so _reencode_part can resolve any doc (value unused
    # for removed docs — they are filtered before encode)
    all_order = np.argsort(dm["doc_id"].to_numpy(zero_copy_only=False), kind="stable")
    lookup = (
        dm["doc_id"].to_numpy(zero_copy_only=False)[all_order],
        dm["dl"].to_numpy(zero_copy_only=False)[all_order],
    )

    parts = sorted(state.committed_parts(index_dir))
    results = [
        _reencode_part(index_dir, p, bounds_avgdl, remove, lookup)
        for p in parts
    ]

    # rewrite docmap (single consolidated file) + marker
    ddir = _docmap_dir(index_dir)
    for name in os.listdir(ddir):
        if name.endswith(".parquet"):
            os.remove(os.path.join(ddir, name))
    pq.write_table(keep_dm, os.path.join(ddir, "docmap-0000.parquet"))
    n_docs, avgdl = _rewrite_docmap_marker(index_dir)
    _refresh_stats(index_dir, n_docs, avgdl, generation)
    return {
        "removed": int(len(remove)),
        "generation": generation,
        "parts_touched": sum(1 for r in results if r is not None),
    }


def compact_index(index_dir: str) -> dict:
    """Re-encode every part under the live corpus stats: delta runs collapse
    back into canonical salt runs, ``bounds_avgdl`` snaps to the live avgdl
    (restoring tight block-max bounds), generation resets."""
    stats = state.read_stats(index_dir)
    n_salts = int(stats["n_salts"])
    dm = _read_docmap(index_dir, columns=["doc_id", "dl"])
    order = np.argsort(dm["doc_id"].to_numpy(zero_copy_only=False), kind="stable")
    lookup = (
        dm["doc_id"].to_numpy(zero_copy_only=False)[order],
        dm["dl"].to_numpy(zero_copy_only=False)[order],
    )
    avgdl = float(stats["avgdl"])
    for p in sorted(state.committed_parts(index_dir)):
        _reencode_part(
            index_dir, p, avgdl, None, lookup, collapse_runs=True, n_salts=n_salts
        )
    new_stats = _refresh_stats(index_dir, int(stats["n_docs"]), avgdl, 0)
    new_stats["bounds_avgdl"] = avgdl
    state.write_stats(index_dir, new_stats)
    return {"parts": new_stats["n_parts"], "bounds_avgdl": avgdl}
