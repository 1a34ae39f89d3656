"""Whole-index merge — the Lucene ``addIndexes``/segment-concat analog.

The reference rebuilds or incrementally ADDs into one index; a multi-tenant
or partitioned-ingest deployment additionally wants to BUILD SHARDS
INDEPENDENTLY (per day, per source) and merge them later without touching
raw text. Our segment format makes that a metadata-level operation: a term's
postings are stored as one or more doc-sorted, doc-disjoint *runs*
(engine/segments.py — the salting/ADD mechanism), and every reader already
merges runs by concat + argsort. Merging two indexes is therefore, per
bucket part, just concatenating the two segment tables' run rows — no
posting decode, no re-encode, no shuffle.

Correctness contract (validated, refused loudly otherwise):
- identical routing (n_buckets, n_salts, hot_terms): the same term must
  route to the same part in both inputs;
- disjoint docID spaces: runs of the same term must stay doc-disjoint;
- merged ``avgdl`` is recomputed EXACTLY from the merged docmap (integer dl
  sum is order-independent), so a merged index's scores are bit-identical
  to a from-scratch build over the union corpus;
- block-max bounds were encoded against each input's ``bounds_avgdl``;
  the merged stats carry ``min`` of the two so the reader's bound scaling
  (``Bm25Index._bound_scale``) stays an over-estimate for BOTH sides —
  pruning remains safe/exact, only marginally less tight.

Scale shape: one Ray task per part (embarrassingly parallel file concat);
docmap union is a distributed read -> single consolidated write; the only
driver-resident state is the two docmaps' doc_id columns for the
disjointness check (int64; replace with a distributed anti-join beyond
single-node scale).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from . import state
from .update import _docmap_dir, _read_docmap


def _routing(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "routing.json")) as f:
        return json.load(f)


@ray.remote
def _merge_part(a_dir: str, b_dir: str, out_dir: str, part: int) -> dict | None:
    tables = []
    for src in (a_dir, b_dir):
        p = state.segment_path(src, part)
        if os.path.exists(p):
            tables.append(pq.read_table(p))
    if not tables:
        return None
    seg = pa.concat_tables(tables).sort_by([("term", "ascending"), ("run", "ascending")])
    path = state.segment_path(out_dir, part)
    tmp = path + ".tmp"
    pq.write_table(seg, tmp, row_group_size=16384)
    os.replace(tmp, path)
    info = {
        "n_terms": seg.num_rows,
        "n_postings": int(pc.sum(seg["df"]).as_py() or 0),
        "n_tokens": int(pc.sum(seg["cf"]).as_py() or 0),
        "payload_bytes": os.path.getsize(path),
    }
    state.write_part_manifest(out_dir, part, info)
    return info


def merge_indexes(a_dir: str, b_dir: str, out_dir: str) -> dict:
    """Merge two committed indexes into ``out_dir``. Returns a report dict."""
    ra, rb = _routing(a_dir), _routing(b_dir)
    for key in ("n_buckets", "n_salts", "hot_terms"):
        if ra.get(key) != rb.get(key):
            raise ValueError(
                f"routing contract mismatch on {key!r}: indexes route terms "
                "differently and cannot be merged segment-wise; COMPACT/rebuild instead"
            )
    sa, sb = state.read_stats(a_dir), state.read_stats(b_dir)
    if bool(sa.get("positional")) != bool(sb.get("positional")):
        raise ValueError("cannot merge positional with non-positional index")
    # segment-wise merge concatenates encoded runs WITHOUT decoding, so both
    # bundles must share one wire format (InvertedIndexBackend seam)
    if sa.get("postings_codec", "varint") != sb.get("postings_codec", "varint"):
        raise ValueError(
            f"postings codec mismatch: {sa.get('postings_codec', 'varint')!r} vs "
            f"{sb.get('postings_codec', 'varint')!r}; re-encode one index first"
        )

    # admin-time exact overlap check (merge is a rare operator-invoked op);
    # at 10^12-doc scale swap for per-file footer min/max range disjointness
    # (the build.ShardedDl metadata) + a sampled exact spot-check
    dm_a = _read_docmap(a_dir)
    dm_b = _read_docmap(b_dir)
    ids_a = dm_a["doc_id"].to_numpy(zero_copy_only=False)
    ids_b = dm_b["doc_id"].to_numpy(zero_copy_only=False)
    if len(np.intersect1d(ids_a, ids_b)):
        raise ValueError("docID spaces overlap; merged runs would not be doc-disjoint")
    if dm_a.schema.names != dm_b.schema.names:
        raise ValueError(f"docmap schemas differ: {dm_a.schema.names} vs {dm_b.schema.names}")

    os.makedirs(out_dir, exist_ok=True)
    # routing first (the pre-shuffle contract artifact, same order as build)
    state.atomic_write_bytes(
        json.dumps(ra, sort_keys=True).encode(), os.path.join(out_dir, "routing.json")
    )

    n_parts = int(sa["n_buckets"]) * int(sa["n_salts"])
    results = ray.get(
        [_merge_part.remote(a_dir, b_dir, out_dir, p) for p in range(n_parts)]
    )

    dm = pa.concat_tables([dm_a, dm_b])
    os.makedirs(_docmap_dir(out_dir), exist_ok=True)
    pq.write_table(dm, os.path.join(_docmap_dir(out_dir), "docmap-0000.parquet"))
    n_docs = dm.num_rows
    avgdl = float(pc.mean(dm["dl"]).as_py() or 0.0)
    state.atomic_write_bytes(
        json.dumps({"n_docs": n_docs, "avgdl": avgdl}).encode(),
        os.path.join(_docmap_dir(out_dir), "_SUCCESS.json"),
    )

    parts = [r for r in results if r is not None]
    stats = dict(sa)
    stats.update(
        n_docs=n_docs,
        avgdl=avgdl,
        bounds_avgdl=min(
            float(sa.get("bounds_avgdl", sa["avgdl"])),
            float(sb.get("bounds_avgdl", sb["avgdl"])),
        ),
        generation=max(int(sa.get("generation", 0)), int(sb.get("generation", 0))),
        n_parts=len(parts),
        n_term_runs=int(sum(p["n_terms"] for p in parts)),
        n_postings=int(sum(p["n_postings"] for p in parts)),
        inputs=[a_dir, b_dir],
    )
    state.write_stats(out_dir, stats)
    return {"n_docs": n_docs, "n_parts": len(parts), "avgdl": avgdl}
