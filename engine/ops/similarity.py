"""Similarity search over an embedding column (list<float>).

- ``brute_topk``: exact cosine top-k — per-batch numpy matmul against a
  BROADCAST query matrix (ray.put once, read per task), per-batch partial
  top-k, tiny final merge on the driver. No shuffle of the vector table.
- ``IvfIndex``: the scale path — seeded spherical k-means centroids fit on a
  deterministic sample (only the sample + the k×d centroid matrix ever live
  on the driver), assignment as a vectorized ``map_batches`` stage, and the
  inverted lists written as HIVE-PARTITIONED parquet (``centroid=<c>/``),
  one directory per list: resumable output, and a probe reads ONLY its
  partitions' files. Nothing corpus-sized is ever materialized driver-side.
- ``IvfProber``: actor-pool serving stage — each actor loads the centroid
  matrix once in ``__init__`` and LRU-caches just the partitions its queries
  probe (the strucmotif replica-reads-only-touched-buckets pattern,
  strucmotif-search-core InvertedIndex bucket read path).
- ``ivf_topk_scan``: single-pass streaming variant when no index directory is
  wanted: assign + probe-mask + per-batch partial top-k in ONE map_batches
  over the vector table, then the same tiny driver merge as ``brute_topk``.

Determinism: ties broken (-score, vec_id) with optional rank-rounding so
rankings are reproducible cross-engine; float64 throughout. With
``nprobe == n_centroids`` results are exactly ``brute_topk``'s (the oracle
gate); recall at nprobe < n_centroids is pytest-gated against brute.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _stack(col) -> np.ndarray:
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def _merge_partials(parts: list[pa.Table], query_ids: np.ndarray, k: int,
                    rank_round: int | None) -> pa.Table:
    """Tiny driver-side merge of per-batch partial top-k tables
    (qi, vec_id, cosine) -> final (query_id, rank, vec_id, cosine)."""
    qid_arr = np.asarray(query_ids)
    out_q, out_r, out_v, out_c = [], [], [], []
    parts = [p for p in parts if p.num_rows]
    if parts:
        allp = pa.concat_tables(parts)
        qi = allp["qi"].to_numpy(zero_copy_only=False)
        vid = allp["vec_id"].to_numpy(zero_copy_only=False)
        cos = allp["cosine"].to_numpy(zero_copy_only=False)
        for i in range(len(qid_arr)):
            m = qi == i
            v, c = vid[m], cos[m]
            key = np.round(c, rank_round) if rank_round is not None else c
            order = np.lexsort((v, -key))[:k]
            out_q.append(np.full(len(order), qid_arr[i]))
            out_r.append(np.arange(1, len(order) + 1, dtype=np.int32))
            out_v.append(v[order])
            out_c.append(c[order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q) if out_q else np.array([], dtype=np.int64), pa.int64()),
            "rank": pa.array(np.concatenate(out_r) if out_r else np.array([], dtype=np.int32), pa.int32()),
            "vec_id": pa.array(np.concatenate(out_v) if out_v else np.array([], dtype=np.int64), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c) if out_c else np.array([], dtype=np.float64), pa.float64()),
        }
    )


def brute_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_round: int | None = None,
) -> pa.Table:
    """Exact cosine top-k for each query vector. Returns
    (query_id, rank, vec_id, cosine) sorted (query_id, rank).

    ``rank_round``: rank on cosine rounded to N decimals (cross-engine
    deterministic ranking); per-batch partials keep a +64 margin so rounded
    ties at the k boundary resolve identically to a global sort."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mat = _normalize(_stack(batch[vec_col]))
        sims = qm @ mat.T  # (nq, nb)
        nb = sims.shape[1]
        kk = min(k + 64, nb)
        # per-query partial top-k within this batch
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qm)), kk)
        cols = part.ravel()
        return pa.table(
            {
                "qi": pa.array(rows.astype(np.int32)),
                "vec_id": pa.array(ids[cols], pa.int64()),
                "cosine": pa.array(sims[rows, cols], pa.float64()),
            }
        )

    parts = [
        ray.get(r)
        for r in ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ]
    return _merge_partials(parts, query_ids, k, rank_round)


def mmr_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    fetch_k: int = 50,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
    '98; the RAG retriever's diversity rerank): fetch the exact cosine
    ``fetch_k`` candidates per query with the distributed partial-top-k pass,
    then greedy MMR on the BOUNDED candidate set —
    ``argmax lam*cos(q,d) - (1-lam)*max_{s in selected} cos(d,s)`` —
    ties broken by ascending vec_id (fully deterministic). ``lam=1``
    degenerates to plain cosine ranking.

    Scale shape: stage 1 is brute_topk's partial-merge (never materializes
    the corpus); stage 2 gathers ONLY the <= n_queries*fetch_k candidate
    vectors via one broadcast-id-set filter pass; the O(fetch_k^2) greedy
    runs per query on that bounded set at the coordinator. Returns
    (query_id, rank, vec_id, cosine, mmr)."""
    import ray

    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    cands = brute_topk(ds, query_vecs, query_ids, k=fetch_k, id_col=id_col,
                       vec_col=vec_col)
    cid = np.unique(cands[id_col].to_numpy(zero_copy_only=False))
    idref = ray.put(cid)

    def gather(batch: pa.Table) -> pa.Table:
        want = ray.get(idref)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(want, ids)
        hit = (pos < len(want)) & (want[np.minimum(pos, len(want) - 1)] == ids)
        return batch.filter(pa.array(hit))

    got = pa.concat_tables(
        t for t in (
            ray.get(r)
            for r in ds.map_batches(gather, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    )
    gids = got[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    gmat = _normalize(_stack(got[vec_col]))
    order = np.argsort(gids)
    gids, gmat = gids[order], gmat[order]

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    out_q, out_r, out_id, out_cos, out_mmr = [], [], [], [], []
    by_q: dict = {}
    for qid, vid, cos in zip(
        cands["query_id"].to_pylist(),
        cands[id_col].to_pylist(),
        cands["cosine"].to_pylist(),
    ):
        by_q.setdefault(qid, []).append((vid, cos))
    for qi, qid in enumerate(np.asarray(query_ids).tolist()):
        pairs = by_q.get(qid, [])
        if not pairs:
            continue
        vids = np.array([v for v, _ in pairs], dtype=np.int64)
        rel = np.array([c for _, c in pairs], dtype=np.float64)
        vecs = gmat[np.searchsorted(gids, vids)]
        sim = vecs @ vecs.T  # (fetch_k, fetch_k) candidate-candidate cosines
        chosen: list[int] = []
        alive = np.ones(len(vids), dtype=bool)
        max_sel = np.full(len(vids), -np.inf)
        for rank in range(1, min(k, len(vids)) + 1):
            pen = np.where(np.isfinite(max_sel), max_sel, 0.0)
            score = lam * rel - (1.0 - lam) * (pen if chosen else 0.0)
            score = np.where(alive, score, -np.inf)
            best = np.flatnonzero(score == score.max())
            j = int(best[np.argmin(vids[best])])  # vec_id ascending tie-break
            chosen.append(j)
            alive[j] = False
            max_sel = np.maximum(max_sel, sim[:, j])
            out_q.append(qid)
            out_r.append(rank)
            out_id.append(int(vids[j]))
            out_cos.append(float(rel[j]))
            out_mmr.append(float(score[j]))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_cos, pa.float64()),
            "mmr": pa.array(out_mmr, pa.float64()),
        }
    )


def _kmeans_fit(sample_mat: np.ndarray, n_centroids: int, n_iter: int, seed: int) -> np.ndarray:
    """Seeded spherical k-means on a sample matrix (already normalized)."""
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(sample_mat))
    cent = sample_mat[rng.choice(len(sample_mat), size=k, replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(sample_mat @ cent.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = sample_mat[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


class IvfIndex:
    """IVF over cosine with hive-partitioned parquet inverted lists.

    ``fit`` -> ``build(ds, path)`` writes ``path/centroid=<c>/*.parquet`` via
    a streaming assign stage + ``write_parquet(partition_cols=...)`` — the
    corpus never passes through the driver. The query side (``topk``) reads
    ONLY the probed partitions (partition-pruned pyarrow dataset scan) and
    LRU-caches decoded lists, so a long-lived prober actor holds just the
    lists its query stream touches."""

    def __init__(self, n_centroids: int = 16, n_iter: int = 10, seed: int = 42,
                 cache_lists: int = 64):
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        self.seed = seed
        self.cache_lists = cache_lists
        self.centroids: np.ndarray | None = None
        self.path: str | None = None
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    # -- build side -------------------------------------------------------
    def fit(self, ds, id_col: str = "vec_id", vec_col: str = "embedding",
            sample_n: int = 10000):
        sample = ds.limit(sample_n).to_pandas()  # driver holds the SAMPLE only
        smat = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
        self.centroids = _kmeans_fit(smat, self.n_centroids, self.n_iter, self.seed)
        return self

    def build(self, ds, path: str, id_col: str = "vec_id", vec_col: str = "embedding",
              sample_n: int = 10000):
        import ray

        if self.centroids is None:
            self.fit(ds, id_col, vec_col, sample_n)
        cref = ray.put(self.centroids)

        def assign_batch(batch: pa.Table) -> pa.Table:
            cm = ray.get(cref)
            ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            mat = _normalize(_stack(batch[vec_col]))
            a = np.argmax(mat @ cm.T, axis=1).astype(np.int32)
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "centroid": pa.array(a),
                    "embedding": batch[vec_col],
                }
            )

        os.makedirs(path, exist_ok=True)
        ds.map_batches(assign_batch, batch_format="pyarrow").write_parquet(
            path, partition_cols=["centroid"]
        )
        # "_"-prefixed so pyarrow dataset discovery ignores it in the hive tree
        np.save(os.path.join(path, "_centroids.npy"), self.centroids)
        self.path = path
        return self

    @classmethod
    def load(cls, path: str, **kw):
        obj = cls(**kw)
        obj.centroids = np.load(os.path.join(path, "_centroids.npy"))
        obj.path = path
        return obj

    # -- query side -------------------------------------------------------
    def _lists(self, c: int) -> tuple[np.ndarray, np.ndarray]:
        if c not in self._cache:
            import pyarrow.dataset as pads

            dset = pads.dataset(self.path, partitioning="hive", format="parquet")
            tbl = dset.to_table(columns=["vec_id", "embedding"],
                                filter=pads.field("centroid") == int(c))
            if tbl.num_rows:
                ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                mat = _normalize(_stack(tbl["embedding"]))
            else:
                ids = np.array([], dtype=np.int64)
                mat = np.zeros((0, self.centroids.shape[1]))
            while len(self._cache) >= self.cache_lists:
                self._cache.pop(next(iter(self._cache)))
            self._cache[c] = (ids, mat)
        return self._cache[c]

    def topk(self, query_vec: np.ndarray, k: int = 10, nprobe: int = 4,
             rank_round: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        probes = np.argsort(-(self.centroids @ q))[:nprobe]
        pairs = [self._lists(int(c)) for c in probes]
        pairs = [p for p in pairs if len(p[0])]
        if not pairs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        ids = np.concatenate([p[0] for p in pairs])
        vecs = np.vstack([p[1] for p in pairs])
        sims = vecs @ q
        key = np.round(sims, rank_round) if rank_round is not None else sims
        order = np.lexsort((ids, -key))[:k]
        return ids[order], sims[order]


class IvfProber:
    """Actor-pool serving stage: batches of (query_id, embedding) -> top-k
    result rows. The index handle (centroids + list LRU) is constructed ONCE
    per actor in ``__init__``; each ``__call__`` probes per query row."""

    def __init__(self, path: str, k: int = 10, nprobe: int = 4,
                 rank_round: int | None = None, cache_lists: int = 64):
        self.idx = IvfIndex.load(path, cache_lists=cache_lists)
        self.k = k
        self.nprobe = nprobe
        self.rank_round = rank_round

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        qmat = _stack(batch["embedding"])
        out_q, out_r, out_v, out_c = [], [], [], []
        for qid, vec in zip(qids, qmat):
            ids, sims = self.idx.topk(vec, k=self.k, nprobe=self.nprobe,
                                      rank_round=self.rank_round)
            out_q.append(np.full(len(ids), qid, dtype=np.int64))
            out_r.append(np.arange(1, len(ids) + 1, dtype=np.int32))
            out_v.append(ids)
            out_c.append(sims)
        cat = lambda xs, dt: np.concatenate(xs) if xs else np.array([], dtype=dt)  # noqa: E731
        return pa.table(
            {
                "query_id": pa.array(cat(out_q, np.int64), pa.int64()),
                "rank": pa.array(cat(out_r, np.int32), pa.int32()),
                "vec_id": pa.array(cat(out_v, np.int64), pa.int64()),
                "cosine": pa.array(cat(out_c, np.float64), pa.float64()),
            }
        )


def ivf_topk_scan(
    ds,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iter: int = 10,
    seed: int = 42,
    sample_n: int = 10000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_round: int | None = None,
) -> pa.Table:
    """One-pass streaming IVF: no index directory. Fit centroids on a sample,
    broadcast (centroids, queries, per-query probe sets), then a single
    map_batches over the vector table assigns rows to centroids and scores
    each query ONLY against rows in its probed clusters; per-batch partial
    top-k, tiny driver merge."""
    import ray

    idx = IvfIndex(n_centroids=n_centroids, n_iter=n_iter, seed=seed).fit(
        ds, id_col, vec_col, sample_n
    )
    cent = idx.centroids
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe_mask = np.zeros((len(q), len(cent)), dtype=bool)  # (nq, k_cent)
    order = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    probe_mask[np.repeat(np.arange(len(q)), order.shape[1]), order.ravel()] = True
    ref = ray.put((cent, q, probe_mask))

    def partial(batch: pa.Table) -> pa.Table:
        cm, qm, pm = ray.get(ref)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mat = _normalize(_stack(batch[vec_col]))
        assign = np.argmax(mat @ cm.T, axis=1)
        sims = qm @ mat.T  # (nq, nb)
        allowed = pm[:, assign]  # (nq, nb): row in a probed cluster of query
        sims = np.where(allowed, sims, -np.inf)
        nb = sims.shape[1]
        kk = min(k + 64, nb)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qm)), kk)
        cols = part.ravel()
        keep = allowed[rows, cols]
        return pa.table(
            {
                "qi": pa.array(rows[keep].astype(np.int32)),
                "vec_id": pa.array(ids[cols[keep]], pa.int64()),
                "cosine": pa.array(sims[rows[keep], cols[keep]], pa.float64()),
            }
        )

    parts = [
        ray.get(r)
        for r in ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ]
    return _merge_partials(parts, query_ids, k, rank_round)


def label_centroids(sf_dir: str, round_to: int = 6):
    """Grouped VECTOR aggregate: per-label mean embedding, long format
    (label, dim, centroid_r) — the class-centroid computation behind
    nearest-class-mean classification and per-class outlier scoring.

    Shape: per-batch partial (label, dim, s=sum, c=count) long rows — the
    exchange carries <= labels x dim rows per block, never vectors — then a
    tiny groupby Sum and a stateless divide. float64 accumulation from the
    float32 storage so the DuckDB avg(v::DOUBLE) oracle agrees to rounding.
    """
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        emb = _stack(batch["embedding"])
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        u, d = len(uniq), emb.shape[1]
        sums = np.zeros((u, d), dtype=np.float64)
        np.add.at(sums, codes, emb)
        cnt = np.bincount(codes, minlength=u).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), u)),
                "s": pa.array(sums.ravel()),
                "c": pa.array(np.repeat(cnt, d), pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "label": batch["label"],
                "dim": batch["dim"],
                "centroid_r": pa.array(np.round(s / c, round_to)),
            }
        )

    return (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
        .map_batches(finish, batch_format="pyarrow")
    )


def sq8_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    margin: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_round: int | None = None,
) -> pa.Table:
    """Scalar-quantized (SQ8) cosine top-k with exact in-batch re-rank.

    The memory-bandwidth scale path for brute-force ANN: vectors are
    normalized then quantized to int8 (symmetric, scale 127 — exact range
    for unit vectors), candidate SELECTION runs on the 4x-smaller float32
    view of the codes, and the selected ``k + margin`` per query per batch
    are re-scored from the batch's own float64 vectors before the partial
    merge — so emitted cosines carry full float precision (differing from
    brute_topk only by summation-order ULPs) and only selection is
    approximate (recall gated in pytest vs ``brute_topk``; margin trades
    recall for compute). Same partial-merge discipline as brute_topk."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qq = np.round(q * 127.0).astype(np.int8).astype(np.float32)
    qref = ray.put((q, qq))

    def partial(batch: pa.Table) -> pa.Table:
        qm, qmq = ray.get(qref)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mat = _normalize(_stack(batch[vec_col]))
        mat_q = np.round(mat * 127.0).astype(np.int8).astype(np.float32)
        approx = qmq @ mat_q.T  # (nq, nb) int8-domain scores
        nb = approx.shape[1]
        kk = min(k + margin, nb)
        part = np.argpartition(-approx, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qm)), kk)
        cols = part.ravel()
        # exact re-rank of the selected candidates only (vectors in-batch)
        exact = np.einsum("ij,ij->i", qm[rows], mat[cols])
        return pa.table(
            {
                "qi": pa.array(rows.astype(np.int32)),
                "vec_id": pa.array(ids[cols], pa.int64()),
                "cosine": pa.array(exact, pa.float64()),
            }
        )

    parts = [
        ray.get(r)
        for r in ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ]
    return _merge_partials(parts, query_ids, k, rank_round)


# --------------------------------------------------------------------------
# sparse TF-IDF all-pairs similarity (text-side similarity search)
# --------------------------------------------------------------------------

def tfidf_similar_pairs(
    ds,
    threshold: float = 0.85,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
    max_df: int | None = None,
    round_to: int = 4,
):
    """EXACT all-pairs TF-IDF cosine similarity >= ``threshold`` over the text
    column — the sparse-vector counterpart of ``embedding_dup_pairs`` (finds
    near-duplicate / templated documents without an embedding model).

    Same two-exchange shape as ``ngram_jaccard_pairs`` (the Bayardo/WSDM'07
    all-pairs pattern): a vectorized weights stage computes each doc's
    L2-normalized tf-idf vector IN BATCH (idf = ln(N/df) from a broadcast
    vocab-sized df table — ray.put once, shared-memory per task; a doc's rows
    never split across batches, so norms need no extra exchange), a term-hash
    BUCKETED groupby expands per-term runs to ordered pair contributions
    w_a*w_b (segmented triangular decode, in-group partial sum per pair), and
    a pair-bucket groupby sums partials into the final dot product = cosine.

    ``max_df``: skew/volume guard (the WSDM'07 frequency prune). Terms in
    more than ``max_df`` docs are excluded from the VECTOR DEFINITION itself
    (not just candidate generation), so the result is still exact for the
    documented similarity measure; a term in f docs otherwise expands to
    f^2/2 pairs. None = every term participates.

    Returns (doc_a, doc_b, cosine_r) rows, doc_a < doc_b, cosine rounded to
    ``round_to`` (cross-engine float parity: engine and SQL oracle sum float
    products in different orders; 1e-15 drift rounds away at 4 decimals).
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from ..tokenize import _explode_tokens
    from .dedup import _segment_pairs as _dedup_segment_pairs
    from ..segments import term_bucket_array as _crc_bucket

    # --- pass 1: vocab-sized df table (distinct-doc term counts) ----------
    def partial_df(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _explode_tokens(batch[text_col])
        if len(parent) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        t = pa.table({"term": flat, "p": pa.array(parent)})
        dedup = t.group_by(["term", "p"], use_threads=False).aggregate([])
        g = dedup.group_by(["term"], use_threads=False).aggregate([("p", "count")])
        return pa.table({"term": g["term"], "df": g["p_count"].cast(pa.int64())})

    df_ds = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )
    if max_df is not None:
        # max_df prune happens DISTRIBUTED, before the driver collect (same
        # pattern as bigram_lm_scores' min-count prune): at open-vocabulary
        # scale the driver table is bounded by max_df-surviving terms, not
        # by the corpus vocabulary.
        _cap = int(max_df)

        def prune_df(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.less_equal(batch["df"], pa.scalar(_cap)))

        df_ds = df_ds.map_batches(prune_df, batch_format="pyarrow")
    df_tbl = df_ds.to_pandas()
    n_docs = int(ds.count())
    df_terms = np.asarray(df_tbl["term"], dtype=object)
    o = np.argsort(df_terms, kind="stable")
    df_ref = ray.put((df_terms[o], np.asarray(df_tbl["df"])[o].astype(np.int64)))

    n_term_buckets = max(64, num_partitions * 8)

    # --- pass 2: per-doc normalized weights (one batch = whole docs) ------
    def weights(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "wn": pa.array([], pa.float64()),
                "termbucket": pa.array([], pa.int64()),
            }
        )
        flat, parent, _ = _explode_tokens(batch[text_col])
        if len(parent) == 0:
            return empty
        doc_ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"term": flat, "p": pa.array(parent)})
        g = t.group_by(["p", "term"], use_threads=False).aggregate([("term", "count")])
        p = g["p"].to_numpy(zero_copy_only=False)
        tf = g["term_count"].to_numpy(zero_copy_only=False).astype(np.float64)
        terms = g["term"].to_numpy(zero_copy_only=False).astype(object)
        vocab, df_vals = ray.get(df_ref)
        pos = np.searchsorted(vocab, terms)
        inb = pos < len(vocab)
        hit = np.zeros(len(terms), dtype=bool)
        if inb.any():
            hit[inb] = vocab[pos[inb]] == terms[inb]
        if not hit.any():
            return empty
        p, tf, terms, pos = p[hit], tf[hit], terms[hit], pos[hit]
        w = tf * np.log(float(n_docs) / df_vals[pos])
        # in-batch per-doc L2 norm (rows of a doc all live in this batch)
        sq = np.bincount(p, weights=w * w, minlength=len(doc_ids))
        wn = w / np.sqrt(sq[p])
        term_arr = pa.array(terms, pa.string())
        # deterministic cross-worker bucket (never Python's randomized hash());
        # the bucket only COLOCATES a term's rows — pair runs are keyed by the
        # term string itself via in-group dictionary codes
        tb = _crc_bucket(term_arr, n_term_buckets)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[p], pa.int64()),
                "term": term_arr,
                "wn": pa.array(wn, pa.float64()),
                "termbucket": pa.array(tb.astype(np.int64)),
            }
        )

    def expand_pairs(group: pa.Table) -> pa.Table:
        term_col = group["term"]
        if isinstance(term_col, pa.ChunkedArray):
            term_col = term_col.combine_chunks()
        codes = term_col.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        wn = group["wn"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, codes))
        c_s, d_s, w_s = codes[order], d[order], wn[order]
        first = np.empty(len(c_s), dtype=bool)
        first[0] = True
        np.not_equal(c_s[1:], c_s[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        runlen = np.diff(np.r_[starts, len(c_s)])
        i, j = _dedup_segment_pairs(starts, runlen)
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "dot": pa.array([], pa.float64()),
                "pairbucket": pa.array([], pa.int64()),
            }
        )
        if not len(i):
            return empty
        a, b = d_s[i], d_s[j]
        contrib = w_s[i] * w_s[j]
        # in-group partial sum per (a, b)
        po = np.lexsort((b, a))
        a, b, contrib = a[po], b[po], contrib[po]
        pf = np.empty(len(a), dtype=bool)
        pf[0] = True
        np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=pf[1:])
        ps = np.flatnonzero(pf)
        dot = np.add.reduceat(contrib, ps)
        a, b = a[ps], b[ps]
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "dot": pa.array(dot, pa.float64()),
                "pairbucket": pa.array(((a * 31 + b) % num_partitions).astype(np.int64)),
            }
        )

    def merge_pairs(group: pa.Table) -> pa.Table:
        a = group["doc_a"].to_numpy(zero_copy_only=False)
        b = group["doc_b"].to_numpy(zero_copy_only=False)
        dt = group["dot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, dt = a[order], b[order], dt[order]
        pf = np.empty(len(a), dtype=bool)
        pf[0] = True
        np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=pf[1:])
        ps = np.flatnonzero(pf)
        cos = np.round(np.add.reduceat(dt, ps), round_to)
        a, b = a[ps], b[ps]
        keep = cos >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "cosine_r": pa.array(cos[keep], pa.float64()),
            }
        )

    return (
        ds.map_batches(weights, batch_format="pyarrow")
        .groupby("termbucket")
        .map_groups(expand_pairs, batch_format="pyarrow")
        .groupby("pairbucket")
        .map_groups(merge_pairs, batch_format="pyarrow")
        .sort(["doc_a", "doc_b"])
    )


# --------------------------------------------------------------------------
# distributed k-means training (full-corpus Lloyd iterations)
# --------------------------------------------------------------------------

def deterministic_kmeans_init(
    parquet_path: str,
    k: int = 8,
    seed: int = 7,
    init_sample: int = 2048,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Numpy-only recompute of :func:`kmeans_train`'s seeded init centroids
    (first ``init_sample`` rows in file order, seeded choice of k) — NO Ray.
    Shared between the ``kmeans_assign`` entry and its DuckDB-oracle
    materializer so both sides hold bit-identical init centroids."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=[vec_col])
    mat0 = np.stack(t[vec_col].to_numpy(zero_copy_only=False)[:init_sample]).astype(
        np.float64
    )
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(mat0))
    return mat0[rng.choice(len(mat0), size=k_eff, replace=False)].copy()


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d2_round: int = 6,
):
    """One Lloyd ASSIGNMENT step against broadcast centroids — the
    SQL-checkable contract for the iterative :func:`kmeans_train` loop
    (VERDICT r2 #6): DuckDB recomputes argmin distance to the same init
    centroids exactly, so this entry gives the k-means family a value
    oracle while the full T-iteration training stays pytest-gated.

    Squared distances are rounded to ``d2_round`` decimals BEFORE the argmin
    (ties -> lowest centroid_id) so the engine's one-matmul expansion
    (||x||^2 - 2 x.c + ||c||^2) and the oracle's per-pair sum-of-squares
    agree despite last-ULP accumulation differences.

    Returns a Dataset (vec_id, centroid_id, d2_r), sorted by vec_id."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mat = _stack(batch[vec_col])
        x2 = (mat * mat).sum(axis=1, keepdims=True)
        c2 = (c * c).sum(axis=1)
        d2 = np.round(x2 - 2.0 * (mat @ c.T) + c2, d2_round)
        a = np.argmin(d2, axis=1)  # ties -> lowest centroid_id
        best = d2[np.arange(len(mat)), a]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "centroid_id": pa.array(a.astype(np.int64), pa.int64()),
                "d2_r": pa.array(np.round(np.maximum(best, 0.0), 4), pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow").sort("vec_id")


def kmeans_train(
    ds,
    k: int = 8,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    init_sample: int = 2048,
):
    """Full-corpus Lloyd's k-means over an embedding column — the training
    loop ``IvfIndex`` approximates with its driver-side SAMPLE fit
    (``_kmeans_fit``). Euclidean objective, deterministic in ``seed``.

    Ray-Data shape per iteration: centroids broadcast once via ``ray.put``
    (k x d floats — tiny), ONE streaming ``map_batches`` pass emits per-batch
    PARTIAL sufficient statistics (per-cluster vector sums + counts +
    objective partial, i.e. k x (d+2) floats per batch — the A1 partial-agg
    pattern), a cid groupby REDUCES the partials in the cluster (at 100-TB
    block counts, #blocks x k partial rows is itself too big a driver
    collect — the exchange stays bounded at #blocks x k narrow rows and the
    driver receives exactly k), and the driver folds k rows into the new
    centroids. Nothing corpus- or block-count-sized ever reaches the
    driver; T iterations = T passes, each with streaming backpressure.
    Empty clusters keep their previous centroid (the standard fixed-point
    convention, deterministic cross-partitioning).

    Returns (centroid_id, count, inertia_r, centroid) — one row per cluster;
    ``inertia_r`` is the FINAL-assignment total squared distance rounded to
    6 decimals, identical across block layouts (per-batch partials are
    f64-summed in a fixed fold order only at the driver after np.add over
    commutative integer counts and compensated... plainly: partial sums are
    order-sensitive at ~1e-12 relative; rounding to 6 absorbs it).
    """
    import ray

    # deterministic init: seeded sample of the corpus (same contract as
    # IvfIndex) — the first init_sample rows in dataset order, then a seeded
    # choice of k among them
    head = ds.limit(init_sample).to_pandas()
    mat0 = np.stack(head[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(mat0))
    cent = mat0[rng.choice(len(mat0), size=k_eff, replace=False)].copy()

    def partials_fn(cent_ref):
        def fn(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            mat = _stack(batch[vec_col])
            # squared distance via ||x||^2 - 2 x.c + ||c||^2 (one matmul)
            x2 = (mat * mat).sum(axis=1, keepdims=True)
            c2 = (c * c).sum(axis=1)
            d2 = x2 - 2.0 * (mat @ c.T) + c2
            a = np.argmin(d2, axis=1)
            best = d2[np.arange(len(mat)), a]
            sums = np.zeros((k_eff, mat.shape[1]), dtype=np.float64)
            np.add.at(sums, a, mat)
            counts = np.bincount(a, minlength=k_eff).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(k_eff, dtype=np.int64)),
                    "vsum": pa.array(list(sums)),
                    "count": pa.array(counts),
                    "obj": pa.array(
                        np.bincount(a, weights=np.maximum(best, 0.0), minlength=k_eff)
                    ),
                }
            )

        return fn

    def fold_cid(group: pa.Table) -> pa.Table:
        """In-cluster reduction of one cid's partials to a single row."""
        import pyarrow.compute as pc

        vs = np.stack(group["vsum"].to_numpy(zero_copy_only=False)).sum(axis=0)
        return pa.table(
            {
                "cid": group["cid"].slice(0, 1),
                "vsum": pa.array([vs]),
                "count": pa.array([int(pc.sum(group["count"]).as_py() or 0)], pa.int64()),
                "obj": pa.array([float(pc.sum(group["obj"]).as_py() or 0.0)], pa.float64()),
            }
        )

    inertia = 0.0
    counts = np.zeros(k_eff, dtype=np.int64)
    for _ in range(n_iter):
        cent_ref = ray.put(cent)
        parts = (
            ds.map_batches(partials_fn(cent_ref), batch_format="pyarrow")
            .groupby("cid")
            .map_groups(fold_cid, batch_format="pyarrow")
            .to_pandas()  # exactly k_eff rows
        ).sort_values("cid", ignore_index=True)
        counts = parts["count"].to_numpy()
        inertia = float(parts["obj"].sum())
        vsums = np.stack(parts["vsum"].to_numpy())
        live = counts > 0
        cent[live] = vsums[live] / counts[live, None]

    return pa.table(
        {
            "centroid_id": pa.array(np.arange(k_eff, dtype=np.int64)),
            "count": pa.array(counts.astype(np.int64)),
            "inertia_r": pa.array(
                np.full(k_eff, round(inertia, 6)), pa.float64()
            ),
            "centroid": pa.array([np.round(c, 9) for c in cent]),
        }
    )


def embedding_drift(sf_dir: str, old_mod: int = 2, round_to: int = 6):
    """Embedding drift report between two snapshots (the vector companion
    of ``textstats.vocab_drift``): per label, the L2 distance between the
    OLD slice's (``vec_id % old_mod == 0``) and the NEW slice's centroid —
    the embedding-space monitoring pass a pipeline runs when the upstream
    encoder or corpus mix changes. Emits (label, n_old, n_new, shift_r),
    labels present in BOTH slices only (a one-sided label has no drift to
    measure), sorted by label.

    Shape: the label_centroids partial (per-batch (label, side, dim) float64
    sums — the exchange carries <= labels x 2 x dim rows per block, never
    vectors) -> tiny groupby Sum -> driver fold over <= labels x 2 x dim
    rows for the distance. Same float contract as label_centroids: float64
    accumulation from float32 storage, 6-dp rounding shared with the
    oracle."""
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        emb = _stack(batch["embedding"])
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = (
            batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            % old_mod
            != 0
        ).astype(np.int64)
        key = labels * 2 + side
        uniq, codes = np.unique(key, return_inverse=True)
        u, d = len(uniq), emb.shape[1]
        sums = np.zeros((u, d), dtype=np.float64)
        np.add.at(sums, codes, emb)
        cnt = np.bincount(codes, minlength=u).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq // 2, d), pa.int64()),
                "side": pa.array(np.repeat(uniq % 2, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), u)),
                "s": pa.array(sums.ravel()),
                "c": pa.array(np.repeat(cnt, d), pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "side", "dim"])
        .aggregate(Sum("s"), Sum("c"))
        .to_pandas()  # bounded: <= labels x 2 x dim rows by construction
    )
    out = {}
    for (lab, side), grp in agg.groupby(["label", "side"]):
        grp = grp.sort_values("dim")
        mean = grp["sum(s)"].to_numpy() / grp["sum(c)"].to_numpy()
        n = int(grp["sum(c)"].iloc[0]) // 1  # same count repeated per dim
        out.setdefault(int(lab), {})[int(side)] = (mean, int(grp["sum(c)"].iloc[0]))
    labs, n_old_l, n_new_l, shift_l = [], [], [], []
    for lab in sorted(out):
        if 0 not in out[lab] or 1 not in out[lab]:
            continue
        mo, no = out[lab][0]
        mn, nn = out[lab][1]
        labs.append(lab)
        n_old_l.append(no)
        n_new_l.append(nn)
        shift_l.append(round(float(np.sqrt(((mn - mo) ** 2).sum())), round_to))
    return pa.table(
        {
            "label": pa.array(labs, pa.int64()),
            "n_old": pa.array(n_old_l, pa.int64()),
            "n_new": pa.array(n_new_l, pa.int64()),
            "shift_r": pa.array(shift_l, pa.float64()),
        }
    )
