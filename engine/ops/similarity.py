"""Similarity search over an embedding column (list<float>).

- ``brute_topk``: exact cosine top-k — per-batch numpy matmul against a
  BROADCAST query matrix (ray.put once, read per task), per-batch partial
  top-k, tiny final merge on the driver. No shuffle of the vector table.
- ``IvfIndex`` / ``ivf_topk``: the scale path — seeded k-means centroids
  (sampled fit), cluster assignment as a stateful actor-pool stage, queries
  probe ``nprobe`` nearest centroids; recall measured against brute force in
  tests.

Determinism: ties broken (-score, vec_id); float64 throughout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _stack(col) -> np.ndarray:
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


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

    import ray as _ray

    parts = [
        _ray.get(r)
        for r in ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ]
    parts = [p for p in parts if p.num_rows]
    qid_arr = np.asarray(query_ids)
    out_q, out_r, out_v, out_c = [], [], [], []
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


class IvfIndex:
    """IVF over cosine: seeded spherical k-means on a sample, then inverted
    lists per centroid. Query probes the ``nprobe`` nearest centroids.

    Fit is driver-side on a deterministic sample; assignment is a vectorized
    ``map_batches`` stage; the lists live in one arrow-backed structure
    (broadcastable via ray.put for a query actor pool)."""

    def __init__(self, n_centroids: int = 16, n_iter: int = 10, seed: int = 42):
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self.list_ids: list[np.ndarray] = []
        self.list_vecs: list[np.ndarray] = []

    def fit_assign(self, ds, id_col: str = "vec_id", vec_col: str = "embedding", sample_n: int = 10000):
        import ray

        sample = ds.limit(sample_n).to_pandas()
        smat = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
        rng = np.random.default_rng(self.seed)
        k = min(self.n_centroids, len(smat))
        cent = smat[rng.choice(len(smat), size=k, replace=False)]
        for _ in range(self.n_iter):
            assign = np.argmax(smat @ cent.T, axis=1)
            for c in range(k):
                m = assign == c
                if m.any():
                    v = smat[m].mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-12)
        self.centroids = cent
        cref = ray.put(cent)

        def assign_batch(batch: pa.Table) -> pa.Table:
            cm = ray.get(cref)
            ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            mat = _normalize(_stack(batch[vec_col]))
            a = np.argmax(mat @ cm.T, axis=1).astype(np.int32)
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "centroid": pa.array(a),
                    vec_col: batch[vec_col],
                }
            )

        assigned = ds.map_batches(assign_batch, batch_format="pyarrow").to_pandas()
        self.list_ids = []
        self.list_vecs = []
        for c in range(k):
            sub = assigned[assigned["centroid"] == c]
            self.list_ids.append(sub["vec_id"].to_numpy().astype(np.int64))
            self.list_vecs.append(
                _normalize(np.stack(sub[vec_col].to_numpy()).astype(np.float64))
                if len(sub)
                else np.zeros((0, cent.shape[1]))
            )
        return self

    def topk(self, query_vec: np.ndarray, k: int = 10, nprobe: int = 4) -> tuple[np.ndarray, np.ndarray]:
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        probes = np.argsort(-(self.centroids @ q))[:nprobe]
        ids = np.concatenate([self.list_ids[c] for c in probes]) if len(probes) else np.array([], dtype=np.int64)
        if len(ids) == 0:
            return ids, np.array([], dtype=np.float64)
        vecs = np.vstack([self.list_vecs[c] for c in probes])
        sims = vecs @ q
        order = np.lexsort((ids, -sims))[:k]
        return ids[order], sims[order]
