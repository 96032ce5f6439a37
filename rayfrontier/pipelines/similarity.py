"""Similarity search over an embedding column (list<float>).

* brute_force_knn — baseline: per-batch numpy matmul against a broadcast
  query matrix (``ray.put`` once, read per actor), then a global top-k merge
  of per-batch partial top-ks (never a full sort).
* ivf_knn — scale path: k-means-lite coarse quantizer (deterministic seeded
  init, few Lloyd iterations on a sample), assign each vector to its nearest
  centroid inside map_batches, probe only the closest ``nprobe`` centroid
  partitions at query time — the classic IVF trade (recall vs scan fraction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def make_brute_force_fn(query_ref, k: int, id_col: str):
    """Per-batch cosine against the broadcast query matrix (ray.put once, read
    from the local object store per task); emits each batch's top-k partials."""

    def fn(t: pa.Table) -> pa.Table:
        import ray

        q = _normalize(np.atleast_2d(np.asarray(ray.get(query_ref), dtype=np.float64)))
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        m = _normalize(_to_matrix(t["embedding"]))
        sims = m @ q.T  # (n, nq)
        out_q, out_id, out_cos = [], [], []
        for qi in range(q.shape[0]):
            s = sims[:, qi]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[top].tolist())
            out_cos.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                "cos": pa.array(out_cos, pa.float64()),
            }
        )

    return fn


def brute_force_knn(embeds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id"):
    """Top-k by cosine for each query row; returns (query_id, id, cos) sorted.

    The per-batch stage emits ≤ k rows per (batch, query); the global merge is
    a tiny sort+limit over partials — wall-clock is the matmul, not a shuffle.
    """
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = embeds.map_batches(
        make_brute_force_fn(qref, k, id_col), batch_format="pyarrow", batch_size=4096
    )
    import pandas as pd

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos", id_col], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def train_centroids(embeds, n_centroids: int = 16, iters: int = 5, sample: int = 4096,
                    seed: int = 9, id_col: str = "vec_id") -> np.ndarray:
    """Deterministic k-means-lite on a driver-side sample (small by design).

    The sample is the ``sample`` LOWEST ids — NOT ``Dataset.limit(sample)``,
    whose row order follows streaming-executor block arrival and varies run
    to run (measured: the same limit(4096) returned file order on one run and
    a later block first on the next), which would make the trained centroids
    — and every assignment downstream — nondeterministic. Per-batch partial
    prune keeps ≤ sample rows per block; the driver merge is
    sample × n_blocks at worst (a tree merge is the path if block counts ever
    make that matter)."""

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows > sample:
            ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
            t = t.take(np.argpartition(ids, sample - 1)[:sample])
        return t.select([id_col, "embedding"])

    parts = embeds.map_batches(prune, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: r[id_col])
    m = _normalize(
        np.array([r["embedding"] for r in parts[:sample]], dtype=np.float64)
    )
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_knn(embeds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4, id_col: str = "vec_id"):
    """IVF: assign rows to centroid cells, scan only nprobe cells per query."""
    import ray

    cent = train_centroids(embeds, n_centroids)
    cent_ref = ray.put(cent)
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe_cells = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted_cells = set(int(c) for row in probe_cells for c in row)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_to_matrix(t["embedding"]))
        cell = np.argmax(m @ c.T, axis=1)
        out = t.append_column("cell", pa.array(cell.astype(np.int32), pa.int32()))
        import pyarrow.compute as pc

        return out.filter(pc.is_in(out["cell"], pa.array(sorted(wanted_cells), pa.int32())))

    pruned = embeds.map_batches(assign, batch_format="pyarrow", batch_size=4096)
    return brute_force_knn(pruned, q, k=k, id_col=id_col)


def cluster_assignments(embeds, n_centroids: int = 16, id_col: str = "vec_id"):
    """K-means cluster assignment as a first-class operator: train centroids
    (driver-side sample, deterministic), broadcast them, assign every vector
    in one vectorized map_batches pass. Returns (id, cluster, cos_to_centroid).
    """
    import ray

    cent = train_centroids(embeds, n_centroids)
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_to_matrix(t["embedding"]))
        sims = m @ c.T
        cell = np.argmax(sims, axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(cell.astype(np.int32), pa.int32()),
                "cos_to_centroid": pa.array(sims[np.arange(len(cell)), cell], pa.float64()),
            }
        )

    return embeds.map_batches(assign, batch_format="pyarrow", batch_size=4096)
