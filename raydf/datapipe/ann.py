"""Similarity search over an embedding column (``list<float>``).

* brute-force cosine top-k — per-batch numpy matmul against a broadcast
  query matrix (``ray.put`` once, read per actor/task), then a driver-side
  merge of per-block top-k partials: the classic scalable top-k shape
  (no global sort; only k rows per block leave the worker).
* LSH-bucketed near-duplicate pairs — random-hyperplane sign bits
  (deterministic planes) bucket the vectors; exact cosine verifies within
  buckets. The scale path for all-pairs similarity: candidate generation
  never leaves its bucket.
* IVF-style search — coarse k-means-ish centroids picked deterministically
  (hash-seeded), each vector assigned to its nearest centroid at index
  time; queries probe the ``nprobe`` nearest centroid buckets only.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from raydf import terms


def _vec_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1).astype(np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def cosine_topk(embeddings_ds, query: np.ndarray, *, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dtype=np.float32) -> pd.DataFrame:
    """Exact top-k by cosine similarity to ``query`` (1-D float vector).

    ``dtype=np.float64`` when scores must match a double-precision oracle
    (e.g. DuckDB ``list_cosine_similarity``) bit-for-bit at 1e-6 scale."""
    import ray

    q = np.asarray(query, dtype=dtype)
    q = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(q)

    def block_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _normalize(_vec_matrix(batch, vec_col).astype(dtype))
        sims = m @ qv
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        take = min(k, len(sims))
        idx = np.argpartition(-sims, take - 1)[:take]
        return pa.table(
            {
                id_col: pa.array(ids[idx], pa.int64()),
                "score": pa.array(sims[idx].astype(np.float64), pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    out = partials.nlargest(k, "score").reset_index(drop=True)
    return out


def hyperplanes(dim: int, bits: int) -> np.ndarray:
    """Deterministic random hyperplanes (hash-seeded Gaussian)."""
    seed = terms._h64(f"ann-planes-{dim}-{bits}".encode()) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float32)


class LshBucketer:
    """Actor-pool stage: vector → LSH sign-bit bucket key(s).

    ``bands`` keys per vector (each over ``bits_per_band`` planes) so a
    near-dup pair collides in ≥1 band w.h.p."""

    def __init__(self, dim: int, *, bands: int = 8, bits_per_band: int = 8,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        self.planes = hyperplanes(dim, bands * bits_per_band)
        self.bands, self.bits = bands, bits_per_band
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_vec_matrix(batch, self.vec_col))
        signs = (m @ self.planes.T) > 0  # n × (bands*bits)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        pw = (1 << np.arange(self.bits)).astype(np.int64)
        bands_col, keys_col, ids_col = [], [], []
        for b in range(self.bands):
            seg = signs[:, b * self.bits : (b + 1) * self.bits].astype(np.int64)
            keys_col.append(seg @ pw)
            bands_col.append(np.full(n, b, dtype=np.int32))
            ids_col.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands_col), pa.int32()),
                "key": pa.array(np.concatenate(keys_col), pa.int64()),
                self.id_col: pa.array(np.concatenate(ids_col), pa.int64()),
            }
        )


def embedding_neardup_pairs(embeddings_ds, dim: int, *, threshold: float = 0.95,
                            bands: int = 8, bits_per_band: int = 8,
                            concurrency: int = 4,
                            id_col: str = "vec_id", vec_col: str = "embedding"):
    """All vector pairs with cosine ≥ threshold via LSH buckets + exact verify.

    The verify step broadcasts the (id → unit vector) map; at scale swap
    for a hash_join of candidate ids against the vectors Dataset."""
    import ray

    mats, ids_all = [], []
    for batch in embeddings_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        mats.append(_normalize(_vec_matrix(batch, vec_col)))
        ids_all.append(batch[id_col].to_numpy(zero_copy_only=False))
    allm = np.concatenate(mats) if mats else np.zeros((0, dim), np.float32)
    allids = np.concatenate(ids_all) if ids_all else np.zeros(0, np.int64)
    order = np.argsort(allids)
    vref = ray.put((allids[order], allm[order]))

    keys = embeddings_ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs={
            "dim": dim, "bands": bands, "bits_per_band": bits_per_band,
            "vec_col": vec_col, "id_col": id_col,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def verify_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.duplicated(subset=["band", "key"], keep=False)]
        kid, kvec = ray.get(vref)
        parts = []
        for _, g in df.groupby(["band", "key"], sort=False):
            ids = np.sort(g[id_col].unique())[:500]
            if len(ids) < 2:
                continue
            pos = np.searchsorted(kid, ids)
            m = kvec[pos]
            sims = m @ m.T
            ai, bi = np.triu_indices(len(ids), k=1)
            s = sims[ai, bi]
            keep = s >= threshold
            parts.append(
                pd.DataFrame(
                    {"a": ids[ai][keep], "b": ids[bi][keep],
                     "cosine": s[keep].astype(np.float64)}
                )
            )
        if not parts:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
                 "cosine": pd.Series(dtype=np.float64)}
            )
        return pd.concat(parts, ignore_index=True)

    from raydf.joins import distinct, partitioned_group_map

    pairs = partitioned_group_map(keys, ["band", "key"], verify_partition)
    return distinct(pairs, ["a", "b"])


def ivf_index(embeddings_ds, dim: int, *, n_centroids: int = 16,
              vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF assignment: centroid c(v) = argmax cosine to deterministic seeds.

    Returns the Dataset with a `centroid` column — the partition key for
    bucket-pruned search (queries probe nprobe nearest centroids only)."""
    import ray

    cents = _normalize(hyperplanes(dim, n_centroids))
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_vec_matrix(batch, vec_col))
        a = (m @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("centroid", pa.array(a, pa.int32()))

    return embeddings_ds.map_batches(assign, batch_format="pyarrow")


def ivf_search(indexed_ds, query: np.ndarray, *, k: int = 10, nprobe: int = 4,
               n_centroids: int = 16, vec_col: str = "embedding",
               id_col: str = "vec_id") -> pd.DataFrame:
    q = np.asarray(query, dtype=np.float32)
    q = q / (np.linalg.norm(q) or 1.0)
    cents = _normalize(hyperplanes(len(q), n_centroids))
    probe = set(np.argsort(-(cents @ q))[:nprobe].tolist())

    import pyarrow.compute as pc

    pruned = indexed_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["centroid"], value_set=pa.array(sorted(probe), pa.int32()))),
        batch_format="pyarrow",
    )
    return cosine_topk(pruned, q, k=k, id_col=id_col, vec_col=vec_col)
