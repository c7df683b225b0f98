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
    near-dup pair collides in ≥1 band w.h.p. With ``emit_vectors`` each
    emitted (band, key, id) row also carries the NORMALIZED vector, so the
    in-bucket exact-cosine verify needs no side lookup at all — the
    shuffle ships bands× the vector data and nothing ever concentrates on
    the driver or in a broadcast (the scale-safe shape; the former design
    materialized every vector on the driver)."""

    def __init__(self, dim: int, *, bands: int = 8, bits_per_band: int = 8,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 emit_vectors: bool = False):
        self.planes = hyperplanes(dim, bands * bits_per_band)
        self.bands, self.bits = bands, bits_per_band
        self.vec_col, self.id_col = vec_col, id_col
        self.emit_vectors = emit_vectors
        self.dim = dim

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
        cols = {
            "band": pa.array(np.concatenate(bands_col), pa.int32()),
            "key": pa.array(np.concatenate(keys_col), pa.int64()),
            self.id_col: pa.array(np.concatenate(ids_col), pa.int64()),
        }
        if self.emit_vectors:
            tiled = np.tile(m.astype(np.float32), (self.bands, 1))
            cols["nvec"] = pa.FixedSizeListArray.from_arrays(
                pa.array(tiled.reshape(-1), pa.float32()), self.dim
            )
        return pa.table(cols)


def embedding_neardup_pairs(embeddings_ds, dim: int, *, threshold: float = 0.95,
                            bands: int = 8, bits_per_band: int = 8,
                            concurrency: int = 4,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            num_partitions: int | None = None):
    """All vector pairs with cosine ≥ threshold via LSH buckets + exact
    in-bucket verify. Fully distributed: each bucket row carries its
    normalized vector (see LshBucketer), candidate generation and verify
    never leave their hash partition, and nothing is collected driver-side."""
    keys = embeddings_ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs={
            "dim": dim, "bands": bands, "bits_per_band": bits_per_band,
            "vec_col": vec_col, "id_col": id_col, "emit_vectors": True,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def verify_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.duplicated(subset=["band", "key"], keep=False)]
        parts = []
        for _, g in df.groupby(["band", "key"], sort=False):
            g = g.drop_duplicates(id_col).sort_values(id_col).head(500)
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy(np.int64)
            m = np.stack(g["nvec"].to_numpy())
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

    pairs = partitioned_group_map(
        keys, ["band", "key"], verify_partition, num_partitions=num_partitions
    )
    return distinct(pairs, ["a", "b"])


def train_centroids(embeddings_ds, dim: int, n_centroids: int = 16, *,
                    sample_size: int = 4096, iters: int = 10,
                    vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means centroids trained on a deterministic sample.

    Init = hash-seeded unit vectors (reproducible, no RNG state), then
    Lloyd iterations on the first ``sample_size`` vectors (driver-side —
    the sample is a constant-size slice regardless of corpus scale; the
    resulting centroid matrix is tiny and broadcast). Replaces the former
    untrained hash-plane 'centroids', whose recall was unproven."""
    sample = embeddings_ds.limit(sample_size).to_pandas()
    m = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float32))
    cents = _normalize(hyperplanes(dim, n_centroids))
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        new = cents.copy()
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        new = _normalize(new)
        if np.allclose(new, cents, atol=1e-6):
            break
        cents = new
    return cents.astype(np.float32)


def ivf_index(embeddings_ds, dim: int, *, n_centroids: int = 16,
              centroids: np.ndarray | None = None,
              vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF assignment: centroid c(v) = argmax cosine to the trained
    centroids (:func:`train_centroids` unless given).

    Returns ``(indexed_ds, centroids)``: the Dataset gains a `centroid`
    column — the partition key for bucket-pruned search — and the centroid
    matrix must be reused by :func:`ivf_search` (index and search must
    agree on the quantizer)."""
    import ray

    cents = (
        centroids
        if centroids is not None
        else train_centroids(embeddings_ds, dim, n_centroids, vec_col=vec_col)
    )
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_vec_matrix(batch, vec_col))
        a = (m @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("centroid", pa.array(a, pa.int32()))

    return embeddings_ds.map_batches(assign, batch_format="pyarrow"), cents


def ivf_search(indexed_ds, query: np.ndarray, centroids: np.ndarray, *,
               k: int = 10, nprobe: int = 4, vec_col: str = "embedding",
               id_col: str = "vec_id", dtype=np.float32) -> pd.DataFrame:
    """``nprobe == len(centroids)`` probes every bucket — the result is
    then EXACTLY the brute-force top-k (and with ``dtype=np.float64``
    matches a double-precision SQL oracle), which is how the end-to-end
    index→probe→rerank plumbing is value-checked by the driver."""
    q = np.asarray(query, dtype=dtype)
    q = q / (np.linalg.norm(q) or 1.0)
    cents = _normalize(centroids.astype(np.float32))
    probe = set(np.argsort(-(cents @ q.astype(np.float32)))[:nprobe].tolist())

    import pyarrow.compute as pc

    pruned = indexed_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["centroid"], value_set=pa.array(sorted(probe), pa.int32()))),
        batch_format="pyarrow",
    )
    return cosine_topk(pruned, q, k=k, id_col=id_col, vec_col=vec_col, dtype=dtype)


# ------------------------------------------------------------- IVF-PQ


def ivfpq_index(embeds_ds, dim: int, *, m: int = 8, k_codes: int = 16,
                n_centroids: int = 16, pq_iters: int = 2,
                vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF coarse quantizer + PQ codes composed into ONE index Dataset —
    the round-3 :func:`raydf.datapipe.cluster.pq_encode` codes actually
    *used* by search.

    Returns ``(index_ds, centroids, codebooks)``: ``index_ds`` rows are
    ``(vec_id, centroid:int32, codes: fixed_size_list<int64>[m])`` —
    m·log2(k) bits of payload per vector instead of d·32, so the probe
    scan streams codes only and never touches the raw vectors.
    ``centroids`` (coarse, float32) and ``codebooks`` (the exact-integer
    (m, k, d/m) tensor from :func:`~raydf.datapipe.cluster.pq_train`) are
    tiny driver arrays that search must reuse — index and search have to
    agree on both quantizers."""
    import ray

    from raydf.datapipe import cluster as cl

    codebooks = cl.pq_train(
        embeds_ds, m=m, k=k_codes, iters=pq_iters,
        id_col=id_col, vec_col=vec_col,
    )
    indexed, cents = ivf_index(
        embeds_ds, dim, n_centroids=n_centroids,
        vec_col=vec_col, id_col=id_col,
    )
    assert dim % m == 0
    dsub = dim // m
    cbref = ray.put(codebooks)

    def encode(batch: pa.Table) -> pa.Table:
        cb = ray.get(cbref)
        x = cl.quantize(_vec_matrix(batch, vec_col)).reshape(-1, m, dsub)
        n = x.shape[0]
        codes = np.empty((n, m), np.int64)
        for s in range(m):
            codes[:, s] = cl.assign(x[:, s, :], cb[s])
        return pa.table(
            {
                id_col: batch[id_col],
                "centroid": batch["centroid"],
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.int64()), m
                ),
            }
        )

    return indexed.map_batches(encode, batch_format="pyarrow"), cents, codebooks


def ivfpq_search(index_ds, embeds_ds, query: np.ndarray,
                 centroids: np.ndarray, codebooks: np.ndarray, *,
                 k: int = 10, nprobe: int = 4, rerank: int = 8,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 dtype=np.float32) -> pd.DataFrame:
    """IVF-PQ search: ADC candidate scan over the probed buckets' codes,
    then an exact-cosine rerank of the best ``rerank·k`` candidates.

    Stage 1 probes the ``nprobe`` nearest coarse centroids and ranks their
    rows by asymmetric distance — ``Σ_s lut[s, code_s]`` where
    ``lut[s, c] = ‖q_s − codebook[s, c]‖²`` in the exact int64 quantized
    space (one (m, k) table per query, built driver-side; the scan is a
    vectorized gather + row-sum per batch, and only ``rerank·k`` candidate
    rows per block leave the worker). Stage 2 fetches the candidates'
    exact vectors via an ``is_in``-pruned pass over ``embeds_ds`` and
    reranks by true cosine (the comparator :func:`cosine_topk` uses) —
    standard ADC-then-rerank, so recall is gated by candidate coverage,
    not by PQ reconstruction error."""
    import ray

    import pyarrow.compute as pc

    from raydf.datapipe import cluster as cl

    m, kc, dsub = codebooks.shape
    dim = m * dsub
    q = np.asarray(query, dtype=np.float64)
    qn = (q / (np.linalg.norm(q) or 1.0)).astype(np.float32)
    cents = _normalize(centroids.astype(np.float32))
    probe = np.sort(np.argsort(-(cents @ qn))[:nprobe]).astype(np.int32)

    # ADC lookup table in the SAME quantized space the codes live in
    qq = cl.quantize(np.asarray(query, np.float32)[None, :]).reshape(m, dsub)
    diff = qq[:, None, :] - codebooks  # (m, k, dsub) int64
    lut = np.einsum("mkd,mkd->mk", diff, diff)  # exact int64
    n_cand = max(k * rerank, k)
    lref = ray.put(lut)
    pref = ray.put(probe)

    def block_cands(batch: pa.Table) -> pa.Table:
        lt, pr = ray.get(lref), ray.get(pref)
        t = batch.filter(
            pc.is_in(batch["centroid"], value_set=pa.array(pr, pa.int32()))
        )
        empty = pa.table(
            {id_col: pa.array([], pa.int64()), "adc": pa.array([], pa.int64())}
        )
        if len(t) == 0:
            return empty
        codes_arr = t["codes"]
        if isinstance(codes_arr, pa.ChunkedArray):
            codes_arr = codes_arr.combine_chunks()
        codes = codes_arr.values.to_numpy(zero_copy_only=False).reshape(-1, m)
        dists = lt[np.arange(m)[None, :], codes].sum(axis=1)
        take = min(n_cand, len(dists))
        idx = np.argpartition(dists, take - 1)[:take]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[idx], pa.int64()),
                "adc": pa.array(dists[idx], pa.int64()),
            }
        )

    partials = index_ds.map_batches(block_cands, batch_format="pyarrow").to_pandas()
    cand = partials.nsmallest(n_cand, "adc")[id_col].to_numpy(np.int64)
    cand_set = pa.array(np.sort(cand), pa.int64())

    exact = embeds_ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=cand_set)),
        batch_format="pyarrow",
    )
    return cosine_topk(exact, q, k=k, id_col=id_col, vec_col=vec_col, dtype=dtype)
