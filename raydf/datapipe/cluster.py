"""Distributed k-means (Lloyd) over an embedding column — the clustering
stage a training-data pipeline runs for corpus bucketing, semantic dedup
sharding, or IVF-style index builds.

The reference engine has no clustering (it is an RDF deduction library);
this extends the LLM-data operator family (SURVEY.md §2.7 O41 note). It
complements :mod:`raydf.datapipe.ann`'s sampled spherical k-means (used to
train IVF coarse quantizers): this one is FULL-data Lloyd with exact
integer arithmetic, so every iteration is bit-reproducible and the whole
iterative algorithm can be value-checked by a SQL oracle with the
iterations unrolled as CTEs.

Determinism contract (what makes it oracle-checkable):

* vectors quantize once to int64 micro-units: ``floor(float64(x)*1e6 +
  0.5)`` — float32→float64 promotion and the *1e6 product are IEEE-exact
  on both sides (numpy and DuckDB ``CAST(... AS DOUBLE)``);
* distances are integer: ``Σ_d (x_e6 - c_e6)²`` fits int64 comfortably
  ((4·10¹²)·dim per term pair); argmin ties break on the smaller cluster
  id;
* centroid update is integer floor division ``Σ x_e6 // n`` — numpy
  ``floor_divide``; DuckDB's ``//`` truncates toward zero, so the oracle
  adjusts negative sums with a CASE (exact HUGEINT arithmetic, no DOUBLE
  2^53 ceiling); empty clusters keep their previous centroid.

Scale shape: centroids are a k×d int64 array broadcast via ``ray.put``
once per iteration; each ``map_batches`` task computes assignments with
one integer matmul (``dist = x² + c² − 2·x·cᵀ``) and collapses to k
partial rows (count + per-dim sum), so only ``k × blocks`` tiny rows
reach the driver-side reduce — the classic partial/final aggregate. The
final labelled pass streams; nothing materializes the corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

QUANT = 1_000_000


def quantize(vecs: np.ndarray) -> np.ndarray:
    """float embedding matrix → int64 micro-units, half-up rounding
    (matches SQL ``floor(CAST(x AS DOUBLE)*1000000 + 0.5)``)."""
    return np.floor(vecs.astype(np.float64) * QUANT + 0.5).astype(np.int64)


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    from raydf.datapipe.ann import _vec_matrix

    # float32 intermediate is lossless here: the source column is
    # list<float>; quantize() promotes to float64 before scaling
    return _vec_matrix(batch, col)


def assign(x_e6: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_k Σ_d (x−c)² with ties to the smaller cluster id.

    Integer matmul keeps the arithmetic exact; np.argmin returns the
    FIRST minimum, which is exactly the smaller-id tie-break."""
    x_sq = np.einsum("nd,nd->n", x_e6, x_e6)
    c_sq = np.einsum("kd,kd->k", cents, cents)
    d = x_sq[:, None] + c_sq[None, :] - 2 * (x_e6 @ cents.T)
    return np.argmin(d, axis=1).astype(np.int64)


def _init_centroids(embeds, k: int, *, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic init: the (quantized) vectors of the k smallest ids —
    trivially reproducible in SQL, no RNG to keep in sync."""
    import pyarrow.compute as pc

    seed = embeds.map_batches(
        lambda t: t.filter(pc.less(t[id_col], k)), batch_format="pyarrow"
    ).to_pandas()
    seed = seed.sort_values(id_col)
    assert len(seed) == k, f"ids 0..{k-1} must exist for deterministic init"
    return quantize(np.stack(seed[vec_col].to_numpy()))


def lloyd_train(embeds, *, k: int = 8, iters: int = 2,
                id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """The centroid-training loop of :func:`kmeans_assign`, exposed so
    compositions (:func:`semdedup`) can run their own final pass against
    the EXACT centroids a plain assignment would use. Returns the (k, d)
    int64 centroid matrix after ``iters`` exact-integer updates.

    Each update is one streaming pass: broadcast centroids → per-batch
    integer-matmul assignment → k partial (count, Σ per dim) rows per
    block → driver reduce over the k×blocks partials (k×d ints — tiny).
    """
    cents = _init_centroids(embeds, k, id_col=id_col, vec_col=vec_col)
    dim = cents.shape[1]

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = quantize(_batch_matrix(batch, vec_col))
            lab = assign(x, c)
            counts = np.bincount(lab, minlength=k).astype(np.int64)
            sums = np.zeros((k, dim), np.int64)
            np.add.at(sums, lab, x)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(counts),
                    "s": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        p = embeds.map_batches(partials, batch_format="pyarrow").to_pandas()
        counts = np.zeros(k, np.int64)
        sums = np.zeros((k, dim), np.int64)
        for cl, n, s in zip(p["cluster"], p["n"], p["s"]):
            counts[cl] += n
            sums[cl] += np.asarray(s, np.int64)
        nz = counts > 0
        new = cents.copy()  # empty clusters keep their previous centroid
        new[nz] = np.floor_divide(sums[nz], counts[nz, None])
        cents = new
    return cents


def kmeans_assign(embeds, *, k: int = 8, iters: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """Lloyd k-means over ``embeds`` (Dataset with an id and a
    ``list<float>`` column). Runs ``iters`` exact-integer centroid
    updates (:func:`lloyd_train`), then returns the LAZY final assignment
    Dataset ``(vec_id, cluster)``."""
    cents = lloyd_train(embeds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(cents)

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = quantize(_batch_matrix(batch, vec_col))
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(assign(x, c), pa.int64()),
            }
        )

    return embeds.map_batches(label, batch_format="pyarrow")


# SemDeDup's defining trade is per-cluster all-pairs: the kernel builds an
# m×m int64 distance matrix per cluster, so memory is O(m²) — 8 KB at
# m=1k, 2.1 GB at m=16k, 80 GB at m=100k. k must therefore grow ∝ corpus
# size (the paper's invariant). TARGET sizes auto-k (`k = max(8,
# n // TARGET)`); MAX is the loud per-cluster guard past which the kernel
# raises instead of letting a worker OOM opaquely (ADVICE r04 medium).
SEMDEDUP_TARGET_CLUSTER_ROWS = int(
    os.environ.get("RAYDF_SEMDEDUP_TARGET_CLUSTER_ROWS", 8_192)
)
SEMDEDUP_MAX_CLUSTER_ROWS = int(
    os.environ.get("RAYDF_SEMDEDUP_MAX_CLUSTER_ROWS", 24_576)
)


def semdedup_auto_k(n_rows: int, *, target: int | None = None,
                    k_min: int = 8) -> int:
    """Cluster count that keeps the expected per-cluster size (and so the
    kernel's m×m distance matrix) flat as the corpus grows. SQL-replicable:
    ``GREATEST(k_min, n // target)`` (floor division, nonnegative)."""
    t = target if target is not None else SEMDEDUP_TARGET_CLUSTER_ROWS
    return max(k_min, n_rows // t)


def semdedup(embeds, *, k: int | None = None, iters: int = 2, eps2: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             num_partitions: int | None = None):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embedding space, then within each cluster drop every vector that has a
    LOWER-id cluster member within ``eps2`` (squared L2 distance in
    quantized micro-units — for unit-norm embeddings ``dist² =
    2·(1−cos)·10¹²``, so an eps2 threshold IS a cosine threshold).
    Returns the lazy Dataset ``(vec_id, cluster, kept)``.

    Determinism contract: the exact-integer Lloyd of :func:`kmeans_assign`
    (same centroids bit-for-bit via :func:`lloyd_train`), int64 pairwise
    distances (coords ≤ ~10⁶ → products ≤ 10¹², ×dim ≪ 2⁶³ — exact), and
    the keep-lowest-id rule (``kept[j] ⇔ ∄ i<j in the cluster with
    d²(i,j) ≤ eps2``) — no greedy sequential state, so the whole operator
    unrolls into a SQL oracle (one EXISTS over the within-cluster pair
    join appended to the Lloyd CTEs).

    Scale shape: one broadcast-assignment pass attaches (cluster, x) per
    row, then ONE hash exchange on ``cluster`` co-locates each cluster;
    the per-partition kernel is a vectorized m×m integer matmul per
    cluster. The all-pairs-within-cluster cost is SemDeDup's defining
    trade: k must grow ∝ corpus size so per-cluster m stays bounded
    (the paper uses k ≈ N/100k); with that invariant no partition frame
    or distance matrix grows with total corpus size. ``k=None`` (the
    default) enforces that invariant engine-side via
    :func:`semdedup_auto_k`; an explicit k is still bounded by the loud
    per-cluster guard (``SEMDEDUP_MAX_CLUSTER_ROWS``) in the kernel."""
    from raydf.joins import partitioned_group_map

    if k is None:
        k = semdedup_auto_k(embeds.count())
    # capture by VALUE at plan time: the kernel closure runs in workers,
    # which re-import this module (a driver-side override of the module
    # attribute would silently not apply there)
    max_cluster_rows = SEMDEDUP_MAX_CLUSTER_ROWS
    cents = lloyd_train(embeds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(cents)

    def label_with_vec(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = quantize(_batch_matrix(batch, vec_col))
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "cluster": pa.array(assign(x, c), pa.int64()),
                "__x": pa.array(list(x), pa.list_(pa.int64())),
            }
        )

    labelled = embeds.map_batches(label_with_vec, batch_format="pyarrow")

    def per_partition(df):
        import pandas as pd

        out = []
        for cl, g in df.groupby("cluster", sort=False):
            if len(g) > max_cluster_rows:
                raise ValueError(
                    f"semdedup cluster {cl} holds {len(g)} vectors "
                    f"(> SEMDEDUP_MAX_CLUSTER_ROWS={max_cluster_rows}"
                    f"); the m×m kernel would need "
                    f"{len(g) ** 2 * 8 / 2**30:.1f} GiB — raise k (or pass "
                    "k=None for auto-k ∝ corpus size)"
                )
            g = g.sort_values(id_col)
            x = np.stack(g["__x"].to_numpy()).astype(np.int64)
            sq = np.einsum("nd,nd->n", x, x)
            d2 = sq[:, None] + sq[None, :] - 2 * (x @ x.T)
            # dup[j] ⇔ some i<j (row-sorted by id) is within eps2
            dup = np.triu(d2 <= eps2, 1).any(axis=0)
            out.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(np.int64),
                        "cluster": np.full(len(g), cl, np.int64),
                        "kept": ~dup,
                    }
                )
            )
        return pd.concat(out) if out else df[[id_col, "cluster"]].assign(kept=True)

    return partitioned_group_map(
        labelled, ["cluster"], per_partition, num_partitions=num_partitions
    )


# ------------------------------------------------- product quantization


def pq_train(embeds, *, m: int = 8, k: int = 16, iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Train the (m, k, d/m) int64 PQ codebook tensor — the training loop
    of :func:`pq_encode`, exposed so IVF-PQ search
    (:func:`raydf.datapipe.ann.ivfpq_search`) builds its ADC lookup tables
    from the EXACT codebooks the stored codes were assigned against."""
    full = _init_centroids(embeds, k, id_col=id_col, vec_col=vec_col)
    dim = full.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    dsub = dim // m
    cents = full.reshape(k, m, dsub).transpose(1, 0, 2).copy()  # (m, k, dsub)

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = quantize(_batch_matrix(batch, vec_col)).reshape(-1, m, dsub)
            ss, codes, counts, sums = [], [], [], []
            for s in range(m):
                lab = assign(x[:, s, :], c[s])
                cnt = np.bincount(lab, minlength=k).astype(np.int64)
                sm = np.zeros((k, dsub), np.int64)
                np.add.at(sm, lab, x[:, s, :])
                ss.append(np.full(k, s, np.int64))
                codes.append(np.arange(k, dtype=np.int64))
                counts.append(cnt)
                sums.append(sm)
            return pa.table(
                {
                    "s": pa.array(np.concatenate(ss), pa.int64()),
                    "code": pa.array(np.concatenate(codes), pa.int64()),
                    "n": pa.array(np.concatenate(counts), pa.int64()),
                    "sum": pa.array(list(np.concatenate(sums)), pa.list_(pa.int64())),
                }
            )

        p = embeds.map_batches(partials, batch_format="pyarrow").to_pandas()
        counts = np.zeros((m, k), np.int64)
        sums = np.zeros((m, k, dsub), np.int64)
        for s, code, n, sm in zip(p["s"], p["code"], p["n"], p["sum"]):
            counts[s, code] += n
            sums[s, code] += np.asarray(sm, np.int64)
        new = cents.copy()  # empty codes keep their previous centroid
        nz = counts > 0
        new[nz] = np.floor_divide(sums[nz], counts[nz, None])
        cents = new
    return cents


def pq_encode(embeds, *, m: int = 8, k: int = 16, iters: int = 2,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Product-quantization codes: split each vector into ``m`` contiguous
    subspaces, run the same exact-integer Lloyd as :func:`kmeans_assign`
    independently per subspace (``k`` codes each), and emit one
    ``(vec_id, s, code)`` row per subspace — the compressed representation
    an IVF-PQ index stores (codes are m·log2(k) bits per vector vs d·32).

    All subspaces train in the SAME streaming passes: one broadcast of the
    (m, k, d/m) codebook tensor per iteration, per-batch integer-matmul
    assignments per subspace, (m·k) partial rows per block to the driver
    reduce. Deterministic contract identical to kmeans_assign (quantized
    int64, floor-division updates, first-argmin tie-break, seeds = the
    vectors of ids 0..k-1 sliced per subspace), so the whole train+encode
    path unrolls into a SQL oracle grouped by subspace."""
    cents = pq_train(embeds, m=m, k=k, iters=iters,
                     id_col=id_col, vec_col=vec_col)
    dsub = cents.shape[2]

    ref = ray.put(cents)

    def encode(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = quantize(_batch_matrix(batch, vec_col)).reshape(-1, m, dsub)
        n = x.shape[0]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_ids = np.repeat(ids, m)
        out_s = np.tile(np.arange(m, dtype=np.int64), n)
        codes = np.empty((n, m), np.int64)
        for s in range(m):
            codes[:, s] = assign(x[:, s, :], c[s])
        return pa.table(
            {
                id_col: pa.array(out_ids.astype(np.int64), pa.int64()),
                "s": pa.array(out_s, pa.int64()),
                "code": pa.array(codes.reshape(-1), pa.int64()),
            }
        )

    return embeds.map_batches(encode, batch_format="pyarrow")
