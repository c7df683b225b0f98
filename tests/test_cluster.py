"""k-means tests: exact-integer Lloyd vs an in-test replica, block-count
invariance of the partial/final aggregate, and empty-cluster handling."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raydf.datapipe import cluster


def emb_table(vecs: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )


def replica(vecs: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Single-process Lloyd with the module's exact contract."""
    x = cluster.quantize(vecs.astype(np.float32))
    cents = x[:k].copy()
    for _ in range(iters):
        lab = cluster.assign(x, cents)
        new = cents.copy()
        for c in range(k):
            m = lab == c
            if m.any():
                new[c] = np.floor_divide(x[m].sum(axis=0), m.sum())
        cents = new
    return cluster.assign(x, cents)


def test_kmeans_matches_replica_and_block_invariant():
    rng = np.random.default_rng(7)
    # interleave blobs so the deterministic seeds (ids 0..3) start one per blob
    blob = np.arange(120) % 4
    vecs = rng.normal(scale=0.4, size=(120, 8)) + 3.0 * blob[:, None]
    exp = replica(vecs, k=4, iters=2)
    for blocks in (1, 7):
        out = (
            cluster.kmeans_assign(
                rd.from_arrow(emb_table(vecs)).repartition(blocks), k=4, iters=2
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        assert (out["cluster"].to_numpy() == exp).all()
    # the planted blobs are actually separated: one cluster per blob
    for g in range(4):
        assert len(set(exp[blob == g])) == 1
    assert len(set(exp)) == 4


def test_kmeans_empty_cluster_keeps_previous_centroid():
    # seeds 0 and 1 are identical: argmin ties to cluster 0, cluster 1
    # captures nothing and must keep its centroid without crashing
    vecs = np.array(
        [[0.0, 0.0], [0.0, 0.0], [10.0, 10.0], [10.0, 11.0], [0.1, 0.0]],
    )
    out = (
        cluster.kmeans_assign(rd.from_arrow(emb_table(vecs)), k=3, iters=2)
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    exp = replica(vecs, k=3, iters=2)
    assert (out == exp).all()
    # cluster 1 was starved in iteration 1; because it KEPT its [0,0]
    # centroid (instead of degenerating), the zero points come back to it
    # once cluster 0's centroid drifts — all three clusters end non-empty
    assert set(out) == {0, 1, 2}


def test_kmeans_negative_coordinates_floor_division():
    # negative sums exercise floor (not truncating) centroid division
    rng = np.random.default_rng(3)
    vecs = rng.normal(loc=-2.0, scale=1.0, size=(40, 5))
    out = (
        cluster.kmeans_assign(rd.from_arrow(emb_table(vecs)), k=3, iters=3)
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    assert (out == replica(vecs, k=3, iters=3)).all()


def pq_replica(vecs: np.ndarray, m: int, k: int, iters: int) -> np.ndarray:
    """(n, m) code matrix via the module's exact contract, per subspace."""
    x = cluster.quantize(vecs.astype(np.float32))
    n, dim = x.shape
    dsub = dim // m
    xs = x.reshape(n, m, dsub)
    codes = np.empty((n, m), np.int64)
    for s in range(m):
        sub = xs[:, s, :]
        cents = sub[:k].copy()
        for _ in range(iters):
            lab = cluster.assign(sub, cents)
            new = cents.copy()
            for c in range(k):
                msk = lab == c
                if msk.any():
                    new[c] = np.floor_divide(sub[msk].sum(axis=0), msk.sum())
            cents = new
        codes[:, s] = cluster.assign(sub, cents)
    return codes


def test_pq_encode_matches_replica_and_block_invariant():
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(80, 16))
    exp = pq_replica(vecs, m=4, k=8, iters=2)
    for blocks in (1, 5):
        out = (
            cluster.pq_encode(
                rd.from_arrow(emb_table(vecs)).repartition(blocks), m=4, k=8, iters=2
            )
            .to_pandas()
            .sort_values(["vec_id", "s"])
        )
        got = out["code"].to_numpy().reshape(80, 4)
        assert (got == exp).all()


def test_pq_codes_reconstruct_better_than_permuted():
    # encoding must beat a code shuffle: reconstruction error from each
    # vector's own codes is below the error from another vector's codes
    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(60, 16)) + np.repeat(
        rng.normal(scale=3.0, size=(6, 16)), 10, axis=0
    )  # clustered structure so codes carry signal
    m, k = 4, 8
    x = cluster.quantize(vecs.astype(np.float32)).reshape(60, m, -1)
    out = (
        cluster.pq_encode(rd.from_arrow(emb_table(vecs)), m=m, k=k, iters=2)
        .to_pandas()
        .sort_values(["vec_id", "s"])
    )
    codes = out["code"].to_numpy().reshape(60, m)
    # rebuild the trained codebook the same way the replica does
    exp_codes = pq_replica(vecs, m=m, k=k, iters=2)
    assert (codes == exp_codes).all()
    # centroid table per subspace from the replica path
    xs = cluster.quantize(vecs.astype(np.float32)).reshape(60, m, -1)
    err_own = 0
    err_perm = 0
    perm = np.roll(np.arange(60), 7)
    for s in range(m):
        sub = xs[:, s, :]
        cents = sub[:k].copy()
        for _ in range(2):
            lab = cluster.assign(sub, cents)
            new = cents.copy()
            for c in range(k):
                msk = lab == c
                if msk.any():
                    new[c] = np.floor_divide(sub[msk].sum(axis=0), msk.sum())
            cents = new
        err_own += ((sub - cents[codes[:, s]]) ** 2).sum()
        err_perm += ((sub - cents[codes[perm, s]]) ** 2).sum()
    assert err_own < err_perm


def semdedup_replica(vecs: np.ndarray, k: int, iters: int, eps2: int):
    """(labels, kept) via the module's exact contract, single-process."""
    x = cluster.quantize(vecs.astype(np.float32))
    cents = x[:k].copy()
    for _ in range(iters):
        lab = cluster.assign(x, cents)
        new = cents.copy()
        for c in range(k):
            m = lab == c
            if m.any():
                new[c] = np.floor_divide(x[m].sum(axis=0), m.sum())
        cents = new
    lab = cluster.assign(x, cents)
    kept = np.ones(len(x), bool)
    for j in range(len(x)):
        for i in range(j):
            if lab[i] == lab[j] and ((x[i] - x[j]) ** 2).sum() <= eps2:
                kept[j] = False
                break
    return lab, kept


def test_semdedup_matches_replica_and_block_invariant():
    rng = np.random.default_rng(23)
    # 3 blobs plus planted near-duplicates (tiny jitter around members)
    base = rng.normal(scale=0.3, size=(60, 8)) + 2.5 * (np.arange(60) % 3)[:, None]
    dups = base[rng.integers(0, 60, size=15)] + rng.normal(scale=1e-4, size=(15, 8))
    vecs = np.concatenate([base, dups])
    eps2 = 10_000_000_000  # (1e5)^2 per dim scale — catches the planted jitter
    lab, kept = semdedup_replica(vecs, k=3, iters=2, eps2=eps2)
    assert (~kept).sum() >= 15  # every planted dup (and any accidental) dropped
    for blocks in (1, 6):
        out = (
            cluster.semdedup(
                rd.from_arrow(emb_table(vecs)).repartition(blocks),
                k=3, iters=2, eps2=eps2,
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        assert (out["cluster"].to_numpy() == lab).all()
        assert (out["kept"].to_numpy() == kept).all()


def test_semdedup_keeps_everything_below_threshold():
    rng = np.random.default_rng(29)
    vecs = rng.normal(size=(40, 8)) * 0.5
    out = cluster.semdedup(
        rd.from_arrow(emb_table(vecs)), k=2, iters=1, eps2=1
    ).to_pandas()
    assert len(out) == 40 and out["kept"].all()


def test_semdedup_auto_k_scales_with_corpus():
    """Engine-enforced SemDeDup invariant (VERDICT r04 #9 / ADVICE r04
    medium): k grows ∝ corpus size, so the expected per-cluster row count
    (and hence the m×m kernel matrix) stays FLAT as the corpus grows
    100× instead of the O((N/k)²) blowup a fixed k=8 gives."""
    t = cluster.SEMDEDUP_TARGET_CLUSTER_ROWS
    small, big = 20 * t, 2000 * t  # 100× growth
    k_small = cluster.semdedup_auto_k(small)
    k_big = cluster.semdedup_auto_k(big)
    assert small // k_small == big // k_big == t  # per-cluster rows flat
    # tiny corpora floor at k_min=8 (the driver-sf regime, oracle k=8)
    assert cluster.semdedup_auto_k(500) == 8
    assert cluster.semdedup_auto_k(0) == 8
    # SQL-replicable: GREATEST(8, n // 8192) — plain floor division
    assert cluster.semdedup_auto_k(8192 * 9 + 1) == 9


def test_semdedup_auto_k_end_to_end_matches_explicit():
    """k=None (auto) at sub-floor corpus size must run with k_min=8 and
    equal the explicit k=8 result bit-for-bit."""
    rng = np.random.default_rng(31)
    vecs = rng.normal(scale=0.4, size=(64, 8)) + 2.0 * (np.arange(64) % 8)[:, None]
    eps2 = 10_000_000_000
    explicit = (
        cluster.semdedup(rd.from_arrow(emb_table(vecs)), k=8, iters=2, eps2=eps2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    auto = (
        cluster.semdedup(rd.from_arrow(emb_table(vecs)), k=None, iters=2, eps2=eps2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (auto["cluster"].to_numpy() == explicit["cluster"].to_numpy()).all()
    assert (auto["kept"].to_numpy() == explicit["kept"].to_numpy()).all()


def test_semdedup_oversize_cluster_raises_loudly(monkeypatch):
    """A cluster past SEMDEDUP_MAX_CLUSTER_ROWS must fail with a sized,
    actionable error — not an opaque worker OOM (ADVICE r04 medium)."""
    import pytest

    monkeypatch.setattr(cluster, "SEMDEDUP_MAX_CLUSTER_ROWS", 8)
    rng = np.random.default_rng(37)
    vecs = rng.normal(scale=0.1, size=(32, 8))  # one tight blob, k=1
    with pytest.raises(Exception, match="SEMDEDUP_MAX_CLUSTER_ROWS"):
        cluster.semdedup(
            rd.from_arrow(emb_table(vecs)), k=1, iters=1, eps2=1
        ).to_pandas()
