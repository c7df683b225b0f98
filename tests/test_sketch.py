"""Mergeable KLL quantile sketch and the combiner-based group-quantile
operator: exact in the small-group regime, bounded rank error beyond it."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raydf.datapipe.sketch import KLL


def test_kll_exact_regime_and_serde():
    rng = np.random.RandomState(3)
    v = rng.randint(-(10**9), 10**9, 200)
    sk = KLL(256)
    for chunk in np.array_split(v, 9):
        sk.add(chunk)
    sk = KLL.from_flat(sk.to_flat())  # round trip
    sv = np.sort(v)
    for q in (0.0, 0.25, 0.5, 0.95, 1.0):
        assert sk.quantile(q) == sv[int(np.floor(q * (len(v) - 1)))]


def test_kll_merge_rank_error_bound():
    rng = np.random.RandomState(4)
    v = rng.randint(0, 10**6, 100_000)
    parts = [KLL(256).add(c) for c in np.array_split(v, 32)]
    m = parts[0]
    for p in parts[1:]:
        m.merge(KLL.from_flat(p.to_flat()))
    sv = np.sort(v)
    for q in np.linspace(0.05, 0.95, 10):
        rank = np.searchsorted(sv, m.quantile(q), side="left") / (len(v) - 1)
        assert abs(rank - q) < 0.05, (q, rank)


@pytest.mark.usefixtures("ray_session")
def test_approx_quantile_per_group_exact_small_groups():
    import ray.data as rd

    from raydf.datapipe.sketch import approx_quantile_per_group

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 40, 2000).astype(np.int64),
            "v": rng.randint(0, 10**6, 2000).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        approx_quantile_per_group(ds, ["g"], "v", [0.5, 0.9], k=256, num_partitions=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    rows = []
    for g, grp in df.groupby("g"):
        sv = np.sort(grp["v"].to_numpy())
        rows.append(
            {
                "g": g,
                "p50": sv[int(np.floor(0.5 * (len(sv) - 1)))],
                "p90": sv[int(np.floor(0.9 * (len(sv) - 1)))],
            }
        )
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got[["g", "p50", "p90"]], want)


def test_hll_estimate_within_error_bound():
    """HLL with 4096 registers: standard error 1.04/sqrt(m) = 1.6%; assert
    the estimate lands within 4 sigma on several cardinalities."""
    import numpy as np
    import pandas as pd

    from raydf.datapipe.sketch import hll_estimate, hll_rho

    for true_n in (100, 5000, 50000):
        vals = np.array([f"u{i}" for i in range(true_n)], dtype=object)
        b, r = hll_rho(vals)
        regs = pd.DataFrame({"b": b, "r": r}).groupby("b")["r"].max()
        est = hll_estimate(regs.value_counts())
        assert abs(est - true_n) / true_n < 0.065, (true_n, est)


def test_hll_histogram_batch_size_invariant(ray_session):
    """Register maxima are associative: the distributed histogram must be
    identical no matter how rows are batched (mergeability contract)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raydf.datapipe.sketch import hll_register_histogram

    n = 4000
    tbl = pa.table(
        {
            "g": pa.array(["a" if i % 3 else "b" for i in range(n)]),
            "v": pa.array(np.arange(n) % 997, pa.int64()),
        }
    )

    def run(parallelism):
        ds = rd.from_arrow(tbl).repartition(parallelism)
        out = hll_register_histogram(ds, "g", "v").to_pandas()
        return out.sort_values(["g", "rho"]).reset_index(drop=True)

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    # exact ground truth per group for a sanity corridor
    from raydf.datapipe.sketch import hll_estimate

    df = tbl.to_pandas()
    for g, grp in df.groupby("g"):
        true_n = grp["v"].nunique()
        h = a[a["g"] == g] if "g" in a.columns else a[a.iloc[:, 0] == g]
        est = hll_estimate(pd.Series(h["n_registers"].to_numpy(), index=h["rho"].to_numpy()))
        assert abs(est - true_n) / true_n < 0.1


# ------------------------------------------------------- Count-Min sketch


def test_cms_state_batch_invariant_and_estimates():
    import pyarrow as pa
    import ray.data as rd

    from raydf.datapipe.sketch import cms_estimate, cms_token_counts

    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(200)]
    # zipf-ish truth: token i appears ~ 2000/(i+1) times
    texts, truth = [], {}
    words = []
    for i, t in enumerate(vocab):
        n = max(1, 2000 // (i + 1))
        truth[t] = n
        words.extend([t] * n)
    rng.shuffle(words)
    for i in range(0, len(words), 50):
        texts.append(" ".join(words[i : i + 50]))
    tbl = pa.table({"text": pa.array(texts, pa.string())})

    states = []
    for blocks in (1, 7):
        st = (
            cms_token_counts(rd.from_arrow(tbl).repartition(blocks))
            .to_pandas()
            .sort_values(["d", "w"])
            .reset_index(drop=True)
        )
        states.append(st)
    # mergeability: the sketch state is independent of how blocks split
    assert states[0].equals(states[1])

    st = states[0]
    n_total = sum(truth.values())
    est = cms_estimate(st, np.array(vocab, dtype=object))
    exact = np.array([truth[t] for t in vocab])
    assert (est >= exact).all()  # CMS never under-counts
    # classic error bound: overshoot ≤ e/width · N with prob 1-e^-depth;
    # deterministic fixture comfortably inside it
    assert (est - exact).max() <= np.e / 1024 * n_total * 4


# ---------------------------------------------------------- Bloom filter


def test_bloom_no_false_negatives_and_block_invariant():
    import pyarrow as pa
    import ray.data as rd

    from raydf.datapipe.sketch import bloom_build, bloom_contains

    members = [f"user{i}" for i in range(500)]
    tbl = pa.table({"u": pa.array(members * 3, pa.string())})  # duplicates fold
    states = []
    for blocks in (1, 6):
        st = (
            bloom_build(rd.from_arrow(tbl).repartition(blocks), "u")
            .to_pandas()
            .sort_values(["d", "bit"])
            .reset_index(drop=True)
        )
        states.append(st)
    assert states[0].equals(states[1])  # union merge is block-invariant

    st = states[0]
    assert bloom_contains(st, np.array(members, dtype=object)).all()  # no FN
    probes = np.array([f"absent{i}" for i in range(2000)], dtype=object)
    fpr = bloom_contains(st, probes).mean()
    # k=2, n=500, m=16384 → (1-e^{-kn/m})^k ≈ 0.0035; allow generous slack
    assert fpr < 0.02
