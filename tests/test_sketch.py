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
