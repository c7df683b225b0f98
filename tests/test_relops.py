"""Relational-operator compositions (raydf/relops.py): each distributed
operator must reproduce a small in-process ground truth exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


@pytest.fixture
def events():
    rng = np.random.RandomState(7)
    n = 400
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 12, n).astype(np.int64),
            "t": rng.randint(0, 10_000, n).astype(np.int64),
        }
    )


def test_asof_join_matches_pandas(ray_session, events):
    from raydf.relops import asof_join

    left = events.iloc[:150].copy()
    right = events.iloc[150:].copy().drop(columns="event_id")
    right["payload"] = right["t"] * 10

    got = (
        asof_join(_ds(left), _ds(right), by=["user_id"], on="t", num_partitions=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t", by="user_id", direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    # the engine keeps missed int payloads as nullable Int64 (exact above
    # 2^53); the pandas oracle degrades them to float64 — compare values
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype({"payload": "float64"}), want
    )
    assert got["payload"].isna().any()  # some users have no earlier right row


def test_range_join_count_matches_bruteforce(ray_session, events):
    from raydf.relops import range_join_count

    left = events.iloc[:100]
    right = events.iloc[100:]
    lo, hi = -500, 100
    got = (
        range_join_count(
            _ds(left), _ds(right.drop(columns="event_id")),
            by=["user_id"], on="t", lo=lo, hi=hi, num_partitions=4,
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    want = [
        int(
            (
                (right["user_id"] == row.user_id)
                & (right["t"] >= row.t + lo)
                & (right["t"] < row.t + hi)
            ).sum()
        )
        for row in left.itertuples()
    ]
    assert got["n_in_range"].tolist() == want
    assert sum(want) > 0  # non-vacuous fixture


def test_range_join_count_salted_equivalent(ray_session, events):
    """Planted power-law key: user 3 owns 70% of rows. The salted path
    (salt=4) must return byte-identical counts to the unsalted one."""
    from raydf.relops import range_join_count

    hot = events.copy()
    hot.loc[hot.index[: int(len(hot) * 0.7)], "user_id"] = 3
    left = hot.iloc[:150]
    right = hot.iloc[150:].drop(columns="event_id")
    lo, hi = -300, 200

    def run(**kw):
        return (
            range_join_count(
                _ds(left), _ds(right),
                by=["user_id"], on="t", lo=lo, hi=hi,
                num_partitions=6, **kw,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )

    base = run()
    salted = run(salt=4)
    pd.testing.assert_frame_equal(salted[base.columns.tolist()], base)
    # non-vacuous: the hot key actually dominates and has matches
    assert (left["user_id"] == 3).sum() > 80
    assert base.loc[base["user_id"] == 3, "n_in_range"].sum() > 0


def test_topk_per_group(ray_session, events):
    from raydf.relops import topk_per_group

    got = (
        topk_per_group(
            _ds(events), ["user_id"], "t", 3,
            tie_cols=["event_id"], num_partitions=4,
        )
        .to_pandas()
        .sort_values(["user_id", "t", "event_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        events.sort_values(["t", "event_id"], ascending=[False, True], kind="mergesort")
        .groupby("user_id", sort=False).head(3)
        .sort_values(["user_id", "t", "event_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_quantile_per_group_lower_interpolation(ray_session, events):
    from raydf.relops import quantile_per_group

    got = (
        quantile_per_group(_ds(events), ["user_id"], "t", [0.5, 0.95], num_partitions=4)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    rows = []
    for u, grp in events.groupby("user_id"):
        v = np.sort(grp["t"].to_numpy())
        rows.append(
            {
                "user_id": u,
                "p50": v[int(np.floor(0.5 * (len(v) - 1)))],
                "p95": v[int(np.floor(0.95 * (len(v) - 1)))],
            }
        )
    want = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(got[["user_id", "p50", "p95"]], want)


def test_anti_join_keys(ray_session, events):
    from raydf.relops import anti_join_keys

    big = events
    keys = events[events["user_id"] < 6][["user_id"]]  # users 6-11 absent
    got = (
        anti_join_keys(_ds(big), _ds(keys), ["user_id"], num_partitions=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    absent = set(big["user_id"]) - set(keys["user_id"])
    want = (
        big[big["user_id"].isin(absent)].sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_global_topk_matches_sort(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raydf.relops import global_topk

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"v": rng.randint(0, 50, 500), "id": np.arange(500)})
    ds = rd.from_pandas(df).repartition(8)
    got = global_topk(ds, "v", 10, tie_cols=["id"]).to_pandas()
    want = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["v", "id"]], want[["v", "id"]])


def test_full_outer_join_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raydf.relops import full_outer_join

    l = pd.DataFrame({"k": np.array([1, 2, 3, 5], np.int64),
                      "lv": np.array([10, 20, 30, 50], np.int64)})
    r = pd.DataFrame({"k": np.array([2, 3, 4], np.int64),
                      "rv": ["b", "c", "d"]})
    ds = full_outer_join(
        rd.from_arrow(pa.Table.from_pandas(l)).repartition(3),
        rd.from_arrow(pa.Table.from_pandas(r)).repartition(2),
        ["k"], num_partitions=4,
    ).materialize()
    # the ARROW schema keeps the missing int side nullable-int64 (the
    # pinned out_schema), not float64 — pandas may render floats below
    sch = ds.schema()
    assert str(dict(zip(sch.names, sch.types))["lv"]) == "int64"
    out = ds.to_pandas().sort_values("k").reset_index(drop=True)
    exp = l.merge(r, on="k", how="outer").sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == list(exp["k"])
    assert out.loc[out["k"] == 4, "rv"].iloc[0] == "d"
    assert pd.isna(out.loc[out["k"] == 4, "lv"].iloc[0])
    assert pd.isna(out.loc[out["k"] == 1, "rv"].iloc[0])
    assert len(out) == 5


def test_full_outer_join_full_range_int64_exact():
    """Misses on either side must not float64-degrade the other side's
    int64 payloads: values above 2^53 round-trip exactly (ADVICE r03)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raydf.relops import full_outer_join

    big = 2**62 + 57
    l = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                "lv": pa.array([big, big + 1], pa.int64())}))
    r = rd.from_arrow(pa.table({"k": pa.array([2, 3], pa.int64()),
                                "rv": pa.array([-big, big + 3], pa.int64())}))
    # consume via Arrow rows: Dataset.to_pandas() would float64-degrade
    # nullable int64 — the engine's blocks must be exact
    rows = {r["k"]: r for r in full_outer_join(l, r, ["k"], num_partitions=3).take_all()}
    assert rows[1]["lv"] == big
    assert rows[2]["rv"] == -big
    assert rows[3]["rv"] == big + 3
    assert rows[3]["lv"] is None


def test_asof_join_miss_keeps_full_range_int64(ray_session):
    """A left row with no as-of match must not float64-degrade the right
    payload column for the rows that DID match (ADVICE r03 family)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raydf.relops import asof_join

    big = 2**62 + 57
    l = rd.from_arrow(pa.table({"u": pa.array([1, 1], pa.int64()),
                                "ts": pa.array([5, 50], pa.int64())}))
    r = rd.from_arrow(pa.table({"u": pa.array([1], pa.int64()),
                                "ts": pa.array([10], pa.int64()),
                                "pay": pa.array([big], pa.int64())}))
    rows = {r["ts"]: r for r in
            asof_join(l, r, by=["u"], on="ts", num_partitions=2).take_all()}
    assert rows[5]["pay"] is None
    assert rows[50]["pay"] == big
