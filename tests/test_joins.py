"""Join-layer tests: the partitioned merge join (big-big cascade path) and
the coarse-partitioned distinct/group-map helpers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from raydf import rules as R
from raydf.deduce import FixpointEngine
from raydf.fixtures import triples_from_terms
from raydf.joins import distinct, partitioned_group_map, partitioned_merge_join


def test_partitioned_merge_join_exact_full_range_int64():
    """Join keys/payloads are full-range int64 hashes — a float64 detour
    (int64-with-nulls → pandas) silently corrupts them past 2^53. The join
    must round-trip exactly."""
    big = np.array([2**62 + 1, -(2**62) - 7, 2**53 + 1, 5], dtype=np.int64)
    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "a": pa.array(big, pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([2, 3, 3, 9], pa.int64()), "b": pa.array(big, pa.int64())})
    )
    out = (
        partitioned_merge_join(left, right, ["k"], ["k", "a"], ["k", "b"], num_partitions=8)
        .to_pandas()
        .sort_values(["k", "b"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [2, 3, 3]
    assert out["a"].tolist() == [int(big[1]), int(big[2]), int(big[2])]
    assert set(out.loc[out["k"] == 3, "b"]) == {int(big[1]), int(big[2])}


def test_cascade_merge_join_path_matches_broadcast(tmp_workdir, monkeypatch):
    """Force every cascade join through partitioned_merge_join and check the
    closure equals the (broadcast-path) golden result."""
    from raydf import match

    monkeypatch.setattr(match, "BROADCAST_BINDINGS_LIMIT", 0)
    E = "https://example.org/#edge"
    nodes = [R.iri(f"j{i}") for i in range(7)]
    triples, _ = triples_from_terms([(nodes[i], R.iri(E), nodes[i + 1]) for i in range(6)])
    system = R.System()
    system.insert(
        R.rule(
            3,
            [R.pat(R.v(0), R.iri(E), R.v(1)), R.pat(R.v(1), R.iri(E), R.v(2))],
            [R.triple_st(R.v(0), R.iri(E), R.v(2))],
            name="trans",
        )
    )
    eng = FixpointEngine(system, tmp_workdir, buckets=4, num_partitions=4)
    eng.load_initial(rd.from_arrow(triples))
    eng.run(max_rounds=10)
    out = eng.dataset().to_pandas()
    pairs = {(s, o) for s, o in zip(out["subj"], out["obj"])}
    expected = {(nodes[i].id, nodes[j].id) for i in range(7) for j in range(i + 1, 7)}
    assert pairs == expected


def test_distinct_and_group_map_preserve_full_range_ids():
    ids = np.array([2**62 + 3, 2**62 + 3, -(2**61) - 1], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(ids, pa.int64())}))
    out = distinct(ds, ["x"]).to_pandas()
    assert set(out["x"]) == {int(ids[0]), int(ids[2])}

    gm = partitioned_group_map(
        ds, ["x"], lambda df: df.drop_duplicates("x"), num_partitions=4
    ).to_pandas()
    assert set(gm["x"]) == {int(ids[0]), int(ids[2])}


# ---------------------------------------------------- lazy cascade hash path


def _mk_triples(rows):
    import pyarrow as pa
    import numpy as np

    from raydf.schema import TRIPLES_SCHEMA

    n = len(rows)
    return pa.table(
        {
            "subj": pa.array([r[0] for r in rows], pa.int64()),
            "pred": pa.array([r[1] for r in rows], pa.int64()),
            "obj": pa.array([r[2] for r in rows], pa.int64()),
            "sign": pa.array([True] * n, pa.bool_()),
            "graph": pa.array(np.zeros(n, np.int64), pa.int64()),
            "rule_idx": pa.nulls(n, pa.int32()),
            "round": pa.array([0] * n, pa.int32()),
            "substitution": pa.nulls(n, pa.large_list(pa.int64())),
            "content_sha256": pa.nulls(n, pa.string()),
        },
        schema=TRIPLES_SCHEMA,
    )


def test_lazy_hash_join_tiny_and_empty_sides(monkeypatch):
    """Force the LAZY hash-join cascade path (broadcast limit 0) on tiny
    sides: Ray 2.49's native join crashes when a side contributes zero
    blocks overall — the cascade must probe and short-circuit instead, and
    a tiny (2-row) left across many partitions must still join correctly
    (empty PARTITIONS are fine; empty SIDES are not)."""
    import ray.data as rd

    from raydf import match as M
    from raydf import rules as R

    monkeypatch.setattr(M, "BROADCAST_BINDINGS_LIMIT", 0)

    P = 77  # pred id
    ds = rd.from_arrow(_mk_triples([(1, P, 2), (2, P, 3)])).materialize()
    src = M.DatasetSource(ds)
    rule = R.rule(
        3,
        [R.pat(R.v(0), IntC(P), R.v(1)), R.pat(R.v(1), IntC(P), R.v(2))],
        [R.triple_st(R.v(0), IntC(P), R.v(2))],
    )
    b = M.rule_bindings(rule, src, num_partitions=8)
    out = b.to_pandas().sort_values(["v0"]).reset_index(drop=True)
    assert out[["v0", "v1", "v2"]].values.tolist() == [[1, 2, 3]]

    # a pattern matching ZERO rows (pred 999) must short-circuit to None,
    # not crash inside the join aggregator
    rule2 = R.rule(
        3,
        [R.pat(R.v(0), IntC(P), R.v(1)), R.pat(R.v(1), IntC(999), R.v(2))],
        [R.triple_st(R.v(0), IntC(P), R.v(2))],
    )
    b2 = M.rule_bindings(rule2, src, num_partitions=8)
    assert b2 is None or b2.count() == 0


def IntC(i: int):
    from raydf.rules import ConstTerm

    class _IntConst(ConstTerm):
        @property
        def id(self) -> int:
            return int(self.lexical.removeprefix("int:"))

    return _IntConst(kind=0, lexical=f"int:{i}", datatype=None)


def test_partitioned_lookup_join_inner_and_left(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raydf.joins import partitioned_lookup_join

    pairs = rd.from_arrow(
        pa.table({"a": pa.array([1, 2, 9], pa.int64()),
                  "x": pa.array([10, 20, 90], pa.int64())})
    )
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["t1", "t2", "t3"])})
    )
    inner = (
        partitioned_lookup_join(pairs, "a", docs, "doc_id", "text", "ta",
                                num_partitions=5)
        .to_pandas().sort_values("a").reset_index(drop=True)
    )
    assert inner["a"].tolist() == [1, 2]          # 9 has no lookup row
    assert inner["ta"].tolist() == ["t1", "t2"]
    assert inner["x"].dtype == np.int64           # no float64 degradation
    left = (
        partitioned_lookup_join(pairs, "a", docs, "doc_id", "text", "ta",
                                how="left", num_partitions=5)
        .to_pandas().sort_values("a").reset_index(drop=True)
    )
    assert left["a"].tolist() == [1, 2, 9]
    assert left["ta"].tolist()[:2] == ["t1", "t2"] and pd.isna(left["ta"][2])


def test_partitioned_lookup_join_left_int_values_nullable(ray_session):
    """how='left' with an INTEGER lookup value: misses must surface as
    nulls, not crash on the pandas NaN→float64 degradation (ADVICE r02)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raydf.joins import partitioned_lookup_join

    left = rd.from_pandas(pd.DataFrame({"k": np.arange(6, dtype=np.int64)}))
    lookup = rd.from_pandas(
        pd.DataFrame(
            {"k": np.array([0, 2, 4], np.int64), "v": np.array([10, 20, 40], np.int64)}
        )
    )
    out = (
        partitioned_lookup_join(left, "k", lookup, "k", "v", "v", how="left")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 6
    hits = out[out["k"] % 2 == 0]["v"].tolist()
    assert hits == [10, 20, 40]
    assert out[out["k"] % 2 == 1]["v"].isna().all()


def test_partitions_for_bytes_sizing_rule():
    from raydf.joins import PARTITION_TARGET_BYTES, partitions_for_bytes

    assert partitions_for_bytes(0, floor=16) == 16
    assert partitions_for_bytes(None, floor=16) == 16
    assert partitions_for_bytes(PARTITION_TARGET_BYTES * 100, floor=16) == 100
    # small inputs keep the CPU-scaled floor
    assert partitions_for_bytes(1024, floor=64) == 64


def test_arrow_schema_pandas_block_with_text(ray_session):
    """PandasBlockSchema fallback: object dtype must map to pa.string(),
    not crash pa.from_numpy_dtype — and the helpers built on arrow_schema
    must accept pandas-block datasets with text columns (ADVICE r03)."""
    from raydf.joins import arrow_schema
    from raydf.relops import full_outer_join

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                      "text": ["a", "b", "c"]})
    )
    s = arrow_schema(ds)
    assert s.field("text").type in (pa.string(), pa.large_string())
    other = rd.from_pandas(
        pd.DataFrame({"doc_id": np.array([2, 3], np.int64),
                      "extra": ["x", "y"]})
    )
    out = full_outer_join(ds, other, ["doc_id"]).to_pandas()
    assert len(out) == 4
    assert out.loc[out["doc_id"] == 2, "extra"].iloc[0] == "x"


def test_lookup_join_left_full_range_int64_exact(ray_session):
    """how='left' with full-range int64 lookup values: ONE miss used to
    degrade the whole column to float64 and corrupt values above 2^53
    (off by 57 at 2^62 — ADVICE r03). Hits must round-trip exactly."""
    from raydf.joins import partitioned_lookup_join

    big = 2**62 + 57
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    lookup = rd.from_arrow(
        pa.table({"k": pa.array([1, 3], pa.int64()),
                  "v": pa.array([big, -big - 7], pa.int64())})
    )
    ds = partitioned_lookup_join(left, "k", lookup, "k", "v", "v",
                                 how="left", num_partitions=5)
    # consume via Arrow: Dataset.to_pandas() itself would float64-degrade
    # the nullable int64 column — the engine's blocks are exact
    rows = {r["k"]: r["v"] for r in ds.take_all()}
    assert rows[1] == big
    assert rows[3] == -big - 7
    assert rows[2] is None


def test_fused_gate_unknown_delta_uses_cascade(ray_session, monkeypatch):
    """delta.upper_bound() is None means UNKNOWN, not big: even with
    RAYDF_FUSED_PAIR=1 the gate must fall back to the decomposition
    cascade — the A/B measured the fused shuffle strictly slower exactly
    when deltas are small (ADVICE r03)."""
    from raydf import match as M

    monkeypatch.setenv("RAYDF_FUSED_PAIR", "1")

    def boom(*a, **k):
        raise AssertionError("fused path taken for unknown-size delta")

    monkeypatch.setattr(M, "fused_pair_bindings", boom)
    P = 77
    full = M.DatasetSource(rd.from_arrow(_mk_triples([(1, P, 2), (2, P, 3)])).materialize())
    # lazy delta: a map_batches view has no metadata row bound → ub None
    lazy = rd.from_arrow(_mk_triples([(2, P, 3)])).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    delta = M.DatasetSource(lazy)
    assert delta.upper_bound() is None
    old = M.DatasetSource(rd.from_arrow(_mk_triples([(1, P, 2)])).materialize())
    rule = R.rule(
        3,
        [R.pat(R.v(0), IntC(P), R.v(1)), R.pat(R.v(1), IntC(P), R.v(2))],
        [R.triple_st(R.v(0), IntC(P), R.v(2))],
    )
    b = M.rule_bindings(rule, full, delta=delta, old=old, num_partitions=4)
    out = b.to_pandas()
    assert out[["v0", "v1", "v2"]].values.tolist() == [[1, 2, 3]]


def test_group_maps_emit_arrow_blocks(ray_session):
    """partitioned_group_map / distinct outputs must be ARROW blocks —
    pandas group outputs (especially empty ones, which skip later map
    UDFs) flip Ray's sort-reduce most-prevalent block normalization to
    pandas, silently degrading null-padded int64 columns to float64 and
    corrupting full-range ids above 2^53 (round-4 root cause of the
    nondeterministic remap_triples_joined failure)."""
    import pyarrow as pa

    from raydf.joins import distinct, partitioned_group_map

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 2, 3], pa.int64()),
                "v": pa.array([2**62 + i for i in range(5)], pa.int64()),
            }
        )
    )
    gm = partitioned_group_map(
        ds, ["k"], lambda d: d.groupby("k", as_index=False)["v"].min(),
        num_partitions=8,
    ).materialize()
    dn = distinct(ds, ["k"], num_partitions=8).materialize()
    for out in (gm, dn):
        for ref in out.get_internal_block_refs():
            b = ray.get(ref)
            assert isinstance(b, pa.Table), type(b)
    got = gm.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["v"].tolist() == [2**62, 2**62 + 2, 2**62 + 4]  # exact int64
    assert len(dn.to_pandas()) == 3


def test_join_partition_policy(ray_session, monkeypatch):
    """The native-join partition cap scales with aggregate cluster CPUs
    (max(16, cpus//2)) instead of a universal hard 16 (VERDICT r03 #3);
    RAYDF_JOIN_PARTITION_CAP overrides; the CPU term still bounds it."""
    from raydf.match import _join_partitions

    cpus = int(ray.cluster_resources().get("CPU"))
    assert _join_partitions(1000) == min(max(16, cpus // 2), cpus)
    assert _join_partitions(2) == 2
    monkeypatch.setenv("RAYDF_JOIN_PARTITION_CAP", "3")
    assert _join_partitions(1000) == 3


def test_distinct_write_matches_distinct_exchange(tmp_path, ray_session):
    """distinct_write (staged bucket write, no exchange) must produce the
    same distinct row set — including full-range int64 ids and text
    payload columns — as distinct().write_parquet, and slice output into
    <= rows_per_file-row files."""
    import pyarrow.parquet as pq

    from raydf.joins import distinct_write

    rng = np.random.default_rng(7)
    ids = rng.integers(-(2**62), 2**62, size=5_000, dtype=np.int64)
    ids = np.concatenate([ids, ids[:2_000]])  # guaranteed dupes
    t = pa.table(
        {
            "term_id": pa.array(ids, pa.int64()),
            "lex": pa.array([f"term-{i & 1023}" for i in ids.tolist()]),
        }
    )
    ds = rd.from_arrow(t)

    exch_dir = str(tmp_path / "exchange")
    distinct(ds, ["term_id"]).write_parquet(exch_dir)
    staged_dir = str(tmp_path / "staged")
    n = distinct_write(ds, ["term_id"], staged_dir, buckets=8, rows_per_file=300)

    exp = pq.read_table(exch_dir).to_pandas().sort_values("term_id").reset_index(drop=True)
    got = pq.read_table(staged_dir).to_pandas().sort_values("term_id").reset_index(drop=True)
    assert n == len(exp) == len(got)
    pd.testing.assert_frame_equal(exp, got)
    # files are sliced and the staging dir is cleaned up
    import glob as g
    import os

    assert all(
        pq.ParquetFile(f).metadata.num_rows <= 300
        for f in g.glob(os.path.join(staged_dir, "*.parquet"))
    )
    assert not os.path.exists(staged_dir + "_staging")


def _bloom_fixture():
    """A(x,y) edges funnel into 5 hub nodes; B(y,z) edges mostly DON'T
    start at a hub — the regime the bloom semi-join targets (big scan,
    few true matches)."""
    A, B = 71, 72
    rows = []
    hubs = list(range(1000, 1005))
    for i in range(150):
        rows.append((2000 + i, A, hubs[i % 5]))
    for h in hubs:
        rows.append((h, B, 5000 + h))
    for i in range(600):
        rows.append((3000 + i, B, 4000 + i))  # subj never a hub
    expected = sorted(
        (2000 + i, hubs[i % 5], 5000 + hubs[i % 5]) for i in range(150)
    )
    return A, B, rows, expected


def _bloom_rule(A, B):
    return R.rule(
        3,
        [R.pat(R.v(0), IntC(A), R.v(1)), R.pat(R.v(1), IntC(B), R.v(2))],
        [R.triple_st(R.v(0), IntC(B), R.v(2))],
    )


@pytest.mark.parametrize(
    "bc_limit,dk_cap",
    [
        (3, 2_000_000),   # exact-distinct filter → low-cardinality pmj arm
        (100, 2_000_000), # exact-distinct filter → survivors broadcast arm
        (3, 2),           # distinct cap exceeded → bloom filter → pmj? no:
                          # dk None ⇒ native arm (cardinality unknowable)
        (100, 2),         # bloom filter → survivors broadcast arm
    ],
)
def test_semijoin_dispatch_arms_match_bruteforce(
    ray_session, monkeypatch, bc_limit, dk_cap
):
    """Force the semi-join branch (accumulated side above the broadcast
    limit, single join key) through each post-filter arm — exact-set vs
    bloom reduction (dk_cap), then broadcast vs merge/native join
    (bc_limit) — against a brute-force expected join. Filter false
    positives (bloom) never survive the exact join, and the 5-distinct
    hub key must route AWAY from Ray's native join (the unseeded-
    partition crash class) when the exact set is known."""
    from raydf import match as M

    monkeypatch.setattr(M, "BROADCAST_BINDINGS_LIMIT", bc_limit)
    monkeypatch.setattr(M, "DISTINCT_SET_CAP", dk_cap)
    A, B, rows, expected = _bloom_fixture()
    src = M.DatasetSource(rd.from_arrow(_mk_triples(rows)).materialize())
    b = M.rule_bindings(_bloom_rule(A, B), src, num_partitions=4)
    got = sorted(map(tuple, b.to_pandas()[["v0", "v1", "v2"]].values.tolist()))
    assert got == expected


def test_bloom_semijoin_disabled_matches_enabled(ray_session, monkeypatch):
    """RAYDF_BLOOM_JOIN_LIMIT=0 (pure native-join path) and the semi-join
    path must produce identical bindings on the same fixture."""
    from raydf import match as M

    A, B, rows, expected = _bloom_fixture()
    src = M.DatasetSource(rd.from_arrow(_mk_triples(rows)).materialize())
    outs = []
    for bloom_limit in (0, 20_000_000):
        monkeypatch.setattr(M, "BLOOM_JOIN_LIMIT", bloom_limit)
        monkeypatch.setattr(M, "BROADCAST_BINDINGS_LIMIT", 3)
        b = M.rule_bindings(_bloom_rule(A, B), src, num_partitions=4)
        outs.append(
            sorted(map(tuple, b.to_pandas()[["v0", "v1", "v2"]].values.tolist()))
        )
    assert outs[0] == outs[1] == expected


def test_low_cardinality_key_routes_off_native_join(ray_session, monkeypatch):
    """The crash regression pin: a big-big single-key join whose left key
    has FEW distinct values must NOT reach joins.hash_join — Ray 2.49's
    hash shuffle seeds partition schemas via empty shards from the first
    submitted task only, and an empty first block silently loses that
    broadcast, leaving unseeded partitions that crash pyarrow's join
    (reproduced at 12M files: 24 distinct repo ids covered 12/16
    partitions; resume + fresh runs crashed nondeterministically)."""
    from raydf import joins as J
    from raydf import match as M

    def boom(*a, **k):
        raise AssertionError("native hash_join reached for a "
                             "low-cardinality key")

    monkeypatch.setattr(M, "BROADCAST_BINDINGS_LIMIT", 3)
    monkeypatch.setattr(M.joins, "hash_join", boom)
    A, B, rows, expected = _bloom_fixture()
    src = M.DatasetSource(rd.from_arrow(_mk_triples(rows)).materialize())
    b = M.rule_bindings(_bloom_rule(A, B), src, num_partitions=4)
    got = sorted(map(tuple, b.to_pandas()[["v0", "v1", "v2"]].values.tolist()))
    assert got == expected
