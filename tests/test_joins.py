"""Join-layer tests: the partitioned merge join (big-big cascade path) and
the coarse-partitioned distinct/group-map helpers."""

import numpy as np
import pandas as pd
import pyarrow as pa
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
