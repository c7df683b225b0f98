import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raydf import rules as R
from raydf.canonicalize import (
    canonical_mapping,
    canonical_mapping_distributed,
    canonical_mapping_driver,
    remap_triples,
)
from raydf.deduce import FixpointEngine
from raydf.fixtures import triples_from_terms


def test_union_find_min_representative():
    pairs = pd.DataFrame({"a": [5, 3, 9, 20], "b": [3, 1, 5, 21]})
    m = canonical_mapping_driver(pairs)
    d = dict(zip(m["node"], m["canon"]))
    # {5,3,1,9} merge to 1; {20,21} to 20
    assert d[5] == d[3] == d[9] == 1
    assert d[21] == 20
    assert 1 not in d  # representative maps to itself → not in mapping


def test_distributed_matches_driver():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 60, 80)
    b = rng.integers(0, 60, 80)
    pairs = pd.DataFrame({"a": a, "b": b})
    m1 = canonical_mapping_driver(pairs)
    m2 = canonical_mapping_distributed(rd.from_pandas(pairs))
    d1 = dict(zip(m1["node"], m1["canon"]))
    d2 = dict(zip(m2["node"].astype(int), m2["canon"].astype(int)))
    assert d1 == d2


def test_eq_rule_drives_merge_and_remap(tmp_workdir):
    SAME = "https://example.org/#sameAs"
    P = "https://example.org/#p"
    a, b, c = R.iri("a"), R.iri("b"), R.iri("c")
    triples, _ = triples_from_terms(
        [(a, R.iri(SAME), b), (a, R.iri(P), c), (b, R.iri(P), c)]
    )
    system = R.System()
    system.insert(
        R.rule(
            2,
            [R.pat(R.v(0), R.iri(SAME), R.v(1))],
            [R.eq_st(R.v(0), R.v(1))],
            name="same",
        )
    )
    eng = FixpointEngine(system, tmp_workdir, buckets=4, num_partitions=4)
    eng.load_initial(rd.from_arrow(triples))
    eng.run(max_rounds=5)
    eqs = eng.eq_pairs()
    assert eqs is not None and eqs.count() == 1
    mapping = canonical_mapping(eqs)
    assert len(mapping) == 1
    canon = min(a.id, b.id)
    other = max(a.id, b.id)
    assert dict(zip(mapping["node"], mapping["canon"]))[other] == canon

    remapped = remap_triples(eng.dataset(), mapping).to_pandas()
    ids = set(remapped["subj"]) | set(remapped["obj"])
    assert other not in ids
    # (a p c) and (b p c) collapse to one triple after canonical dedup
    spo = remapped[remapped["pred"] == R.iri(P).id][["subj", "obj"]]
    assert len(spo.drop_duplicates()) == 1


def test_remap_joined_matches_broadcast(ray_session):
    """The hash-join remap (scale path for huge mappings) must reproduce
    the broadcast remap exactly, including untouched rows and int64
    fidelity on full-range ids."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raydf.canonicalize import remap_triples, remap_triples_joined
    from raydf.schema import TRIPLES_SCHEMA

    big = np.int64(2**62 + 12345)  # > 2^53: float64 degradation would corrupt
    rows = pa.table(
        {
            "subj": pa.array([1, 2, big], pa.int64()),
            "pred": pa.array([7, 7, 7], pa.int64()),
            "obj": pa.array([2, big, 1], pa.int64()),
            "sign": pa.array([True] * 3, pa.bool_()),
            "graph": pa.array([0, 3, 0], pa.int64()),
            "rule_idx": pa.nulls(3, pa.int32()),
            "round": pa.array([0] * 3, pa.int32()),
            "substitution": pa.nulls(3, pa.large_list(pa.int64())),
            "content_sha256": pa.nulls(3, pa.string()),
        },
        schema=TRIPLES_SCHEMA,
    )
    mapping = pd.DataFrame({"node": [2, int(big)], "canon": [1, 1]})
    tds = rd.from_arrow(rows).materialize()
    cols = ["subj", "pred", "obj", "sign", "graph"]

    via_bcast = (
        remap_triples(tds, mapping).to_pandas()[cols]
        .sort_values(cols).reset_index(drop=True)
    )
    mds = rd.from_arrow(
        pa.table({"node": pa.array(mapping["node"], pa.int64()),
                  "canon": pa.array(mapping["canon"], pa.int64())})
    )
    via_join = (
        remap_triples_joined(tds, mds).to_pandas()[cols]
        .sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_join, via_bcast)
    assert set(via_join["subj"]) == {1}  # 2 and big both remapped to 1
    assert 3 in set(via_join["graph"])  # non-mapped graph id untouched

    # flag_col contract: the joined remap must mark exactly the rows the
    # broadcast remap marks (the Δ seed of the generation loop)
    fb = (
        remap_triples(tds, mapping, flag_col="__changed").to_pandas()
        .sort_values(cols).reset_index(drop=True)
    )
    fj = (
        remap_triples_joined(tds, mds, flag_col="__changed").to_pandas()
        .sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fj[cols + ["__changed"]], fb[cols + ["__changed"]]
    )
    assert fj["__changed"].all()  # every fixture row touches a mapped id


def test_remap_joined_hot_inline_matches_broadcast(ray_session):
    """Forced-hot routing (hot_min=0 drops the absolute floor, so any
    value with count > total//P is a heavy hitter) must stay
    byte-identical to the broadcast remap: hot mapped values are remapped
    INLINE and ride the exchanges as passengers, never value-keyed —
    including a pred remapped on EVERY row, a >2^53 subj planted on a
    QUARTER of the rows (so the inline remap is genuinely exercised on a
    full-range id — ADVICE r04: a once-occurring value never crosses the
    total//P share and silently fell to the exchange path), and a
    constant graph column (the bloom-FP shape that funneled the 12M
    4-CPU leg into one reduce task). Cold mapped values (the random
    low-range ids, each count ≈ n/400) still take the exchange lookup,
    so both routes are covered in one comparison."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raydf.canonicalize import remap_triples, remap_triples_joined
    from raydf.schema import TRIPLES_SCHEMA

    rng = np.random.default_rng(7)
    n = 2_000
    big = np.int64(2**62 + 99)
    subj = rng.integers(1, 400, n).astype(np.int64)
    subj[: n // 4] = big  # count n/4 ≫ total//P → genuinely hot
    rows = pa.table(
        {
            "subj": pa.array(subj, pa.int64()),
            "pred": pa.array(np.full(n, 7, np.int64)),  # hot AND mapped
            "obj": pa.array(rng.integers(1, 400, n).astype(np.int64), pa.int64()),
            "sign": pa.array([True] * n, pa.bool_()),
            "graph": pa.array(np.zeros(n, np.int64)),  # hot, NOT mapped
            "rule_idx": pa.nulls(n, pa.int32()),
            "round": pa.array([0] * n, pa.int32()),
            "substitution": pa.nulls(n, pa.large_list(pa.int64())),
            "content_sha256": pa.nulls(n, pa.string()),
        },
        schema=TRIPLES_SCHEMA,
    )
    mapping = pd.DataFrame(
        {"node": np.array([7, 13, int(big)], dtype=np.int64),
         "canon": np.array([5, 11, 1], dtype=np.int64)}
    )
    tds = rd.from_arrow(rows).materialize()
    mds = rd.from_arrow(
        pa.table({"node": pa.array(mapping["node"], pa.int64()),
                  "canon": pa.array(mapping["canon"], pa.int64())})
    )
    cols = ["subj", "pred", "obj", "sign", "graph"]
    via_bcast = (
        remap_triples(tds, mapping, flag_col="__chg").to_pandas()
        .sort_values(cols).reset_index(drop=True)
    )
    via_join = (
        remap_triples_joined(tds, mds, flag_col="__chg", hot_min=0)
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        via_join[cols + ["__chg"]], via_bcast[cols + ["__chg"]]
    )
    assert set(via_join["pred"]) == {5}  # planted hot pred remapped everywhere
    assert set(via_join["graph"]) == {0}  # hot unmapped constant untouched
    # full-range id exact through the INLINE path: remapped on every
    # planted row, never surviving unmapped
    assert int(big) not in set(via_join["subj"])
    assert (via_join["subj"] == 1).sum() >= n // 4


def test_compose_mappings_ds_matches_driver(ray_session):
    """Distributed mapping composition (total ∘ new as Datasets) must equal
    the driver compose_mappings on the same inputs."""
    from raydf.canonicalize import compose_mappings_ds
    from raydf.pipeline import compose_mappings

    rng = np.random.default_rng(11)
    total = pd.DataFrame(
        {"node": np.arange(100, 140, dtype=np.int64),
         "canon": rng.integers(0, 50, 40).astype(np.int64)}
    )
    # new remaps some of total's canons and introduces fresh nodes,
    # including one already present in total (must NOT be re-added)
    new = pd.DataFrame(
        {"node": np.array([3, 7, 120, 500, 501], dtype=np.int64),
         "canon": np.array([1, 1, 9, 2, 2], dtype=np.int64)}
    )
    want = (
        compose_mappings(total, new)
        .sort_values(["node"]).reset_index(drop=True)
    )
    got = (
        compose_mappings_ds(
            rd.from_arrow(pa.table({"node": pa.array(total["node"], pa.int64()),
                                    "canon": pa.array(total["canon"], pa.int64())})),
            rd.from_arrow(pa.table({"node": pa.array(new["node"], pa.int64()),
                                    "canon": pa.array(new["canon"], pa.int64())})),
        )
        .to_pandas().astype(np.int64)
        .sort_values(["node"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype(np.int64))
