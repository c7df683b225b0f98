"""Pure in-process kernel tests (no Ray session): the vectorized driver
connected-components, mapping composition, and the list<->binary packers
that carry lineage through acero joins."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_canonical_mapping_driver_matches_bruteforce():
    from raydf.canonicalize import canonical_mapping_driver

    rng = np.random.RandomState(3)
    a = rng.randint(0, 200, 500).astype(np.int64)
    b = rng.randint(0, 200, 500).astype(np.int64)
    got = canonical_mapping_driver(pd.DataFrame({"a": a, "b": b}))

    # brute-force union-find ground truth
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        parent[find(int(x))] = find(int(y))
    comp: dict[int, list] = {}
    for n in set(a) | set(b):
        comp.setdefault(find(int(n)), []).append(int(n))
    want = {}
    for members in comp.values():
        canon = min(members)
        for m in members:
            if m != canon:
                want[m] = canon
    got_map = dict(zip(got["node"], got["canon"]))
    assert got_map == want


def test_canonical_mapping_driver_empty_and_chain():
    from raydf.canonicalize import canonical_mapping_driver

    empty = canonical_mapping_driver(pd.DataFrame({"a": [], "b": []}))
    assert len(empty) == 0
    # long chain exercises pointer jumping across iterations
    n = 4096
    chain = canonical_mapping_driver(
        pd.DataFrame({"a": np.arange(1, n, dtype=np.int64),
                      "b": np.arange(0, n - 1, dtype=np.int64)})
    )
    assert len(chain) == n - 1
    assert set(chain["canon"]) == {0}


def test_compose_mappings_vectorized():
    from raydf.pipeline import compose_mappings

    total = pd.DataFrame({"node": [10, 11], "canon": [5, 6]})
    new = pd.DataFrame({"node": [5, 12], "canon": [1, 7]})
    out = compose_mappings(total, new)
    m = dict(zip(out["node"], out["canon"]))
    # 10 -> 5 -> 1 re-pointed; 11 -> 6 untouched; 12 -> 7 appended
    assert m == {10: 1, 11: 6, 12: 7, 5: 1}


def test_pack_unpack_list_roundtrip():
    from raydf.canonicalize import _pack_list_i64, _unpack_list_i64

    big = 2**62 + 7
    arr = pa.array([[1, 2, 3], None, [], [big], [0]], pa.large_list(pa.int64()))
    chunked = pa.chunked_array([arr.slice(0, 2), arr.slice(2, 3)])
    packed = _pack_list_i64(chunked)
    assert packed.type == pa.large_binary()
    back = _unpack_list_i64(packed)
    assert back.to_pylist() == arr.to_pylist()
    # sliced binary input (offset != 0) must also decode
    assert _unpack_list_i64(packed.slice(2, 3)).to_pylist() == [[], [big], [0]]
    # all-null column (the common stated-triples case)
    nulls = _pack_list_i64(pa.chunked_array([pa.nulls(4, pa.large_list(pa.int64()))]))
    assert _unpack_list_i64(nulls).to_pylist() == [None] * 4
