"""PageRank tests: exact-integer iterations vs an in-test replica, and
broadcast-path ≡ partitioned-path equivalence."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydf.graph import pagerank


def edge_table(src, dst):
    return pa.table(
        {"src": pa.array(np.asarray(src, np.int64), pa.int64()),
         "dst": pa.array(np.asarray(dst, np.int64), pa.int64())}
    )


def replica(src, dst, iters, scale=10**12):
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    r0 = scale // n
    base = (15 * r0) // 100
    deg = np.zeros(n, np.int64)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    np.add.at(deg, si, 1)
    ranks = np.full(n, r0, np.int64)
    for _ in range(iters):
        contrib = np.zeros(n, np.int64)
        np.add.at(contrib, di, ranks[si] // deg[si])
        ranks = base + (85 * contrib) // 100
    return dict(zip(nodes.tolist(), ranks.tolist()))


@pytest.fixture(scope="module")
def random_graph():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, size=400).astype(np.int64)
    dst = rng.integers(0, 60, size=400).astype(np.int64)
    e = np.unique(np.stack([src, dst], axis=1), axis=0)
    e = e[e[:, 0] != e[:, 1]]  # drop self-loops for a cleaner fixture
    return e[:, 0], e[:, 1]


def _run(src, dst, **kw):
    out = pagerank(rd.from_arrow(edge_table(src, dst)).repartition(4),
                   iters=3, **kw).to_pandas()
    return dict(zip(out["node"].tolist(), out["rank_e12"].tolist()))


def test_pagerank_broadcast_matches_replica(random_graph):
    src, dst = random_graph
    assert _run(src, dst) == replica(src, dst, 3)


def test_pagerank_partitioned_path_equivalent(random_graph):
    src, dst = random_graph
    exp = replica(src, dst, 3)
    got = _run(src, dst, broadcast_nodes=0, num_partitions=4)
    assert got == exp


def test_pagerank_sink_and_source_nodes():
    # 0→1→2, 2 is a pure sink (dangling: leaks mass), 0 a pure source
    # (holds the teleport base); node 3 isolated via self-edge 3→3
    src = [0, 1, 3]
    dst = [1, 2, 3]
    exp = replica(np.array(src, np.int64), np.array(dst, np.int64), 3)
    got = _run(src, dst)
    assert got == exp
    base = (15 * (10**12 // 4)) // 100
    assert got[0] == base  # no in-edges: teleport base only
    assert got[2] > got[0]  # sink accumulates upstream mass


def comp_replica(src, dst):
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {n: i for i, n in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(idx[a]), find(idx[b])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {int(n): int(nodes[find(idx[n])]) for n in nodes}


def test_connected_components_matches_union_find(random_graph):
    from raydf.graph import connected_components

    src, dst = random_graph
    out = connected_components(
        rd.from_arrow(edge_table(src, dst)).repartition(4)
    ).to_pandas()
    got = dict(zip(out["node"].tolist(), out["component"].tolist()))
    assert got == comp_replica(src, dst)


def test_connected_components_distributed_path(random_graph, monkeypatch):
    import raydf.canonicalize as cz
    from raydf.graph import connected_components

    monkeypatch.setattr(cz, "DRIVER_PAIR_LIMIT", 0)

    def boom(*a, **k):  # the mapping must NEVER land on the driver here
        raise AssertionError("driver union-find called on the distributed branch")

    monkeypatch.setattr(cz, "canonical_mapping_driver", boom)
    src, dst = random_graph
    out = connected_components(
        rd.from_arrow(edge_table(src, dst)).repartition(4)
    ).to_pandas()
    got = dict(zip(out["node"].tolist(), out["component"].tolist()))
    assert got == comp_replica(src, dst)
