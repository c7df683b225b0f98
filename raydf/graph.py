"""Distributed PageRank over an edge Dataset — the graph-centrality stage
a data pipeline runs for source/domain weighting, seed selection, or
link-graph quality scoring.

The reference engine has no graph analytics (it is an RDF deduction
library; its closest shape is the semi-naive fixpoint this repo already
implements for rules) — this extends the relational/LLM operator family
on the same substrate (SURVEY.md §2.7 O41 note).

Determinism contract (what makes an ITERATIVE float algorithm
oracle-checkable): all arithmetic is nonnegative int64 —

* initial rank = ``scale // N`` (floor; scale = 10¹² micro-units of
  total rank mass),
* per-edge contribution = ``rank // outdeg``,
* update = ``(15·(scale//N)) // 100 + (85·Σ contrib) // 100``
  (damping 0.85 as integer ratios).

Nonnegative ``//`` is floor on both numpy int64 and DuckDB, so every
iteration is bit-reproducible and the whole run unrolls into SQL CTEs.
Dangling nodes simply leak their mass (consistent on both sides);
no-in-edge nodes hold the teleport base.

Two execution paths, picked by the EXACT node count (known after the
node-set distinct — the same metadata-bounded broadcast-vs-shuffle choice
as the match cascade, raydf/match.py):

* ``N ≤ broadcast_nodes`` (default 2M, the canonicalize driver-side
  envelope): the rank and outdeg vectors live in one ``ray.put`` object;
  each iteration is ONE streaming pass over the edges — ``map_batches``
  attaches rank/outdeg by ``np.searchsorted`` and collapses to per-batch
  partial (dst, Σ) rows, the driver sums the node-sized partials and
  rebuilds the vector. Zero shuffles per iteration; the edge set is
  never re-keyed. This is the kmeans/IVF partial–final pattern.
* ``N > broadcast_nodes``: fully partitioned — ranks attach to edges by
  ``src`` via one union+groupby exchange
  (:func:`raydf.joins.partitioned_lookup_join`, chained-join-safe),
  contributions collapse per ``dst`` in a hash-partition map, new ranks
  = nodes LEFT-lookup contributions. Each stage materializes: an A/B at
  sf0.001 measured the 3-exchange chain at 29.5 s in one job vs 17 s
  stagewise (Ray 2.49 chains All-to-All operators poorly — same family
  as the chained-native-join caveat in raydf/joins.py).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from raydf import joins

SCALE = 10**12
BROADCAST_NODES = int(os.environ.get("RAYDF_PAGERANK_BROADCAST_NODES", 2_000_000))


def _node_union(edges, num_partitions: int | None = None):
    def srcs(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"]})

    def dsts(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"]})

    u = edges.map_batches(srcs, batch_format="pyarrow").union(
        edges.map_batches(dsts, batch_format="pyarrow")
    )
    # CPU-scaled default (not a fixed small count): the node-set distinct
    # sees 2× the edge rows, which is the big input on huge graphs
    P = num_partitions if num_partitions is not None else joins.default_partitions()
    return joins.distinct(u, ["node"], num_partitions=P)


def pagerank(edges, *, iters: int = 3, scale: int = SCALE,
             num_partitions: int | None = None,
             broadcast_nodes: int | None = None):
    """Integer PageRank. ``edges``: Dataset with int64 ``src``/``dst``
    columns, already distinct per directed edge. Returns a Dataset of
    ``(node, rank_e12)`` over every node that appears in any edge;
    ``rank_e12`` is rank mass in ``scale`` micro-units."""
    limit = BROADCAST_NODES if broadcast_nodes is None else broadcast_nodes
    # the edge set is consumed once per iteration plus deg/node passes —
    # materialize it or every pass re-executes the caller's (possibly
    # multi-exchange) edge-build pipeline. A/B at sf0.1 trade graph:
    # lazy edges 32.2 s end-to-end vs materialized 10.9 s
    edges = edges.materialize()
    nodes = _node_union(edges, num_partitions).materialize()
    n_nodes = nodes.count()
    assert n_nodes > 0, "pagerank over an empty edge set"
    r0 = scale // n_nodes
    base = (15 * r0) // 100
    if n_nodes <= limit:
        return _pagerank_broadcast(edges, nodes, n_nodes, r0, base, iters)
    return _pagerank_partitioned(
        edges, nodes, r0, base, iters, num_partitions=num_partitions
    )


# ------------------------------------------------- broadcast (small nodes)


def _pagerank_broadcast(edges, nodes, n_nodes: int, r0: int, base: int,
                        iters: int):
    """Rank/outdeg vectors broadcast once per iteration; one streaming
    pass over edges per iteration with per-batch partial dst-sums. The
    driver reduce streams the partials batch-by-batch into the node
    vector (O(N + one batch) memory); on very DENSE graphs (many edge
    blocks each touching most nodes) the reduce is still O(blocks × N)
    driver TIME per iteration — lower ``broadcast_nodes`` to route such
    graphs to the partitioned path."""
    node_ids = np.sort(
        nodes.to_pandas()["node"].to_numpy(np.int64)
    )  # node-sized driver vector — guarded by the broadcast_nodes bound

    def _accumulate(partials_ds, vec: np.ndarray, val_col: str) -> None:
        # stream the per-block partials into the node vector one batch at
        # a time — each block can emit up to N rows, so a to_pandas()
        # collect would be O(blocks × N) driver memory on dense graphs;
        # this keeps it O(N + one batch)
        for b in partials_ds.iter_batches(batch_format="pyarrow"):
            idx = np.searchsorted(node_ids, b["node"].to_numpy(zero_copy_only=False))
            np.add.at(vec, idx, b[val_col].to_numpy(zero_copy_only=False))

    # outdeg: per-batch src value_counts partials → streamed driver sum
    def deg_partials(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()),
             "n": pa.array(c.astype(np.int64), pa.int64())}
        )

    outdeg = np.zeros(n_nodes, np.int64)
    _accumulate(edges.map_batches(deg_partials, batch_format="pyarrow"),
                outdeg, "n")

    ranks = np.full(n_nodes, r0, np.int64)
    ids_ref = ray.put(node_ids)
    deg_ref = ray.put(outdeg)
    for _ in range(iters):
        rank_ref = ray.put(ranks)

        def contrib_partials(t: pa.Table) -> pa.Table:
            ids = ray.get(ids_ref)
            deg = ray.get(deg_ref)
            rk = ray.get(rank_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(ids, src)
            c = rk[si] // deg[si]  # outdeg ≥ 1: src has this edge
            g = pd.Series(c).groupby(dst, sort=False).sum()
            return pa.table(
                {"node": pa.array(g.index.to_numpy(np.int64), pa.int64()),
                 "c": pa.array(g.to_numpy(np.int64), pa.int64())}
            )

        contrib = np.zeros(n_nodes, np.int64)
        _accumulate(edges.map_batches(contrib_partials, batch_format="pyarrow"),
                    contrib, "c")
        ranks = base + (85 * contrib) // 100

    return rd.from_arrow(
        pa.table(
            {"node": pa.array(node_ids, pa.int64()),
             "rank_e12": pa.array(ranks, pa.int64())}
        )
    )


# --------------------------------------------------- connected components


def connected_components(edges, *, num_partitions: int | None = None):
    """Undirected connected components over an edge Dataset
    (``src``/``dst`` int64): Dataset of ``(node, component)`` for every
    node that appears in any edge, with ``component`` = the minimum node
    id of the component (the same deterministic representative as the Eq
    canonicalization this reuses).

    Two finalize paths, gated on the EXACT edge-pair count (the same
    DRIVER_PAIR_LIMIT gate as minhash_dedup's finalize, dedup.py):

    * pairs ≤ ``canonicalize.DRIVER_PAIR_LIMIT``: numpy min-label/
      pointer-jumping on the driver; the mapping holds only MERGED nodes
      (≪ edges) and broadcasts via one ``ray.put``.
    * pairs above it: the mapping STAYS a Dataset
      (:func:`canonical_mapping_distributed_ds`) and attaches to the node
      set via a partitioned left-lookup join — on a huge graph where most
      nodes sit in non-trivial components the mapping is ≈ node-sized, so
      a driver frame + broadcast would OOM the driver (VERDICT r03 #2 /
      ADVICE r03). Nothing node- or edge-sized ever lands on the driver."""
    import pyarrow.compute as _pc

    from raydf import canonicalize
    from raydf.joins import partitioned_lookup_join

    edges = edges.materialize()  # consumed by both the mapping and the node fill
    pairs = edges.map_batches(
        lambda t: pa.table({"a": t["src"], "b": t["dst"]}),
        batch_format="pyarrow",
    ).materialize()
    nodes = _node_union(edges, num_partitions)
    if pairs.count() > canonicalize.DRIVER_PAIR_LIMIT:
        mapping_ds = canonicalize.canonical_mapping_distributed_ds(pairs)
        withc = partitioned_lookup_join(
            nodes, "node", mapping_ds, "node", "canon", "component",
            how="left", num_partitions=num_partitions,
        )

        def fill(t: pa.Table) -> pa.Table:
            # unmapped nodes are their own representative (singletons and
            # component minima never appear in the mapping)
            return pa.table(
                {
                    "node": t["node"],
                    "component": _pc.coalesce(
                        t["component"].cast(pa.int64()), t["node"]
                    ),
                }
            )

        return withc.map_batches(fill, batch_format="pyarrow")

    mapping = canonicalize.canonical_mapping_driver(pairs.to_pandas())
    mp_ref = ray.put(
        (np.sort(np.empty(0, np.int64)), np.empty(0, np.int64))
        if len(mapping) == 0
        else _sorted_map(mapping)
    )

    def attach(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(mp_ref)
        n = t["node"].to_numpy(zero_copy_only=False)
        comp = n.copy()
        if len(keys):
            i = np.searchsorted(keys, n)
            i = np.clip(i, 0, len(keys) - 1)
            hit = keys[i] == n
            comp[hit] = vals[i[hit]]
        return pa.table(
            {"node": pa.array(n, pa.int64()),
             "component": pa.array(comp, pa.int64())}
        )

    return nodes.map_batches(attach, batch_format="pyarrow")


def _sorted_map(mapping: pd.DataFrame):
    node = mapping["node"].to_numpy(np.int64)
    canon = mapping["canon"].to_numpy(np.int64)
    order = np.argsort(node, kind="stable")
    return node[order], canon[order]


# ----------------------------------------------- partitioned (huge nodes)


def _pagerank_partitioned(edges, nodes, r0: int, base: int, iters: int, *,
                          num_partitions: int | None):
    def degs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", sort=False).size()
        return pd.DataFrame(
            {"src": g.index.to_numpy(np.int64), "outdeg": g.to_numpy(np.int64)}
        )

    deg = joins.partitioned_group_map(
        edges, ["src"], degs, num_partitions=num_partitions
    )
    ewd = joins.partitioned_lookup_join(
        edges, "src", deg, "src", "outdeg", "outdeg",
        num_partitions=num_partitions,
    ).materialize()  # static across iterations

    def init_rank(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank_e12", pa.array(np.full(len(t), r0, np.int64), pa.int64())
        )

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    def contribs(df: pd.DataFrame) -> pd.DataFrame:
        c = df["rank_e12"].to_numpy(np.int64) // df["outdeg"].to_numpy(np.int64)
        g = pd.Series(c).groupby(df["dst"].to_numpy(np.int64), sort=False).sum()
        return pd.DataFrame(
            {"node": g.index.to_numpy(np.int64), "c": g.to_numpy(np.int64)}
        )

    for _ in range(iters):
        # stagewise materialize: chained All-to-All operators in one job
        # measured ~2× slower than running each exchange as its own job
        er = joins.partitioned_lookup_join(
            ewd, "src", ranks, "node", "rank_e12", "rank_e12",
            num_partitions=num_partitions,
        ).materialize()
        contrib = joins.partitioned_group_map(
            er, ["dst"], contribs, num_partitions=num_partitions
        ).materialize()
        withc = joins.partitioned_lookup_join(
            nodes, "node", contrib, "node", "c", "c",
            how="left", num_partitions=num_partitions,
        )

        def update(t: pa.Table) -> pa.Table:
            c = pc.fill_null(t["c"], 0).to_numpy(zero_copy_only=False)
            r = base + (85 * c.astype(np.int64)) // 100
            return pa.table(
                {"node": t["node"], "rank_e12": pa.array(r, pa.int64())}
            )

        ranks = withc.map_batches(update, batch_format="pyarrow").materialize()

    return ranks
