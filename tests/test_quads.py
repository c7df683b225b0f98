"""Named-graph (quad) semantics — ports the reference's QuadStatement /
Statement::with_graph behavior (/root/reference/src/statement.rs:23-29,
117-127): facts carry an optional named graph; the same triple in two
graphs is two distinct facts; patterns may be unconstrained (match any
graph), constrained to one graph, or bind the graph to a variable."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raydf import rules as R
from raydf.deduce import FixpointEngine
from raydf.fixtures import triples_from_terms
from raydf.schema import GRAPH_DEFAULT


def _iri(s):
    return R.iri(f"https://example.org/{s}")


C = _iri("contains")
G1 = _iri("graphs/one")
G2 = _iri("graphs/two")


@pytest.fixture()
def quad_store(tmp_path):
    """a-C->b in g1;  b-C->c in g2;  a-C->d in the default graph."""
    rows = [
        (_iri("a"), C, _iri("b")),
        (_iri("b"), C, _iri("c")),
        (_iri("a"), C, _iri("d")),
    ]
    triples, _terms = triples_from_terms(rows, graphs=[G1, G2, None])
    return triples


def _run(system, triples, tmp_path, rounds=4):
    eng = FixpointEngine(system, str(tmp_path / "ckpt"), buckets=4, num_partitions=4)
    eng.load_initial(rd.from_arrow(triples))
    eng.run(max_rounds=rounds)
    return eng


def test_pattern_unconstrained_matches_all_graphs(quad_store, tmp_path, ray_session):
    """A triple pattern (g=None) is the triple view over the quad store:
    it matches facts in every graph, like the reference's triple-pattern
    dataset traits over quads."""
    sys_ = R.System()
    sys_.insert(
        R.rule(
            2,
            [R.pat(R.v(0), C, R.v(1))],
            [R.triple_st(R.v(0), _iri("touched"), R.v(1))],
            name="touch_all",
        )
    )
    eng = _run(sys_, quad_store, tmp_path)
    df = eng.dataset().to_pandas()
    touched = df[df["pred"] == _iri("touched").id]
    assert len(touched) == 3  # all graphs matched
    # conclusions without with_graph land in the default graph
    assert (touched["graph"] == GRAPH_DEFAULT).all()


def test_pattern_graph_constant_restricts(quad_store, tmp_path, ray_session):
    sys_ = R.System()
    sys_.insert(
        R.rule(
            2,
            [R.pat(R.v(0), C, R.v(1), g=G1)],
            [R.triple_st(R.v(0), _iri("inG1"), R.v(1))],
            name="only_g1",
        )
    )
    eng = _run(sys_, quad_store, tmp_path)
    df = eng.dataset().to_pandas()
    got = df[df["pred"] == _iri("inG1").id]
    assert len(got) == 1
    assert got["subj"].iloc[0] == _iri("a").id and got["obj"].iloc[0] == _iri("b").id


def test_default_graph_constant(quad_store, tmp_path, ray_session):
    sys_ = R.System()
    sys_.insert(
        R.rule(
            2,
            [R.pat(R.v(0), C, R.v(1), g=R.default_graph())],
            [R.triple_st(R.v(0), _iri("inDefault"), R.v(1))],
            name="only_default",
        )
    )
    eng = _run(sys_, quad_store, tmp_path)
    df = eng.dataset().to_pandas()
    got = df[df["pred"] == _iri("inDefault").id]
    assert len(got) == 1
    assert got["obj"].iloc[0] == _iri("d").id


def test_conclusion_with_graph_and_graph_var(quad_store, tmp_path, ray_session):
    """Graph variable binds the source graph; with_graph re-emits the
    conclusion into that same graph (quad conclusion). The same derived
    triple in two graphs must be stored as TWO facts (dedup key includes
    graph)."""
    sys_ = R.System()
    sys_.insert(
        R.rule(
            3,
            [R.pat(R.v(0), C, R.v(1), g=R.v(2))],
            [R.triple_st(R.v(0), _iri("copied"), R.v(1), graph=R.v(2))],
            name="copy_into_graph",
        )
    )
    eng = _run(sys_, quad_store, tmp_path)
    df = eng.dataset().to_pandas()
    got = df[df["pred"] == _iri("copied").id]
    # one copy per source quad, each in its source graph
    assert len(got) == 3
    assert set(got["graph"]) == {G1.id, G2.id, GRAPH_DEFAULT}


def test_same_triple_two_graphs_not_deduped(tmp_path, ray_session):
    rows = [(_iri("x"), C, _iri("y")), (_iri("x"), C, _iri("y"))]
    triples, _ = triples_from_terms(rows, graphs=[G1, G2])
    eng = FixpointEngine(R.System(), str(tmp_path / "ckpt2"), buckets=4)
    n = eng.load_initial(rd.from_arrow(triples))
    assert n == 2  # distinct facts: the dedup hash includes the graph


def test_cross_graph_join(tmp_path, ray_session):
    """Patterns constrained to different graphs join on their shared var —
    the quad analog of the hypothesis join."""
    rows = [(_iri("a"), C, _iri("b")), (_iri("b"), C, _iri("c"))]
    triples, _ = triples_from_terms(rows, graphs=[G1, G2])
    sys_ = R.System()
    sys_.insert(
        R.rule(
            3,
            [R.pat(R.v(0), C, R.v(1), g=G1), R.pat(R.v(1), C, R.v(2), g=G2)],
            [R.triple_st(R.v(0), _iri("reaches"), R.v(2))],
            name="bridge",
        )
    )
    eng = _run(sys_, triples, tmp_path)
    df = eng.dataset().to_pandas()
    got = df[df["pred"] == _iri("reaches").id]
    assert len(got) == 1
    assert got["subj"].iloc[0] == _iri("a").id and got["obj"].iloc[0] == _iri("c").id
