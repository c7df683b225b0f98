#!/usr/bin/env python
"""Precision/Recall of the engine's deduced triple sets against the
reference's own test fixtures (BASELINE.json: "triple P/R >= 0.95 vs
inferdf-rs reference").

Each scenario encodes one reference fixture — input graph, rule system, and
the exact triple set the reference's semantics entail — and runs it through
the distributed FixpointEngine. P/R is computed on decoded
``(s, p, o, sign)`` lexical tuples so the comparison is independent of our
int64 interning. Validation fixtures are scored as outcome matches
(Ok / Invalid+reason), mirroring the reference's Validation<T> results.

Scenarios (citations into /root/reference):
  citizenship        src/lib.rs:40-77 doc-test (deduce → insert → fixpoint)
  transitive_chain   semi-naive closure (the north_star "transitive contains"
                     shape) — expected set computable in closed form
  negative_sign      src/dataset.rs:46-60 (negative patterns match explicit
                     negative facts only)
  existential        src/system/deduction.rs:224-229 (fresh blank per firing)
  eq_merge           src/statement.rs:15-16 Eq + ReplaceId canonicalization
  validate_comparison  tests/validation.rs:5-21  → Ok
  validate_regex       tests/validation.rs:24-40 → Ok
  validation_failure   tests/validation.rs:43-59 → Invalid(NotTrue)

Prints one JSON line with per-scenario and micro-averaged P/R; exits
non-zero if overall P or R < 0.95.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import pandas as pd
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raydf import rules as R  # noqa: E402
from raydf.canonicalize import canonical_mapping, remap_triples  # noqa: E402
from raydf.deduce import FixpointEngine  # noqa: E402
from raydf.fixtures import triples_from_terms  # noqa: E402
from raydf.schema import RDF_TYPE, XSD  # noqa: E402
from raydf.validate import validate_system  # noqa: E402

XSD_INT = XSD + "int"
NS = "https://example.org/#"
WORK = "/tmp/raydf_prcheck"


def _decode_set(eng: FixpointEngine, lex: dict[int, str]) -> set:
    df = eng.dataset().to_pandas()
    return {
        (lex.get(s, s), lex.get(p, p), lex.get(o, o), bool(g))
        for s, p, o, g in zip(df["subj"], df["pred"], df["obj"], df["sign"])
    }


def _lex_map(terms: list[R.ConstTerm]) -> dict[int, str]:
    return {t.id: t.lexical for t in terms}


def _run(system: R.System, triples_tbl, tag: str) -> FixpointEngine:
    wd = os.path.join(WORK, tag)
    if os.path.exists(wd):
        shutil.rmtree(wd)
    eng = FixpointEngine(system, wd, buckets=4, num_partitions=4)
    eng.load_initial(rd.from_arrow(triples_tbl))
    eng.run(max_rounds=10)
    return eng


def scenario_citizenship():
    fd, fr = R.blank("FrancoisDupont"), R.blank("France")
    cz, ty, hu = R.iri(NS + "citizenOf"), R.iri(RDF_TYPE), R.iri(NS + "Human")
    triples, _ = triples_from_terms([(fd, cz, fr)])
    system = R.System()
    system.insert(
        R.rule(2, [R.pat(R.v(0), cz, R.v(1))],
               [R.triple_st(R.v(0), ty, hu)], name="citizenship")
    )
    eng = _run(system, triples, "citizenship")
    lex = _lex_map([fd, fr, cz, ty, hu])
    got = _decode_set(eng, lex)
    expected = {
        (fd.lexical, cz.lexical, fr.lexical, True),
        (fd.lexical, ty.lexical, hu.lexical, True),
    }
    return got, expected


def scenario_transitive_chain(n=8):
    E = R.iri(NS + "edge")
    nodes = [R.iri(NS + f"n{i}") for i in range(n)]
    triples, _ = triples_from_terms([(nodes[i], E, nodes[i + 1]) for i in range(n - 1)])
    system = R.System()
    system.insert(
        R.rule(3, [R.pat(R.v(0), E, R.v(1)), R.pat(R.v(1), E, R.v(2))],
               [R.triple_st(R.v(0), E, R.v(2))], name="trans")
    )
    eng = _run(system, triples, "transitive")
    lex = _lex_map(nodes + [E])
    got = _decode_set(eng, lex)
    expected = {
        (nodes[i].lexical, E.lexical, nodes[j].lexical, True)
        for i in range(n) for j in range(i + 1, n)
    }
    return got, expected


def scenario_negative_sign():
    P, Q = R.iri(NS + "p"), R.iri(NS + "q")
    a, b, c = R.iri(NS + "a"), R.iri(NS + "b"), R.iri(NS + "c")
    triples, _ = triples_from_terms([(a, P, b), (b, P, c)], sign=[True, False])
    system = R.System()
    system.insert(
        R.rule(2, [R.pat(R.v(0), P, R.v(1), sign=False)],
               [R.triple_st(R.v(0), Q, R.v(1))], name="neg")
    )
    eng = _run(system, triples, "negative")
    lex = _lex_map([P, Q, a, b, c])
    got = _decode_set(eng, lex)
    expected = {
        (a.lexical, P.lexical, b.lexical, True),
        (b.lexical, P.lexical, c.lexical, False),
        (b.lexical, Q.lexical, c.lexical, True),  # only the explicit negative fires
    }
    return got, expected


def scenario_existential():
    P, K = R.iri(NS + "p"), R.iri(NS + "knowsSomeone")
    a, b = R.iri(NS + "a"), R.iri(NS + "b")
    triples, _ = triples_from_terms([(a, P, b)])
    system = R.System()
    system.insert(
        R.rule(2, [R.pat(R.v(0), P, R.v(1))],
               [R.triple_st(R.v(0), K, R.v(2))], fresh=1, name="exist")
    )
    eng = _run(system, triples, "existential")
    lex = _lex_map([P, K, a, b])
    got = {
        # skolem ids are engine-internal: compare shape with a wildcard object
        (s, p, "<fresh>" if isinstance(o, int) else o, g)
        for s, p, o, g in _decode_set(eng, lex)
    }
    expected = {
        (a.lexical, P.lexical, b.lexical, True),
        (a.lexical, K.lexical, "<fresh>", True),
    }
    return got, expected


def scenario_eq_merge():
    SAME, P = R.iri(NS + "sameAs"), R.iri(NS + "p")
    x, y, z = R.iri(NS + "x"), R.iri(NS + "y"), R.iri(NS + "z")
    triples, _ = triples_from_terms([(x, SAME, y), (y, P, z)])
    system = R.System()
    system.insert(
        R.rule(2, [R.pat(R.v(0), SAME, R.v(1))],
               [R.eq_st(R.v(0), R.v(1))], name="sameas_eq")
    )
    eng = _run(system, triples, "eqmerge")
    mapping = canonical_mapping(eng.eq_pairs())
    remapped = remap_triples(eng.dataset(), mapping).to_pandas().drop_duplicates(
        ["subj", "pred", "obj", "sign"]
    )
    lex = _lex_map([SAME, P, x, y, z])
    canon = min(x.id, y.id)  # union-find picks min term id as representative
    canon_lex = lex[canon]
    got = {
        (lex.get(s, s), lex.get(p, p), lex.get(o, o), bool(g))
        for s, p, o, g in zip(
            remapped["subj"], remapped["pred"], remapped["obj"], remapped["sign"]
        )
    }
    expected = {
        (canon_lex, SAME.lexical, canon_lex, True),
        (canon_lex, P.lexical, z.lexical, True),
    }
    return got, expected


def validation_scenarios() -> dict[str, bool]:
    AGE, EMAIL = R.iri(NS + "age"), R.iri(NS + "email")

    def age_rule():
        return R.rule(2, [R.pat(R.v(0), AGE, R.v(1))],
                      [R.true_st(R.Call("geq", (R.v(1), R.dec(18))))], name="age")

    out = {}
    t, terms = triples_from_terms([(R.blank("0"), AGE, R.lit("21", XSD_INT))])
    s = R.System(); s.insert(age_rule())
    res = validate_system(s, rd.from_arrow(t), terms_df=terms.to_pandas())
    out["validate_comparison"] = bool(res["ok"])  # expected Ok

    rx = r"^[\w\-\.]+@([\w-]+\.)+[\w-]{2,}$"
    rrule = R.rule(2, [R.pat(R.v(0), EMAIL, R.v(1))],
                   [R.true_st(R.Call("matches", (R.regex(rx), R.v(1))))], name="email")
    t, terms = triples_from_terms([(R.blank("0"), EMAIL, R.lit("user@domain.com"))])
    s = R.System(); s.insert(rrule)
    res = validate_system(s, rd.from_arrow(t), terms_df=terms.to_pandas())
    out["validate_regex"] = bool(res["ok"])  # expected Ok

    t, terms = triples_from_terms([(R.blank("0"), AGE, R.lit("12", XSD_INT))])
    s = R.System(); s.insert(age_rule())
    res = validate_system(s, rd.from_arrow(t), terms_df=terms.to_pandas())
    out["validation_failure"] = (not res["ok"]) and (
        "NotTrue" in res["violations"].to_pydict()["reason"]
    )  # expected Invalid(NotTrue)
    return out


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)

    scenarios = {
        "citizenship": scenario_citizenship,
        "transitive_chain": scenario_transitive_chain,
        "negative_sign": scenario_negative_sign,
        "existential": scenario_existential,
        "eq_merge": scenario_eq_merge,
    }
    report: dict = {"scenarios": {}}
    tp = fp = fn = 0
    for name, fn_ in scenarios.items():
        got, expected = fn_()
        s_tp = len(got & expected)
        s_fp = len(got - expected)
        s_fn = len(expected - got)
        tp, fp, fn = tp + s_tp, fp + s_fp, fn + s_fn
        report["scenarios"][name] = {
            "precision": round(s_tp / max(1, s_tp + s_fp), 4),
            "recall": round(s_tp / max(1, s_tp + s_fn), 4),
            "expected": len(expected),
            "got": len(got),
        }
    for name, ok in validation_scenarios().items():
        report["scenarios"][name] = {"outcome_matches_reference": bool(ok)}

    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    report["precision"] = round(precision, 4)
    report["recall"] = round(recall, 4)
    report["gate"] = "P/R >= 0.95 (BASELINE.json)"
    report["pass"] = bool(
        precision >= 0.95 and recall >= 0.95
        and all(
            v.get("outcome_matches_reference", True)
            for v in report["scenarios"].values()
        )
    )
    print(json.dumps(report))
    ray.shutdown()
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
