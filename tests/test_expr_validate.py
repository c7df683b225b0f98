"""Expression evaluation + validation — ports the reference test suite:
/root/reference/tests/validation.rs (comparison, regex, failure) and the
lib.rs:86-103 validation doc-test."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raydf import expr as E
from raydf import rules as R
from raydf.fixtures import triples_from_terms
from raydf.schema import RDF_TYPE, XSD, XSD_BOOLEAN
from raydf.validate import validate_system

XSD_INT = XSD + "int"
AGE = "https://example.org/#age"
EMAIL = "https://example.org/#email"
CITIZEN_OF = "https://example.org/#citizenOf"
HUMAN = "https://example.org/#Human"


def _system_one(rule):
    s = R.System()
    s.insert(rule)
    return s


def age_rule(threshold=18):
    # for ?x, ?age { ?x <#age> ?age . } => { (>= ?age 18) . }
    return R.rule(
        2,
        [R.pat(R.v(0), R.iri(AGE), R.v(1))],
        [R.true_st(R.Call("geq", (R.v(1), R.dec(threshold))))],
        name="age",
    )


def test_validate_comparison_ok(tmp_workdir):
    # reference tests/validation.rs:5-21
    triples, terms = triples_from_terms(
        [(R.blank("0"), R.iri(AGE), R.lit("21", XSD_INT))]
    )
    res = validate_system(
        _system_one(age_rule()), rd.from_arrow(triples), terms_df=terms.to_pandas()
    )
    assert res["ok"], res["violations"].to_pydict()


def test_validate_comparison_fail(tmp_workdir):
    # reference tests/validation.rs:43-59
    triples, terms = triples_from_terms(
        [(R.blank("0"), R.iri(AGE), R.lit("12", XSD_INT))]
    )
    res = validate_system(
        _system_one(age_rule()), rd.from_arrow(triples), terms_df=terms.to_pandas()
    )
    assert not res["ok"]
    reasons = res["violations"].to_pydict()["reason"]
    assert "NotTrue" in reasons


def test_validate_regex(tmp_workdir):
    # reference tests/validation.rs:24-40
    rx = r"^[\w\-\.]+@([\w-]+\.)+[\w-]{2,}$"
    rule = R.rule(
        2,
        [R.pat(R.v(0), R.iri(EMAIL), R.v(1))],
        [R.true_st(R.Call("matches", (R.regex(rx), R.v(1))))],
        name="email",
    )
    triples, terms = triples_from_terms(
        [(R.blank("0"), R.iri(EMAIL), R.lit("user@domain.com"))]
    )
    res = validate_system(
        _system_one(rule), rd.from_arrow(triples), terms_df=terms.to_pandas()
    )
    assert res["ok"], res["violations"].to_pydict()

    bad_triples, bad_terms = triples_from_terms(
        [(R.blank("0"), R.iri(EMAIL), R.lit("not an email"))]
    )
    res2 = validate_system(
        _system_one(rule), rd.from_arrow(bad_triples), terms_df=bad_terms.to_pandas()
    )
    assert not res2["ok"]


def test_validation_ok_when_conclusion_present(tmp_workdir):
    # reference src/lib.rs:86-103
    fd, fr = R.blank("FrançoisDupont"), R.blank("France")
    rule = R.rule(
        2,
        [R.pat(R.v(0), R.iri(CITIZEN_OF), R.v(1))],
        [R.triple_st(R.v(0), R.iri(RDF_TYPE), R.iri(HUMAN))],
        name="citizenship",
    )
    triples, terms = triples_from_terms(
        [
            (fd, R.iri(CITIZEN_OF), fr),
            (fd, R.iri(RDF_TYPE), R.iri(HUMAN)),
        ]
    )
    res = validate_system(
        _system_one(rule), rd.from_arrow(triples), terms_df=terms.to_pandas()
    )
    assert res["ok"]

    # without the type triple → MissingTriple
    triples2, terms2 = triples_from_terms([(fd, R.iri(CITIZEN_OF), fr)])
    res2 = validate_system(
        _system_one(rule), rd.from_arrow(triples2), terms_df=terms2.to_pandas()
    )
    assert not res2["ok"]
    assert "MissingTriple" in res2["violations"].to_pydict()["reason"]


# ------------------------------------------------ pure kernel unit tests


def _df_with_lit(idx, lex, dt):
    tid = R.lit(lex, dt).id
    return pd.DataFrame(
        {
            f"v{idx}": np.array([tid], dtype=np.int64),
            f"v{idx}_kind": [2],
            f"v{idx}_lex": [lex],
            f"v{idx}_dt": [dt],
        }
    )


def test_chained_comparison():
    # (lt 1 2 3) → true ; (lt 1 3 2) → false (chained adjacent pairs)
    e = R.Call("lt", (R.dec(1), R.dec(2), R.dec(3)))
    r = E.evaluate(e, pd.DataFrame(index=[0]))
    assert r.tag[0] == E.TAG_BOOL and r.b[0]
    e2 = R.Call("lt", (R.dec(1), R.dec(3), R.dec(2)))
    r2 = E.evaluate(e2, pd.DataFrame(index=[0]))
    assert not r2.b[0]


def test_cross_type_compare_semantics():
    # cross-type: eq → false, ne → true, ordered → false (PartialOrd None)
    s = R.lit("abc")
    d = R.dec(5)
    for op, expect in (("eq", False), ("ne", True), ("lt", False), ("geq", False)):
        r = E.evaluate(R.Call(op, (s, d)), pd.DataFrame(index=[0]))
        assert bool(r.b[0]) == expect, op


def test_regex_never_equal():
    # comparable.rs PartialEq has no Regex arm → even identical regexes ≠
    r = E.evaluate(
        R.Call("eq", (R.regex("a+"), R.regex("a+"))), pd.DataFrame(index=[0])
    )
    assert not r.b[0]
    r2 = E.evaluate(
        R.Call("ne", (R.regex("a+"), R.regex("a+"))), pd.DataFrame(index=[0])
    )
    assert r2.b[0]


def test_boolean_or_and_with_type_error():
    t = R.ConstTerm(2, "true", XSD_BOOLEAN)
    f = R.ConstTerm(2, "false", XSD_BOOLEAN)
    r = E.evaluate(R.Call("or", (t, f)), pd.DataFrame(index=[0]))
    assert r.b[0]
    r2 = E.evaluate(R.Call("and", (t, f)), pd.DataFrame(index=[0]))
    assert not r2.b[0]
    # non-boolean arg → error row (reference Error::Unexpected)
    r3 = E.evaluate(R.Call("or", (t, R.dec(5))), pd.DataFrame(index=[0]))
    assert r3.tag[0] == E.TAG_ERR


def test_decimal_hierarchy_refinement():
    # "21"^^xsd:int and "21"^^xsd:unsignedByte and "21.0"^^xsd:decimal all
    # refine to Decimal and compare equal numerically
    for dt in (XSD_INT, XSD + "unsignedByte"):
        df = _df_with_lit(0, "21", dt)
        r = E.evaluate(R.Call("geq", (R.v(0), R.dec(18))), df)
        assert r.tag[0] == E.TAG_BOOL and r.b[0]
    df = _df_with_lit(0, "21.0", XSD + "decimal")
    r = E.evaluate(R.Call("eq", (R.v(0), R.dec(21))), df)
    assert r.b[0]


def test_invalid_literal_yields_error():
    df = _df_with_lit(0, "not-a-number", XSD_INT)
    r = E.evaluate(R.Call("geq", (R.v(0), R.dec(18))), df)
    assert r.tag[0] == E.TAG_ERR


def test_user_registered_function():
    def startswith(args, n):
        out = E.EvalResult(n)
        out.tag[:] = E.TAG_BOOL
        a, b = args
        for i in range(n):
            out.b[i] = str(a.s[i]).startswith(str(b.s[i]))
        return out

    E.register_function("startswith", startswith)
    try:
        r = E.evaluate(
            R.Call("startswith", (R.lit("hello"), R.lit("he"))), pd.DataFrame(index=[0])
        )
        assert r.b[0]
    finally:
        E.FUNCTIONS.pop("startswith", None)


def test_validate_engine_bucketed_probe(tmp_path, monkeypatch):
    """Engine-scale validation: ParquetSource store + bucketed checkpoint
    probe — must find MissingTriple violations WITHOUT ever collecting the
    store's hash set to the driver (dataset_hash_set is poisoned)."""
    import ray.data as rd

    from raydf import rules as R
    from raydf import validate as V
    from raydf.deduce import FixpointEngine
    from raydf.fixtures import triples_from_terms

    def _iri(s):
        return R.iri(f"https://example.org/{s}")

    C, CH = _iri("contains"), _iri("childOf")
    rows = [(_iri("a"), C, _iri("b")), (_iri("b"), CH, _iri("a"))]
    # store 1: only the contains fact → childOf conclusion is missing
    t_bad, _ = triples_from_terms(rows[:1])
    # store 2: both facts → validates Ok
    t_ok, _ = triples_from_terms(rows)

    sys_ = R.System()
    sys_.insert(
        R.rule(
            2,
            [R.pat(R.v(0), C, R.v(1))],
            [R.triple_st(R.v(1), CH, R.v(0))],
            name="child_of",
        )
    )

    monkeypatch.setattr(
        V, "dataset_hash_set",
        lambda *_a, **_k: (_ for _ in ()).throw(
            AssertionError("driver hash collect used in engine path")
        ),
    )

    eng_bad = FixpointEngine(R.System(), str(tmp_path / "bad"), buckets=4)
    eng_bad.load_initial(rd.from_arrow(t_bad))
    res = V.validate_engine(sys_, eng_bad)
    assert not res["ok"]
    reasons = res["violations"]["reason"].to_pylist()
    assert reasons == ["MissingTriple"]

    eng_ok = FixpointEngine(R.System(), str(tmp_path / "ok"), buckets=4)
    eng_ok.load_initial(rd.from_arrow(t_ok))
    res2 = V.validate_engine(sys_, eng_ok)
    assert res2["ok"]


def test_negative_eq_recorded_and_validated(tmp_path):
    """A rule concluding !Eq (the reference's Ne, src/statement.rs:15-16):
    its firings must land in the engine's `nes` side output, and
    validation's NotNe arm must flag bindings where the two resources are
    in fact identical (src/system/deduction.rs:120-131)."""
    import ray.data as rd

    from raydf import rules as R
    from raydf import validate as V
    from raydf.deduce import FixpointEngine
    from raydf.fixtures import triples_from_terms

    def _iri(s):
        return R.iri(f"https://example.org/{s}")

    DIFF = _iri("differentAuthorThan")
    rows = [(_iri("a"), DIFF, _iri("b")), (_iri("c"), DIFF, _iri("c"))]
    triples, terms_tbl = triples_from_terms(rows)

    sys_ = R.System()
    sys_.insert(
        R.rule(
            2,
            [R.pat(R.v(0), DIFF, R.v(1))],
            [R.eq_st(R.v(0), R.v(1), sign=False)],
            name="distinct_authors",
        )
    )

    # 1. deduction records the !Eq firings in the nes side channel
    eng = FixpointEngine(sys_, str(tmp_path / "ne"), buckets=4)
    eng.load_initial(rd.from_arrow(triples))
    eng.run_round(1)
    nes = eng.ne_pairs_df()
    got = {tuple(r) for r in nes.to_numpy()}
    assert (_iri("a").id, _iri("b").id) in got
    assert (_iri("c").id, _iri("c").id) in got

    # 2. validation's NotNe arm consumes them: the reflexive (c, c) row
    # violates distinctness, the (a, b) row does not
    res = V.validate_system(sys_, rd.from_arrow(triples))
    assert not res["ok"]
    assert res["violations"]["reason"].to_pylist() == ["NotNe"]
