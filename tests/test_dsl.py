"""Textual rule DSL (reference ``rule!`` macro grammar, src/macros.rs) —
parsed rules must be STRUCTURALLY equal to the builder-constructed rules
used in tools/pr_check.py, and reproduce the same deduction/validation
results."""

import pyarrow as pa
import pytest
import ray.data as rd

from raydf import rules as R
from raydf.deduce import FixpointEngine
from raydf.dsl import DslError, parse_rule_text, parse_system_text
from raydf.fixtures import triples_from_terms
from raydf.schema import RDF_TYPE, XSD
from raydf.validate import validate_system

NS = "https://example.org/#"
XSD_INT = XSD + "int"


def test_citizenship_rule_text_equals_builder():
    text = """
      // Citizenship implies humanship (reference src/lib.rs:18-27).
      for ?person, ?country {
        ?person <"https://example.org/#citizenOf"> ?country .
      } => {
        ?person <"http://www.w3.org/1999/02/22-rdf-syntax-ns#type"> <"https://example.org/#Human"> .
      }
    """
    parsed = parse_rule_text(text, name="citizenship")
    cz, ty, hu = R.iri(NS + "citizenOf"), R.iri(RDF_TYPE), R.iri(NS + "Human")
    built = R.rule(
        2, [R.pat(R.v(0), cz, R.v(1))], [R.triple_st(R.v(0), ty, hu)],
        name="citizenship",
    )
    assert parsed == built


def test_comparison_rule_text_equals_builder():
    text = """
      for ?x, ?age {
        ?x <"https://example.org/#age"> ?age .
      } => {
        (>= ?age 18) .
      }
    """
    parsed = parse_rule_text(text, name="age")
    AGE = R.iri(NS + "age")
    built = R.rule(
        2, [R.pat(R.v(0), AGE, R.v(1))],
        [R.true_st(R.Call("geq", (R.v(1), R.dec(18))))], name="age",
    )
    assert parsed == built


def test_regex_rule_text_equals_builder():
    rx = r"^[\w\-\.]+@([\w-]+\.)+[\w-]{2,}$"
    text = f"""
      for ?x, ?email {{
        ?x <"https://example.org/#email"> ?email .
      }} => {{
        (matches /{rx}/ ?email) .
      }}
    """
    parsed = parse_rule_text(text, name="email")
    EMAIL = R.iri(NS + "email")
    built = R.rule(
        2, [R.pat(R.v(0), EMAIL, R.v(1))],
        [R.true_st(R.Call("matches", (R.regex(rx), R.v(1))))], name="email",
    )
    assert parsed == built


def test_existential_negative_and_eq_forms():
    text = """
      for ?a, ?b {
        ! ?a <"https://example.org/#p"> ?b .
      } => for ?fresh {
        ?a <"https://example.org/#q"> ?fresh .
        ?a = ?b .
        ! ?a = ?b .
      }
    """
    r = parse_rule_text(text)
    assert r.variables == 2 and r.conclusion.variables == 1
    assert r.hypothesis[0].sign is False
    st = r.conclusion.statements
    assert st[0].kind == "triple" and st[0].triple[2] == R.v(2)  # fresh var idx 2
    assert st[1].kind == "eq" and st[1].sign is True
    assert st[2].kind == "eq" and st[2].sign is False


def test_quad_graph_extension():
    r = parse_rule_text("""
      for ?s, ?o, ?g {
        ?s <"https://example.org/#p"> ?o @ ?g .
      } => {
        ?s <"https://example.org/#q"> ?o @ <"https://example.org/#g2"> .
      }
    """)
    assert r.hypothesis[0].pattern.g == R.v(2)
    assert r.conclusion.statements[0].graph == R.iri(NS + "g2")


def test_undeclared_variable_rejected():
    with pytest.raises(DslError):
        parse_rule_text("""
          for ?a { ?a <"https://example.org/#p"> ?b . } => { ?a <"https://example.org/#q"> ?a . }
        """)


def test_dsl_rules_reproduce_pr_check_results(tmp_path):
    """End-to-end: text-parsed rules give the same deduction and
    validation outcomes as pr_check's builder rules."""
    # citizenship deduction (reference lib.rs doc-test)
    fd, fr = R.blank("FrancoisDupont"), R.blank("France")
    cz, ty, hu = R.iri(NS + "citizenOf"), R.iri(RDF_TYPE), R.iri(NS + "Human")
    triples, _ = triples_from_terms([(fd, cz, fr)])
    sys_ = parse_system_text("""
      rule citizenship:
      for ?person, ?country {
        ?person <"https://example.org/#citizenOf"> ?country .
      } => {
        ?person <"http://www.w3.org/1999/02/22-rdf-syntax-ns#type"> <"https://example.org/#Human"> .
      }
    """)
    eng = FixpointEngine(sys_, str(tmp_path / "cit"), buckets=4)
    eng.load_initial(rd.from_arrow(triples))
    eng.run(max_rounds=4)
    df = eng.dataset().to_pandas()
    got = set(zip(df["subj"], df["pred"], df["obj"]))
    assert (fd.id, ty.id, hu.id) in got and (fd.id, cz.id, fr.id) in got
    assert len(got) == 2

    # validation trio (reference tests/validation.rs)
    age_sys = parse_system_text("""
      rule age: for ?x, ?age {
        ?x <"https://example.org/#age"> ?age .
      } => { (>= ?age 18) . }
    """)
    t, terms = triples_from_terms([(R.blank("0"), R.iri(NS + "age"), R.lit("21", XSD_INT))])
    res = validate_system(age_sys, rd.from_arrow(t), terms_df=terms.to_pandas())
    assert res["ok"]

    t, terms = triples_from_terms([(R.blank("0"), R.iri(NS + "age"), R.lit("12", XSD_INT))])
    res = validate_system(age_sys, rd.from_arrow(t), terms_df=terms.to_pandas())
    assert not res["ok"]
    assert "NotTrue" in res["violations"]["reason"].to_pylist()

    email_sys = parse_system_text(r"""
      rule email: for ?x, ?email {
        ?x <"https://example.org/#email"> ?email .
      } => { (matches /^[\w\-\.]+@([\w-]+\.)+[\w-]{2,}$/ ?email) . }
    """)
    t, terms = triples_from_terms(
        [(R.blank("0"), R.iri(NS + "email"), R.lit("user@domain.com"))]
    )
    res = validate_system(email_sys, rd.from_arrow(t), terms_df=terms.to_pandas())
    assert res["ok"]
