import numpy as np

from raydf import terms
from raydf.schema import KIND_BLANK, KIND_IRI, KIND_LITERAL


def test_term_id_deterministic_and_kind_sensitive():
    a = terms.term_id(KIND_IRI, "https://example.org/#x")
    assert a == terms.term_id(KIND_IRI, "https://example.org/#x")
    assert a != terms.term_id(KIND_BLANK, "https://example.org/#x")
    assert terms.term_id(KIND_LITERAL, "1") != terms.term_id(
        KIND_LITERAL, "1", "http://www.w3.org/2001/XMLSchema#int"
    )


def test_vectorized_matches_scalar():
    lex = np.array(["a", "b", "a", "c"], dtype=object)
    ids = terms.intern_array(KIND_IRI, lex)
    assert ids[0] == ids[2] == terms.iri("a")
    assert ids[1] == terms.iri("b")

    dts = np.array([None, "dt1", None, "dt2"], dtype=object)
    ids2 = terms.intern_array(KIND_LITERAL, lex, dts)
    assert ids2[0] == terms.literal("a")
    assert ids2[1] == terms.literal("b", "dt1")


def test_skolem_deterministic_and_dict_consistent():
    sub = np.array([11, 22, 11], dtype=np.int64)
    ids = terms.skolem_ids(3, 5, sub)
    assert ids[0] == ids[2] != ids[1]
    assert (ids == terms.skolem_ids(3, 5, sub)).all()
    lex = terms.skolem_lexical(3, 5, sub)
    assert ids[0] == terms.blank(lex[0])


def test_combine_hash_columns_order_sensitive():
    a = np.array([1, 2], dtype=np.int64)
    b = np.array([2, 1], dtype=np.int64)
    h1 = terms.combine_hash_columns(a, b)
    h2 = terms.combine_hash_columns(b, a)
    assert h1[0] != h2[0]
    assert h1[0] == terms.combine_hash_columns(a, b)[0]
