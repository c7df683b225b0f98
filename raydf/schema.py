"""Arrow schemas and well-known vocabulary for the raydf engine.

Data model (SURVEY.md §1.2): the reference's ``Term`` / ``Signed<Triple>`` /
``Vocabulary`` abstractions (reference: src/lib.rs:104-144, src/sign.rs:17,
src/statement.rs:23-29) become two Arrow tables:

* ``triples``  — one row per signed fact, all positions interned to int64
  term ids, with lineage columns (rule_idx / round / substitution) standing
  in for the reference's ``Cause``/``Entailment`` provenance
  (src/cause.rs:7-40).
* ``terms``    — the term dictionary (the reference's ``Vocabulary``
  interning, replaced by deterministic 64-bit hashing — see raydf.terms).

Blocks are ``pyarrow.Table``; every stage uses ``batch_format="pyarrow"``
unless pandas semantics are genuinely needed.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- term kinds
KIND_IRI = 0
KIND_BLANK = 1
KIND_LITERAL = 2

# ------------------------------------------------------------------- schemas
TERMS_SCHEMA = pa.schema(
    [
        pa.field("term_id", pa.int64()),
        pa.field("kind", pa.uint8()),
        pa.field("lexical", pa.large_string()),
        pa.field("datatype", pa.large_string(), nullable=True),
    ]
)

# sign: True = positive fact, False = explicitly stored negative fact
# (reference src/sign.rs:126-129 — NOT negation-as-failure).
# graph: named-graph term id, 0 = default graph / no graph (the reference's
# Statement::with_graph → QuadStatement::Quad optional graph,
# src/statement.rs:23-29, 117-127). A 0 sentinel instead of a nullable
# column keeps every id kernel (hash/remap/join) on dense int64 — arrow
# int64-with-nulls degrades to float64 in pandas and corrupts full-range
# term ids (the known >2^53 trap).
GRAPH_DEFAULT = 0

TRIPLES_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.int64()),
        pa.field("pred", pa.int64()),
        pa.field("obj", pa.int64()),
        pa.field("sign", pa.bool_()),
        pa.field("graph", pa.int64()),
        pa.field("rule_idx", pa.int32(), nullable=True),  # null = Cause::Stated
        pa.field("round", pa.int32()),
        pa.field("substitution", pa.large_list(pa.int64()), nullable=True),
        # large_string, like every varlen column that rides a sort-based
        # exchange: Ray's sort reduce concatenates one partition's blocks
        # into ONE table, and 32-bit `string` offsets cap that partition's
        # payload at 2 GiB (ArrowInvalid "offset overflow" — hit by the
        # 12M-file 4-CPU leg in the round-0 bucketed dedup exchange)
        pa.field("content_sha256", pa.large_string(), nullable=True),
    ]
)

SOURCE_CODE_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
    ]
)

# ------------------------------------------------------- well-known IRIs
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_BOOLEAN = XSD + "boolean"
XSD_STRING = XSD + "string"
XSD_DECIMAL = XSD + "decimal"
XSD_INTEGER = XSD + "integer"
REGEX_DATATYPE = "https://schema.spruceid.com/#Regex"  # reference src/expression/value/regex.rs:13

# Full XSD decimal hierarchy accepted by the reference parser
# (src/expression/value/literal.rs:86-101).
XSD_DECIMAL_TYPES = frozenset(
    XSD + t
    for t in (
        "decimal",
        "integer",
        "nonPositiveInteger",
        "negativeInteger",
        "nonNegativeInteger",
        "positiveInteger",
        "long",
        "int",
        "short",
        "byte",
        "unsignedLong",
        "unsignedInt",
        "unsignedShort",
        "unsignedByte",
    )
)

# KG-construction vocabulary (BASELINE.json north_star extraction relations).
KG = "https://raydf.dev/kg#"
KG_CONTAINS = KG + "contains"
KG_WRITTEN_IN = KG + "writtenIn"
KG_AT_COMMIT = KG + "atCommit"
KG_IMPORTS = KG + "imports"
KG_DEFINES = KG + "defines"
KG_CALLS = KG + "calls"
KG_SOURCE_FILE = KG + "SourceFile"
KG_MODULE = KG + "Module"
KG_REPOSITORY = KG + "Repository"
KG_DIRECTORY = KG + "Directory"
KG_SAME_AS = KG + "sameAs"


def empty_triples_table() -> pa.Table:
    return TRIPLES_SCHEMA.empty_table()


def empty_terms_table() -> pa.Table:
    return TERMS_SCHEMA.empty_table()
