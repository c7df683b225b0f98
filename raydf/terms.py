"""Deterministic term interning — the Ray replacement for the reference's
mutable ``Vocabulary``/``Interpretation`` (used at reference
src/expression/value/mod.rs:172-198, src/rule/mod.rs:114-131).

The reference interns lexical terms into a single-process mutable
vocabulary and mints blank nodes from a sequential generator
(rdf_types::generator::Blank, reference src/rule/mod.rs:230-236). Neither
survives distribution: a global counter would serialize every task through
one actor and break task-retry idempotency. Instead every term id is a
**deterministic 64-bit hash** of ``(kind, datatype, lexical)``:

    term_id = md5_low64(kind · 0x1f · datatype · 0x1f · lexical)

(the low 8 md5 digest bytes, little-endian, as signed int64 — exactly
DuckDB's ``md5_number_lower`` reinterpreted as two's-complement BIGINT)
so any worker can intern any term with no coordination, re-running a
task yields identical ids, and the dictionary itself is just a
by-product (dedup of emitted (term_id, kind, lexical, datatype) rows).
md5 (not a keyed fast hash) is deliberate: term ids — and everything
derived from them, skolem ids and the Eq-merge canonical min-id choice
included — are recomputable from ANY engine, which is what lets DuckDB
oracles value-check pipelines end to end.

Collision note: 64 bits is comfortable to ~10^8 distinct terms
(p(collision) < 1e-3). At the full 10^12-file scale, switch to the
full 16-byte digest and store ids as ``fixed_size_binary(16)``; every
kernel below is width-agnostic.

Vectorization: hashing happens on *unique* values per batch
(np.unique + inverse scatter) — term columns are massively repetitive
(predicates, repos, langs), so the Python-level md5 loop touches few
distinct strings per batch.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pyarrow as pa

from raydf.schema import KIND_BLANK, KIND_IRI, KIND_LITERAL

_SEP = b"\x1f"
DIGEST_SIZE = 8

# id-scheme tag stamped into checkpoint workdirs (pipeline.FORMAT_VERSION):
# ids minted under a different scheme must never mix within one workdir
HASH_SCHEME = "md5-low64"


def _h64(data: bytes) -> int:
    """Low 8 md5 bytes, little-endian, signed — SQL-reproducible:
    DuckDB ``md5_number_lower(s)`` minus 2^64 when ≥ 2^63."""
    return int.from_bytes(md5(data).digest()[8:], "little", signed=True)


def term_key(kind: int, lexical: str, datatype: str | None = None) -> str:
    """Canonical hashing key — the same string the vectorized paths build."""
    return f"{kind}\x1f{datatype or ''}\x1f{lexical}"


def term_id(kind: int, lexical: str, datatype: str | None = None) -> int:
    """Scalar intern. kind ∈ {0=iri, 1=blank, 2=literal}."""
    return _h64(term_key(kind, lexical, datatype).encode())


def iri(lex: str) -> int:
    return term_id(KIND_IRI, lex)


def blank(lex: str) -> int:
    return term_id(KIND_BLANK, lex)


def literal(lex: str, datatype: str | None = None) -> int:
    return term_id(KIND_LITERAL, lex, datatype)


def hash64_strings(values: np.ndarray, prefix: bytes = b"") -> np.ndarray:
    """Vectorized 64-bit hash of a string array (hash uniques, scatter back)."""
    if len(values) == 0:
        return np.empty(0, dtype=np.int64)
    uniq, inv = np.unique(np.asarray(values, dtype=object), return_inverse=True)
    hashes = np.fromiter(
        (_h64(prefix + str(u).encode()) for u in uniq), dtype=np.int64, count=len(uniq)
    )
    return hashes[inv]


def intern_array(
    kind: int, lexical: np.ndarray, datatype: np.ndarray | None = None
) -> np.ndarray:
    """Vectorized intern of a column of same-kind terms."""
    if datatype is None:
        prefix = f"{kind}\x1f\x1f".encode()
        return hash64_strings(lexical, prefix=prefix)
    # rare path (mixed datatypes): build composite keys, then unique-hash
    keys = np.array(
        [term_key(kind, l, d) for l, d in zip(lexical, datatype)], dtype=object
    )
    return hash64_strings(keys)


def skolem_ids(rule_idx: int, var: int, substitution_hash: np.ndarray) -> np.ndarray:
    """Deterministic skolemization for existential conclusion variables.

    The reference mints fresh blank nodes from a sequential generator per
    firing (src/system/deduction.rs:224-229). We hash
    (rule, conclusion-var, substitution) instead, so the same firing always
    produces the same blank node — making fixpoint dedup converge and task
    retries idempotent (SURVEY.md O17/O20).
    """
    if len(substitution_hash) == 0:
        return np.empty(0, dtype=np.int64)
    uniq, inv = np.unique(substitution_hash, return_inverse=True)
    hashes = np.fromiter(
        (
            _h64(term_key(KIND_BLANK, _sk_lex(rule_idx, var, int(u))).encode())
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return hashes[inv]


def _sk_lex(rule_idx: int, var: int, h: int) -> str:
    return f"sk-{rule_idx}-{var}-{h & 0xFFFFFFFFFFFFFFFF:016x}"


def skolem_lexical(rule_idx: int, var: int, substitution_hash: np.ndarray) -> np.ndarray:
    """Lexical blank-node labels matching :func:`skolem_ids` (for the dictionary)."""
    return np.array(
        [_sk_lex(rule_idx, var, int(h)) for h in substitution_hash], dtype=object
    )


def combine_hash_columns(*cols: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit mix of several int64 columns (for row keys:
    spo dedup keys, substitution hashes). Pure numpy, no Python loop."""
    acc = np.full(len(cols[0]), np.int64(-3750763034362895579), dtype=np.int64)  # FNV offset
    with np.errstate(over="ignore"):
        for c in cols:
            acc = acc ^ np.asarray(c, dtype=np.int64)
            acc = acc * np.int64(1099511628211)  # FNV prime (wraps mod 2^64)
            acc = acc ^ (acc >> np.int64(29))
    return acc


def terms_table(rows: list[tuple[int, str, str | None]]) -> pa.Table:
    """Build a terms-dictionary table from (kind, lexical, datatype) tuples."""
    ids = [term_id(k, l, d) for k, l, d in rows]
    return pa.table(
        {
            "term_id": pa.array(ids, pa.int64()),
            "kind": pa.array([k for k, _, _ in rows], pa.uint8()),
            "lexical": pa.array([l for _, l, _ in rows], pa.large_string()),
            "datatype": pa.array([d for _, _, d in rows], pa.large_string()),
        }
    )


__all__ = [
    "term_id",
    "iri",
    "blank",
    "literal",
    "hash64_strings",
    "intern_array",
    "skolem_ids",
    "skolem_lexical",
    "combine_hash_columns",
    "terms_table",
    "KIND_IRI",
    "KIND_BLANK",
    "KIND_LITERAL",
]
