"""Vectorized expression evaluation (SURVEY.md §2.5, O21-O32).

Reference semantics (src/expression/mod.rs:59-83, 255-348;
src/expression/value/{mod,comparable,literal,regex}.rs) re-expressed as
columnar kernels over batches of bindings:

* a *value* per row is a tagged union — Resource | Boolean | Decimal |
  String | Regex | Error — held as parallel numpy arrays (tag + typed
  payload columns), the Arrow-friendly form of ``Value``/``Comparable``;
* ``Comparable::from_resource`` type refinement (comparable.rs:39-78):
  a resource refines to the typed value of its literal(s); conflicting
  literals → AmbiguousLiteral error row; no literal → opaque Any;
* ``Compare(op)`` is the reference's **variadic chained comparison**
  (mod.rs:284-299): all adjacent pairs must satisfy ``op``; cross-type
  pairs are unordered → ordered ops yield false, ``Ne`` yields true
  (PartialEq/PartialOrd on Comparable, comparable.rs:102-124 — note
  Regex values are never equal, even to themselves);
* ``Or``/``And`` coerce each argument through ``require_boolean``
  (value/mod.rs:39-81) — non-boolean → error row;
* ``Matches(regex, haystack)`` = ``Regex::is_match`` (search, not
  full-match) on the haystack's unique lexical form (mod.rs:300-310).

Errors don't abort the batch (the reference's ``Result`` short-circuit
doesn't distribute): error rows carry a reason and are routed to a rejects
stream by callers.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from raydf import joins, terms
from raydf.rules import Call, ConstTerm, Var
from raydf.schema import (
    KIND_LITERAL,
    REGEX_DATATYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_STRING,
    XSD_DECIMAL_TYPES,
)

TAG_RES, TAG_BOOL, TAG_DEC, TAG_STR, TAG_REGEX, TAG_ERR = range(6)
_AMBIGUOUS_KIND = 255


class EvalResult:
    """Tagged per-row values for one evaluated expression over n rows."""

    __slots__ = ("tag", "res", "b", "d", "s", "lex")

    def __init__(self, n: int):
        self.tag = np.zeros(n, dtype=np.uint8)
        self.res = np.zeros(n, dtype=np.int64)
        self.b = np.zeros(n, dtype=bool)
        self.d = np.zeros(n, dtype=np.float64)
        self.s = np.full(n, None, dtype=object)  # string / regex pattern / error reason
        self.lex = np.full(n, None, dtype=object)  # raw lexical form when literal-backed

    def set_error(self, mask: np.ndarray, reason: str):
        self.tag[mask] = TAG_ERR
        self.s[mask] = reason


def refine_literals(
    n: int, kind: np.ndarray, lex: np.ndarray, dt: np.ndarray, res_ids: np.ndarray
) -> EvalResult:
    """Comparable::from_resource over columns: literal rows refine to typed
    values by datatype IRI; non-literals stay opaque resources (Any)."""
    out = EvalResult(n)
    out.tag[:] = TAG_RES
    out.res[:] = res_ids

    is_lit = kind == KIND_LITERAL
    if not is_lit.any():
        amb = kind == _AMBIGUOUS_KIND
        out.set_error(amb, "AmbiguousLiteral")
        return out
    out.lex[is_lit] = lex[is_lit]

    dt_f = np.array([d if d is not None else XSD_STRING for d in dt], dtype=object)
    is_str = is_lit & ((dt_f == XSD_STRING))
    out.tag[is_str] = TAG_STR
    out.s[is_str] = lex[is_str]

    is_bool = is_lit & (dt_f == XSD_BOOLEAN)
    if is_bool.any():
        vals = pd.Series(lex[is_bool])
        ok_true = vals.isin(["true", "1"]).to_numpy()
        ok_false = vals.isin(["false", "0"]).to_numpy()
        idx = np.flatnonzero(is_bool)
        out.tag[idx] = TAG_BOOL
        out.b[idx] = ok_true
        bad = idx[~(ok_true | ok_false)]
        out.tag[bad] = TAG_ERR
        out.s[bad] = "InvalidLiteral"

    in_dec = np.fromiter((d in XSD_DECIMAL_TYPES for d in dt_f), bool, count=n)
    is_dec = is_lit & in_dec
    if is_dec.any():
        parsed = pd.to_numeric(pd.Series(lex[is_dec]), errors="coerce").to_numpy(np.float64)
        idx = np.flatnonzero(is_dec)
        out.tag[idx] = TAG_DEC
        out.d[idx] = parsed
        bad = idx[np.isnan(parsed)]
        out.tag[bad] = TAG_ERR
        out.s[bad] = "InvalidLiteral"

    is_re = is_lit & (dt_f == REGEX_DATATYPE)
    out.tag[is_re] = TAG_REGEX
    out.s[is_re] = lex[is_re]

    amb = kind == _AMBIGUOUS_KIND
    out.set_error(amb, "AmbiguousLiteral")
    return out


def _const_result(n: int, t: ConstTerm) -> EvalResult:
    kind = np.full(n, t.kind, dtype=np.int64)
    lex = np.full(n, t.lexical, dtype=object)
    dt = np.full(n, t.datatype, dtype=object)
    ids = np.full(n, t.id, dtype=np.int64)
    return refine_literals(n, kind, lex, dt, ids)


def evaluate(node, df: pd.DataFrame) -> EvalResult:
    """Evaluate an expression tree over a batch of resolved bindings.

    ``df`` must contain ``v{i}`` (int64 term ids) for every Var used, and
    ``v{i}_kind`` / ``v{i}_lex`` / ``v{i}_dt`` resolution columns (see
    :func:`resolve_vars`) for Vars that feed typed operations.
    """
    n = len(df)
    if isinstance(node, Var):
        ids = df[f"v{node.idx}"].to_numpy(np.int64)
        kcol = f"v{node.idx}_kind"
        if kcol in df.columns:
            kind = df[kcol].fillna(-1).to_numpy(np.int64)
            lex = df[f"v{node.idx}_lex"].to_numpy(object)
            dt = df[f"v{node.idx}_dt"].to_numpy(object)
            return refine_literals(n, kind, lex, dt, ids)
        out = EvalResult(n)
        out.tag[:] = TAG_RES
        out.res[:] = ids
        return out
    if isinstance(node, ConstTerm):
        return _const_result(n, node)
    if isinstance(node, Call):
        args = [evaluate(a, df) for a in node.args]
        return call_function(node.fn, args, n)
    raise TypeError(f"unknown expression node {node!r}")


# ------------------------------------------------------------- comparisons


def _pair_compare(a: EvalResult, b: EvalResult, op: str) -> tuple[np.ndarray, np.ndarray]:
    """(result_bool, error_mask) for one adjacent pair under ``op``."""
    n = len(a.tag)
    err = (a.tag == TAG_ERR) | (b.tag == TAG_ERR)
    same = a.tag == b.tag
    res = np.zeros(n, dtype=bool)

    eq = np.zeros(n, dtype=bool)
    for tag, field in ((TAG_RES, "res"), (TAG_BOOL, "b"), (TAG_DEC, "d"), (TAG_STR, "s")):
        m = same & (a.tag == tag)
        if m.any():
            av, bv = getattr(a, field)[m], getattr(b, field)[m]
            eq[m] = av == bv
    # Regex: PartialEq has no Regex arm → never equal (comparable.rs:102-110)

    if op == "eq":
        res = eq
    elif op == "ne":
        res = ~eq
    else:
        # partial_cmp: Decimal→numeric, String→lexicographic,
        # Any/Boolean→Equal only when equal, else None (→ false)
        m_dec = same & (a.tag == TAG_DEC)
        m_str = same & (a.tag == TAG_STR)
        if m_dec.any():
            av, bv = a.d[m_dec], b.d[m_dec]
            res[m_dec] = {
                "lt": av < bv, "leq": av <= bv, "gt": av > bv, "geq": av >= bv
            }[op]
        if m_str.any():
            av = pd.Series(a.s[m_str]).astype(str)
            bv = pd.Series(b.s[m_str]).astype(str)
            res[m_str] = {
                "lt": (av < bv), "leq": (av <= bv), "gt": (av > bv), "geq": (av >= bv)
            }[op].to_numpy()
        m_eqonly = same & ((a.tag == TAG_RES) | (a.tag == TAG_BOOL)) & eq
        if op in ("leq", "geq"):
            res[m_eqonly] = True
    res[err] = False
    return res, err


def _require_boolean(a: EvalResult) -> tuple[np.ndarray, np.ndarray]:
    ok = a.tag == TAG_BOOL
    return a.b & ok, ~ok


_COMPARE_OPS = {"eq", "ne", "lt", "leq", "gt", "geq"}


def call_function(fn: str, args: list[EvalResult], n: int) -> EvalResult:
    out = EvalResult(n)
    out.tag[:] = TAG_BOOL

    if fn in _COMPARE_OPS:
        acc = np.ones(n, dtype=bool)
        err = np.zeros(n, dtype=bool)
        for a, b in zip(args, args[1:]):
            r, e = _pair_compare(a, b, fn)
            acc &= r
            err |= e
        out.b[:] = acc
        out.set_error(err, "error")
        for a in args:
            m = a.tag == TAG_ERR
            out.tag[m] = TAG_ERR
            out.s[m] = a.s[m]
        return out

    if fn in ("or", "and"):
        acc = np.zeros(n, dtype=bool) if fn == "or" else np.ones(n, dtype=bool)
        err = np.zeros(n, dtype=bool)
        for a in args:
            v, e = _require_boolean(a)
            err |= e
            acc = (acc | v) if fn == "or" else (acc & v)
        out.b[:] = acc
        out.set_error(err, "Unexpected: boolean required")
        return out

    if fn == "matches":
        if len(args) != 2:
            out.set_error(np.ones(n, dtype=bool), "InvalidArgumentCount")
            return out
        rx, hay = args
        err = (rx.tag != TAG_REGEX) | (rx.tag == TAG_ERR) | (hay.tag == TAG_ERR)
        no_lit = pd.isna(pd.Series(hay.lex)).to_numpy()
        err |= no_lit
        hs = pd.Series(hay.lex, dtype=object).fillna("")
        result = np.zeros(n, dtype=bool)
        patterns = pd.Series(rx.s, dtype=object)
        for pat in patterns.dropna().unique():
            m = (patterns == pat).to_numpy() & ~err
            if m.any():
                try:
                    result[m] = hs[m].str.contains(pat, regex=True, na=False).to_numpy()
                except re.error:
                    err |= m
        out.b[:] = result
        out.set_error(err, "Unexpected: regex/literal required")
        return out

    if fn in FUNCTIONS:
        return FUNCTIONS[fn](args, n)

    out.set_error(np.ones(n, dtype=bool), f"unknown function {fn}")
    return out


# -------------------------------------------------- user function registry

FUNCTIONS: dict[str, object] = {}


def register_function(name: str, fn) -> None:
    """O39: pluggable UDF surface (reference ``Function`` trait,
    src/expression/mod.rs:194-204). ``fn(args: list[EvalResult], n) ->
    EvalResult`` must be a pure vectorized kernel."""
    FUNCTIONS[name] = fn


# --------------------------------------------------------- var resolution


def prep_terms_df(terms_df: pd.DataFrame) -> pd.DataFrame:
    """Normalize a term dictionary for resolution: one row per term_id;
    ids carrying >1 distinct literal (post Eq-merge interpretations) are
    marked ambiguous (kind=255 → AmbiguousLiteral at eval,
    comparable.rs refine semantics)."""
    lit = terms_df[terms_df["kind"] == KIND_LITERAL]
    distinct = lit.drop_duplicates(["term_id", "lexical", "datatype"])
    ambiguous = set(distinct.loc[distinct["term_id"].duplicated(), "term_id"])
    out = terms_df.drop_duplicates("term_id").copy()
    if ambiguous:
        out.loc[out["term_id"].isin(ambiguous), "kind"] = _AMBIGUOUS_KIND
    return out[["term_id", "kind", "lexical", "datatype"]]


def resolve_vars(bindings_ds, var_idxs, terms_df: pd.DataFrame):
    """Append v{i}_kind/lex/dt columns for the given vars via broadcast
    lookup (small dictionaries) — swap for a hash_join against a terms
    Dataset when the dictionary no longer broadcasts (joins.hash_join)."""
    import ray

    small = prep_terms_df(terms_df)
    ref = ray.put(small)
    var_idxs = list(var_idxs)

    def _resolve(df: pd.DataFrame) -> pd.DataFrame:
        tdf = ray.get(ref)
        for i in var_idxs:
            m = df.merge(
                tdf.rename(
                    columns={
                        "term_id": f"v{i}",
                        "kind": f"v{i}_kind",
                        "lexical": f"v{i}_lex",
                        "datatype": f"v{i}_dt",
                    }
                ),
                on=f"v{i}",
                how="left",
            )
            df = m
        return df

    return bindings_ds.map_batches(_resolve, batch_format="pandas")


def value_term_ids(result: EvalResult) -> tuple[np.ndarray, pd.DataFrame]:
    """Intern evaluated values back to term ids (O19: the reference's
    ``instantiate``/``to_resource`` vocabulary interning,
    src/expression/value/mod.rs:172-198).

    Returns (ids, new-literal dictionary rows)."""
    n = len(result.tag)
    ids = result.res.copy()
    rows = {"term_id": [], "kind": [], "lexical": [], "datatype": []}

    def intern(mask, lex_arr, dt):
        if not mask.any():
            return
        idx = np.flatnonzero(mask)
        lex_list = [str(x) for x in lex_arr]
        tid = terms.intern_array(KIND_LITERAL, np.array(lex_list, dtype=object),
                                 np.full(len(idx), dt, dtype=object))
        ids[idx] = tid
        rows["term_id"].extend(tid.tolist())
        rows["kind"].extend([KIND_LITERAL] * len(idx))
        rows["lexical"].extend(lex_list)
        rows["datatype"].extend([dt] * len(idx))

    m = result.tag == TAG_BOOL
    intern(m, np.where(result.b[m], "true", "false"), XSD_BOOLEAN)
    m = result.tag == TAG_DEC
    if m.any():
        lex = [(_fmt_dec(x)) for x in result.d[m]]
        intern(m, np.array(lex, dtype=object), XSD_DECIMAL)
    m = result.tag == TAG_STR
    intern(m, result.s[m], XSD_STRING)
    m = result.tag == TAG_REGEX
    intern(m, result.s[m], REGEX_DATATYPE)

    return ids, pd.DataFrame(rows).drop_duplicates()


def _fmt_dec(x: float) -> str:
    return str(int(x)) if float(x).is_integer() else repr(float(x))


def expr_vars(node) -> set[int]:
    if isinstance(node, Var):
        return {node.idx}
    if isinstance(node, Call):
        out: set[int] = set()
        for a in node.args:
            out |= expr_vars(a)
        return out
    return set()
