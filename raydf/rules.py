"""Rule / System model + JSON spec (reference src/rule/mod.rs:27-34,
src/rule/hypothesis.rs:11-13, src/rule/conclusion.rs:8-14,
src/statement.rs:11-20, src/expression/mod.rs:28-32).

A rule is ``hypotheses => conclusions``: the hypothesis is a conjunction of
signed non-linear triple patterns (variables are ``usize`` indices, the
reference's ``ResourceOrVar``), the conclusion mints ``conclusion.variables``
fresh existential variables (indices ``rule.variables + i``) and emits
signed statements: ``Triple`` | ``Eq`` | ``True`` whose positions are
expression trees (``Resource | Literal | Call``).

The reference authors rules through the compile-time ``rule!`` macro family
(src/macros.rs); here the authoring surface is a JSON format mirroring the
serde shapes (FIXTURES.md F4) plus the small Python builder functions at
the bottom of this module.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from raydf import terms
from raydf.schema import (
    KIND_BLANK,
    KIND_IRI,
    KIND_LITERAL,
    REGEX_DATATYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_STRING,
)


@dataclass(frozen=True)
class Var:
    idx: int


@dataclass(frozen=True)
class ConstTerm:
    kind: int
    lexical: str
    datatype: str | None = None

    @property
    def id(self) -> int:
        return terms.term_id(self.kind, self.lexical, self.datatype)


@dataclass(frozen=True)
class Call:
    fn: str  # or|and|eq|ne|lt|leq|gt|geq|matches|<registered name>
    args: tuple


ExprNode = object  # Var | ConstTerm | Call


@dataclass(frozen=True)
class Pattern:
    """Hypothesis triple/quad pattern; positions are Var or ConstTerm.

    ``g`` is the named-graph position (reference quad dataset traits,
    src/statement.rs:117-127): ``None`` matches facts in ANY graph (the
    triple-pattern view over a quad store), a Var binds the graph term id,
    a ConstTerm restricts to one graph (``default_graph()`` = the unnamed
    graph, id 0)."""

    s: object
    p: object
    o: object
    g: object = None

    @property
    def positions(self) -> tuple:
        return (self.s, self.p, self.o) + ((self.g,) if self.g is not None else ())

    @property
    def vars(self) -> frozenset[int]:
        return frozenset(t.idx for t in self.positions if isinstance(t, Var))

    @property
    def num_consts(self) -> int:
        return sum(1 for t in self.positions if isinstance(t, ConstTerm))


@dataclass(frozen=True)
class SignedPattern:
    sign: bool
    pattern: Pattern


@dataclass(frozen=True)
class Statement:
    """Conclusion statement (reference src/statement.rs:11-20).

    ``graph``: optional named-graph term for triple conclusions — the
    reference's ``Statement::with_graph`` → ``QuadStatement::Quad``
    (src/statement.rs:23-29); None ⇒ the default graph."""

    sign: bool
    kind: str  # 'triple' | 'eq' | 'true'
    triple: tuple | None = None  # (ExprNode, ExprNode, ExprNode)
    eq: tuple | None = None  # (ExprNode, ExprNode)
    expr: object | None = None  # ExprNode
    graph: object | None = None  # ExprNode | None (triple statements only)


@dataclass(frozen=True)
class Conclusion:
    variables: int  # fresh existential vars, indices rule.variables + i
    statements: tuple


@dataclass(frozen=True)
class Rule:
    variables: int
    hypothesis: tuple  # tuple[SignedPattern]
    conclusion: Conclusion
    name: str = ""

    def all_vars(self) -> int:
        return self.variables + self.conclusion.variables

    def const_terms(self) -> list[ConstTerm]:
        out: list[ConstTerm] = []

        def walk_expr(e):
            if isinstance(e, ConstTerm):
                out.append(e)
            elif isinstance(e, Call):
                for a in e.args:
                    walk_expr(a)

        for sp in self.hypothesis:
            for t in sp.pattern.positions:
                if isinstance(t, ConstTerm):
                    out.append(t)
        for st in self.conclusion.statements:
            for e in (st.triple or ()) + (st.eq or ()) + (
                (st.expr,) if st.expr else ()
            ) + ((st.graph,) if st.graph is not None else ()):
                walk_expr(e)
        # id-overriding subclasses (pre-interned ints, the default graph)
        # must not enter the term dictionary: their id is NOT the hash of
        # (kind, lexical, datatype), so re-hashing their lexical would mint
        # a dangling dictionary row
        return [c for c in out if type(c) is ConstTerm]


@dataclass
class System:
    """Deduction system: deduped rule set (reference src/system/mod.rs:26-35).

    The reference also builds a BipolarMap pattern→rule-path index for its
    single-triple delta hook (src/pattern/map.rs:11-25); in the distributed
    engine the rule set is tiny and driver-resident, and semi-naive rounds
    iterate all rules against the Δ partition directly (SURVEY.md O11/O12).
    """

    rules: list = field(default_factory=list)

    def insert(self, rule: Rule) -> int:
        for i, r in enumerate(self.rules):
            if r == rule:
                return i
        self.rules.append(rule)
        return len(self.rules) - 1

    def const_terms(self) -> list[ConstTerm]:
        out = []
        for r in self.rules:
            out.extend(r.const_terms())
        return out

    def deduce_from_delta(self, ckpt_dir: str, delta_ds, *,
                          buckets: int = 16, num_partitions: int = 16,
                          max_rounds: int = 25):
        """One-shot INCREMENTAL deduction: seed Δ triples against an
        existing (converged) checkpoint and semi-naive-iterate to the new
        joint fixpoint — the reference's headline incremental entry point
        (``System::deduce_from_triple``, src/system/mod.rs:124-149, which
        deduces only from rule paths the new triple can feed; here the Δ
        loads as the newest round, so every subsequent round joins ONLY
        substitutions involving ≥1 Δ triple — same pruning, realized by
        the semi-naive decomposition instead of the BipolarMap path
        index).

        ``ckpt_dir`` must hold a completed :class:`~raydf.deduce.
        FixpointEngine` run of THIS system (round checkpoints + manifest).
        Returns the engine positioned at the new fixpoint; newly derived
        rows are the rounds past the seeded Δ round (``engine.dataset()``
        is the full updated store)."""
        from raydf.deduce import FixpointEngine

        eng = FixpointEngine(
            self, ckpt_dir, buckets=buckets, num_partitions=num_partitions
        )
        m = eng.manifest()
        if not m["rounds"]:
            raise ValueError(
                f"{ckpt_dir} holds no completed rounds — deduce_from_delta "
                "is the incremental path; run the fixpoint (load_initial + "
                "run) first"
            )
        k = max(r["round"] for r in m["rounds"])
        n = eng.load_round(delta_ds, k + 1)
        if n:
            eng.run(max_rounds=k + 1 + max_rounds)
        return eng


# ------------------------------------------------------------ JSON parsing


def parse_term(spec) -> object:
    """Parse a term/expression node from the F4 JSON shapes."""
    if isinstance(spec, dict):
        if "var" in spec:
            return Var(int(spec["var"]))
        if "iri" in spec:
            return ConstTerm(KIND_IRI, spec["iri"])
        if "blank" in spec:
            return ConstTerm(KIND_BLANK, spec["blank"])
        if "lit" in spec:
            return ConstTerm(KIND_LITERAL, str(spec["lit"]), spec.get("dt"))
        if "decimal" in spec:
            return ConstTerm(KIND_LITERAL, _canon_decimal(spec["decimal"]), XSD_DECIMAL)
        if "string" in spec:
            return ConstTerm(KIND_LITERAL, str(spec["string"]), XSD_STRING)
        if "bool" in spec:
            return ConstTerm(KIND_LITERAL, "true" if spec["bool"] else "false", XSD_BOOLEAN)
        if "regex" in spec:
            return ConstTerm(KIND_LITERAL, str(spec["regex"]), REGEX_DATATYPE)
        if "call" in spec:
            return Call(spec["call"], tuple(parse_term(a) for a in spec["args"]))
        if "default_graph" in spec:
            return default_graph()
    raise ValueError(f"unparseable term spec: {spec!r}")


def _canon_decimal(v) -> str:
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _parse_sign(s) -> bool:
    if isinstance(s, bool):
        return s
    return {"+": True, "-": False, "positive": True, "negative": False}[s]


def parse_statement(spec: dict) -> Statement:
    sign = _parse_sign(spec.get("sign", "+"))
    kind = spec.get("kind", "triple")
    if kind == "triple":
        return Statement(
            sign, "triple",
            triple=tuple(parse_term(t) for t in spec["triple"]),
            graph=parse_term(spec["graph"]) if "graph" in spec else None,
        )
    if kind == "eq":
        return Statement(sign, "eq", eq=tuple(parse_term(t) for t in spec["eq"]))
    if kind == "true":
        return Statement(sign, "true", expr=parse_term(spec["expr"]))
    raise ValueError(f"unknown statement kind {kind!r}")


def parse_rule(spec: dict, name: str = "") -> Rule:
    hyp = tuple(
        SignedPattern(
            _parse_sign(h.get("sign", "+")),
            Pattern(
                *(parse_term(t) for t in h["triple"]),
                g=parse_term(h["graph"]) if "graph" in h else None,
            ),
        )
        for h in spec["hypothesis"]
    )
    concl = spec.get("conclusion", {})
    return Rule(
        variables=int(spec["variables"]),
        hypothesis=hyp,
        conclusion=Conclusion(
            variables=int(concl.get("variables", 0)),
            statements=tuple(parse_statement(s) for s in concl.get("statements", [])),
        ),
        name=name or spec.get("name", ""),
    )


def load_system(source) -> System:
    """Load a System from a JSON file path, JSON string, or dict."""
    if isinstance(source, str):
        if source.lstrip().startswith("{"):
            spec = json.loads(source)
        else:
            with open(source) as f:
                spec = json.load(f)
    else:
        spec = source
    sys_ = System()
    for i, r in enumerate(spec["rules"]):
        sys_.insert(parse_rule(r, name=r.get("name", f"rule{i}")))
    return sys_


# ---------------------------------------------------------- Python builder


def v(i: int) -> Var:
    return Var(i)


def iri(s: str) -> ConstTerm:
    return ConstTerm(KIND_IRI, s)


def blank(s: str) -> ConstTerm:
    return ConstTerm(KIND_BLANK, s)


def lit(s: str, dt: str | None = None) -> ConstTerm:
    return ConstTerm(KIND_LITERAL, s, dt)


def dec(x) -> ConstTerm:
    return ConstTerm(KIND_LITERAL, _canon_decimal(x), XSD_DECIMAL)


def regex(p: str) -> ConstTerm:
    return ConstTerm(KIND_LITERAL, p, REGEX_DATATYPE)


class _DefaultGraph(ConstTerm):
    @property
    def id(self) -> int:  # the unnamed graph's fixed sentinel id
        from raydf.schema import GRAPH_DEFAULT

        return GRAPH_DEFAULT


def default_graph() -> ConstTerm:
    """Constant matching only facts in the default (unnamed) graph."""
    return _DefaultGraph(kind=0, lexical="", datatype=None)


def pat(s, p, o, sign: bool = True, *, g=None) -> SignedPattern:
    return SignedPattern(sign, Pattern(s, p, o, g))


def triple_st(s, p, o, sign: bool = True, *, graph=None) -> Statement:
    return Statement(sign, "triple", triple=(s, p, o), graph=graph)


def eq_st(a, b, sign: bool = True) -> Statement:
    return Statement(sign, "eq", eq=(a, b))


def true_st(expr, sign: bool = True) -> Statement:
    return Statement(sign, "true", expr=expr)


def rule(
    variables: int,
    hypothesis: list,
    statements: list,
    fresh: int = 0,
    name: str = "",
) -> Rule:
    return Rule(
        variables=variables,
        hypothesis=tuple(hypothesis),
        conclusion=Conclusion(variables=fresh, statements=tuple(statements)),
        name=name,
    )
