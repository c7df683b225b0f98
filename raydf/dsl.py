"""Textual rule DSL — a parser for the reference's ``rule!`` macro surface
(/root/reference/src/macros.rs:11-74, 160-225, 280-569), the reference's main
human authoring UX. The grammar (whitespace-insensitive, ``//`` comments):

    rule      := ["for" ?v, ?v, ...] "{" patterns "}" "=>" conclusion
    conclusion:= ["for" ?f, ...] "{" statements "}"
    patterns  := { ["!"] term term term ["@" term] "." }
    statements:= { ["!"] body ["@" term] "." }
    body      := expr "=" expr          (Eq statement)
               | expr expr expr         (Triple statement)
               | expr                   (True statement)
    term/expr := ?var                   (declared in the nearest `for` list)
               | <"iri"> | <iri>        (IRI)
               | _:"b" | _:b            (blank node)
               | "lexical"^^"dtype"     (typed literal)
               | "lexical"              (xsd:string literal)
               | 18 | 1.5               (xsd:decimal literal)
               | true | false           (xsd:boolean literal)
               | /regex/                (spruceid Regex literal)
               | (op expr ...)          (Call: = != < <= > >= matches or and,
                                         or any registered function name)

Hypothesis variables are indexed in `for`-list order (the macro's @bind,
macros.rs:197-206); conclusion-`for` variables are fresh existentials with
indices ``rule.variables + i`` (macros.rs:170-179). ``@ term`` is this
engine's named-graph extension (Statement::with_graph — absent from the
textual macro, which predates quads in the surface syntax).
"""

from __future__ import annotations

import re

from raydf import rules as R

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<arrow>=>)
  | (?P<regex>/(?:[^/\\]|\\.)*/)
  | (?P<var>\?[A-Za-z_]\w*)
  | (?P<blank>_:(?:"[^"]*"|[A-Za-z_]\w*))
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<iri><"[^">]*">|<[^\s">=][^>\s]*>)
  | (?P<caret>\^\^)
  | (?P<op><=|>=|!=|<|>|=)
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<punct>[{}().,!@:])
  | (?P<ident>[A-Za-z_]\w*)
    """,
    re.VERBOSE,
)

_OP_FN = {"=": "eq", "!=": "ne", "<": "lt", "<=": "leq", ">": "gt", ">=": "geq"}


class DslError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise DslError(f"unexpected character at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        if t[0] is None:
            raise DslError("unexpected end of input")
        self.i += 1
        return t

    def expect(self, value: str):
        kind, tok = self.next()
        if tok != value:
            raise DslError(f"expected {value!r}, got {tok!r}")

    def at_end(self) -> bool:
        return self.i >= len(self.toks)

    # ------------------------------------------------------------ pieces

    def var_list(self) -> list[str]:
        names = []
        while True:
            kind, tok = self.next()
            if kind != "var":
                raise DslError(f"expected ?var in for-list, got {tok!r}")
            names.append(tok[1:])
            if self.peek()[1] == ",":
                self.next()
            else:
                return names

    def term(self, vars_: dict[str, int]):
        kind, tok = self.next()
        if kind == "var":
            name = tok[1:]
            if name not in vars_:
                raise DslError(f"undeclared variable ?{name}")
            return R.v(vars_[name])
        if kind == "iri":
            inner = tok[1:-1]
            if inner.startswith('"') and inner.endswith('"'):
                inner = inner[1:-1]
            return R.iri(inner)
        if kind == "blank":
            inner = tok[2:]
            if inner.startswith('"') and inner.endswith('"'):
                inner = inner[1:-1]
            return R.blank(inner)
        if kind == "string":
            lex = _unquote(tok)
            if self.peek()[0] == "caret":
                self.next()
                k2, t2 = self.next()
                if k2 == "string":
                    dt = _unquote(t2)
                elif k2 == "iri":
                    dt = t2[1:-1].strip('"')
                else:
                    raise DslError(f"expected datatype after ^^, got {t2!r}")
                return R.lit(lex, dt)
            from raydf.schema import XSD_STRING

            return R.lit(lex, XSD_STRING)
        if kind == "number":
            return R.dec(tok)
        if kind == "regex":
            return R.regex(tok[1:-1].replace(r"\/", "/"))
        if kind == "ident" and tok in ("true", "false"):
            from raydf.schema import XSD_BOOLEAN

            return R.lit(tok, XSD_BOOLEAN)
        raise DslError(f"unexpected term token {tok!r}")

    def expr(self, vars_: dict[str, int]):
        if self.peek()[1] == "(":
            self.next()
            kind, head = self.next()
            if kind == "op":
                fn = _OP_FN[head]
            elif kind == "ident":
                fn = head  # matches | or | and | registered UDF name
            else:
                raise DslError(f"expected function head, got {head!r}")
            args = []
            while self.peek()[1] != ")":
                args.append(self.expr(vars_))
            self.next()  # ')'
            return R.Call(fn, tuple(args))
        return self.term(vars_)

    def opt_graph(self, vars_: dict[str, int]):
        if self.peek()[1] == "@":
            self.next()
            return self.term(vars_)
        return None

    def patterns(self, vars_: dict[str, int]) -> list:
        self.expect("{")
        out = []
        while self.peek()[1] != "}":
            sign = True
            if self.peek()[1] == "!":
                self.next()
                sign = False
            s = self.term(vars_)
            p = self.term(vars_)
            o = self.term(vars_)
            g = self.opt_graph(vars_)
            self.expect(".")
            out.append(R.pat(s, p, o, sign, g=g))
        self.next()  # '}'
        return out

    def statements(self, vars_: dict[str, int]) -> list:
        self.expect("{")
        out = []
        while self.peek()[1] != "}":
            sign = True
            if self.peek()[1] == "!":
                self.next()
                sign = False
            first = self.expr(vars_)
            nxt = self.peek()
            if nxt[1] == "=":
                self.next()
                second = self.expr(vars_)
                g = self.opt_graph(vars_)
                self.expect(".")
                if g is not None:
                    raise DslError("Eq statements take no graph")
                out.append(R.eq_st(first, second, sign))
            elif nxt[1] in (".", "@"):
                g = self.opt_graph(vars_)
                self.expect(".")
                if g is not None:
                    raise DslError("True statements take no graph")
                out.append(R.true_st(first, sign))
            else:
                p = self.expr(vars_)
                o = self.expr(vars_)
                g = self.opt_graph(vars_)
                self.expect(".")
                out.append(R.triple_st(first, p, o, sign, graph=g))
        self.next()  # '}'
        return out

    # -------------------------------------------------------------- rule

    def rule(self, name: str = "") -> R.Rule:
        hyp_vars: dict[str, int] = {}
        if self.peek()[1] == "for":
            self.next()
            for n in self.var_list():
                if n in hyp_vars:
                    raise DslError(f"duplicate variable ?{n}")
                hyp_vars[n] = len(hyp_vars)
        hypothesis = self.patterns(hyp_vars)
        self.expect("=>")
        n_hyp = len(hyp_vars)
        concl_vars = dict(hyp_vars)
        fresh = 0
        if self.peek()[1] == "for":
            self.next()
            for n in self.var_list():
                if n in concl_vars:
                    raise DslError(f"duplicate variable ?{n}")
                concl_vars[n] = n_hyp + fresh
                fresh += 1
        stmts = self.statements(concl_vars)
        return R.rule(n_hyp, hypothesis, stmts, fresh=fresh, name=name)


def parse_rule_text(text: str, name: str = "") -> R.Rule:
    """Parse ONE rule in the ``rule!`` textual grammar."""
    p = _Parser(_tokenize(text))
    r = p.rule(name)
    if not p.at_end():
        raise DslError(f"trailing input after rule: {p.peek()[1]!r}")
    return r


def parse_system_text(text: str) -> R.System:
    """Parse a sequence of rules, each optionally preceded by
    ``rule <name>:`` — the multi-rule extension of the single-rule macro."""
    p = _Parser(_tokenize(text))
    sys_ = R.System()
    idx = 0
    while not p.at_end():
        name = f"rule{idx}"
        if p.peek()[1] == "rule":
            p.next()
            kind, tok = p.next()
            if kind != "ident":
                raise DslError(f"expected rule name, got {tok!r}")
            name = tok
            if p.peek()[1] == ":":
                p.next()
        sys_.insert(p.rule(name))
        idx += 1
    return sys_
