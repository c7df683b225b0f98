"""Property-based check of the conjunctive-matching kernel: the join
cascade must enumerate EXACTLY the substitutions a brute-force
backtracking enumerator finds (the reference's DFS semantics,
/root/reference/src/rule/mod.rs:160-207) — over randomized stores,
pattern shapes, signs, constants, repeated variables and quad positions.
Runs against the in-process cascade (no Ray session — fast enough for
hypothesis); test_distributed_cascade_matches_driver_fast_path ties that
cascade to the distributed one."""

import itertools

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from raydf import rules as R
from raydf.match import find_bindings_df

N_TERMS = 5  # tiny universe → plenty of matches and repeated values


def _store(rows):
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj", "sign", "graph"])
    return df.astype(
        {"subj": np.int64, "pred": np.int64, "obj": np.int64, "sign": bool,
         "graph": np.int64}
    )


def _brute_force(patterns, rows, n_vars):
    """Enumerate all substitutions by trying every triple per pattern."""
    subs = set()

    def rec(i, binding):
        if i == len(patterns):
            subs.add(tuple(binding.get(v) for v in range(n_vars)))
            return
        sp = patterns[i]
        for (s, p, o, sign, g) in rows:
            if sign != sp.sign:
                continue
            b = dict(binding)
            ok = True
            pos = [(sp.pattern.s, s), (sp.pattern.p, p), (sp.pattern.o, o)]
            if sp.pattern.g is not None:
                pos.append((sp.pattern.g, g))
            for term, val in pos:
                if isinstance(term, R.Var):
                    if b.get(term.idx, val) != val:
                        ok = False
                        break
                    b[term.idx] = val
                elif term.id != val:
                    ok = False
                    break
            if ok:
                rec(i + 1, b)

    rec(0, {})
    return subs


triple_st = st.tuples(
    st.integers(0, N_TERMS - 1), st.integers(0, N_TERMS - 1),
    st.integers(0, N_TERMS - 1), st.booleans(),
    st.integers(0, 1),  # graph id (quads)
)
pattern_st = st.tuples(
    st.integers(0, 2 * N_TERMS - 1), st.integers(0, 2 * N_TERMS - 1),
    st.integers(0, 2 * N_TERMS - 1), st.booleans(),
    st.integers(0, 2 * N_TERMS),  # graph slot: 2*N_TERMS = plain triple pattern
)


@settings(max_examples=120, deadline=None)
@given(
    rows=st.lists(triple_st, min_size=0, max_size=25),
    pats=st.lists(pattern_st, min_size=1, max_size=3),
)
def test_cascade_matches_bruteforce(rows, pats):
    n_vars = N_TERMS  # var codes 0..4, const codes 5..9 (raw ids)

    class Raw(R.ConstTerm):
        """Constant whose raw int IS the term id (same trick as the
        driver's IntConst) — keeps constants inside the tiny universe so
        they actually collide with store values."""

        def __init__(self, i):
            super().__init__(0, f"int:{i}")
            object.__setattr__(self, "_i", i)

        @property
        def id(self):
            return self._i

    patterns = []
    for (s, p, o, sign, g) in pats:
        def t(code):
            return R.v(code) if code < n_vars else Raw(code)

        gterm = None if g == 2 * N_TERMS else t(g)
        patterns.append(R.pat(t(s), t(p), t(o), sign=sign, g=gterm))

    got_df = find_bindings_df([(sp, _store(rows), 0) for sp in patterns])
    used = sorted(set().union(*(sp.pattern.vars for sp in patterns)))
    want = _brute_force(patterns, rows, n_vars)
    # project brute-force substitutions onto the used variables
    want_proj = {tuple(w[v] for v in used) for w in want}
    if got_df is None or len(got_df) == 0:
        assert want_proj == set()
        return
    got = set(
        map(tuple, got_df[[f"v{v}" for v in used]].drop_duplicates().itertuples(index=False))
    )
    assert got == want_proj
