"""Validation (SURVEY.md §2.6, reference src/rule/mod.rs:110-158,
src/system/deduction.rs:90-168, src/system/mod.rs:188-265).

``validate(rule, dataset)`` deduces and then checks that every deduced
statement *already holds* in the dataset:

* ``Triple``  — the signed triple must be contained, else
  ``MissingTriple`` (src/system/deduction.rs:104-119). Distributed:
  candidate triples anti-joined against the dataset's (s,p,o,sign) hash
  set (broadcast probe for test-scale stores; the bucketed-checkpoint
  probe from raydf.deduce for engine-scale stores).
* ``Eq``/``Ne`` — resources must be identical / distinct after
  canonicalization, else ``NotEq``/``NotNe`` (deduction.rs:120-131).
* ``True``/``False`` — the expression/resource must evaluate to an
  xsd:boolean equal to the statement sign, else ``NotTrue``/``NotFalse``;
  unparsable literal → ``InvalidLiteral`` (deduction.rs:132-162).

The reference short-circuits on the first violation; distributed we
compute violation *datasets* (``limit(1)`` gives the same short-circuit
when only Ok/Invalid is wanted, full materialization gives a report).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raydf import expr as expr_mod
from raydf.deduce import make_triples_fn, rule_call_vars, spo_hash
from raydf.match import DatasetSource, TripleSource, rule_bindings
from raydf.rules import Rule, System, Var, ConstTerm, Call

VIOLATIONS_SCHEMA = pa.schema(
    [
        pa.field("reason", pa.string()),
        pa.field("rule_idx", pa.int32()),
        pa.field("statement_idx", pa.int32()),
        pa.field("detail", pa.string(), nullable=True),
    ]
)


def _violation_table(reasons, rule_idx, stmt_idx, details=None) -> pa.Table:
    n = len(reasons)
    return pa.table(
        {
            "reason": pa.array(reasons, pa.string()),
            "rule_idx": pa.array(np.full(n, rule_idx, np.int32), pa.int32()),
            "statement_idx": pa.array(np.full(n, stmt_idx, np.int32), pa.int32()),
            "detail": pa.array(details if details is not None else [None] * n, pa.string()),
        },
        schema=VIOLATIONS_SCHEMA,
    )


def dataset_hash_set(triples_ds) -> np.ndarray:
    """Sorted (s,p,o,sign,graph)-hash array of a triple store (broadcast
    probe side). Only for small/test stores — engine-scale stores use
    :class:`BucketedCheckpointProbe` (no driver collect)."""

    def _h(batch: pa.Table) -> pa.Table:
        h = spo_hash(
            batch["subj"].to_numpy(zero_copy_only=False),
            batch["pred"].to_numpy(zero_copy_only=False),
            batch["obj"].to_numpy(zero_copy_only=False),
            batch["sign"].to_numpy(zero_copy_only=False),
            batch["graph"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"h": pa.array(np.unique(h), pa.int64())})

    hs = triples_ds.map_batches(_h, batch_format="pyarrow").to_pandas()["h"].to_numpy()
    return np.unique(hs)


class BroadcastHashProbe:
    """Membership probe against a broadcast sorted hash set — fine for
    test-scale stores; collects every (s,p,o,sign,graph) hash to the
    driver once."""

    def __init__(self, triples_ds):
        import ray

        self.ref = ray.put(dataset_hash_set(triples_ds))

    def missing(self, cand_ds):
        import ray

        ref = self.ref

        def _filt(tbl: pa.Table) -> pa.Table:
            if len(tbl) == 0:
                return tbl
            h = spo_hash(
                tbl["subj"].to_numpy(zero_copy_only=False),
                tbl["pred"].to_numpy(zero_copy_only=False),
                tbl["obj"].to_numpy(zero_copy_only=False),
                tbl["sign"].to_numpy(zero_copy_only=False),
                tbl["graph"].to_numpy(zero_copy_only=False),
            )
            known = ray.get(ref)
            pos = np.searchsorted(known, h)
            pos_c = np.clip(pos, 0, max(0, len(known) - 1))
            hit = (known[pos_c] == h) if len(known) else np.zeros(len(h), bool)
            return tbl.filter(pa.array(~hit))

        return cand_ds.map_batches(_filt, batch_format="pyarrow")


class BucketedCheckpointProbe:
    """Engine-scale membership probe: candidates shuffle by their
    (s,p,o,sign,graph)-hash bucket and each group probes ONLY its own
    bucket's ``h`` column across the checkpoint's rounds — the exact
    mechanism of the fixpoint anti-join (deduce.FixpointEngine
    ``_dedup_and_write``), wired into validation so MissingTriple checks
    never collect the store to the driver."""

    def __init__(self, ckpt_dir: str, buckets: int):
        self.ckpt = ckpt_dir
        self.buckets = buckets

    def missing(self, cand_ds):
        from raydf.deduce import checkpoint_missing

        return checkpoint_missing(cand_ds, self.ckpt, self.buckets)


def validate_rule(
    rule: Rule,
    rule_idx: int,
    source: TripleSource,
    *,
    probe,
    terms_df: pd.DataFrame | None = None,
    num_partitions: int = 8,
):
    """Violations Dataset for one rule (empty ⇒ rule validates Ok).

    ``probe``: a store-membership probe (BroadcastHashProbe for small
    stores, BucketedCheckpointProbe for FixpointEngine checkpoints)."""
    bindings = rule_bindings(rule, source, num_partitions=num_partitions)
    if bindings is None or bindings.count() == 0:
        return rd.from_arrow(VIOLATIONS_SCHEMA.empty_table())

    need = rule_call_vars(rule)
    # eq/true statements over plain vars also need literal resolution
    for st in rule.conclusion.statements:
        if st.kind == "true" and isinstance(st.expr, Var):
            need.add(st.expr.idx)
    if need and terms_df is not None:
        bindings = expr_mod.resolve_vars(bindings, sorted(need), terms_df).materialize()

    parts = []

    for stmt_idx, st in enumerate(rule.conclusion.statements):
        if st.kind == "triple":
            tri_fn = make_triples_fn(
                Rule(rule.variables, rule.hypothesis,
                     rule.conclusion.__class__(rule.conclusion.variables, (st,)),
                     rule.name),
                rule_idx, -1,
            )

            cand = bindings.map_batches(
                lambda df, _fn=tri_fn: _fn(df), batch_format="pandas"
            )
            missing = probe.missing(cand)

            def to_viol(tbl: pa.Table, _si=stmt_idx) -> pa.Table:
                return _violation_table(["MissingTriple"] * len(tbl), rule_idx, _si)

            parts.append(missing.map_batches(to_viol, batch_format="pyarrow"))

        elif st.kind == "eq":

            def check_eq(df: pd.DataFrame, _st=st, _si=stmt_idx) -> pa.Table:
                a = _resolve_ids(_st.eq[0], df, rule)
                b = _resolve_ids(_st.eq[1], df, rule)
                if _st.sign:
                    bad = int((a != b).sum())
                    return _violation_table(["NotEq"] * bad, rule_idx, _si)
                bad = int((a == b).sum())
                return _violation_table(["NotNe"] * bad, rule_idx, _si)

            parts.append(bindings.map_batches(check_eq, batch_format="pandas"))

        elif st.kind == "true":

            def check_true(df: pd.DataFrame, _st=st, _si=stmt_idx) -> pa.Table:
                result = expr_mod.evaluate(_st.expr, df)
                reasons, details = [], []
                err = result.tag == expr_mod.TAG_ERR
                is_bool = result.tag == expr_mod.TAG_BOOL
                for i in range(len(df)):
                    if err[i]:
                        reasons.append("InvalidLiteral")
                        details.append(str(result.s[i]))
                    elif is_bool[i]:
                        if _st.sign and not result.b[i]:
                            reasons.append("NotTrue")
                            details.append(None)
                        elif not _st.sign and result.b[i]:
                            reasons.append("NotFalse")
                            details.append(None)
                    else:
                        reasons.append("NotTrue" if _st.sign else "NotFalse")
                        details.append("no boolean literal")
                return _violation_table(reasons, rule_idx, _si, details)

            parts.append(bindings.map_batches(check_true, batch_format="pandas"))

    if not parts:
        return rd.from_arrow(VIOLATIONS_SCHEMA.empty_table())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _resolve_ids(term, df: pd.DataFrame, rule: Rule) -> np.ndarray:
    if isinstance(term, Var):
        return df[f"v{term.idx}"].to_numpy(np.int64)
    if isinstance(term, ConstTerm):
        return np.full(len(df), term.id, dtype=np.int64)
    raise TypeError(f"eq over expression calls not supported here: {term!r}")


def validate_engine(
    system: System,
    engine,
    *,
    terms_df: pd.DataFrame | None = None,
    first_only: bool = False,
) -> dict:
    """Validate a FixpointEngine checkpoint store: sources scan the
    checkpoint Parquet (column-pruned, constant-pushdown) and MissingTriple
    membership uses the bucketed checkpoint probe — NO driver hash collect
    anywhere, so this is the engine-scale validation entry point."""
    from raydf.match import ParquetSource

    source = ParquetSource(engine.triple_files())
    probe = BucketedCheckpointProbe(engine.ckpt, engine.buckets)
    return _validate(system, source, probe, terms_df=terms_df, first_only=first_only)


def validate_system(
    system: System,
    triples_ds,
    *,
    terms_df: pd.DataFrame | None = None,
    first_only: bool = False,
) -> dict:
    """Validate a dataset against every rule (reference System::validate,
    src/system/mod.rs:188-232). Returns {'ok': bool, 'violations': pa.Table}."""
    triples_ds = triples_ds.materialize()
    source = DatasetSource(triples_ds)
    probe = BroadcastHashProbe(triples_ds)
    return _validate(system, source, probe, terms_df=terms_df, first_only=first_only)


def _validate(
    system: System,
    source: TripleSource,
    probe,
    *,
    terms_df: pd.DataFrame | None = None,
    first_only: bool = False,
) -> dict:
    tables = []
    for rule_idx, rule in enumerate(system.rules):
        v = validate_rule(
            rule, rule_idx, source, probe=probe, terms_df=terms_df
        )
        if first_only:
            head = v.limit(1).to_pandas()
            if len(head):
                return {
                    "ok": False,
                    "violations": pa.Table.from_pandas(
                        head, schema=VIOLATIONS_SCHEMA, preserve_index=False
                    ),
                }
        else:
            df = v.to_pandas()
            if len(df):
                tables.append(
                    pa.Table.from_pandas(df, schema=VIOLATIONS_SCHEMA, preserve_index=False)
                )
    if first_only:
        return {"ok": True, "violations": VIOLATIONS_SCHEMA.empty_table()}
    all_v = (
        pa.concat_tables(tables) if tables else VIOLATIONS_SCHEMA.empty_table()
    )
    return {"ok": len(all_v) == 0, "violations": all_v}
