"""Forward-chaining deduction to fixpoint (SURVEY.md §3 E1/E3).

The reference does ONE deduction round per call and the host loops,
re-inserting deduced triples into an in-memory BTree graph
(src/lib.rs:35-77, src/system/mod.rs:110-119). Here the loop is a driver
coroutine over checkpointed Parquet rounds, with semi-naive Δ evaluation
(the whole-partition generalization of ``System::try_deduce_from_triple``,
src/system/mod.rs:124-149):

round r:   bindings  = ⋃_rules semi_naive_match(rule, Δ_{r-1}, old, full)
           candidates = instantiate(conclusions)        # skolemize + eval
           new        = candidates ∖ accumulated        # bucketed anti-join
           checkpoint new → ckpt/triples/round=r/bucket=j/…

**Scale design**: the accumulated triple store never lives in driver or
actor memory. It is Parquet, hash-partitioned by ``bucket = h % B`` where
``h`` is a 64-bit (subj,pred,obj,sign) row hash. The per-round anti-join
shuffles only the candidate Δ (groupby bucket) and each group probes just
its own bucket's ``h`` column across rounds — O(Δ + touched buckets), not
O(accumulated). On a multi-node cluster the checkpoint directory lives on
shared storage (S3/NFS); every stage reads/writes it independently, which
is also what makes a killed run resumable from the manifest.

Existential conclusion variables are skolemized deterministically
(hash of rule × var × substitution — raydf.terms.skolem_ids) instead of
the reference's sequential blank generator (src/system/deduction.rs:224-229)
so retried tasks and re-runs mint identical blanks and dedup converges.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raydf import expr as expr_mod
from raydf import joins
from raydf import terms
from raydf.match import DatasetSource, EmptySource, ParquetSource, rule_bindings
from raydf.rules import Call, ConstTerm, Rule, System, Var
from raydf.schema import TRIPLES_SCHEMA

EQS_SCHEMA = pa.schema(
    [
        pa.field("a", pa.int64()),
        pa.field("b", pa.int64()),
        pa.field("rule_idx", pa.int32()),
        pa.field("round", pa.int32()),
    ]
)

TRUES_SCHEMA = pa.schema(
    [
        pa.field("resource", pa.int64()),
        pa.field("value", pa.bool_(), nullable=True),
        pa.field("error", pa.string(), nullable=True),
        pa.field("sign", pa.bool_()),
        pa.field("rule_idx", pa.int32()),
        pa.field("round", pa.int32()),
        pa.field("substitution", pa.large_list(pa.int64())),
    ]
)


def spo_hash(subj: np.ndarray, pred: np.ndarray, obj: np.ndarray, sign: np.ndarray,
             graph: np.ndarray | None = None) -> np.ndarray:
    """Dedup row key over (s, p, o, sign, graph) — the same fact in two
    named graphs is two distinct facts (reference QuadStatement,
    src/statement.rs:117-127)."""
    cols = [subj, pred, obj, sign.astype(np.int64)]
    if graph is not None:
        cols.append(graph)
    return terms.combine_hash_columns(*cols)


# --------------------------------------------------------- instantiation


def _position_ids(term, df: pd.DataFrame, rule: Rule, rule_idx: int,
                  sub_hash: np.ndarray) -> np.ndarray:
    n = len(df)
    if isinstance(term, Var):
        if term.idx < rule.variables:
            return df[f"v{term.idx}"].to_numpy(np.int64)
        return terms.skolem_ids(rule_idx, term.idx, sub_hash)
    if isinstance(term, ConstTerm):
        return np.full(n, term.id, dtype=np.int64)
    if isinstance(term, Call):
        result = expr_mod.evaluate(term, df)
        ids, _ = expr_mod.value_term_ids(result)
        return ids
    raise TypeError(term)


def _substitution_column(df: pd.DataFrame, rule: Rule) -> pa.LargeListArray:
    """Dense substitution vectors (reference ``PatternSubstitution::to_vec``,
    src/pattern/mod.rs:99-119) as one flat-buffer Arrow LargeListArray —
    no per-row Python lists (this runs once per firing; at millions of
    firings/round the list-of-lists build dominated instantiation cost).
    Unbound variables become nulls inside each fixed-length list."""
    n = len(df)
    k = rule.variables
    if k == 0 or n == 0:
        offsets = pa.array(np.zeros(n + 1, dtype=np.int64), pa.int64())
        return pa.LargeListArray.from_arrays(offsets, pa.array([], pa.int64()))
    flat = np.zeros(n * k, dtype=np.int64)
    mask = np.zeros(n * k, dtype=bool)
    for i in range(k):
        c = f"v{i}"
        if c in df.columns:
            flat[i::k] = df[c].to_numpy(np.int64)
        else:
            mask[i::k] = True
    values = pa.array(flat, pa.int64(), mask=mask)
    offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int64), pa.int64())
    return pa.LargeListArray.from_arrays(offsets, values)


def _sub_hash(df: pd.DataFrame, rule: Rule) -> np.ndarray:
    arrays = []
    for i in range(rule.variables):
        c = f"v{i}"
        if c in df.columns:
            arrays.append(df[c].to_numpy(np.int64))
        else:
            arrays.append(np.zeros(len(df), dtype=np.int64))
    if not arrays:
        return np.zeros(len(df), dtype=np.int64)
    return terms.combine_hash_columns(*arrays)


def make_triples_fn(rule: Rule, rule_idx: int, round_no: int):
    """bindings batch → TRIPLES rows for every `triple`-kind conclusion."""
    stmts = [s for s in rule.conclusion.statements if s.kind == "triple"]

    def fn(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or not stmts:
            return TRIPLES_SCHEMA.empty_table()
        sub_hash = _sub_hash(df, rule)
        subs = _substitution_column(df, rule)
        parts = []
        for st in stmts:
            s = _position_ids(st.triple[0], df, rule, rule_idx, sub_hash)
            p = _position_ids(st.triple[1], df, rule, rule_idx, sub_hash)
            o = _position_ids(st.triple[2], df, rule, rule_idx, sub_hash)
            n = len(df)
            if st.graph is not None:  # quad conclusion (Statement::with_graph)
                g = _position_ids(st.graph, df, rule, rule_idx, sub_hash)
            else:
                g = np.zeros(n, dtype=np.int64)
            parts.append(
                pa.table(
                    {
                        "subj": pa.array(s, pa.int64()),
                        "pred": pa.array(p, pa.int64()),
                        "obj": pa.array(o, pa.int64()),
                        "sign": pa.array(np.full(n, st.sign), pa.bool_()),
                        "graph": pa.array(g, pa.int64()),
                        "rule_idx": pa.array(np.full(n, rule_idx, dtype=np.int32), pa.int32()),
                        "round": pa.array(np.full(n, round_no, dtype=np.int32), pa.int32()),
                        "substitution": subs,
                        "content_sha256": pa.nulls(n, pa.large_string()),
                    },
                    schema=TRIPLES_SCHEMA,
                )
            )
        return pa.concat_tables(parts)

    return fn


def make_eqs_fn(rule: Rule, rule_idx: int, round_no: int, sign: bool = True):
    """(a, b) rows for Eq conclusions of the given sign. ``sign=True`` →
    merge assertions (feed union-find canonicalization); ``sign=False`` →
    the reference's ``!Eq`` / Ne distinctness assertions
    (src/statement.rs:15-16, validated at src/system/deduction.rs:120-131)
    — recorded in the ``nes`` side output and consumed by validation's
    NotNe arm and by the canonicalizer as merge guards."""
    stmts = [s for s in rule.conclusion.statements if s.kind == "eq" and s.sign == sign]

    def fn(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or not stmts:
            return EQS_SCHEMA.empty_table()
        sub_hash = _sub_hash(df, rule)
        parts = []
        for st in stmts:
            a = np.asarray(_position_ids(st.eq[0], df, rule, rule_idx, sub_hash), np.int64)
            b = np.asarray(_position_ids(st.eq[1], df, rule, rule_idx, sub_hash), np.int64)
            if sign:
                # Eq(x, x) is a tautology: it merges nothing, but once the
                # pre-merge pass has canonicalized the store, sameAs-style
                # rules re-derive one per link — at 10M files that was 8M
                # identity rows, pushing the raw eq count past
                # DRIVER_PAIR_LIMIT and sending an empty-merge workload
                # down the distributed label-prop path for hours. Drop at
                # the source. (!Eq(x, x) — sign=False — is a genuine
                # contradiction signal and is kept.)
                keep = a != b
                if not keep.all():
                    a, b = a[keep], b[keep]
            n = len(a)
            if n == 0:
                continue
            parts.append(
                pa.table(
                    {
                        "a": pa.array(a, pa.int64()),
                        "b": pa.array(b, pa.int64()),
                        "rule_idx": pa.array(np.full(n, rule_idx, dtype=np.int32), pa.int32()),
                        "round": pa.array(np.full(n, round_no, dtype=np.int32), pa.int32()),
                    },
                    schema=EQS_SCHEMA,
                )
            )
        if not parts:
            return EQS_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    return fn


def make_trues_fn(rule: Rule, rule_idx: int, round_no: int):
    stmts = [s for s in rule.conclusion.statements if s.kind == "true"]

    def fn(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or not stmts:
            return TRUES_SCHEMA.empty_table()
        subs = _substitution_column(df, rule)
        parts = []
        for st in stmts:
            n = len(df)
            result = expr_mod.evaluate(st.expr, df)
            err_mask = result.tag == expr_mod.TAG_ERR
            is_bool = result.tag == expr_mod.TAG_BOOL
            value = [
                bool(result.b[i]) if is_bool[i] else None for i in range(n)
            ]
            error = [
                str(result.s[i]) if err_mask[i] else None for i in range(n)
            ]
            res_ids = np.where(result.tag == expr_mod.TAG_RES, result.res, 0)
            parts.append(
                pa.table(
                    {
                        "resource": pa.array(res_ids, pa.int64()),
                        "value": pa.array(value, pa.bool_()),
                        "error": pa.array(error, pa.string()),
                        "sign": pa.array(np.full(n, st.sign), pa.bool_()),
                        "rule_idx": pa.array(np.full(n, rule_idx, dtype=np.int32), pa.int32()),
                        "round": pa.array(np.full(n, round_no, dtype=np.int32), pa.int32()),
                        "substitution": subs,
                    },
                    schema=TRUES_SCHEMA,
                )
            )
        return pa.concat_tables(parts)

    return fn


def _conclusion_calls(rule: Rule) -> list:
    return [
        nd
        for st in rule.conclusion.statements
        for nd in (list(st.triple or ()) + list(st.eq or ())
                   + ([st.expr] if st.expr else []))
        if isinstance(nd, Call)
    ]


def rule_needs_term_delta(rule: Rule) -> bool:
    """Rules minting terms the dictionary doesn't know yet: existential
    (skolem) conclusion vars and Call expressions producing literals."""
    return rule.conclusion.variables > 0 or bool(_conclusion_calls(rule))


def make_term_delta_fn(rule: Rule, rule_idx: int):
    """bindings batch → term-dictionary rows for every derived term
    (O19, reference vocabulary interning at
    src/expression/value/mod.rs:172-198 + the blank generator at
    src/system/deduction.rs:224-229). Skolem blanks get their
    reconstructible ``sk-…`` lexical; Call results re-intern their literal
    lexical forms."""
    from raydf.schema import KIND_BLANK, TERMS_SCHEMA

    calls = _conclusion_calls(rule)
    fresh = [rule.variables + i for i in range(rule.conclusion.variables)]

    def fn(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or (not fresh and not calls):
            return TERMS_SCHEMA.empty_table()
        frames = []
        if fresh:
            sub_hash = _sub_hash(df, rule)
            for v_idx in fresh:
                frames.append(
                    pd.DataFrame(
                        {
                            "term_id": terms.skolem_ids(rule_idx, v_idx, sub_hash),
                            "kind": KIND_BLANK,
                            "lexical": terms.skolem_lexical(rule_idx, v_idx, sub_hash),
                            "datatype": None,
                        }
                    )
                )
        for call in calls:
            result = expr_mod.evaluate(call, df)
            _, rows = expr_mod.value_term_ids(result)
            if len(rows):
                frames.append(rows)
        if not frames:
            return TERMS_SCHEMA.empty_table()
        out = pd.concat(frames, ignore_index=True).drop_duplicates("term_id")
        return pa.table(
            {
                "term_id": pa.array(out["term_id"].to_numpy(np.int64), pa.int64()),
                "kind": pa.array(out["kind"].to_numpy().astype(np.uint8), pa.uint8()),
                "lexical": pa.array(out["lexical"].tolist(), pa.large_string()),
                "datatype": pa.array(
                    [None if d is None or d != d else d for d in out["datatype"]],
                    pa.large_string(),
                ),
            },
            schema=TERMS_SCHEMA,
        )

    return fn


def rule_call_vars(rule: Rule) -> set[int]:
    """Vars feeding Call expressions (need literal resolution columns)."""
    out: set[int] = set()
    for st in rule.conclusion.statements:
        nodes = list(st.triple or ()) + list(st.eq or ()) + ([st.expr] if st.expr else [])
        for nd in nodes:
            if isinstance(nd, Call):
                out |= expr_mod.expr_vars(nd)
    return out


def make_hash_bucket_fn(buckets: int):
    """Batch fn appending the (s,p,o,sign,graph) row hash ``h`` and its
    ``bucket = h % buckets`` — the checkpoint partitioning key."""

    def add_h(batch: pa.Table) -> pa.Table:
        h = spo_hash(
            batch["subj"].to_numpy(zero_copy_only=False),
            batch["pred"].to_numpy(zero_copy_only=False),
            batch["obj"].to_numpy(zero_copy_only=False),
            batch["sign"].to_numpy(zero_copy_only=False),
            batch["graph"].to_numpy(zero_copy_only=False),
        )
        b = (h % buckets + buckets) % buckets
        t = batch.append_column("h", pa.array(h, pa.int64()))
        return t.append_column("bucket", pa.array(b.astype(np.int32), pa.int32()))

    return add_h


def checkpoint_missing(cand_ds, ckpt: str, buckets: int):
    """Rows of ``cand_ds`` (TRIPLES-schema columns) NOT contained in the
    bucketed checkpoint under ``ckpt`` — the distributed MissingTriple
    anti-join: candidates shuffle by bucket, each group probes only its
    own bucket's ``h`` column across rounds (O(candidates + touched
    buckets), never a driver collect of the store)."""
    orig_cols = list(TRIPLES_SCHEMA.names)

    def check_group(tbl: pa.Table) -> pa.Table:
        h = tbl["h"].to_numpy(zero_copy_only=False)
        j = int(tbl["bucket"][0].as_py())
        files = glob.glob(
            os.path.join(ckpt, "triples", "round-*", f"bucket={j}", "*.parquet")
        )
        keep = np.ones(len(h), dtype=bool)
        if files:
            existing = pq.read_table(files, columns=["h"])["h"].to_numpy()
            keep = ~np.isin(h, existing)
        return tbl.filter(pa.array(keep)).select(orig_cols)

    return (
        cand_ds.map_batches(make_hash_bucket_fn(buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(check_group, batch_format="pyarrow")
    )


# ------------------------------------------------------------- the engine


class FixpointEngine:
    def __init__(
        self,
        system: System,
        ckpt_dir: str,
        *,
        buckets: int = 64,
        num_partitions: int = 32,
        terms_df: pd.DataFrame | None = None,
    ):
        self.system = system
        self.ckpt = ckpt_dir
        self.buckets = buckets
        self.num_partitions = num_partitions
        self.terms_df = terms_df  # literal dictionary for expression eval
        os.makedirs(os.path.join(ckpt_dir, "triples"), exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "eqs"), exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "nes"), exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "trues"), exist_ok=True)
        # resident-store segment cache: files-tuple → (materialized ds, rows)
        self._seg_cache: dict[tuple, tuple] = {}
        self._seg_touched: set[tuple] = set()

    # ----------------------------------------------------------- layout

    def _manifest_path(self) -> str:
        return os.path.join(self.ckpt, "MANIFEST.json")

    def manifest(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"rounds": []}

    def _save_manifest(self, m: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())

    def _round_segments(
        self, *, lo: int | None = None, hi: int | None = None
    ) -> list[tuple[int, tuple]]:
        """Per-round (round, files) segments of completed rounds lo..hi —
        the unit of the resident-store cache: every slice a round asks for
        (full / Δ / old) is a concatenation of these, so materialized
        segments are SHARED across the three slices and across rounds
        instead of each slice re-reading overlapping prefixes (ADVICE
        r02: combined resident memory approached 3× the budget and the
        same prefix bytes re-decoded every round)."""
        done = {r["round"] for r in self.manifest()["rounds"]}
        segs = []
        for r in sorted(done):
            if lo is not None and r < lo:
                continue
            if hi is not None and r > hi:
                continue
            fs = tuple(
                sorted(
                    glob.glob(
                        os.path.join(
                            self.ckpt, "triples", f"round-{r}", "**", "*.parquet"
                        ),
                        recursive=True,
                    )
                )
            )
            if fs:
                segs.append((r, fs))
        return segs

    def triple_files(self, *, lo: int | None = None, hi: int | None = None) -> list[str]:
        """Parquet files of rounds lo..hi inclusive (completed rounds only)."""
        return [f for _, fs in self._round_segments(lo=lo, hi=hi) for f in fs]

    def dataset(self):
        """Logical triple view of the checkpoint — pruned to TRIPLES_SCHEMA
        columns (the physical files also carry the dedup hash ``h`` and the
        hive partition col ``bucket``, which must NOT leak to consumers:
        a remapped generation feeds this back through ``load_initial``)."""
        files = self.triple_files()
        if not files:
            return rd.from_arrow(TRIPLES_SCHEMA.empty_table())
        return rd.read_parquet(files, columns=list(TRIPLES_SCHEMA.names))

    def count(self) -> int:
        return sum(r["new_triples"] for r in self.manifest()["rounds"])

    # ------------------------------------------------------ dedup/write

    def _dedup_and_write(self, cand_ds, round_no: int) -> int:
        """candidates ∖ accumulated → ckpt/triples/round=K (bucketed).

        Exchange-free: the candidates stream straight into a
        bucket-partitioned staging write (hive layout, no shuffle — each
        map task appends its rows to every bucket it touches), then
        ``buckets`` independent finalize tasks each read ONE staged
        bucket, dedupe within it and anti-join the accumulated store's
        same bucket, and write the round's final per-bucket file. This
        replaced a ``groupby("bucket").map_groups`` sort exchange: the
        all-to-all barrier cost ~120 s of CPU-count-INVARIANT wall at 12M
        files — A/B on the 122M-row full-width checkpoint (2026-08-19,
        fresh processes, taskset-pinned): sort shuffle 192.6 s @ 4 CPUs /
        77.9 s @ 16; Ray 2.49 HASH_SHUFFLE 83.6 s @ 16; this staged write
        100.1 s @ 4 / 23.0 s @ 16 — 3.4× faster at 16 CPUs and the 4→16
        speedup goes 2.47× → 4.35×. The staging copy is one extra
        sequential write+read of the round's candidates — disk bandwidth
        scales with nodes on a real cluster, the shuffle barrier doesn't.
        Per-bucket finalize holds one bucket in memory: size ``buckets``
        so candidates/buckets ≈ ≤1 GB decoded (the kg_pipeline knob)."""
        ckpt = self.ckpt
        buckets = self.buckets

        add_h = make_hash_bucket_fn(buckets)

        # stay in pyarrow end-to-end: a pandas round-trip would degrade the
        # all-null substitution list column to Arrow `null` type and break
        # cross-round schema merges at read time
        ckpt_schema = TRIPLES_SCHEMA.append(pa.field("h", pa.int64())).append(
            pa.field("bucket", pa.int32())
        )

        def local_dedup(batch: pa.Table) -> pa.Table:
            keep = ~pd.Series(batch["h"].to_numpy(zero_copy_only=False)).duplicated()
            return batch.filter(pa.array(keep.to_numpy())).select(ckpt_schema.names).cast(ckpt_schema)

        withh = cand_ds.map_batches(add_h, batch_format="pyarrow").map_batches(
            local_dedup, batch_format="pyarrow"
        )

        out_dir = os.path.join(ckpt, "triples", f"round-{round_no}")
        tmp_dir = os.path.join(ckpt, "triples", f"_staging-round-{round_no}")
        _fresh_dir(out_dir)  # a crashed, un-manifested attempt must not double-append
        _fresh_dir(tmp_dir)
        withh.write_parquet(tmp_dir, partition_cols=["bucket"])

        import ray

        @ray.remote(num_cpus=1)
        def _finalize_bucket(j: int) -> int:
            staged = glob.glob(os.path.join(tmp_dir, f"bucket={j}", "*.parquet"))
            if not staged:
                return 0
            # per-file ParquetFile reads, NOT pq.read_table(list): the
            # dataset factory would infer a hive `bucket` partition field
            # (dictionary<int32>) from the path and fail to merge it with
            # any real int32 bucket column — and the round's final files
            # must stay bucket-free like the groupby path's were
            parts = []
            for f in staged:
                tf = pq.ParquetFile(f).read()
                if "bucket" in tf.schema.names:
                    tf = tf.drop_columns(["bucket"])
                parts.append(tf)
            t = pa.concat_tables(parts)
            h = t["h"].to_numpy(zero_copy_only=False)
            keep = ~pd.Series(h).duplicated().to_numpy()
            # accumulated store: earlier rounds only (out_dir is fresh and
            # empty; the staging dir's "_staging-" prefix misses "round-*")
            old = glob.glob(
                os.path.join(ckpt, "triples", "round-*", f"bucket={j}", "*.parquet")
            )
            if old:
                existing = np.concatenate(
                    [pq.ParquetFile(f).read(columns=["h"])["h"].to_numpy()
                     for f in old]
                )
                keep &= ~np.isin(h, existing)
            t = t.filter(pa.array(keep))
            if len(t) == 0:
                return 0
            d = os.path.join(out_dir, f"bucket={j}")
            os.makedirs(d, exist_ok=True)
            # slice into ~500k-row files with 125k-row row groups: one
            # monolithic per-bucket file (first cut: 219 MB, 850k-row row
            # groups at 12M) throttled every downstream rule-join scan —
            # fewer/coarser read tasks and row-group pushdown units than
            # the exchange path's many reduce-task files (measured:
            # transitive_contains round-2 57→122 s at 16 CPUs)
            for i in range(0, len(t), 500_000):
                pq.write_table(
                    t.slice(i, 500_000),
                    os.path.join(d, f"part-{i // 500_000:05d}.parquet"),
                    row_group_size=125_000,
                )
            return len(t)

        counts = ray.get([_finalize_bucket.remote(j) for j in range(buckets)])
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        return int(sum(counts))

    # ------------------------------------------------------------ rounds

    def load_initial(self, triples_ds) -> int:
        """Round 0: stated facts (Cause::Stated) — dedup + checkpoint."""
        return self.load_round(triples_ds, 0)

    def load_round(self, triples_ds, round_no: int) -> int:
        """Checkpoint externally supplied triples as round ``round_no``
        (deduped against all earlier rounds). Lets a caller seed a
        semi-naive Δ directly — e.g. the Eq-merge generation loop loads
        remap-UNCHANGED triples as round 0 and remap-CHANGED ones as
        round 1, so re-deduction only joins the changed Δ instead of
        recomputing the whole fixpoint naively (any new substitution must
        involve ≥1 changed triple; unchanged×unchanged joins were already
        derived in the previous generation)."""
        m = self.manifest()
        if any(r["round"] == round_no for r in m["rounds"]):
            return next(
                r["new_triples"] for r in m["rounds"] if r["round"] == round_no
            )
        t0 = time.time()
        n = self._dedup_and_write(triples_ds, round_no)
        m["rounds"].append(
            {"round": round_no, "new_triples": n, "seconds": time.time() - t0}
        )
        self._save_manifest(m)
        return n

    def _resolved_bindings(self, rule: Rule, bindings):
        need = rule_call_vars(rule)
        if need and self.terms_df is not None:
            return expr_mod.resolve_vars(bindings, sorted(need), self.terms_df).materialize()
        return bindings

    # binding-laziness policy: "all" = every rule's bindings distinct+
    # materialized; "multi" = only multi-pattern / Eq / True rules;
    # "none" = only Eq/True rules (triple rules fully lazy).
    # A/B at 200k synthetic files, 32 CPUs (end-to-end kg_pipeline):
    # "multi" 104s, "none" 123s, "all" 127s — skipping the per-rule
    # distinct shuffle for single-pattern triple rules (their duplicates
    # fold into the bucketed anti-join anyway) removes one whole shuffle
    # job per rule per round; multi-pattern rules still materialize so the
    # join cascade can size its sides.
    dedup_policy = "multi"

    def _needs_dedup(self, rule: Rule) -> bool:
        if any(s.kind != "triple" for s in rule.conclusion.statements):
            return True
        if self.dedup_policy == "all":
            return True
        if self.dedup_policy == "multi":
            return len(rule.hypothesis) > 1
        return False

    # Store slices are pulled into the object store ONCE per round and
    # scanned in memory whenever they fit a bounded budget. Every pattern
    # scan of a ParquetSource re-reads the checkpoint files, and rounds
    # accumulate `buckets` new files each — measured at sf0.01 the LAST
    # (empty-Δ) round cost 22.5 s, ~all of it re-scanning a 4k-row store
    # dozens of times (patterns × decompositions × rules). The budget has
    # two arms:
    #   * rows ≤ RESIDENT_STORE_ROWS — trivially small, always resident;
    #   * 3 × on-disk bytes ≤ RESIDENT_BYTES_FRACTION of the cluster
    #     object store (3x ≈ Arrow decode expansion) — measured wins:
    #     500k files 306 s → 240 s, 1M files 279 s → 207 s end-to-end
    #     (evening host, back-to-back). The 12M-file store (~8.7 GB on
    #     disk) exceeds the default budget and keeps the file-backed
    #     path the recorded scaling evidence measured.
    # RAYDF_RESIDENT_ROWS=0 disables BOTH arms (the pure distributed
    # path; regression-tested equivalence).
    RESIDENT_STORE_ROWS = 250_000
    RESIDENT_BYTES_FRACTION = 0.15

    def _resident_rows(self) -> int:
        return int(
            os.environ.get("RAYDF_RESIDENT_ROWS", str(self.RESIDENT_STORE_ROWS))
        )

    def _resident_budget_bytes(self) -> float:
        frac = float(
            os.environ.get(
                "RAYDF_RESIDENT_BYTES_FRACTION", str(self.RESIDENT_BYTES_FRACTION)
            )
        )
        try:
            import ray

            if ray.is_initialized():
                return frac * float(
                    ray.cluster_resources().get("object_store_memory", 0.0)
                )
        except Exception:
            pass
        return 0.0

    def _round_source(self, lo=None, hi=None):
        """File-backed source for a round slice, or a memory-resident one
        when the slice fits the resident budget (one read job per round,
        not one per pattern scan).

        Resident slices are built from per-round materialized SEGMENTS
        held in ``self._seg_cache``: round r's full (hi=r-1) extends round
        r-1's by one newly-read segment, and Δ/old are views over the same
        segments — each checkpoint file is read+decoded ONCE per engine
        run and the three slices share memory instead of tripling it."""
        segs = self._round_segments(lo=lo, hi=hi)
        files = [f for _, fs in segs for f in fs]
        if not files:
            return EmptySource()
        ps = ParquetSource(files)
        ub = ps.upper_bound() or 0
        limit = self._resident_rows()
        resident = bool(limit) and ub <= limit
        if not resident and limit:
            disk = sum(os.path.getsize(f) for f in files)
            resident = 3 * disk <= self._resident_budget_bytes()
        if not resident:
            return ps
        parts, total = [], 0
        for _r, fs in segs:
            ent = self._seg_cache.get(fs)
            if ent is None:
                ds = rd.read_parquet(
                    list(fs), columns=["subj", "pred", "obj", "sign", "graph"]
                ).materialize()
                ent = (ds, ds.count())
                self._seg_cache[fs] = ent
            self._seg_touched.add(fs)
            parts.append(ent[0])
            total += ent[1]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)  # lazy: unions of materialized block refs
        return DatasetSource(out, ub=total)

    def _driver_frames(self, full, delta, old):
        """(full_df, delta_df, old_df) for the in-process cascade, or None
        when any source is unbounded / the total exceeds the driver
        budget. Only memory-resident sources qualify, so to_pandas is a
        block fetch, not a file re-read."""
        from raydf import match as match_mod

        budget = int(
            os.environ.get(
                "RAYDF_DRIVER_CASCADE_ROWS", str(match_mod.DRIVER_CASCADE_ROWS)
            )
        )
        srcs = (full, delta, old)
        ubs = [s.upper_bound() for s in srcs]
        if any(u is None for u in ubs) or sum(ubs) > budget:
            return None
        cols = ["subj", "pred", "obj", "sign", "graph"]
        empty = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols}).astype(
            {"sign": bool}
        )

        def df_of(s):
            if isinstance(s, DatasetSource):
                return s.ds.to_pandas()[cols]
            if isinstance(s, EmptySource) or (s.upper_bound() or 0) == 0:
                return empty
            return None

        frames = [df_of(s) for s in srcs]
        if any(f is None for f in frames):
            return None
        return tuple(frames)

    def run_round(self, round_no: int) -> dict:
        t0 = time.time()
        self._seg_touched = set()
        full = self._round_source(hi=round_no - 1)
        delta = self._round_source(lo=round_no - 1, hi=round_no - 1)
        old = self._round_source(hi=round_no - 2)
        # sweep segments this round didn't touch (e.g. old deltas once the
        # growing store stops qualifying for residency) so cached blocks
        # don't accumulate past the budget
        for k in list(self._seg_cache):
            if k not in self._seg_touched:
                del self._seg_cache[k]

        cand_parts, eq_parts, ne_parts, true_parts, term_parts = [], [], [], [], []
        per_rule = {}
        per_rule_secs = {}

        # Tiny-store fast path: when full+Δ+old all fit the driver budget
        # (they are then memory-resident DatasetSources anyway), collect
        # each ONCE and run every rule's cascade in-process — pandas
        # merges instead of one Ray job per pattern per decomposition per
        # rule. Late fixpoint rounds over small stores are pure job-launch
        # overhead otherwise (measured: 12.9 s rule wall at sf0.1 for a
        # 40k-row store). Large stores keep the distributed cascade.
        frames = self._driver_frames(full, delta, old)

        def _rule_task(args):
            """One rule's binding job — materialization runs inside a thread
            so independent rules' Ray jobs execute CONCURRENTLY (each
            .materialize() is its own streaming job; serializing them makes
            round latency the SUM of per-rule fixed costs)."""
            rule_idx, rule = args
            t_rule = time.time()
            # pure-triple rules keep bindings LAZY (duplicates fold into the
            # bucketed (s,p,o,sign) anti-join) so the whole round's candidate
            # generation fuses into one streaming execution; Eq/True rules
            # need distinct bindings (consumers see rows directly)
            needs_dedup = self._needs_dedup(rule)
            cnt = None
            if frames is not None:
                from raydf.match import rule_bindings_df

                full_df, delta_df, old_df = frames
                bdf = rule_bindings_df(
                    rule, full_df, delta_df=delta_df, old_df=old_df,
                    dedup=needs_dedup,
                )
                if bdf is None or len(bdf) == 0:
                    return (rule_idx, rule, None, needs_dedup,
                            0 if needs_dedup and bdf is not None else None,
                            time.time() - t_rule)
                b = rd.from_arrow(pa.Table.from_pandas(bdf, preserve_index=False))
                if needs_dedup:
                    cnt = len(bdf)
                b = self._resolved_bindings(rule, b)
                return rule_idx, rule, b, needs_dedup, cnt, time.time() - t_rule
            b = rule_bindings(
                rule, full, delta=delta, old=old,
                num_partitions=self.num_partitions, dedup=needs_dedup,
            )
            if b is not None and needs_dedup:  # materialized → count is cheap
                cnt = b.count()
                if cnt > 0:
                    b = self._resolved_bindings(rule, b)
            elif b is not None:
                b = self._resolved_bindings(rule, b)
            return rule_idx, rule, b, needs_dedup, cnt, time.time() - t_rule

        from concurrent.futures import ThreadPoolExecutor

        import ray

        # Each concurrent multi-pattern rule runs a Ray native join whose
        # aggregator ACTORS reserve 0.125 CPU × num_partitions (= 2 CPUs at
        # 16 partitions). Stacking several joins on a small CPU budget
        # starves the map tasks behind the reserved actors and DEADLOCKS
        # (observed at num_cpus=4: join aggregator idle forever). Budget
        # one rule thread per ~8 CPUs.
        # cluster_resources() is re-read here EVERY round (not snapshotted
        # at engine construction) so a cluster that scales mid-run gets the
        # right budget next round. RAYDF_RULE_THREADS=1 forces serial rule
        # execution — the safe setting on small/unknown clusters or Ray
        # versions where concurrent driver-side Dataset jobs are unproven
        # (one fsspec-import race was already found and stubbed around;
        # tested against Ray 2.49 local mode).
        cpus = int(ray.cluster_resources().get("CPU", 8))
        override = int(os.environ.get("RAYDF_RULE_THREADS", "0"))
        # Adaptive concurrency: when the Δ is LARGE each rule's binding job
        # is data-dominated and already saturates the cluster on its own —
        # stacking them only adds scheduler contention (A/B at 12M files /
        # 32 CPUs: round 1 [81.6M-row Δ] 143.6 s with 4 threads vs 96.2 s
        # serial; end-to-end 527.9 s vs 504.4 s). When the Δ is SMALL the
        # jobs are fixed-cost-dominated and concurrency amortizes the
        # per-job launch cost (same A/B, round 3 [9.6M-row Δ]: 64.2 s with
        # threads vs 92.9 s serial; sf0.1 inputs regress badly serial).
        # Δ size is free Parquet metadata, so the policy costs nothing.
        serial_delta = int(os.environ.get("RAYDF_SERIAL_DELTA_ROWS", str(20_000_000)))
        delta_rows = delta.upper_bound() or 0
        n_workers = override or (
            1
            if delta_rows >= serial_delta
            else max(1, min(len(self.system.rules), cpus // 8))
        )
        with ThreadPoolExecutor(max_workers=n_workers) as ex:
            rule_results = list(
                ex.map(_rule_task, list(enumerate(self.system.rules)))
            )

        for rule_idx, rule, b, needs_dedup, cnt, secs in rule_results:
            name = rule.name or str(rule_idx)
            if b is None:
                per_rule[name] = 0
                continue
            if needs_dedup:
                per_rule[name] = cnt
                per_rule_secs[name] = round(secs, 2)
                if cnt == 0:
                    continue
            else:
                per_rule[name] = None  # lazy: unknown
            if any(s.kind == "triple" for s in rule.conclusion.statements):
                cand_parts.append(
                    b.map_batches(make_triples_fn(rule, rule_idx, round_no), batch_format="pandas")
                )
            if any(s.kind == "eq" and s.sign for s in rule.conclusion.statements):
                eq_parts.append(
                    b.map_batches(make_eqs_fn(rule, rule_idx, round_no), batch_format="pandas")
                )
            if any(s.kind == "eq" and not s.sign for s in rule.conclusion.statements):
                ne_parts.append(
                    b.map_batches(
                        make_eqs_fn(rule, rule_idx, round_no, sign=False),
                        batch_format="pandas",
                    )
                )
            if any(s.kind == "true" for s in rule.conclusion.statements):
                true_parts.append(
                    b.map_batches(make_trues_fn(rule, rule_idx, round_no), batch_format="pandas")
                )
            if rule_needs_term_delta(rule):
                term_parts.append(
                    b.map_batches(make_term_delta_fn(rule, rule_idx), batch_format="pandas")
                )

        new = 0
        if cand_parts:
            cand = cand_parts[0]
            for c in cand_parts[1:]:
                cand = cand.union(c)
            new = self._dedup_and_write(cand, round_no)
        if eq_parts:
            eqs = eq_parts[0]
            for e in eq_parts[1:]:
                eqs = eqs.union(e)
            d = os.path.join(self.ckpt, "eqs", f"round-{round_no}")
            _fresh_dir(d)
            eqs.write_parquet(d)
        if ne_parts:
            nes = ne_parts[0]
            for e in ne_parts[1:]:
                nes = nes.union(e)
            d = os.path.join(self.ckpt, "nes", f"round-{round_no}")
            _fresh_dir(d)
            nes.write_parquet(d)
        if true_parts:
            trues = true_parts[0]
            for t in true_parts[1:]:
                trues = trues.union(t)
            d = os.path.join(self.ckpt, "trues", f"round-{round_no}")
            _fresh_dir(d)
            trues.write_parquet(d)
        if term_parts:
            tds = term_parts[0]
            for t in term_parts[1:]:
                tds = tds.union(t)
            d = os.path.join(self.ckpt, "termdelta", f"round-{round_no}")
            _fresh_dir(d)
            joins.distinct(tds, ["term_id"], num_partitions=4).write_parquet(d)

        rec = {
            "round": round_no,
            "new_triples": new,
            "seconds": time.time() - t0,
            "per_rule_bindings": per_rule,
            "per_rule_seconds": per_rule_secs,
        }
        m = self.manifest()
        m["rounds"] = [r for r in m["rounds"] if r["round"] != round_no] + [rec]
        self._save_manifest(m)
        return rec

    def run(self, *, max_rounds: int = 25) -> dict:
        """Iterate rounds to fixpoint. Resumes from the manifest: completed
        rounds are skipped (their checkpoints are the state)."""
        m = self.manifest()
        assert any(r["round"] == 0 for r in m["rounds"]), "call load_initial first"
        done = sorted(r["round"] for r in m["rounds"])
        start = done[-1] + 1
        # already converged?
        if len(done) > 1:
            last = next(r for r in m["rounds"] if r["round"] == done[-1])
            if last["new_triples"] == 0:
                return self.manifest()
        for r in range(start, max_rounds + 1):
            rec = self.run_round(r)
            if rec["new_triples"] == 0:
                break
        return self.manifest()

    # --------------------------------------------------------- side outs

    def eq_pairs(self):
        files = sorted(
            glob.glob(os.path.join(self.ckpt, "eqs", "**", "*.parquet"), recursive=True)
        )
        if not files:
            return None
        return rd.read_parquet(files)

    def eq_pairs_df(self) -> "pd.DataFrame | None":
        """Driver-resident (a, b) Eq pairs — zero Ray jobs (plain pyarrow
        read). Returns None when the metadata row count exceeds the
        driver pre-read budget (below) or the distinct count exceeds
        DRIVER_PAIR_LIMIT; callers then fall back to ``eq_pairs()`` +
        the gated distinct / distributed min-label propagation. The
        canonical mapping is driver-resident by design (it is broadcast
        into the remap stage), so a driver read of the pairs is not a
        scale smell — only an *unbounded* one would be."""
        files = sorted(
            glob.glob(os.path.join(self.ckpt, "eqs", "**", "*.parquet"), recursive=True)
        )
        if not files:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        if rows > _driver_preread_rows():
            return None
        from raydf.canonicalize import DRIVER_PAIR_LIMIT

        df = pq.read_table(files, columns=["a", "b"]).to_pandas()
        df = df[df["a"] != df["b"]].drop_duplicates(ignore_index=True)
        if len(df) > DRIVER_PAIR_LIMIT:
            return None
        return df

    def ne_pairs(self):
        """(a, b) !Eq assertions as a Dataset (None when empty) — the
        unbounded-scale accessor mirroring :meth:`eq_pairs`."""
        files = sorted(
            glob.glob(os.path.join(self.ckpt, "nes", "**", "*.parquet"), recursive=True)
        )
        if not files:
            return None
        return rd.read_parquet(files)

    def ne_pairs_df(self) -> "pd.DataFrame | None":
        """Driver-resident (a, b) !Eq (Ne) assertions — distinctness
        constraints recorded during deduction. Consumed by validation's
        NotNe arm and usable as merge guards by the canonicalizer.
        Returns None past the driver pre-read budget (a ``!Eq``-heavy
        ruleset must not become an unbounded driver read — VERDICT r04
        wrong #2); callers then stream via :meth:`ne_pairs`."""
        files = sorted(
            glob.glob(os.path.join(self.ckpt, "nes", "**", "*.parquet"), recursive=True)
        )
        if not files:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        if rows > _driver_preread_rows():
            return None
        return (
            pq.read_table(files, columns=["a", "b"])
            .to_pandas()
            .drop_duplicates(ignore_index=True)
        )

    def trues(self):
        files = sorted(
            glob.glob(os.path.join(self.ckpt, "trues", "**", "*.parquet"), recursive=True)
        )
        if not files:
            return None
        return rd.read_parquet(files)

    def term_delta_files(self) -> list[str]:
        """Dictionary rows for terms minted during deduction (skolem blanks,
        expression-literal results) — merge into the base term dictionary
        before decoding/materializing."""
        return sorted(
            glob.glob(
                os.path.join(self.ckpt, "termdelta", "**", "*.parquet"), recursive=True
            )
        )


def _driver_preread_rows() -> int:
    """Row cap for pre-distinct driver reads of (a, b) int64 pair files.

    Sized to the MACHINE, not to DRIVER_PAIR_LIMIT: the former "8×
    DRIVER_PAIR_LIMIT ≈ 640 MB" comment went 40× stale when the limit
    rose 5M → 200M (1.6B rows ≈ 25.6 GB + a dedup copy — a head-node
    OOM; VERDICT r04 wrong #1). Budget = 10% of MemAvailable at ~48 B
    per raw row (16 B arrow + the pandas copy + drop_duplicates's
    hash/take transients), floored at 4M rows so small boxes still take
    the fast path on trivially small pair sets. Raw rows above the cap
    route to the gated distinct (`_gated_mapping`'s staged/exchange
    distinct), whose DISTINCT output may still land on the driver.
    Env override: RAYDF_DRIVER_PREREAD_ROWS."""
    env = os.environ.get("RAYDF_DRIVER_PREREAD_ROWS")
    if env:
        return int(env)
    avail = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail = int(line.split()[1]) * 1024
                    break
    except OSError:
        pass
    if avail is None:
        avail = 8 << 30
    return max(4_000_000, int(avail * 0.10 / 48))


def _fresh_dir(d: str) -> None:
    import shutil

    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
