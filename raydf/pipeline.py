"""Flagship end-to-end KG-construction pipeline (BASELINE.json north_star).

    read_parquet(source_code)
      → extract (structural map_batches ∪ mention-regex actor pool)   [ckpt]
      → term dictionary (column-pruned re-read, groupby dedup)        [ckpt]
      → intern → stated triples (round 0)
      → forward-chain rules to fixpoint (semi-naive Δ rounds)         [ckpt/round=K]
      → entity-link sameAs ⇒ Eq ⇒ union-find canonicalization
        (outer generation loop: merges can enable new rule firings —
        re-deduce until joint fixpoint)
      → materialize dictionary-encoded triple store sorted by (subj, pred)

Every stage checkpoints to Parquet under ``workdir`` with a completion
marker, so a killed run resumes by skipping finished stages / rounds.
Per-round metrics live in each generation's MANIFEST.json; the pipeline
summary in METRICS.json.
"""

from __future__ import annotations

import glob
import json
import os
import time

import pandas as pd
import pyarrow as pa
import ray.data as rd

from raydf import canonicalize as cz
from raydf import joins
from raydf import rules as R
from raydf import terms
from raydf.canonicalize import remap_terms, remap_triples
from raydf.deduce import FixpointEngine
from raydf.extract import (
    extract_wide,
    intern_wide_batch,
    terms_delta_batch,
)
from raydf.materialize import materialize_graph
from raydf.schema import (
    KG_CALLS,
    KG_CONTAINS,
    KG_DEFINES,
    KG_IMPORTS,
    KG_MODULE,
    KG_SAME_AS,
    KG_SOURCE_FILE,
    KG_WRITTEN_IN,
    RDF_TYPE,
)


def default_system() -> R.System:
    """The flagship rule system (north_star: transitive contains, type
    propagation, call→def linking, sameAs ⇒ Eq merge)."""
    sys_ = R.System()
    sys_.insert(
        R.rule(
            3,
            [
                R.pat(R.v(0), R.iri(KG_CONTAINS), R.v(1)),
                R.pat(R.v(1), R.iri(KG_CONTAINS), R.v(2)),
            ],
            [R.triple_st(R.v(0), R.iri(KG_CONTAINS), R.v(2))],
            name="transitive_contains",
        )
    )
    sys_.insert(
        R.rule(
            2,
            [R.pat(R.v(0), R.iri(KG_WRITTEN_IN), R.v(1))],
            [R.triple_st(R.v(0), R.iri(RDF_TYPE), R.iri(KG_SOURCE_FILE))],
            name="type_source_file",
        )
    )
    sys_.insert(
        R.rule(
            2,
            [R.pat(R.v(0), R.iri(KG_IMPORTS), R.v(1))],
            [R.triple_st(R.v(1), R.iri(RDF_TYPE), R.iri(KG_MODULE))],
            name="type_module",
        )
    )
    sys_.insert(
        R.rule(
            3,
            [
                R.pat(R.v(0), R.iri(KG_CALLS), R.v(2)),
                R.pat(R.v(1), R.iri(KG_DEFINES), R.v(2)),
            ],
            [R.triple_st(R.v(0), R.iri("https://raydf.dev/kg#dependsOn"), R.v(1))],
            name="depends_on",
        )
    )
    sys_.insert(
        R.rule(
            2,
            [R.pat(R.v(0), R.iri(KG_SAME_AS), R.v(1))],
            [R.eq_st(R.v(0), R.v(1))],
            name="sameas_eq",
        )
    )
    return sys_


def _stage_done(d: str) -> bool:
    return os.path.exists(os.path.join(d, "_DONE"))


def _mark_done(d: str) -> None:
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("ok")


# Checkpoint format version: bump whenever on-disk ids/layout change
# incompatibly (v2 = md5-low64 term ids — v1 workdirs carried blake2b ids,
# and resuming one mid-pipeline would silently mix id schemes; v3 =
# content_sha256 stored as large_string — cross-round reads of a resumed
# v2 workdir would mix string/large_string parquet schemas).
FORMAT_VERSION = f"3:{terms.HASH_SCHEME}"


def _check_workdir_format(workdir: str) -> None:
    """Stamp new workdirs with FORMAT_VERSION; refuse to resume a workdir
    written by an incompatible engine version (a silent resume would mix
    term-id schemes across checkpointed and fresh stages — ADVICE r02)."""
    marker = os.path.join(workdir, "_FORMAT")
    if os.path.exists(marker):
        with open(marker) as f:
            found = f.read().strip()
        if found != FORMAT_VERSION:
            raise RuntimeError(
                f"workdir {workdir} was written by engine format {found!r}, "
                f"this engine is {FORMAT_VERSION!r}: delete the workdir (or "
                "point at a fresh one) instead of resuming across id schemes"
            )
        return
    # legacy dirs (pre-marker) with completed stages are indistinguishable
    # from v1: refuse those too rather than guess
    if any(
        os.path.exists(os.path.join(workdir, d, "_DONE"))
        for d in ("extracted", "terms0")
    ):
        raise RuntimeError(
            f"workdir {workdir} predates format stamping: delete it or "
            "re-create it with this engine version before resuming"
        )
    with open(marker, "w") as f:
        f.write(FORMAT_VERSION)


def compose_mappings(total: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
    """total ∘ new — vectorized (sorted-key searchsorted, no Python-level
    per-row map: this runs on the driver over mappings that reach millions
    of rows)."""
    if len(total) == 0:
        return new
    if len(new) == 0:
        return total
    import numpy as np

    keys = new["node"].to_numpy(np.int64)
    vals = new["canon"].to_numpy(np.int64)
    order = np.argsort(keys)
    keys, vals = keys[order], vals[order]
    cur = total["canon"].to_numpy(np.int64)
    pos = np.clip(np.searchsorted(keys, cur), 0, len(keys) - 1)
    hit = keys[pos] == cur
    total = total.copy()
    total["canon"] = np.where(hit, vals[pos], cur)
    extra = new[~new["node"].isin(total["node"])]
    return pd.concat([total, extra], ignore_index=True)


def _mapping_df_to_ds(df: pd.DataFrame):
    import numpy as np

    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(df["node"].to_numpy(np.int64), pa.int64()),
                "canon": pa.array(df["canon"].to_numpy(np.int64), pa.int64()),
            }
        )
    )


def _gated_mapping(pairs, *, num_partitions: int):
    """Eq pairs → canonical mapping with the two scale gates applied:

    * pairs is a driver frame, or a Dataset whose count fits
      ``cz.DRIVER_PAIR_LIMIT`` → numpy min-label union-find on the driver;
    * the resulting mapping exceeds ``cz.MAPPING_BROADCAST_LIMIT`` (or the
      pair set never fit the driver) → the mapping is (or becomes) a
      DATASET, and every consumer downstream must take the joined path.

    Returns ``(mapping_df, mapping_ds)`` — exactly one is non-None."""
    empty = pd.DataFrame({"node": [], "canon": []})
    if pairs is None:
        return empty, None
    if isinstance(pairs, pd.DataFrame):
        if len(pairs) == 0:
            return empty, None
        df = cz.canonical_mapping_driver(pairs)
    else:
        n = pairs.count()
        if n == 0:
            return empty, None
        if n > cz.DRIVER_PAIR_LIMIT:
            # route on the DISTINCT non-identity pair count, not the raw
            # firing count: rules re-derive the same Eq every round, and
            # the r02 10M-file post-mortem (BASELINE.md) showed a
            # duplicate-inflated count steering a driver-sized workload
            # onto the (far costlier) distributed loop. One distinct
            # exchange is cheap insurance against O(rounds) of them.
            from raydf import joins

            def _nonid(t: pa.Table) -> pa.Table:
                # arrow in/out: an empty pandas block here would skip later
                # map UDFs and flip sort-reduce block normalization
                a = t["a"].cast(pa.int64())
                b = t["b"].cast(pa.int64())
                return pa.table({"a": a, "b": b}).filter(
                    pa.compute.not_equal(a, b)
                )

            pairs = joins.distinct(
                pairs.select_columns(["a", "b"]).map_batches(
                    _nonid, batch_format="pyarrow"
                ),
                ["a", "b"],
                num_partitions=num_partitions,
            ).materialize()
            n = pairs.count()
        if n > cz.DRIVER_PAIR_LIMIT:
            ds = cz.canonical_mapping_distributed_ds(
                pairs.select_columns(["a", "b"]), num_partitions=num_partitions
            ).materialize()
            # re-gate on the RESULT: a huge pair set often collapses to a
            # mapping that broadcasts fine (heavy duplication = few merged
            # nodes per component). Collecting it here keeps every
            # downstream consumer on the vectorized broadcast remap
            # instead of the joined exchanges.
            if ds.count() <= cz.MAPPING_BROADCAST_LIMIT:
                df = ds.to_pandas()
                return (
                    pd.DataFrame(
                        {
                            "node": df["node"].to_numpy(np.int64),
                            "canon": df["canon"].to_numpy(np.int64),
                        }
                    ),
                    None,
                )
            return None, ds
        if n == 0:
            return empty, None
        df = cz.canonical_mapping_driver(
            pairs.select_columns(["a", "b"]).to_pandas()
        )
    if len(df) > cz.MAPPING_BROADCAST_LIMIT:
        return None, _mapping_df_to_ds(df)
    return df, None


def kg_pipeline(
    source_ds,
    workdir: str,
    *,
    system: R.System | None = None,
    link_entities: bool = True,
    buckets: int = 16,
    num_partitions: int = 16,
    max_rounds: int = 12,
    max_generations: int = 3,
    mention_concurrency: int | None = None,
) -> dict:
    os.makedirs(workdir, exist_ok=True)
    _check_workdir_format(workdir)
    system = system or default_system()
    metrics: dict = {"stages": {}}
    t_all = time.time()

    # ---- stage 1: extraction → wide lexical triples checkpoint
    extracted = os.path.join(workdir, "extracted")
    t0 = time.time()
    if not _stage_done(extracted):
        # single one-pass actor-pool stage (structural ∪ mentions ∪ links):
        # content scanned once; no self-referencing union branches
        wide = extract_wide(
            source_ds,
            mention_concurrency=mention_concurrency,
            link_threshold=0.9 if link_entities else None,
        )
        wide.write_parquet(extracted, mode="overwrite")
        _mark_done(extracted)
    metrics["stages"]["extract"] = time.time() - t0

    wide_files = sorted(glob.glob(os.path.join(extracted, "*.parquet")))

    # ---- stage 2 ∥ 3+4: term dictionary (column-pruned re-read of the
    # ckpt) in a WORKER THREAD, overlapped with the stated-triples
    # materialize + Eq premerge + fixpoint. The dictionary is next
    # consumed at materialize (stage 5, term ids are content hashes — no
    # interner round-trip), while the fixpoint's round-0 residual
    # (premerge driver union-find + ray.put + per-stage planning gaps)
    # leaves the cluster underutilized for a CPU-count-invariant stretch
    # — the named Amdahl term of three scaling rounds (BENCH_scaling r04:
    # fixpoint round 0 scales 2.08× vs 3.0-3.7× for deduction rounds).
    # Each Dataset execution is its own streaming job, so two driver
    # threads interleave at the Ray scheduler (same pattern as
    # FixpointEngine's per-rule binding threads); the overlap converts
    # the serial premerge seconds into covered cluster work at BOTH
    # scaling legs.
    import threading

    terms_dir = os.path.join(workdir, "terms0")
    terms_exc: list[BaseException] = []

    def _terms_stage() -> None:
        t0 = time.time()
        try:
            if _stage_done(terms_dir):
                return
            tds = (
                rd.read_parquet(
                    wide_files,
                    columns=[
                        "s_kind", "s_lex", "s_dt",
                        "p_kind", "p_lex", "p_dt",
                        "o_kind", "o_lex", "o_dt",
                    ],
                )
                .map_batches(terms_delta_batch, batch_format="pyarrow")
            )
            const_tbl = R_const_terms_table(system)
            if len(const_tbl):
                tds = tds.union(rd.from_arrow(const_tbl))
            if os.environ.get("RAYDF_SORT_EXCHANGE", "0") != "0":
                # A/B control: distinct's groupby exchange + plain write
                joins.distinct(tds, ["term_id"]).write_parquet(
                    terms_dir, mode="overwrite"
                )
            else:
                joins.distinct_write(tds, ["term_id"], terms_dir)
            _mark_done(terms_dir)
        except BaseException as e:  # re-raised at the join point
            terms_exc.append(e)
        finally:
            metrics["stages"]["terms"] = time.time() - t0

    terms_thread = threading.Thread(
        target=_terms_stage, name="raydf-terms-stage", daemon=True
    )
    terms_thread.start()

    # ---- stage 3+4: stated triples → fixpoint ↔ Eq-merge generation loop
    t0 = time.time()
    stated = rd.read_parquet(wide_files).map_batches(
        intern_wide_batch, batch_format="pyarrow"
    )
    total_mapping = pd.DataFrame({"node": [], "canon": []})
    # once any generation's (or the accumulated) mapping exceeds
    # MAPPING_BROADCAST_LIMIT this becomes a Dataset and every downstream
    # consumer (remap, composition, terms) takes the joined scale path —
    # unbounded sameAs growth never lands a mapping frame on the driver
    total_mapping_ds = None

    # pre-merge pass: evaluate Eq-concluding rules against the *stated*
    # triples and canonicalize BEFORE the fixpoint. Entity links are
    # extracted facts, so in the common case every Eq is already derivable
    # here and the post-fixpoint generation loop terminates after one
    # generation instead of re-deducing the whole graph under the merge.
    # (Eqs that only emerge from derived triples are still caught by the
    # generation loop below — this is purely an optimization.)
    pre_pairs = _premerge_eq_pairs(stated := stated.materialize(), system,
                                   num_partitions=num_partitions)
    pre_df, pre_ds = _gated_mapping(pre_pairs, num_partitions=num_partitions)
    if pre_ds is not None:
        total_mapping_ds = pre_ds
        stated = cz.remap_triples_joined(
            stated, pre_ds, num_partitions=num_partitions
        )
        metrics["premerged_entities"] = int(pre_ds.count())
    else:
        if len(pre_df):
            total_mapping = compose_mappings(total_mapping, pre_df)
            stated = remap_triples(stated, pre_df)
        metrics["premerged_entities"] = int(len(pre_df))
    gen = 0
    engine = None
    unchanged_ds = changed_ds = None
    while gen < max_generations:
        ckpt = os.path.join(workdir, f"gen{gen}")
        engine = FixpointEngine(
            system, ckpt, buckets=buckets, num_partitions=num_partitions
        )
        if gen == 0:
            engine.load_initial(stated)
        else:
            # incremental generation: remap-unchanged triples are the
            # accumulated store (round 0), remap-changed ones the Δ
            # (round 1) — re-deduction joins only the Δ; unchanged ×
            # unchanged substitutions were all derived last generation
            engine.load_round(unchanged_ds, 0)
            engine.load_round(changed_ds, 1)
        engine.run(max_rounds=max_rounds)
        # driver pq read (no Ray job) when pairs are small; else the
        # distributed min-label path via the Dataset view
        eqs_df = engine.eq_pairs_df()
        m_df, m_ds = _gated_mapping(
            eqs_df if eqs_df is not None else engine.eq_pairs(),
            num_partitions=num_partitions,
        )
        # only *new* merges (w.r.t. the already-applied composition) matter
        if m_ds is None and len(m_df) == 0:
            break
        if m_ds is not None or total_mapping_ds is not None:
            # joined scale path: this generation's mapping (or the
            # accumulated one) exceeds the broadcast gate — compose and
            # remap as Datasets end-to-end, nothing driver-resident
            if m_ds is None:
                m_ds = _mapping_df_to_ds(m_df)
            if m_ds.count() == 0:
                break
            if total_mapping_ds is None and len(total_mapping) == 0:
                total_mapping_ds = m_ds
            else:
                if total_mapping_ds is None:
                    total_mapping_ds = _mapping_df_to_ds(total_mapping)
                total_mapping_ds = cz.compose_mappings_ds(
                    total_mapping_ds, m_ds, num_partitions=num_partitions
                ).materialize()
            remapped = cz.remap_triples_joined(
                engine.dataset(), m_ds, flag_col="__changed",
                num_partitions=num_partitions,
            ).materialize()
        else:
            total_mapping = compose_mappings(total_mapping, m_df)
            remapped = remap_triples(
                engine.dataset(), m_df, flag_col="__changed"
            ).materialize()

        def _side(val):
            def f(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return t.filter(pc.equal(t["__changed"], val)).drop_columns(
                    ["__changed"]
                )

            return f

        unchanged_ds = remapped.map_batches(_side(False), batch_format="pyarrow")
        changed_ds = remapped.map_batches(_side(True), batch_format="pyarrow")
        gen += 1
    metrics["stages"]["fixpoint"] = time.time() - t0
    metrics["generations"] = gen + 1
    metrics["rounds"] = engine.manifest()["rounds"]
    metrics["merged_entities"] = int(
        total_mapping_ds.count() if total_mapping_ds is not None
        else len(total_mapping)
    )

    # ---- stage 5: materialize sorted, dictionary-encoded store
    # (first consumer of the terms checkpoint — join the overlapped stage)
    terms_thread.join()
    if terms_exc:
        raise terms_exc[0]
    t0 = time.time()
    out_dir = os.path.join(workdir, "graph")
    final_triples = engine.dataset()
    term_files = sorted(glob.glob(os.path.join(terms_dir, "*.parquet")))
    # terms minted during deduction (skolem blanks, expression literals)
    # live in per-generation deltas — merge them into the dictionary
    for g in range(gen + 1):
        eng_g = FixpointEngine(
            system, os.path.join(workdir, f"gen{g}"),
            buckets=buckets, num_partitions=num_partitions,
        )
        term_files.extend(eng_g.term_delta_files())
    terms_ds = joins.distinct(rd.read_parquet(term_files), ["term_id"])
    if total_mapping_ds is not None:
        terms_ds = cz.remap_terms_joined(
            terms_ds, total_mapping_ds, num_partitions=num_partitions
        )
    else:
        terms_ds = remap_terms(terms_ds, total_mapping)
    if not _stage_done(out_dir):
        materialize_graph(final_triples, terms_ds, out_dir)
        _mark_done(out_dir)
    metrics["stages"]["materialize"] = time.time() - t0

    metrics["triples"] = engine.count()
    metrics["seconds"] = time.time() - t_all
    metrics["workdir"] = workdir
    metrics["graph_dir"] = out_dir
    with open(os.path.join(workdir, "METRICS.json"), "w") as f:
        json.dump(metrics, f, indent=1, default=str)
    return metrics


def _premerge_eq_pairs(stated_mat, system: R.System, *, num_partitions: int):
    """Eq pairs from Eq-concluding rules evaluated over the stated triples
    only (no Call-expression Eq terms — those wait for the generation loop,
    which resolves literals). Returns a MATERIALIZED (a, b) Dataset (or
    None): the caller's gate (:func:`_gated_mapping`) decides whether the
    union-find runs on the driver or as distributed label propagation, so
    the pair set is executed exactly once here and consumed cheaply."""
    from raydf.deduce import make_eqs_fn
    from raydf.match import DatasetSource, rule_bindings
    from raydf.rules import ConstTerm, Var

    src = DatasetSource(stated_mat)
    parts = []
    for idx, rule in enumerate(system.rules):
        eq_stmts = [s for s in rule.conclusion.statements if s.kind == "eq" and s.sign]
        if not eq_stmts:
            continue
        if not all(
            isinstance(t, (Var, ConstTerm)) for s in eq_stmts for t in s.eq
        ):
            continue
        b = rule_bindings(rule, src, num_partitions=num_partitions)
        if b is None or b.count() == 0:
            continue
        parts.append(b.map_batches(make_eqs_fn(rule, idx, 0), batch_format="pandas"))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.select_columns(["a", "b"]).materialize()


def R_const_terms_table(system: R.System) -> pa.Table:
    from raydf.terms import terms_table

    consts = [(c.kind, c.lexical, c.datatype) for c in system.const_terms()]
    seen = sorted(set(consts))
    return terms_table(seen)
