#!/usr/bin/env python
"""Benchmark driver for the raydf engine.

Default mode: runs the headline KG-construction pipeline
(extract → deduce-to-fixpoint → canonicalize → materialize, BASELINE.json
north_star) plus the per-operator query suite over ``$GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32), and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, "triples": N, "triples_per_sec": N}

``--scaling`` runs the headline pipeline twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs plus scaling efficiency (BASELINE.json north_rule's two-
cluster-size criterion, evidenced via two parallelism levels in this
single-node sandbox).

``--headline-only`` (internal, used by --scaling subprocesses) skips the
query suite.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time


def _sf_tag(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return base


def run_headline(sf_dir: str, workdir: str, num_cpus: int = 32) -> dict:
    """Full flagship pipeline; returns {seconds, triples, triples_per_sec}.

    ``$GRAFT_SRC_DIR`` (set by --scaling) points at a pre-generated
    source_code-shaped Parquet table; otherwise the input is derived from
    the sf_dir documents table."""
    import __ray_entry__ as e
    from raydf.pipeline import kg_pipeline

    if os.path.exists(workdir):
        shutil.rmtree(workdir)
    src_dir = os.environ.get("GRAFT_SRC_DIR")
    if src_dir:
        import ray.data as rd

        src = rd.read_parquet(src_dir)
    else:
        src = e._source_code_from_documents(sf_dir)
    t0 = time.time()
    metrics = kg_pipeline(
        src,
        workdir,
        # buckets caps the anti-join groupby parallelism but also multiplies
        # checkpoint file count (A/B at 200k files, 32 CPUs: buckets=16
        # fixpoint 82s, buckets=64 101s — small files dominate); 32 balances
        buckets=32,
        # A/B at 1M files, 32 CPUs: num_partitions 16 → 148 s end-to-end,
        # 32 → 269 s (Ray join/shuffle fixed cost per partition dominates)
        num_partitions=16,
        max_rounds=10,
        max_generations=2,
        mention_concurrency=num_cpus,
    )
    dt = time.time() - t0
    triples = int(metrics["triples"])
    return {
        "seconds": dt,
        "triples": triples,
        "triples_per_sec": triples / dt if dt > 0 else 0.0,
        "stages": {k: round(v, 3) for k, v in metrics["stages"].items()},
    }


_BENCH_QUERIES = [
    # representative per-operator-family subset of __ray_entry__.queries()
    "q1_pricing_summary",
    "q_top_orders",
    "q_revenue_by_nation",
    "q_window_tumbling",
    "kg_extract_structural",
    "kg_transitive_contains",
    "kg_eq_canonicalize",
    "dedup_exact_docs",
    "minhash_dedup_docs",
    "ann_topk",
    "lang_id_docs",
    "text_token_count",
    # round-2 operator families
    "q_asof_purchase_click",
    "q_topk_orders_per_priority",
    "q_approx_quantile_order_price",
    "pack_chunks",
    "top_terms",
    "repetition_scores",
    "stratified_sample_docs",
    "decontaminate_docs",
    # round-3 operator families
    "dup_span_stats",
    "scrub_dup_spans",
    "kmeans_clusters",
    "semdedup_docs",
    "pagerank_trade_graph",
    "components_trade_graph",
    "cms_token_counts",
    "tfidf_top_terms",
    "pq_codes",
    "bloom_user_filter",
    "q_events_customers_outer",
    # round-5 families
    "lm_score_docs",
    # round-5 media families (vendored real-container codecs)
    "multimodal_jpeg_featurize",
    "multimodal_wav_featurize",
    "multimodal_video_frames",
]


def _consume(result) -> int:
    """Force execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    return result.count()  # ray.data.Dataset — triggers full execution


def run_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as e

    qs = e.queries()
    out: dict[str, float] = {}
    for name in _BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        _consume(fn(sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def single_run(sf_dir: str, num_cpus: int, headline_only: bool) -> dict:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            log_to_driver=False,
        )
    # Known-benign Ray 2.49 noise, demoted so the bench tail stays
    # readable: a sort-based exchange whose sampled boundaries leave a
    # reduce range EMPTY emits a zero-column block with no schema
    # (ray/data/_internal/arrow_block.py:409 merge_sorted_blocks →
    # _empty_table() = from_pydict({})), and streaming_executor_state
    # then warns "RefBundle with a different schema ... new schema: ."
    # on that operator's output. Unavoidable from user code when a
    # groupby key has few distinct values (boundary samples collide) —
    # e.g. the 16-way partition id of partitioned_group_map — and
    # harmless: empty arrow blocks carry no rows to mistype. Scoped to
    # this one logger; everything else still surfaces. ray.data must be
    # imported FIRST: its import runs logging.config.dictConfig
    # (ray/data/__init__.py:79 configure_logging), which would reset a
    # level set before it.
    import ray.data  # noqa: F401  (triggers configure_logging)

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)
    workdir = f"/tmp/raydf_bench/headline_cpus{num_cpus}"
    head = run_headline(sf_dir, workdir, num_cpus)
    queries = {} if headline_only else run_queries(sf_dir)
    ray.shutdown()
    total = head["seconds"] + sum(queries.values())
    return {
        "metric": (
            "triples/sec end-to-end (extract→deduce→canonicalize→materialize)"
        ),
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"headline_kg_pipeline": round(head["seconds"], 3), **queries},
        "sf": _sf_tag(sf_dir),
        "num_cpus": num_cpus,
        "triples": head["triples"],
        "triples_per_sec": round(head["triples_per_sec"], 1),
        "stages": head["stages"],
    }


def scaling_run(sf_dir: str, low: int, high: int, scale_files: int) -> dict:
    """Same headline job at two parallelism levels, fresh process each.

    The input is the deterministic synthetic source_code table at
    ``scale_files`` rows (generated once, cached): the sf0.1-derived input
    (5k docs) is pure fixed overhead at 32 CPUs, which measures Ray's job
    launch cost rather than pipeline scalability. BASELINE.md documents the
    protocol."""
    import ray

    src_dir = f"/tmp/raydf_bench/src_{scale_files}"
    if not os.path.exists(os.path.join(src_dir, "_DONE")):
        from raydf.fixtures import write_source_code

        if not ray.is_initialized():
            ray.init(
                address="local", num_cpus=high,
                include_dashboard=False, log_to_driver=False,
            )
        write_source_code(src_dir, scale_files)
        ray.shutdown()

    results = {}
    for cpus in (low, high):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(cpus),
            GRAFT_SF_DIR=sf_dir,
            GRAFT_SRC_DIR=src_dir,
        )
        # Pin the whole process tree to `cpus` cores: ray.init(num_cpus=N)
        # only caps task-scheduling slots, while pyarrow kernel/IO threads,
        # parquet codecs and the object store still use every physical core
        # — an un-pinned "8-CPU" run borrows the other 24 and fakes the
        # small-cluster baseline. taskset is the honest N-node stand-in.
        pin = []
        if shutil.which("taskset") and cpus <= (os.cpu_count() or cpus):
            pin = ["taskset", "-c", f"0-{cpus - 1}"]
        elif cpus > (os.cpu_count() or 0):
            print(
                f"warning: {cpus} CPUs requested > {os.cpu_count()} physical; "
                "running unpinned",
                file=sys.stderr,
            )
        proc = subprocess.run(
            pin + [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        try:
            line = proc.stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(line)
        except (IndexError, json.JSONDecodeError):
            raise RuntimeError(
                f"scaling subprocess (cpus={cpus}) produced no JSON; "
                f"stderr tail:\n{proc.stderr[-2000:]}"
            )
    tl, th = results[low], results[high]
    # efficiency = (throughput_high / throughput_low) / (high/low)
    speedup = tl["queries"]["headline_kg_pipeline"] / th["queries"][
        "headline_kg_pipeline"
    ]
    eff = speedup / (high / low)
    return {
        "metric": "scaling efficiency, headline pipeline, "
        f"num_cpus {low} → {high} (N vs 4N stand-in)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            f"headline_cpus{low}": tl["queries"]["headline_kg_pipeline"],
            f"headline_cpus{high}": th["queries"]["headline_kg_pipeline"],
        },
        "sf": f"synthetic-{scale_files}-files",
        "num_cpus": high,
        "throughput_low_tps": tl["triples_per_sec"],
        "throughput_high_tps": th["triples_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "stages_low": tl.get("stages", {}),
        "stages_high": th.get("stages", {}),
    }


def main() -> None:
    # Part of the measured protocol (BASELINE.md): let the 126 GB tmpfs
    # object store absorb shuffle spill instead of the ~93 GB disk — the
    # 12M-file terms sort exceeds the disk envelope at the default 0.3.
    # setdefault: an explicit caller/driver setting always wins; must be
    # set before ray.init (and is inherited by --scaling subprocesses).
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    # Amdahl at 200k files: ~78s of fixed (non-parallelizing) time vs ~790
    # CPU-seconds of scalable work → efficiency caps at ~0.43. The fixed
    # part is size-independent, so the honest scaling evidence needs a
    # compute-dominated input: 1M files puts efficiency in the target band.
    ap.add_argument("--scale-files", type=int, default=1_000_000)
    args = ap.parse_args()

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if args.scaling:
        out = scaling_run(args.sf_dir, args.low, args.high, args.scale_files)
    else:
        out = single_run(args.sf_dir, num_cpus, args.headline_only)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
