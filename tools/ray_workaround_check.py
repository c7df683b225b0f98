#!/usr/bin/env python
"""Re-test the Ray-version workarounds the engine encodes (VERDICT r02 #8).

Each check is a minimal repro of an upstream behavior we work around; run
this after ANY Ray upgrade and record the dated verdict in BASELINE.md.
If a check prints FIXED, the corresponding mitigation is pure
pessimization on that Ray version and should be removed:

  * empty-side      — native Dataset.join with a zero-block side crashes
                      (mitigation: limit(1) nonemptiness probes,
                      match.py find_bindings._empty)
  * chained-join    — a native join's empty hash partitions emit
                      schema-less blocks that crash a downstream native
                      join (mitigation: joins.partitioned_lookup_join for
                      small chained joins). NOTE: the field failure is
                      INTERMITTENT; this micro-check passing once does
                      not clear the mitigation — treat FIXED here as
                      "not reproduced", not "safe".
  * rename-schema   — Dataset.rename_columns reported the PRE-rename name
                      via schema() while blocks carried the renamed column
                      (observed 2026-08-18 inside relops.anti_join_keys
                      over a canonical_mapping_distributed_ds output;
                      mitigation: explicit arrow-map renames,
                      dedup.minhash_dedup dropped_ds). The isolated
                      repro below does NOT trip on Ray 2.49.2 — the
                      failure is plan-shape-dependent; same caveat as
                      chained-join.
  * join-partition-overhead — per-partition fixed cost of the native hash
                      join regresses past ~16 partitions (mitigation:
                      match._join_partitions hard 16 cap). This one is a
                      TIMING check: it reports the measured ratio rather
                      than pass/fail; re-evaluate the cap if the ratio
                      approaches 1.

Runs its own small Ray session (2 GB object store, 4 CPUs) so it can't
disturb concurrent jobs. Usage: python tools/ray_workaround_check.py
"""

from __future__ import annotations

import time
import traceback

import numpy as np
import pandas as pd


def check_empty_side_join(rd):
    left = rd.from_pandas(pd.DataFrame({"k": np.arange(100, dtype=np.int64)}))
    right = rd.from_pandas(
        pd.DataFrame({"k": np.array([], np.int64), "v": np.array([], np.int64)})
    ).filter(lambda r: False)
    try:
        n = left.join(right, join_type="inner", on=("k",), num_partitions=4).count()
        return f"FIXED (join with empty side returned {n} rows)"
    except Exception as e:
        return f"STILL-NEEDED ({type(e).__name__}: {str(e)[:120]})"


def check_chained_join(rd):
    # tiny sides: most hash partitions empty after the first join
    a = rd.from_pandas(pd.DataFrame({"k": np.arange(3, dtype=np.int64)}))
    b = rd.from_pandas(
        pd.DataFrame({"k": np.arange(3, dtype=np.int64), "v": np.arange(3, dtype=np.int64)})
    )
    c = rd.from_pandas(
        pd.DataFrame({"k": np.arange(3, dtype=np.int64), "w": np.arange(3, dtype=np.int64)})
    )
    try:
        j = a.join(b, join_type="inner", on=("k",), num_partitions=16)
        n = j.join(c, join_type="inner", on=("k",), num_partitions=16).count()
        return f"FIXED (chained join returned {n} rows)"
    except Exception as e:
        return f"STILL-NEEDED ({type(e).__name__}: {str(e)[:120]})"


def check_rename_schema(rd):
    # reproduce the observed shape: a groupby.map_groups output →
    # select_columns → rename_columns → a downstream helper that reads
    # schema() and then consumes blocks (the 2026-08-18 failure had
    # schema() report the PRE-rename name while blocks carried the new one)
    import pyarrow as pa

    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array([0, 0, 1], pa.int64()),
                "node": pa.array([1, 2, 3], pa.int64()),
            }
        )
    )
    grouped = ds.groupby("g").map_groups(
        lambda t: t.select(["node"]), batch_format="pyarrow"
    )
    renamed = (
        grouped.select_columns(["node"])
        .rename_columns({"node": "doc_id"})
        .select_columns(["doc_id"])  # post-rename projection — part of the
        # observed failing plan (anti_join_keys selects the join keys)
    )
    names = list(renamed.schema().base_schema.names)
    got = renamed.take_batch(3)
    block_names = list(got.keys()) if isinstance(got, dict) else list(got.column_names)
    if names == block_names == ["doc_id"]:
        return "FIXED (schema and blocks agree on the renamed column)"
    return f"STILL-NEEDED (schema()={names} vs blocks={block_names})"


def check_join_partition_overhead(rd):
    n = 500_000
    left = rd.from_pandas(
        pd.DataFrame(
            {"k": np.random.RandomState(0).randint(0, n, n), "a": np.arange(n)}
        )
    ).materialize()
    right = rd.from_pandas(
        pd.DataFrame(
            {"k": np.random.RandomState(1).randint(0, n, n), "b": np.arange(n)}
        )
    ).materialize()
    out = {}
    for p in (4, 16, 32):  # 64 aggregators reserve the whole 8-CPU budget -> deadlock
        t0 = time.time()
        left.join(right, join_type="inner", on=("k",), num_partitions=p).count()
        out[p] = round(time.time() - t0, 2)
    ratio = out[32] / out[16] if out[16] else float("inf")
    verdict = "STILL-NEEDED" if ratio > 1.3 else "RE-EVALUATE-CAP"
    return f"{verdict} (join secs by partitions {out}; 32/16 ratio {ratio:.2f})"


CHECKS = {
    "empty-side": check_empty_side_join,
    "chained-join": check_chained_join,
    "rename-schema": check_rename_schema,
    "join-partition-overhead": check_join_partition_overhead,
}


def _run_one(name: str) -> None:
    import ray
    import ray.data as rd

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        object_store_memory=2 * 1024**3,
        log_to_driver=False,
    )
    try:
        print(f"{name:26s} {CHECKS[name](rd)}")
    except Exception:
        print(f"{name:26s} CHECK-ERROR:\n{traceback.format_exc()}")
    ray.shutdown()


def main() -> None:
    # Each check runs in a FRESH subprocess + Ray session with a hard
    # timeout: a reproducing bug (e.g. the join-aggregator CPU-reservation
    # deadlock) must report STILL-NEEDED, not hang the whole tool.
    import subprocess
    import sys

    import ray

    if len(sys.argv) > 1:
        _run_one(sys.argv[1])
        return
    print(f"ray {ray.__version__}")
    for name in CHECKS:
        try:
            p = subprocess.run(
                [sys.executable, __file__, name],
                capture_output=True, text=True, timeout=300,
            )
            out = p.stdout.strip() or p.stderr.strip()[-300:]
            print(out)
        except subprocess.TimeoutExpired:
            print(f"{name:26s} STILL-NEEDED (check timed out after 300 s — hang/deadlock)")


if __name__ == "__main__":
    main()
