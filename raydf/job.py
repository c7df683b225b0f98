"""``ray job submit`` entrypoint for the flagship KG-construction pipeline.

On a real cluster (north_star: fixed N-node and 4N-node clusters):

    ray job submit --working-dir . -- \
        python -m raydf.job --input s3://bucket/source_code \
                            --workdir s3://bucket/kg_run1

In this sandbox (single node):

    python -m raydf.job --input /tmp/raydf_bench/src_200000 \
                        --workdir /tmp/kg_job

The workdir holds every stage checkpoint; resubmitting the SAME job after
a failure resumes from the last completed stage / fixpoint round (the
pipeline's per-stage ``_DONE`` markers and per-round MANIFEST.json).
Prints one JSON metrics line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m raydf.job")
    ap.add_argument("--input", required=True,
                    help="Parquet dir of (repo, path, commit, lang, content) rows")
    ap.add_argument("--workdir", required=True,
                    help="checkpoint + output dir (resumable)")
    ap.add_argument("--rules", default=None,
                    help="JSON rule-system file (default: built-in KG rules)")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--num-partitions", type=int, default=16)
    ap.add_argument("--max-rounds", type=int, default=12)
    ap.add_argument("--max-generations", type=int, default=3)
    ap.add_argument("--no-entity-linking", action="store_true")
    ap.add_argument("--mention-concurrency", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    # Under `ray job submit` the driver connects to the cluster via the
    # RAY_ADDRESS the job runtime sets; standalone invocation starts a
    # local session. Plain ray.init honors both.
    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True)

    import ray.data as rd

    from raydf.pipeline import kg_pipeline
    from raydf.rules import load_system

    system = load_system(args.rules) if args.rules else None
    src = rd.read_parquet(args.input)
    metrics = kg_pipeline(
        src,
        args.workdir,
        system=system,
        link_entities=not args.no_entity_linking,
        buckets=args.buckets,
        num_partitions=args.num_partitions,
        max_rounds=args.max_rounds,
        max_generations=args.max_generations,
        mention_concurrency=args.mention_concurrency,
    )
    out = {
        "triples": metrics["triples"],
        "seconds": round(metrics["seconds"], 3),
        "triples_per_sec": round(metrics["triples"] / max(metrics["seconds"], 1e-9), 1),
        "generations": metrics["generations"],
        "merged_entities": metrics["merged_entities"],
        "graph_dir": metrics["graph_dir"],
        "stages": {k: round(v, 2) for k, v in metrics["stages"].items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
