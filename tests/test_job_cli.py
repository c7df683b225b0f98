"""The `python -m raydf.job` cluster entrypoint: fresh run emits one JSON
metrics line; resubmitting the same job resumes from checkpoints (the
ray-job-submit contract the module docstring promises)."""

import json
import os
import subprocess
import sys


def _run_job(input_dir, workdir):
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.run(
        [sys.executable, "-m", "raydf.job", "--input", input_dir,
         "--workdir", workdir, "--buckets", "4", "--num-partitions", "4"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_job_cli_runs_and_resumes(tmp_path, ray_session):
    import ray

    from raydf.fixtures import write_source_code

    input_dir = str(tmp_path / "src")
    write_source_code(input_dir, 300)
    workdir = str(tmp_path / "job")

    out = _run_job(input_dir, workdir)
    assert out["triples"] > 0 and out["generations"] >= 1
    assert os.path.isdir(out["graph_dir"])
    assert set(out["stages"]) == {"extract", "terms", "fixpoint", "materialize"}

    # resubmit: must resume from the completed checkpoints (identical
    # output, near-zero recompute — every stage short-circuits)
    again = _run_job(input_dir, workdir)
    assert again["triples"] == out["triples"]
    assert again["stages"]["extract"] <= 1.0  # _DONE marker short-circuit
