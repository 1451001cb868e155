"""Smoke test for the spark-submit entry point (north_rule: 'run via
spark-submit --py-files') — the CLI surface itself, as a subprocess, the
way a cluster launcher would invoke it."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_submit_pipeline_cli_smoke_and_resume(tmp_path):
    out_dir = str(tmp_path / "out")

    def run():
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "submit_pipeline.py"),
             "--generate", "1000", "--output", out_dir, "--run-id", "smoke1",
             "--partitions", "8"],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "SPARK_GRAFT_CPUS": "8"}, cwd=REPO,
        )

    first = run()
    assert first.returncode == 0, first.stderr[-2000:]
    assert "run_id=smoke1 docs=1000" in first.stdout
    assert os.path.isdir(f"{out_dir}/verdicts/smoke1")
    assert os.path.isdir(f"{out_dir}/lineage/smoke1")

    # second invocation with the same run-id must resume (manifest-gated),
    # not recompute — and report identical counts
    second = run()
    assert second.returncode == 0, second.stderr[-2000:]
    line1 = [l for l in first.stdout.splitlines() if l.startswith("run_id=")]
    line2 = [l for l in second.stdout.splitlines() if l.startswith("run_id=")]
    assert line1 == line2
