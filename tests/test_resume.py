"""Resume semantics: manifest-gated stage skipping, resume == fresh output."""

from __future__ import annotations

import os

from dq_true_north_spark.corpus import pages_df
from dq_true_north_spark.lineage import PipelineRunner, run_quality_pipeline
from dq_true_north_spark.textquality.pipeline import compute_verdicts

N = 600


def _verdict_key(rows):
    return {
        (r["url"], r["warc_ts"]): (r["keep"], tuple(r["drop_reasons"]), r["scrubbed_text"])
        for r in rows
    }


def test_fresh_run_writes_all_stages(spark, tmp_path):
    out = run_quality_pipeline(spark, pages_df(spark, N, 4), str(tmp_path), "run1")
    assert out["_runner"].recomputed == ["verdicts", "lineage", "summary"]
    assert out["verdicts"].count() == N
    lin = out["lineage"].collect()
    assert sum(r["docs_in"] for r in lin) == N
    assert all(r["run_id"] == "run1" for r in lin)
    # lineage hit counts reconcile with the summary rollup
    summ = out["summary"].first()
    assert sum(r["hits_too_short"] for r in lin) == summ["too_short_count"]
    assert sum(r["docs_out"] for r in lin) == summ["kept_docs"]


def test_resume_skips_committed_stages(spark, tmp_path):
    base = str(tmp_path)
    run_quality_pipeline(spark, pages_df(spark, N, 4), base, "run2")
    out2 = run_quality_pipeline(spark, pages_df(spark, N, 4), base, "run2")
    assert out2["_runner"].recomputed == []  # everything manifest-gated


def test_kill_after_stage_k_then_resume_equals_fresh(spark, tmp_path):
    base_a = str(tmp_path / "killed")
    base_b = str(tmp_path / "fresh")
    pages = pages_df(spark, N, 4)

    # simulate a run killed after stage 1: only the verdicts stage commits
    runner = PipelineRunner(spark, base_a, "runk")
    runner.stage("verdicts", lambda: compute_verdicts(pages))
    # resume the full pipeline with the same run_id
    resumed = run_quality_pipeline(spark, pages, base_a, "runk")
    assert resumed["_runner"].recomputed == ["lineage", "summary"]

    fresh = run_quality_pipeline(spark, pages, base_b, "runf")
    assert _verdict_key(resumed["verdicts"].collect()) == _verdict_key(
        fresh["verdicts"].collect()
    )
    assert resumed["summary"].collect() == fresh["summary"].collect()


def test_torn_tmp_dir_is_discarded(spark, tmp_path):
    base = str(tmp_path)
    torn = os.path.join(base, "verdicts", "runt.tmp")
    os.makedirs(torn)
    with open(os.path.join(torn, "garbage"), "w") as f:
        f.write("partial write from a killed executor")
    out = run_quality_pipeline(spark, pages_df(spark, N, 4), base, "runt")
    assert out["verdicts"].count() == N
    assert not os.path.isdir(torn)
