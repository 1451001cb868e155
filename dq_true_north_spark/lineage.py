"""Run manifest + per-partition lineage + resume.

north_rule: "Every stage writes per-partition lineage rows (partition id,
rule hit counts, drop reasons, checkpoint offsets) to a metrics table so
runs resume from the last committed snapshot."

Without real Iceberg in the sandbox, the same commit discipline is built
from primitives (SURVEY.md §7 hard-point 5):
  - stage output is written to `<table>/<run_id>.tmp`, atomically renamed to
    `<table>/<run_id>` (commit-then-visible);
  - the manifest JSON (one per run_id, atomic os.replace) is the source of
    truth: a stage counts as done only if BOTH the manifest entry and the
    renamed directory exist;
  - resume == re-invoke with the same run_id: committed stages are read
    back, uncommitted stages recompute. Deterministic inputs (corpus.py) +
    deterministic plans => resume output is byte-equal to a fresh run
    (tested in tests/test_resume.py).

The reference has NO resume story — append-only writes double-log on re-run
(dq_rules_library.py:44; SURVEY.md §4 "idempotence / resume") — this is a
deliberate rebuild upgrade required by the north rule.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import constants as C


class RunManifest:
    def __init__(self, base_path: str, run_id: str):
        self.base_path = base_path
        self.run_id = run_id
        self.path = os.path.join(base_path, f"manifest_{run_id}.json")
        os.makedirs(base_path, exist_ok=True)
        self._data = self._load()

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {"run_id": self.run_id, "stages": {}}

    def committed(self, stage: str) -> bool:
        entry = self._data["stages"].get(stage)
        return bool(entry) and os.path.isdir(entry["output"])

    def output_path(self, stage: str) -> str:
        return self._data["stages"][stage]["output"]

    def commit(self, stage: str, output: str, rows: int) -> None:
        self._data["stages"][stage] = {
            "output": output,
            "rows": rows,
            "committed_at": time.time(),
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=2)
        os.replace(tmp, self.path)  # atomic manifest commit


class PipelineRunner:
    """Stage-by-stage executor with manifest-gated skipping."""

    def __init__(self, spark: SparkSession, base_path: str, run_id: str):
        self.spark = spark
        self.manifest = RunManifest(base_path, run_id)
        self.base_path = base_path
        self.run_id = run_id
        self.recomputed: list[str] = []   # instrumentation for tests

    def stage(self, name: str, build) -> DataFrame:
        """build: () -> DataFrame. Runs the stage unless already committed."""
        final = os.path.join(self.base_path, name, self.run_id)
        if self.manifest.committed(name):
            return self.spark.read.parquet(self.manifest.output_path(name))
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)          # torn previous attempt — discard
        df = build()
        df.write.mode("overwrite").parquet(tmp)
        rows = self.spark.read.parquet(tmp).count()
        os.makedirs(os.path.dirname(final), exist_ok=True)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)           # commit-then-visible
        self.manifest.commit(name, final, rows)
        self.recomputed.append(name)
        return self.spark.read.parquet(final)


def lineage_of(verdicts: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Per-partition lineage rows: partition id, docs in/out, per-rule hit
    counts, max checkpoint offset (the partition's high-water mark)."""
    with_pid = verdicts.withColumn("partition_id", F.spark_partition_id())
    aggs = [
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.col("keep").cast("int")).alias("docs_out"),
        F.max(F.xxhash64("url")).alias("checkpoint_offset"),
    ]
    for r in C.DROP_REASON_ORDER:
        aggs.append(
            F.sum(F.element_at(F.col("rule_hits"), r)).alias(f"hits_{r}")
        )
    return (
        with_pid.groupBy("partition_id")
        .agg(*aggs)
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "*",
        )
    )


def run_quality_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    base_path: str,
    run_id: str,
    dedup_strategy: str = "auto",
) -> dict[str, DataFrame]:
    """Full resumable run: verdicts -> lineage -> summary.

    dedup_strategy passes through to compute_verdicts; force 'shuffle' for
    inputs that cannot guarantee unique (url, warc_ts) rows — the broadcast
    path's precondition (textquality/pipeline.py)."""
    from .textquality.pipeline import compute_verdicts, verdict_summary

    runner = PipelineRunner(spark, base_path, run_id)
    verdicts = runner.stage(
        "verdicts", lambda: compute_verdicts(pages, dedup_strategy=dedup_strategy)
    )
    lineage = runner.stage(
        "lineage", lambda: lineage_of(verdicts, run_id, "verdicts")
    )
    summary = runner.stage(
        "summary", lambda: verdict_summary(verdicts)
    )
    return {
        "verdicts": verdicts,
        "lineage": lineage,
        "summary": summary,
        "_runner": runner,
    }
