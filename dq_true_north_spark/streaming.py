"""Structured Streaming variant of the quality-filter pipeline.

The reference is strictly daily batch (SURVEY.md §2.4: no streams; lateness
is a data-quality verdict, not a watermark), and the north_rule pipeline is
resumable batch. This module is the forward-looking continuous-ingestion
surface: the SAME verdict computation (textquality.pipeline.compute_verdicts)
applied to a file-source stream of page parquet drops via foreachBatch.

Design notes:
  - foreachBatch, not a streaming-native plan: compute_verdicts contains a
    window over md5(text) (exact dedup), which streaming cannot express
    globally anyway — per-micro-batch dedup + the downstream batch dedup
    rule is the correct layering for a crawl feed;
  - checkpointLocation gives exactly-once sink appends across restarts —
    the streaming analog of lineage.py's manifest;
  - maxFilesPerTrigger bounds micro-batch size so executor memory sizing
    (AQE advisory) holds no matter how many files land at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import PAGES_SCHEMA
from .textquality.pipeline import compute_verdicts


def stream_verdicts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
):
    """File-source stream of page parquet → verdict parquet appends.

    Returns the StreamingQuery; caller awaits termination or stops it.
    """
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = compute_verdicts(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        )
        out.write.mode("append").parquet(output_dir)

    return (
        pages.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
