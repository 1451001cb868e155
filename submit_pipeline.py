#!/usr/bin/env python
"""spark-submit entry point for the corpus quality-filter pipeline.

Cluster usage (north_rule: "run via spark-submit --py-files on a
multi-executor cluster"):

    zip -r dq_true_north_spark.zip dq_true_north_spark/
    spark-submit \
        --py-files dq_true_north_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        submit_pipeline.py \
        --input  <iceberg-or-parquet pages table> \
        --output <result base path> \
        --run-id <stable id for resume> \
        [--partitions 4096]

Re-running with the same --run-id resumes from the last committed stage
(manifest-gated; see dq_true_north_spark/lineage.py). Sandbox smoke:

    python submit_pipeline.py --generate 10000 --output /tmp/dq_out --run-id r1
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (parquet/iceberg)")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic pages instead of reading --input")
    ap.add_argument("--output", required=True, help="result base path")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--partitions", type=int, default=0,
                    help="explicit url hash partitions (0 = 4x parallelism)")
    ap.add_argument("--dedup-strategy", default="auto",
                    choices=("auto", "broadcast", "shuffle"),
                    help="exact-dedup plan; force 'shuffle' when the input "
                         "cannot guarantee unique (url, warc_ts) rows")
    args = ap.parse_args()

    # under spark-submit the session comes from the launcher's conf;
    # getOrCreate picks it up, while standalone runs get local defaults
    from dq_true_north_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark(app_name="dq-pipeline")

    from dq_true_north_spark.corpus import pages_df
    from dq_true_north_spark.lineage import run_quality_pipeline
    from dq_true_north_spark.partitioning import repartition_by_url

    if args.generate:
        pages = pages_df(spark, args.generate)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        print("one of --input / --generate is required", file=sys.stderr)
        sys.exit(2)

    n_part = args.partitions or spark.sparkContext.defaultParallelism * 4
    pages = repartition_by_url(pages, n_part)

    out = run_quality_pipeline(spark, pages, args.output, args.run_id,
                               dedup_strategy=args.dedup_strategy)
    summary = out["summary"].first().asDict()
    kept, total = summary["kept_docs"], summary["total_docs"]
    print(f"run_id={args.run_id} docs={total} kept={kept} "
          f"keep_rate={kept / max(total, 1):.4f}")
    print(f"verdicts: {args.output}/verdicts/{args.run_id}")
    print(f"lineage:  {args.output}/lineage/{args.run_id}")


if __name__ == "__main__":
    main()
