#!/usr/bin/env python
"""Dump .explain('formatted') for bench queries into plans/r06/<q>_<tag>.txt.

Usage: python tools/dump_plans_r06.py before|after [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dq_true_north_spark.session import get_spark  # noqa: E402

QUERIES = (
    "doc_verdicts",
    "doc_metrics",
    "spike_dip_events",
    "sigma_bands_events",
    "historical_completeness_events",
    "cosine_topk_embeddings",
    "minhash_pairs_pages",
    "scrub_documents",
    "sigma_warning_zone_events",
    "segment_filter_events",
    "embedding_near_dup_pairs",
    "pages_pipeline_verdicts",
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="dq-plans", master=f"local[{cpus}]",
        shuffle_partitions=str(max(int(cpus), 8)),
        extra_conf={"spark.local.dir": "/dev/shm/spark-bench"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dq_true_north_spark import queries as Q

    reg = Q.registry()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = reg[name]["spark"](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
