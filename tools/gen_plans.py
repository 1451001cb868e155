#!/usr/bin/env python
"""Regenerate PLANS.md: capture formatted physical plans for the headline
operators with commentary on pushdown/codegen/shuffle shape."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dq_true_north_spark import queries as Q  # noqa: E402
from dq_true_north_spark.corpus import pages_df  # noqa: E402
from dq_true_north_spark.session import get_spark  # noqa: E402
from dq_true_north_spark.textquality.dedup import minhash_candidate_pairs  # noqa: E402
from dq_true_north_spark.textquality.pipeline import compute_verdicts  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"

HDR = """# PLANS — physical-plan evidence for the headline operators

Captured from `.explain("formatted")` on Spark 4.1 with AQE enabled.
What to look for in each plan: filters/column pruning reaching the parquet
scan (`ReadSchema`, `PushedFilters`), WholeStageCodegen spans covering the
expression work, ONE exchange per semantic shuffle, Arrow (`ArrowEvalPython`)
only where a model genuinely needs Python, and broadcast joins for small
sides. Regenerate with `python tools/gen_plans.py`.
"""


def main() -> None:
    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    sections = []

    def cap(title, df, notes):
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        tree_end = s.find("\n\n(1) ")
        tree = s[:tree_end] if tree_end > 0 else s[:2500]
        scans = "\n".join(
            l.strip()
            for l in s.splitlines()
            if "ReadSchema" in l or "PushedFilters" in l
        )[:1500]
        sections.append(
            f"## {title}\n\n{notes}\n\n```\n{tree.strip()}\n```\n"
            + (f"\nScan details:\n```\n{scans}\n```\n" if scans else "")
        )

    for t in ("documents", "events", "embeddings"):
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)

    cap(
        "Flagship corpus pipeline (compute_verdicts)",
        compute_verdicts(pages_df(spark, 1000, 4)),
        "One scan -> wide codegen projection (all heuristic flags, common-"
        "subexpression-eliminated) -> ONE ArrowEvalPython (fused langid+"
        "perplexity) -> single Exchange on text_hash for the dedup window -> "
        "codegen verdict assembly + regexp scrub. No other shuffle, no Python "
        "outside the one Arrow stage.",
    )
    cap(
        "doc_verdicts (SQL-oracle flagship)",
        reg["doc_verdicts"]["spark"](spark, SF),
        "Parquet scan reads ONLY (doc_id, lang, text) — column pruning "
        "reaches the scan; flags computed map-side before the dedup-window "
        "exchange.",
    )
    cap(
        "cosine_topk_embeddings",
        reg["cosine_topk_embeddings"]["spark"](spark, SF),
        "Probe set is BROADCAST (BroadcastNestedLoopJoin over a ~5-row build "
        "side); corpus scanned once; dot products are JVM higher-order "
        "functions inside codegen; per-query top-k via ranking window.",
    )
    cap(
        "sigma_bands_events",
        reg["sigma_bands_events"]["spark"](spark, SF),
        "Partial hash aggregate before the exchange (map-side combine), one "
        "shuffle on (event_type, date), WindowExec for the trailing bands.",
    )
    cap(
        "historical_completeness_events",
        reg["historical_completeness_events"]["spark"](spark, SF),
        "The reference's 4-scalar-queries-per-dataset loop collapsed to ONE "
        "conditional-sum hash aggregate: a single scan of events whatever "
        "the dataset count.",
    )
    cap(
        "minhash_candidate_pairs",
        minhash_candidate_pairs(pages_df(spark, 1000, 4)),
        "Signatures: one JVM xxhash64 per shingle, then ONE Arrow hop "
        "folds all 64 permutation hashes to the element-wise min in "
        "vectorized numpy (chained-seed identity, bit-identical to the "
        "all-JVM fold; round 6). The per-doc signature table is "
        "localCheckpointed so census and collect read one evaluation; the "
        "band-bucket groupBy is the only data shuffle; pair expansion "
        "happens inside capped buckets (max 64 members).",
    )
    cap(
        "segment_filter_events (contains + JSON key)",
        reg["segment_filter_events"]["spark"](spark, SF),
        "The contains/JSON predicate is evaluated in the scan stage "
        "(Filter fused into WholeStageCodegen directly over the parquet "
        "scan; string/JSON functions are not pushable into parquet footers, "
        "but no row survives past the first stage) — zero shuffle.",
    )
    cap(
        "embedding_near_dup_pairs",
        reg["embedding_near_dup_pairs"]["spark"](spark, SF),
        "Brute scorer: one shuffle by the blocking label (exactly what the "
        "former self-join shuffled), then per-group pair scoring in "
        "FlatMapGroupsInPandas — the same sequential per-dimension folds "
        "the SQL spec's aggregate() performs, vectorized across pairs "
        "(round 6; at corpus scale the LSH buckets generate the "
        "candidates instead).",
    )
    cap(
        "sigma_warning_zone_events",
        reg["sigma_warning_zone_events"]["spark"](spark, SF),
        "Same single-shuffle shape as sigma_bands: partial agg -> one "
        "exchange on event_type -> WindowExec (including current row, per "
        "the dashboard) -> codegen band-membership filter.",
    )

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(HDR + "\n" + "\n".join(sections))
    print("PLANS.md regenerated")
    spark.stop()


if __name__ == "__main__":
    main()
