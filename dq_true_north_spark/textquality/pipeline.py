"""The corpus quality-filter pipeline — one pass over the pages table.

north_rule pipeline: langid → perplexity → Gopher/C4 heuristics →
exact-text dedup → PII/toxicity scrub → per-url verdict
(keep, drop_reasons, scrubbed_text).

Plan shape (deliberate, for 100 TB):
  stage 1  scan + wide projection: ALL heuristic flags as codegen'd Column
           exprs + the two Arrow UDF columns (langid, perplexity) — one scan;
  stage 2  ONE shuffle, by text_hash, for the keep-first dedup window
           (skew-bounded: identical-text groups are small by construction;
           pathological cases are capped by AQE skew handling);
  stage 3  verdict assembly + scrub, all codegen — no further shuffle.

The reference's N-scans-per-rule pattern (dq_rules_library.py, one query per
rule) is intentionally replaced by this single-pass design (SURVEY.md §3.1).

Language gates (mirrored exactly in tests/golden.py):
  word-level rules (mean_word_len, non_alpha) — latin-script langs only;
  stopword rule — English only;
  perplexity — scored under the PREDICTED language's own model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import constants as C
from . import spec
from .heuristics import fast_drop_flag_columns
from .scrub import scrub_column
from .udfs import lang_ppl_udf


#: auto strategy switches to the full-shuffle plan above this duplicate
#: fraction — beyond it the loser set is too large to broadcast safely
BROADCAST_DUP_FRACTION_MAX = 0.10


def estimate_dup_fraction(pages: DataFrame) -> float:
    """Cheap sketch pre-pass: 1 − approx_distinct(text)/count via HLL++
    over a JVM xxhash64 of the text (one narrow scan, no shuffle of note).
    This is the `approx_distinct_vs_exact` sketch put to work sizing the
    dedup strategy (VERDICT r1 #8)."""
    row = pages.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(F.xxhash64("text"), 0.02).alias("d"),
    ).first()
    if not row["n"]:
        return 0.0
    return max(0.0, 1.0 - row["d"] / row["n"])


def compute_verdicts(
    pages: DataFrame,
    with_scrub: bool = True,
    dedup_strategy: str = "auto",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → verdicts per url.

    dedup_strategy:
      'auto' (default): an HLL++ sketch pre-pass estimates the duplicate
        fraction and picks 'broadcast' below BROADCAST_DUP_FRACTION_MAX
        (typical crawl slices), else 'shuffle' (boilerplate mirrors, 20–50%
        dup crawls) — an unbounded broadcast of the loser set would OOM the
        executors exactly on those corpora.
      'broadcast': the dedup shuffle carries ONLY (url, warc_ts, text_hash)
        — ~100 bytes/row instead of the full document — and the loser set
        (duplicate occurrences) is broadcast-joined back. The wide row never
        crosses the network; text is md5'd exactly once (keys scan).
        PRECONDITION: (url, warc_ts) unique per row — the loser set is
        dropDuplicates'd on that key so a violating input degrades to
        marking every copy as dup instead of inflating the row count.
      'shuffle': single full-width exchange + window — always correct; at
        10^12 docs the same keys-only plan with a sort-merge join back
        replaces the broadcast.
    """
    if dedup_strategy == "auto":
        dedup_strategy = (
            "broadcast"
            if estimate_dup_fraction(pages) <= BROADCAST_DUP_FRACTION_MAX
            else "shuffle"
        )

    model = lang_ppl_udf(F.col("text"))   # one Arrow hop for both models
    # staged flags (round 6): the words/lines arrays are hoisted into one
    # helper projection so the nine flag predicates read bound references
    # — the self-contained spec rendering re-derived them per flag and the
    # higher-order pieces escape codegen subexpression elimination (see
    # heuristics.fast_drop_flag_columns; value-identity test-pinned)
    helpers, flags = fast_drop_flag_columns("text")
    flagged = pages.select("url", "warc_ts", "text", *helpers).select(
        "url",
        "warc_ts",
        "text",
        *flags,
        model.getField("pred_lang").alias("pred_lang"),
        model.getField("lang_confidence").alias("lang_confidence"),
        model.getField("perplexity").alias("perplexity"),
    )

    # keep-first exact dedup: stable tie-break (warc_ts, url) — never
    # partition-order dependent (SURVEY.md §7 hard-point 3)
    dup_win = Window.partitionBy("text_hash").orderBy("warc_ts", "url")
    if dedup_strategy == "broadcast":
        losers = (
            pages.select("url", "warc_ts", F.md5("text").alias("text_hash"))
            .withColumn("_rn", F.row_number().over(dup_win))
            .filter(F.col("_rn") > 1)
            .select("url", "warc_ts")
            .dropDuplicates(["url", "warc_ts"])   # join-key uniqueness guard
            .withColumn("_is_dup", F.lit(1))
        )
        flagged = flagged.join(
            F.broadcast(losers), ["url", "warc_ts"], "left"
        ).withColumn(
            C.REASON_EXACT_DUP, F.coalesce(F.col("_is_dup"), F.lit(0))
        ).drop("_is_dup")
    else:
        flagged = (
            flagged.withColumn("text_hash", F.md5("text"))
            .withColumn(
                C.REASON_EXACT_DUP,
                (F.row_number().over(dup_win) > 1).cast("int"),
            )
            .drop("text_hash")
        )

    latin = F.col("pred_lang").isin(*C.LATIN_LANGS)
    gates = {
        C.REASON_MEAN_WORD_LEN: latin,
        C.REASON_NON_ALPHA: latin,
        C.REASON_STOPWORDS: F.col("pred_lang") == "en",
    }
    gated = flagged.select(
        "*",
        *[
            F.when(~cond, F.lit(0)).otherwise(F.col(r)).alias(f"_g_{r}")
            for r, cond in gates.items()
        ],
        (~F.col("pred_lang").isin(*C.ALLOWED_LANGS)).cast("int").alias(C.REASON_BAD_LANG),
        (F.col("lang_confidence") < C.MIN_LANG_CONFIDENCE).cast("int").alias(C.REASON_LANG_CONF),
        (F.col("perplexity") > C.MAX_PERPLEXITY).cast("int").alias(C.REASON_PERPLEXITY),
    )
    for r in gates:
        gated = gated.drop(r).withColumnRenamed(f"_g_{r}", r)

    reason_cols = list(C.DROP_REASON_ORDER)
    reasons_arr = F.array_compact(
        F.array(*[
            F.when(F.col(r) == 1, F.lit(r)).otherwise(F.lit(None))
            for r in reason_cols
        ])
    )
    out = gated.select(
        "url",
        "warc_ts",
        "pred_lang",
        "lang_confidence",
        "perplexity",
        (sum(F.col(r) for r in reason_cols) == 0).cast("boolean").alias("keep"),
        reasons_arr.alias("drop_reasons"),
        *( [scrub_column("text").alias("scrubbed_text")] if with_scrub else [] ),
        F.map_from_arrays(
            F.array(*[F.lit(r) for r in reason_cols]),
            F.array(*[F.col(r).cast("int") for r in reason_cols]),
        ).alias("rule_hits"),
    )
    return out


def verdict_summary(verdicts: DataFrame) -> DataFrame:
    """Corpus-level rollup: kept/dropped counts + per-reason hit totals —
    the summary row analog of DQ_RESULTS (dq_engine.py:37-44)."""
    aggs = [
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(F.col("keep").cast("int")).alias("kept_docs"),
    ]
    for r in C.DROP_REASON_ORDER:
        aggs.append(
            F.sum(F.element_at(F.col("rule_hits"), r)).alias(f"{r}_count")
        )
    return verdicts.agg(*aggs)
