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
from .heuristics import drop_flag_columns
from .scrub import scrub_column
from .udfs import lang_ppl_udf


def compute_verdicts(
    pages: DataFrame,
    with_scrub: bool = True,
    dedup_strategy: str = "broadcast",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → verdicts per url.

    dedup_strategy:
      'broadcast' (default): the dedup shuffle carries ONLY
        (url, warc_ts, text_hash) — ~100 bytes/row instead of the full
        document — and the loser set (duplicate occurrences, typically a
        small fraction of the corpus) is broadcast-joined back. The wide
        row never crosses the network.
      'shuffle': single full-width exchange + window — use when the
        duplicate fraction is too large to broadcast (degenerate mirrors);
        at 10^12 docs the same keys-only plan with a sort-merge join back
        replaces the broadcast.
    """
    model = lang_ppl_udf(F.col("text"))   # one Arrow hop for both models
    flagged = pages.select(
        "url",
        "warc_ts",
        "text",
        *drop_flag_columns("text"),
        model.getField("pred_lang").alias("pred_lang"),
        model.getField("lang_confidence").alias("lang_confidence"),
        model.getField("perplexity").alias("perplexity"),
        F.md5("text").alias("text_hash"),
    )

    # keep-first exact dedup: stable tie-break (warc_ts, url) — never
    # partition-order dependent (SURVEY.md §7 hard-point 3)
    dup_win = Window.partitionBy("text_hash").orderBy("warc_ts", "url")
    if dedup_strategy == "broadcast":
        losers = (
            pages.select("url", "warc_ts", F.md5("text").alias("text_hash"))
            .withColumn("_rn", F.row_number().over(dup_win))
            .filter(F.col("_rn") > 1)
            .select("url", "warc_ts", F.lit(1).alias("_is_dup"))
        )
        flagged = flagged.join(
            F.broadcast(losers), ["url", "warc_ts"], "left"
        ).withColumn(
            C.REASON_EXACT_DUP, F.coalesce(F.col("_is_dup"), F.lit(0))
        ).drop("_is_dup")
    else:
        flagged = flagged.withColumn(
            C.REASON_EXACT_DUP,
            (F.row_number().over(dup_win) > 1).cast("int"),
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
