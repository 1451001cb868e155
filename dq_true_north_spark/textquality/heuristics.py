"""Gopher/C4 heuristic metrics as Spark Columns (whole-stage codegen path).

Thin wrappers over the dual-dialect spec (spec.py). Everything here compiles
to built-in Catalyst expressions — zero Python in the executor hot path.
Reference analog: per-column checks in dq_rules_library.py:675-699, collapsed
into a single wide projection (SURVEY.md §3.1 "one pass over the corpus").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import spec
from .. import constants as C


def metric(name: str, text_col: str = "text") -> Column:
    return F.expr(spec.METRICS[name](spec.SPARK, text_col)).alias(name)


def all_metrics(text_col: str = "text") -> list[Column]:
    return [metric(n, text_col) for n in spec.METRICS]


def drop_flag_columns(text_col: str = "text") -> list[Column]:
    """One 0/1 column per heuristic drop reason, evaluated in a single pass."""
    return [
        F.expr(f"CAST(COALESCE(({pred}), FALSE) AS INT)").alias(reason)
        for reason, pred in spec.heuristic_drop_predicates(spec.SPARK, text_col)
    ]


def with_heuristic_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select("*", *drop_flag_columns(text_col))


def fast_drop_flag_columns(
    text_col: str = "text",
) -> tuple[list[Column], list[Column]]:
    """The SAME nine 0/1 flags as drop_flag_columns, computed over two
    staged projections: (helper_cols, flag_cols).

    Why (round 6, guide §1.2 "per-task work"): the spec renders each
    predicate self-contained, so the words array / nonempty-lines array
    are re-derived inside several flags — and the higher-order pieces
    (filter/array lambdas) are CodegenFallback expressions, which
    whole-stage codegen's subexpression elimination does NOT dedupe the
    way it dedupes plain codegen'd subtrees. Hoisting the two arrays into
    named helper columns makes every flag read a bound reference instead.
    Catalyst keeps the staging: CollapseProject refuses to inline
    non-cheap expressions referenced more than once.

    Value-identity with the spec rendering (asserted flag-for-flag in
    tests/test_pipeline.py::test_fast_flags_equal_spec_flags):
      * word count: size of the filtered split == regexp_count(text,'\\S+')
        — split on \\s+ with empties removed enumerates exactly the \\S+
        runs, and lower() never alters whitespace;
      * per-word rules read the SAME lowered-words array the spec's
        stopword lambda used; alpha-word and char counts stay raw-text
        regexp passes (lower() can change string length on exotic
        codepoints, so those are NOT rebased onto the lowered array);
      * line rules read one nonempty-lines array (split + filter as spec).
    """
    d = spec.SPARK
    t = text_col
    stops = spec.arr_lit(d, C.STOPWORDS)
    helpers = [
        F.expr(f"filter(split(lower({t}), '\\\\s+'), w -> w <> '')").alias(
            "_h_words"
        ),
        F.expr(f"filter(split({t}, '\\n'), l -> l <> '')").alias("_h_nl"),
    ]
    nw = "size(_h_words)"
    nnl = "size(_h_nl)"
    mwl = spec.round4(
        f"CAST({spec.n_word_chars(d, t)} AS DOUBLE) / nullif({nw}, 0)"
    )
    sym = spec.round4(
        f"CAST({spec.rx_count(d, t, r'[#…]')} AS DOUBLE) / nullif({nw}, 0)"
    )
    stop_frac = spec.round4(
        f"CAST(size(filter(_h_words, w -> array_contains({stops}, w))) "
        f"AS DOUBLE) / nullif({nw}, 0)"
    )
    dstops = f"size(array_intersect(array_distinct(_h_words), {stops}))"
    alpha = spec.rx_count(d, t, r"[^\s]*[A-Za-z][^\s]*")
    nonalpha = spec.round4(
        f"CAST({nw} - {alpha} AS DOUBLE) / nullif({nw}, 0)"
    )
    ell = spec.round4(
        f"CAST(size(filter(_h_nl, l -> l LIKE '%...')) AS DOUBLE) "
        f"/ nullif({nnl}, 0)"
    )
    bul = spec.round4(
        f"CAST(size(filter(_h_nl, l -> l LIKE '- %' OR l LIKE '* %' "
        f"OR l LIKE '•%')) AS DOUBLE) / nullif({nnl}, 0)"
    )
    dup = spec.round4(
        f"1.0 - CAST(size(array_distinct(_h_nl)) AS DOUBLE) "
        f"/ nullif({nnl}, 0)"
    )
    preds = [
        (C.REASON_TOO_SHORT, f"{nw} < {C.MIN_WORDS}"),
        (C.REASON_TOO_LONG, f"{nw} > {C.MAX_WORDS}"),
        (
            C.REASON_MEAN_WORD_LEN,
            f"({mwl} < {C.MIN_MEAN_WORD_LEN} OR {mwl} > {C.MAX_MEAN_WORD_LEN})",
        ),
        (C.REASON_SYMBOL_RATIO, f"{sym} > {C.MAX_SYMBOL_WORD_RATIO}"),
        (
            C.REASON_STOPWORDS,
            f"({stop_frac} < {C.MIN_STOPWORD_FRACTION} OR "
            f"{dstops} < {C.MIN_DISTINCT_STOPWORDS})",
        ),
        (C.REASON_NON_ALPHA, f"{nonalpha} > {C.MAX_NON_ALPHA_WORD_FRACTION}"),
        (C.REASON_ELLIPSIS,
         f"coalesce({ell}, 0.0) > {C.MAX_ELLIPSIS_LINE_FRACTION}"),
        (C.REASON_BULLET,
         f"coalesce({bul}, 0.0) > {C.MAX_BULLET_LINE_FRACTION}"),
        (C.REASON_DUP_LINES,
         f"coalesce({dup}, 0.0) > {C.MAX_DUP_LINE_FRACTION}"),
    ]
    flags = [
        F.expr(f"CAST(COALESCE(({p}), FALSE) AS INT)").alias(r)
        for r, p in preds
    ]
    return helpers, flags


def drop_reasons_expr(flag_cols: list[str]) -> Column:
    """concat_ws over CASE-marked reasons — NULLs (non-hits) are skipped, so
    the result is the comma-joined reason list in frozen DROP_REASON_ORDER."""
    parts = [
        F.when(F.col(c) == 1, F.lit(c)).otherwise(F.lit(None)) for c in flag_cols
    ]
    return F.concat_ws(",", *parts)
