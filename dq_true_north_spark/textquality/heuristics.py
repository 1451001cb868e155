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


def drop_reasons_expr(flag_cols: list[str]) -> Column:
    """concat_ws over CASE-marked reasons — NULLs (non-hits) are skipped, so
    the result is the comma-joined reason list in frozen DROP_REASON_ORDER."""
    parts = [
        F.when(F.col(c) == 1, F.lit(c)).otherwise(F.lit(None)) for c in flag_cols
    ]
    return F.concat_ws(",", *parts)
