"""Driver contract for the spark-graft builder (PySpark target).

entry()      -> flagship per-document keep/drop verdict query (sf0.001 smoke)
queries()    -> every implemented operator (SURVEY.md §2) as (spark, sf_dir) -> DF
oracle_sql() -> matching DuckDB SQL for the SQL-expressible ones

All real logic lives in dq_true_north_spark/; this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dq_true_north_spark import queries as _Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _Q.registry()
    return reg["doc_verdicts"]["spark"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: entry["spark"] for name, entry in _Q.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: entry["oracle"]
        for name, entry in _Q.registry().items()
        if entry["oracle"] is not None
    }
