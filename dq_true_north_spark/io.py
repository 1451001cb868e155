"""Result-plane sinks.

The reference appends every summary/detail frame to Snowflake tables with
``write.mode("append").save_as_table`` (dq_rules_library.py:44,96,157,...).
Here the result plane is a directory of Parquet tables with the same
append-only discipline (Iceberg-style table-per-name layout); at cluster
scale the same code targets real Iceberg via ``writeTo(t).append()``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ResultSink:
    """Append-only parquet sink, one subdirectory per logical table."""

    def __init__(self, base_path: str):
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.base_path, table)

    def append(self, df: DataFrame, table: str) -> None:
        (
            df.withColumn("execution_timestamp", F.current_timestamp())
            .write.mode("append")
            .parquet(self.path(table))
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        )


class NullSink(ResultSink):
    """Swallows detail writes — used when the engine runs in pure-query mode
    (e.g. the oracle-checked summary query, which must be side-effect free
    and deterministic)."""

    def __init__(self):  # no base path
        pass

    def append(self, df: DataFrame, table: str) -> None:
        return

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        raise FileNotFoundError("NullSink holds no tables")

    def exists(self, table: str) -> bool:
        return False
