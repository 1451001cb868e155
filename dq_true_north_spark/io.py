"""Result-plane sinks.

The reference appends every summary/detail frame to Snowflake tables with
``write.mode("append").save_as_table`` (dq_rules_library.py:44,96,157,...),
and its engine bootstraps the result plane before the run:
  * probe table existence with ``SELECT 1 FROM t LIMIT 1`` and CREATE on
    miss (dq_engine.py:33-45,49-62);
  * self-heal schema drift by probe-insert — an incompatible existing table
    is RECREATED with the expected schema (dq_engine.py:64-85, Snowflake
    CREATE OR REPLACE semantics: prior rows are dropped).

Here the result plane is a directory of Parquet tables with the same
append-only discipline (Iceberg-style table-per-name layout); at cluster
scale the same code targets real Iceberg via ``writeTo(t).append()``.
Appends to one logical table are serialized with a per-table lock: the
engine dispatches rules from driver threads, and two concurrent
FileOutputCommitter jobs on the same output path share the _temporary/0
staging dir and can drop each other's files.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ResultSink:
    """Append-only parquet sink, one subdirectory per logical table."""

    def __init__(self, base_path: str):
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)
        self._locks: dict[str, threading.Lock] = {}
        self._locks_guard = threading.Lock()
        # tables whose on-disk schema this process has already verified
        # against a given column layout — one footer probe per table per
        # layout instead of one per append
        self._verified: dict[str, dict[str, str]] = {}

    def path(self, table: str) -> str:
        return os.path.join(self.base_path, table)

    def _lock(self, table: str) -> threading.Lock:
        with self._locks_guard:
            return self._locks.setdefault(table, threading.Lock())

    @staticmethod
    def _schema_types(schema) -> dict[str, str]:
        return {f.name.lower(): f.dataType.simpleString() for f in schema.fields}

    def _heal_mode(self, spark: SparkSession, table: str, incoming) -> str:
        """'append' when the existing table is write-compatible, else
        'overwrite' — the reference's recreate-on-schema-error
        (dq_engine.py:64-85). Parquet resolves columns by name per file, so
        column ORDER differences are compatible; a column set or type
        change is the drift that would poison reads."""
        if not self.exists(table):
            return "append"
        try:
            existing = self._schema_types(
                spark.read.parquet(self.path(table)).schema
            )
        except Exception:
            return "overwrite"      # unreadable table dir: recreate
        if existing == self._schema_types(incoming.schema):
            return "append"
        return "overwrite"

    def append(self, df: DataFrame, table: str) -> None:
        out = df.withColumn("execution_timestamp", F.current_timestamp())
        incoming = self._schema_types(out.schema)
        with self._lock(table):
            if self._verified.get(table) == incoming:
                mode = "append"      # probe already paid for this layout
            else:
                mode = self._heal_mode(df.sparkSession, table, out)
            out.write.mode(mode).parquet(self.path(table))
            self._verified[table] = incoming

    def ensure(self, spark: SparkSession, table: str, schema_ddl: str) -> None:
        """Bootstrap: create the table with the declared schema when missing
        (reference probe + CREATE, dq_engine.py:33-45). Zero-row write —
        the schema footer makes the empty table readable."""
        with self._lock(table):
            if not self.exists(table):
                empty = spark.createDataFrame([], schema_ddl).withColumn(
                    "execution_timestamp", F.current_timestamp()
                )
                empty.write.mode("overwrite").parquet(self.path(table))
                self._verified[table] = self._schema_types(empty.schema)

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

    def ensure(self, spark: SparkSession, table: str, schema_ddl: str) -> None:
        return

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        raise FileNotFoundError("NullSink holds no tables")

    def exists(self, table: str) -> bool:
        return False
