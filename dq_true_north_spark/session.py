"""SparkSession factory with scale-oriented defaults.

Local mode stands in for a multi-executor cluster; every config below is one
we would also set via spark-submit on a 1000-executor cluster. AQE is on so
shuffle partition counts re-plan at runtime (skew join splitting included).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "dq_true_north_spark",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # executor Python workers inherit the JVM's PYTHONPATH, NOT the driver's
    # sys.path — make the package importable on workers whatever the cwd
    # (the cluster-mode equivalent is spark-submit --py-files)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo + (os.pathsep + pp if pp else "")
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic timestamp semantics across engines (DuckDB oracle)
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas UDF / toPandas boundary (input_hint: no
        # per-row Python; Arrow batches only)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime coalescing + skew-join splitting — the config half of
        # the skew story (the other half is salted repartition in dedup.py)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config(
            "spark.sql.shuffle.partitions",
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS,
        )
        # at 100 TB this would be tuned with files.maxPartitionBytes; the
        # default 128m is already correct for the parquet scan side
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # broadcast small dims (rule catalog, lexicons) aggressively
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict:
    """Read the driver-provided parquet tables and register temp views."""
    out = {}
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
