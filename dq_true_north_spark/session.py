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
        # 24g default: a 32-thread local JVM GC-anti-scales below ~16g and
        # round-6 A/B showed 24g shaves pipeline cold (5.7 vs 6.4 s) at no
        # cost in a 128 GiB sandbox; env-parameterized — a real cluster
        # sizes executor/driver heap via spark-submit, not this default
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict:
    """Read the driver-provided parquet tables and register temp views.

    The DataFrame HANDLES are memoized per (session, sf_dir, table): a
    `spark.read.parquet` call costs ~130 ms of schema inference + py4j
    round trips, and the query registry calls load_tables once per query —
    at 10 tables that was a ~1.3 s floor under EVERY registered query
    (round-6 measurement; the floor, not the compute, dominated the small
    queries). Only the lazy plan is cached — every materialization still
    scans the parquet files, so this is metadata caching, never result
    caching. Temp views are re-registered whenever the requested sf_dir
    differs from the one currently pointed at, so a session that switches
    scale factors (the test harness does) stays correct."""
    cache = spark.__dict__.setdefault("_dq_table_cache", {})
    out = {}
    stale = []
    for n in names:
        key = (sf_dir, n)
        df = cache.get(key)
        if df is None:
            df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
            cache[key] = df
            stale.append(n)
        out[n] = df
    current = cache.get("_views_sf_dir")
    if current != sf_dir:
        stale = list(names)
        cache["_views_sf_dir"] = sf_dir
    for n in stale:
        out[n].createOrReplaceTempView(n)
    return out
