"""Bucketed co-located join: pre-bucketing both sides on the join key
eliminates the shuffle entirely (SURVEY.md §2.4 / scale notes — at 100 TB
this is the difference between a network-bound and a local join).

Isolation note: this test uses the SHARED session fixture with EXTERNAL
bucketed tables (explicit path) and runtime-conf save/restore. The old
version built its own get_spark(...) with a custom warehouse — but
getOrCreate() silently reuses an existing session, so the static
warehouse conf was ignored (leaking orders_b/ into the default
spark-warehouse) and its teardown s.stop() killed the shared session for
every test file scheduled after it. Order-dependent state like that must
never touch the shared session lifecycle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def smj_conf(spark):
    """Force a sort-merge join (no broadcast, no AQE re-plan) for the
    duration of one test; restore the shared session's confs after."""
    saved = {
        k: spark.conf.get(k)
        for k in ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.enabled")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_bucketed_join_has_no_exchange(smj_conf, tmp_path):
    spark = smj_conf
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    for t in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
         .sortBy("o_custkey").option("path", str(tmp_path / "orders_b"))
         .saveAsTable("orders_b"))
        (cust.write.mode("overwrite").bucketBy(8, "c_custkey")
         .sortBy("c_custkey").option("path", str(tmp_path / "customer_b"))
         .saveAsTable("customer_b"))

        joined = spark.sql(
            """SELECT c.c_mktsegment, COUNT(*) AS n,
                      round(SUM(o.o_totalprice), 2) AS total
               FROM orders_b o JOIN customer_b c ON o.o_custkey = c.c_custkey
               GROUP BY c.c_mktsegment"""
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side (bucketing
        # co-locates); only the final small groupBy aggregate may exchange
        assert "SortMergeJoin" in plan, plan[:800]
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan

        # and the result matches the plain (shuffled) join
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
        expected = {
            (r["c_mktsegment"], r["n"], r["total"])
            for r in plain.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .collect()
        }
        got = {tuple(r) for r in joined.collect()}
        assert got == expected
    finally:
        for t in ("orders_b", "customer_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
