"""Bucketed co-located join: pre-bucketing both sides on the join key
eliminates the shuffle entirely (SURVEY.md §2.4 / scale notes — at 100 TB
this is the difference between a network-bound and a local join)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def warehouse_spark(tmp_path_factory):
    from dq_true_north_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        app_name="bucketing-test",
        master="local[4]",
        shuffle_partitions="8",
        extra_conf={
            "spark.sql.warehouse.dir": wh,
            # force a sort-merge join so the shuffle question is real
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    yield s
    s.stop()


def test_bucketed_join_has_no_exchange(warehouse_spark):
    spark = warehouse_spark
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").saveAsTable("orders_b"))
    (cust.write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").saveAsTable("customer_b"))

    joined = spark.sql(
        """SELECT c.c_mktsegment, COUNT(*) AS n, round(SUM(o.o_totalprice), 2) AS total
           FROM orders_b o JOIN customer_b c ON o.o_custkey = c.c_custkey
           GROUP BY c.c_mktsegment"""
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle either side (bucketing co-locates);
    # only the final small groupBy aggregate may exchange
    join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan, plan[:800]
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan

    # and the result matches the plain (shuffled) join
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    plain = o.join(c, o.o_custkey == c.c_custkey)
    from pyspark.sql import functions as F

    expected = {
        (r["c_mktsegment"], r["n"], r["total"])
        for r in plain.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .collect()
    }
    got = {tuple(r) for r in joined.collect()}
    assert got == expected
