"""Skew handling: planted hot hosts spread evenly after salted repartition."""

from __future__ import annotations

from pyspark.sql import functions as F

from dq_true_north_spark.corpus import pages_df
from dq_true_north_spark.partitioning import (
    host_of,
    host_stats,
    partition_histogram,
    repartition_by_url,
    salted_repartition_by_host,
)


def test_corpus_is_host_skewed(spark):
    """Precondition: the synthetic corpus really plants hot hosts (~15%
    of pages each on 2 hosts vs ~0.7% for the cold hosts)."""
    pages = pages_df(spark, 2000, 8)
    top = host_stats(pages).limit(2).collect()
    assert {r["host"] for r in top} == {"hot0.example.com", "hot1.example.com"}
    assert all(r["count"] > 200 for r in top)


def test_host_partitioning_is_skewed_but_salting_fixes_it(spark):
    pages = pages_df(spark, 2000, 8).cache()
    try:
        n = 16
        by_host = pages.repartition(n, host_of())
        hist_host = partition_histogram(by_host)
        by_salted = salted_repartition_by_host(pages, n)
        hist_salted = partition_histogram(by_salted)
        by_url = repartition_by_url(pages, n)
        hist_url = partition_histogram(by_url)
        # host partitioning concentrates >15% of rows in one partition;
        # salting and url-hashing keep the max partition near the mean
        assert max(hist_host) > 2000 * 0.15
        assert max(hist_salted) < max(hist_host) * 0.6
        assert max(hist_url) < 2000 / n * 2
        assert sum(hist_salted) == sum(hist_url) == 2000
    finally:
        pages.unpersist()


def test_host_of_handles_slashless_and_query_only_urls(spark):
    """Unified extractor (VERDICT r2 #2): the batch host_of must agree with
    the streaming path — no '' bucket for slashless / query-only URLs, and
    salt_col never groups real hosts under the empty host."""
    from dq_true_north_spark.partitioning import salt_col

    urls = [
        ("https://bare.example.org",),
        ("https://bare.example.org?x=1",),
        ("https://bare.example.org#frag",),
        ("https://bare.example.org/p",),
        ("HTTP://bare.example.org/q",),
    ]
    df = spark.createDataFrame(urls, "url string")
    hosts = [r[0] for r in df.select(host_of()).collect()]
    assert hosts == ["bare.example.org"] * 5
    salts = [r[0] for r in df.select(salt_col()).collect()]
    assert all(s.startswith("bare.example.org#") for s in salts)

    # streaming and batch share ONE extractor — literally the same function
    from dq_true_north_spark import streaming

    assert streaming.host_of is host_of
