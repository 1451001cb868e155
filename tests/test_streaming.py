"""Streaming ingestion: same verdicts, exactly-once across restarts."""

from __future__ import annotations

import os

from dq_true_north_spark.corpus import generate_pages_pdf, pages_df
from dq_true_north_spark.streaming import stream_verdicts


def _write_drop(spark, pdf, path):
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_stream_processes_drops_and_resumes(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    all_pages = generate_pages_pdf(400)

    # drop 1: first 200 pages
    _write_drop(spark, all_pages.iloc[:200], inp)
    q = stream_verdicts(spark, inp, out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == 200

    # drop 2: next 200 pages; restart stream from checkpoint —
    # already-processed files must NOT be reprocessed (exactly-once)
    _write_drop(spark, all_pages.iloc[200:], inp)
    q2 = stream_verdicts(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    verdicts = spark.read.parquet(out)
    assert verdicts.count() == 400
    assert verdicts.select("url", "warc_ts").distinct().count() == 400

    # verdicts agree with the batch pipeline on the same pages
    from dq_true_north_spark.textquality.pipeline import compute_verdicts

    batch = compute_verdicts(pages_df(spark, 400, 4))
    b = {(r["url"], r["warc_ts"]): (r["keep"], tuple(r["drop_reasons"]))
         for r in batch.collect()}
    s = {(r["url"], r["warc_ts"]): (r["keep"], tuple(r["drop_reasons"]))
         for r in verdicts.collect()}
    diff = {k for k in b if b[k] != s.get(k)}
    # per-micro-batch dedup can only differ on planted cross-batch dup pairs
    for k in diff:
        assert "exact_duplicate" in b[k][1] or "exact_duplicate" in s[k][1]
    assert len(diff) <= 30
