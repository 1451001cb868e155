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


def _page_rows(spec):
    """spec: list of (url, iso_ts, text) → PAGES_SCHEMA-shaped tuples."""
    import datetime

    return [
        (url, datetime.datetime.fromisoformat(ts),
         f"<html>{text}</html>".encode(), text, "en")
        for url, ts, text in spec
    ]


def _write_rows(spark, rows, path):
    from dq_true_north_spark.corpus import PAGES_SCHEMA

    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def test_stream_windowed_rates_with_watermark(spark, tmp_path):
    """Append-mode windowed counts finalize once the watermark passes the
    window end; a row later than the watermark is DROPPED, not re-counted."""
    from dq_true_north_spark.streaming import stream_host_rates

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    h = "https://hostA.example.org/p"
    # windows are 10 min; watermark lag 10 min
    _write_rows(spark, _page_rows([
        (h + "1", "2024-01-01 10:01:00", "a"),
        (h + "2", "2024-01-01 10:04:00", "b"),
        (h + "3", "2024-01-01 10:22:00", "c"),   # advances watermark to 10:12
    ]), inp)
    q = stream_host_rates(spark, inp, out, ckpt)
    q.awaitTermination(120)
    rows = {(str(r["window_start"]), r["n_pages"])
            for r in spark.read.parquet(out).collect()}
    # [10:00,10:10) finalized with 2 pages; [10:20,10:30) still open
    assert rows == {("2024-01-01 10:00:00", 2)}

    # restart from checkpoint: one LATE row into the closed window (ignored)
    # plus rows at 10:41 that push the watermark past [10:20,10:30)
    _write_rows(spark, _page_rows([
        (h + "4", "2024-01-01 10:03:00", "late"),   # < watermark 10:12
        (h + "5", "2024-01-01 10:41:00", "d"),
    ]), inp)
    q2 = stream_host_rates(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    rows = {(str(r["window_start"]), r["n_pages"])
            for r in spark.read.parquet(out).collect()}
    assert ("2024-01-01 10:00:00", 2) in rows          # unchanged: late row dropped
    assert ("2024-01-01 10:20:00", 1) in rows          # now finalized
    assert not any(s == "2024-01-01 10:00:00" and n != 2 for s, n in rows)


def test_stream_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps ONE row per distinct text across
    micro-batches AND restarts — the cross-batch dedup foreachBatch cannot
    do (state persists in the checkpoint)."""
    from dq_true_north_spark.streaming import stream_dedup_stateful

    inp, out, ckpt = (str(tmp_path / d) for d in ("in2", "out2", "ckpt2"))
    _write_rows(spark, _page_rows([
        ("https://h/a", "2024-01-01 10:00:00", "same text"),
        ("https://h/b", "2024-01-01 10:01:00", "same text"),     # in-batch dup
        ("https://h/c", "2024-01-01 10:02:00", "other text"),
    ]), inp)
    q = stream_dedup_stateful(spark, inp, out, ckpt)
    q.awaitTermination(120)
    first = {r["url"]: r["is_first"] for r in spark.read.parquet(out).collect()}
    assert first == {"https://h/a": 1, "https://h/b": 0, "https://h/c": 1}

    # second drop after restart: the same text must NOT get a new keeper
    _write_rows(spark, _page_rows([
        ("https://h/d", "2024-01-01 11:00:00", "same text"),     # cross-batch dup
        ("https://h/e", "2024-01-01 11:01:00", "brand new"),
    ]), inp)
    q2 = stream_dedup_stateful(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    first = {r["url"]: r["is_first"] for r in rows}
    assert first["https://h/d"] == 0      # state remembered "same text"
    assert first["https://h/e"] == 1
    keepers = [r for r in rows if r["is_first"] == 1]
    assert len(keepers) == 3              # one per distinct text, total


def test_stream_host_rates_slashless_urls_group_correctly(spark, tmp_path):
    """URLs without a path slash must group under their real host, not ''."""
    from dq_true_north_spark.streaming import stream_host_rates

    inp, out, ckpt = (str(tmp_path / d) for d in ("in3", "out3", "ckpt3"))
    _write_rows(spark, _page_rows([
        ("https://bare.example.org", "2024-01-01 10:01:00", "a"),
        ("https://bare.example.org?x=1", "2024-01-01 10:02:00", "b"),
        ("https://bare.example.org/p", "2024-01-01 10:03:00", "c"),
        ("https://other.example.org/q", "2024-01-01 10:31:00", "d"),  # advances watermark
    ]), inp)
    q = stream_host_rates(spark, inp, out, ckpt)
    q.awaitTermination(120)
    rows = {(r["host"], r["n_pages"]) for r in spark.read.parquet(out).collect()}
    assert ("bare.example.org", 3) in rows
    assert not any(h == "" for h, _ in rows)


def test_stream_near_dup_pairs_across_batches(spark, tmp_path):
    """Streaming LSH near-dup: pages arriving in SEPARATE micro-batches
    still pair (bucket membership lives in GroupState across batches), and
    the union of emitted pairs — max-reduced per pair like the batch
    aggregate — equals the batch minhash_candidate_pairs output on the
    same corpus (below the bucket cap the two paths are equivalent by
    construction)."""
    from dq_true_north_spark.corpus import generate_pages_pdf
    from dq_true_north_spark.streaming import stream_near_dup_pairs
    from dq_true_north_spark.textquality.dedup_mirror import (
        minhash_pairs_mirror,
    )

    from dq_true_north_spark.corpus import PAGES_SCHEMA

    pdf = generate_pages_pdf(400)
    in_dir, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # two drops into the SAME source dir (the file source does not
    # recurse into subdirectories), sequential availableNow runs sharing
    # one checkpoint = two micro-batch generations; state must carry
    # bucket members across them. The planted dup pair 147↔148 (class 7
    # copies class 8) STRADDLES the split at 148.
    half = 148

    def drop(lo, hi):
        spark.createDataFrame(pdf.iloc[lo:hi], PAGES_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(in_dir)
        q = stream_near_dup_pairs(spark, in_dir, out, ckpt)
        q.awaitTermination(120)

    drop(0, half)
    drop(half, 400)

    got = spark.read.parquet(str(out))
    streamed = {}
    for r in got.collect():
        k = (r["doc_a"], r["doc_b"])
        streamed[k] = max(streamed.get(k, 0.0), r["est_jaccard"])
    expected = {(a, b): e for a, b, e in
                minhash_pairs_mirror(list(pdf["url"]), list(pdf["text"]))}
    assert streamed == expected
    # the cross-batch pair really exists (page 147 in drop1, 148 in drop2)
    cross = [k for k in expected
             if "00000147" in k[0] + k[1] and "00000148" in k[0] + k[1]]
    assert cross and all(k in streamed for k in cross)


def test_stream_near_dup_handles_empty_pages_and_reports_cap(spark, tmp_path):
    """Shingle-less pages (< 3 words, all-NULL signatures) must neither
    crash the stateful operator nor fabricate est=1.0 pairs between
    unrelated empty pages; and a bucket that hits max_bucket emits a
    CAP_MARKER row counting the dropped arrivals instead of truncating
    silently (the repo-wide capped-LSH visibility discipline)."""
    from dq_true_north_spark.corpus import PAGES_SCHEMA
    from dq_true_north_spark.streaming import CAP_MARKER, stream_near_dup_pairs

    boiler = ("the same boilerplate sentence repeated across every mirror "
              "page of this site again")
    rows = [(f"https://h/empty{i}", "2024-01-01 10:00:00", "tiny page", "en")
            for i in range(4)]                       # < 3 words: NULL sigs
    rows += [(f"https://h/b{i:03d}", "2024-01-01 10:00:00", boiler, "en")
             for i in range(7)]                      # one hot bucket
    import datetime

    data = [(u, datetime.datetime(2024, 1, 1, 10, 0, 0),
             b"<html></html>", t, lg) for u, _, t, lg in rows]
    in_dir, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spark.createDataFrame(data, PAGES_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(in_dir)

    q = stream_near_dup_pairs(spark, in_dir, out, ckpt, max_bucket=5)
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    real = [r for r in got if r["doc_a"] != CAP_MARKER]
    markers = [r for r in got if r["doc_a"] == CAP_MARKER]
    # no pair involves an empty page, and no fabricated empty-empty pair
    assert all("empty" not in r["doc_a"] + r["doc_b"] for r in real)
    # the 7 boilerplate pages overflow the 5-cap: pairs among the first 5
    # arrivals only, and every one of the 16 band buckets reports 2 drops
    assert real and all(r["est_jaccard"] == 1.0 for r in real)
    assert markers and all(r["est_jaccard"] == 2.0 for r in markers)
    docs_in_pairs = {d for r in real for d in (r["doc_a"], r["doc_b"])}
    assert len(docs_in_pairs) == 5
