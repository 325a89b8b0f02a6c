"""Streaming exact dedup (dropDuplicatesWithinWatermark): bounded state,
first arrival wins, duplicates beyond the horizon re-admitted."""

from __future__ import annotations

from datetime import timedelta

from kafka_connect_dynamodb_spark.streaming.dedup import (
    content_dedup_stream, dedup_stream)
from kafka_connect_dynamodb_spark.sources.generator import DEFAULT_BASE_TS

BASE = DEFAULT_BASE_TS.replace(tzinfo=None)


def _write_stream_batches(spark, tmp_path, rows, schema):
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    return src


def test_stream_dedup_drops_in_horizon_duplicates(spark, tmp_path):
    rows = [
        (1, BASE, "a"),
        (1, BASE + timedelta(minutes=10), "a-dup"),     # within horizon: drop
        (2, BASE + timedelta(minutes=5), "b"),
        (2, BASE + timedelta(minutes=6), "b-dup"),      # within horizon: drop
        (3, BASE + timedelta(minutes=7), "c"),
    ]
    src = _write_stream_batches(spark, tmp_path, rows,
                                "event_id long, ts timestamp, payload string")
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, payload string")
              .parquet(src))
    out_dir = str(tmp_path / "out")
    q = (dedup_stream(stream, ["event_id"], watermark="1 hour")
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.event_id: r.payload for r in spark.read.parquet(out_dir).collect()}
    assert set(got) == {1, 2, 3}
    # first arrival won (micro-batch processes in-file order)
    assert got[1] == "a" and got[2] == "b"


def test_stream_content_dedup_by_sha(spark, tmp_path):
    rows = [
        (10, BASE, "same text"),
        (11, BASE + timedelta(minutes=1), "same text"),   # same sha: drop
        (12, BASE + timedelta(minutes=2), "other text"),
    ]
    src = _write_stream_batches(spark, tmp_path, rows,
                                "doc_id long, ts timestamp, content string")
    stream = (spark.readStream
              .schema("doc_id long, ts timestamp, content string")
              .parquet(src))
    out_dir = str(tmp_path / "out")
    q = (content_dedup_stream(stream, watermark="1 hour")
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.read.parquet(out_dir).collect()
    assert len(out) == 2
    assert {r.content for r in out} == {"same text", "other text"}
    assert "_content_sha" not in spark.read.parquet(out_dir).columns


def test_batch_fallback_plain_dedup(spark):
    rows = [(1, BASE, "x"), (1, BASE, "x"), (2, BASE, "y")]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, v string")
    assert dedup_stream(df, ["event_id"]).count() == 2
