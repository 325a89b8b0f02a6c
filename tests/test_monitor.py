"""Windowed + watermarked monitoring stream (the engine's windowed-agg
surface; the CDC apply itself is windowless by design, SURVEY §2.9 T2/T3)."""

from __future__ import annotations

from kafka_connect_dynamodb_spark.sources.generator import (
    change_events, events_schema)
from kafka_connect_dynamodb_spark.streaming.monitor import event_rate_stream


def test_event_rate_stream_totals(spark, tmp_path):
    ev = change_events(spark, 200, 3000, pre_init_frac=0.0,
                       event_interval_secs=1.0)  # spread over ~48 min
    log = str(tmp_path / "log")
    ev.coalesce(2).write.parquet(log)

    src = spark.readStream.schema(events_schema()).parquet(log)
    rates = event_rate_stream(src, window="5 minutes", watermark="10 minutes")
    collected = []

    def sink(df, _bid):
        collected.extend(r.asDict() for r in df.collect())

    q = (rates.writeStream.outputMode("append").foreachBatch(sink)
              .option("checkpointLocation", str(tmp_path / "cp"))
              .trigger(availableNow=True).start())
    q.awaitTermination()

    # append mode emits only watermark-finalized windows; totals must match
    # the batch-mode aggregation over the same finalized range
    batch = {(r["window_start"], r["window_end"]): r["n_events"]
             for r in event_rate_stream(ev, window="5 minutes",
                                        watermark="10 minutes").collect()}
    got = {(r["window_start"], r["window_end"]): r["n_events"]
           for r in collected}
    assert got
    for k, n in got.items():
        assert batch[k] == n
    # seq span sanity: windows are disjoint and ordered
    spans = sorted((r["window_start"], r["window_end"]) for r in collected)
    for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
        assert e1 <= s2


def test_event_rate_by_shard(spark):
    ev = change_events(spark, 100, 1000, pre_init_frac=0.0, n_shards=4,
                       event_interval_secs=1.0)
    out = event_rate_stream(ev, window="10 minutes", by_shard=True)
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == 1000
    assert {r["shard_id"] for r in rows} == {
        r["shard_id"] for r in ev.select("shard_id").distinct().collect()}


def test_session_stream_matches_batch_sessions(spark, tmp_path):
    """Streaming session_window under a watermark: finalized sessions match
    batch sessionization; a late sentinel advances the watermark so real
    sessions close."""
    from datetime import timedelta

    from pyspark.sql import functions as F

    from kafka_connect_dynamodb_spark.sources.generator import DEFAULT_BASE_TS
    from kafka_connect_dynamodb_spark.streaming.monitor import session_stream

    base = DEFAULT_BASE_TS.replace(tzinfo=None)
    rows = []
    for u in range(5):
        t0 = base + timedelta(minutes=u)
        # session 1: three events a minute apart
        for k in range(3):
            rows.append((f"u{u}", t0 + timedelta(minutes=k)))
        # 30-minute gap -> session 2: two events
        for k in range(2):
            rows.append((f"u{u}", t0 + timedelta(minutes=40 + k)))
    rows.append(("sentinel", base + timedelta(hours=10)))  # watermark pump
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    log = str(tmp_path / "log")
    df.coalesce(1).write.parquet(log)

    src = (spark.readStream.schema("user_id string, ts timestamp")
                .parquet(log))
    sessions = session_stream(src, "user_id", gap="10 minutes",
                              watermark="5 minutes")
    got = set()

    def sink(out, _bid):
        got.update((r.user_id, r.session_start, r.session_end, r.n_events)
                   for r in out.collect())

    q = (sessions.writeStream.outputMode("append").foreachBatch(sink)
                 .option("checkpointLocation", str(tmp_path / "cp"))
                 .trigger(availableNow=True).start())
    q.awaitTermination()

    batch = spark.read.parquet(log)
    sw = F.session_window(F.col("ts"), "10 minutes")
    want = {(r.user_id, r.s0, r.s1, r.n_events)
            for r in batch.groupBy("user_id", sw)
                          .agg(F.count(F.lit(1)).alias("n_events"))
                          .select("user_id",
                                  F.col("session_window.start").alias("s0"),
                                  F.col("session_window.end").alias("s1"),
                                  "n_events")
                          .collect()
            if r.user_id != "sentinel"}  # sentinel session stays open
    assert got == want                    # 5 users x 2 sessions each
    assert len(got) == 10
    assert all(n in (2, 3) for (_, _, _, n) in got)
