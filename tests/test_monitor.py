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
