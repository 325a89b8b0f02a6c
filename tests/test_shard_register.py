"""Stateful streaming shard register (applyInPandasWithState) vs the
reference semantics: monotonic per-shard max seq-no, state carried across
micro-batches (DynamoDBSourceTask.java:413-430, KclRecordProcessor checkpoint
gating)."""

from __future__ import annotations

from kafka_connect_dynamodb_spark.sources.generator import change_events
from kafka_connect_dynamodb_spark.streaming.shard_register import final_register


def test_register_matches_batch_max(spark, tmp_path):
    ev = change_events(spark, 150, 2000, pre_init_frac=0.0, n_shards=6)
    log = str(tmp_path / "log")
    ev.coalesce(3).write.parquet(log)  # 3 files -> state spans micro-batches

    reg = final_register(spark, log, str(tmp_path / "cp"))

    want = {r["shard_id"]: (str(r["mx"]), r["n"])
            for r in ev.groupBy("shard_id")
                       .agg({"seq_no": "max", "*": "count"})
                       .withColumnRenamed("max(seq_no)", "mx")
                       .withColumnRenamed("count(1)", "n").collect()}
    got = {s: (v["max_seq_no"], v["events_seen"]) for s, v in reg.items()}
    assert got == want


def test_register_state_survives_restart(spark, tmp_path):
    """Append more log after a drain; re-drain with the same checkpoint —
    the register resumes its state instead of recounting."""
    ev = change_events(spark, 100, 1200, pre_init_frac=0.0, n_shards=4)
    first = ev.filter(ev.seq_no % 2 == 0)
    second = ev.filter(ev.seq_no % 2 == 1)
    log = str(tmp_path / "log")
    cp = str(tmp_path / "cp")
    first.coalesce(2).write.mode("append").parquet(log)
    final_register(spark, log, cp)
    second.coalesce(2).write.mode("append").parquet(log)

    reg = final_register(spark, log, cp)
    want = {r["shard_id"]: (str(r["mx"]), r["n"])
            for r in ev.groupBy("shard_id")
                       .agg({"seq_no": "max", "*": "count"})
                       .withColumnRenamed("max(seq_no)", "mx")
                       .withColumnRenamed("count(1)", "n").collect()}
    got = {s: (v["max_seq_no"], v["events_seen"]) for s, v in reg.items()}
    assert got == want
