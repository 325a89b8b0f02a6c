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


def test_register_driven_tombstone_gc(spark, tmp_path):
    """The shard register's min committed seq licenses tombstone purging:
    tombstones below the watermark are physically removed, those above it
    survive and still block a late lower-seq zombie update."""
    from kafka_connect_dynamodb_spark.lake.table import LakeTable
    from kafka_connect_dynamodb_spark.streaming.shard_register import (
        gc_tombstones, safe_tombstone_watermark)

    t = LakeTable(str(tmp_path / "tbl"))
    t.create(spark, spark.createDataFrame(
        [("r1", "p1", "a"), ("r2", "p2", "b"), ("r3", "p3", "c")],
        "repo string, path string, content string"), ["repo", "path"],
        n_buckets=4)
    upd = spark.createDataFrame(
        [("r1", "p1", None, "d", 50),        # below the watermark: purgeable
         ("r2", "p2", None, "d", 500)],      # above: must survive
        "repo string, path string, content string, _op string, _seq long")
    t.merge(spark, upd, batch_id=0)

    register = {"shard-0": {"max_seq_no": "100", "events_seen": 4},
                "shard-1": {"max_seq_no": "300", "events_seen": 2}}
    assert safe_tombstone_watermark(register) == 100
    assert gc_tombstones(spark, t, register) is not None

    dead = t.read(spark, include_meta=True, include_deleted=True) \
            .filter("_deleted").collect()
    assert {(r.repo, r.path) for r in dead} == {("r2", "p2")}
    # the surviving tombstone still wins against a late lower-seq zombie
    t.merge(spark, spark.createDataFrame(
        [("r2", "p2", "zombie", "u", 400)],
        "repo string, path string, content string, _op string, _seq long"),
        batch_id=1)
    assert ("r2", "p2") not in {(r.repo, r.path)
                                for r in t.read(spark).collect()}
    assert gc_tombstones(spark, t, {}) is None   # empty register: no-op
