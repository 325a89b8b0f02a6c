"""Change feed (CDC-OUT): per-commit compacted deltas whose LWW replay
reproduces the table — the engine's table->event direction, mirroring the
reference connector's Kafka emission (DynamoDBSourceTask.java:334-361)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.lake.table import LakeTable
from kafka_connect_dynamodb_spark.operators.lww import latest_per_key
from kafka_connect_dynamodb_spark.plans.pipeline import CdcPipeline
from kafka_connect_dynamodb_spark.sources.generator import (
    DEFAULT_BASE_TS, change_events, source_table)


def _sha_state(df):
    return {(r["repo"], r["path"]):
            hashlib.sha256((r["content"] or "").encode()).hexdigest()
            for r in df.collect()}


def test_change_feed_replay_reproduces_table(spark, tmp_path):
    base = source_table(spark, 150)
    ev = change_events(spark, 150, 900, pre_init_frac=0.0)

    table = LakeTable(str(tmp_path / "tbl"), change_feed=True)
    pipe = CdcPipeline(spark, table, n_buckets=8,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    # two commits -> two feed files
    pipe.sync_batch(ev.filter(ev.seq_no % 2 == 0), 0)
    pipe.sync_batch(ev.filter(ev.seq_no % 2 == 1), 1)

    feed = table.changes(spark)
    commits = {r["_commit"] for r in feed.select("_commit").distinct().collect()}
    assert len(commits) == 2   # one feed file per merge commit
    ops = {r["_op"] for r in feed.select("_op").distinct().collect()}
    assert "d" in ops and ({"c", "u"} & ops)

    # downstream replay: snapshot (seq 0) + feed rows, max-seq LWW per key,
    # drop keys whose winner is a delete -> must equal the table exactly
    snap = base.select("repo", "path", "content",
                       F.lit(0).cast("decimal(38,0)").alias("_seq"),
                       F.lit("r").alias("_op"))
    replayed = latest_per_key(
        snap.unionByName(feed.select("repo", "path", "content", "_seq", "_op")),
        ["repo", "path"], ["_seq"])
    live = replayed.filter(F.col("_op") != "d").select("repo", "path", "content")
    assert _sha_state(live) == _sha_state(table.read(spark))


def test_change_feed_version_range_and_default_off(spark, tmp_path):
    base = source_table(spark, 60)
    ev = change_events(spark, 60, 300, pre_init_frac=0.0)

    # default table: no feed written, changes() is an empty frame
    plain = LakeTable(str(tmp_path / "plain"))
    p0 = CdcPipeline(spark, plain, n_buckets=4,
                     clock=lambda: DEFAULT_BASE_TS.timestamp())
    p0.init_sync(base)
    p0.sync_batch(ev, 0)
    empty = plain.changes(spark)
    assert empty.count() == 0
    assert {"_op", "_commit"} <= set(empty.columns)

    fed = LakeTable(str(tmp_path / "fed"), change_feed=True)
    p1 = CdcPipeline(spark, fed, n_buckets=4,
                     clock=lambda: DEFAULT_BASE_TS.timestamp())
    p1.init_sync(base)
    p1.sync_batch(ev.filter(ev.seq_no % 2 == 0), 0)
    v_after_first = fed.current_version()
    p1.sync_batch(ev.filter(ev.seq_no % 2 == 1), 1)
    # from_version slices the feed to later commits only
    late = fed.changes(spark, from_version=v_after_first + 1)
    assert {r["_commit"] for r in late.select("_commit").distinct().collect()} \
        == {fed.current_version()}


def test_stream_changes_subscription(spark, tmp_path):
    """Downstream consumers can SUBSCRIBE to the feed: a streaming read over
    changes/ sees every commit's delta exactly once per checkpoint."""
    base = source_table(spark, 80)
    ev = change_events(spark, 80, 400, pre_init_frac=0.0)
    table = LakeTable(str(tmp_path / "tbl"), change_feed=True)
    pipe = CdcPipeline(spark, table, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    pipe.sync_batch(ev.filter(ev.seq_no % 2 == 0), 0)
    pipe.sync_batch(ev.filter(ev.seq_no % 2 == 1), 1)

    out_dir = str(tmp_path / "consumed")
    q = (table.stream_changes(spark)
              .writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", str(tmp_path / "cp"))
              .trigger(availableNow=True).start())
    q.awaitTermination()
    consumed = spark.read.parquet(out_dir)
    assert consumed.count() == table.changes(spark).count()
    assert {"repo", "path", "_op", "_seq"} <= set(consumed.columns)


def test_change_feed_carries_evolved_columns(spark, tmp_path):
    base = source_table(spark, 60)
    ev = change_events(spark, 60, 300, pre_init_frac=0.0, evolve_frac=0.4)
    table = LakeTable(str(tmp_path / "tbl"), change_feed=True)
    pipe = CdcPipeline(spark, table, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    pipe.sync_batch(ev, 0)
    feed = table.changes(spark)
    assert "branch" in feed.columns
    assert feed.filter(F.col("branch").isNotNull()).count() > 0


def test_feed_orphan_vacuum_and_crash_redelivery(spark, tmp_path):
    """Crash window for the feed write: an orphaned delta (staged, never
    committed) must not block the redelivered batch and IS vacuum-reclaimed,
    while committed feed files survive vacuum."""
    import os

    base = source_table(spark, 40)
    ev = change_events(spark, 40, 150, pre_init_frac=0.0)
    table = LakeTable(str(tmp_path / "tbl"), change_feed=True)
    pipe = CdcPipeline(spark, table, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)

    # leftover from a "crashed" attempt at the next version
    orphan = os.path.join(table.root, "changes", "c000000000003-deadbeef.parquet")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "part-junk.parquet"), "w") as f:
        f.write("junk")

    pipe.sync_batch(ev, 0)                       # redelivery lands
    n_feed = table.changes(spark).count()
    assert n_feed > 0

    removed = table.vacuum()
    assert removed >= 1
    assert not os.path.exists(os.path.join(orphan, "part-junk.parquet"))
    # the committed feed is untouched
    assert table.changes(spark).count() == n_feed
