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

    removed = table.vacuum(grace_s=0)
    assert removed >= 1
    assert not os.path.exists(os.path.join(orphan, "part-junk.parquet"))
    # the committed feed is untouched
    assert table.changes(spark).count() == n_feed


def test_staged_delta_never_leaks_to_stream(spark, tmp_path):
    """ADVICE r2 #1 (phantom micro-batches): a delta staged by a LOST/crashed
    commit attempt lives under a hidden ``.stage-*`` prefix that the
    streaming file listing skips — consumers only ever see published
    (manifest-committed) deltas; vacuum reclaims the orphan."""
    import os

    base = source_table(spark, 40)
    ev = change_events(spark, 40, 150, pre_init_frac=0.0)
    table = LakeTable(str(tmp_path / "tbl"), change_feed=True)
    pipe = CdcPipeline(spark, table, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    pipe.sync_batch(ev, 0)                          # one committed delta
    committed_rows = table.changes(spark).count()

    # a crashed attempt's staged delta: REAL feed-schema rows that must not leak
    orphan = os.path.join(table.root, "changes", ".stage-c000000000003-dead")
    (base.limit(5)
         .withColumn("_seq", F.lit(999).cast("decimal(38,0)"))
         .withColumn("_op", F.lit("u"))
         .write.parquet(orphan))

    out_dir, cp = str(tmp_path / "consumed"), str(tmp_path / "cp")
    q = (table.stream_changes(spark)
              .writeStream.format("parquet").option("path", out_dir)
              .option("checkpointLocation", cp)
              .trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == committed_rows  # no phantom
    assert table.changes(spark).count() == committed_rows

    assert table.vacuum(grace_s=0) >= 1                      # orphan reclaimed
    assert not os.path.isdir(orphan)


def test_crash_between_commit_and_publish_heals(spark, tmp_path):
    """Crash window on the OTHER side: manifest committed but the staged
    delta not yet published. Any later reader heals it idempotently, so the
    feed is complete — never a missing-file crash."""
    import os

    base = source_table(spark, 40)
    ev = change_events(spark, 40, 150, pre_init_frac=0.0)
    table = LakeTable(str(tmp_path / "tbl"), change_feed=True)
    pipe = CdcPipeline(spark, table, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    pipe.sync_batch(ev, 0)
    n = table.changes(spark).count()
    assert n > 0

    # simulate the crash by reversing the publish move
    e = table.manifest().change_files[-1]
    final = os.path.join(table.root, e["path"])
    staged = os.path.join(table.root, e["staged"])
    os.rename(final, staged)
    assert not os.path.isdir(final)

    healed = table.changes(spark)                   # reader-side heal
    assert healed.count() == n
    assert os.path.isdir(final) and not os.path.isdir(staged)


def test_change_feed_retention_expiry(spark, tmp_path):
    """ADVICE r2 #4: expire_change_feed prunes the manifest's feed history;
    once the manifests that still listed the old deltas expire too, vacuum
    reclaims the delta dirs from disk."""
    import os

    base = source_table(spark, 40)
    ev = change_events(spark, 40, 300, pre_init_frac=0.0)
    table = LakeTable(str(tmp_path / "tbl"), change_feed=True)
    pipe = CdcPipeline(spark, table, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    for k in range(3):
        pipe.sync_batch(ev.filter(ev.seq_no % 3 == k), k)
    all_entries = list(table.manifest().change_files)
    assert len(all_entries) == 3
    keep_from = all_entries[-1]["version"]

    dropped = table.expire_change_feed(below_version=keep_from)
    assert dropped == 2
    assert {e["version"] for e in table.manifest().change_files} == {keep_from}
    # idempotent
    assert table.expire_change_feed(below_version=keep_from) == 0

    # old manifests still list the old deltas -> still on disk after vacuum
    table.vacuum(grace_s=0)
    assert os.path.isdir(os.path.join(table.root, all_entries[0]["path"]))
    # retire those manifests -> vacuum reclaims the expired delta dirs
    table.expire_versions(keep_last=1)
    table.vacuum(grace_s=0)
    assert not os.path.isdir(os.path.join(table.root, all_entries[0]["path"]))
    assert os.path.isdir(os.path.join(table.root, all_entries[-1]["path"]))
    assert table.changes(spark).count() > 0


def test_downstream_table_exactly_once_via_feed(spark, tmp_path):
    """VERDICT r2 stretch #10 — table->event->table composition: a SECOND
    LakeTable fed solely by the primary's change feed (streaming.feed.
    mirror_changes) converges to sha-parity with the primary, INCLUDING
    across a consumer kill/restart that redelivers a micro-batch."""
    from kafka_connect_dynamodb_spark.streaming.feed import mirror_changes

    base = source_table(spark, 80)
    ev = change_events(spark, 80, 400, pre_init_frac=0.0)

    primary = LakeTable(str(tmp_path / "primary"), change_feed=True)
    pipe = CdcPipeline(spark, primary, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)

    # downstream bootstraps from the same snapshot, then consumes ONLY feed
    downstream = LakeTable(str(tmp_path / "downstream"))
    downstream.create(spark, base, ["repo", "path"], n_buckets=4)

    def consume():
        mirror_changes(spark, primary, downstream,
                       checkpoint_dir=str(tmp_path / "cp")).awaitTermination()

    pipe.sync_batch(ev.filter(ev.seq_no % 2 == 0), 0)
    consume()                                   # first consumer run
    v_mid = downstream.current_version()
    consume()                                   # restart, nothing new: no-op
    assert downstream.current_version() == v_mid

    pipe.sync_batch(ev.filter(ev.seq_no % 2 == 1), 1)
    consume()                                   # "killed" consumer restarted

    assert _sha_state(downstream.read(spark)) == _sha_state(primary.read(spark))


def test_live_mirror_races_live_tail_to_parity(spark, tmp_path):
    """Full composition under load (the reference's whole story end-to-end):
    a processingTime tail applies batches to the primary WHILE a
    processingTime mirror consumes the feed into a downstream table. Both
    killed mid-flight, restarted in catch-up mode -> downstream sha-parity
    with primary, which itself matches the oracle replay."""
    import time as _time

    from kafka_connect_dynamodb_spark.streaming import tail
    from kafka_connect_dynamodb_spark.streaming.feed import mirror_changes
    from tests.oracle import final_hashes, replay

    base = source_table(spark, 120)
    ev = change_events(spark, 120, 800, pre_init_frac=0.0)
    slices = [ev.filter(ev.seq_no % 4 == k) for k in range(4)]
    log, cp_tail, cp_mirror = (str(tmp_path / d) for d in ("log", "cpt", "cpm"))

    primary = LakeTable(str(tmp_path / "primary"), change_feed=True)
    pipe = CdcPipeline(spark, primary, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    downstream = LakeTable(str(tmp_path / "downstream"))
    downstream.create(spark, base, ["repo", "path"], n_buckets=4)

    slices[0].coalesce(1).write.mode("append").parquet(log)
    q_tail = tail.start_tail(spark, log, primary, checkpoint_dir=cp_tail,
                             init_sync_start=DEFAULT_BASE_TS,
                             available_now=False,
                             processing_time="300 milliseconds")
    q_mirror = mirror_changes(spark, primary, downstream,
                              checkpoint_dir=cp_mirror, available_now=False,
                              processing_time="300 milliseconds")
    try:
        for k in (1, 2, 3):
            slices[k].coalesce(1).write.mode("append").parquet(log)
            _time.sleep(0.7)
        deadline = _time.time() + 60
        while _time.time() < deadline and primary.current_version() < 4:
            _time.sleep(0.3)
    finally:
        q_tail.stop()        # kill both mid-flight
        q_mirror.stop()

    # restart in catch-up mode from the same checkpoints
    tail.drain(tail.start_tail(spark, log, primary, checkpoint_dir=cp_tail,
                               init_sync_start=DEFAULT_BASE_TS))
    mirror_changes(spark, primary, downstream,
                   checkpoint_dir=cp_mirror).awaitTermination()

    state = replay([r.asDict() for r in base.collect()],
                   [r.asDict() for r in ev.collect()])
    assert _sha_state(primary.read(spark)) == final_hashes(state)
    assert _sha_state(downstream.read(spark)) == _sha_state(primary.read(spark))


def test_changes_is_single_scan_not_union(spark, tmp_path):
    """changes() over N commits must stay ONE FileScan (a per-commit union
    loop would grow the plan linearly — the 10k-commit-feed scale killer),
    with _commit recovered from the delta dir name."""
    base = source_table(spark, 40)
    ev = change_events(spark, 40, 300, pre_init_frac=0.0)
    table = LakeTable(str(tmp_path / "tbl"), change_feed=True)
    pipe = CdcPipeline(spark, table, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    for k in range(3):
        pipe.sync_batch(ev.filter(ev.seq_no % 3 == k), k)
    feed = table.changes(spark)
    plan = feed._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    versions = sorted(r["_commit"] for r in
                      feed.select("_commit").distinct().collect())
    assert versions == sorted(e["version"]
                              for e in table.manifest().change_files)


def test_resync_epoch_propagates_to_mirror(spark, tmp_path):
    """Danger-zone resync must flow to downstream consumers: replace() on a
    change_feed table publishes the snapshot as op-'r' rows (the reference
    re-publishes INIT_SYNC records to the topic), and mirror_changes
    truncates to the epoch then applies only later commits — so a mirror
    converges across a resync instead of silently diverging. Stale
    pre-resync deltas in the same micro-batch (real seq-nos > snapshot's 0)
    must NOT beat the snapshot rows."""
    from kafka_connect_dynamodb_spark.streaming.feed import mirror_changes

    base = source_table(spark, 60)
    ev = change_events(spark, 60, 300, pre_init_frac=0.0)

    primary = LakeTable(str(tmp_path / "primary"), change_feed=True)
    pipe = CdcPipeline(spark, primary, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    downstream = LakeTable(str(tmp_path / "downstream"))
    downstream.create(spark, base, ["repo", "path"], n_buckets=4)

    def consume():
        mirror_changes(spark, primary, downstream,
                       checkpoint_dir=str(tmp_path / "cp")).awaitTermination()

    # normal deltas, partially consumed...
    pipe.sync_batch(ev.filter(ev.seq_no % 2 == 0), 0)
    consume()
    # ...then MORE deltas the mirror has NOT consumed yet, then a resync:
    # the unconsumed pre-resync delta and the 'r' epoch land in the same
    # catch-up drain
    pipe.sync_batch(ev.filter(ev.seq_no % 2 == 1), 1)
    resynced = base.withColumn(
        "content", F.concat(F.col("content"), F.lit("@resync")))
    pipe.resync(resynced)
    consume()
    assert _sha_state(downstream.read(spark)) == _sha_state(primary.read(spark))
    # snapshot rows actually won: content carries the resync marker
    assert downstream.read(spark).filter(
        ~F.col("content").endswith("@resync")).count() == 0

    # post-resync stream continues; the mirror keeps converging
    pipe.sync_batch(ev.filter(ev.seq_no % 3 == 0), 0)
    consume()
    assert _sha_state(downstream.read(spark)) == _sha_state(primary.read(spark))


def test_mirror_multi_commit_batch_lww_reduced(spark, tmp_path):
    """ADVICE r3 (high): a catch-up mirror's micro-batch spans SEVERAL
    commits, so the feed carries one row per key PER COMMIT — but
    LakeTable.merge requires one row per key (its full-outer join emits one
    output row per update row). mirror_changes must LWW-reduce the batch
    first; without it the downstream table holds duplicate rows per key and
    diverges from the primary."""
    from kafka_connect_dynamodb_spark.streaming.feed import mirror_changes

    base = source_table(spark, 40)
    ev = change_events(spark, 40, 240, pre_init_frac=0.0)

    primary = LakeTable(str(tmp_path / "primary"), change_feed=True)
    pipe = CdcPipeline(spark, primary, n_buckets=4,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    downstream = LakeTable(str(tmp_path / "downstream"))
    downstream.create(spark, base, ["repo", "path"], n_buckets=4)

    # three commits land BEFORE the mirror ever runs -> all three deltas
    # arrive in ONE availableNow micro-batch, with the same keys repeated
    # across commits at ascending seq-nos
    for k in range(3):
        pipe.sync_batch(ev.filter(ev.seq_no % 3 == k), k)
    feed = primary.changes(spark)
    multi = (feed.groupBy("repo", "path").count()
                 .filter("count > 1").count())
    assert multi > 0            # the batch genuinely repeats keys

    mirror_changes(spark, primary, downstream,
                   checkpoint_dir=str(tmp_path / "cp")).awaitTermination()

    dupes = (downstream.read(spark).groupBy("repo", "path").count()
                       .filter("count > 1").count())
    assert dupes == 0
    assert _sha_state(downstream.read(spark)) == _sha_state(primary.read(spark))


def test_mirror_empty_batch_is_one_job_and_no_table_io(spark):
    """VERDICT r4 next #5: an idle processing-time mirror used to pay TWO
    no-op Spark jobs per empty trigger (epoch agg + emptiness count) and
    still reached for latest_per_key. Pin: an empty micro-batch costs
    exactly ONE probe job and never touches the downstream table."""
    from kafka_connect_dynamodb_spark.streaming.feed import apply_feed_batch

    calls = []

    class _Recorder:
        def replace(self, *a, **kw):
            calls.append("replace")

        def merge(self, *a, **kw):
            calls.append("merge")

    empty = spark.createDataFrame(
        [], "repo string, path string, content string, "
            "_seq decimal(38,0), _op string, _commit long")
    sc = spark.sparkContext
    sc.setJobGroup("empty-feed-batch", "pin probe job count")
    try:
        apply_feed_batch(empty, 7, downstream=_Recorder(),
                         key_cols=["repo", "path"])
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("empty-feed-batch")
    assert calls == []
    # ONE collect action; AQE materializes its partial/final agg stages as
    # up to two scheduler jobs. The old path (separate epoch agg + emptiness
    # count + lww plan) spent >= 3.
    assert len(jobs) <= 2, f"expected one probe action, saw {len(jobs)} jobs"
