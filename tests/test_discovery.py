"""S1/S2/S4/T9: tag discovery, whitelist, rediscovery poll, init-sync start
delay — the multi-table control plane over the single-table engine
(DynamoDBSourceConnector.java:83-145, DynamoDBSourceConnectorConfig.java:18)."""

from __future__ import annotations

import os

from kafka_connect_dynamodb_spark.plans.discovery import (
    MultiTablePipeline, discover_tables)
from kafka_connect_dynamodb_spark.sources.generator import (
    DEFAULT_BASE_TS, change_events, source_table)

BASE = DEFAULT_BASE_TS.timestamp()


def _mk_table(spark, root, name, n_keys=60, n_events=200, tagged=True):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    if tagged:
        open(os.path.join(d, "cdc_enabled"), "w").close()
    source_table(spark, n_keys).write.mode("overwrite") \
        .parquet(os.path.join(d, "snapshot"))
    if n_events:
        change_events(spark, n_keys, n_events, pre_init_frac=0.0) \
            .coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "log"))


def test_tag_discovery_skips_untagged(spark, tmp_path):
    root = str(tmp_path / "src")
    _mk_table(spark, root, "alpha", tagged=True)
    _mk_table(spark, root, "beta", tagged=False)
    specs = discover_tables(root)
    assert [s.name for s in specs] == ["alpha"]


def test_whitelist_overrides_tags(spark, tmp_path):
    root = str(tmp_path / "src")
    _mk_table(spark, root, "alpha", tagged=False)
    _mk_table(spark, root, "beta", tagged=True)
    specs = discover_tables(root, whitelist=["alpha"])
    assert [s.name for s in specs] == ["alpha"]


def test_rediscovery_picks_up_new_table(spark, tmp_path):
    root = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    _mk_table(spark, root, "alpha")

    mt = MultiTablePipeline(spark, root, lake, n_buckets=4,
                            clock=lambda: BASE)
    assert mt.poll() == {"alpha": "synced"}
    assert mt.read("alpha").count() > 0

    # a table tagged AFTER the first poll joins on the next cycle (S4)
    _mk_table(spark, root, "gamma")
    statuses = mt.poll()
    assert statuses == {"alpha": "synced", "gamma": "synced"}
    assert mt.read("gamma").count() > 0
    # re-polling an unchanged fleet applies nothing new (checkpointed tails)
    before = {n: s["batches_applied"] for n, s in mt.statuses().items()}
    mt.poll()
    after = {n: s["batches_applied"] for n, s in mt.statuses().items()}
    assert after == before


def test_init_sync_start_delay_t9(spark, tmp_path):
    root = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    _mk_table(spark, root, "alpha", n_events=0)

    now = {"t": BASE}
    mt = MultiTablePipeline(spark, root, lake, n_buckets=4,
                            init_sync_delay_s=60.0, clock=lambda: now["t"])
    # within the delay window: discovered but NOT snapshotted yet
    assert mt.poll() == {"alpha": "pending"}
    assert not mt.table_for("alpha").exists()
    # clock passes the delay -> INIT_SYNC runs
    now["t"] = BASE + 61
    assert mt.poll() == {"alpha": "synced"}
    assert mt.read("alpha").count() == 60


def test_poll_advances_tables_concurrently(spark, tmp_path):
    """VERDICT r2 next #6: per-table work in one poll() cycle overlaps (the
    reference gets this from one Connect task per table; here a thread pool
    multiplexes independent per-table jobs on the shared SparkSession)."""
    import threading

    from kafka_connect_dynamodb_spark.plans import discovery as disc
    from kafka_connect_dynamodb_spark.streaming import tail as tail_mod

    root = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    for name in ("t1", "t2", "t3"):
        _mk_table(spark, root, name, n_keys=30, n_events=100)

    # all 3 tables must be inside drain AT THE SAME TIME for the barrier to
    # release — a serial poll() would run drains one-by-one and time out
    barrier = threading.Barrier(3, timeout=60)
    real_drain = tail_mod.drain

    def rendezvous_drain(q):
        barrier.wait()
        return real_drain(q)

    mt = MultiTablePipeline(spark, root, lake, n_buckets=4,
                            clock=lambda: BASE)
    orig = disc.tail.drain
    disc.tail.drain = rendezvous_drain
    try:
        statuses = mt.poll()
    finally:
        disc.tail.drain = orig

    assert statuses == {"t1": "synced", "t2": "synced", "t3": "synced"}
    assert not barrier.broken          # overlapping per-table execution
    for name in ("t1", "t2", "t3"):
        assert mt.read(name).count() > 0   # deletes in the log shrink keys


def test_fleet_change_feed_option(spark, tmp_path):
    """change_feed=True on the fleet: every table's merges publish deltas a
    downstream mirror can consume."""
    root, lake = str(tmp_path / "src"), str(tmp_path / "lake")
    _mk_table(spark, root, "alpha", n_keys=30, n_events=100)
    mt = MultiTablePipeline(spark, root, lake, n_buckets=4,
                            change_feed=True, clock=lambda: BASE)
    assert mt.poll() == {"alpha": "synced"}
    feed = mt.table_for("alpha").changes(spark)
    assert feed.count() > 0 and "_op" in feed.columns


def test_poll_surfaces_all_table_failures(spark, tmp_path):
    """ADVICE r3 (low): when SEVERAL tables fail in one poll() cycle, every
    exception must surface (ExceptionGroup), not just the first-submitted
    one; healthy tables still advance."""
    import pytest

    root = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    for name in ("ok1", "bad1", "bad2"):
        _mk_table(spark, root, name, n_keys=20, n_events=60)

    mt = MultiTablePipeline(spark, root, lake, n_buckets=4,
                            clock=lambda: BASE)
    orig_advance = mt._advance

    def flaky_advance(run):
        if run.spec.name.startswith("bad"):
            raise RuntimeError(f"boom:{run.spec.name}")
        return orig_advance(run)

    mt._advance = flaky_advance
    with pytest.raises(ExceptionGroup) as ei:
        mt.poll()
    msgs = sorted(str(e) for e in ei.value.exceptions)
    assert msgs == ["boom:bad1", "boom:bad2"]
    assert mt.tables["ok1"].status == "synced"

    # exactly one failure -> the bare exception propagates (not a group)
    def one_bad(run):
        if run.spec.name == "bad1":
            raise RuntimeError("boom:bad1")
        return orig_advance(run)

    mt._advance = one_bad
    with pytest.raises(RuntimeError, match="boom:bad1"):
        mt.poll()


def test_fleet_resync_soak_with_mirror_and_siblings(spark, tmp_path):
    """VERDICT r4 #9 — the untested interaction of r3's features: a
    danger-zone resync of ONE table inside MultiTablePipeline.poll() while
    sibling tables keep streaming in the same (parallel) cycle and a
    downstream mirror races beta's change feed across the resync epoch.
    Pins sha-parity on every fleet table AND the mirror.

    Oracle note: resync re-reads the table's snapshot dir (in production
    the re-snapshot includes all changes the source absorbed; here the dir
    is static), so beta's expected state is replay(snapshot, post-resync
    batch minus the danger event the new sync start F2-drops)."""
    import hashlib

    from pyspark.sql import functions as F

    from kafka_connect_dynamodb_spark.lake.table import LakeTable
    from kafka_connect_dynamodb_spark.streaming.feed import mirror_changes
    from tests.oracle import final_hashes, replay

    def sha_state(df):
        return {(r["repo"], r["path"]):
                hashlib.sha256((r["content"] or "").encode()).hexdigest()
                for r in df.collect()}

    root, lake = str(tmp_path / "src"), str(tmp_path / "lake")
    # alpha/gamma: healthy siblings; beta: second slice carries the danger event
    for name in ("alpha", "beta", "gamma"):
        _mk_table(spark, root, name, n_keys=40, n_events=0)
    ev = {n: change_events(spark, 40, 240, pre_init_frac=0.0,
                           danger_event=(n == "beta"))
          for n in ("alpha", "beta", "gamma")}
    # decimal(38,0) seq-nos lose precision through float percentile; take
    # the exact median from the sorted distinct values instead
    def _median_seq(e):
        seqs = [r["seq_no"] for r in
                e.select("seq_no").distinct().orderBy("seq_no").collect()]
        return seqs[len(seqs) // 2]

    half = {n: _median_seq(e) for n, e in ev.items()}
    for n in ("alpha", "beta", "gamma"):
        (ev[n].filter(F.col("seq_no") <= half[n]).coalesce(1)
              .write.mode("append").parquet(os.path.join(root, n, "log")))

    mt = MultiTablePipeline(spark, root, lake, n_buckets=4,
                            change_feed=True, clock=lambda: BASE)
    assert mt.poll() == {n: "synced" for n in ("alpha", "beta", "gamma")}

    # mirror bootstraps from beta's post-slice-1 state, then consumes feed
    beta = mt.table_for("beta")
    mirror = LakeTable(str(tmp_path / "mirror"))
    mirror.create(spark, beta.read(spark), ["repo", "path"], n_buckets=4)
    cp = str(tmp_path / "cp_mirror")
    mirror_changes(spark, beta, mirror, checkpoint_dir=cp).awaitTermination()
    assert sha_state(mirror.read(spark)) == sha_state(beta.read(spark))

    # slice 2: siblings advance normally; beta's slice contains the danger
    # event (ts = base - 30h) -> poll resyncs beta IN-CYCLE, siblings sync
    for n in ("alpha", "beta", "gamma"):
        (ev[n].filter(F.col("seq_no") > half[n]).coalesce(1)
              .write.mode("append").parquet(os.path.join(root, n, "log")))
    statuses = mt.poll()
    assert statuses == {"alpha": "synced", "beta": "resynced",
                        "gamma": "synced"}

    # sibling parity: full replay of snapshot + all events
    for n in ("alpha", "gamma"):
        base_rows = [r.asDict() for r in
                     spark.read.parquet(os.path.join(root, n, "snapshot")).collect()]
        want = final_hashes(replay(base_rows,
                                   [r.asDict() for r in ev[n].collect()]))
        assert sha_state(mt.read(n)) == want, n

    # beta parity: resynced snapshot + post-resync batch minus danger event
    base_rows = [r.asDict() for r in
                 spark.read.parquet(os.path.join(root, "beta", "snapshot")).collect()]
    cutoff = DEFAULT_BASE_TS.timestamp() - 3600
    post = (ev["beta"].filter((F.col("seq_no") > half["beta"])
                              & (F.col("ts").cast("double") > cutoff)))
    want = final_hashes(replay(base_rows, [r.asDict() for r in post.collect()]))
    assert sha_state(mt.read("beta")) == want

    # the mirror crosses the resync epoch (r-rows + later deltas in one
    # catch-up) and converges to the resynced beta
    mirror_changes(spark, beta, mirror, checkpoint_dir=cp).awaitTermination()
    assert sha_state(mirror.read(spark)) == sha_state(beta.read(spark))
