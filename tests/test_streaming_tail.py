"""Streaming tail: checkpointed resume, kill/restart parity, idempotent
re-drain, and schema evolution through the stream path.

Mirrors the reference's offset-resume contract (SourceInfo.java:107-147,
DynamoDBSourceTaskTests.java:169-193) and its switchover test strategy
(DynamoDBSourceConnectorIT.java:41-59: snapshot messages, then stream
messages after new writes) — re-expressed as: drain, append to the log,
re-drain the same checkpoint, and require sha256 parity with a one-shot
oracle replay of the full log.
"""

from __future__ import annotations

import hashlib
import os

from kafka_connect_dynamodb_spark.lake.table import LakeTable
from kafka_connect_dynamodb_spark.plans.pipeline import CdcPipeline
from kafka_connect_dynamodb_spark.sources.generator import (
    DEFAULT_BASE_TS, change_events, source_table)
from kafka_connect_dynamodb_spark.streaming import tail

from tests.oracle import final_hashes, replay

N_KEYS, N_EVENTS = 200, 1500


def _hashes_of(table, spark):
    return {(r["repo"], r["path"]):
            hashlib.sha256((r["content"] or "").encode()).hexdigest()
            for r in table.read(spark).collect()}


def _oracle(base, events):
    state = replay([r.asDict() for r in base.collect()],
                   [r.asDict() for r in events.collect()])
    return final_hashes(state)


def _pipeline(spark, tmp_path, base):
    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=8,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    return table, pipe


def test_drain_then_append_resumes_from_checkpoint(spark, tmp_path):
    """Kill/restart: drain half the log, 'restart' (new query object, same
    checkpoint), append the rest, re-drain -> final state identical to a
    one-shot replay of the whole log."""
    base = source_table(spark, N_KEYS)
    ev = change_events(spark, N_KEYS, N_EVENTS, pre_init_frac=0.0)
    first = ev.filter(ev.seq_no % 2 == 0)
    second = ev.filter(ev.seq_no % 2 == 1)

    log = str(tmp_path / "log")
    cp = str(tmp_path / "cp")
    first.coalesce(2).write.mode("append").parquet(log)

    table, _ = _pipeline(spark, tmp_path, base)
    q = tail.start_tail(spark, log, table, checkpoint_dir=cp,
                        init_sync_start=DEFAULT_BASE_TS)
    q.awaitTermination()
    v_half = table.current_version()

    # "crash + restart": brand-new query, same checkpoint; more data arrives
    second.coalesce(2).write.mode("append").parquet(log)
    q2 = tail.start_tail(spark, log, table, checkpoint_dir=cp,
                         init_sync_start=DEFAULT_BASE_TS)
    q2.awaitTermination()
    assert table.current_version() > v_half

    assert _hashes_of(table, spark) == _oracle(base, ev)


def test_redrain_without_new_data_is_noop(spark, tmp_path):
    """Exactly-once: re-running the drained query against the same checkpoint
    commits nothing (no new version, idempotent batch ids)."""
    base = source_table(spark, N_KEYS)
    ev = change_events(spark, N_KEYS, N_EVENTS, pre_init_frac=0.0)
    log = str(tmp_path / "log")
    cp = str(tmp_path / "cp")
    ev.coalesce(2).write.parquet(log)

    table, _ = _pipeline(spark, tmp_path, base)
    tail.drain(tail.start_tail(spark, log, table, checkpoint_dir=cp,
                               init_sync_start=DEFAULT_BASE_TS))
    v0 = table.current_version()
    tail.drain(tail.start_tail(spark, log, table, checkpoint_dir=cp,
                               init_sync_start=DEFAULT_BASE_TS))
    assert table.current_version() == v0


def test_lost_checkpoint_replay_is_idempotent(spark, tmp_path):
    """Worst-case redelivery: checkpoint wiped, the WHOLE log replays under a
    fresh source name. LWW-by-seq + tombstone guard make the duplicate replay
    converge to the same state (at-least-once input, exactly-once effect)."""
    base = source_table(spark, N_KEYS)
    ev = change_events(spark, N_KEYS, N_EVENTS, pre_init_frac=0.0)
    log = str(tmp_path / "log")
    ev.coalesce(2).write.parquet(log)

    table, _ = _pipeline(spark, tmp_path, base)
    tail.drain(tail.start_tail(spark, log, table,
                               checkpoint_dir=str(tmp_path / "cp1"),
                               init_sync_start=DEFAULT_BASE_TS))
    want = _hashes_of(table, spark)
    # checkpoint lost -> new checkpoint dir AND new source name: every batch
    # re-applies; the merge itself must be semantically idempotent
    tail.drain(tail.start_tail(spark, log, table, source="stream-replay",
                               checkpoint_dir=str(tmp_path / "cp2"),
                               init_sync_start=DEFAULT_BASE_TS))
    assert _hashes_of(table, spark) == want
    assert want == _oracle(base, ev)


def test_schema_evolution_through_stream(spark, tmp_path):
    """Additive evolution mid-stream: later events carry a 'branch' attribute;
    the table schema widens, earlier rows read as null."""
    base = source_table(spark, N_KEYS)
    ev = change_events(spark, N_KEYS, N_EVENTS, pre_init_frac=0.0,
                       evolve_frac=0.3)
    log = str(tmp_path / "log")
    ev.coalesce(2).write.parquet(log)

    table, _ = _pipeline(spark, tmp_path, base)
    tail.drain(tail.start_tail(spark, log, table,
                               checkpoint_dir=str(tmp_path / "cp"),
                               init_sync_start=DEFAULT_BASE_TS))
    out = table.read(spark)
    assert "branch" in out.columns
    vals = {r["branch"] for r in out.select("branch").distinct().collect()}
    assert None in vals and any(v is not None for v in vals)
    assert _hashes_of(table, spark) == _oracle(base, ev)


def test_json_format_log_source(spark, tmp_path):
    """S6 over a JSON-shipped log: same parity through log_format='json'."""
    base = source_table(spark, N_KEYS)
    ev = change_events(spark, N_KEYS, N_EVENTS, pre_init_frac=0.0)
    log = str(tmp_path / "log")
    ev.coalesce(2).write.json(log)

    table, _ = _pipeline(spark, tmp_path, base)
    tail.drain(tail.start_tail(spark, log, table,
                               checkpoint_dir=str(tmp_path / "cp"),
                               init_sync_start=DEFAULT_BASE_TS,
                               log_format="json"))
    assert _hashes_of(table, spark) == _oracle(base, ev)


def test_per_batch_clock_trips_danger_zone_midstream(spark, tmp_path):
    """F3 with a LIVE clock: the danger-zone 'now' is evaluated per
    micro-batch (DynamoDBSourceTask.java:318-331), not snapshotted at query
    start. Batch 1 passes under a fresh clock; the clock then advances 40h,
    and the next batch of (now-stale) events must fail the query with
    DangerZoneError. Recovery = resync + re-tail, ending at oracle parity."""
    import time as _time

    import pytest
    from datetime import timedelta

    base = source_table(spark, 50)
    ev = change_events(spark, 50, 400, pre_init_frac=0.0)
    first = ev.filter(ev.seq_no % 2 == 0)
    second = ev.filter(ev.seq_no % 2 == 1)

    log = str(tmp_path / "log")
    cp = str(tmp_path / "cp")
    first.coalesce(1).write.mode("append").parquet(log)

    table, pipe = _pipeline(spark, tmp_path, base)
    fake = {"now": DEFAULT_BASE_TS + timedelta(hours=1)}
    metrics: list[dict] = []
    q = tail.start_tail(spark, log, table, checkpoint_dir=cp,
                        init_sync_start=DEFAULT_BASE_TS,
                        clock=lambda: fake["now"],
                        available_now=False, processing_time="500 milliseconds",
                        metrics=metrics)
    try:
        deadline = _time.time() + 60
        while not metrics and _time.time() < deadline:
            _time.sleep(0.2)
        assert metrics, "first batch never applied under the fresh clock"

        # live tail ages 40h; the same-aged events are now beyond the 20h zone
        fake["now"] = DEFAULT_BASE_TS + timedelta(hours=40)
        second.coalesce(1).write.mode("append").parquet(log)
        deadline = _time.time() + 60
        while q.exception() is None and _time.time() < deadline:
            _time.sleep(0.2)
        exc = q.exception()
        assert exc is not None and "DangerZone" in str(exc)
    finally:
        if q.isActive:
            q.stop()

    # T1 recovery: resync (fresh snapshot) then drain the whole log with the
    # danger check off (historical replay) -> parity with the oracle replay.
    pipe.resync(base)
    tail.drain(tail.start_tail(spark, log, table,
                               checkpoint_dir=str(tmp_path / "cp2"),
                               init_sync_start=DEFAULT_BASE_TS))
    assert _hashes_of(table, spark) == _oracle(base, ev)


def test_live_trigger_kill_restart_soak(spark, tmp_path):
    """T4/T5/T6 under a LIVE processingTime trigger (not availableNow):
    slices arrive while the query runs, the query is killed mid-stream,
    a new query resumes the same checkpoint, and the final drain converges
    to oracle parity with no duplicate application."""
    import time as _time

    base = source_table(spark, N_KEYS)
    ev = change_events(spark, N_KEYS, N_EVENTS, pre_init_frac=0.0)
    slices = [ev.filter(ev.seq_no % 3 == k) for k in range(3)]

    log = str(tmp_path / "log")
    cp = str(tmp_path / "cp")
    table, _ = _pipeline(spark, tmp_path, base)

    def _wait_applied(metrics, want, timeout=60):
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            if sum(m.get("rows_in", 0) for m in metrics
                   if not m.get("skipped")) >= want:
                return True
            _time.sleep(0.2)
        return False

    # live session 1: slice 0 pre-exists, slice 1 arrives while running
    slices[0].coalesce(1).write.mode("append").parquet(log)
    m1: list[dict] = []
    q = tail.start_tail(spark, log, table, checkpoint_dir=cp,
                        init_sync_start=DEFAULT_BASE_TS,
                        available_now=False,
                        processing_time="500 milliseconds", metrics=m1)
    try:
        assert _wait_applied(m1, 1)
        slices[1].coalesce(1).write.mode("append").parquet(log)
        deadline = _time.time() + 60
        while len(m1) < 2 and _time.time() < deadline:
            _time.sleep(0.2)
    finally:
        q.stop()   # kill mid-stream
    v_mid = table.current_version()

    # live session 2: resumes the same checkpoint; a third slice arrives
    m2: list[dict] = []
    q2 = tail.start_tail(spark, log, table, checkpoint_dir=cp,
                         init_sync_start=DEFAULT_BASE_TS,
                         available_now=False,
                         processing_time="500 milliseconds", metrics=m2)
    try:
        slices[2].coalesce(1).write.mode("append").parquet(log)
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if any(not m.get("skipped") and m.get("rows_in", 0) > 0 for m in m2):
                _time.sleep(1.0)   # let the trigger quiesce
                break
            _time.sleep(0.2)
    finally:
        q2.stop()
    assert table.current_version() > v_mid

    # final availableNow drain picks up anything still unread, then parity
    tail.drain(tail.start_tail(spark, log, table, checkpoint_dir=cp,
                               init_sync_start=DEFAULT_BASE_TS))
    assert _hashes_of(table, spark) == _oracle(base, ev)


def test_stream_after_snapshot_drops_pre_init_events(spark, tmp_path):
    """F2 through the stream: events older than init_sync_start - 1h are
    dropped (covered by the snapshot), newer ones apply."""
    base = source_table(spark, N_KEYS)
    ev = change_events(spark, N_KEYS, N_EVENTS, pre_init_frac=0.2)
    log = str(tmp_path / "log")
    cp = str(tmp_path / "cp")
    ev.coalesce(2).write.parquet(log)

    table, _ = _pipeline(spark, tmp_path, base)
    tail.drain(tail.start_tail(spark, log, table, checkpoint_dir=cp,
                               init_sync_start=DEFAULT_BASE_TS))

    # Spark collects session-TZ-naive datetimes (session pinned UTC);
    # make them aware before comparing against the aware init_sync_start.
    from datetime import timezone
    ev_rows = []
    for r in ev.collect():
        d = r.asDict()
        d["ts"] = d["ts"].replace(tzinfo=timezone.utc)
        ev_rows.append(d)
    state = replay([r.asDict() for r in base.collect()], ev_rows,
                   init_sync_start=DEFAULT_BASE_TS)
    assert _hashes_of(table, spark) == final_hashes(state)
