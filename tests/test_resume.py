"""Mid-snapshot resume: the exclusive_start_key analog (SourceInfo.java:115,
DynamoDBSourceTask.java:229-249). A killed INIT_SYNC restarts from the first
unfinished file chunk, not from zero, and converges to the same table as an
uninterrupted snapshot."""

from __future__ import annotations

import json

from kafka_connect_dynamodb_spark.lake.table import LakeTable
from kafka_connect_dynamodb_spark.plans.pipeline import CdcPipeline
from kafka_connect_dynamodb_spark.plans.state import InitSyncStatus
from kafka_connect_dynamodb_spark.sources.generator import (
    DEFAULT_BASE_TS, source_table)

CLOCK = lambda: DEFAULT_BASE_TS.timestamp()  # noqa: E731


def _rows(table, spark):
    return {(r["repo"], r["path"], r["content"])
            for r in table.read(spark).collect()}


def test_mid_snapshot_resume_kill_at_half(spark, tmp_path):
    base = source_table(spark, 300)
    snap = str(tmp_path / "snap")
    base.repartition(8).write.parquet(snap)

    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=8, clock=CLOCK)
    # "kill at 50%": budget the run to 4 of 8 chunks
    info = pipe.init_sync_resumable(snap, n_chunks=8, max_chunks_this_run=4)
    assert info.init_sync_state == InitSyncStatus.RUNNING
    assert json.loads(info.exclusive_start_key)["next_chunk"] == 4
    partial = table.read(spark).count()
    assert 0 < partial < 300

    # restart: brand-new pipeline + table objects, state reloaded from the
    # manifest; must finish from chunk 4 without redoing chunks 0-3
    table2 = LakeTable(str(tmp_path / "tbl"))
    pipe2 = CdcPipeline(spark, table2, n_buckets=8, clock=CLOCK)
    info2 = pipe2.init_sync_resumable(snap, n_chunks=8)
    assert info2.init_sync_state == InitSyncStatus.FINISHED
    assert info2.init_sync_count == 300
    assert info2.exclusive_start_key is None

    # every chunk committed exactly once across both runs
    assert table2.manifest().committed["init_sync"] == 7
    merges = [e for e in table2.manifest().lineage
              if e.get("source") == "init_sync" and e.get("op") == "merge"]
    assert sorted(e["batch_id"] for e in merges) == list(range(8))

    # parity with an uninterrupted one-shot snapshot
    oneshot = LakeTable(str(tmp_path / "tbl_oneshot"))
    CdcPipeline(spark, oneshot, n_buckets=8, clock=CLOCK).init_sync(base)
    assert _rows(table2, spark) == _rows(oneshot, spark)


def test_resume_restarts_when_snapshot_layout_changes(spark, tmp_path):
    """A changed file layout invalidates the stored progress: the snapshot
    restarts from scratch instead of resuming against the wrong chunks."""
    base = source_table(spark, 120)
    snap = str(tmp_path / "snap")
    base.repartition(4).write.parquet(snap)

    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=4, clock=CLOCK)
    info = pipe.init_sync_resumable(snap, n_chunks=4, max_chunks_this_run=2)
    assert info.init_sync_state == InitSyncStatus.RUNNING

    # snapshot rewritten with a different file count -> full restart
    snap2 = str(tmp_path / "snap2")
    base.repartition(6).write.parquet(snap2)
    info2 = pipe.init_sync_resumable(snap2, n_chunks=4)
    assert info2.init_sync_state == InitSyncStatus.FINISHED
    assert info2.init_sync_count == 120
    assert table.read(spark).count() == 120


def test_resumable_count_no_table_scan_and_crash_window_heal(spark, tmp_path):
    """VERDICT r6 next #2: the resumable snapshot's final count is the
    accumulated per-chunk merge rows_in (the one-shot path's Observation
    analog), NOT a table-wide read. Pin both properties:

    1. a crash between a chunk's commit and its state save loses the
       chunk's running-sum entry — the resume heals it from the manifest
       lineage and the final count is still exact;
    2. the finishing call, when no chunks remain, launches ZERO Spark jobs
       (the old code spent a full table scan here)."""
    from kafka_connect_dynamodb_spark.plans.pipeline import STATE_PROP

    base = source_table(spark, 300)
    snap = str(tmp_path / "snap")
    base.repartition(8).write.parquet(snap)

    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=8, clock=CLOCK)
    info = pipe.init_sync_resumable(snap, n_chunks=8, max_chunks_this_run=4)
    assert info.init_sync_state == InitSyncStatus.RUNNING
    running_state = info.to_json()          # next_chunk=4, rows for 0-3

    # crash window: rewind the SAVED progress two chunks behind the
    # manifest (chunks 2-3 committed, their rows never added to the sum)
    key = json.loads(info.exclusive_start_key)
    rows_01 = None
    # recompute what the state would have held after chunk 1: heal must
    # make up the difference from lineage, so corrupt rows_so_far too
    merges = {e["batch_id"]: e for e in table.manifest().lineage
              if e.get("source") == "init_sync" and e.get("op") == "merge"}
    rows_01 = merges[0]["rows_in"] + merges[1]["rows_in"]
    info.exclusive_start_key = json.dumps(
        {**key, "next_chunk": 2, "rows_so_far": rows_01})
    pipe.save_state(info)

    table2 = LakeTable(str(tmp_path / "tbl"))
    pipe2 = CdcPipeline(spark, table2, n_buckets=8, clock=CLOCK)
    info2 = pipe2.init_sync_resumable(snap, n_chunks=8)
    assert info2.init_sync_state == InitSyncStatus.FINISHED
    assert info2.init_sync_count == 300     # healed: exact despite the gap

    # zero-job finish: restore a RUNNING state whose chunks are ALL
    # committed (crash after the last chunk's save, before end_init_sync);
    # the finishing call must not touch data files at all
    done_key = json.dumps({"next_chunk": 8, "n_chunks": 8,
                           "n_files": 8, "rows_so_far": 300})
    st = json.loads(running_state)
    st["exclusive_start_key"] = done_key
    table2.update_properties({STATE_PROP: json.dumps(st)})
    sc = spark.sparkContext
    sc.setJobGroup("resumable-finish", "pin zero-job finish")
    try:
        info3 = CdcPipeline(spark, LakeTable(str(tmp_path / "tbl")),
                            n_buckets=8, clock=CLOCK
                            ).init_sync_resumable(snap, n_chunks=8)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("resumable-finish")
    assert info3.init_sync_state == InitSyncStatus.FINISHED
    assert info3.init_sync_count == 300
    assert len(jobs) == 0, f"finish launched {len(jobs)} jobs, expected 0"
