"""End-to-end replay parity: engine final state == naive oracle replay,
per-row sha256(content) equality (BASELINE.json input_hint; the analog of the
reference's init-sync/stream-switchover integration tests,
DynamoDBSourceConnectorIT.java:41-59)."""

from datetime import timezone

import pytest
from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.lake.table import LakeTable
from kafka_connect_dynamodb_spark.operators.apply import DangerZoneError, prepare_batch
from kafka_connect_dynamodb_spark.plans.pipeline import CdcPipeline
from kafka_connect_dynamodb_spark.plans.state import InitSyncStatus
from kafka_connect_dynamodb_spark.sources.generator import (
    DEFAULT_BASE_TS, change_events, source_table)
from tests.oracle import final_hashes, replay

N_KEYS, N_EVENTS = 400, 3000
CLOCK = DEFAULT_BASE_TS.timestamp()


def engine_hashes(spark, table):
    rows = table.read(spark).withColumn("h", F.sha2(F.coalesce("content", F.lit("")), 256))
    return {(r.repo, r.path): r.h for r in rows.select("repo", "path", "h").collect()}


def oracle_hashes(spark, base_df, events_df, init_sync_start=None):
    base = [r.asDict() for r in base_df.collect()]
    evs = [r.asDict() for r in events_df.collect()]
    for e in evs:
        e["ts"] = e["ts"].replace(tzinfo=timezone.utc)
    return final_hashes(replay(base, evs, init_sync_start=init_sync_start))


def test_minimum_slice_parity(spark, tmp_path):
    base = source_table(spark, N_KEYS)
    events = change_events(spark, N_KEYS, N_EVENTS, pre_init_frac=0.05)

    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=8, clock=lambda: CLOCK)
    pipe.run(base, events)

    assert pipe.load_state().init_sync_state == InitSyncStatus.FINISHED
    eng = engine_hashes(spark, table)
    ora = oracle_hashes(spark, base, events, init_sync_start=DEFAULT_BASE_TS)
    assert eng == ora
    assert len(eng) > N_KEYS * 0.5  # sanity: non-trivial final state


def test_parity_with_duplicates_and_deletes(spark, tmp_path):
    events = change_events(spark, N_KEYS, N_EVENTS, dup_frac=0.3, delete_frac=0.3,
                           pre_init_frac=0.0)
    base = source_table(spark, N_KEYS)
    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=8, clock=lambda: CLOCK)
    pipe.run(base, events)
    assert engine_hashes(spark, table) == oracle_hashes(spark, base, events,
                                                        init_sync_start=DEFAULT_BASE_TS)


def test_multi_batch_parity_matches_single_batch(spark, tmp_path):
    """Splitting the log into micro-batches by seq range must give the same
    final state (cross-batch LWW guard)."""
    base = source_table(spark, N_KEYS)
    events = change_events(spark, N_KEYS, N_EVENTS, pre_init_frac=0.0)
    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=8, clock=lambda: CLOCK)
    pipe.init_sync(base)
    # out-of-order batches: later seqs applied first, then earlier ones
    hi = events.filter(F.col("seq_no") >= F.lit("9999900000000000000001500").cast("decimal(38,0)"))
    lo = events.filter(F.col("seq_no") < F.lit("9999900000000000000001500").cast("decimal(38,0)"))
    pipe.sync_batch(hi, 0)
    pipe.sync_batch(lo, 1)
    assert engine_hashes(spark, table) == oracle_hashes(spark, base, events,
                                                        init_sync_start=DEFAULT_BASE_TS)


def test_schema_evolution_parity(spark, tmp_path):
    base = source_table(spark, N_KEYS)
    events = change_events(spark, N_KEYS, N_EVENTS, evolve_frac=0.3, pre_init_frac=0.0)
    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=8, clock=lambda: CLOCK)
    pipe.run(base, events)
    out = table.read(spark)
    assert "branch" in out.columns
    assert out.filter(F.col("branch").isNotNull()).count() > 0
    assert engine_hashes(spark, table) == oracle_hashes(spark, base, events,
                                                        init_sync_start=DEFAULT_BASE_TS)


def test_danger_zone_triggers_resync(spark, tmp_path):
    base = source_table(spark, N_KEYS)
    events = change_events(spark, N_KEYS, 500, danger_event=True, pre_init_frac=0.0)
    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=8, clock=lambda: CLOCK)
    pipe.init_sync(base)
    with pytest.raises(DangerZoneError):
        pipe.sync_batch(events, 0, danger_check=True)
    # recovery path: resync then re-apply works
    pipe.resync(base)
    pipe.sync_batch(events, 0)
    assert pipe.load_state().init_sync_state == InitSyncStatus.FINISHED


def test_prepare_batch_is_fully_jvm(spark):
    """The hot path must contain no Python row processing: no BatchEvalPython
    / ArrowEvalPython / mapInPandas nodes in the physical plan."""
    events = change_events(spark, 50, 200)
    plan = prepare_batch(events)._sc._jvm if False else None
    explained = prepare_batch(events)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in explained
