"""Pre-image change feed + incrementally maintained aggregate views.

Pins: (1) the feed's Delta-CDF shape (applied-only posts, pre-images of
overwritten live rows, stale losers omitted); (2) the pure twin emits the
SAME deltas as the lake table; (3) an IncrementalAggView tracks a batch
recompute exactly through inserts, cross-group updates, deletes,
re-inserts, stale arrivals, crash redelivery, and a resync epoch; (4) the
exactness guard on floating sums."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.lake.table import LakeTable
from kafka_connect_dynamodb_spark.operators.incremental import (
    IncrementalAggView, feed_agg_delta, lww_apply_with_feed, merge_agg_delta)

SCHEMA = "key long, grp string, val long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _batch(spark, rows):
    """rows: (key, grp, val, op, seq) — payload nulled on deletes, as
    apply_batch does before merge."""
    df = spark.createDataFrame(rows, SCHEMA + ", _op string, _seq long")
    dead = F.col("_op") == "d"
    return (df.withColumn("grp", F.when(dead, None).otherwise(F.col("grp")))
              .withColumn("val", F.when(dead, None).otherwise(F.col("val"))))


BATCH1 = [(1, "a", 10, "c", 1), (2, "a", 20, "c", 2), (3, "b", 30, "c", 3)]
# key 1 moves a->b, key 2 deleted, key 4 inserted, key 3 stale (loses seq)
BATCH2 = [(1, "b", 11, "u", 10), (2, None, None, "d", 11),
          (4, "a", 40, "c", 12), (3, "b", 99, "u", 2)]
# key 2 re-inserted after delete, key 1 updated in place
BATCH3 = [(2, "b", 25, "c", 20), (1, "b", 12, "u", 21)]
# stale update for key 2 arriving AFTER its delete (seq < delete's 11)
STALE = [(2, "a", 999, "u", 5)]


def _mk_table(spark, tmp_path, name="src"):
    t = LakeTable(str(tmp_path / name), change_feed=True, feed_preimages=True)
    t.create(spark, _df(spark, []), ["key"], n_buckets=4)
    return t


def _feed_rows(spark, t, from_version=1):
    return {(r.key, r.grp, r.val, r._op, int(r._seq), r._commit)
            for r in t.changes(spark, from_version=from_version).collect()}


def test_preimage_feed_shape(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.merge(spark, _batch(spark, BATCH1), batch_id=1)
    t.merge(spark, _batch(spark, BATCH2), batch_id=2)

    c2 = {r[:5] for r in _feed_rows(spark, t) if r[5] == 2}
    c3 = {r[:5] for r in _feed_rows(spark, t) if r[5] == 3}
    assert c2 == {(1, "a", 10, "c", 1), (2, "a", 20, "c", 2),
                  (3, "b", 30, "c", 3)}
    assert c3 == {
        (1, "b", 11, "u", 10),       # applied post
        (1, "a", 10, "pu", 1),       # ...and the row it overwrote
        (2, None, None, "d", 11),    # delete post (tombstone)
        (2, "a", 20, "pd", 2),       # ...and the row it killed
        (4, "a", 40, "c", 12),       # brand-new: post only
        # key 3's stale 'u' (seq 2 < applied 3): OMITTED entirely
    }


def test_stale_after_delete_emits_nothing(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.merge(spark, _batch(spark, BATCH1), batch_id=1)
    t.merge(spark, _batch(spark, BATCH2), batch_id=2)
    v = t.current_version()
    t.merge(spark, _batch(spark, STALE), batch_id=3)
    assert _feed_rows(spark, t, from_version=v + 1) == set()
    live = {r.key for r in t.read(spark).collect()}
    assert 2 not in live


def test_twin_matches_lake_feed(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    state = (_df(spark, []).withColumn("_seq", F.lit(None).cast("long"))
             .withColumn("_deleted", F.lit(False)).filter("1=0"))
    twin_feed = set()
    for i, b in enumerate([BATCH1, BATCH2, BATCH3, STALE], start=1):
        t.merge(spark, _batch(spark, b), batch_id=i)
        state, feed = lww_apply_with_feed(state, _batch(spark, b), ["key"])
        state = state.localCheckpoint()
        twin_feed |= {(r.key, r.grp, r.val, r._op, int(r._seq))
                      for r in feed.collect()}
    lake_feed = {r[:5] for r in _feed_rows(spark, t) if r[3] != "r"
                 and r[5] > 1}   # skip the create snapshot
    assert twin_feed == lake_feed
    twin_live = {(r.key, r.grp, r.val)
                 for r in state.filter(~F.col("_deleted")).collect()}
    lake_live = {(r.key, r.grp, r.val) for r in t.read(spark).collect()}
    assert twin_live == lake_live


def _batch_recompute(spark, t):
    return {(r.grp, r.n_rows, r.sum_val) for r in
            t.read(spark).groupBy("grp")
             .agg(F.count(F.lit(1)).alias("n_rows"),
                  F.sum("val").alias("sum_val")).collect()}


def test_view_tracks_batch_recompute(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    view = IncrementalAggView(
        t, LakeTable(str(tmp_path / "view")), ["grp"], ["val"],
        view_buckets=2)
    for i, b in enumerate([BATCH1, BATCH2, BATCH3, STALE], start=1):
        t.merge(spark, _batch(spark, b), batch_id=i)
        res = view.refresh(spark)
        assert not res["skipped"]
        got = {(r.grp, r.n_rows, r.sum_val)
               for r in view.read(spark).collect()}
        assert got == _batch_recompute(spark, t), f"after batch {i}"
    # groups with zero live rows must have left the view ('a' after BATCH2
    # holds only key 4)
    assert ("a", 1, 40) in got


def test_bootstrap_over_snapshot_created_table(spark, tmp_path):
    """A table created from an INIT_SYNC snapshot publishes NO feed rows
    for its base — the first refresh must full-aggregate at a pinned
    version, then stay incremental (the drive-recipe gap)."""
    t = LakeTable(str(tmp_path / "snap"), change_feed=True,
                  feed_preimages=True)
    t.create(spark, _df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]),
             ["key"], n_buckets=4)
    view = IncrementalAggView(
        t, LakeTable(str(tmp_path / "view")), ["grp"], ["val"],
        view_buckets=2)
    assert view.refresh(spark)["bootstrap"]
    got = {(r.grp, r.n_rows, r.sum_val) for r in view.read(spark).collect()}
    assert got == {("a", 2, 30), ("b", 1, 30)} == _batch_recompute(spark, t)
    # snapshot rows have _seq=0, so merge seqs must exceed 0 to apply
    t.merge(spark, _batch(spark, BATCH2), batch_id=1)
    res = view.refresh(spark)
    assert not res["skipped"] and "bootstrap" not in res
    got = {(r.grp, r.n_rows, r.sum_val) for r in view.read(spark).collect()}
    assert got == _batch_recompute(spark, t)


def test_refresh_idempotent(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    view = IncrementalAggView(
        t, LakeTable(str(tmp_path / "view")), ["grp"], ["val"])
    t.merge(spark, _batch(spark, BATCH1), batch_id=1)
    r1 = view.refresh(spark)
    assert r1["bootstrap"] and r1["to_version"] == t.current_version()
    assert view.refresh(spark)["skipped"]          # crash-redelivery no-op
    v = view.view.current_version()
    assert view.refresh(spark)["skipped"] and view.view.current_version() == v


def test_resync_epoch_resets_view(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    view = IncrementalAggView(
        t, LakeTable(str(tmp_path / "view")), ["grp"], ["val"])
    t.merge(spark, _batch(spark, BATCH1), batch_id=1)
    view.refresh(spark)
    # danger-zone resync: the table is REPLACED with a fresh snapshot
    t.replace(spark, _df(spark, [(7, "z", 70), (8, "z", 80)]))
    t.merge(spark, _batch(spark, [(9, "y", 90, "c", 1)]), batch_id=1)
    res = view.refresh(spark)
    assert res["resync_epoch"] is not None
    got = {(r.grp, r.n_rows, r.sum_val) for r in view.read(spark).collect()}
    assert got == {("z", 2, 150), ("y", 1, 90)}
    assert got == _batch_recompute(spark, t)


def test_float_sum_rejected(spark, tmp_path):
    feed = spark.createDataFrame(
        [(1, "a", 1.5, "c", 1)], "key long, grp string, val double, "
                                 "_op string, _seq long")
    with pytest.raises(ValueError, match="order-sensitive"):
        feed_agg_delta(feed, ["grp"], ["val"])
    # explicit opt-in works
    d = feed_agg_delta(feed, ["grp"], ["val"], allow_inexact=True).collect()
    assert d[0]["sum_val"] == 1.5


def test_preimages_requires_change_feed(tmp_path):
    with pytest.raises(ValueError, match="requires change_feed"):
        LakeTable(str(tmp_path / "x"), feed_preimages=True)


def test_view_requires_preimage_source(spark, tmp_path):
    t = LakeTable(str(tmp_path / "plain"), change_feed=True)
    with pytest.raises(ValueError, match="feed_preimages"):
        IncrementalAggView(t, LakeTable(str(tmp_path / "v")), ["grp"])


def test_merge_agg_delta_zero_group_leaves(spark):
    view = spark.createDataFrame([("a", 2, 30), ("b", 1, 5)],
                                 "grp string, n_rows long, sum_val long")
    delta = spark.createDataFrame([("a", -2, -30), ("c", 1, 7)],
                                  "grp string, n_rows long, sum_val long")
    got = {(r.grp, r.n_rows, r.sum_val)
           for r in merge_agg_delta(view, delta, ["grp"]).collect()}
    assert got == {("b", 1, 5), ("c", 1, 7)}
