"""Continuous SCD2 dimension maintenance (streaming/scd2.py).

Pins: (1) the drained stream's history == the batch operator over the whole
log (the streaming/batch equivalence every other streaming twin here keeps);
(2) exactly-once — a crash between the closed-partition write and the MERGE
redelivers into byte-identical output, and a completed batch's redelivery is
a no-op; (3) the closed partitions really are append-only (earlier batches'
files untouched by later batches); (4) dead keys leave `current` and
re-inserts open fresh versions across batch boundaries."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_dynamodb_spark.lake.table import LakeTable
from kafka_connect_dynamodb_spark.operators.scd2 import scd2_history
from kafka_connect_dynamodb_spark.streaming.scd2 import Scd2Maintainer

SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("val", T.StringType()),
    T.StructField("seq", T.LongType()),
    T.StructField("_op", T.StringType()),
])

# three seq-ranged tranches (per-key monotone across batches, the stream
# contract); covers mid-key splits, delete-then-reinsert across batches,
# delete-only keys, and keys untouched after batch 0
TRANCHES = [
    [(1, "a1", 10, "c"), (2, "b1", 11, "c"), (3, "c1", 12, "c"),
     (5, "e1", 14, "c")],
    [(1, "a2", 20, "u"), (2, None, 21, "d"), (5, "e2", 24, "u"),
     (6, None, 25, "d")],
    [(1, "a3", 30, "u"), (2, "b3", 31, "c"), (5, None, 34, "d")],
]
ALL = [e for tr in TRANCHES for e in tr]


def _hist_rows(df):
    return {(r.key, r.val, r.valid_from, r.valid_to, r.is_current)
            for r in df.collect()}


def _mk(spark, tmp_path, name="dim"):
    return Scd2Maintainer(
        spark, LakeTable(str(tmp_path / name / "current")),
        str(tmp_path / name / "closed"), ["key"], "seq", ["val"], SCHEMA,
        n_buckets=4)


def _batch_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_drained_stream_equals_batch_history(spark, tmp_path):
    log = tmp_path / "log"
    for i, tr in enumerate(TRANCHES):
        _batch_df(spark, tr).coalesce(1).write.parquet(
            str(log / f"f{i}.parquet"))
    m = _mk(spark, tmp_path)
    q = m.start(str(log) + "/f*.parquet", str(tmp_path / "cp"),
                schema=SCHEMA, max_files_per_trigger=1)
    q.awaitTermination()
    got = _hist_rows(m.history(spark))
    exp = _hist_rows(scd2_history(_batch_df(spark, ALL), ["key"], "seq",
                                  ["val"]))
    assert got == exp
    # current table holds exactly the open versions
    cur = {(r.key, r.val) for r in m.current.read(spark).collect()}
    assert cur == {(k, v) for k, v, _, vt, ic in exp if ic}


def test_foreachbatch_fold_and_dead_keys(spark, tmp_path):
    m = _mk(spark, tmp_path)
    for i, tr in enumerate(TRANCHES):
        m.apply_batch(_batch_df(spark, tr), i)
    exp = scd2_history(_batch_df(spark, ALL), ["key"], "seq", ["val"])
    assert _hist_rows(m.history(spark)) == _hist_rows(exp)
    # key 5 died in batch 2; key 2 died in batch 1 and was re-inserted
    cur = {r.key: r.val for r in m.current.read(spark).collect()}
    assert 5 not in cur and cur[2] == "b3" and cur[1] == "a3"


def test_completed_batch_redelivery_is_noop(spark, tmp_path):
    m = _mk(spark, tmp_path)
    m.apply_batch(_batch_df(spark, TRANCHES[0]), 0)
    m.apply_batch(_batch_df(spark, TRANCHES[1]), 1)
    v = m.current.current_version()
    before = _hist_rows(m.history(spark))
    m.apply_batch(_batch_df(spark, TRANCHES[1]), 1)   # redelivery
    assert m.current.current_version() == v
    assert _hist_rows(m.history(spark)) == before


def test_crash_between_closed_write_and_merge(spark, tmp_path, monkeypatch):
    m = _mk(spark, tmp_path)
    m.apply_batch(_batch_df(spark, TRANCHES[0]), 0)
    real_merge = m.current.merge

    def boom(*a, **kw):
        raise RuntimeError("crash before merge")

    monkeypatch.setattr(m.current, "merge", boom)
    with pytest.raises(RuntimeError):
        m.apply_batch(_batch_df(spark, TRANCHES[1]), 1)
    monkeypatch.setattr(m.current, "merge", real_merge)
    m.apply_batch(_batch_df(spark, TRANCHES[1]), 1)   # redelivery completes
    m.apply_batch(_batch_df(spark, TRANCHES[2]), 2)
    exp = scd2_history(_batch_df(spark, ALL), ["key"], "seq", ["val"])
    assert _hist_rows(m.history(spark)) == _hist_rows(exp)


def test_closed_partitions_append_only(spark, tmp_path):
    m = _mk(spark, tmp_path)
    m.apply_batch(_batch_df(spark, TRANCHES[0]), 0)
    m.apply_batch(_batch_df(spark, TRANCHES[1]), 1)
    p1 = os.path.join(m.closed_dir, "batch=1")
    listing = {f: os.path.getmtime(os.path.join(p1, f))
               for f in os.listdir(p1)}
    m.apply_batch(_batch_df(spark, TRANCHES[2]), 2)
    assert {f: os.path.getmtime(os.path.join(p1, f))
            for f in os.listdir(p1)} == listing


def test_delete_only_first_batch(spark, tmp_path):
    """An all-delete first batch (unknown keys) must not break the empty
    table or emit phantom versions."""
    m = _mk(spark, tmp_path)
    m.apply_batch(_batch_df(spark, [(9, None, 5, "d")]), 0)
    assert m.history(spark).count() == 0
    m.apply_batch(_batch_df(spark, [(9, "z1", 6, "c")]), 1)
    assert _hist_rows(m.history(spark)) == {(9, "z1", 6, None, True)}
