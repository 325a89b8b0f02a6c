"""SCD Type 2 history operators.

Pins: (1) batch semantics — updates close versions, deletes close without
opening, re-inserts open fresh versions, is_current marks exactly the open
rows; (2) the incremental fold equals a batch recompute over the full log
for every split point, including splits that land mid-key, after a delete,
and on brand-new keys; (3) the closed-version carve-out really is
append-only (closed rows pass through byte-identical)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.operators.scd2 import (
    scd2_apply_increment, scd2_history)

SCHEMA = "key long, val string, seq long, _op string"

# key 1: c -> u -> u            (3 versions, last open)
# key 2: c -> d -> c            (2 versions: first closed by delete, re-insert open)
# key 3: c                      (1 open version)
# key 4: d                      (delete of unknown key: no versions)
# key 5: c -> u -> d            (2 versions, both closed; key fully dead)
EVENTS = [
    (1, "a1", 10, "c"), (1, "a2", 20, "u"), (1, "a3", 30, "u"),
    (2, "b1", 11, "c"), (2, None, 21, "d"), (2, "b3", 31, "c"),
    (3, "c1", 12, "c"),
    (4, None, 13, "d"),
    (5, "e1", 14, "c"), (5, "e2", 24, "u"), (5, None, 34, "d"),
]


def _ev(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return {(r.key, r.val, r.valid_from, r.valid_to, r.is_current)
            for r in df.collect()}


def test_batch_semantics(spark):
    got = _rows(scd2_history(_ev(spark, EVENTS), ["key"], "seq", ["val"]))
    assert got == {
        (1, "a1", 10, 20, False), (1, "a2", 20, 30, False),
        (1, "a3", 30, None, True),
        (2, "b1", 11, 21, False), (2, "b3", 31, None, True),
        (3, "c1", 12, None, True),
        (5, "e1", 14, 24, False), (5, "e2", 24, 34, False),
    }


def test_current_rows_match_lww_live_state(spark):
    """is_current rows == the LWW replay's live state (the two downstream
    consumers of one stream must agree)."""
    ev = _ev(spark, EVENTS)
    hist = scd2_history(ev, ["key"], "seq", ["val"])
    cur = {(r.key, r.val) for r in hist.filter("is_current").collect()}
    from kafka_connect_dynamodb_spark.operators.lww import latest_per_key
    last = latest_per_key(ev, ["key"], ["seq"])
    live = {(r.key, r.val) for r in last.filter("_op <> 'd'").collect()}
    assert cur == live


def test_increment_equals_batch_at_every_split(spark):
    ordered = sorted(EVENTS, key=lambda e: e[2])
    full = _rows(scd2_history(_ev(spark, EVENTS), ["key"], "seq", ["val"]))
    for cut in range(1, len(ordered)):
        hist = scd2_history(_ev(spark, ordered[:cut]), ["key"], "seq", ["val"])
        inc = scd2_apply_increment(hist, _ev(spark, ordered[cut:]),
                                   ["key"], "seq", ["val"])
        assert _rows(inc) == full, f"split at {cut}"


def test_increment_leaves_closed_rows_untouched(spark):
    """Closed versions are immutable at rest: the fold's output contains the
    prior history's closed rows verbatim (the append-only property that lets
    a 100 TB history live in cold storage)."""
    ordered = sorted(EVENTS, key=lambda e: e[2])
    hist = scd2_history(_ev(spark, ordered[:7]), ["key"], "seq", ["val"])
    closed_before = _rows(hist.filter(F.col("valid_to").isNotNull()))
    out = scd2_apply_increment(hist, _ev(spark, ordered[7:]),
                               ["key"], "seq", ["val"])
    assert closed_before <= _rows(out)


def test_empty_increment_is_identity(spark):
    hist = scd2_history(_ev(spark, EVENTS), ["key"], "seq", ["val"])
    out = scd2_apply_increment(hist, _ev(spark, []), ["key"], "seq", ["val"])
    assert _rows(out) == _rows(hist)
