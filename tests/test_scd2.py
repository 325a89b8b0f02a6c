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


# ---------------------------------------------------------------- temporal join

def _tjoin_rows(df):
    return {tuple(r) for r in df.collect()}


def test_temporal_join_semantics(spark):
    """Boundary table for the fact->version lookup: inclusive valid_from,
    exclusive valid_to, post-delete gap matches nothing, pre-first-version
    matches nothing, open version matches everything after it."""
    from kafka_connect_dynamodb_spark.operators.scd2 import (
        scd2_history, scd2_temporal_join)
    hist = scd2_history(_ev(spark, EVENTS), ["key"], "seq", ["val"])
    facts = spark.createDataFrame(
        [(1, 9), (1, 10), (1, 20), (1, 29), (1, 30), (1, 99),
         (2, 20), (2, 21), (2, 25), (2, 31),
         (4, 50),
         (5, 23), (5, 33), (5, 34), (5, 35)],
        "key long, fseq long")
    out = scd2_temporal_join(facts, hist.select("key", "val", "valid_from",
                                                "valid_to"),
                             ["key"], "fseq")
    got = {(r.key, r.fseq): r.val for r in out.collect()}
    assert got == {
        (1, 9): None,      # before the first version
        (1, 10): "a1",     # inclusive valid_from
        (1, 20): "a2",     # boundary: old closes, new opens
        (1, 29): "a2",
        (1, 30): "a3", (1, 99): "a3",   # open version
        (2, 20): "b1",
        (2, 21): None,     # delete at 21: exclusive upper bound
        (2, 25): None,     # post-delete gap
        (2, 31): "b3",     # re-insert
        (4, 50): None,     # key never had a version
        (5, 23): "e1", (5, 33): "e2",
        (5, 34): None, (5, 35): None,   # dead key stays dead
    }
    inner = scd2_temporal_join(facts, hist.select("key", "val", "valid_from",
                                                  "valid_to"),
                               ["key"], "fseq", how="inner")
    assert inner.count() == sum(v is not None for v in got.values())


def test_temporal_join_matches_inequality_join(spark):
    """The one-exchange window formulation == the textbook inequality join
    on generated data (the plan we refuse to run at scale is still the
    semantic oracle)."""
    from kafka_connect_dynamodb_spark.operators.scd2 import (
        scd2_history, scd2_temporal_join)
    from kafka_connect_dynamodb_spark.sources.generator import change_events
    ev = (change_events(spark, 40, 400)
          .select(F.get_json_object("keys", "$.repo.s").alias("key"),
                  F.col("seq_no").cast("decimal(38,0)").alias("seq"),
                  F.sha2(F.coalesce("new_image", F.lit("")), 256).alias("val"),
                  F.when(F.col("event_name") == "REMOVE", "d")
                   .otherwise("u").alias("_op")))
    hist = scd2_history(ev, ["key"], "seq", ["val"]).select(
        "key", "val", "valid_from", "valid_to")
    facts = ev.select("key", (F.col("seq") + 1).alias("fseq")).distinct()
    got = scd2_temporal_join(facts, hist, ["key"], "fseq")
    hist.createOrReplaceTempView("h")
    facts.createOrReplaceTempView("f")
    exp = spark.sql("""
        SELECT f.key, f.fseq, h.val, h.valid_from, h.valid_to
        FROM f LEFT JOIN h ON f.key = h.key AND f.fseq >= h.valid_from
             AND (h.valid_to IS NULL OR f.fseq < h.valid_to)""")
    assert _tjoin_rows(got) == _tjoin_rows(exp.select(*got.columns))


def test_temporal_join_rejects_collisions_and_bad_how(spark):
    import pytest as _pytest
    from kafka_connect_dynamodb_spark.operators.scd2 import (
        scd2_history, scd2_temporal_join)
    hist = scd2_history(_ev(spark, EVENTS), ["key"], "seq", ["val"])
    facts = spark.createDataFrame([(1, 10, "x")], "key long, fseq long, val string")
    with _pytest.raises(ValueError, match="collide"):
        scd2_temporal_join(facts, hist, ["key"], "fseq")
    with _pytest.raises(ValueError, match="how"):
        scd2_temporal_join(facts.drop("val"), hist, ["key"], "fseq",
                           how="full")
