"""TxCoordinator: cross-table transaction-consistent apply — boundary
completeness, contiguous watermark, idempotent heal-forward group apply,
coordinated snapshot reads."""

import json

import pytest
from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.plans.transactions import (
    TxCoordinator, tx_watermark)


EV_SCHEMA = ("tx_id long, table string, k long, v string, "
             "_op string, _seq long")
BD_SCHEMA = "tx_id long, event_count long"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _bd(spark, rows):
    return spark.createDataFrame(rows, BD_SCHEMA)


def _state(spark, coord, name, *, consistent=True):
    df = (coord.read_consistent(spark, name) if consistent
          else coord.table(name).read(spark))
    return {r.k: r.v for r in df.collect()}


# A two-table transfer history: tx moves value between tables a and b.
EVENTS = [
    (1, "a", 1, "a1", "c", 1), (1, "b", 1, "b1", "c", 2),
    (2, "a", 2, "a2", "c", 3),
    (3, "a", 1, "a1x", "u", 4), (3, "b", 1, None, "d", 5),
    (4, "b", 2, "b2", "c", 6),
]
BOUNDS = [(1, 2), (2, 1), (3, 2), (4, 1)]


def test_tx_watermark_contiguous(spark):
    ev = _ev(spark, EVENTS)
    assert tx_watermark(ev, _bd(spark, BOUNDS)) == 4
    # drop one event of tx 3 -> watermark stops BEFORE tx 3, holding tx 4
    part = _ev(spark, [e for e in EVENTS if not (e[0] == 3 and e[1] == "b")])
    assert tx_watermark(part, _bd(spark, BOUNDS)) == 2
    # boundary seen but zero events
    assert tx_watermark(_ev(spark, []), _bd(spark, [(1, 2)])) == 0
    # events but no boundaries at all: everything incomplete, W before tx 1
    assert tx_watermark(_ev(spark, EVENTS), _bd(spark, [])) == 0
    # an entirely empty log
    assert tx_watermark(_ev(spark, []), _bd(spark, [])) == -1
    # events without their boundary are incomplete too
    assert tx_watermark(_ev(spark, EVENTS[:2]), _bd(spark, [(2, 1)])) == 0


def test_group_apply_and_consistent_read(spark, tmp_path):
    coord = TxCoordinator(spark, str(tmp_path / "lake"), key_cols=["k"])
    res = coord.apply(_ev(spark, EVENTS), _bd(spark, BOUNDS))
    assert res["watermark"] == 4
    assert _state(spark, coord, "a") == {1: "a1x", 2: "a2"}
    assert _state(spark, coord, "b") == {2: "b2"}       # b:1 deleted by tx 3


def test_incomplete_tx_holds_back_later_complete_tx(spark, tmp_path):
    coord = TxCoordinator(spark, str(tmp_path / "lake"), key_cols=["k"])
    part = [e for e in EVENTS if not (e[0] == 3 and e[1] == "b")]
    res = coord.apply(_ev(spark, part), _bd(spark, BOUNDS))
    assert res["watermark"] == 2
    # tx 3's half (a-side update) must NOT be applied, nor tx 4
    assert _state(spark, coord, "a") == {1: "a1", 2: "a2"}
    assert _state(spark, coord, "b") == {1: "b1"}
    # the missing event arrives -> the rest applies
    res = coord.apply(_ev(spark, EVENTS), _bd(spark, BOUNDS))
    assert res["watermark"] == 4
    assert _state(spark, coord, "a") == {1: "a1x", 2: "a2"}
    assert _state(spark, coord, "b") == {2: "b2"}


def test_crash_between_table_commits_heals_without_tearing(spark, tmp_path):
    """Crash after table a committed W=4 but before b: the coordinated
    snapshot still reads the old watermark on BOTH tables (no tear);
    re-apply completes b (a skips via batch-id guard) and only then
    publishes the new snapshot."""
    coord = TxCoordinator(spark, str(tmp_path / "lake"), key_cols=["k"])
    coord.apply(_ev(spark, [e for e in EVENTS if e[0] <= 2]),
                _bd(spark, BOUNDS[:2]))
    snap1 = coord.snapshot()
    assert snap1["watermark"] == 2

    orig_merge = type(coord.table("a")).merge
    calls = []

    def crashing_merge(self, spark_, updates, **kw):
        calls.append(self.root)
        if self.root.endswith("/b") and len([c for c in calls
                                             if c.endswith("/b")]) == 1:
            raise RuntimeError("simulated crash before table b committed")
        return orig_merge(self, spark_, updates, **kw)

    import kafka_connect_dynamodb_spark.lake.table as table_mod
    table_mod.LakeTable.merge = crashing_merge
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            coord.apply(_ev(spark, EVENTS), _bd(spark, BOUNDS))
    finally:
        table_mod.LakeTable.merge = orig_merge

    # torn underneath (a at W=4, b at W=2) but the COORDINATED view is not
    assert coord.snapshot() == snap1
    assert _state(spark, coord, "a") == {1: "a1", 2: "a2"}   # snapshot view
    assert _state(spark, coord, "b") == {1: "b1"}
    # heal-forward: a's merge skips (already at W), b completes, snap moves
    res = coord.apply(_ev(spark, EVENTS), _bd(spark, BOUNDS))
    assert res["watermark"] == 4
    assert res["stats"]["a"].get("skipped") is True
    assert coord.snapshot()["watermark"] == 4
    assert _state(spark, coord, "a") == {1: "a1x", 2: "a2"}
    assert _state(spark, coord, "b") == {2: "b2"}


def test_reapply_is_noop_and_watermark_monotone(spark, tmp_path):
    coord = TxCoordinator(spark, str(tmp_path / "lake"), key_cols=["k"])
    coord.apply(_ev(spark, EVENTS), _bd(spark, BOUNDS))
    va = coord.table("a").current_version()
    res = coord.apply(_ev(spark, EVENTS), _bd(spark, BOUNDS))
    assert all(s.get("skipped") for s in res["stats"].values())
    assert coord.table("a").current_version() == va
    # a shrunk log (watermark regression) is rejected loudly
    with pytest.raises(ValueError, match="backwards"):
        coord.apply(_ev(spark, EVENTS[:2]), _bd(spark, BOUNDS[:1]))


def test_snapshot_record_shape(spark, tmp_path):
    coord = TxCoordinator(spark, str(tmp_path / "lake"), key_cols=["k"])
    coord.apply(_ev(spark, EVENTS), _bd(spark, BOUNDS))
    raw = json.loads(coord.io.read_text(
        str(tmp_path / "lake" / "_tx" / "snap-4.json")))
    assert raw["watermark"] == 4
    assert set(raw["tables"]) == {"a", "b"}
    for name, v in raw["tables"].items():
        assert coord.table(name).manifest(v) is not None
