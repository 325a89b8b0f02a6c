"""TxIngest: continuous transaction-consistent ingestion — stream equals
one-shot batch apply, half-arrived transactions held across micro-batches,
idempotent redelivery, crash-safe prune."""

import os

from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.plans.transactions import TxCoordinator
from kafka_connect_dynamodb_spark.streaming.txingest import TxIngest


SCHEMA = ("tx_id long, table string, k long, v string, _op string, "
          "_seq long, event_count long")

# data events (table set, event_count null) + END boundaries (table null)
ROWS = [
    (1, "a", 1, "a1", "c", 1, None), (1, "b", 1, "b1", "c", 2, None),
    (1, None, None, None, None, None, 2),
    (2, "a", 2, "a2", "c", 3, None), (2, None, None, None, None, None, 1),
    (3, "a", 1, "a1x", "u", 4, None), (3, "b", 1, None, "d", 5, None),
    (3, None, None, None, None, None, 2),
    (4, "b", 2, "b2", "c", 6, None), (4, None, None, None, None, None, 1),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _split(spark, rows):
    df = _df(spark, rows)
    ev = df.filter(F.col("table").isNotNull()).drop("event_count")
    bd = df.filter(F.col("table").isNull()).select("tx_id", "event_count")
    return ev, bd


def _state(spark, coord, name):
    return {r.k: r.v
            for r in coord.read_consistent(spark, name).collect()}


def _mk(spark, tmp_path, sub):
    coord = TxCoordinator(spark, str(tmp_path / sub / "lake"),
                          key_cols=["k"], n_buckets=4)
    ing = TxIngest(spark, coord, str(tmp_path / sub / "pending"))
    return coord, ing


def test_stream_drain_equals_batch_apply(spark, tmp_path):
    # reference: one-shot batch apply of the full log
    ref, _ = _mk(spark, tmp_path, "ref")
    ref.apply(*_split(spark, ROWS))

    coord, ing = _mk(spark, tmp_path, "st")
    src = str(tmp_path / "st" / "src")
    os.makedirs(src)
    # three files, one row-group each, splitting tx 3 across files
    _df(spark, ROWS[:4]).coalesce(1).write.mode("append").parquet(src)
    _df(spark, ROWS[4:7]).coalesce(1).write.mode("append").parquet(src)
    _df(spark, ROWS[7:]).coalesce(1).write.mode("append").parquet(src)
    q = ing.start(src, str(tmp_path / "st" / "cp"), max_files_per_trigger=1)
    q.awaitTermination()
    assert coord.snapshot() == ref.snapshot() or (
        coord.snapshot()["watermark"] == ref.snapshot()["watermark"])
    for n in ("a", "b"):
        assert _state(spark, coord, n) == _state(spark, ref, n)


def test_half_arrived_tx_held_across_batches(spark, tmp_path):
    coord, ing = _mk(spark, tmp_path, "hold")
    # batch 0: tx1 complete, tx3 HALF arrived (a-side only), tx2 complete
    b0 = [r for r in ROWS if not (r[0] == 3 and r[1] == "b") and r[0] != 4]
    ing.apply_batch(_df(spark, b0), 0)
    assert coord.snapshot()["watermark"] == 2
    assert _state(spark, coord, "a") == {1: "a1", 2: "a2"}
    assert _state(spark, coord, "b") == {1: "b1"}
    # batch 1: the missing tx3 event + tx4 arrive -> everything applies
    b1 = [r for r in ROWS if (r[0] == 3 and r[1] == "b") or r[0] == 4]
    ing.apply_batch(_df(spark, b1), 1)
    assert coord.snapshot()["watermark"] == 4
    assert _state(spark, coord, "a") == {1: "a1x", 2: "a2"}
    assert _state(spark, coord, "b") == {2: "b2"}


def test_redelivery_is_noop(spark, tmp_path):
    coord, ing = _mk(spark, tmp_path, "redeliver")
    ing.apply_batch(_df(spark, ROWS), 0)
    snap = coord.snapshot()
    va = coord.table("a").current_version()
    ing.apply_batch(_df(spark, ROWS), 0)          # foreachBatch redelivery
    assert coord.snapshot() == snap
    assert coord.table("a").current_version() == va


def test_prune_keeps_only_open_txs_and_preserves_behavior(spark, tmp_path):
    coord, ing = _mk(spark, tmp_path, "prune")
    # everything except tx4's boundary: tx4 stays open
    b0 = [r for r in ROWS if not (r[0] == 4 and r[1] is None)]
    ing.apply_batch(_df(spark, b0), 0)
    assert coord.snapshot()["watermark"] == 3
    dropped = ing.prune(spark)
    assert dropped >= 1
    pe = ing.pending_events(spark)
    assert {r.tx_id for r in pe.collect()} == {4}
    # empty-batch after prune: coordinator treats the pruned log as no-op
    ing.apply_batch(_df(spark, []), 1)
    assert coord.snapshot()["watermark"] == 3
    # tx4's boundary arrives -> applies on top of the pruned pending
    ing.apply_batch(_df(spark, [(4, None, None, None, None, None, 1)]), 2)
    assert coord.snapshot()["watermark"] == 4
    assert _state(spark, coord, "b") == {2: "b2"}


def test_prune_crash_between_write_and_delete_double_counts_nothing(
        spark, tmp_path):
    """Simulate a prune that wrote the compact partition but crashed
    before deleting the old ones: rows exist twice on disk, but the
    deduped read keeps the completeness counts exact."""
    coord, ing = _mk(spark, tmp_path, "crash")
    b0 = [r for r in ROWS if not (r[0] == 4 and r[1] is None)]
    ing.apply_batch(_df(spark, b0), 0)
    orig = coord.io.remove_tree
    coord.io.remove_tree = lambda p: None          # deletes "crash"
    try:
        ing.prune(spark)
    finally:
        coord.io.remove_tree = orig
    # old b0 partition AND compact partition both present
    assert len(ing._dirs("events")) >= 2
    pe = ing.pending_events(spark)
    assert pe.groupBy("_seq").count().filter("count > 1").count() == 0
    ing.apply_batch(_df(spark, [(4, None, None, None, None, None, 1)]), 1)
    assert coord.snapshot()["watermark"] == 4
    assert _state(spark, coord, "a") == {1: "a1x", 2: "a2"}
    assert _state(spark, coord, "b") == {2: "b2"}


def test_auto_prune_soak_bounds_pending_and_matches_batch(spark, tmp_path):
    """r8 soak: >= 20 micro-batches with an in-flight transaction spanning
    most of the stream. The default auto-prune cadence must keep the
    pending partition count bounded (never growing with stream history)
    while the drained state stays identical to a one-shot batch apply."""
    n_tx = 24
    rows = []
    for t in range(1, n_tx + 1):
        tbl = "a" if t % 2 else "b"
        rows.append((t, tbl, t % 5, f"v{t}", "c", 2 * t, None))
        rows.append((t, tbl, (t + 1) % 5, f"w{t}", "u", 2 * t + 1, None))
        rows.append((t, None, None, None, None, None, 2))
    # hold tx2's boundary until the very last batch: everything after tx1
    # stays in flight for most of the stream (the prune must keep it)
    held = next(r for r in rows if r[0] == 2 and r[1] is None)
    rows.remove(held)

    ref, _ = _mk(spark, tmp_path, "soakref")
    ref.apply(*_split(spark, rows + [held]))

    coord, ing = _mk(spark, tmp_path, "soak")
    assert ing.prune_every == 8                     # the default cadence
    per = 3
    batches = [rows[i:i + per] for i in range(0, len(rows), per)]
    max_dirs = 0
    for bid, chunk in enumerate(batches):
        ing.apply_batch(_df(spark, chunk), bid)
        max_dirs = max(max_dirs, len(ing._dirs("events")))
    assert len(batches) >= 20
    # bounded: never more than a prune window of batch dirs + 1 compact dir
    assert max_dirs <= ing.prune_every + 1
    ing.apply_batch(_df(spark, [held]), len(batches))
    assert coord.snapshot()["watermark"] == ref.snapshot()["watermark"]
    for n in ("a", "b"):
        assert _state(spark, coord, n) == _state(spark, ref, n)
    # pending after the final prune window is bounded by in-flight tail
    ing.prune(spark)
    assert len(ing._dirs("events")) <= 2
