"""Debezium-envelope adapter: a binlog/WAL-style CDC log replays through the
unchanged engine to the same final state as the native envelope."""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.lake.table import LakeTable
from kafka_connect_dynamodb_spark.plans.pipeline import CdcPipeline
from kafka_connect_dynamodb_spark.sources.debezium import debezium_to_events
from kafka_connect_dynamodb_spark.sources.generator import (
    DEFAULT_BASE_TS, change_events, source_table)

from tests.oracle import final_hashes, replay


def _to_debezium(ev):
    """Render the generator's native envelope as Debezium JSON values."""
    def row_json(r):
        keys = {k: v.get("s", v.get("n"))
                for k, v in json.loads(r["keys"]).items()}
        after = None
        if r["new_image"] is not None:
            after = {k: v.get("s", v.get("n"))
                     for k, v in json.loads(r["new_image"]).items()}
        op = {"INSERT": "c", "MODIFY": "u", "REMOVE": "d"}[r["event_name"]]
        payload = {
            "before": keys if op == "d" else None,
            "after": after if op != "d" else None,
            "op": op,
            "ts_ms": int(r["ts"].timestamp() * 1000),
            "source": {"table": "repo_files", "sequence": str(r["seq_no"]),
                       "pos": 0},
        }
        return json.dumps({"payload": payload})
    return row_json


def test_debezium_log_replays_to_native_parity(spark, tmp_path):
    base = source_table(spark, 120)
    ev = change_events(spark, 120, 800, pre_init_frac=0.0)

    # materialize the log as Debezium JSON values (driver-side render is
    # test-only; production reads a Kafka topic dump)
    import datetime
    rows = []
    conv = _to_debezium(ev)
    for r in ev.collect():
        d = r.asDict()
        d["ts"] = d["ts"].replace(tzinfo=datetime.timezone.utc)
        rows.append((conv(d),))
    dbz = spark.createDataFrame(rows, "value string")

    frame = debezium_to_events(dbz)
    assert set(frame.columns) == {"shard_id", "seq_no", "event_name", "ts",
                                  "keys", "new_image"}

    table = LakeTable(str(tmp_path / "tbl"))
    pipe = CdcPipeline(spark, table, n_buckets=8,
                       clock=lambda: DEFAULT_BASE_TS.timestamp())
    pipe.init_sync(base)
    pipe.sync_batch(frame, 0)

    got = {(r["repo"], r["path"]):
           hashlib.sha256((r["content"] or "").encode()).hexdigest()
           for r in table.read(spark).collect()}
    want = final_hashes(replay([r.asDict() for r in base.collect()],
                               [r.asDict() for r in ev.collect()]))
    assert got == want


def test_debezium_adapter_is_jvm_side(spark):
    dbz = spark.createDataFrame(
        [('{"payload":{"after":{"repo":"r","path":"p","commit":"c",'
          '"lang":"py","content":"x"},"op":"c","ts_ms":1717200000000,'
          '"source":{"table":"t","sequence":"7","pos":0}}}',)],
        "value string")
    out = debezium_to_events(dbz)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    r = out.collect()[0]
    assert r.event_name == "INSERT" and str(r.seq_no) == "7"
    assert '"s":"x"' in r.new_image and '"repo"' in r.keys


def test_debezium_export_roundtrip_reproduces_table(spark, tmp_path):
    """Outbound direction: table A's change feed exported as Debezium JSON,
    re-ingested through the unchanged inbound adapter into table B (same
    snapshot start), must reproduce A exactly — including deletes (key-only
    before images) and late/duplicate deliveries already LWW-compacted by
    the feed."""
    from kafka_connect_dynamodb_spark.sources.debezium import debezium_export
    from kafka_connect_dynamodb_spark.streaming import tail

    base = source_table(spark, 100)
    ev = change_events(spark, 100, 900, pre_init_frac=0.0)
    log = str(tmp_path / "log")
    ev.repartition(3).write.parquet(log)

    a = LakeTable(str(tmp_path / "a"), change_feed=True)
    pa = CdcPipeline(spark, a, n_buckets=8,
                     clock=lambda: DEFAULT_BASE_TS.timestamp())
    pa.init_sync(base)
    tail.drain(tail.start_tail(spark, log, a,
                               checkpoint_dir=str(tmp_path / "cpa"),
                               available_now=True,
                               init_sync_start=DEFAULT_BASE_TS))

    feed = a.changes(spark)
    # the feed has no event time: attach the emission time so B's
    # pre-init-sync window (anchored at DEFAULT_BASE_TS) keeps the events
    ts_ms = int(DEFAULT_BASE_TS.timestamp() * 1000)
    envelopes = debezium_export(feed.withColumn("_ts_ms", F.lit(ts_ms)),
                                table_name="repo_files", ts_ms_col="_ts_ms")
    assert envelopes.columns == ["value"]
    frame = debezium_to_events(envelopes)

    b = LakeTable(str(tmp_path / "b"))
    pb = CdcPipeline(spark, b, n_buckets=8,
                     clock=lambda: DEFAULT_BASE_TS.timestamp())
    pb.init_sync(base)
    pb.sync_batch(frame, 0)

    sha = lambda t: {(r["repo"], r["path"]):  # noqa: E731
                     hashlib.sha256((r["content"] or "").encode()).hexdigest()
                     for r in t.read(spark).collect()}
    assert sha(b) == sha(a)
    # deletes really traveled: A dropped keys vs the snapshot, B agrees
    base_keys = {(r["repo"], r["path"]) for r in base.collect()}
    assert base_keys - set(sha(a)), "generator produced no deletes"
    assert set(sha(b)) == set(sha(a))


def test_debezium_pos_fallback_gives_pos_full_headroom(spark):
    """ADVICE r6: with ``source.sequence`` absent, the ordering fallback is
    ``ts_ms * 10^19 + pos``. WAL LSNs / binlog byte offsets are arbitrary
    int64s — an OLDER event carrying a near-max pos must still lose to a
    newer event with a tiny pos."""
    def env(ts_ms, pos, content):
        return json.dumps({"payload": {
            "after": {"repo": "r", "path": "p", "commit": "c",
                      "lang": "py", "content": content},
            "op": "u", "ts_ms": ts_ms,
            "source": {"table": "t", "sequence": None, "pos": pos}}})
    dbz = spark.createDataFrame(
        [(env(1000, 9_000_000_000_000_000_000, "stale"),),
         (env(2000, 5, "fresh"),)], "value string")
    rows = {r.new_image: int(r.seq_no) for r in
            debezium_to_events(dbz).collect()}
    stale = next(v for k, v in rows.items() if "stale" in k)
    fresh = next(v for k, v in rows.items() if "fresh" in k)
    assert fresh > stale
    # same ts_ms -> pos decides (monotone within one source log)
    dbz2 = spark.createDataFrame(
        [(env(1000, 10, "a"),), (env(1000, 20, "b"),)], "value string")
    rows2 = {r.new_image: int(r.seq_no) for r in
             debezium_to_events(dbz2).collect()}
    assert (next(v for k, v in rows2.items() if '"b"' in k or 'b' in k)
            > min(rows2.values()))


def test_debezium_imageless_rows_are_droppable(spark):
    """ADVICE r6: rows whose payload failed from_json, and truncate/message
    ops ('t'/'m') with no image, must emit NULL keys + NULL event_name —
    identifiable and droppable — not a keyed '{}' event."""
    good = json.dumps({"payload": {
        "after": {"repo": "r", "path": "p", "commit": "c",
                  "lang": "py", "content": "x"},
        "op": "c", "ts_ms": 1, "source": {"table": "t", "sequence": "1",
                                          "pos": 0}}})
    trunc = json.dumps({"payload": {
        "before": None, "after": None, "op": "t", "ts_ms": 2,
        "source": {"table": "t", "sequence": "2", "pos": 0}}})
    dbz = spark.createDataFrame(
        [(good,), (trunc,), ("{not json",)], "value string")
    out = debezium_to_events(dbz).collect()
    bad = [r for r in out if r.keys is None]
    assert len(bad) == 2
    assert all(r.event_name is None for r in bad)
    kept = [r for r in out if r.keys is not None]
    assert len(kept) == 1 and kept[0].event_name == "INSERT"
    assert '"{}"' not in json.dumps([r.keys for r in out])


def test_debezium_snapshot_export_bootstraps_fresh_table(spark, tmp_path):
    """Snapshot ('r') export: table A's full state exported as Debezium
    read envelopes, ingested through the unchanged inbound adapter into an
    EMPTY pipeline B (snapshot-as-stream bootstrap), reproduces A."""
    from kafka_connect_dynamodb_spark.sources.debezium import (
        debezium_snapshot_export, debezium_to_events)
    from kafka_connect_dynamodb_spark.streaming import tail

    base = source_table(spark, 90)
    ev = change_events(spark, 90, 600, pre_init_frac=0.0)
    log = str(tmp_path / "log")
    ev.write.parquet(log)

    a = LakeTable(str(tmp_path / "a"))
    pa = CdcPipeline(spark, a, n_buckets=8,
                     clock=lambda: DEFAULT_BASE_TS.timestamp())
    pa.init_sync(base)
    tail.drain(tail.start_tail(spark, log, a,
                               checkpoint_dir=str(tmp_path / "cpa"),
                               available_now=True,
                               init_sync_start=DEFAULT_BASE_TS))

    ts_ms = int(DEFAULT_BASE_TS.timestamp() * 1000)
    env = debezium_snapshot_export(
        a.read(spark).withColumn("_ts_ms", F.lit(ts_ms)),
        table_name="repo_files", ts_ms_col="_ts_ms")
    frame = debezium_to_events(env)
    # every snapshot row is an op-'r' INSERT-equivalent with a full image
    b = LakeTable(str(tmp_path / "b"))
    pb = CdcPipeline(spark, b, n_buckets=8,
                     clock=lambda: DEFAULT_BASE_TS.timestamp())
    pb.init_sync(a.read(spark).limit(0))          # empty snapshot
    pb.sync_batch(frame, 0)

    sha = lambda t: {(r["repo"], r["path"]):  # noqa: E731
                     hashlib.sha256((r["content"] or "").encode()).hexdigest()
                     for r in t.read(spark).collect()}
    assert sha(b) == sha(a) and sha(a)


def test_debezium_consistent_snapshot_export_across_tables(spark, tmp_path):
    """TxCoordinator.read_consistent feeds the snapshot exporter: with a
    torn underlying state (table a committed past table b), the exported
    snapshots still reflect ONE coordinated watermark for both tables."""
    from kafka_connect_dynamodb_spark.plans.transactions import TxCoordinator
    from kafka_connect_dynamodb_spark.sources.debezium import (
        debezium_snapshot_export)

    coord = TxCoordinator(spark, str(tmp_path / "lake"), key_cols=["k"])
    ev = spark.createDataFrame(
        [(1, "a", 1, "a1", "c", 1), (1, "b", 1, "b1", "c", 2),
         (2, "a", 1, "a2", "u", 3), (2, "b", 1, "b2", "u", 4)],
        "tx_id long, table string, k long, v string, _op string, _seq long")
    bd = spark.createDataFrame([(1, 2), (2, 2)],
                               "tx_id long, event_count long")
    # apply only tx 1 via the coordinator
    coord.apply(ev.filter("tx_id = 1"), bd.filter("tx_id = 1"))
    # table a secretly advanced OUTSIDE the coordinator (torn state)
    coord.table("a").merge(
        spark, ev.filter("tx_id = 2 and table = 'a'").drop("tx_id", "table"),
        batch_id=99, source="rogue")
    import json
    for name in ("a", "b"):
        env = debezium_snapshot_export(
            coord.read_consistent(spark, name),
            payload_fields=("k", "v"), table_name=name)
        rows = [json.loads(r.value)["payload"] for r in env.collect()]
        assert [r["after"]["v"] for r in rows] == [f"{name}1"], name
        assert all(r["op"] == "r" for r in rows)
