"""Debezium-envelope adapter: binlog/WAL-style CDC logs -> the engine frame.

The engine's native input is the DynamoDB-Streams shape the reference
consumes (shard_id/seq_no/event_name/keys/new_image). Most relational CDC
arrives as Debezium JSON instead — ``{"payload": {"before": ..., "after":
..., "op": "c|u|d|r", "ts_ms": ..., "source": {...}}}`` — so this module
normalizes that envelope into the exact same columns, after which EVERY
downstream stage (filters, LWW reduce, MERGE, checkpoint resume, change
feed) is reused unchanged: point ``start_tail(schema=debezium_schema(),
...)`` at a Debezium topic dump and pass the frame through
``debezium_to_events`` via a tiny ``selectExpr``-level view, or pre-apply
it in batch.

Mapping (Debezium semantics -> reference semantics):

* op ``c``/``r`` -> INSERT (snapshot reads are inserts, like INIT_SYNC 'r'
  rows), ``u`` -> MODIFY, ``d`` -> REMOVE;
* ``after`` carries the row image (absent on deletes -> keys only, exactly
  the reference's REMOVE shape, DynamoDBSourceTask.java:338-343);
* ordering: ``source.sequence`` if present else ``ts_ms * 10^19 +
  source.pos`` fallback — any monotone-per-key decimal works, the LWW
  reduce only compares. The 10^19 headroom exceeds any int64 ``pos``
  (binlog byte offsets / WAL LSNs routinely pass 10^6, which would let an
  older event with a large pos outrank a newer one — ADVICE r6); within
  one ``ts_ms`` the pos order decides, which is correct per key because a
  single source's log positions are monotone;
* shard analog: ``source.table`` + partition id.

All JVM-side (`from_json` + struct rebuild through the same
encode_attr_json used everywhere); no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_dynamodb_spark.functions.envelope import KEY_FIELDS


def debezium_schema(payload_fields: tuple[str, ...]) -> T.StructType:
    """Schema of one Debezium JSON value for a table with the given
    (string-typed) payload columns."""
    row = T.StructType([T.StructField(f, T.StringType(), True)
                        for f in payload_fields])
    source = T.StructType([
        T.StructField("table", T.StringType(), True),
        T.StructField("sequence", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
    ])
    payload = T.StructType([
        T.StructField("before", row, True),
        T.StructField("after", row, True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("source", source, True),
    ])
    return T.StructType([T.StructField("payload", payload, True)])


def _tagged_json(prefix: str, fields: tuple[str, ...]) -> Column:
    """Rebuild the engine's DynamoDB-JSON tagged envelope from a Debezium
    row struct (string attrs -> {"f": {"s": ...}})."""
    inner = [F.struct(F.col(f"{prefix}.{f}").cast("string").alias("s")).alias(f)
             for f in fields]
    return F.to_json(F.struct(*inner), {"ignoreNullFields": "true"})


def debezium_to_events(df: DataFrame, *, value_col: str = "value",
                       payload_fields: tuple[str, ...] = None,
                       key_fields: tuple[str, ...] = KEY_FIELDS) -> DataFrame:
    """Debezium JSON strings -> the engine's native event frame
    (shard_id, seq_no, event_name, ts, keys, new_image)."""
    from kafka_connect_dynamodb_spark.functions.envelope import PAYLOAD_FIELDS
    payload_fields = tuple(payload_fields or PAYLOAD_FIELDS)
    p = F.from_json(F.col(value_col), debezium_schema(payload_fields))["payload"]
    d = df.withColumn("_p", p)
    img = F.coalesce(F.col("_p.after"), F.col("_p.before"))
    op = F.col("_p.op")
    # pos headroom must cover the full int64 range: 10^19 > 2^63. The
    # product stays well inside decimal(38,0) (ts_ms ~ 10^13 -> ~10^32).
    pos_headroom = F.lit("10000000000000000000").cast("decimal(20,0)")
    seq = F.coalesce(
        F.col("_p.source.sequence").cast("decimal(38,0)"),
        (F.col("_p.ts_ms").cast("decimal(38,0)") * pos_headroom
         + F.coalesce(F.col("_p.source.pos"), F.lit(0))))
    out = d.select(
        F.concat(F.coalesce(F.col("_p.source.table"), F.lit("t")),
                 F.lit("-"),
                 F.pmod(F.xxhash64(*[img[f] for f in key_fields]), F.lit(32))
                  .cast("string")).alias("shard_id"),
        seq.alias("seq_no"),
        (F.when(op.isin("c", "r"), "INSERT")
          .when(op == "u", "MODIFY")
          .when(op == "d", "REMOVE")).alias("event_name"),
        F.timestamp_millis(F.col("_p.ts_ms")).alias("ts"),
        # guard on the IMAGE, not a struct-of-fields (F.struct(...) never
        # evaluates to NULL even when every field is — ADVICE r6): a row
        # whose payload failed from_json, or a truncate/message event
        # ('t'/'m') with no image, emits NULL keys + NULL event_name and
        # is droppable by the parse-error filter instead of masquerading
        # as a keyed '{}' event.
        F.when(img.isNotNull(), _keys_json(img, key_fields)).alias("keys"),
        F.when(op != "d", _image_json(F.col("_p.after"), payload_fields))
         .alias("new_image"),
    )
    return out


def _keys_json(img: Column, key_fields: tuple[str, ...]) -> Column:
    inner = [F.struct(img[f].cast("string").alias("s")).alias(f)
             for f in key_fields]
    return F.to_json(F.struct(*inner), {"ignoreNullFields": "true"})


def _image_json(row: Column, fields: tuple[str, ...]) -> Column:
    inner = [F.struct(row[f].cast("string").alias("s")).alias(f)
             for f in fields]
    return F.to_json(F.struct(*inner), {"ignoreNullFields": "true"})


def debezium_export(feed: DataFrame, *,
                    payload_fields: tuple[str, ...] = None,
                    key_fields: tuple[str, ...] = KEY_FIELDS,
                    table_name: str = "table",
                    op_col: str = "_op", seq_col: str = "_seq",
                    commit_col: str = "_commit",
                    ts_ms_col: str | None = None,
                    value_col: str = "value") -> DataFrame:
    """The OUTBOUND direction: the lake's change feed
    (:meth:`..lake.table.LakeTable.changes` rows — keys + payload + _op +
    _seq + _commit) rendered as Debezium JSON envelopes, one string per
    change, so any Debezium-speaking consumer (Kafka Connect sinks, other
    lakehouses) can subscribe to this engine's tables. Closes the loop
    with :func:`debezium_to_events`: export -> re-ingest reproduces the
    table exactly (pinned by test).

    Mapping: upserts carry the row in ``after`` (op ``u`` — LWW upserts
    don't distinguish create from update); deletes carry the KEY fields in
    ``before`` with ``after`` null (the key-only pre-image every Debezium
    source guarantees; this engine keeps no full pre-images by design —
    LWW needs none). ``source.sequence`` is the engine's ``_seq`` (the
    total per-key order), ``source.pos`` the commit version. All
    ``to_json``/struct rebuilds, JVM-side, no Python.

    The change feed carries no event time, so ``ts_ms`` defaults to 0
    (epoch) unless ``ts_ms_col`` names an emission-time column the caller
    attached. A consumer replaying exported envelopes through a pipeline
    with an event-time window (the pre-init-sync drop) MUST attach one —
    epoch-0 events fall before any window and are filtered out."""
    from kafka_connect_dynamodb_spark.functions.envelope import PAYLOAD_FIELDS
    payload_fields = tuple(payload_fields or PAYLOAD_FIELDS)
    op = F.col(op_col)
    is_del = op == "d"
    row_struct = F.struct(*[F.col(f).cast("string").alias(f)
                            for f in payload_fields])
    key_struct = F.struct(*([F.col(f).cast("string").alias(f)
                             for f in key_fields]
                            + [F.lit(None).cast("string").alias(f)
                               for f in payload_fields
                               if f not in key_fields]))
    ts_ms = (F.col(ts_ms_col).cast("long") if ts_ms_col
             else F.lit(0).cast("long"))
    payload = F.struct(
        F.when(is_del, key_struct).alias("before"),
        F.when(~is_del, row_struct).alias("after"),
        F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(
            F.lit(table_name).alias("table"),
            F.col(seq_col).cast("string").alias("sequence"),
            F.coalesce(F.col(commit_col).cast("long"), F.lit(0)).alias("pos"),
        ).alias("source"),
    )
    # pre-image rows from a feed_preimages table ('pu'/'pd') are the POST
    # rows' old state, not events — exporting them would emit stale upserts
    # (harmless to LWW replayers, wrong for at-face-value consumers)
    return feed.filter(~op.isin("pu", "pd")).select(
        F.to_json(F.struct(payload.alias("payload"))).alias(value_col))


def debezium_snapshot_export(rows: DataFrame, *,
                             payload_fields: tuple[str, ...] = None,
                             table_name: str = "table",
                             seq_col: str | None = None,
                             pos: int = 0,
                             ts_ms_col: str | None = None,
                             value_col: str = "value") -> DataFrame:
    """Snapshot ('r') envelopes for a full table state — the Debezium
    twin of the reference's INIT_SYNC output direction
    (``DynamoDBSourceTask.java`` emits every snapshot row before the
    stream tail; Debezium sources emit the same as op ``r`` reads).
    Feed it ``LakeTable.read(...)`` — or a
    :meth:`..plans.transactions.TxCoordinator.read_consistent` frame per
    table, which makes the exported snapshot CROSS-TABLE consistent (all
    tables at one coordinated watermark).

    ``seq_col`` (when the read carried ``include_meta``/``_seq``) becomes
    ``source.sequence`` so a replayer keeps per-key ordering against later
    change envelopes; otherwise sequence exports as '0' (snapshot-before-
    stream semantics). All to_json/struct rebuilds, JVM-side."""
    from kafka_connect_dynamodb_spark.functions.envelope import PAYLOAD_FIELDS
    payload_fields = tuple(payload_fields or PAYLOAD_FIELDS)
    row_struct = F.struct(*[F.col(f).cast("string").alias(f)
                            for f in payload_fields])
    ts_ms = (F.col(ts_ms_col).cast("long") if ts_ms_col
             else F.lit(0).cast("long"))
    seq = (F.col(seq_col).cast("string") if seq_col else F.lit("0"))
    payload = F.struct(
        F.lit(None).cast(rows.select(row_struct.alias("x")).schema["x"]
                         .dataType).alias("before"),
        row_struct.alias("after"),
        F.lit("r").alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(F.lit(table_name).alias("table"),
                 seq.alias("sequence"),
                 F.lit(int(pos)).cast("long").alias("pos")).alias("source"),
    )
    return rows.select(
        F.to_json(F.struct(payload.alias("payload"))).alias(value_col))
