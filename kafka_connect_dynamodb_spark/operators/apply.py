"""Micro-batch CDC apply: raw change events -> LWW-deduped MERGE into the lake.

This is the engine's hot path, the set-oriented replacement for the
reference's per-record ``sync()`` loop (DynamoDBSourceTask.java:276-371):

raw events
  -> F2 pre-init-sync drop (filters.pre_init_sync_filter)
  -> F3 danger-zone guard (batch-level min-ts aggregate)
  -> F6 op decode + F1 image projection (JVM CASE/coalesce)
  -> envelope decode via one ``from_json`` into map<string, tagged-union>
     (JVM JsonToStructs; additive schema evolution = new map keys)
  -> F5 parse-error drop
  -> per-key LWW dedup (max_by partial+final agg — shuffle carries one row
     per key per mapper, not one per event)
  -> LakeTable.merge (bucket-pruned COW, idempotent on batch_id)

Every step is declarative; the whole batch plan is Catalyst-optimized and
whole-stage-codegen'd. No Python executes per row.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.functions.envelope import KEY_FIELDS, PAYLOAD_FIELDS
from kafka_connect_dynamodb_spark.lake.table import LakeTable
from kafka_connect_dynamodb_spark.operators import filters
from kafka_connect_dynamodb_spark.operators.lww import latest_per_key

TAGGED_MAP = "map<string,struct<s:string,n:string,bool:boolean>>"


class DangerZoneError(RuntimeError):
    """Raised when a batch contains events older than the danger-zone cutoff;
    the pipeline must abandon the stream and re-run INIT_SYNC
    (DynamoDBSourceTask.java:318-331)."""


def decode_events(df: DataFrame, *, extra_fields: list[str] | None = None,
                  discover_fields: bool = False) -> tuple[DataFrame, list[str]]:
    """Raw (shard_id, seq_no, event_name, ts, keys, new_image) -> typed rows.

    Parses the AttributeValue envelope once into a map column; known payload
    fields project out of it JVM-side. With ``discover_fields`` the map keys
    are aggregated to detect additive attributes (schema evolution) — one
    cheap partial-agg job over the batch.
    """
    out = (df.withColumn("op", filters.decode_op(strict=False))
             .withColumn("_img", filters.project_image())
             .withColumn("_m", F.from_json(F.col("_img"), TAGGED_MAP)))

    fields = list(PAYLOAD_FIELDS) + list(extra_fields or [])
    if discover_fields:
        known = set(fields)
        found = (out.select(F.explode(F.map_keys("_m")).alias("k"))
                    .groupBy("k").count().collect())
        fields += sorted(r["k"] for r in found if r["k"] not in known)

    for f in fields:
        tag = F.element_at(F.col("_m"), f)
        out = out.withColumn(f, F.coalesce(tag["s"], tag["n"]))
    return out.drop("_img", "_m"), fields


def prepare_batch(df: DataFrame, *,
                  init_sync_start: datetime | None = None,
                  now: datetime | None = None,
                  extra_fields: list[str] | None = None,
                  discover_fields: bool = False) -> DataFrame:
    """Filters + decode + LWW dedup; returns one merge-ready row per key
    (columns: repo, path, payload..., _op, _seq)."""
    if now is not None and filters.danger_zone_breached(df, now):
        raise DangerZoneError("batch contains events older than the 20h danger zone")
    if init_sync_start is not None:
        df = filters.pre_init_sync_filter(df, init_sync_start)

    decoded, fields = decode_events(df, extra_fields=extra_fields,
                                    discover_fields=discover_fields)
    decoded = filters.drop_parse_errors(
        decoded.filter(F.col("op").isNotNull()), list(KEY_FIELDS))

    payload = [f for f in fields if f not in KEY_FIELDS]
    change = decoded.select(
        *KEY_FIELDS, *payload,
        F.col("op").alias("_op"),
        F.col("seq_no").cast("decimal(38,0)").alias("_seq"),
    )
    return latest_per_key(change, list(KEY_FIELDS), ["_seq"])


def apply_batch(spark: SparkSession, table: LakeTable, df: DataFrame, *,
                batch_id: int | None = None, source: str = "stream",
                init_sync_start: datetime | None = None,
                now: datetime | None = None,
                discover_fields: bool = True) -> dict[str, Any]:
    """Full micro-batch apply with exactly-once semantics.

    Safe to re-invoke with the same batch_id (foreachBatch redelivery):
    the merge no-ops once committed.
    """
    deduped = prepare_batch(df, init_sync_start=init_sync_start, now=now,
                            discover_fields=discover_fields)
    return table.merge(spark, deduped, batch_id=batch_id, source=source)
