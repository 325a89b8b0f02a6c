"""Micro-batch CDC apply: raw change events -> LWW-deduped MERGE into the lake.

This is the engine's hot path, the set-oriented replacement for the
reference's per-record ``sync()`` loop (DynamoDBSourceTask.java:276-371):

raw events
  -> F2 pre-init-sync drop (filters.pre_init_sync_filter)
  -> F3 danger-zone guard (batch-level min-ts aggregate)
  -> F6 op decode + F1 image projection (JVM CASE/coalesce)
  -> parse only the small ``keys`` envelope per event (cheap from_json)
  -> F5 parse-error drop
  -> per-key LWW dedup carrying the *raw* image string (max_by partial+final
     agg — shuffle moves one row per key per mapper, not one per event)
  -> decode the winners' image envelope (one from_json over |keys| rows,
     NOT |events| — the expensive JSON parse runs post-reduction)
  -> additive schema evolution: discover new attribute names from the
     winners' map keys (tiny agg)
  -> LakeTable.merge (bucket-pruned COW, idempotent on batch_id)

Every step is declarative; the whole batch plan is Catalyst-optimized and
whole-stage-codegen'd. No Python executes per row. Ordering the heavy
envelope parse after the LWW reduce is the single biggest scale lever: at
10^10 events with ~10^8 live keys it removes ~99% of JSON work.
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


def decode_events(df: DataFrame, *, col: str = "new_image",
                  extra_fields: list[str] | None = None,
                  discover_fields: bool = False) -> tuple[DataFrame, list[str]]:
    """Decode an AttributeValue-envelope JSON column into typed columns.

    Parses the envelope once into a map column; payload fields project out of
    it JVM-side. With ``discover_fields`` the map keys are aggregated to
    detect additive attributes (schema evolution) — one partial-agg job over
    ``df`` (callers pass post-dedup winners, so this is O(|keys|)).
    """
    out = df.withColumn("_m", F.from_json(F.col(col), TAGGED_MAP))

    fields = list(PAYLOAD_FIELDS) + list(extra_fields or [])
    if discover_fields:
        known = set(fields)
        found = (out.select(F.explode(F.map_keys("_m")).alias("k"))
                    .groupBy("k").count().collect())
        fields += sorted(r["k"] for r in found if r["k"] not in known)

    for f in fields:
        if f in df.columns:
            continue  # already-materialized columns (e.g. keys) win: a
                      # malformed image must not null-out a valid parsed key
        tag = F.element_at(F.col("_m"), f)
        out = out.withColumn(f, F.coalesce(tag["s"], tag["n"]))
    return out.drop(col, "_m"), fields


def prepare_winners(df: DataFrame, *,
                    init_sync_start: datetime | None = None,
                    now: datetime | None = None) -> DataFrame:
    """Filters + key-parse + LWW dedup: one row per key, image still raw.

    This is the only full-pass-over-events stage; callers persist its result
    so schema discovery, bucket pruning and the MERGE all reuse one pass.

    Plan shape (see PLANS.md): pre-agg filters use only CHEAP, parquet-pushable
    predicates (event-name IN, keys IsNotNull). The exact parse-error drop (F5)
    for unparseable keys runs POST-dedup on the ~|keys|-row winner set — if it
    sat before the agg, Catalyst's predicate pushdown would substitute the
    CodegenFallback ``from_json`` into the scan Filter and evaluate it ~5x per
    event, interpreted (measured ~20% of batch wall time at 10M events). Null
    keys group together during the reduce and are dropped afterwards, so the
    final state is identical to the reference's per-record skip
    (DynamoDBSourceTask.java:363-367).
    """
    if now is not None and filters.danger_zone_breached(df, now):
        raise DangerZoneError("batch contains events older than the 20h danger zone")
    if init_sync_start is not None:
        df = filters.pre_init_sync_filter(df, init_sync_start)

    from kafka_connect_dynamodb_spark.functions.envelope import tagged_schema
    # F5/F6 cheap half: unknown event names & null keys envelopes drop here
    # (pushable IN / IsNotNull filters reach the parquet scan).
    ev = df.filter(F.col("event_name").isin("INSERT", "MODIFY", "REMOVE")
                   & F.col("keys").isNotNull())
    ev = ev.withColumn("_k", F.from_json(F.col("keys"), tagged_schema(KEY_FIELDS)))
    change = ev.select(
        *[F.coalesce(F.col(f"_k.{k}.s"), F.col(f"_k.{k}.n")).alias(k)
          for k in KEY_FIELDS],
        filters.project_image().alias("_img"),
        filters.decode_op(strict=False).alias("_op"),
        F.col("seq_no").cast("decimal(38,0)").alias("_seq"))
    winners = latest_per_key(change, list(KEY_FIELDS), ["_seq"])
    # F5 exact half, post-reduce: winners whose keys failed to parse. The
    # inert `| _op.isNull()` disjunct references an aggregated column so the
    # optimizer cannot push the predicate back below the agg into the scan.
    key_ok = None
    for k in KEY_FIELDS:
        p = F.col(k).isNotNull()
        key_ok = p if key_ok is None else (key_ok & p)
    return winners.filter(key_ok | F.col("_op").isNull())


def decode_winners(winners: DataFrame, *,
                   extra_fields: list[str] | None = None,
                   discover_fields: bool = False) -> DataFrame:
    """Decode the post-dedup winners' image envelope: O(|keys|) JSON work,
    not O(|events|) (SURVEY §3.3 hot-path note)."""
    decoded, fields = decode_events(winners, col="_img",
                                    extra_fields=extra_fields,
                                    discover_fields=discover_fields)
    payload = [f for f in fields if f not in KEY_FIELDS]
    return decoded.select(*KEY_FIELDS, *payload, "_op", "_seq")


def prepare_batch(df: DataFrame, *,
                  init_sync_start: datetime | None = None,
                  now: datetime | None = None,
                  extra_fields: list[str] | None = None,
                  discover_fields: bool = False) -> DataFrame:
    """Filters + key-parse + LWW dedup + winner decode; returns one
    merge-ready row per key (columns: repo, path, payload..., _op, _seq).

    The per-event work is minimal (op CASE + small keys-envelope parse); the
    full image parse and schema discovery run on the post-dedup winners.
    """
    winners = prepare_winners(df, init_sync_start=init_sync_start, now=now)
    return decode_winners(winners, extra_fields=extra_fields,
                          discover_fields=discover_fields)


def apply_batch(spark: SparkSession, table: LakeTable, df: DataFrame, *,
                batch_id: int | None = None, source: str = "stream",
                init_sync_start: datetime | None = None,
                now: datetime | None = None,
                discover_fields: bool = True) -> dict[str, Any]:
    """Full micro-batch apply with exactly-once semantics.

    Safe to re-invoke with the same batch_id (foreachBatch redelivery):
    the merge no-ops once committed.

    The LWW winners are persisted so the batch makes exactly ONE full pass
    over the events: schema discovery, bucket pruning and the MERGE join all
    read the ~|keys|-row cache, never the raw event stream again.

    The F3 danger-zone check rides the same pass as an ``observe`` metric
    (min ts over the pre-filter events) instead of a separate agg job; the
    observation resolves when the winners cache materializes, still BEFORE
    any merge work, so a breach aborts the batch unapplied
    (DynamoDBSourceTask.java:318-331). The CollectMetrics node intentionally
    pins the metric above the scan — the reference's check also sees every
    polled record, including ones later filters drop.
    """
    obs = None
    if now is not None:
        from pyspark.sql import Observation
        obs = Observation()
        df = df.observe(obs, F.min("ts").alias("min_ts"))
    winners = prepare_winners(df, init_sync_start=init_sync_start).persist()
    try:
        if obs is not None:
            # materialize the single events pass so the observation resolves
            # BEFORE merge work; with no danger check armed, the first
            # downstream action materializes the cache instead (no extra job)
            winners.count()
            min_ts = obs.get.get("min_ts")
            if min_ts is not None and min_ts <= filters.danger_cutoff(now):
                raise DangerZoneError(
                    "batch contains events older than the 20h danger zone")
        deduped = decode_winners(winners, discover_fields=discover_fields)
        return table.merge(spark, deduped, batch_id=batch_id, source=source)
    finally:
        winners.unpersist()
