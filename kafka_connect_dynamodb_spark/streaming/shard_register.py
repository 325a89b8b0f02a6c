"""Continuous per-shard max-committed-sequence-number register — the
reference's ``shardRegister`` (ConcurrentHashMap updated by
``RegisterAsProcessed``, DynamoDBSourceTask.java:88,413-430, checkpointed by
the KCL every 15 s, kcl/KclRecordProcessor.java:149-176) re-expressed as a
custom STATEFUL streaming operator with ``applyInPandasWithState``.

The lake path doesn't need this (micro-batch offsets subsume it); it exists
as the engine's stateful-operator surface: continuous, per-key (shard) state
that survives across micro-batches in the state store, emitting a row per
shard per batch when the watermark... no watermark — the register is
monotonic bookkeeping, not event-time aggregation (SURVEY §2.9 T2).

Arrow-batched: the update function receives pandas DataFrames per shard group
(no per-row Python in the engine's data plane — this operator touches only
(shard_id, seq_no) pairs, ~bytes per event).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

REGISTER_SCHEMA = T.StructType([
    T.StructField("shard_id", T.StringType(), False),
    T.StructField("max_seq_no", T.StringType(), False),   # decimal as string
    T.StructField("events_seen", T.LongType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("max_seq_no", T.StringType(), True),
    T.StructField("events_seen", T.LongType(), True),
])


def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
            state: GroupState) -> Iterable[pd.DataFrame]:
    """Monotonic max update (ignores smaller/out-of-order seq-nos, exactly
    like RegisterAsProcessed's BigInteger compare)."""
    prev_max, prev_seen = state.get if state.exists else (None, 0)
    cur = int(prev_max) if prev_max is not None else -1
    seen = prev_seen or 0
    for pdf in pdfs:
        if len(pdf):
            batch_max = max(int(s) for s in pdf["seq_no"])
            cur = max(cur, batch_max)
            seen += len(pdf)
    state.update((str(cur), seen))
    yield pd.DataFrame({"shard_id": [key[0]], "max_seq_no": [str(cur)],
                        "events_seen": [seen]})


def shard_register_stream(events_stream: DataFrame) -> DataFrame:
    """events stream -> continuous (shard_id, max_seq_no, events_seen).

    Usage::

        src = spark.readStream.schema(events_schema()).parquet(log_dir)
        reg = shard_register_stream(src)
        reg.writeStream.outputMode("update").format("memory") ...
    """
    compact = events_stream.select(
        "shard_id", F.col("seq_no").cast("string").alias("seq_no"))
    return (compact.groupBy("shard_id")
            .applyInPandasWithState(
                _update, outputStructType=REGISTER_SCHEMA,
                stateStructType=_STATE_SCHEMA, outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def final_register(spark, log_dir: str, checkpoint_dir: str,
                   schema=None) -> dict[str, dict[str, Any]]:
    """Drain the register over an existing log (availableNow) and return the
    final per-shard state {shard_id: {max_seq_no, events_seen}}."""
    from kafka_connect_dynamodb_spark.sources.generator import events_schema
    src = spark.readStream.schema(schema or events_schema()).parquet(log_dir)
    reg = shard_register_stream(src)
    out: dict[str, dict[str, Any]] = {}

    def _sink(batch_df, _batch_id):
        # latest update per shard wins (monotonic by construction); the
        # foreachBatch sink supports checkpoint recovery (memory sink doesn't)
        for r in batch_df.collect():
            out[r["shard_id"]] = {"max_seq_no": r["max_seq_no"],
                                  "events_seen": r["events_seen"]}

    q = (reg.writeStream.outputMode("update").foreachBatch(_sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())
    q.awaitTermination()
    return out


def safe_tombstone_watermark(register: dict[str, dict[str, Any]]) -> int:
    """Highest seq-no below which NO future event can arrive: shards deliver
    in seq order, so any undelivered event on shard s has seq >
    register[s]["max_seq_no"]; the min across shards is therefore a safe
    purge watermark for tombstones (T7: a tombstone guards against exactly
    one hazard — a late, lower-seq update resurrecting a deleted key — and
    below this watermark that hazard is impossible). Empty register -> 0
    (purge nothing)."""
    if not register:
        return 0
    return min(int(v["max_seq_no"]) for v in register.values())


def gc_tombstones(spark, table, register: dict[str, dict[str, Any]]):
    """Compact away tombstones that can no longer matter, using the
    register's safe watermark — the closing of the reference's
    shardRegister -> cleanup loop (KclRecordProcessor checkpoints up to the
    committed seq; here the same bookkeeping licenses physical deletion).
    Returns the new manifest, or None when the watermark licenses nothing."""
    wm = safe_tombstone_watermark(register)
    if wm <= 0:
        return None
    return table.compact(spark, drop_tombstones_below_seq=wm)
