"""Last-writer-wins per-key dedup — the engine's core reduce.

Generalizes the reference's per-shard monotonic max-sequence-number register
(DynamoDBSourceTask.java:413-430, A2) to a per-(repo,path) reduction, which is
what LWW replay + downstream Kafka log-compaction semantics (docs/data.md:47-52)
amount to.

Three physical strategies, all producing identical results:

* ``latest_per_key`` (default) — ``groupBy(keys).agg(max_by(struct(*), order))``.
  Catalyst plans this as partial + final hash aggregation, so the shuffle moves
  at most one row per key per map partition (map-side combine). Preferred at
  scale: shuffle bytes ~ |distinct keys|, not |events|.
* ``latest_per_key_window`` — ``row_number() over (partition by keys order by
  order desc) = 1``. Requires a full shuffle + sort of every event; kept for
  plan comparison and as the SQL-oracle-shaped formulation.
* ``latest_per_key_salted`` — two-phase max for pathological key skew: reduce
  on (keys, salt) first, then on keys. With map-side combine the plain agg is
  already skew-resistant (the hot key collapses to S rows per mapper), so this
  is for the extreme case of one key dominating entire map partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ord(order_cols: list[str]):
    return F.struct(*[F.col(c) for c in order_cols])


def latest_per_key(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key: the row with the lexicographically-largest order tuple.

    max_by(struct(payload), struct(order)) — partial/final agg, no sort.
    Ties on the full order tuple are broken arbitrarily; callers pass a
    totally-ordering tuple (seq_no is unique per key by stream contract,
    FIXTURES.md §2).
    """
    payload = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), _ord(order_cols)).alias("_top"))
    return agg.select(*keys, *[F.col(f"_top.{c}").alias(c) for c in payload])


def latest_per_key_window(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Window-ranking formulation (row_number desc = 1). Same semantics,
    heavier plan (full sort within key partitions); the single window function
    the rebuild needs per SURVEY §2.5."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn"))


def latest_per_key_salted(df: DataFrame, keys: list[str], order_cols: list[str],
                          salt_buckets: int = 16) -> DataFrame:
    """Two-phase LWW for hot-key skew (SURVEY §7.4.5).

    Phase 1 reduces on (keys + salt) — the hot key's events spread over
    ``salt_buckets`` reducers; phase 2 reduces the ≤salt_buckets survivors per
    key. Salt is derived from the order column (not random) so the job stays
    deterministic and resumable.
    """
    payload = [c for c in df.columns if c not in keys]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets)))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), _ord(order_cols)).alias("_top"))
    phase1 = phase1.select(*keys, *[F.col(f"_top.{c}").alias(c) for c in payload])
    return latest_per_key(phase1, keys, order_cols)


def shard_max_seq(df: DataFrame, shard_col: str = "shard_id",
                  seq_col: str = "seq_no") -> DataFrame:
    """A2: per-shard max committed sequence number — the reference's only
    aggregate (RegisterAsProcessed, DynamoDBSourceTask.java:413-430). Numeric
    (decimal(38,0)) compare, not lexicographic — 26-digit seq-nos per
    DynamoDBSourceTaskTests.java:821,832."""
    return df.groupBy(shard_col).agg(
        F.max(F.col(seq_col).cast("decimal(38,0)")).alias("max_seq_no"))
