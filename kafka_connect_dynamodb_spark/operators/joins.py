"""Temporal joins Spark lacks as built-ins: AS-OF join and range join.

Neither exists in the reference (its only join is the implicit key upsert)
nor in Spark's operator set; both are staples of event-time analytics over
CDC output, so the engine ships them as compositions of built-in operators
(no UDF, no Catalyst extension):

* **AS-OF join** (backward): each left row matches the latest right row with
  ``right_ts <= left_ts`` for its key. Implemented with the union+window
  trick — tag both sides, union, and carry the right payload forward with
  ``last(ignorenulls)`` over a key-partitioned event-time window. ONE
  shuffle on the key, linear state, no range predicate ever reaches a join:
  the naive alternative (inequality theta-join + ranking) is a quadratic
  blowup per key at 100 TB.

* **Range join** (point-in-interval): match left points to right intervals
  without requiring an equi-key. Implemented by bucketing time: each
  interval explodes into the fixed-width buckets it covers, each point maps
  to exactly one bucket, and the match becomes a plain equi-join on the
  bucket id + an exact residual filter. Shuffle volume is
  |right| * (interval/bucket_width) + |left| — tune ``bucket_width`` to the
  typical interval so the fanout stays O(1) per interval. A pair can only
  meet in the point's single bucket, so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, key_cols: list[str],
              left_ts: str, right_ts: str) -> DataFrame:
    """Backward AS-OF join (DuckDB ``ASOF JOIN``/pandas ``merge_asof``
    semantics, inclusive): latest right row with ``right_ts <= left_ts``
    per key; left rows with no prior right row are dropped (inner).

    Right payload column names must not collide with left's. If several
    right rows share (key, right_ts), pre-dedupe the right side — the
    winner would otherwise be tie-ambiguous on every engine.
    """
    rpay = [c for c in right.columns
            if c not in key_cols and c != right_ts]
    clash = set(rpay) & set(left.columns)
    if clash:
        raise ValueError(f"right payload collides with left columns: {clash}")

    lhs = (left.withColumn("_t", F.col(left_ts))
               .withColumn("_is_left", F.lit(1)))
    # The whole right payload rides as ONE struct so a single
    # last(ignorenulls) carries a complete right ROW forward — per-column
    # carry would let a stale non-null value from an older row win per
    # column when newer rows contain nulls (row-mixing), and would misread
    # a genuinely-NULL payload value as "no match". The struct is non-null
    # exactly when a right row matched.
    rhs = (right.select(*key_cols,
                        F.col(right_ts).alias("_t"),
                        F.struct(F.lit(True).alias("_m"), *rpay).alias("_rpay"))
                .withColumn("_is_left", F.lit(0)))
    u = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal _t => inclusive (<=) match
    w = (Window.partitionBy(*key_cols)
               .orderBy(F.col("_t"), F.col("_is_left"))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("_rpay", F.last("_rpay", ignorenulls=True).over(w))
    out = (u.filter(F.col("_is_left") == 1)
            .filter(F.col("_rpay").isNotNull())   # inner semantics
            .select(*[F.col(c) for c in left.columns],
                    *[F.col(f"_rpay.{c}").alias(c) for c in rpay]))
    return out


def range_join_bucketed(left: DataFrame, right: DataFrame, *,
                        point_col: str, start_col: str, end_col: str,
                        bucket_width: int) -> DataFrame:
    """Point-in-interval join, ``start <= point < end``, no equi-key needed.

    ``point_col``/``start_col``/``end_col`` are integer-comparable (e.g.
    epoch millis). Each right interval explodes into the buckets it covers;
    each left point hits exactly one bucket, so the equi-join on bucket id
    yields each matching pair exactly once before the residual filter.
    """
    lb = left.withColumn(
        "_rb", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long"))
    rb = right.withColumn(
        "_rb", F.explode(F.sequence(
            F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long"),
            F.floor((F.col(end_col) - 1) / F.lit(bucket_width)).cast("long"))))
    j = (lb.join(rb, "_rb")
           .filter((F.col(point_col) >= F.col(start_col))
                   & (F.col(point_col) < F.col(end_col))))
    return j.drop("_rb")
