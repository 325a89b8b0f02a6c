"""Funnel analysis: ordered event-sequence matching over a change stream.

Given an ordered list of step event types, find for each user the earliest
strictly-increasing timestamp chain through the steps — the first time they
completed step 1, the first step-2 event strictly after that, and so on
(the standard product-analytics funnel, with an optional ``within`` horizon
measured from the step-1 time). Beyond the reference's inventory (no
analytics in trustpilot/kafka-connect-dynamodb); a natural consumer of the
change feed this engine lands.

Scale shape: the sequential dependency (step k's candidate set depends on
step k-1's time) is expressed as k chained whole-partition window minima
over ONE hashpartitioning(user) exchange — no joins, no per-row Python, no
sort (un-ordered windows use the entire-partition frame). A distinct
(user, type, ts) pre-aggregation runs first with map-side combine, so a
celebrity user contributes distinct timestamps per step type, not raw
events, before hitting the single-partition window. Events whose type is
not a step are pruned by a pushable ``IN`` filter before the shuffle.

Semantics notes: a step-k event at EXACTLY the step-(k-1) time does not
count (strict >, the usual funnel rule — simultaneous events can't be
ordered); the earliest-chain greedy is optimal for "did the user reach
step k within the horizon" because taking the earliest feasible event at
every step only ever widens later steps' candidate windows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(df: DataFrame, steps: Sequence[str], *,
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts", within: str | None = None) -> DataFrame:
    """One row per user: ``t1..tk`` earliest-chain step times (null once
    the chain breaks) and ``steps_completed``.

    ``within`` (an INTERVAL literal body, e.g. ``"7 days"``) bounds every
    later step to ``t1 + within``.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    ev = (df.select(F.col(user_col).alias("u"),
                    F.col(type_col).alias("e"),
                    F.col(ts_col).alias("t"))
            .filter(F.col("e").isin(steps))
            .groupBy("u", "e", "t").agg(F.lit(1))
            .select("u", "e", "t"))
    w = Window.partitionBy("u")
    horizon = (F.col("_t1") + F.expr(f"INTERVAL {within}")) if within else None
    out = ev
    for i, s in enumerate(steps, start=1):
        cond = F.col("e") == s
        if i > 1:
            cond = cond & (F.col("t") > F.col(f"_t{i - 1}"))
            if horizon is not None:
                cond = cond & (F.col("t") <= horizon)
        out = out.withColumn(f"_t{i}", F.min(F.when(cond, F.col("t"))).over(w))
    completed = F.lit(0)
    for i in range(1, len(steps) + 1):
        completed = F.when(F.col(f"_t{i}").isNotNull(), F.lit(i)) \
                     .otherwise(completed)
    # per-user reduce rides the same user partitioning (values are
    # partition-constant; min() is just a pick)
    return (out.withColumn("steps_completed", completed)
               .groupBy(F.col("u").alias(user_col))
               .agg(*[F.min(f"_t{i}").alias(f"t{i}")
                      for i in range(1, len(steps) + 1)],
                    F.min("steps_completed").alias("steps_completed")))


def funnel_report(df: DataFrame, steps: Sequence[str], *,
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts", within: str | None = None) -> DataFrame:
    """Per-step funnel counts: users reaching each step, conversion from
    the previous step and from the top (exact integer counts; doubles only
    in the two final divisions)."""
    times = funnel_times(df, steps, user_col=user_col, type_col=type_col,
                         ts_col=ts_col, within=within)
    per_step = [
        F.sum(F.when(F.col("steps_completed") >= i, 1).otherwise(0))
         .cast("long").alias(f"_n{i}")
        for i in range(1, len(steps) + 1)]
    wide = times.agg(*per_step).first()
    rows = []
    for i, s in enumerate(steps, start=1):
        n = wide[f"_n{i}"]
        prev = wide[f"_n{i - 1}"] if i > 1 else None
        top = wide["_n1"]
        rows.append((i, s, n,
                     float(n) / prev if prev else None,
                     float(n) / top if top and i > 1 else None))
    return df.sparkSession.createDataFrame(
        rows, "step int, event_type string, n_users long, "
              "conv_from_prev double, conv_from_top double")
