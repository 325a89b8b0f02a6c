"""Exact distributed order statistics without a global sort.

``orderBy(col)`` followed by rank selection is the textbook quantile plan
and the one thing you must never do at 100 TB: a total sort is a full
range-repartition of the table. Spark's built-ins offer either
``approxQuantile`` (Greenwald-Khanna, approximate) or the exact
``percentile`` aggregate (buffers every value per group in executor
memory). This module computes EXACT type-1 (lower) quantiles — the value at
rank ``ceil(p * N)`` — with driver state O(n_buckets) and per-level shuffle
traffic of ``n_buckets`` rows:

1. one narrow aggregate for (count, min, max);
2. iterative histogram refinement: each level histograms every still-
   unresolved candidate interval into ``n_buckets`` equal-width bins with
   ONE map-side-combined aggregate (the bins also carry per-bin min/max,
   so a bin of identical values resolves immediately), then narrows each
   target rank to its bin — the candidate set shrinks ~n_buckets× per
   level (10^12 rows resolve in 3 levels at the default 2048);
3. one final windowed rank-selection over the few surviving rows.

Every pass is a pushable range filter + hash aggregate: no Python per row,
no global sort, no driver collect of data rows. Selection never does
arithmetic ON the values (only ordering), so results are bit-exact against
any engine's rank-based quantile on the same data.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket(col, lo: float, width: float, n_buckets: int):
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))


def exact_quantiles(df: DataFrame, col: str, probs: Sequence[float], *,
                    n_buckets: int = 2048, final_take: int = 8192,
                    max_levels: int = 40) -> list[float | None]:
    """Exact lower quantiles of ``df[col]`` (nulls/NaNs excluded).

    Returns one value per prob (None for an empty input). ``final_take``
    bounds the size of the interval handed to the closing rank-selection
    job; ``max_levels`` is a runaway guard (each level shrinks the
    candidate set ~n_buckets×, so 40 is unreachable in practice).
    """
    v = F.col(col).cast("double")
    vals = df.select(v.alias("v")).filter(F.col("v").isNotNull()
                                          & ~F.isnan("v"))
    base = vals.agg(F.count("v").alias("n"), F.min("v").alias("lo"),
                    F.max("v").alias("hi")).first()
    n = base["n"]
    if n == 0:
        return [None] * len(probs)

    # state per prob: (lo, hi, rank_within_interval, interval_count) or a
    # resolved float. ranks are 1-indexed; rank r means r-th smallest.
    state: list[object] = []
    for p in probs:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"prob out of range: {p}")
        k = min(n, max(1, math.ceil(p * n)))
        if base["lo"] == base["hi"]:
            state.append(float(base["lo"]))
        else:
            state.append((float(base["lo"]), float(base["hi"]), k, n))

    for _ in range(max_levels):
        open_ = {s[:2] for s in state if isinstance(s, tuple)
                 and s[3] > final_take}
        if not open_:
            break
        intervals = sorted(open_)
        # one histogram job across ALL unresolved intervals: tag each row
        # with its interval id (disjoint after level 1; duplicates share a
        # tag), bucket within the interval, agg count+min+max per bin.
        tag = None
        buck = None
        widths = []
        for i, (lo, hi) in enumerate(intervals):
            width = (hi - lo) / n_buckets
            widths.append(width)
            cond = (F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi))
            tag = F.when(cond, F.lit(i)) if tag is None else \
                tag.when(cond, F.lit(i))
            b = _bucket(F.col("v"), lo, width, n_buckets) if width > 0 \
                else F.lit(0)
            buck = F.when(cond, b) if buck is None else buck.when(cond, b)
        hist = (vals.withColumn("i", tag).withColumn("b", buck)
                    .filter(F.col("i").isNotNull())
                    .groupBy("i", "b")
                    .agg(F.count("v").alias("c"), F.min("v").alias("mn"),
                         F.max("v").alias("mx"))
                    .collect())
        bins: dict[int, list] = {}
        for r in hist:
            bins.setdefault(r["i"], []).append(r)
        for i in bins:
            bins[i].sort(key=lambda r: r["b"])

        new_state = []
        for s in state:
            if not isinstance(s, tuple) or s[3] <= final_take:
                new_state.append(s)
                continue
            lo, hi, k, cnt = s
            i = intervals.index((lo, hi))
            acc = 0
            resolved = None
            for r in bins[i]:
                if acc + r["c"] >= k:
                    k_in = k - acc
                    if r["mn"] == r["mx"]:
                        resolved = float(r["mn"])
                    elif (r["mn"], r["mx"]) == (lo, hi):
                        # no float progress possible (interval already at
                        # ulp scale): count 0 hands it to the final exact
                        # selection regardless of how many rows it holds
                        resolved = (r["mn"], r["mx"], k_in, 0)
                    else:
                        resolved = (float(r["mn"]), float(r["mx"]), k_in,
                                    int(r["c"]))
                    break
                acc += r["c"]
            assert resolved is not None, "rank fell outside histogram"
            new_state.append(resolved)
        state = new_state

    # final exact selection for every still-open interval, ONE job: filter
    # to the union of (tiny) intervals, rank within each, pick the target.
    pending = [(idx, s) for idx, s in enumerate(state) if isinstance(s, tuple)]
    if pending:
        from pyspark.sql import Window
        # one tag per DISTINCT interval (probs can share one; surviving
        # intervals are otherwise pairwise disjoint by construction)
        by_iv: dict[tuple, list] = {}
        for idx, (lo, hi, k, _) in pending:
            by_iv.setdefault((lo, hi), []).append((idx, k))
        conds = None
        tag = None
        targets = {}
        for j, ((lo, hi), tl) in enumerate(sorted(by_iv.items())):
            c = (F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi))
            conds = c if conds is None else (conds | c)
            tag = F.when(c, F.lit(j)) if tag is None else tag.when(c, F.lit(j))
            targets[j] = tl
        w = Window.partitionBy("j").orderBy("v")
        rows = (vals.filter(conds).withColumn("j", tag)
                    .withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn").isin(
                        *[k for tl in targets.values() for _, k in tl]))
                    .select("j", "rn", "v").collect())
        got = {(r["j"], r["rn"]): r["v"] for r in rows}
        for j, tl in targets.items():
            for idx, k in tl:
                state[idx] = float(got[(j, k)])
    return [s if isinstance(s, float) else None for s in state]


def quantiles_df(spark: SparkSession, df: DataFrame, col: str,
                 probs: Sequence[float], **kw) -> DataFrame:
    """``exact_quantiles`` as a (prob, value) DataFrame for oracle parity."""
    vals = exact_quantiles(df, col, probs, **kw)
    return spark.createDataFrame(
        [(float(p), v) for p, v in zip(probs, vals)],
        "prob double, value double")
