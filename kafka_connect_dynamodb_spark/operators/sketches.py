"""Mergeable sketches for approximate analytics at 100 TB.

Spark ships HLL (approx_count_distinct) and KLL-ish quantiles
(approx_percentile) built in; this module adds a K-Minimum-Values (KMV)
distinct sketch, chosen deliberately because it is DETERMINISTIC given the
hash function: the sketch IS the k smallest sha256 values of the key set,
so two engines (or two cluster sizes) produce byte-identical sketches and
estimates — which makes it the one cardinality sketch a DuckDB oracle can
verify bit-for-bit (HLL implementations never match across engines).

Estimator: with k minima over hashes uniform in [0,1),
``distinct ≈ (k-1) / frac(kth_min)`` (Bar-Yossef et al. 2002); below k
distinct values the sketch is exact. Sketches merge by unioning minima and
re-truncating to k — a monoid, so partial sketches combine across
partitions/days without rescanning (the rollup-friendly property).

Plan shape: distinct (group, hash) -> ranking window top-k per group ->
one-row-per-group aggregate. WindowGroupLimit pushes the rank<=k filter
into the map side, so the final shuffle carries ~k hashes per group per
mapper (not the full distinct set), and no collect_set of unbounded size
exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: exactly representable in a double (2^52)
_FRAC_DIV = float(16 ** 13)


def kmv_sketch(df: DataFrame, group_cols: list[str], key_col: str,
               k: int = 64) -> DataFrame:
    """Per-group KMV sketch: the k lexicographically-smallest sha256 hex
    digests of distinct keys (lex order == numeric order for fixed-width
    lowercase hex). Columns: group_cols + minima:array<string> + n_seen."""
    h = (df.select(*group_cols,
                   F.sha2(F.col(key_col).cast("string"), 256).alias("_h"))
           .distinct())
    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = h.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (topk.groupBy(*group_cols)
                .agg(F.sort_array(F.collect_list("_h")).alias("minima"),
                     F.count("*").alias("n_seen")))


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: exact below k, else
    (k-1)/frac(kth minimum). Pure integer/double arithmetic on the first
    13 hex chars — identical bits on any IEEE-754 engine."""
    kth = F.element_at("minima", k)
    frac = F.conv(F.substring(kth, 1, 13), 16, 10).cast("double") / F.lit(_FRAC_DIV)
    est = F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")) \
           .otherwise(F.lit(float(k - 1)) / frac)
    return sketch.withColumn("kmv_estimate", est)


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str],
              k: int = 64) -> DataFrame:
    """Merge two sketch frames (the monoid op): union minima per group,
    dedupe, keep the k smallest."""
    u = (a.select(*group_cols, F.explode("minima").alias("_h"))
          .unionByName(b.select(*group_cols, F.explode("minima").alias("_h")))
          .distinct())
    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = u.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (topk.groupBy(*group_cols)
                .agg(F.sort_array(F.collect_list("_h")).alias("minima"),
                     F.count("*").alias("n_seen")))
