"""Deterministic sampling for training-data pipelines.

Random sampling on a cluster must be REPRODUCIBLE (same corpus -> same
sample, regardless of partitioning or retries), so nothing here uses
``rand()``: the selection variable is a hash of the row key.

* ``hash_frac`` — sha256-based uniform in [0,1): first 13 hex chars as a
  52-bit integer (exactly representable in a double). Any engine with
  sha256 reproduces it bit-for-bit, which is what makes the sampled SET
  oracle-checkable — unlike Bernoulli ``sample()``.
* ``deterministic_sample`` — Bernoulli by integer threshold comparison
  (``hash_int < floor(rate * 2^52)``), no floating point in the decision.
* ``stratified_sample`` — per-stratum rates (e.g. language quotas for a
  corpus rebalance); one pushdown-friendly CASE, no shuffle at all.
* ``weighted_sample`` — Efraimidis–Spirakis weighted reservoir: top-k by
  ``-ln(u)/w`` (exponential race). Deterministic given the hash, but the
  transcendental sort key means last-ulp libm differences across engines
  could in principle flip exact ties — so this one is pinned by tests
  (expectation + determinism), not by a value-hash oracle.

Scale: all three are single-pass column expressions; weighted_sample adds
one TakeOrderedAndProject (per-partition top-k, no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FRAC_BITS = 52                     # 13 hex chars
_FRAC_DIV = float(1 << _FRAC_BITS)


def hash_int(key: Column, salt: str = "") -> Column:
    """52-bit uniform integer from sha256(salt || key) — the deterministic
    stand-in for rand() everywhere in this module."""
    h = F.sha2(F.concat(F.lit(salt), key.cast("string")), 256)
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long")


def hash_frac(key: Column, salt: str = "") -> Column:
    return hash_int(key, salt) / F.lit(_FRAC_DIV)


def threshold_for(rate: float) -> int:
    """Integer acceptance threshold for a rate — exact, no FP comparison."""
    return int(rate * (1 << _FRAC_BITS))


def deterministic_sample(df: DataFrame, rate: float, key_col: str, *,
                         salt: str = "") -> DataFrame:
    """Partition-independent Bernoulli(rate) sample keyed on ``key_col``."""
    return df.filter(hash_int(F.col(key_col), salt) < F.lit(threshold_for(rate)))


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], key_col: str, *,
                      default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum Bernoulli rates (corpus rebalancing: e.g. keep 10% of
    English, 100% of low-resource languages). Unlisted strata use
    ``default_rate``."""
    thr = F.lit(threshold_for(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(threshold_for(rate))).otherwise(thr)
    return df.filter(hash_int(F.col(key_col), salt) < thr)


def weighted_sample(df: DataFrame, weight_col: str, k: int, key_col: str, *,
                    salt: str = "") -> DataFrame:
    """Efraimidis–Spirakis weighted sample without replacement: the k rows
    with smallest ``-ln(u)/w`` (u = hash_frac). Inclusion probability is
    proportional to weight; deterministic given the corpus."""
    u = hash_frac(F.col(key_col), salt)
    # guard u=0 (probability 2^-52) and non-positive weights
    ekey = -F.log(F.greatest(u, F.lit(2.0 ** -53))) / F.col(weight_col)
    return (df.withColumn("_ekey", ekey)
              .filter(F.col(weight_col) > 0)
              .orderBy(F.col("_ekey").asc(), F.col(key_col))
              .limit(k)
              .drop("_ekey"))


def temperature_mix_rates(counts: dict[str, int], *, target_frac: float = 0.5,
                          alpha: float = 0.5) -> dict[str, float]:
    """Temperature-scaled mixture rates over strata (the multilingual /
    multi-source rebalance of mT5 / XLM-R: sampling mass proportional to
    ``n_s^alpha`` flattens the head and boosts the tail). Returns per-
    stratum Bernoulli keep-rates such that the EXPECTED kept size is
    ``target_frac`` of the corpus (before the min(1,.) clip; clipped
    strata keep everything).

    Driver arithmetic on one tiny count dict (strata are low-cardinality
    by definition). The weight sum folds in SORTED stratum order so the
    float result is reproducible and a SQL oracle can replay it term for
    term; alpha=0.5 uses IEEE-exact sqrt — any alpha works, but
    non-half powers go through libm ``pow`` whose last ulp is not
    portable across engines (the :func:`weighted_sample` caveat)."""
    names = sorted(counts)
    n_total = 0
    for s in names:
        n_total += int(counts[s])
    w = {s: float(int(counts[s])) ** alpha for s in names}
    sum_w = 0.0
    for s in names:
        sum_w += w[s]
    budget = target_frac * float(n_total)
    return {s: min(1.0, budget * (w[s] / sum_w) / float(int(counts[s])))
            for s in names if counts[s] > 0}


def temperature_resample(df: DataFrame, strata_col: str, key_col: str, *,
                         target_frac: float = 0.5, alpha: float = 0.5,
                         salt: str = "mix",
                         counts: dict[str, int] | None = None) -> DataFrame:
    """Deterministic temperature resample: per-stratum keep-rates from
    :func:`temperature_mix_rates`, keep decision by the portable integer
    hash threshold (no floating point in the per-row decision). Emits
    every row with its stratum's ``keep_rate`` and the ``kept`` flag so
    the caller can audit expected-vs-actual mix before filtering.

    Scale shape: ONE map-side-combined groupBy produces the per-stratum
    counts (skipped when ``counts`` is passed — the zero-repeat-jobs
    contract); the rates come back as a literal CASE, so the scoring pass
    is a pure projection — no join, no shuffle, pushdown-friendly."""
    if counts is None:
        counts = {r[0]: r[1] for r in
                  df.groupBy(strata_col).count().collect()}
    rates = temperature_mix_rates(counts, target_frac=target_frac,
                                  alpha=alpha)
    rate_e = F.lit(0.0)
    thr_e = F.lit(0)
    for s in sorted(rates):
        rate_e = F.when(F.col(strata_col) == s,
                        F.lit(rates[s])).otherwise(rate_e)
        thr_e = F.when(F.col(strata_col) == s,
                       F.lit(int(rates[s] * (1 << _FRAC_BITS)))).otherwise(thr_e)
    return df.withColumn("keep_rate", rate_e).withColumn(
        "kept", hash_int(F.col(key_col), salt) < thr_e)


# ------------------------------------------------- leakage-safe splits

def cluster_safe_split(docs: DataFrame, pairs: DataFrame, *,
                       id_col: str = "doc_id",
                       fracs: tuple = (("train", 0.90), ("val", 0.05),
                                       ("test", 0.05)),
                       salt: str = "split") -> DataFrame:
    """Leakage-safe train/val/test split: every document is assigned a
    split by the portable hash of its NEAR-DUP CLUSTER id (connected
    component over ``pairs``; unpaired docs are their own cluster), so
    near-duplicates can never straddle a split boundary — the standard
    contamination channel a doc-keyed split leaves open (a test document
    whose near-copy sits in train).

    ``fracs`` is an ordered (name, fraction) tuple; fractions must sum to
    1. Assignment uses exact integer thresholds on the 52-bit hash (no
    floating point in the per-row decision) against CUMULATIVE cut
    points, so each split's expected mass is its fraction and the whole
    assignment is reproducible from (cluster_id, salt) alone.

    Output: ``(id_col, cluster_id, split)`` — one row per input doc.

    Scale shape: connected components is the dominant cost (one
    equi-join + min-agg per round, linear in near-dup edges; see
    :func:`..dedup.connected_components`); the split itself is one
    left join (docs × tiny component table) and a pure projection.
    Extends the engine beyond the reference (no corpus analytics in
    trustpilot/kafka-connect-dynamodb)."""
    from .dedup import connected_components

    total = sum(f for _, f in fracs)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fracs must sum to 1, got {total}")
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    joined = docs.select(F.col(id_col)).join(comp, on=id_col, how="left")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    h = hash_int(cluster, salt)
    acc = 0.0
    expr = F.lit(fracs[-1][0])          # fall-through: the last split
    conds = []
    for name, frac in fracs[:-1]:
        acc += frac
        conds.append((threshold_for(acc), name))
    for thr, name in reversed(conds):
        expr = F.when(h < F.lit(thr), F.lit(name)).otherwise(expr)
    return joined.select(F.col(id_col), cluster.alias("cluster_id"),
                         expr.alias("split"))
