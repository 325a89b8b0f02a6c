"""Deterministic sampling: rate accuracy, partition independence,
per-stratum quotas, weighted inclusion proportional to weight."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.operators.sampling import (
    deterministic_sample, stratified_sample, weighted_sample)


def test_bernoulli_rate_and_partition_independence(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = deterministic_sample(df, 0.3, "k")
    n = a.count()
    assert abs(n / 20_000 - 0.3) < 0.02
    b = deterministic_sample(df.repartition(17), 0.3, "k")
    assert {r.k for r in a.collect()} == {r.k for r in b.collect()}


def test_salt_changes_the_sample(spark):
    df = spark.range(5_000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, 0.2, "k").collect()}
    b = {r.k for r in deterministic_sample(df, 0.2, "k", salt="v2").collect()}
    assert a != b
    assert abs(len(b) / 5_000 - 0.2) < 0.03


def test_stratified_rates_per_stratum(spark):
    rows = [(i, "en" if i % 2 == 0 else "sw") for i in range(20_000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = stratified_sample(df, "lang", {"en": 0.1}, "k", default_rate=0.9)
    got = {r.lang: 0 for r in out.select("lang").distinct().collect()}
    counts = {r.lang: r.n for r in
              out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert abs(counts["en"] / 10_000 - 0.1) < 0.02
    assert abs(counts["sw"] / 10_000 - 0.9) < 0.02
    assert got is not None


def test_weighted_sample_prefers_heavy_rows(spark):
    # two strata: weight 10 vs weight 1, equal counts; a k=500 sample from
    # 2x2500 rows should be dominated by the heavy stratum
    rows = [(i, 10.0 if i < 2500 else 1.0) for i in range(5000)]
    df = spark.createDataFrame(rows, "k long, w double")
    out = weighted_sample(df, "w", 500, "k")
    assert out.count() == 500
    heavy = out.filter("k < 2500").count()
    assert heavy > 350                       # ~10:1 odds per slot
    # deterministic: same call, same sample
    again = weighted_sample(df, "w", 500, "k")
    assert {r.k for r in out.collect()} == {r.k for r in again.collect()}


def test_temperature_mix_rates_formula_and_clip():
    from kafka_connect_dynamodb_spark.operators.sampling import (
        temperature_mix_rates)
    counts = {"head": 800, "mid": 150, "tail": 50}
    rates = temperature_mix_rates(counts, target_frac=0.5, alpha=0.5)
    # python replica, same sorted-order fold
    import math
    w = {s: math.sqrt(counts[s]) for s in counts}
    sw = w["head"] + w["mid"] + w["tail"]   # sorted: head, mid, tail
    for s in counts:
        assert rates[s] == min(1.0, (0.5 * 1000.0) * (w[s] / sw) / counts[s])
    # temperature flattens: tail keep-rate > head keep-rate
    assert rates["tail"] > rates["mid"] > rates["head"]
    # a tiny stratum clips to keep-everything
    clipped = temperature_mix_rates({"big": 10000, "rare": 3},
                                    target_frac=0.5, alpha=0.5)
    assert clipped["rare"] == 1.0


def test_temperature_resample_deterministic_and_expected_size(spark):
    from kafka_connect_dynamodb_spark.operators.sampling import (
        temperature_mix_rates, temperature_resample)
    rows = [(i, "head" if i % 10 < 8 else ("mid" if i % 10 < 9 else "tail"))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, "source", "doc_id", target_frac=0.4)
    got = out.groupBy("source", "keep_rate").agg(
        F.count("*").alias("n"),
        F.sum(F.col("kept").cast("long")).alias("k")).collect()
    counts = {r.source: r.n for r in got}
    rates = temperature_mix_rates(counts, target_frac=0.4, alpha=0.5)
    for r in got:
        assert r.keep_rate == rates[r.source]
        # kept count within 5 sigma of the Bernoulli expectation
        exp, sig = r.n * rates[r.source], (r.n * rates[r.source]) ** 0.5
        assert abs(r.k - exp) <= 5 * sig + 1, (r.source, r.k, exp)
    # partition-independence of the decision
    again = temperature_resample(df.repartition(17), "source", "doc_id",
                                 target_frac=0.4)
    assert (sorted(out.filter("kept").select("doc_id").toPandas().doc_id)
            == sorted(again.filter("kept").select("doc_id").toPandas().doc_id))


def test_temperature_mix_rates_invariants():
    """Pure-formula invariants: unclipped expected size hits the target
    exactly; alpha=1 degenerates to a uniform rate (proportional sampling
    changes nothing); alpha=0 gives equal mass per stratum; smaller alpha
    always boosts the tail at the head's expense."""
    from kafka_connect_dynamodb_spark.operators.sampling import (
        temperature_mix_rates)
    counts = {"head": 5000, "mid": 900, "tail": 100}
    n = sum(counts.values())
    for alpha in (0.0, 0.25, 0.5, 0.75, 1.0):
        rates = temperature_mix_rates(counts, target_frac=0.3, alpha=alpha)
        if all(r < 1.0 for r in rates.values()):
            expected = sum(counts[s] * rates[s] for s in counts)
            assert abs(expected - 0.3 * n) < 1e-6, alpha
    uni = temperature_mix_rates(counts, target_frac=0.3, alpha=1.0)
    assert all(abs(r - 0.3) < 1e-12 for r in uni.values())
    flat = temperature_mix_rates(counts, target_frac=0.3, alpha=0.0)
    mass = {s: counts[s] * flat[s] for s in counts}
    # equal mass per stratum (0.3 * 6000 / 3 = 600) for strata big enough
    # to supply it; the 100-doc tail clips to keep-everything
    assert abs(mass["head"] - 600.0) < 1e-6
    assert abs(mass["mid"] - 600.0) < 1e-6
    assert flat["tail"] == 1.0 and mass["tail"] == 100.0
    # monotonicity on an unclipped configuration: lower alpha boosts the
    # tail at the head's expense
    c2 = {"head": 5000, "mid": 900, "tail": 400}
    r1 = temperature_mix_rates(c2, target_frac=0.2, alpha=1.0)
    r_half = temperature_mix_rates(c2, target_frac=0.2, alpha=0.5)
    r_quart = temperature_mix_rates(c2, target_frac=0.2, alpha=0.25)
    assert r_quart["tail"] > r_half["tail"] > r1["tail"]
    assert r_quart["head"] < r_half["head"] < r1["head"]


# ------------------------------------------------- leakage-safe splits

def test_cluster_safe_split_matches_bruteforce(spark):
    """Union-find + sha replay: split equals hash(cluster-min-id) against
    cumulative 52-bit thresholds; near-dups never straddle splits."""
    import hashlib
    from kafka_connect_dynamodb_spark.operators.sampling import (
        cluster_safe_split, threshold_for)
    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (10, 30), (30, 31), (7, 8)],
        "id_a long, id_b long")
    out = {r.doc_id: (r.cluster_id, r.split)
           for r in cluster_safe_split(docs, pairs).collect()}
    # brute union-find
    parent = {i: i for i in range(40)}
    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x
    for a, b in [(0, 1), (1, 2), (5, 6), (10, 30), (30, 31), (7, 8)]:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    t1, t2 = threshold_for(0.90), threshold_for(0.95)
    for i in range(40):
        c = find(i)
        h = int(hashlib.sha256(f"split{c}".encode()).hexdigest()[:13], 16)
        split = "train" if h < t1 else ("val" if h < t2 else "test")
        assert out[i] == (c, split), (i, out[i], (c, split))


def test_cluster_safe_split_no_straddle_and_mass(spark):
    """Random near-dup graphs: every edge's endpoints land in the same
    split; split masses approximate the fractions over many clusters."""
    import random
    from kafka_connect_dynamodb_spark.operators.sampling import (
        cluster_safe_split)
    rng = random.Random(9)
    n = 400
    edges = [(i, i + 1) for i in range(0, n, 10) ]  # chains of 2
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pdf = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = cluster_safe_split(docs, pdf).collect()
    split_of = {r.doc_id: r.split for r in rows}
    for a, b in edges:
        assert split_of[a] == split_of[b], (a, b)
    frac_train = sum(1 for r in rows if r.split == "train") / n
    assert 0.80 < frac_train <= 1.0
    assert {r.split for r in rows} <= {"train", "val", "test"}


def test_cluster_safe_split_fracs_validation(spark):
    import pytest as _pytest
    from kafka_connect_dynamodb_spark.operators.sampling import (
        cluster_safe_split)
    docs = spark.createDataFrame([(1,)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with _pytest.raises(ValueError):
        cluster_safe_split(docs, pairs,
                           fracs=(("train", 0.5), ("test", 0.4)))
