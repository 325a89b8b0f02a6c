"""Deterministic sampling: rate accuracy, partition independence,
per-stratum quotas, weighted inclusion proportional to weight."""

from __future__ import annotations

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
