"""KMV distinct sketch: determinism, merge monoid, estimate accuracy."""

from __future__ import annotations

from kafka_connect_dynamodb_spark.operators.sketches import (
    kmv_estimate, kmv_merge, kmv_sketch)


def _df(spark, ids, grp="g"):
    return spark.createDataFrame([(grp, i) for i in ids], "g string, id long")


def test_kmv_exact_below_k(spark):
    sk = kmv_estimate(kmv_sketch(_df(spark, range(40)), ["g"], "id", k=64), k=64)
    r = sk.collect()[0]
    assert r.n_seen == 40 and r.kmv_estimate == 40.0


def test_kmv_estimate_within_tolerance(spark):
    n = 5000
    sk = kmv_estimate(kmv_sketch(_df(spark, range(n)), ["g"], "id", k=64), k=64)
    est = sk.collect()[0].kmv_estimate
    # k=64 -> ~1/sqrt(62) ≈ 13% relative error at 1 sigma; allow 4 sigma
    assert abs(est - n) / n < 0.5


def test_kmv_deterministic_across_partitioning(spark):
    df1 = _df(spark, range(1000))
    df2 = df1.repartition(13)
    a = kmv_sketch(df1, ["g"], "id").collect()[0]
    b = kmv_sketch(df2, ["g"], "id").collect()[0]
    assert a.minima == b.minima


def test_kmv_merge_equals_sketch_of_union(spark):
    a = kmv_sketch(_df(spark, range(0, 600)), ["g"], "id")
    b = kmv_sketch(_df(spark, range(400, 1000)), ["g"], "id")  # overlap
    merged = kmv_merge(a, b, ["g"]).collect()[0]
    direct = kmv_sketch(_df(spark, range(1000)), ["g"], "id").collect()[0]
    assert merged.minima == direct.minima and merged.n_seen == direct.n_seen
