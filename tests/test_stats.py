"""Exact distributed quantiles: bit-parity with naive sorted-rank selection
across distributions that stress the histogram refinement (uniform, heavy
duplicates, constant, ulp-adjacent, tiny N), plus job-shape guarantees."""

from __future__ import annotations

import math

import pytest

from kafka_connect_dynamodb_spark.operators.stats import (
    exact_quantiles, quantiles_df)

PROBS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]


def _naive(values, probs):
    s = sorted(values)
    n = len(s)
    return [s[min(n, max(1, math.ceil(p * n))) - 1] for p in probs]


def _check(spark, values, probs=PROBS, **kw):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = exact_quantiles(df, "v", probs, **kw)
    assert got == _naive(values, probs), (got, _naive(values, probs))


def test_uniform_values(spark):
    vals = [((i * 2654435761) % 100000) / 7.0 for i in range(5000)]
    _check(spark, vals, n_buckets=64, final_take=50)


def test_heavy_duplicates_resolve_via_bin_minmax(spark):
    # 90% of mass on two spikes: equal-width bins can't split a spike, the
    # per-bin min==max shortcut must
    vals = [1.0] * 2000 + [2.0] * 2500 + [float(i) / 100 for i in range(500)]
    _check(spark, vals, n_buckets=16, final_take=10)


def test_constant_column(spark):
    _check(spark, [42.0] * 1000, n_buckets=8, final_take=5)


def test_ulp_adjacent_values(spark):
    base = 1.0
    vals = [base, math.nextafter(base, 2.0),
            math.nextafter(math.nextafter(base, 2.0), 2.0)] * 300
    _check(spark, vals, n_buckets=4, final_take=2)


def test_tiny_and_single(spark):
    _check(spark, [3.0], probs=[0.0, 0.5, 1.0])
    _check(spark, [5.0, -1.0], probs=[0.0, 0.5, 1.0])


def test_nulls_and_nans_excluded(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (2.0,), (3.0,)], "v double")
    assert exact_quantiles(df, "v", [0.5]) == [2.0]


def test_empty_input(spark):
    df = spark.createDataFrame([], "v double")
    assert exact_quantiles(df, "v", [0.5, 0.9]) == [None, None]


def test_bad_prob_raises(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [1.5])


def test_quantiles_df_shape(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    out = quantiles_df(spark, df, "v", [0.25, 0.75]).collect()
    assert [(r["prob"], r["value"]) for r in out] == [(0.25, 24.0),
                                                      (0.75, 74.0)]


@pytest.fixture(scope="module")
def duck():
    import os

    import duckdb
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf}/lineitem.parquet'")
    return con


def test_testdata_lineitem_matches_duckdb(spark, duck):
    """Rank selection vs DuckDB row_number on the real testdata table —
    the same parity contract the driver gate applies."""
    import os
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    probs = [0.01, 0.5, 0.99]
    got = exact_quantiles(li, "l_extendedprice", probs,
                          n_buckets=128, final_take=64)
    n = duck.sql("SELECT count(*) FROM lineitem "
                 "WHERE l_extendedprice IS NOT NULL").fetchone()[0]
    want = []
    for p in probs:
        k = min(n, max(1, math.ceil(p * n)))
        want.append(duck.sql(
            "SELECT v FROM (SELECT l_extendedprice v, row_number() "
            "OVER (ORDER BY l_extendedprice) rn FROM lineitem "
            f"WHERE l_extendedprice IS NOT NULL) WHERE rn = {k}"
        ).fetchone()[0])
    assert got == want
