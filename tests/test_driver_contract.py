"""The driver's correctness gate, run locally: every __spark_entry__.queries()
entry vs its oracle_sql() on DuckDB at sf0.001 (row count, sorted column
names, order-insensitive stringified values — same normalization the driver
applies). Queries without an oracle get the weaker rows-only check."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    s_rows = [tuple(r) for r in sdf.collect()]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        # rows-only check (non-SQL-expressible operator)
        assert len(s_rows) >= 0
        assert sdf.columns
        return
    res = duck.sql(oracle)
    d_cols, d_rows = list(res.columns), res.fetchall()
    sc, sr = _norm(sdf.columns, s_rows)
    dc, dr = _norm(d_cols, d_rows)
    assert sc == dc, f"{name}: schema {sc} != {dc}"
    assert len(sr) == len(dr), f"{name}: rowcount {len(sr)} != {len(dr)}"
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
    assert sr == dr, f"{name}: values differ, e.g. {mismatches}"


OUT_OF_GATE = {**entrymod.BASELINE_QUERIES, **entrymod.RETIRED_QUERIES,
               **entrymod.CANDIDATE_QUERIES}
OUT_OF_GATE_SQL = {**entrymod.BASELINE_ORACLE_SQL,
                   **entrymod.RETIRED_ORACLE_SQL,
                   **entrymod.CANDIDATE_ORACLE_SQL}


@pytest.mark.parametrize("name", sorted(OUT_OF_GATE))
def test_out_of_gate_queries_match_oracle(spark, duck, name):
    """The two declared crossJoin baselines and the six r5-retired entries
    live OUTSIDE the 50-entry driver registry (gate caps at 50 rows) but
    keep the identical oracle contract here — same normalization, same
    DuckDB views. This test must stay mandatory (only the testdata guard
    may skip it): it is the only independent check these queries get."""
    sdf = OUT_OF_GATE[name](spark, SF_DIR)
    res = duck.sql(OUT_OF_GATE_SQL[name])
    sc, sr = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
    dc, dr = _norm(list(res.columns), res.fetchall())
    assert sc == dc, f"{name}: schema {sc} != {dc}"
    assert sr == dr, f"{name}: values differ"


def test_registry_fits_driver_gate():
    """The driver emits at most 50 CORRECTNESS rows (first 50 dict entries,
    observed r2/r3); the registry must stay exactly at the cap with every
    entry oracle-backed so every operator gets a hard signal."""
    qs = entrymod.queries()
    assert len(qs) == 50, len(qs)
    missing = [n for n in qs if n not in entrymod.oracle_sql()]
    assert not missing, missing
    # the previously-uncertified entries are inside the gate window
    names = list(qs)
    assert "cdc_salted_hot_key_agg" in names[:50]
    assert "multimodal_features" in names[:50]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns
