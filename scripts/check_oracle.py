"""Self-check harness mimicking the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row count, sorted column names, and order-insensitive stringified values."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from kafka_connect_dynamodb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out)


def main(only: list[str] | None = None):
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(s_rows)})")
            continue
        try:
            # Fetch through pandas, like the driver: DuckDB downcasts DECIMAL
            # and HUGEINT columns to float64 here, so trailing-zero decimals
            # ('138014.00' vs '138014.0') and int-vs-float renderings surface
            # as mismatches instead of being hidden by Decimal-exact fetchall.
            pdf = con.sql(oracles[name]).df()
            d_cols = list(pdf.columns)
            def _py(v):
                v = v.item() if hasattr(v, "item") else v  # numpy -> python
                return None if isinstance(v, float) and v != v else v
            d_rows = [tuple(_py(v) for v in row)
                      for row in pdf.itertuples(index=False, name=None)]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            failures.append((name, f"schema mismatch {sc} vs {dc}"))
            print(f"FAIL {name}: schema {sc} vs {dc}")
        elif len(sr) != len(dr):
            failures.append((name, f"rowcount {len(sr)} vs {len(dr)}"))
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            failures.append((name, f"values differ, first: {diff}"))
            print(f"FAIL {name}: values differ, e.g. {diff}")
        else:
            print(f"OK   {name} ({len(sr)} rows)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
