"""Dump .explain("formatted") for every bench-measured query to
plans/r08/<query>_<tag>.txt (tag = before/after). Planning only — no
execution. Usage: python scripts/dump_plans_r08.py [before|after]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r08")


def main() -> None:
    import __spark_entry__ as entrymod
    from kafka_connect_dynamodb_spark.session import get_spark

    spark = get_spark("plan-dump", cores=8, shuffle_partitions=16)
    os.makedirs(OUT, exist_ok=True)
    qs = {**entrymod.RETIRED_QUERIES, **entrymod.queries()}
    names = sys.argv[2:] or sorted(qs)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
                f.write(buf.getvalue())
            print("ok", name)
        except Exception as e:  # noqa: BLE001 — keep dumping the rest
            print("FAIL", name, repr(e))


if __name__ == "__main__":
    main()
