"""Property-based parity: random event logs (random ops, shuffled delivery
order, duplicate deliveries, deletes, re-inserts) applied through the engine
equal the naive single-threaded oracle replay. Hypothesis drives the shapes;
the engine sees each log as one micro-batch."""

from __future__ import annotations

import hashlib
import json
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_dynamodb_spark.lake.table import LakeTable
from kafka_connect_dynamodb_spark.operators.apply import apply_batch
from kafka_connect_dynamodb_spark.sources.generator import events_schema

from tests.oracle import final_hashes, replay

KEYS = [("repo-a", f"src/f{i}.py") for i in range(4)]


def _env(d):
    return json.dumps({k: {"s": v} for k, v in d.items()})


def _mk_events(seed: int, n_events: int, dup_frac: float):
    rng = random.Random(seed)
    rows = []
    for seq in range(n_events):
        repo, path = rng.choice(KEYS)
        op = rng.choice(["INSERT", "MODIFY", "MODIFY", "REMOVE"])
        keys = _env({"repo": repo, "path": path})
        img = None if op == "REMOVE" else _env({
            "repo": repo, "path": path,
            "commit": f"c{seq}", "lang": "py", "content": f"content-{seq}"})
        rows.append({"shard_id": f"shard-{hash((repo, path)) % 3}",
                     "seq_no": str(10**20 + seq), "event_name": op,
                     "ts": None, "keys": keys, "new_image": img})
    # at-least-once: re-deliver a random subset, then shuffle delivery order
    dups = [dict(r) for r in rows if rng.random() < dup_frac]
    rows += dups
    rng.shuffle(rows)
    return rows


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10**6), n_events=st.integers(1, 40),
       dup_frac=st.sampled_from([0.0, 0.2, 0.5]))
def test_random_log_matches_oracle(spark, tmp_path_factory, seed, n_events, dup_frac):
    rows = _mk_events(seed, n_events, dup_frac)
    from decimal import Decimal
    from datetime import datetime, timezone
    ts = datetime(2024, 6, 1, tzinfo=timezone.utc)
    spark_rows = [dict(r, seq_no=Decimal(r["seq_no"]), ts=ts) for r in rows]
    df = spark.createDataFrame(spark_rows, events_schema())

    base_rows = [{"repo": r, "path": p, "commit": "c0", "lang": "py",
                  "content": f"base-{p}"} for r, p in KEYS[:2]]
    base = spark.createDataFrame(base_rows)

    work = tmp_path_factory.mktemp("prop")
    table = LakeTable(str(work / "tbl"))
    table.create(spark, base, ["repo", "path"], n_buckets=2)
    apply_batch(spark, table, df, batch_id=0)

    got = {(r["repo"], r["path"]):
           hashlib.sha256((r["content"] or "").encode()).hexdigest()
           for r in table.read(spark).collect()}
    oracle_rows = [dict(r, seq_no=r["seq_no"]) for r in rows]
    want = final_hashes(replay(base_rows, oracle_rows))
    assert got == want
