"""Funnel matching vs a naive per-user python replay, plus semantics pins:
strict ordering (ties don't advance), horizon bounding, and the
greedy-earliest-chain optimality case."""

from __future__ import annotations

from datetime import datetime, timedelta

from kafka_connect_dynamodb_spark.operators.funnel import (
    funnel_report, funnel_times)

T0 = datetime(2024, 6, 1)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, e, _ts(m)) for u, e, m in rows],
        "user_id long, event_type string, ts timestamp")


def _naive(rows, steps, within_minutes=None):
    by_user = {}
    for u, e, m in rows:
        by_user.setdefault(u, []).append((m, e))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        times, prev = [], None
        for i, s in enumerate(steps):
            cand = [m for m, e in evs if e == s
                    and (i == 0 or (prev is not None and m > prev))
                    and (i == 0 or within_minutes is None
                         or m <= times[0] + within_minutes)]
            t = min(cand) if cand and prev is not None or (i == 0 and cand) \
                else None
            times.append(t)
            prev = t
            if t is None:
                times.extend([None] * (len(steps) - i - 1))
                break
        out[u] = times
    return out


def _check(spark, rows, steps, within=None, within_minutes=None):
    got = {r["user_id"]: [r[f"t{i}"] for i in range(1, len(steps) + 1)]
           for r in funnel_times(_df(spark, rows), steps,
                                 within=within).collect()}
    want = {u: [None if m is None else _ts(m) for m in ts]
            for u, ts in _naive(rows, steps, within_minutes).items()}
    assert got == want, (got, want)


def test_basic_chain_and_breaks(spark):
    rows = [
        (1, "signup", 0), (1, "view", 5), (1, "purchase", 9),   # full chain
        (2, "view", 1), (2, "signup", 2), (2, "purchase", 3),   # view too early
        (3, "signup", 0), (3, "view", 4),                       # no purchase
        (4, "view", 0), (4, "purchase", 1),                     # never signed up
    ]
    _check(spark, rows, ["signup", "view", "purchase"])


def test_tie_timestamps_do_not_advance(spark):
    rows = [(1, "signup", 0), (1, "view", 0), (1, "view", 2)]
    got = funnel_times(_df(spark, rows), ["signup", "view"]).collect()[0]
    assert got["t1"] == _ts(0) and got["t2"] == _ts(2)


def test_greedy_earliest_is_taken(spark):
    # two signups; the earlier one admits the early view
    rows = [(1, "signup", 0), (1, "view", 1), (1, "signup", 5)]
    got = funnel_times(_df(spark, rows), ["signup", "view"]).collect()[0]
    assert got["t1"] == _ts(0) and got["t2"] == _ts(1)


def test_within_horizon(spark):
    rows = [(1, "signup", 0), (1, "view", 200),
            (2, "signup", 0), (2, "view", 30)]
    _check(spark, rows, ["signup", "view"],
           within="60 minutes", within_minutes=60)


def test_report_counts(spark):
    rows = [
        (1, "signup", 0), (1, "view", 1), (1, "purchase", 2),
        (2, "signup", 0), (2, "view", 1),
        (3, "signup", 0),
        (4, "view", 0),
    ]
    rep = {r["event_type"]: r for r in
           funnel_report(_df(spark, rows),
                         ["signup", "view", "purchase"]).collect()}
    assert rep["signup"]["n_users"] == 3
    assert rep["view"]["n_users"] == 2
    assert rep["purchase"]["n_users"] == 1
    assert rep["view"]["conv_from_prev"] == 2 / 3
    assert rep["purchase"]["conv_from_top"] == 1 / 3


def test_testdata_events_match_python_replay(spark):
    import os
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    steps = ["signup", "click", "purchase"]
    got = {r["user_id"]: (r["t1"], r["t2"], r["t3"], r["steps_completed"])
           for r in funnel_times(ev, steps).collect()}
    raw = [(r["user_id"], r["event_type"], r["ts"])
           for r in ev.select("user_id", "event_type", "ts").collect()]
    by_user = {}
    for u, e, t in raw:
        by_user.setdefault(u, []).append((t, e))
    for u, evs in by_user.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        t1 = min((t for t, e in evs if e == "signup"), default=None)
        t2 = min((t for t, e in evs if e == "click"
                  and t1 is not None and t > t1), default=None)
        t3 = min((t for t, e in evs if e == "purchase"
                  and t2 is not None and t > t2), default=None)
        done = 3 if t3 else 2 if t2 else 1 if t1 else 0
        assert got.get(u, (None, None, None, 0))[:3] == (t1, t2, t3), u
        assert got.get(u, (None, None, None, 0))[3] == done, u
