"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: cdc_replay_events_per_sec (the BASELINE.json headline metric) and
replay row counts. Scaling-efficiency evidence (N vs 4N cores) lives in
bench/scaling.py → BENCH/BASELINE.md (subprocess-isolated JVMs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# CDC replay scale (flagship): ~1M events over ~100k keys at sf0.1
REPLAY_EVENTS = int(os.environ.get("BENCH_REPLAY_EVENTS", "1000000"))
REPLAY_KEYS = int(os.environ.get("BENCH_REPLAY_KEYS", "100000"))
# The replay is the one SUSTAINED all-core job here; on the shared-credit
# host a single shot can read 3-8x over capability while short queries sit
# at floor (measured r6 — see ROUND_NOTES). Min-of-k is the repo's standard
# noise-robust capability estimator (BENCH/BASELINE.md); rep 1 stays in the
# headline total for cross-round comparability, the min feeds events/s.
REPLAY_REPS = int(os.environ.get("BENCH_REPLAY_REPS", "3"))

# Host-state self-adjudication (VERDICT r6 next #1): r6's 3x phantom
# regression took a judge-side code A/B to dismiss because the bench JSON
# carried no host annotation. Before and after the run we now record
# (a) a burst probe — 3 warm reps of a mid-weight query, min rep; on this
#     box <= ~2.6 s means quiet, >= 3.5 s badly contended (watcher band);
# (b) a sustained probe — the same CPU kernel at 1 unit and 8 units;
#     sustained_ratio = per-unit long / short. ~1.0 on an unthrottled
#     host; the r6 throttle window read bursts near floor while SUSTAINED
#     jobs degraded 3-8x, which is exactly what this ratio exposes.
HOST_PROBE = os.environ.get("BENCH_HOST_PROBE", "1") != "0"
PROBE_ROWS = int(os.environ.get("BENCH_PROBE_ROWS", "50000000"))
PROBE_LONG_MULT = 8
PROBE_QUIET_REF_S = 2.62      # watcher quiet threshold for the burst probe

# A/B attribution toggles (VERDICT r3 next #2): rerun with BENCH_FILE_STATS=0
# or BENCH_CHANGE_FEED=1 to isolate commit-path feature cost on the replay.
FILE_STATS = os.environ.get("BENCH_FILE_STATS", "1") != "0"
CHANGE_FEED = os.environ.get("BENCH_CHANGE_FEED", "0") == "1"

HEADLINE = [
    "cdc_apply_final_state",
    "cdc_lww_latest_per_key",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "topk_per_group",
    "exact_dedup_docs",
    "doc_quality_score",
    "minhash_lsh_near_dups",
    "simhash_near_dups",
    "embedding_cosine_topk",
    "embedding_near_dup_pairs",
    "knn_join_lsh",
    "asof_join_last_order",
    "time_bucket_rollup",
]

# r5 additions (rotation round): measured per-query, excluded from the
# cross-round headline total
R5_CORPUS_OPS = [
    "dedup_cluster_representatives",
    "tf_idf_top_terms",
    "bm25_ranking",
    "dup_span_fraction",
    "corpus_trim_spans",
    "dup_ngram_stats",
]

# r6 additions (rotation round): PQ/ADC retrieval, the streaming near-dup's
# batch twin, and the four curation operators — measured per-query,
# excluded from the headline
R6_OPS = [
    "pq_adc_topk",
    "neardup_banded_pairs",
    "decontaminate_docs",
    "pii_redaction",
    "pack_training_sequences",
    "top_token_coverage",
    "unigram_lm_quality",
    "gopher_repetition",
    "line_dedup_docs",
    "dsir_importance_weights",
    "ivf_pq_topk",
    "temperature_mix_resample",
    "gopher_quality",
]

# r7 additions: new gate rows from the round-7 build — measured per-query,
# excluded from the headline (same policy as r5/r6 sections)
R7_OPS = [
    "cdc_incremental_agg_view",
    "cdc_scd2_history",
    "exact_price_quantiles",
    "debezium_roundtrip",
    "zorder_pruned_scan",
    "ivf_pq_residual_topk",
    "intradoc_line_dedup",
    "winnow_fingerprint_digest",
    "winnow_match_pairs",
    "cluster_safe_split",
    "cdc_tx_consistent_apply",
    "url_canonical_dedup",
    "corpus_curate_e2e",
]


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _host_probe(spark, probe_fn) -> dict:
    """One burst + one sustained reading of the host's current state."""
    from pyspark.sql import functions as F
    bursts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _force(probe_fn(spark, SF_DIR))
        bursts.append(round(time.perf_counter() - t0, 2))

    def kernel(mult: int) -> float:
        t0 = time.perf_counter()
        (spark.range(PROBE_ROWS * mult, numPartitions=CPUS)
              .select(F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256))))
              .collect())
        return time.perf_counter() - t0
    kernel_warm = PROBE_ROWS // 10
    (spark.range(kernel_warm, numPartitions=CPUS)
          .select(F.sum(F.crc32(F.sha2(F.col("id").cast("string"), 256))))
          .collect())
    # min-of-2 on the unit run: at ~2-3 s the fixed scheduling overhead is
    # a visible fraction of one rep, and an inflated unit reading would
    # understate the ratio exactly when it matters
    short = min(kernel(1), kernel(1))
    long = kernel(PROBE_LONG_MULT)
    return {
        "burst_reps_s": bursts,
        "burst_min_s": min(bursts),
        "quiet_ref_s": PROBE_QUIET_REF_S,
        "sustained_unit_s": round(short, 2),
        "sustained_long_s": round(long, 2),
        "sustained_ratio": round((long / PROBE_LONG_MULT) / short, 3),
    }


def main() -> None:
    import __spark_entry__ as entrymod
    from kafka_connect_dynamodb_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(2 * CPUS, 32))
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    timings: dict[str, float] = {}

    # retirees rotated out of the 50-row driver gate (r5) still bench here,
    # keeping every HEADLINE key comparable across rounds
    qs = {**entrymod.RETIRED_QUERIES, **entrymod.queries()}

    probe_pre = probe_post = None
    if HOST_PROBE:
        _force(qs["simhash_near_dups"](spark, SF_DIR))   # warm the probe
        probe_pre = _host_probe(spark, qs["simhash_near_dups"])

    for name in HEADLINE:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warm file listing/footer cache
        t0 = time.perf_counter()
        _force(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # r5 corpus operators: timed identically but reported OUT of the
    # headline total so "value" stays apples-to-apples with r1-r4
    r5_timings: dict[str, float] = {}
    for name in R5_CORPUS_OPS:
        fn = qs[name]
        fn(spark, SF_DIR).count()
        t0 = time.perf_counter()
        _force(fn(spark, SF_DIR))
        r5_timings[name] = round(time.perf_counter() - t0, 3)

    r6_timings: dict[str, float] = {}
    for name in R6_OPS:
        fn = qs[name]
        fn(spark, SF_DIR).count()
        t0 = time.perf_counter()
        _force(fn(spark, SF_DIR))
        r6_timings[name] = round(time.perf_counter() - t0, 3)

    r7_timings: dict[str, float] = {}
    for name in R7_OPS:
        fn = qs[name]
        fn(spark, SF_DIR).count()   # also builds/memoizes the row's tables
        t0 = time.perf_counter()
        _force(fn(spark, SF_DIR))
        r7_timings[name] = round(time.perf_counter() - t0, 3)

    # ---- flagship: full two-phase CDC replay at generator scale ----
    from kafka_connect_dynamodb_spark.lake.table import LakeTable
    from kafka_connect_dynamodb_spark.plans.pipeline import CdcPipeline
    from kafka_connect_dynamodb_spark.sources.generator import (
        DEFAULT_BASE_TS, change_events, source_table)

    work = tempfile.mkdtemp(prefix="bench-cdc-")
    try:
        log_dir = os.path.join(work, "log")
        change_events(spark, REPLAY_KEYS, REPLAY_EVENTS,
                      pre_init_frac=0.02).write.parquet(log_dir)
        base = source_table(spark, REPLAY_KEYS)

        # JIT/codegen + page-cache warm-up on a slice (untimed)
        warm_tbl = LakeTable(os.path.join(work, "warm"),
                             change_feed=CHANGE_FEED, file_stats=FILE_STATS)
        warm = CdcPipeline(spark, warm_tbl, n_buckets=64,
                           clock=lambda: DEFAULT_BASE_TS.timestamp())
        warm.init_sync(base.limit(20000))
        warm.sync_batch(spark.read.parquet(log_dir).limit(100000), 0)

        events = spark.read.parquet(log_dir)
        applies = []
        t_snapshot = None
        for rep in range(max(1, REPLAY_REPS)):
            table = LakeTable(os.path.join(work, f"tbl{rep}"),
                              change_feed=CHANGE_FEED, file_stats=FILE_STATS)
            pipe = CdcPipeline(spark, table, n_buckets=64,
                               clock=lambda: DEFAULT_BASE_TS.timestamp())
            t0 = time.perf_counter()
            pipe.init_sync(base)
            if t_snapshot is None:
                t_snapshot = time.perf_counter() - t0
            t0 = time.perf_counter()
            pipe.sync_batch(events, 0)
            applies.append(time.perf_counter() - t0)

        timings["cdc_init_sync"] = round(t_snapshot, 3)
        timings["cdc_replay"] = round(applies[0], 3)
        final_rows = table.read(spark).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    if HOST_PROBE:
        probe_post = _host_probe(spark, qs["simhash_near_dups"])

    # ---- incremental ingestion ops (VERDICT r6 next #6): the 100 TB
    # steady state is an index at rest probed per crawl increment, never a
    # corpus re-shuffle. Measure the probe cost AND the full-rebuild cost
    # it replaces on an order-respecting 90/10 corpus/increment split
    # (increment ids sort after corpus ids — the sticky-owner contract).
    from pyspark.sql import functions as F
    from kafka_connect_dynamodb_spark.operators.curation import (
        incremental_line_dedup, line_dedup, line_dup_index)
    from kafka_connect_dynamodb_spark.streaming.neardup import (
        first_owner_pairs, incremental_neardup, neardup_index)

    inc_timings: dict[str, float] = {}
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    thr = docs.agg(F.percentile_approx("doc_id", 0.9, 10000).alias("t")).first().t
    corpus = docs.filter(F.col("doc_id") <= thr)
    increment = docs.filter(F.col("doc_id") > thr)
    iwork = tempfile.mkdtemp(prefix="bench-inc-")
    try:
        def timed(name, thunk):
            t0 = time.perf_counter()
            thunk()
            inc_timings[name] = round(time.perf_counter() - t0, 3)

        # index build is the ONE-TIME cost; probes are the steady state
        timed("line_index_build", lambda: line_dup_index(corpus)
              .write.parquet(os.path.join(iwork, "lidx")))
        lidx = spark.read.parquet(os.path.join(iwork, "lidx"))
        _force(incremental_line_dedup(increment, lidx))          # warm
        timed("line_dedup_increment_probe",
              lambda: _force(incremental_line_dedup(increment, lidx)))
        timed("line_dedup_full_rebuild",
              lambda: _force(line_dedup(docs)))

        timed("neardup_index_build", lambda: neardup_index(corpus)
              .write.parquet(os.path.join(iwork, "nidx")))
        nidx = spark.read.parquet(os.path.join(iwork, "nidx"))
        _force(incremental_neardup(increment, nidx))             # warm
        timed("neardup_increment_probe",
              lambda: _force(incremental_neardup(increment, nidx)))
        timed("neardup_full_rebuild",
              lambda: _force(first_owner_pairs(docs)))

        from kafka_connect_dynamodb_spark.operators.dedup import (
            incremental_winnow_matches, winnow_index, winnow_match_pairs)
        timed("winnow_index_build", lambda: winnow_index(corpus)
              .write.parquet(os.path.join(iwork, "widx")))
        widx = spark.read.parquet(os.path.join(iwork, "widx"))
        _force(incremental_winnow_matches(increment, widx))      # warm
        timed("winnow_increment_probe",
              lambda: _force(incremental_winnow_matches(increment, widx)))
        timed("winnow_full_rebuild",
              lambda: _force(winnow_match_pairs(docs)))
    finally:
        shutil.rmtree(iwork, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "cdc_replay_and_headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "r5_corpus_ops": r5_timings,
        "r5_corpus_ops_total_sec": round(sum(r5_timings.values()), 3),
        "r6_ops": r6_timings,
        "r6_ops_total_sec": round(sum(r6_timings.values()), 3),
        "r7_ops": r7_timings,
        "r7_ops_total_sec": round(sum(r7_timings.values()), 3),
        "cdc_replay_events": REPLAY_EVENTS,
        "cdc_replay_reps": [round(t, 3) for t in applies],
        "cdc_replay_min_sec": round(min(applies), 3),
        "cdc_replay_events_per_sec": round(REPLAY_EVENTS / min(applies), 1),
        "cdc_final_rows": final_rows,
        "cpus": CPUS,
        "file_stats": FILE_STATS,
        "change_feed": CHANGE_FEED,
        "incremental_ops": inc_timings,
        "host_probe": {"pre": probe_pre, "post": probe_post},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
