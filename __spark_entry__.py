"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (CDC
operators re-expressed over the driver-provided tables) plus the
training-data-pipeline operators (dedup / similarity / text analysis);
``oracle_sql()`` carries the DuckDB-equivalent ANSI SQL for each.

Conventions for exact oracle parity:
* timestamps are surfaced as epoch-millis bigints (``unix_millis`` /
  ``epoch_ms``) — never raw timestamps;
* money aggregates run in DECIMAL, not DOUBLE, so partial-agg order cannot
  change the result;
* every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# Map the events table onto CDC op codes (reference: Envelope.java:12-28,
# DynamoDBSourceTask.java:383-394): signup=INSERT->c, error=REMOVE->d,
# click/view/purchase=MODIFY->u.
def _op_expr():
    return (F.when(F.col("event_type") == "signup", "c")
             .when(F.col("event_type") == "error", "d")
             .otherwise("u"))


_OP_SQL = ("CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' "
           "ELSE 'u' END")


# --------------------------------------------------------------------------
# CDC operators (SURVEY §2.2/§2.4/§2.5 + §7 merge semantics)
# --------------------------------------------------------------------------

def q_cdc_op_decode(spark, sf_dir):
    """F6 operation decoder: event name -> op code, with per-op counts."""
    ev = _t(spark, sf_dir, "events")
    return (ev.withColumn("op", _op_expr())
              .groupBy("op").agg(F.count("*").alias("n_events"))
              .orderBy("op"))


def q_cdc_lww_latest_per_key(spark, sf_dir):
    """Per-key last-writer-wins (A2 generalized): latest event per user_id
    via max_by partial/final agg (engine's hot-path reduce)."""
    from kafka_connect_dynamodb_spark.operators.lww import latest_per_key
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"))
    top = latest_per_key(ev, ["user_id"], ["ts_ms", "event_id"])
    return top.select("user_id",
                      F.col("event_type").alias("last_event_type"),
                      F.col("value").alias("last_value"),
                      F.col("ts_ms").alias("last_ts_ms")).orderBy("user_id")


def q_cdc_apply_final_state(spark, sf_dir):
    """Full CDC apply (the engine's MERGE semantics): base=customer keyed by
    c_custkey, change log=events keyed by user_id, LWW by event_id, op 'd'
    deletes the key. Final state = live keys with their current value."""
    from kafka_connect_dynamodb_spark.operators.lww import latest_per_key
    base = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("base_val"))
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"), F.col("event_id").alias("seq"),
        F.col("value").alias("val"), _op_expr().alias("op"))
    last = latest_per_key(ev, ["key"], ["seq"])
    joined = base.join(last, "key", "full_outer")
    live = joined.filter(F.col("op").isNull() | (F.col("op") != "d"))
    return live.select(
        "key",
        F.coalesce(F.col("val"), F.col("base_val")).alias("final_val"),
        F.coalesce(F.col("op"), F.lit("r")).alias("final_op")).orderBy("key")


def q_cdc_tombstone_keys(spark, sf_dir):
    """T7 tombstone semantics: keys whose final event is a delete."""
    from kafka_connect_dynamodb_spark.operators.lww import latest_per_key_window
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"), F.col("event_id").alias("seq"),
        _op_expr().alias("op"))
    last = latest_per_key_window(ev, ["key"], ["seq"])
    return last.filter(F.col("op") == "d").select("key").orderBy("key")


def q_cdc_shard_max_seq(spark, sf_dir):
    """A2 per-shard max committed sequence number (RegisterAsProcessed)."""
    from kafka_connect_dynamodb_spark.operators.lww import shard_max_seq
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("shard-"), F.pmod("user_id", F.lit(16)).cast("string"))
         .alias("shard_id"),
        F.col("event_id").alias("seq_no"))
    out = shard_max_seq(ev)
    return out.select("shard_id",
                      F.col("max_seq_no").cast("long").alias("max_seq")).orderBy("shard_id")


def q_cdc_preinit_window_filter(spark, sf_dir):
    """F2 pre-init-sync drop: events at or before (cutoff - 1h) are covered by
    the snapshot; count survivors per op. cutoff = min(ts) + 24h."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg((F.min("ts") + F.expr("INTERVAL 24 HOURS")).alias("c"))
    kept = ev.join(cut).filter(F.col("ts") + F.expr("INTERVAL 1 HOURS") > F.col("c"))
    return (kept.withColumn("op", _op_expr()).groupBy("op")
                .agg(F.count("*").alias("n_kept")).orderBy("op"))


def q_cdc_danger_zone_detect(spark, sf_dir):
    """F3 danger-zone detector: events older than now-20h (now = max ts)."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg((F.max("ts") - F.expr("INTERVAL 20 HOURS")).alias("c"))
    old = ev.join(cut).filter(F.col("ts") <= F.col("c"))
    return old.agg(F.count("*").alias("n_danger"),
                   F.count_distinct("user_id").alias("n_keys_affected"))


def q_cdc_envelope_extract(spark, sf_dir):
    """X1 envelope JSON extraction: pull the 'k' attribute out of the props
    JSON document (the document-field pattern, RecordConverter.java:104)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.withColumn("k_val", F.get_json_object("props", "$.k").cast("int"))
              .groupBy("k_val").agg(F.count("*").alias("n")).orderBy("k_val"))


def q_cdc_dedup_deliveries(spark, sf_dir):
    """At-least-once input dedup (docs/details.md:33): distinct count vs raw
    count per event_type — the exact-duplicate drop the engine applies."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
              .agg(F.count("*").alias("n_raw"),
                   F.count_distinct("event_id").alias("n_unique"))
              .orderBy("event_type"))


# --------------------------------------------------------------------------
# Analytics operators (scan/filter/join/agg/window/sort coverage)
# --------------------------------------------------------------------------

def q_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 analog over lineitem (DECIMAL aggregates for exactness)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(F.sum(dec("l_quantity")).alias("sum_qty"),
                   F.sum(dec("l_extendedprice")).alias("sum_base_price"),
                   F.sum((dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")).alias("sum_disc_price"),
                   F.count("*").alias("count_order"))
              .orderBy("l_returnflag", "l_linestatus"))


def q_q3_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 analog: 3-way join + agg + top-k (broadcast the small dims)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    joined = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey))
    rev = (joined.groupBy("l_orderkey")
                 .agg(F.sum((dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("decimal(28,4)")).alias("revenue")))
    return rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey")).limit(10)


def q_topk_per_group(spark, sf_dir):
    """Top-3 orders by total price per priority (ranking window)."""
    orders = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window as W
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (orders.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") <= 3)
                  .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
                  .orderBy("o_orderpriority", "rk"))


def q_anti_join_inactive(spark, sf_dir):
    """Customers with no events (anti join), counted per nation."""
    cust = _t(spark, sf_dir, "customer")
    ev = _t(spark, sf_dir, "events")
    inactive = cust.join(ev, cust.c_custkey == ev.user_id, "left_anti")
    return (inactive.groupBy("c_nationkey")
                    .agg(F.count("*").alias("n_inactive")).orderBy("c_nationkey"))


def q_semi_join_active_nations(spark, sf_dir):
    """Nations having at least one customer with an order (semi joins)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    active = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    return (nation.join(active, nation.n_nationkey == active.c_nationkey, "left_semi")
                  .select("n_nationkey", "n_name").orderBy("n_nationkey"))


# --------------------------------------------------------------------------
# Training-data pipeline operators (documents / embeddings)
# --------------------------------------------------------------------------

def q_exact_dedup_docs(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy): canonical doc per sha256
    of the first 64 chars (prefix clustering to exercise collisions)."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.withColumn("h", F.sha2(F.substring("text", 1, 64), 256))
                .groupBy("h")
                .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
                .orderBy("h"))


def q_token_count_docs(spark, sf_dir):
    """Whitespace token counting per doc."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual")).orderBy("doc_id")


def q_doc_quality_score(spark, sf_dir):
    """Quality scoring: token/char counts + stopword ratio (integer-ratio
    formula, identical on both engines)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and")])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / F.size(toks)).alias("stopword_ratio")).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_op_decode": q_cdc_op_decode,
        "cdc_lww_latest_per_key": q_cdc_lww_latest_per_key,
        "cdc_apply_final_state": q_cdc_apply_final_state,
        "cdc_tombstone_keys": q_cdc_tombstone_keys,
        "cdc_shard_max_seq": q_cdc_shard_max_seq,
        "cdc_preinit_window_filter": q_cdc_preinit_window_filter,
        "cdc_danger_zone_detect": q_cdc_danger_zone_detect,
        "cdc_envelope_extract": q_cdc_envelope_extract,
        "cdc_dedup_deliveries": q_cdc_dedup_deliveries,
        "q1_pricing_summary": q_q1_pricing_summary,
        "q3_top_revenue_orders": q_q3_top_revenue_orders,
        "topk_per_group": q_topk_per_group,
        "anti_join_inactive": q_anti_join_inactive,
        "semi_join_active_nations": q_semi_join_active_nations,
        "exact_dedup_docs": q_exact_dedup_docs,
        "token_count_docs": q_token_count_docs,
        "doc_quality_score": q_doc_quality_score,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_op_decode": f"""
            SELECT {_OP_SQL} AS op, count(*) AS n_events
            FROM events GROUP BY 1 ORDER BY op""",
        "cdc_lww_latest_per_key": """
            SELECT user_id, event_type AS last_event_type, value AS last_value,
                   epoch_ms(ts) AS last_ts_ms
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                         ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
                  FROM events) WHERE rn = 1 ORDER BY user_id""",
        "cdc_apply_final_state": f"""
            WITH ev AS (SELECT user_id AS key, event_id AS seq, value AS val,
                               {_OP_SQL} AS op FROM events),
            last AS (SELECT key, val, op FROM
                     (SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) rn
                      FROM ev) WHERE rn = 1),
            base AS (SELECT c_custkey AS key, c_acctbal AS base_val FROM customer)
            SELECT COALESCE(b.key, l.key) AS key,
                   COALESCE(l.val, b.base_val) AS final_val,
                   COALESCE(l.op, 'r') AS final_op
            FROM base b FULL OUTER JOIN last l ON b.key = l.key
            WHERE l.op IS NULL OR l.op <> 'd' ORDER BY key""",
        "cdc_tombstone_keys": f"""
            WITH ev AS (SELECT user_id AS key, event_id AS seq, {_OP_SQL} AS op
                        FROM events)
            SELECT key FROM (SELECT *, row_number() OVER (PARTITION BY key
                             ORDER BY seq DESC) rn FROM ev)
            WHERE rn = 1 AND op = 'd' ORDER BY key""",
        "cdc_shard_max_seq": """
            SELECT 'shard-' || CAST(user_id % 16 AS VARCHAR) AS shard_id,
                   max(event_id) AS max_seq
            FROM events GROUP BY 1 ORDER BY shard_id""",
        "cdc_preinit_window_filter": f"""
            SELECT {_OP_SQL} AS op, count(*) AS n_kept FROM events
            WHERE ts + INTERVAL 1 HOUR >
                  (SELECT min(ts) + INTERVAL 24 HOUR FROM events)
            GROUP BY 1 ORDER BY op""",
        "cdc_danger_zone_detect": """
            SELECT count(*) AS n_danger, count(DISTINCT user_id) AS n_keys_affected
            FROM events
            WHERE ts <= (SELECT max(ts) - INTERVAL 20 HOUR FROM events)""",
        "cdc_envelope_extract": """
            SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
                   count(*) AS n
            FROM events GROUP BY 1 ORDER BY k_val""",
        "cdc_dedup_deliveries": """
            SELECT event_type, count(*) AS n_raw,
                   count(DISTINCT event_id) AS n_unique
            FROM events GROUP BY 1 ORDER BY event_type""",
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
                   sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                       AS DECIMAL(28,4))) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
        "q3_top_revenue_orders": """
            SELECT l_orderkey,
                   sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                       AS DECIMAL(28,4))) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
            GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        "topk_per_group": """
            SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM
            (SELECT o_orderpriority, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders)
            WHERE rk <= 3 ORDER BY o_orderpriority, rk""",
        "anti_join_inactive": """
            SELECT c_nationkey, count(*) AS n_inactive FROM customer
            WHERE c_custkey NOT IN (SELECT user_id FROM events)
            GROUP BY c_nationkey ORDER BY c_nationkey""",
        "semi_join_active_nations": """
            SELECT n_nationkey, n_name FROM nation
            WHERE n_nationkey IN
                  (SELECT c_nationkey FROM customer
                   WHERE c_custkey IN (SELECT o_custkey FROM orders))
            ORDER BY n_nationkey""",
        "exact_dedup_docs": """
            SELECT sha256(substr(text, 1, 64)) AS h, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1 ORDER BY h""",
        "token_count_docs": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   length(text) AS n_chars_actual
            FROM documents ORDER BY doc_id""",
        "doc_quality_score": """
            WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
                       FROM documents)
            SELECT doc_id, len(toks) AS n_tokens,
                   len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS n_stopwords,
                   CAST(len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS DOUBLE)
                       / len(toks) AS stopword_ratio
            FROM t ORDER BY doc_id""",
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the CDC apply final state."""
    return q_cdc_apply_final_state(spark, "/root/testdata/sf0.001")
