"""Generator determinism: the synthetic base table and change log are pure
column functions of the row id (no F.rand), so they are bit-identical across
partition layouts — the property the N-vs-4N scaling evidence and the
cross-parallelism row-count assertion rest on."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.sources.generator import (
    change_events, source_table)


def _checksum(df):
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
            for c in df.columns]
    return df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n")).collect()[0]


def test_source_table_partition_independent(spark):
    a = _checksum(source_table(spark, 5000, parallelism=3))
    b = _checksum(source_table(spark, 5000, parallelism=17))
    assert (a["h"], a["n"]) == (b["h"], b["n"])


def test_change_events_partition_independent(spark):
    a = _checksum(change_events(spark, 1000, 20000, parallelism=2))
    b = _checksum(change_events(spark, 1000, 20000, parallelism=29))
    assert (a["h"], a["n"]) == (b["h"], b["n"])


def test_events_address_source_keys(spark):
    """Events must hit the same (repo, path) key space as the snapshot —
    the repo derivation in both paths must stay in lockstep."""
    from kafka_connect_dynamodb_spark.functions.envelope import decode_payload
    base = source_table(spark, 500).select("repo", "path")
    ev = decode_payload(change_events(spark, 500, 2000, new_key_frac=0.0),
                        "keys", fields=("repo", "path"), prefix="k_")
    unmatched = (ev.select(F.col("k_repo").alias("repo"),
                           F.col("k_path").alias("path"))
                   .distinct()
                   .join(base, ["repo", "path"], "left_anti"))
    assert unmatched.count() == 0
