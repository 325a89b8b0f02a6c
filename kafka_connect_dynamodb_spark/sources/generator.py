"""Deterministic synthetic source table + DynamoDB-Streams-style change log.

Shapes per /root/repo/FIXTURES.md (derived from the reference's test fixtures
DynamoDBSourceTaskTests.java:134-150 and docs/data.md:7-43):

* ``source_table`` — the replicated base table (repo, path, commit, lang,
  content); Zipf-skewed repo sizes for hot-key tests.
* ``change_events`` — (shard_id, seq_no, event_name, ts, keys, new_image)
  with AttributeValue-envelope JSON payloads, at-least-once duplicate
  deliveries, REMOVE tombstones, post-REMOVE re-INSERTs, optional pre-init-sync
  and danger-zone timestamps, optional additive schema-evolution attribute.

Everything is a pure column function of the row id seeded through xxhash64 —
*no* ``F.rand`` (whose value depends on partition layout) — so generated data
is bit-identical at local[8] and local[32], and generation is fully
distributed (``spark.range`` + JVM expressions; no Python, no driver loop).
Scales linearly to 10^10 rows on a real cluster.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.functions.hashing import hash_unit

LANGS = ["py", "java", "ts", "go", "rs", "c", "rb", "scala"]
SEQ_BASE = "9999900000000000000000000"  # 25-digit, matches reference test scale
                                        # (DynamoDBSourceTaskTests.java:821)
DEFAULT_BASE_TS = datetime(2024, 6, 1, tzinfo=timezone.utc)


def _zipfish(u: Column, n: int, exponent: float = 2.5) -> Column:
    """Map uniform u∈[0,1) to a skewed index in [0,n): index 0 is hottest."""
    return F.floor(F.lit(n) * F.pow(u, F.lit(exponent))).cast("long")


def _repo(repo_idx: Column) -> Column:
    return F.concat(F.lit("repo-"), F.lpad(repo_idx.cast("string"), 5, "0"))


def _path(key_id: Column) -> Column:
    h = F.lower(F.hex(F.abs(F.xxhash64(F.lit(7), key_id))))
    return F.concat(F.lit("src/"), F.substring(h, 1, 2), F.lit("/f"),
                    key_id.cast("string"), F.lit("."),
                    F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                                 (F.pmod(key_id, F.lit(len(LANGS))) + 1).cast("int")))


def _lang(key_id: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                        (F.pmod(key_id, F.lit(len(LANGS))) + 1).cast("int"))


def _commit(key_id: Column, version: Column) -> Column:
    return F.substring(F.sha2(F.concat_ws("|", key_id.cast("string"),
                                          version.cast("string"), F.lit("commit")), 256), 1, 40)


def _content(key_id: Column, version: Column, chunks: int = 4) -> Column:
    """Deterministic pseudo source text; ~70 bytes per chunk."""
    parts = []
    for i in range(chunks):
        parts.append(F.sha2(F.concat_ws("|", key_id.cast("string"),
                                        version.cast("string"), F.lit(str(i))), 256))
    return F.concat_ws("\n", F.lit("// synthetic"), *parts)


def _envelope(fields: dict[str, Column]) -> Column:
    """AttributeValue-envelope JSON: {"repo":{"s":...},...} — lowercase tags
    per docs/data.md:16 / RecordConverterTests.java:202."""
    inner = [F.struct(v.alias("s")).alias(k) for k, v in fields.items()]
    return F.to_json(F.struct(*inner), {"ignoreNullFields": "true"})


def source_table(spark: SparkSession, n_keys: int, *, n_repos: int | None = None,
                 seed: int = 42, parallelism: int | None = None) -> DataFrame:
    """Base table keyed (repo, path); key_id ∈ [0, n_keys) maps 1:1 to a key."""
    n_repos = n_repos or max(n_keys // 50, 1)
    rng = spark.range(0, n_keys, numPartitions=parallelism) if parallelism \
        else spark.range(0, n_keys)
    k = F.col("id")
    u = hash_unit(k, salt=seed)
    return rng.select(
        _repo(_zipfish(u, n_repos)).alias("repo"),
        _path(k).alias("path"),
        _commit(k, F.lit(0)).alias("commit"),
        _lang(k).alias("lang"),
        _content(k, F.lit(0)).alias("content"),
    )


def change_events(spark: SparkSession, n_keys: int, n_events: int, *,
                  seed: int = 42, n_shards: int = 32,
                  dup_frac: float = 0.05, delete_frac: float = 0.10,
                  insert_frac: float = 0.20, new_key_frac: float = 0.15,
                  pre_init_frac: float = 0.05,
                  evolve_frac: float = 0.0,
                  base_ts: datetime = DEFAULT_BASE_TS,
                  event_interval_secs: float = 0.01,
                  danger_event: bool = False,
                  parallelism: int | None = None) -> DataFrame:
    """Change log over the same key space (+ ``new_key_frac`` unseen keys).

    Row i >= n_unique is an at-least-once duplicate delivery of a prior event
    (same shard_id/seq_no/payload — docs/details.md:33). seq_no is globally
    increasing over the unique-event index, hence monotone per key, and a key's
    events stay in one shard (both properties of DynamoDB streams the
    reference relies on, FIXTURES.md §2).
    """
    n_unique = max(int(n_events * (1.0 - dup_frac)), 1)
    key_space = int(n_keys * (1.0 + new_key_frac)) or 1
    rng = spark.range(0, n_events, numPartitions=parallelism) if parallelism \
        else spark.range(0, n_events)

    i = F.col("id")
    j = F.when(i < n_unique, i).otherwise(
        F.pmod(F.xxhash64(F.lit(seed + 11), i), F.lit(n_unique))).alias("j")
    df = rng.select(j)
    j = F.col("j")

    u_key = hash_unit(j, salt=seed + 1)
    key_id = _zipfish(u_key, key_space)
    u_op = hash_unit(j, salt=seed + 2)
    event_name = (F.when(u_op < delete_frac, F.lit("REMOVE"))
                   .when(u_op < delete_frac + insert_frac, F.lit("INSERT"))
                   .otherwise(F.lit("MODIFY")))
    # version bump per event: derived from j so MODIFY content is unique per event
    version = j + 1

    seq_no = (F.lit(SEQ_BASE).cast("decimal(38,0)") + j).alias("seq_no")
    # timestamps: first pre_init_frac of unique events are older than the
    # init-sync overlap window (must be dropped by F2); rest advance from base_ts
    pre_cut = int(n_unique * pre_init_frac)
    ts = F.when(
        j < pre_cut,
        F.lit(base_ts) - F.make_interval(hours=F.lit(3)) +
        F.make_interval(secs=j.cast("double") * F.lit(event_interval_secs)),
    ).otherwise(
        F.lit(base_ts) + F.make_interval(secs=(j - pre_cut).cast("double") *
                                         F.lit(event_interval_secs)))
    if danger_event:
        ts = F.when(j == n_unique - 1,
                    F.lit(base_ts) - F.make_interval(hours=F.lit(30))).otherwise(ts)

    # repo derivation must match source_table exactly (same salt, same n_repos)
    # so events address the same (repo, path) keys as the snapshot.
    n_repos = max(n_keys // 50, 1)
    repo = _repo(_zipfish(hash_unit(key_id, salt=seed), n_repos))
    path = _path(key_id)

    keys_env = _envelope({"repo": repo, "path": path})
    image_fields = {
        "repo": repo, "path": path,
        "commit": _commit(key_id, version),
        "lang": _lang(key_id),
        "content": _content(key_id, version),
    }
    if evolve_frac > 0:
        evolve_from = int(n_unique * (1.0 - evolve_frac))
        image_fields["branch"] = F.when(
            j >= evolve_from,
            F.concat(F.lit("branch-"), F.pmod(j, F.lit(5)).cast("string")))
    new_image = F.when(event_name == "REMOVE", F.lit(None)).otherwise(
        _envelope(image_fields))

    shard_id = F.concat(F.lit("shard-"),
                        F.lpad(F.pmod(F.xxhash64(F.lit(seed + 5), key_id),
                                      F.lit(n_shards)).cast("string"), 5, "0"))

    return df.select(
        shard_id.alias("shard_id"),
        seq_no,
        event_name.alias("event_name"),
        ts.alias("ts"),
        keys_env.alias("keys"),
        new_image.alias("new_image"),
    )


def events_schema():
    from pyspark.sql import types as T
    return T.StructType([
        T.StructField("shard_id", T.StringType()),
        T.StructField("seq_no", T.DecimalType(38, 0)),
        T.StructField("event_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("keys", T.StringType()),
        T.StructField("new_image", T.StringType()),
    ])
