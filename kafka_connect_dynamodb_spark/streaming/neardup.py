"""Streaming NEAR-duplicate detection: MinHash-LSH dedup on the way in.

The batch near-dup suite (operators/dedup.py) assumes a corpus at rest; an
ingest pipeline also wants to flag near-duplicates AS DOCUMENTS ARRIVE
(crawler re-fetches, boilerplate mirrors). The operator:

1. computes the same codegen'd MinHash band signatures the batch path uses
   (`dedup.minhash_signature` — column expressions, no UDF),
2. explodes each document into its ``bands`` (band, band-hash) buckets,
3. runs a custom stateful operator (``applyInPandasWithState``) keyed by
   bucket: the state is the FIRST document id that claimed the bucket, with
   a processing-time TTL; every later document hitting the bucket emits a
   candidate pair ``(doc_id, dup_of)``.

A document is flagged iff it collides with an EARLIER document in at least
one band — the batch LSH banding contract specialized to dedup: the batch
operator emits all in-bucket pairs, the stream emits the star around each
bucket's first owner (exactly the keep-first/drop-rest shape ingest dedup
needs). Over a drained log, every flagged (doc, dup_of) is one of the batch
candidates, and the flagged-doc set is exactly the docs sharing a bucket
with their bucket's first owner (pinned by tests/test_streaming_dedup.py).

Scale: state is ONE id (+ counter) per occupied bucket, Arrow-batched per
group, and the TTL bounds it by the ingest horizon instead of the stream's
lifetime. ``max_bucket_size`` mirrors the batch frequency cap: a degenerate
bucket (boilerplate shingle pattern) stops emitting pairs after the cap and
just counts — the quadratic-bucket guard, streaming edition.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kafka_connect_dynamodb_spark.operators.dedup import (
    char_shingles, minhash_signature, minhash_signature_sha, word_shingles)

CANDIDATE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("dup_of", T.StringType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("first_id", T.StringType(), True),
    T.StructField("hits", T.LongType(), True),
])


def _make_update(max_bucket_size: int, ttl_ms: int | None):
    def _update(key: tuple, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first, hits = state.get if state.exists else (None, 0)
        out_doc, out_dup = [], []
        for pdf in pdfs:
            # deterministic within-batch order: lexicographic doc id (the
            # batch operator pairs within sorted buckets)
            for doc in sorted(pdf["doc_id"]):
                hits += 1
                if first is None:
                    first = doc
                elif doc != first and hits <= max_bucket_size:
                    out_doc.append(doc)
                    out_dup.append(first)
        state.update((first, hits))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out_doc:
            yield pd.DataFrame({"doc_id": out_doc, "dup_of": out_dup})

    return _update


def banded_buckets(docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text", num_hashes: int = 16,
                   bands: int = 4, shingle_k: int = 3,
                   use_words: bool = False,
                   portable: bool = False,
                   aggregated_sig: bool = False) -> DataFrame:
    """(bucket_key, doc_id) rows: one per band per document — the same
    signature arithmetic as the batch ``minhash_lsh_candidates``.

    ``portable=True`` swaps xxhash64 for sha256 (the engine-portable twin,
    same discipline as ``minhash_lsh_candidates_sha``) so an ANSI-SQL oracle
    reproduces the buckets bit-for-bit; ``use_words`` selects word-3-gram
    shingles over character k-grams.

    The default signature is a pure per-row column expression — NO
    pre-state aggregation — because the stateful stream cannot put a
    groupBy before ``applyInPandasWithState``. BATCH callers should pass
    ``aggregated_sig=True`` (portable mode): shingles explode once, all
    digests are computed per (doc, shingle) row and min-aggregated —
    identical signatures, but codegen'd projections + partial aggregation
    instead of an interpreted higher-order fold (measured ~3x at sf0.1;
    the stream-safe fold is itself the single-pass formulation, ~16x over
    the naive per-hash transform). The aggregated path drops docs whose
    shingle array is EMPTY (explode yields no rows) where the fold path
    emits a NULL-signature bucket; both shingle modes always produce >= 1
    shingle for non-null text, so the paths agree on any real corpus and
    the drained-stream == batch equivalence test pins it.
    """
    rows_per_band = num_hashes // bands
    base = (word_shingles(F.col(text_col), 3) if use_words
            else char_shingles(F.col(text_col), shingle_k))
    if portable:
        if aggregated_sig:
            from kafka_connect_dynamodb_spark.operators.dedup import fan_out
            ex = fan_out(docs).select(
                F.col(id_col).cast("string").alias("doc_id"),
                F.explode(base).alias("s"))
            hashed = ex.select("doc_id", *[
                F.sha2(F.concat(F.lit(f"{i}:"), F.col("s")), 256).alias(f"h{i}")
                for i in range(num_hashes)])
            sig = (hashed.groupBy("doc_id")
                   .agg(F.array(*[F.min(f"h{i}")
                                  for i in range(num_hashes)]).alias("sig")))
        else:
            sig = docs.select(
                F.col(id_col).cast("string").alias("doc_id"),
                minhash_signature_sha(base, num_hashes).alias("sig"))
        band_hash = lambda b: F.sha2(F.concat_ws("|", *[
            F.element_at("sig", b * rows_per_band + r + 1)
            for r in range(rows_per_band)]), 256)
    else:
        if aggregated_sig:
            # same explode+partial-agg rewrite as the portable branch
            # (r8 — previously the flag was honored only for portable
            # mode, leaving the xxhash64 batch paths on the interpreted
            # fold): identical signatures, codegen'd hash projection +
            # map-side-combined mins instead of a per-shingle HOF fold.
            from kafka_connect_dynamodb_spark.operators.dedup import fan_out
            ex = fan_out(docs).select(
                F.col(id_col).cast("string").alias("doc_id"),
                F.explode(base).alias("s"))
            sig = (ex.groupBy("doc_id")
                   .agg(F.array(*[F.min(F.xxhash64(F.lit(seed), F.col("s")))
                                  for seed in range(num_hashes)])
                         .alias("sig")))
        else:
            sig = docs.select(F.col(id_col).cast("string").alias("doc_id"),
                              minhash_signature(base, num_hashes).alias("sig"))
        band_hash = lambda b: F.xxhash64(*[
            F.element_at("sig", b * rows_per_band + r + 1)
            for r in range(rows_per_band)]).cast("string")
    return sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(b), band_hash(b))
            for b in range(bands)])).alias("bucket")).select("bucket", "doc_id")


def first_owner_pairs(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 16,
                      bands: int = 4, shingle_k: int = 3,
                      use_words: bool = False, portable: bool = False,
                      max_bucket_size: int = 50) -> DataFrame:
    """Batch twin of :func:`neardup_stream` over a FULLY DRAINED log: per
    LSH band bucket, the lexicographically-first document owns the bucket
    and every later member within the first ``max_bucket_size`` arrivals is
    flagged ``(doc_id, dup_of=owner)`` — exactly the star the stream's
    stateful operator accumulates (arrival order == sorted order over one
    drain, the stream's own within-batch rule).

    Scale shape: one shuffle on the bucket key; the cap is applied through a
    ranking window (WindowGroupLimit-ranked rows, no collect_list buffer),
    so a degenerate boilerplate bucket costs its row count, never a
    quadratic pair expansion. Certified against a DuckDB oracle via the
    driver row ``neardup_banded_pairs`` (portable mode) and against the
    drained stream by ``tests/test_streaming_dedup.py``.
    """
    buckets = banded_buckets(docs, id_col=id_col, text_col=text_col,
                             num_hashes=num_hashes, bands=bands,
                             shingle_k=shingle_k, use_words=use_words,
                             portable=portable, aggregated_sig=True)
    w = Window.partitionBy("bucket").orderBy("doc_id")
    ranked = buckets.select(
        "doc_id",
        F.first_value("doc_id").over(w).alias("dup_of"),
        F.row_number().over(w).alias("_rn"))
    return (ranked.filter((F.col("_rn") >= 2)
                          & (F.col("_rn") <= max_bucket_size)
                          & (F.col("doc_id") != F.col("dup_of")))
                  .select("doc_id", "dup_of").distinct())


def neardup_index(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", num_hashes: int = 16,
                  bands: int = 4, shingle_k: int = 3,
                  use_words: bool = False,
                  portable: bool = False) -> DataFrame:
    """Corpus LSH index at rest: ``(bucket, owner)`` — the lexicographically
    first document id per occupied band bucket (the same keep-first-owner
    rule the stream's state and :func:`first_owner_pairs` use).

    This is how a 100 TB pipeline dedups CONTINUOUSLY: the all-pairs batch
    pass runs once, then each crawl increment equi-joins its buckets against
    this index (:func:`incremental_neardup`) instead of re-shuffling the
    whole corpus. Persist with ``.write.bucketBy(N, "bucket")`` (or sorted
    parquet) so the per-increment probe join needs no shuffle on the index
    side; size is one row per occupied bucket — ``bands`` rows per distinct
    document signature, independent of bucket population."""
    buckets = banded_buckets(docs, id_col=id_col, text_col=text_col,
                             num_hashes=num_hashes, bands=bands,
                             shingle_k=shingle_k, use_words=use_words,
                             portable=portable, aggregated_sig=True)
    return buckets.groupBy("bucket").agg(F.min("doc_id").alias("owner"))


def incremental_neardup(new_docs: DataFrame, index: DataFrame, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_hashes: int = 16, bands: int = 4,
                        shingle_k: int = 3, use_words: bool = False,
                        portable: bool = False,
                        max_bucket_size: int = 50) -> DataFrame:
    """Near-dup pairs for an ingest INCREMENT: ``(doc_id, dup_of)`` where
    ``doc_id`` is a new document colliding with either (a) an existing
    corpus bucket owner from ``index`` or (b) an earlier document within
    the same increment (via :func:`first_owner_pairs`).

    A document is a near-duplicate iff it shares at least one band bucket
    with any earlier document — the same contract as running the batch
    operator over corpus ∪ increment, restricted to the increment, provided
    increment ids sort after corpus ids (owners are sticky: once a bucket
    is claimed its owner never changes, exactly the stream's state rule).
    Pinned by ``test_incremental_neardup_flags_match_full_batch``.

    Scale shape: the increment's buckets (``bands`` rows/doc) hash-join the
    index on the bucket key — no corpus re-scan, no all-pairs anywhere; the
    cross side needs no frequency cap (one owner per bucket makes it linear
    in increment buckets). The intra-increment side keeps the ranked
    ``max_bucket_size`` cap."""
    intra = first_owner_pairs(new_docs, id_col=id_col, text_col=text_col,
                              num_hashes=num_hashes, bands=bands,
                              shingle_k=shingle_k, use_words=use_words,
                              portable=portable,
                              max_bucket_size=max_bucket_size)
    buckets = banded_buckets(new_docs, id_col=id_col, text_col=text_col,
                             num_hashes=num_hashes, bands=bands,
                             shingle_k=shingle_k, use_words=use_words,
                             portable=portable, aggregated_sig=True)
    cross = (buckets.join(index, "bucket")
             .filter(F.col("doc_id") != F.col("owner"))
             .select("doc_id", F.col("owner").alias("dup_of"))
             .distinct())
    return intra.unionByName(cross).distinct()


def neardup_index_delta(new_docs: DataFrame, pairs: DataFrame,
                        index: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", num_hashes: int = 16,
                        bands: int = 4, shingle_k: int = 3,
                        use_words: bool = False,
                        portable: bool = False) -> DataFrame:
    """Index maintenance after :func:`incremental_neardup`: the
    ``(bucket, owner)`` rows to APPEND — buckets of the increment's CLEAN
    (unflagged) documents that the index does not already contain, owned by
    the first clean document to occupy them. Existing owners are never
    rewritten (sticky-owner rule), so appending the delta commutes with
    processing order and the index stays one row per bucket.

    One anti-join on the flagged-doc set + one anti-join on the bucket key;
    both sides are increment-sized except the index probe, which is the
    same hash join the dedup itself does."""
    flagged = pairs.select(F.col("doc_id")).distinct()
    clean = (new_docs
             .withColumn("_sid", F.col(id_col).cast("string"))
             .join(flagged.withColumnRenamed("doc_id", "_sid"),
                   "_sid", "left_anti")
             .drop("_sid"))
    fresh = neardup_index(clean, id_col=id_col, text_col=text_col,
                          num_hashes=num_hashes, bands=bands,
                          shingle_k=shingle_k, use_words=use_words,
                          portable=portable)
    return fresh.join(index.select("bucket"), "bucket", "left_anti")


def neardup_stream(docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text", num_hashes: int = 16,
                   bands: int = 4, shingle_k: int = 3,
                   use_words: bool = False, portable: bool = False,
                   max_bucket_size: int = 50,
                   state_ttl_ms: int | None = None) -> DataFrame:
    """Streaming near-dup candidates ``(doc_id, dup_of)`` — a document paired
    with the FIRST earlier document sharing any LSH band bucket. Distinct
    downstream if a pair colliding in several bands should appear once.

    ``state_ttl_ms`` evicts bucket owners after a processing-time horizon
    (bounded state); None keeps owners for the stream's lifetime (exact
    parity with the batch operator over a full drain)."""
    buckets = banded_buckets(docs, id_col=id_col, text_col=text_col,
                             num_hashes=num_hashes, bands=bands,
                             shingle_k=shingle_k, use_words=use_words,
                             portable=portable)
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (buckets.groupBy("bucket")
            .applyInPandasWithState(
                _make_update(max_bucket_size, state_ttl_ms),
                outputStructType=CANDIDATE_SCHEMA,
                stateStructType=_STATE_SCHEMA, outputMode="append",
                timeoutConf=timeout))
