"""Streaming exact dedup (dropDuplicatesWithinWatermark): bounded state,
first arrival wins, duplicates beyond the horizon re-admitted."""

from __future__ import annotations

from datetime import timedelta

from kafka_connect_dynamodb_spark.streaming.dedup import (
    content_dedup_stream, dedup_stream)
from kafka_connect_dynamodb_spark.sources.generator import DEFAULT_BASE_TS

BASE = DEFAULT_BASE_TS.replace(tzinfo=None)


def _write_stream_batches(spark, tmp_path, rows, schema):
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    return src


def test_stream_dedup_drops_in_horizon_duplicates(spark, tmp_path):
    rows = [
        (1, BASE, "a"),
        (1, BASE + timedelta(minutes=10), "a-dup"),     # within horizon: drop
        (2, BASE + timedelta(minutes=5), "b"),
        (2, BASE + timedelta(minutes=6), "b-dup"),      # within horizon: drop
        (3, BASE + timedelta(minutes=7), "c"),
    ]
    src = _write_stream_batches(spark, tmp_path, rows,
                                "event_id long, ts timestamp, payload string")
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, payload string")
              .parquet(src))
    out_dir = str(tmp_path / "out")
    q = (dedup_stream(stream, ["event_id"], watermark="1 hour")
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r.event_id: r.payload for r in spark.read.parquet(out_dir).collect()}
    assert set(got) == {1, 2, 3}
    # first arrival won (micro-batch processes in-file order)
    assert got[1] == "a" and got[2] == "b"


def test_stream_content_dedup_by_sha(spark, tmp_path):
    rows = [
        (10, BASE, "same text"),
        (11, BASE + timedelta(minutes=1), "same text"),   # same sha: drop
        (12, BASE + timedelta(minutes=2), "other text"),
    ]
    src = _write_stream_batches(spark, tmp_path, rows,
                                "doc_id long, ts timestamp, content string")
    stream = (spark.readStream
              .schema("doc_id long, ts timestamp, content string")
              .parquet(src))
    out_dir = str(tmp_path / "out")
    q = (content_dedup_stream(stream, watermark="1 hour")
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.read.parquet(out_dir).collect()
    assert len(out) == 2
    assert {r.content for r in out} == {"same text", "other text"}
    assert "_content_sha" not in spark.read.parquet(out_dir).columns


def test_batch_fallback_plain_dedup(spark):
    rows = [(1, BASE, "x"), (1, BASE, "x"), (2, BASE, "y")]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, v string")
    assert dedup_stream(df, ["event_id"]).count() == 2


def test_streaming_neardup_matches_batch_banding(spark, tmp_path):
    """Streaming MinHash-LSH near-dup: flagged (doc, dup_of) pairs are the
    star around each bucket's first owner — a subset of the batch all-pairs
    candidates — and state carries ACROSS micro-batches (a batch-2 near-dup
    of a batch-1 doc is flagged against the batch-1 owner)."""
    import os

    from pyspark.sql import functions as F

    from kafka_connect_dynamodb_spark.operators.dedup import (
        minhash_lsh_candidates)
    from kafka_connect_dynamodb_spark.streaming.neardup import (
        banded_buckets, neardup_stream)

    mk = lambda i, txt: (f"d{i:02d}", txt)
    txt_a = "the quick brown fox jumps over the lazy dog again and again"
    txt_b = "an entirely different document about spark streaming state"
    rows_b1 = [mk(1, txt_a), mk(2, txt_b), mk(3, "unrelated third text")]
    rows_b2 = [mk(4, txt_a + "!"),          # near-dup of d01 (batch 1!)
               mk(5, txt_b),                # exact dup of d02
               mk(6, "yet another unique snowflake document")]
    schema = "doc_id string, text string"

    src = str(tmp_path / "src")
    spark.createDataFrame(rows_b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(rows_b2, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1").parquet(src)   # 2 files -> 2 micro-batches
    out = neardup_stream(stream, num_hashes=16, bands=4, shingle_k=3)
    q = (out.writeStream.outputMode("append").format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.doc_id, r.dup_of)
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}

    # expected: per bucket, every non-first member flagged against the
    # first owner (arrival order: batch 1 before batch 2, lexicographic
    # within a batch) — recomputed from the same banding, batch-side
    all_docs = spark.createDataFrame(rows_b1 + rows_b2, schema)
    buckets = banded_buckets(all_docs, num_hashes=16, bands=4, shingle_k=3)
    grouped = (buckets.groupBy("bucket")
                      .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
                      .filter(F.size("ids") > 1).collect())
    want = set()
    for r in grouped:
        first = r["ids"][0]       # doc ids sort identically to arrival here
        for d in r["ids"][1:]:
            if d != first:
                want.add((d, first))
    assert got == want and got    # non-empty and exact

    # every flagged pair is one of the batch operator's candidate pairs
    batch_pairs = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(
        all_docs, num_hashes=16, bands=4, shingle_k=3).collect()}
    assert all((min(a, b), max(a, b)) in batch_pairs for a, b in got)
    # the cross-batch case specifically
    assert ("d04", "d01") in got and ("d05", "d02") in got


def test_drained_stream_equals_first_owner_pairs_both_modes(spark, tmp_path):
    """The contract behind the neardup_banded_pairs driver row: a FULLY
    DRAINED neardup_stream emits exactly first_owner_pairs() on the same
    input, in BOTH hash modes (default xxhash/char-shingles and the
    portable sha/word-shingles twin the DuckDB oracle mirrors). Arrival
    order equals lexicographic order here (batch files ordered by id), so
    the stream's keep-first star and the batch ranking window must agree
    pair-for-pair."""
    from kafka_connect_dynamodb_spark.streaming.neardup import (
        first_owner_pairs, neardup_stream)

    txt_a = "the quick brown fox jumps over the lazy dog again and again"
    txt_b = "an entirely different document about spark streaming state"
    rows_b1 = [("d01", txt_a), ("d02", txt_b), ("d03", "unrelated third text")]
    rows_b2 = [("d04", txt_a + "!"), ("d05", txt_b),
               ("d06", "yet another unique snowflake document")]
    schema = "doc_id string, text string"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows_b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(rows_b2, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    all_docs = spark.createDataFrame(rows_b1 + rows_b2, schema)

    for i, mode in enumerate([dict(use_words=False, portable=False),
                              dict(use_words=True, portable=True)]):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1").parquet(src)
        out = neardup_stream(stream, num_hashes=16, bands=4, shingle_k=3,
                             **mode)
        q = (out.writeStream.outputMode("append").format("parquet")
                .option("path", str(tmp_path / f"out{i}"))
                .option("checkpointLocation", str(tmp_path / f"cp{i}"))
                .trigger(availableNow=True).start())
        q.awaitTermination()
        drained = {(r.doc_id, r.dup_of) for r in
                   spark.read.parquet(str(tmp_path / f"out{i}")).collect()}
        batch = {(r.doc_id, r.dup_of) for r in first_owner_pairs(
            all_docs, num_hashes=16, bands=4, shingle_k=3, **mode).collect()}
        assert drained == batch and drained, mode
        if mode["portable"]:
            # portable word-shingle mode still catches the near-dup family
            assert ("d04", "d01") in drained and ("d05", "d02") in drained


# ---------------------------------------------------------------------------
# Incremental ingestion dedup against a persisted corpus LSH index
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _corpus_and_increment():
    """Corpus ids sort before increment ids (sticky-owner precondition)."""
    corpus = [
        ("a00", "the quick brown fox jumps over the lazy dog today"),
        ("a01", "pack my box with five dozen liquor jugs right now"),
        ("a02", "the quick brown fox jumps over the lazy dog today"),  # intra-A dup
        ("a03", "sphinx of black quartz judge my vow said the king"),
        ("a04", "how vexingly quick daft zebras jump over fences"),
    ]
    increment = [
        ("b00", "the quick brown fox jumps over the lazy dog today"),  # copy of a00
        ("b01", "entirely fresh content nothing shared with anyone here"),
        ("b02", "entirely fresh content nothing shared with anyone here"),  # intra-B dup
        ("b03", "sphinx of black quartz judge my vow said the king"),  # copy of a03
        ("b04", "completely novel text that stands alone in the corpus"),
    ]
    return corpus, increment


def test_incremental_neardup_flags_match_full_batch(spark):
    from kafka_connect_dynamodb_spark.streaming.neardup import (
        first_owner_pairs, incremental_neardup, neardup_index)
    corpus_rows, inc_rows = _corpus_and_increment()
    corpus, inc = _docs(spark, corpus_rows), _docs(spark, inc_rows)

    index = neardup_index(corpus, use_words=True)
    pairs = incremental_neardup(inc, index, use_words=True)
    inc_flagged = {r["doc_id"] for r in pairs.collect()}

    full = first_owner_pairs(corpus.unionByName(inc), use_words=True)
    batch_flagged = {r["doc_id"] for r in full.collect()
                     if r["doc_id"].startswith("b")}
    assert inc_flagged == batch_flagged
    # both paths actually exercised: a cross-index dup and an intra-inc dup
    got = {(r["doc_id"], r["dup_of"]) for r in pairs.collect()}
    assert ("b00", "a00") in got          # flagged against the corpus index
    assert ("b02", "b01") in got          # flagged within the increment


def test_neardup_index_delta_sticky_and_complete(spark):
    from kafka_connect_dynamodb_spark.streaming.neardup import (
        incremental_neardup, neardup_index, neardup_index_delta)
    corpus_rows, inc_rows = _corpus_and_increment()
    corpus, inc = _docs(spark, corpus_rows), _docs(spark, inc_rows)

    index = neardup_index(corpus, use_words=True)
    pairs = incremental_neardup(inc, index, use_words=True)
    delta = neardup_index_delta(inc, pairs, index, use_words=True)

    idx_rows = {r["bucket"]: r["owner"] for r in index.collect()}
    delta_rows = {r["bucket"]: r["owner"] for r in delta.collect()}
    # delta never touches existing buckets, and owners are clean inc docs
    assert not set(delta_rows) & set(idx_rows)
    flagged = {r["doc_id"] for r in pairs.collect()}
    assert set(delta_rows.values()) <= {i for i, _ in inc_rows} - flagged

    # sticky union == full rebuild over corpus + clean increment (corpus ids
    # sort first, so the rebuild's min-id owner = the sticky owner)
    clean = inc.join(pairs.select("doc_id").distinct(), "doc_id", "left_anti")
    rebuilt = {(r["bucket"], r["owner"]) for r in
               neardup_index(corpus.unionByName(clean),
                             use_words=True).collect()}
    assert rebuilt == set(idx_rows.items()) | set(delta_rows.items())


def test_incremental_neardup_next_increment_sees_updated_index(spark):
    from kafka_connect_dynamodb_spark.streaming.neardup import (
        incremental_neardup, neardup_index, neardup_index_delta)
    corpus_rows, inc_rows = _corpus_and_increment()
    corpus, inc = _docs(spark, corpus_rows), _docs(spark, inc_rows)

    index = neardup_index(corpus, use_words=True)
    pairs = incremental_neardup(inc, index, use_words=True)
    index2 = index.unionByName(
        neardup_index_delta(inc, pairs, index, use_words=True))

    # next increment: an exact copy of a CLEAN b-doc must now be flagged
    # against the appended owner, not missed
    c = _docs(spark, [
        ("c00", "completely novel text that stands alone in the corpus"),
        ("c01", "never before seen words in this tiny universe")])
    pairs2 = incremental_neardup(c, index2, use_words=True)
    got = {(r["doc_id"], r["dup_of"]) for r in pairs2.collect()}
    assert ("c00", "b04") in got
    assert all(d != "c01" for d, _ in got)


def test_line_dedup_ingest_stream_matches_sequential_batches(spark, tmp_path):
    """Continuous line-dedup ingestion: drain a 3-file source one file per
    micro-batch; every batch's cleaned output must equal applying the
    EXACT incremental operator sequentially in batch order, the final
    index must equal a from-scratch rebuild over everything ingested, and
    a re-drain on the same checkpoint is a full no-op (exactly-once)."""
    import os
    from pyspark.sql import functions as F
    from kafka_connect_dynamodb_spark.lake.table import LakeTable
    from kafka_connect_dynamodb_spark.operators.curation import (
        incremental_line_dedup, line_dup_index, line_dup_index_merge)
    from kafka_connect_dynamodb_spark.streaming.linedup import LineDedupIngest

    import glob, shutil
    src = tmp_path / "src"
    src.mkdir()
    batches = [
        {1: "cookie banner\nalpha one", 2: "cookie banner\nalpha two"},
        {3: "rare line\nbeta one", 4: "cookie banner\nbeta two"},
        {5: "rare line\ngamma one", 6: "gamma two\nall unique"},
    ]
    for i, b in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(list(b.items()), "doc_id long, text string") \
             .coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"f{i:03d}.parquet"))

    ing = LineDedupIngest(spark, LakeTable(str(tmp_path / "idx")),
                          str(tmp_path / "out"), n_buckets=4)
    q = ing.start(str(src), str(tmp_path / "cp"))
    q.awaitTermination()

    # reconstruct the stream's batch membership from its own outputs, then
    # replay the exact incremental operator sequentially in batch order
    out = ing.cleaned(spark)
    seen = {r.batch: sorted(x.doc_id for x in
                            out.filter(F.col("batch") == r.batch).collect())
            for r in out.select("batch").distinct().collect()}
    all_docs = {k: v for b in batches for k, v in b.items()}
    idx = None
    expect = {}
    for bid in sorted(seen):
        docs_b = spark.createDataFrame(
            [(d, all_docs[d]) for d in seen[bid]], "doc_id long, text string")
        if idx is None:
            idx = spark.createDataFrame([], "line_hash long, n_docs long")
        for r in incremental_line_dedup(docs_b, idx).collect():
            expect[r.doc_id] = (r.n_lines, r.n_dup_lines, r.text)
        idx = line_dup_index_merge(idx, docs_b)

    got = {r.doc_id: (r.n_lines, r.n_dup_lines, r.text)
           for r in out.collect()}
    assert got == expect
    assert sorted(got) == sorted(all_docs)
    # doc 5 must have lost 'rare line' (count crossed 2 via batch 2's doc 3)
    assert got[5][1] == 1 and "rare line" not in got[5][2]

    # final index == from-scratch rebuild over everything ingested
    final_idx = sorted(map(tuple, ing.table.read(spark)
                           .select("line_hash", "n_docs").collect()))
    rebuilt = sorted(map(tuple, line_dup_index(
        spark.createDataFrame(list(all_docs.items()),
                              "doc_id long, text string")).collect()))
    assert final_idx == rebuilt

    # exactly-once: re-drain same checkpoint -> no new versions, no change
    v = ing.table.current_version()
    q2 = ing.start(str(src), str(tmp_path / "cp"))
    q2.awaitTermination()
    assert ing.table.current_version() == v
    assert {r.doc_id for r in ing.cleaned(spark).collect()} == set(all_docs)
