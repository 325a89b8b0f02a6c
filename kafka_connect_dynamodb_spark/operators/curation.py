"""Corpus curation operators for LLM training-data pipelines:

* **Benchmark decontamination** — flag corpus documents whose word n-grams
  overlap a held-out benchmark/eval set (the GPT-3/Llama-style n-gram
  decontamination pass every training run performs before tokenizing).
* **PII redaction** — regex scrub of emails / IPv4s / phone numbers with
  per-document match counts and a content hash of the redacted text.
* **Sequence packing** — assign documents to fixed token-budget bins in a
  deterministic global order (the "sample packing" step before writing
  training shards), via a two-level distributed prefix sum.
* **Top-token coverage** — Gopher-family repetition signal: the fraction
  of a document's tokens taken by its single most frequent token.

All four are pure built-in-function compositions (codegen'd, no Python in
any hot path) and all randomness is the portable sha256 hash from
:mod:`..operators.sampling`, so a SQL oracle reproduces every row
bit-for-bit.

These extend the engine beyond the reference (kafka-connect-dynamodb has
no corpus analytics — see trustpilot/kafka-connect-dynamodb
``source/src/main/java/com/trustpilot/connector/dynamodb``); they follow
the same scale discipline as the rest of this package: broadcast the
small side, map-side-combine the aggregations, never collect data rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_int, threshold_for

# ---------------------------------------------------------------- n-grams


def strict_word_ngrams(text: Column, n: int = 5) -> Column:
    """Distinct lowercased word n-grams; EMPTY array when the document has
    fewer than ``n`` tokens (unlike :func:`..operators.dedup.word_shingles`,
    which emits one partial shingle — decontamination must not match a
    3-token doc against a 5-gram index)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    cnt = F.size(toks) - F.lit(n - 1)
    grams = F.array_distinct(
        F.transform(F.sequence(F.lit(0), cnt - 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))
    return F.when(cnt >= 1, grams).otherwise(F.array().cast("array<string>"))


# ------------------------------------------------------- decontamination

def decontaminate(df: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 5,
                  bench_rate: float = 0.05, bench_salt: str = "bench",
                  frac_threshold: float = 0.5) -> DataFrame:
    """Benchmark n-gram decontamination over a single corpus table.

    The "benchmark" slice is selected deterministically (portable hash
    threshold on the id — in production this is the external eval set; the
    selection just makes the operator self-contained and oracle-checkable).
    Every NON-benchmark document is scored by how many of its distinct
    word ``n``-grams appear anywhere in the benchmark slice; a document is
    ``contaminated`` when that overlap fraction reaches
    ``frac_threshold``.

    Scale shape (100 TB corpus, benchmark ≪ corpus): the benchmark n-gram
    index is DISTINCT word n-grams of the small side only — broadcast to
    every executor, so the corpus side is scored by one position-explode,
    one map-side-combined (doc, gram) distinct, one broadcast-hash left
    join and one groupBy on the document id. No corpus-vs-corpus shuffle
    anywhere; the dominant exchange is the per-doc gram dedup, whose
    partial aggregation removes within-doc repeats before the wire.
    """
    from .dedup import fan_out

    is_bench = hash_int(F.col(id_col), bench_salt) < F.lit(
        threshold_for(bench_rate))
    # Explode token POSITIONS first, then build each gram with codegen'd
    # slice+concat_ws per exploded row — NOT explode(strict_word_ngrams(..)):
    # a generator over the interpreted higher-order array builder re-walks
    # the array construction per emitted row (measured ~6x at sf0.1, the
    # same blowup class as the r6 sha-MinHash fix in dedup.py). fan_out
    # first so a single-file input doesn't serialize the gram build either.
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = (fan_out(df)
            .select(F.col(id_col), is_bench.alias("_is_bench"),
                    toks.alias("_tk"))
            .withColumn("_dl", F.size("_tk"))
            .filter(F.col("_dl") >= n))          # short docs: no grams
    gram = F.concat_ws(" ", F.slice("_tk", F.col("_p") + 1, n))
    pos_grams = (base.select(
        id_col, "_is_bench", "_tk",
        F.explode(F.sequence(F.lit(0), F.col("_dl") - n)).alias("_p"))
        .select(id_col, "_is_bench", gram.alias("gram")))

    bench_index = (pos_grams.filter("_is_bench").select("gram").distinct())
    corpus = df.select(F.col(id_col)).filter(~is_bench)
    corpus_grams = (pos_grams.filter(~F.col("_is_bench"))
                    .select(id_col, "gram").distinct())

    hits = (corpus_grams
            .join(F.broadcast(bench_index.withColumn("_hit", F.lit(1))),
                  "gram", "left")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_overlap")))

    frac = (F.col("n_overlap").cast("double")
            / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"))
    return (corpus.select(id_col)
            .join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"))
            .withColumn("overlap_frac", frac)
            .withColumn("contaminated", frac >= F.lit(frac_threshold)))


# --------------------------------------------------------- PII redaction

# Java-regex AND RE2 compatible (no backrefs, no lookaround), so the same
# pattern string runs verbatim in Spark and in the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"

_PII_RULES: tuple[tuple[str, str, str], ...] = (
    # (name, pattern, replacement) — applied IN ORDER; email first so its
    # digits can't be half-eaten by the phone rule, IP before phone so
    # dotted quads never feed the \d{3} prefix.
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ips", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
)


def pii_redact(df: DataFrame, *, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Scrub emails / IPv4 addresses / phone numbers from ``text_col``.

    Adds ``n_emails`` / ``n_ips`` / ``n_phones`` match counts, the
    redacted text in ``out_col``, ``redacted_sha`` (sha256 of it, the
    audit-trail invariant), and ``pii_free``. Counts are taken on the
    ORIGINAL text; replacements are applied sequentially in rule order so
    the output is well-defined. Pure regexp built-ins — one narrow
    projection, fully pushdown/codegen friendly, embarrassingly parallel
    at any scale."""
    t = F.col(text_col)
    counted = df
    for name, pat, _ in _PII_RULES:
        counted = counted.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))))
    red = t
    for _, pat, repl in _PII_RULES:
        red = F.regexp_replace(red, pat, repl)
    return (counted
            .withColumn(out_col, red)
            .withColumn("redacted_sha", F.sha2(F.col(out_col), 256))
            .withColumn("pii_free",
                        sum(F.col(f"n_{n}") for n, _, _ in _PII_RULES) == 0))


# ------------------------------------------------------ sequence packing

def pack_sequences(df: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text", budget: int = 512,
                   salt: str = "pack", order_buckets: int = 64) -> DataFrame:
    """Assign every document to a fixed token-budget bin in a deterministic
    pseudo-random global order (the shard-packing step before writing
    training data): document d goes to bin ``floor(prefix_tokens(d) /
    budget)`` where ``prefix_tokens`` is the running token total over the
    order ``(hash(id), id)``.

    A naive ``Window.orderBy`` with no partition key is a single-task
    global sort — useless at 100 TB. This uses the classic two-level
    distributed prefix sum instead: the top ``log2(order_buckets)`` bits
    of the 52-bit portable hash split the corpus into ``order_buckets``
    ORDERED range buckets; the running sum within each bucket is a
    parallel window (partitioned by bucket), and the per-bucket offsets —
    ``order_buckets`` rows, driver-sized — are prefix-summed and broadcast
    back. Exact integer arithmetic, so the result equals the single-window
    formulation bit-for-bit (the oracle uses that formulation).

    Returns one row per document: id, token count, global position (cum
    tokens BEFORE the doc), and bin id.
    """
    k = hash_int(F.col(id_col), salt)
    tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    # top bits of the 52-bit hash -> bucket index that PRESERVES hash order
    bucket = F.floor(k / F.lit(float(1 << 52) / order_buckets)).cast("int")
    base = df.select(F.col(id_col), tok.alias("n_tokens"),
                     k.alias("_k"), bucket.alias("_b"))

    w_in = (Window.partitionBy("_b").orderBy("_k", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = base.withColumn("_cum_in", F.sum("n_tokens").over(w_in))

    # per-bucket totals: order_buckets rows -> prefix sum over a tiny set
    w_off = (Window.orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1))
    offsets = (base.groupBy("_b").agg(F.sum("n_tokens").alias("_tot"))
                   .withColumn("_off", F.coalesce(F.sum("_tot").over(w_off),
                                                  F.lit(0)))
                   .select("_b", "_off"))

    cum = (within.join(F.broadcast(offsets), "_b")
                 .withColumn("_cum", F.col("_cum_in") + F.col("_off")))
    return cum.select(
        F.col(id_col), "n_tokens",
        (F.col("_cum") - F.col("n_tokens")).alias("start_offset"),
        F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(budget))
         .cast("long").alias("bin_id"))


def pack_bin_stats(df: DataFrame, *, budget: int = 512, **kw) -> DataFrame:
    """Per-bin packing stats over :func:`pack_sequences`: document count,
    token total, and fill fraction vs the budget (>1.0 means the last doc
    straddles the bin boundary — greedy packing never splits a doc)."""
    packed = pack_sequences(df, budget=budget, **kw)
    return (packed.groupBy("bin_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("bin_tokens"))
            .withColumn("fill_frac",
                        F.col("bin_tokens").cast("double") / F.lit(budget)))


# --------------------------------------------------- top-token coverage

def top_token_coverage(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       flag_threshold: float = 0.2) -> DataFrame:
    """Gopher-family repetition signal: share of a document's tokens taken
    by its most frequent (lowercased) token; ties broken by the
    lexicographically smallest token. ``repetitive`` flags documents past
    ``flag_threshold`` (Gopher prunes pages whose top 2-gram covers >20%
    of characters; this is the single-token analogue over tokens).

    Plan: one explode + map-side-combined (id, token) count, then a
    per-document ranking window — WindowGroupLimit pushes the rank-1
    filter down, and the total-token sum rides the same window partition,
    so there is exactly one shuffle on the document id."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    counts = (df.select(F.col(id_col), F.explode(toks).alias("token"))
                .groupBy(id_col, "token").agg(F.count("*").alias("n")))
    w = Window.partitionBy(id_col)
    ranked = (counts
              .withColumn("n_tokens", F.sum("n").over(w))
              .withColumn("_rn", F.row_number().over(
                  w.orderBy(F.col("n").desc(), F.col("token").asc()))))
    frac = F.col("n").cast("double") / F.col("n_tokens").cast("double")
    return (ranked.filter(F.col("_rn") == 1)
            .select(F.col(id_col), F.col("token").alias("top_token"),
                    F.col("n").alias("top_n"), "n_tokens",
                    frac.alias("top_frac"),
                    (frac > F.lit(flag_threshold)).alias("repetitive")))
