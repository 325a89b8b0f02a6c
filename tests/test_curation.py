"""Unit tests for operators/curation.py: benchmark decontamination, PII
redaction (on REAL PII-shaped strings, unlike the driver row's synthetic
injection), sequence packing (two-level prefix sum vs a naive reference),
and top-token coverage."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_connect_dynamodb_spark.operators.curation import (
    decontaminate, pack_bin_stats, pack_sequences, pii_redact,
    strict_word_ngrams, top_token_coverage)
from kafka_connect_dynamodb_spark.operators.sampling import threshold_for


def _hash_int(key, salt=""):
    """Pure-python replica of sampling.hash_int (sha256 first 13 hex)."""
    h = hashlib.sha256((salt + str(key)).encode()).hexdigest()
    return int(h[:13], 16)


def _is_bench(doc_id, rate=0.05, salt="bench"):
    return _hash_int(doc_id, salt) < threshold_for(rate)


# ------------------------------------------------------------- n-grams

def test_strict_ngrams_empty_below_n(spark):
    df = spark.createDataFrame(
        [(1, "one two three four"), (2, "a b c d e f")], "id long, t string")
    out = {r["id"]: r["g"] for r in
           df.select("id", strict_word_ngrams(F.col("t"), 5).alias("g")).collect()}
    assert out[1] == []                      # 4 tokens < n=5 -> EMPTY, not partial
    assert out[2] == ["a b c d e", "b c d e f"]


# ------------------------------------------------------ decontamination

def test_decontaminate_flags_benchmark_copies(spark):
    # find one id the portable hash puts in the benchmark slice and two out
    bench_id = next(i for i in range(1000) if _is_bench(i))
    clean_id, copy_id = [i for i in range(1000) if not _is_bench(i)][:2]
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(bench_id, bench_text),
            (copy_id, bench_text),                       # verbatim leak
            (clean_id, "uno dos tres cuatro cinco seis siete ocho")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in decontaminate(df).collect()}
    assert bench_id not in out                           # bench rows excluded
    assert out[copy_id]["overlap_frac"] == 1.0
    assert out[copy_id]["contaminated"] is True
    assert out[clean_id]["n_overlap"] == 0
    assert out[clean_id]["contaminated"] is False


def test_decontaminate_short_doc_zero_grams(spark):
    clean_id = next(i for i in range(1000) if not _is_bench(i))
    df = spark.createDataFrame([(clean_id, "too short")],
                               "doc_id long, text string")
    row = decontaminate(df).collect()[0]
    assert (row["n_grams"], row["n_overlap"], row["overlap_frac"],
            row["contaminated"]) == (0, 0, 0.0, False)


# ------------------------------------------------------- PII redaction

def test_pii_redact_real_shapes(spark):
    rows = [
        (1, "reach me at jane.doe+spam@mail.example.co.uk or 192.168.1.77"),
        (2, "call 555-0134 and 555-9999 twice"),
        (3, "no pii here just words"),
        (4, "mixed bob@x.io from 10.0.0.1 dial 123-4567"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 1, 0)
    assert out[1]["redacted"] == "reach me at <EMAIL> or <IP>"
    assert out[2]["n_phones"] == 2
    assert out[2]["redacted"] == "call <PHONE> and <PHONE> twice"
    assert out[3]["pii_free"] is True and out[3]["redacted"] == rows[2][1]
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (1, 1, 1)
    assert out[4]["redacted"] == "mixed <EMAIL> from <IP> dial <PHONE>"
    for r in out.values():
        assert r["redacted_sha"] == hashlib.sha256(
            r["redacted"].encode()).hexdigest()


# ----------------------------------------------------- sequence packing

def _naive_pack(rows, budget=512, salt="pack"):
    """Reference: single global cumsum in python over the same order."""
    ordered = sorted(rows, key=lambda r: (_hash_int(r[0], salt), r[0]))
    out, cum = {}, 0
    for doc_id, text in ordered:
        tok = len(text.strip().split())
        out[doc_id] = (tok, cum, (cum) // budget)
        cum += tok
    return out


def test_pack_sequences_matches_naive_global_cumsum(spark):
    rows = [(i, " ".join(f"w{j}" for j in range((i * 13) % 37 + 1)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["start_offset"], r["bin_id"])
           for r in pack_sequences(df, budget=64).collect()}
    assert got == _naive_pack(rows, budget=64)


def test_pack_bin_stats_covers_every_token(spark):
    rows = [(i, " ".join(["tok"] * ((i % 29) + 1))) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = pack_bin_stats(df, budget=100).orderBy("bin_id").collect()
    total = sum((i % 29) + 1 for i in range(150))
    assert sum(r["n_docs"] for r in stats) == 150
    assert sum(r["bin_tokens"] for r in stats) == total
    # bins are a contiguous prefix of ids, and a doc only opens bin b+1 once
    # bins 0..b are exhausted: prefix token sums must clear each boundary
    ids = [r["bin_id"] for r in stats]
    assert ids == list(range(len(ids)))
    prefix = 0
    for b, r in enumerate(stats[:-1]):
        prefix += r["bin_tokens"]
        assert prefix >= (b + 1) * 100
    assert stats[-1]["fill_frac"] == stats[-1]["bin_tokens"] / 100


def test_pack_order_is_partition_independent(spark):
    rows = [(i, " ".join(["x"] * (i % 11 + 1))) for i in range(120)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    df8 = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    a = sorted(map(tuple, pack_sequences(df1, budget=32).collect()))
    b = sorted(map(tuple, pack_sequences(df8, budget=32).collect()))
    assert a == b


# -------------------------------------------------- top-token coverage

def test_top_token_coverage_counts_and_tiebreak(spark):
    rows = [(1, "a a a b c"),            # top 'a' 3/5
            (2, "z y z y"),              # tie 2/2 -> lexicographically 'y'
            (3, "only")]                 # single token -> frac 1.0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in top_token_coverage(df).collect()}
    assert out[1]["top_token"] == "a" and out[1]["top_frac"] == 0.6
    assert out[1]["repetitive"] is True
    assert out[2]["top_token"] == "y" and out[2]["top_frac"] == 0.5
    assert out[3]["top_frac"] == 1.0 and out[3]["n_tokens"] == 1


def test_top_token_coverage_lowercases(spark):
    df = spark.createDataFrame([(1, "The the THE word")],
                               "doc_id long, text string")
    row = top_token_coverage(df).collect()[0]
    assert row["top_token"] == "the" and row["top_n"] == 3


# ------------------------------------------------- unigram LM quality

def test_unigram_lm_nll_hand_computed(spark):
    import math
    from kafka_connect_dynamodb_spark.operators.text import unigram_lm_nll
    ref = spark.createDataFrame([(100, "a a b")], "doc_id long, text string")
    df = spark.createDataFrame([(1, "a b"), (2, "zz zz")],
                               "doc_id long, text string")
    # T=3 ref tokens; V = |{a, b, zz}| = 3; add-one: P(a)=3/6, P(b)=2/6,
    # P(zz)=1/6 (OOV)
    out = {r["doc_id"]: r for r in
           unigram_lm_nll(df, ref, nll_threshold=1.0).collect()}
    exp1 = -(math.log(3 / 6) + math.log(2 / 6)) / 2
    exp2 = -(2 * math.log(1 / 6)) / 2
    assert out[1]["nll"] == pytest.approx(exp1, abs=1e-12)
    assert out[2]["nll"] == pytest.approx(exp2, abs=1e-12)
    assert out[1]["low_nll"] is True and out[2]["low_nll"] is False
    assert out[1]["n_tokens"] == 2 and out[2]["n_tokens"] == 2


def test_unigram_lm_nll_partition_independent(spark):
    from kafka_connect_dynamodb_spark.operators.text import unigram_lm_nll
    rows = [(i, " ".join(f"w{(i * j) % 7}" for j in range(1, 12)))
            for i in range(60)]
    ref = spark.createDataFrame(rows[:10], "doc_id long, text string")
    d1 = spark.createDataFrame(rows[10:], "doc_id long, text string").repartition(1)
    d8 = spark.createDataFrame(rows[10:], "doc_id long, text string").repartition(8)
    a = sorted(map(tuple, unigram_lm_nll(d1, ref).collect()))
    b = sorted(map(tuple, unigram_lm_nll(d8, ref).collect()))
    assert a == b  # bit-exact: the ordered fold removes partition-order jitter


# ------------------------------------------- Gopher repetition filter

def _brute_gopher(text):
    """Pure-python reference for gopher_repetition on one document."""
    from kafka_connect_dynamodb_spark.operators.curation import (
        GOPHER_DUP_THRESHOLDS, GOPHER_TOP_THRESHOLDS)
    tk = text.strip().lower().split()
    norm = " ".join(tk)
    nc = max(len(norm), 1)
    starts, c = [], 0
    for t in tk:
        starts.append(c)
        c += len(t) + 1
    res = {"n_chars": len(norm)}
    flags = []
    for n, th in sorted(GOPHER_TOP_THRESHOLDS.items()):
        grams = {}
        for p in range(len(tk) - n + 1):
            g = " ".join(tk[p:p + n])
            grams[g] = grams.get(g, 0) + 1
        if grams:
            g, cnt = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            res[f"top{n}_gram"], res[f"top{n}_frac"] = g, cnt * len(g) / nc
        else:
            res[f"top{n}_gram"], res[f"top{n}_frac"] = None, 0.0
        flags.append(res[f"top{n}_frac"] > th)
    for n, th in sorted(GOPHER_DUP_THRESHOLDS.items()):
        occ = {}
        for p in range(len(tk) - n + 1):
            occ.setdefault(" ".join(tk[p:p + n]), []).append(p)
        covered = set()
        for g, ps in occ.items():
            if len(ps) >= 2:
                for p in ps:
                    covered.update(range(starts[p], starts[p] + len(g)))
        res[f"dup{n}_frac"] = len(covered) / nc
        flags.append(res[f"dup{n}_frac"] > th)
    res["repetitive"] = any(flags)
    return res


def test_gopher_repetition_hand_case(spark):
    """12 tokens, first 6 repeated: dup-5 grams sit at positions 0,1,6,7;
    their single-char-token spans union to [0,11) u [12,23) = 22 of 23
    chars. The top-2 gram ties at count 2 and breaks to 'p q'."""
    from kafka_connect_dynamodb_spark.operators.curation import (
        gopher_repetition)
    df = spark.createDataFrame(
        [(1, "p q r s t u p q r s t u")], "doc_id long, text string")
    r = gopher_repetition(df).collect()[0]
    assert r.n_chars == 23
    assert r.top2_gram == "p q" and r.top2_frac == 2 * 3 / 23
    assert r.dup5_frac == 22 / 23 and r.dup6_frac == 22 / 23
    assert r.dup7_frac == 0.0            # no 7-gram repeats
    assert r.repetitive


def test_gopher_repetition_matches_bruteforce(spark):
    """Exact parity with the pure-python reference on a varied corpus:
    doubled docs, partial repeats, all-distinct, single-token, messy
    whitespace/case."""
    from kafka_connect_dynamodb_spark.operators.curation import (
        gopher_repetition)
    import random
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randint(1, 60))]
        if i % 3 == 0:                       # inject a within-doc repeat
            seg = toks[: rng.randint(2, 12)]
            toks = toks + seg
        rows.append((i, " ".join(toks)))
    rows += [(100, "x"), (101, "  Mixed   CASE tokens   Mixed case TOKENS  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    got = {r.doc_id: r for r in gopher_repetition(df).collect()}
    assert len(got) == len(rows)
    for doc_id, text in rows:
        want = _brute_gopher(text)
        r = got[doc_id]
        for k, v in want.items():
            assert getattr(r, k) == v, (doc_id, k, getattr(r, k), v)


def test_gopher_repetition_no_grams_doc(spark):
    """A doc shorter than every n yields zero coverages, NULL top grams,
    and repetitive=false — and still emits its row."""
    from kafka_connect_dynamodb_spark.operators.curation import (
        gopher_repetition)
    df = spark.createDataFrame([(7, "solo")], "doc_id long, text string")
    r = gopher_repetition(df).collect()[0]
    assert r.n_chars == 4 and not r.repetitive
    assert r.top2_gram is None and r.top2_frac == 0.0
    assert all(getattr(r, f"dup{n}_frac") == 0.0 for n in range(5, 11))


# --------------------------------------------------- line-level dedup

def _brute_line_dedup(corpus: dict[int, str], min_docs: int = 2):
    """Naive python replica of curation.line_dedup."""
    from collections import defaultdict
    docs_per_line = defaultdict(set)
    for did, text in corpus.items():
        for line in text.split("\n"):
            norm = line.strip()
            if norm:
                docs_per_line[norm].add(did)
    dup = {l for l, ds in docs_per_line.items() if len(ds) >= min_docs}
    out = {}
    for did, text in corpus.items():
        lines = text.split("\n")
        rm = [l for l in lines if l.strip() in dup and l.strip()]
        kept = [l for l in lines if not (l.strip() in dup and l.strip())]
        tot = sum(len(l) for l in lines)
        out[did] = dict(
            n_lines=len(lines), n_dup_lines=len(rm),
            removed_char_frac=sum(len(l) for l in rm) / max(tot, 1),
            text="\n".join(kept))
    return out


def test_line_dedup_matches_bruteforce(spark):
    from kafka_connect_dynamodb_spark.operators.curation import line_dedup
    corpus = {
        1: "cookie banner\nreal content one\n\ncookie banner",
        2: "cookie banner\nreal content two\nnav bar",
        3: "nav bar\nunique line here\n  cookie banner  ",
        4: "all unique\nnothing shared",
        5: "cookie banner\nnav bar",              # everything removed
        6: "",                                     # single empty line
        7: "   \n\t\ncookie banner",               # blanks never dup-removed
    }
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string").repartition(5)
    got = {r.doc_id: r for r in line_dedup(df).collect()}
    want = _brute_line_dedup(corpus)
    assert set(got) == set(want)
    for did, w in want.items():
        r = got[did]
        for k, v in w.items():
            assert getattr(r, k) == v, (did, k, getattr(r, k), v)
    # doc 5 loses every line; doc 7 keeps its blank lines verbatim
    assert got[5].text == ""
    assert got[7].text == "   \n\t"


def test_line_dedup_min_docs_threshold(spark):
    from kafka_connect_dynamodb_spark.operators.curation import line_dedup
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc"), (3, "a\nd")], "doc_id long, text string")
    # min_docs=3: only 'a' (in all three docs) is removed
    got = {r.doc_id: r.text for r in line_dedup(df, min_docs=3).collect()}
    assert got == {1: "b", 2: "c", 3: "d"}
    # min_docs=4: nothing reaches the bar
    got4 = {r.doc_id: r.n_dup_lines for r in
            line_dedup(df, min_docs=4).collect()}
    assert got4 == {1: 0, 2: 0, 3: 0}


# ------------------------------------- DSIR-style importance resampling

def _brute_dsir(raw: dict[int, str], target: dict[int, str],
                n_buckets: int, salt: str = "dsir"):
    import math
    from collections import Counter
    bucket = lambda t: _hash_int(t, salt) % n_buckets  # noqa: E731
    toks = lambda s: s.lower().strip().split()         # noqa: E731
    ct = Counter(bucket(t) for s in target.values() for t in toks(s))
    cr = Counter(bucket(t) for s in raw.values() for t in toks(s))
    t_tgt, t_raw = sum(ct.values()), sum(cr.values())
    out = {}
    for did, s in raw.items():
        tf = Counter(bucket(t) for t in toks(s))
        logw = 0.0
        for b in sorted(tf):                 # the operator's sorted fold
            lr = (math.log((ct.get(b, 0) + 1) / (t_tgt + n_buckets))
                  - math.log((cr.get(b, 0) + 1) / (t_raw + n_buckets)))
            logw += tf[b] * lr
        out[did] = (sum(tf.values()), logw)
    return out


def test_dsir_importance_matches_bruteforce(spark):
    from kafka_connect_dynamodb_spark.operators.curation import dsir_importance
    target = {100: "clean prose sentence with words",
              101: "clean prose again with more words"}
    raw = {1: "clean prose sentence",                    # target-like
           2: "zxq vvv kkk zxq vvv spam spam spam",      # target-unlike
           3: "words with clean prose and junk zxq",
           4: "single"}
    tdf = spark.createDataFrame(list(target.items()), "doc_id long, text string")
    rdf = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in
           dsir_importance(rdf, tdf, n_buckets=64,
                           log_w_threshold=-0.5).collect()}
    want = _brute_dsir(raw, target, 64)
    assert set(got) == set(want)
    for did, (n, logw) in want.items():
        assert got[did].n_tokens == n
        assert got[did].log_weight == pytest.approx(logw, abs=0, rel=0), did
    # the target-like doc must outscore the spam doc
    assert got[1].log_weight > got[2].log_weight
    assert got[1].selected and not got[2].selected


def test_dsir_stats_passthrough_skips_jobs(spark):
    from kafka_connect_dynamodb_spark.operators.curation import dsir_importance
    tdf = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    rdf = spark.createDataFrame([(2, "a c")], "doc_id long, text string")
    auto = dsir_importance(rdf, tdf, n_buckets=16).collect()
    manual = dsir_importance(rdf, tdf, n_buckets=16, stats=(2, 2)).collect()
    assert auto == manual


def test_line_dedup_property_random_corpora(spark):
    """Hypothesis-style randomized parity (fixed seeds for determinism):
    random corpora mixing shared and unique lines, blanks, whitespace-only
    lines and empty docs must match the naive python replica exactly,
    independent of partitioning."""
    import random
    from kafka_connect_dynamodb_spark.operators.curation import line_dedup
    shared = ["cookie banner", "nav bar", "footer (c) corp", ""]
    for seed in (3, 17, 91):
        rng = random.Random(seed)
        corpus = {}
        for did in range(25):
            n = rng.randint(0, 6)
            lines = []
            for _ in range(n):
                if rng.random() < 0.4:
                    lines.append(rng.choice(shared))
                else:
                    lines.append(f"unique {did} {rng.randint(0, 99)}")
                if rng.random() < 0.15:
                    lines.append("   ")
            corpus[did] = "\n".join(lines)
        df = spark.createDataFrame(list(corpus.items()),
                                   "doc_id long, text string") \
                  .repartition(rng.randint(1, 9))
        got = {r.doc_id: r for r in line_dedup(df).collect()}
        want = _brute_line_dedup(corpus)
        assert set(got) == set(want), seed
        for did, w in want.items():
            r = got[did]
            for k, v in w.items():
                assert getattr(r, k) == v, (seed, did, k, getattr(r, k), v)


def test_incremental_line_dedup_equals_batch_over_union(spark):
    """The incremental loop is EXACT (counts add across disjoint id sets):
    cleaning an increment against the corpus index == the batch operator
    over corpus ∪ increment restricted to the increment; the merged index
    == the index rebuilt from scratch."""
    from kafka_connect_dynamodb_spark.operators.curation import (
        incremental_line_dedup, line_dedup, line_dup_index,
        line_dup_index_merge)
    corpus = {1: "cookie banner\nold content one",
              2: "cookie banner\nold content two",
              3: "rare line\nold content three"}
    # increment: 10 shares 'rare line' (corpus count 1 -> crosses min_docs
    # only WITH the index), 11+12 share a brand-new line (intra-increment
    # dup), 13 is clean
    increment = {10: "rare line\nnew stuff a",
                 11: "fresh banner\nnew stuff b",
                 12: "fresh banner\nnew stuff c",
                 13: "all unique here"}
    cdf = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    idf = spark.createDataFrame(list(increment.items()), "doc_id long, text string")

    index = line_dup_index(cdf)
    got = sorted(map(tuple, incremental_line_dedup(idf, index).collect()))
    want = sorted(map(tuple,
                      line_dedup(cdf.unionByName(idf))
                      .filter(F.col("doc_id") >= 10).collect()))
    assert got == want
    # the cross-threshold case really exercised: 10 lost 'rare line'
    by_id = {t[0]: t for t in got}
    assert by_id[10][2] == 1 and "rare line" not in by_id[10][4]
    assert by_id[11][2] == 1 and by_id[12][2] == 1      # intra-increment dup
    assert by_id[13][2] == 0

    merged = sorted(map(tuple, line_dup_index_merge(index, idf).collect()))
    rebuilt = sorted(map(tuple,
                         line_dup_index(cdf.unionByName(idf)).collect()))
    assert merged == rebuilt


def test_line_dedup_and_gopher_unicode_chars_not_bytes(spark):
    """Multi-byte text: every char metric must count CHARACTERS (Spark
    length() semantics, matching DuckDB length() on VARCHAR), so CJK and
    emoji docs get the same treatment either engine computes."""
    from kafka_connect_dynamodb_spark.operators.curation import (
        gopher_repetition, line_dedup)
    corpus = {1: "日本語のテキスト\nshared line\nこんにちは 世界",
              2: "shared line\nемоджи 🦀 строка",
              3: "ünïcödé wörds häre\nshared line"}
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in line_dedup(df).collect()}
    want = _brute_line_dedup(corpus)
    for did, w in want.items():
        for k, v in w.items():
            assert getattr(got[did], k) == v, (did, k)
    assert got[1].removed_char_frac == len("shared line") / (
        len("日本語のテキスト") + len("shared line") + len("こんにちは 世界"))

    rep = {r.doc_id: r for r in gopher_repetition(
        spark.createDataFrame([(1, "こんにちは 世界 こんにちは 世界 です ね")],
                              "doc_id long, text string")).collect()}
    # 17 token chars + 5 joiner spaces = 22 chars; top 2-gram
    # 'こんにちは 世界' (8 chars) occurs twice -> 16/22
    assert rep[1].n_chars == 22
    assert rep[1].top2_gram == "こんにちは 世界"
    assert rep[1].top2_frac == 16 / 22


def test_line_dedup_regex_special_separator(spark):
    """ADVICE r6: ``sep`` is used as a regex by the split but a literal by
    the rebuild — a regex-special separator ('|') must split literally,
    not per-character."""
    from kafka_connect_dynamodb_spark.operators.curation import line_dedup
    df = spark.createDataFrame(
        [(1, "shared line|unique one|tail.a"),
         (2, "shared line|unique two|tail.b")], "doc_id long, text string")
    got = {r.doc_id: r for r in line_dedup(df, sep="|").collect()}
    assert got[1].text == "unique one|tail.a"
    assert got[2].text == "unique two|tail.b"
    assert got[1].n_lines == 3 and got[1].n_dup_lines == 1


# ------------------------------------------- intra-document line dedup

def _brute_intra(corpus: dict, sep: str = "\n") -> dict:
    out = {}
    for did, text in corpus.items():
        arr = text.split(sep)
        norms = [x.strip() for x in arr]
        keep = [i for i in range(len(arr))
                if norms[i] == "" or norms.index(norms[i]) == i]
        tot = sum(len(x) for x in arr)
        kc = sum(len(arr[i]) for i in keep)
        out[did] = {"n_lines": len(arr),
                    "n_repeat_lines": len(arr) - len(keep),
                    "removed_char_frac": (tot - kc) / max(tot, 1),
                    "text": sep.join(arr[i] for i in keep)}
    return out


def test_intra_doc_line_dedup_matches_bruteforce(spark):
    from kafka_connect_dynamodb_spark.operators.curation import (
        intra_doc_line_dedup)
    corpus = {
        0: "x y\nfoo\n x y \nbar\nx y\n\n\nfoo",   # trim-equal repeats, blanks
        1: "only\nlines\nhere",
        2: "",                                      # empty doc
        3: "same\nsame\nsame",
        4: "  \n  \n",                              # whitespace-only lines
    }
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = {r.doc_id: r for r in intra_doc_line_dedup(df).collect()}
    want = _brute_intra(corpus)
    for did, w in want.items():
        for k, v in w.items():
            assert getattr(got[did], k) == v, (did, k, getattr(got[did], k), v)


def test_intra_doc_line_dedup_property_random_docs(spark):
    """Randomized parity vs the naive replica; repeats, blanks, and
    whitespace noise; partitioning-independent (pure projection)."""
    import random
    from kafka_connect_dynamodb_spark.operators.curation import (
        intra_doc_line_dedup)
    for seed in (5, 23, 77):
        rng = random.Random(seed)
        corpus = {}
        for did in range(30):
            lines = []
            for _ in range(rng.randint(0, 10)):
                r = rng.random()
                if r < 0.35 and lines:
                    lines.append(rng.choice(lines))        # an echo
                elif r < 0.5:
                    lines.append("   ")
                else:
                    lines.append(f"l{rng.randint(0, 6)} {did}")
            corpus[did] = "\n".join(lines)
        df = spark.createDataFrame(list(corpus.items()),
                                   "doc_id long, text string") \
                  .repartition(rng.randint(1, 7))
        got = {r.doc_id: r for r in intra_doc_line_dedup(df).collect()}
        want = _brute_intra(corpus)
        for did, w in want.items():
            for k, v in w.items():
                assert getattr(got[did], k) == v, (seed, did, k)


def test_intra_doc_line_dedup_regex_special_separator(spark):
    from kafka_connect_dynamodb_spark.operators.curation import (
        intra_doc_line_dedup)
    df = spark.createDataFrame([("e", "a|b|a|c")], "doc_id string, text string")
    r = intra_doc_line_dedup(df, sep="|").collect()[0]
    assert r.text == "a|b|c" and r.n_repeat_lines == 1


def test_intra_doc_line_dedup_is_shuffle_free(spark):
    """The whole operator must stay a per-row projection: no exchange in
    the optimized plan."""
    from kafka_connect_dynamodb_spark.operators.curation import (
        intra_doc_line_dedup)
    df = spark.createDataFrame([("a", "x\nx")], "doc_id string, text string")
    qe = intra_doc_line_dedup(df)._jdf.queryExecution()
    plan = qe.optimizedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in qe.executedPlan().toString()


# --------------------------------------------------- document chunking

def _brute_chunks(text, c, o):
    import re
    toks = re.split(r"\s+", text.strip()) if text and text.strip() else []
    n, stride = len(toks), c - o
    nc = 1 if n <= c else 1 + -(-(n - c) // stride)
    return [(i, " ".join(toks[i*stride:i*stride+c]),
             len(toks[i*stride:i*stride+c])) for i in range(nc)]


def test_chunk_documents_matches_bruteforce(spark):
    from kafka_connect_dynamodb_spark.operators.curation import (
        chunk_documents)
    docs = [("a", " ".join(f"t{j}" for j in range(100))),
            ("b", "one two three"), ("c", ""), ("d", "   "),
            ("e", " ".join(f"x{j}" for j in range(33))),
            ("f", " ".join(f"y{j}" for j in range(64))),
            ("g", None)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    for c, o in ((32, 8), (16, 0), (10, 9)):
        got = {}
        for r in chunk_documents(df, chunk_tokens=c, overlap=o).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.chunk_text, r.n_chunk_tokens))
        for did, text in docs:
            assert sorted(got[did]) == _brute_chunks(text, c, o), (did, c, o)


def test_chunk_documents_overlap_reconstruction(spark):
    """Adjacent chunks share exactly `overlap` boundary tokens, and
    stripping the overlap from every chunk after the first reconstructs
    the document."""
    from kafka_connect_dynamodb_spark.operators.curation import (
        chunk_documents)
    text = " ".join(f"w{j}" for j in range(75))
    df = spark.createDataFrame([("a", text)], "doc_id string, text string")
    rows = sorted(chunk_documents(df, chunk_tokens=20, overlap=5).collect(),
                  key=lambda r: r.chunk_id)
    toks = [r.chunk_text.split(" ") for r in rows]
    for a, b in zip(toks, toks[1:]):
        assert a[-5:] == b[:5]
    rebuilt = toks[0] + [t for ch in toks[1:] for t in ch[5:]]
    assert " ".join(rebuilt) == text


def test_chunk_documents_validates_overlap(spark):
    import pytest as _pytest
    from kafka_connect_dynamodb_spark.operators.curation import (
        chunk_documents)
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_chunk_documents_is_shuffle_free(spark):
    from kafka_connect_dynamodb_spark.operators.curation import (
        chunk_documents)
    df = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    qe = chunk_documents(df)._jdf.queryExecution()
    assert "Exchange" not in qe.executedPlan().toString()
