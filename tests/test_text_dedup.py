"""Text-analysis and dedup operator tests, including the degenerate
rows (empty / whitespace-only documents) where engine parity needs the
NULLIF guards, and a brute-force cross-check of the MinHash banding."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import types as T

from activity_classifier_spark_cassandra_spark.operators.dedup import (
    q_dedup_exact,
    q_dedup_minhash,
    q_simhash_near_dup,
)
from activity_classifier_spark_cassandra_spark.operators.text import (
    q_text_stats,
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_text_stats_degenerate_docs_null_not_nan(spark, tmp_path):
    """Empty and whitespace-only docs: ratios are NULL (NULLIF guard),
    never NaN/Inf/exception — the cross-engine parity case."""
    sf = _write_docs(spark, tmp_path, ["", "   ", "the cat sat."])
    rows = {r["doc_id"]: r.asDict() for r in q_text_stats(spark, sf).collect()}
    assert rows[0]["punct_ratio"] is None          # LENGTH(text)=0
    assert rows[0]["stopword_ratio"] is None       # n_tokens=0
    assert rows[1]["avg_token_len"] is None        # whitespace-only
    assert rows[1]["n_tokens"] == 0
    assert rows[2]["n_tokens"] == 3
    assert rows[2]["stopword_ratio"] == pytest.approx(1 / 3, rel=1e-6)


def test_exact_dedup_collapses_identical_text(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, ["same text", "same text", "other"])
    got = {
        r["keep_doc_id"]: r["n_copies"]
        for r in q_dedup_exact(spark, sf).collect()
    }
    assert got == {0: 2, 2: 1}


def _py_shingles(text, k=3):
    toks = [t for t in text.split() if t]
    return {
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    } if len(toks) >= k else set()


def test_minhash_banding_matches_bruteforce_jaccard_candidates(
    spark, tmp_path
):
    """r=1 banding finds every pair sharing >=1 minhash; with 16
    independent hashes, any pair with true Jaccard >= 0.25 is found
    with overwhelming probability (1 - (1-j)^16 > 0.99).  Cross-check
    the emitted pairs' est_jaccard against python-computed truth:
    est = matches/16 must be within sampling error of true Jaccard."""
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # near-dup of 0
        "one two three four five six seven eight nine",
        "totally different words entirely here now folks",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    pairs = {
        (r["doc1"], r["doc2"]): r["est_jaccard"]
        for r in q_dedup_minhash(spark, sf).collect()
    }
    assert (0, 1) in pairs  # the engineered near-dup pair
    sh = [_py_shingles(t) for t in texts]
    for (d1, d2), est in pairs.items():
        true_j = len(sh[d1] & sh[d2]) / len(sh[d1] | sh[d2])
        assert est == pytest.approx(true_j, abs=0.35)
    # disjoint docs never pair
    for d1, d2 in itertools.combinations(range(4), 2):
        if not (sh[d1] & sh[d2]):
            assert (d1, d2) not in pairs


def test_simhash_near_dup_finds_one_word_edit(spark, tmp_path):
    """Documents differing by one token land within hamming<=3 of each
    other far more often than unrelated ones; the engineered pair must
    be found, and identical docs are hamming 0."""
    texts = [
        "spark shuffle partition broadcast join aggregate window stream",
        "spark shuffle partition broadcast join aggregate window streams",
        "spark shuffle partition broadcast join aggregate window stream",
        "completely unrelated vocabulary about cooking pasta tonight ok",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    got = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in q_simhash_near_dup(spark, sf).collect()
    }
    assert got[(0, 2)] == 0  # identical text -> identical signature
    assert (0, 3) not in got and (1, 3) not in got and (2, 3) not in got


# ------------------------------------------------- redact / repetition
def test_redact_is_global_and_word_bounded(spark):
    """Every occurrence is replaced (not just the first), and the \\b
    boundary must not touch words containing the pattern."""
    from activity_classifier_spark_cassandra_spark.operators.text import redact
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("customer customer customerX accustomed",)], ["text"]
    )
    out = df.select(
        redact(F.col("text"), [(r"\bcustomer\b", "[E]")]).alias("r")
    ).head()["r"]
    assert out == "[E] [E] customerX accustomed"


def test_repetition_ratio_values(spark):
    """'a a a b' -> top fraction 0.75, type-token ratio 0.5."""
    import __spark_entry__ as entrymod
    from activity_classifier_spark_cassandra_spark.operators import text as T
    from pyspark.sql import functions as F
    docs = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    toks = docs.select("doc_id", F.explode(T._tokens_col()).alias("tok"))
    cnt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    row = (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            (F.max("c") / F.sum("c")).alias("top"),
            (F.count(F.lit(1)) / F.sum("c")).alias("ttr"),
        )
        .head()
    )
    assert row["n"] == 4 and row["top"] == 0.75 and row["ttr"] == 0.5


def test_bigram_logprob_hand_computed(spark, tmp_path):
    """Two docs over a 3-token corpus: conditional bigram probabilities
    checked against hand-derived counts."""
    import math

    from activity_classifier_spark_cassandra_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf_bigram")
    import os

    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in TX.q_bigram_logprob(spark, sf).collect()
    }
    # corpus bigrams: doc1 -> (a,b),(b,a),(a,b); doc2 -> (a,b),(b,c)
    # c12: (a,b)=3, (b,a)=1, (b,c)=1;  c1: a=3, b=2
    # doc1 avg = -(ln(3/3) + ln(1/2) + ln(3/3)) / 3
    # doc2 avg = -(ln(3/3) + ln(1/2)) / 2
    assert 3 not in out  # single-token doc has no bigrams
    assert out[1]["n_bigrams"] == 3
    assert out[2]["n_bigrams"] == 2
    assert abs(out[1]["avg_neg_logprob"] - round(-math.log(0.5) / 3, 6)) < 1e-9
    assert abs(out[2]["avg_neg_logprob"] - round(-math.log(0.5) / 2, 6)) < 1e-9


def test_bm25_hand_computed(spark, tmp_path):
    """Two-doc corpus, one query term: BM25 verified against the
    closed-form formula."""
    import math
    import os

    from activity_classifier_spark_cassandra_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf_bm25")
    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    raw = TX.load_table(spark, sf, "documents")
    out = {r["doc_id"]: r for r in TX.bm25_search(raw, ["apple"]).collect()}
    assert list(out) == [1]  # only doc 1 matches
    k1, b = TX.BM25_K1, TX.BM25_B
    n_docs, df, tf, dl, avgdl = 2, 1, 2, 3, 2.5
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    want = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert abs(out[1]["bm25"] - round(want, 6)) < 1e-9
    assert out[1]["n_terms_matched"] == 1


def test_bpe_pair_counts_hand_computed(spark):
    """'abab ab cd x' corpus: pair counts weighted by word-TYPE
    occurrence counts, 1-char words contribute nothing."""
    from activity_classifier_spark_cassandra_spark.operators.text import (
        bpe_pair_counts,
    )

    df = spark.createDataFrame(
        [(0, "abab ab x", "en", "t", 9), (1, "ab cd", "en", "t", 5)],
        schema=DOCS_SCHEMA,
    )
    out = {
        r["pair"]: (r["pair_count"], r["n_word_types"])
        for r in bpe_pair_counts(df).collect()
    }
    # words: abab×1, ab×2, x×1, cd×1
    # 'ab' pairs: abab has 2, ab has 1 ×2 occurrences => 1*2 + 2*1 = 4
    assert out["ab"] == (4, 2)
    assert out["ba"] == (1, 1)  # only inside abab
    assert out["cd"] == (1, 1)
    assert "x" not in out  # 1-char word fabricates no pair
