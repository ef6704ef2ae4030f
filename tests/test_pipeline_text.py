"""Text-analysis operator tests (token counts, quality, lang-id, fingerprint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from influxdb_iox_spark.pipeline.text import (
    fingerprint,
    lang_id,
    quality_features,
    token_count,
    word_tokens,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [("hello world",), ("  a  b   c ",), ("",), ("   ",), ("one",)], "text string"
    )
    out = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
    assert out == [2, 3, 0, 0, 1]


def test_word_tokens(spark):
    df = spark.createDataFrame([("Hello, World! x2",)], "text string")
    assert df.select(word_tokens(F.col("text"))).first()[0] == ["hello", "world", "x2"]


def test_quality_features(spark):
    df = spark.createDataFrame([("The cat, the dog.",)], "text string")
    r = quality_features(df).first()
    assert r.q_n_chars == 17
    assert r.q_n_tokens == 4
    assert r.q_punct_ratio == pytest.approx(2 / 17)
    # 'the' appears twice as standalone word (case-insensitive)
    assert r.q_stopword_ratio == pytest.approx(2 / 4)


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick fox and the dog is of no concern to anyone"),
            (2, "der hund und die katze ist nicht da und der rest"),
            (3, "le chat et les chiens est sur le toit des maisons"),
            (4, "el gato y los perros es una de las cosas"),
            (5, "xyzzy plugh quux"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "unknown"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert out[1] == out[2] != out[3]


def test_redact_pii(spark):
    from influxdb_iox_spark.pipeline.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@sub.example.org today"),
            (2, "server 192.168.0.1 answered"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in redact_pii(df).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "server <IP> answered"
    assert out[3] == "call <PHONE> now"
    assert out[4] == "no pii here at all"


def test_ngram_counts(spark):
    from influxdb_iox_spark.pipeline.text import ngram_counts

    df = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran. the cat ran"),
            (3, "dog"),
        ],
        "doc_id long, text string",
    )
    rows = {r.gram: (r.n_docs, r.n_occurrences) for r in ngram_counts(df, n=2).collect()}
    assert rows["the cat"] == (2, 3)   # doc1 once, doc2 twice
    assert rows["cat ran"] == (1, 2)
    assert rows["cat sat"] == (1, 1)
    assert rows["ran the"] == (1, 1)   # punctuation split still tokenizes
    assert "dog" not in rows           # < n tokens -> no grams
    top1 = ngram_counts(df, n=2, top_k=1).collect()
    assert top1[0].gram == "the cat"


def test_repetition_features(spark):
    from influxdb_iox_spark.pipeline.text import repetition_features

    df = spark.createDataFrame(
        [
            # 6 words, 2 distinct -> dup frac 2/3; 2-grams: "the cat" x3,
            # "cat the" x2; gram len 7, text length 23
            (1, "the cat the cat the cat"),
            # all distinct words, each 2-gram unique -> tie broken by
            # lexicographically smallest gram ("a b")
            (2, "a b c d"),
            # one word -> no 2-grams at all
            (3, "hello"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_features(df).collect()}

    r1 = rows[1]
    assert (r1.n_words, r1.top_gram, r1.top_gram_count) == (6, "the cat", 3)
    assert r1.dup_word_frac == pytest.approx(1 - 2 / 6)
    assert r1.top_gram_char_frac == pytest.approx(3 * 7 / 23)

    r2 = rows[2]
    assert (r2.n_words, r2.dup_word_frac) == (4, 0.0)
    assert (r2.top_gram, r2.top_gram_count) == ("a b", 1)

    r3 = rows[3]
    assert (r3.n_words, r3.top_gram, r3.top_gram_count) == (1, "", 0)
    assert r3.top_gram_char_frac == 0.0

    r4 = rows[4]
    assert (r4.n_words, r4.top_gram, r4.top_gram_count) == (0, "", 0)
    assert (r4.dup_word_frac, r4.top_gram_char_frac) == (0.0, 0.0)


def test_gram_generation_stays_linear_in_plan(spark):
    """Regression guard for the quadratic-lambda trap (BENCH_NOTES §4):
    gram producers must build grams from arrays_zip over shifted slices,
    never transform(sequence(...)) index lambdas (Catalyst inlines the
    tokenizer into the lambda body -> every gram re-tokenizes the doc)."""
    from influxdb_iox_spark.pipeline.dedup import shingles
    from influxdb_iox_spark.pipeline.text import ngram_counts, repetition_features

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plans = [
        ngram_counts(df)._jdf.queryExecution().optimizedPlan().toString(),
        repetition_features(df)._jdf.queryExecution().optimizedPlan().toString(),
        df.select(shingles(df.text))._jdf.queryExecution().optimizedPlan().toString(),
    ]
    for p in plans:
        assert "transform(sequence(" not in p.replace(" ", "")
        assert "arrays_zip" in p


def test_blocklist_filter(spark):
    from influxdb_iox_spark.pipeline.text import blocklist_filter, blocklist_hits
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "a perfectly clean document"),
            (2, "contains the bad word here"),
            (3, "BadWord in mixed case"),
            (4, "badwording is a different token and passes"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in blocklist_filter(df, ["bad", "badword"]).collect()
    )
    # standalone-word semantics: 'badwording' is NOT a hit
    assert kept == [1, 4, 5]
    hits = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", blocklist_hits(F.col("text"), ["bad", "badword"]).alias("h")
        ).collect()
    }
    assert hits[2] == 1 and hits[3] == 1 and hits[4] == 0


def test_quality_filter_rules_are_data(spark):
    from influxdb_iox_spark.pipeline.text import quality_filter

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "x"),                          # too short
            (3, "9999 1234 5678 000 111 222 333 444 555 666 777 888"),  # digits
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id
        for r in quality_filter(
            df,
            rules=[("q_n_tokens", 5, None), ("q_digit_ratio", None, 0.3)],
        ).collect()
    )
    assert kept == [1]
    # survivors keep ONLY the original columns (features are internal)
    out = quality_filter(df, rules=[("q_n_tokens", 1, None)])
    assert out.columns == ["doc_id", "text"]


def test_c4_line_filter(spark):
    from influxdb_iox_spark.pipeline.text import c4_line_filter

    doc = "\n".join(
        [
            "This line is a proper sentence.",          # kept
            "short.",                                   # < 3 words
            "no terminal punctuation here",             # no punct
            "Enable JavaScript to view this page.",     # blockword
            "Lorem Ipsum dolor sit amet.",              # blockword
            'He said "keep this quoted line."',         # kept (quote end)
            "Another good sentence stays here!",        # kept
            "   ",                                      # blank
        ]
    )
    df = spark.createDataFrame([(1, doc), (2, "")], "doc_id long, text string")
    out = {r.doc_id: r.text for r in c4_line_filter(df).collect()}
    assert out[1].split("\n") == [
        "This line is a proper sentence.",
        'He said "keep this quoted line."',
        "Another good sentence stays here!",
    ]
    assert out[2] == ""
    # knobs: punctuation requirement off keeps the bare line
    loose = {
        r.doc_id: r.text
        for r in c4_line_filter(df, require_terminal_punct=False).collect()
    }
    assert "no terminal punctuation here" in loose[1]
