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
