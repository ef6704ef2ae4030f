"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5: the reference has no property tests; its parser/window code is
exactly where they pay off)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from influxdb_iox_spark.sources.line_protocol import (
    ParsedLine,
    format_line,
    parse_line,
)

# line-protocol identifiers: nonempty, no control chars/newlines
name_st = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs", "Cc"), exclude_characters="\n\r"
    ),
    min_size=1,
    max_size=20,
).map(str.strip).filter(lambda s: s and not s.startswith("#"))

field_value_st = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.booleans(),
    st.text(
        alphabet=st.characters(exclude_categories=("Cs", "Cc"), exclude_characters="\n\r"),
        max_size=30,
    ),
)


@settings(max_examples=300, deadline=None)
@given(
    measurement=name_st,
    tags=st.dictionaries(name_st, name_st, max_size=4),
    fields=st.dictionaries(name_st, field_value_st, min_size=1, max_size=4),
    ts=st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
)
def test_line_protocol_roundtrip(measurement, tags, fields, ts):
    """format → parse is the identity (escaping correctness under fire)."""
    original = ParsedLine(measurement, tags, fields, ts)
    back = parse_line(format_line(original))
    assert back.measurement == original.measurement
    assert back.tags == original.tags
    assert back.timestamp == original.timestamp
    assert set(back.fields) == set(original.fields)
    for k, v in original.fields.items():
        got = back.fields[k]
        assert type(got) is type(v), (k, v, got)
        assert got == v or (isinstance(v, float) and abs(got - v) < 1e-12 * max(1, abs(v)))


def _window_start(t: int, every: int, offset: int) -> int:
    # python floor-mod mirrors the Spark pmod expression in functions/time.py
    return t - (t - offset) % every


@settings(max_examples=500, deadline=None)
@given(
    t=st.integers(min_value=-(2**60), max_value=2**60),
    every=st.integers(min_value=1, max_value=10**12),
    offset=st.integers(min_value=-(10**12), max_value=10**12),
)
def test_window_bounds_invariants(t, every, offset):
    """The stop boundary b satisfies: b-every <= t < b, and b is on the
    (every, offset) grid — GetEarliestBounds semantics for any inputs,
    including negative times and offsets (window/internal.rs:330-343)."""
    start = _window_start(t, every, offset)
    bound = start + every
    assert start <= t < bound
    assert (start - offset) % every == 0


# ---------------------------------------------------------------------------
# Differential fuzz: the vectorized arrow batch parser vs the exact per-line
# parser (the fast tier must be indistinguishable for every valid line mix)
# ---------------------------------------------------------------------------

simple_name_st = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_0123456789", min_size=1, max_size=8).filter(
    lambda s: not s[0].isdigit()
)

batch_field_value_st = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.integers(min_value=-(2**61), max_value=2**61),
    st.booleans(),
    st.text(
        alphabet=st.characters(exclude_categories=("Cs", "Cc"), exclude_characters="\n\r"),
        max_size=20,
    ),
)


@settings(max_examples=150, deadline=None)
@given(
    lines=st.lists(
        st.tuples(
            st.sampled_from(["cpu", "mem", "disk"]),  # mixed measurements
            st.dictionaries(st.sampled_from(["host", "region"]), name_st, max_size=2),
            st.fixed_dictionaries(
                {},
                optional={
                    "usage": st.floats(allow_nan=False, allow_infinity=False, width=64),
                    "count": st.integers(min_value=-(2**61), max_value=2**61),
                    "up": st.booleans(),
                    "note": st.text(
                        alphabet=st.characters(
                            exclude_categories=("Cs", "Cc"), exclude_characters="\n\r"
                        ),
                        max_size=20,
                    ),
                },
            ).filter(lambda d: d),
            st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
        ),
        max_size=12,
    )
)
def test_batch_parser_matches_exact_parser(lines):
    """_parse_batch (arrow fast tier + slow fallback) over a random mix of
    escape-heavy and clean lines of several measurements must equal the
    per-line reference parse, row for row, for the target measurement."""
    import pandas as pd

    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.line_protocol import (
        ParsedLine,
        _build_spec,
        _parse_batch,
        format_line,
        parse_line,
    )

    schema = IoxSchema.build(
        ["host", "region"],
        {
            "usage": InfluxColumnType.FIELD_FLOAT,
            "count": InfluxColumnType.FIELD_INTEGER,
            "up": InfluxColumnType.FIELD_BOOLEAN,
            "note": InfluxColumnType.FIELD_STRING,
        },
    )
    spec = _build_spec(schema, "cpu", default_time=7)
    raw = [format_line(ParsedLine(m, t, f, ts)) for m, t, f, ts in lines]
    got = _parse_batch(pd.Series(raw, dtype=object), spec)

    want = []
    for ln in raw:
        pl = parse_line(ln)
        if pl.measurement != "cpu":
            continue
        row = {**pl.tags, **pl.fields}
        row["time"] = pl.timestamp if pl.timestamp is not None else 7
        want.append(row)
    assert len(got) == len(want)
    for i, row in enumerate(want):
        for c in spec.colnames:
            g, w = got[c].iloc[i], row.get(c)
            if isinstance(w, float):
                assert g == w or abs(g - w) < 1e-12 * max(1.0, abs(w)), (i, c, g, w)
            else:
                assert (g is None and w is None) or g == w, (i, c, g, w)


@settings(max_examples=10, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=120),
    shard=st.integers(min_value=100, max_value=10_000),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_pack_shards_equals_naive_cumsum(spark, tokens, shard, nparts):
    """pack_shards' distributed prefix sums must equal the single-window
    running-total formula for ANY token weights, shard budget, and input
    partitioning (the boundary-row determinism the localCheckpoint pins)."""
    from influxdb_iox_spark.pipeline.corpus import pack_shards

    rows = [(i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(nparts)
    got = {
        r.doc_id: r.shard_id
        for r in pack_shards(
            df, "n_tokens", "doc_id", shard_tokens=shard, num_partitions=nparts
        ).collect()
    }
    cum, want = 0, {}
    for i, t in rows:
        want[i] = cum // shard
        cum += t
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "x9"]),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=20,
    ),
    n=st.integers(min_value=2, max_value=3),
)
def test_ngram_counts_matches_naive(spark, docs, n):
    """ngram_counts must equal a naive per-document n-gram count for any
    corpus: n_occurrences sums every occurrence, n_docs counts distinct
    documents containing the gram."""
    from collections import Counter

    from influxdb_iox_spark.pipeline.text import ngram_counts

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.gram: (r.n_docs, r.n_occurrences)
        for r in ngram_counts(df, n=n).collect()
    }
    occ: Counter = Counter()
    in_docs: dict = {}
    for i, toks in enumerate(docs):
        grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        occ.update(grams)
        for g in set(grams):
            in_docs.setdefault(g, set()).add(i)
    want = {g: (len(in_docs[g]), occ[g]) for g in occ}
    assert got == want


# ---------------------------------------------------------------------------
# Segment dedup properties (pipeline/paragraph.py)
# ---------------------------------------------------------------------------

word_st = st.text(alphabet="abcdefg", min_size=1, max_size=4)
doc_st = st.lists(word_st, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(doc_st, min_size=1, max_size=8), w=st.integers(1, 5))
def test_segment_dedup_idempotent_and_conserving(spark, texts, w):
    """(1) Re-deduping the deduped corpus changes nothing — which also
    proves reassembled text re-segments to exactly its surviving
    segments; (2) total kept segments == distinct segments corpus-wide."""
    from influxdb_iox_spark.pipeline.paragraph import (
        dedup_segments,
        segment_documents,
    )

    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    once = dedup_segments(docs, words_per_segment=w)
    rows1 = {r.doc_id: r for r in once.collect()}

    distinct_segments = (
        segment_documents(docs, words_per_segment=w)
        .select("segment").distinct().count()
    )
    assert sum(r.segments_kept for r in rows1.values()) == distinct_segments

    again = dedup_segments(
        once.select("doc_id", "text"), words_per_segment=w
    )
    rows2 = {r.doc_id: r for r in again.collect()}
    assert set(rows2) == set(rows1)
    for i, r2 in rows2.items():
        assert r2.text == rows1[i].text
        assert r2.segments_kept == r2.n_segments  # nothing left to drop
        assert r2.n_segments == rows1[i].segments_kept


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=0, max_value=100).map(lambda x: round(x, 2)),
        min_size=2,
        max_size=20,
    )
)
def test_series_transform_telescoping(spark, vals):
    """Exact-integer window math: the cumulative sum ends at the series
    total, differences telescope to last-first, elapsed sums to the
    span."""
    from pyspark.sql import functions as F

    from influxdb_iox_spark.operators import transforms as T

    rows = [("s", (i + 1) * 1_000_000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["s", "t", "v"])
    w = T.series_window(["s"], ["t"])
    micro = T.to_micro_units(F.col("v"))
    out = df.select(
        "t",
        T.difference(micro, w).alias("d"),
        T.cumulative_sum(micro, w).alias("cs"),
        T.elapsed(F.col("t"), w).alias("e"),
    ).collect()
    by_t = {r.t: r for r in out}
    last = by_t[len(vals) * 1_000_000]
    total = sum(round(v * 1e6) for v in vals)
    assert last.cs == total
    assert sum(r.d for r in out if r.d is not None) == round(
        vals[-1] * 1e6
    ) - round(vals[0] * 1e6)
    assert sum(r.e for r in out if r.e is not None) == (len(vals) - 1) * 1_000_000
