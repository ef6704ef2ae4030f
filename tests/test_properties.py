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
