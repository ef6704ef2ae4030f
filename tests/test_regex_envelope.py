"""Regex dialect envelope: rlike vs the reference's Rust regex.

The reference compiles RPC regex predicates with Rust ``regex``
(query/src/func/regex.rs:38, unanchored is_match); we compile to Java
``rlike`` (also unanchored substring matching).  Two layers pin the
envelope:

1. The reference's OWN match battery (regex.rs:90-166, the words table)
   ported through our rlike path — golden row sets value-exact.
2. check_regex_envelope rejects syntax where the dialects diverge
   (Rust-spelled named groups, lookarounds, backreferences) with a
   clear error instead of silently computing Java semantics.
"""

from __future__ import annotations

import pytest

from influxdb_iox_spark.plans.predicate import Predicate
from influxdb_iox_spark.plans.rpc_expr import (
    RpcExprError,
    check_regex_envelope,
    rpc_predicate_to_predicate,
)

# regex.rs:93-100 — the words test table
WORDS = ["air", "aphex twin", "bruce", "Blood Orange", None, "cocteau twins"]


def _words_df(spark):
    return spark.createDataFrame(
        [(w, len(w) if w else None) for w in WORDS], "words string, length long"
    )


def _match(spark, pattern: str, matches: bool) -> list[str]:
    node = {
        "node_type": "comparison",
        "op": "regex_match" if matches else "not_regex_match",
        "children": [
            {"node_type": "tag_ref", "value": "words"},
            {"node_type": "regex", "value": pattern},
        ],
    }
    pred = rpc_predicate_to_predicate(node, Predicate())
    return [r.words for r in pred.apply(_words_df(spark), "length").collect()]


# (pattern, matches, expected words) — regex.rs:92-155 verbatim
REFERENCE_CASES = [
    (".*", True, ["air", "aphex twin", "bruce", "Blood Orange", "cocteau twins"]),
    (".*", False, []),
    ("", True, ["air", "aphex twin", "bruce", "Blood Orange", "cocteau twins"]),
    (".+O.*", True, ["Blood Orange"]),
    ("^(a|b).*", False, ["Blood Orange", "cocteau twins"]),
]


@pytest.mark.parametrize("pattern,matches,expected", REFERENCE_CASES)
def test_reference_regex_battery(spark, pattern, matches, expected):
    assert sorted(_match(spark, pattern, matches)) == sorted(expected)


def test_python_re_agrees_on_battery(spark):
    """Cross-dialect differential: Python ``re`` search semantics track
    Rust regex for the supported envelope — every battery pattern must
    agree with the rlike result row-for-row."""
    import re

    for pattern, matches, _ in REFERENCE_CASES:
        via_rlike = sorted(_match(spark, pattern, matches))
        via_re = sorted(
            w for w in WORDS if w is not None and bool(re.search(pattern, w)) == matches
        )
        assert via_rlike == via_re, (pattern, matches)


@pytest.mark.parametrize(
    "pattern",
    [
        "(?P<name>ab)c",  # Rust-spelled named group — Java errors on it
        "(?P=name)",
        "a(?=b)",  # lookahead — Rust regex cannot compile it
        "a(?!b)",
        "(?<=a)b",  # lookbehind
        "(?<!a)b",
        r"(a)\1",  # backreference
        r"(?<g>a)\k<g>",
    ],
)
def test_divergent_syntax_rejected(pattern):
    with pytest.raises(RpcExprError, match="envelope"):
        check_regex_envelope(pattern)


@pytest.mark.parametrize(
    "pattern",
    [
        ".*",
        "^(a|b).*",
        "(?<year>[0-9]{4})",  # shared named-group spelling: both dialects
        r"\p{L}+",  # Unicode class: both dialects
        "a{2,3}?",  # lazy quantifier: both dialects
        "(?i)abc",  # inline flag: both dialects
    ],
)
def test_common_envelope_accepted(pattern):
    check_regex_envelope(pattern)  # no raise


def test_escaped_backslash_before_digit_is_not_a_backreference():
    """Review r6: '\\\\1' (escaped backslash + literal digit) is valid and
    identical in both dialects; only an ODD backslash run is a
    backreference."""
    from influxdb_iox_spark.plans.rpc_expr import RpcExprError, check_regex_envelope

    check_regex_envelope(r"dir\\1")      # \\ + 1 : literal, allowed
    check_regex_envelope(r"a\\\\2b")     # two escaped backslashes
    with pytest.raises(RpcExprError, match="backreference"):
        check_regex_envelope(r"(a)\1")   # plain backref
    with pytest.raises(RpcExprError, match="backreference"):
        check_regex_envelope(r"(a)\\\1")  # escaped backslash THEN backref
    with pytest.raises(RpcExprError, match="backreference"):
        check_regex_envelope(r"\k<name>")
