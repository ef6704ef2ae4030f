"""Line-protocol grammar tests (pure Python — no Spark).

Cases follow the public line-protocol spec as exercised by the reference
parser (/root/reference/influxdb_line_protocol/src/lib.rs)."""

from __future__ import annotations

import pytest

from influxdb_iox_spark.sources.line_protocol import (
    LineProtocolError,
    parse_line,
    parse_lines,
)


def test_basic():
    pl = parse_line("cpu,region=west user=23.2 100")
    assert pl.measurement == "cpu"
    assert pl.tags == {"region": "west"}
    assert pl.fields == {"user": 23.2}
    assert pl.timestamp == 100


def test_no_tags():
    pl = parse_line("disk bytes=99i 200")
    assert pl.tags == {} and pl.fields == {"bytes": 99} and isinstance(pl.fields["bytes"], int)


def test_multiple_tags_fields_no_ts():
    pl = parse_line("h2o,state=MA,city=Boston temp=70.4,other_temp=70.2")
    assert pl.tags == {"state": "MA", "city": "Boston"}
    assert pl.fields == {"temp": 70.4, "other_temp": 70.2}
    assert pl.timestamp is None


def test_types():
    pl = parse_line('m f=1.5,i=7i,u=8u,s="hi",b=true,b2=f 1')
    assert pl.fields == {"f": 1.5, "i": 7, "u": 8, "s": "hi", "b": True, "b2": False}


def test_escapes():
    pl = parse_line(r"my\,meas,tag\ key=va\=lue fie\,ld=1 5")
    assert pl.measurement == "my,meas"
    assert pl.tags == {"tag key": "va=lue"}
    assert pl.fields == {"fie,ld": 1.0}


def test_string_escapes():
    pl = parse_line(r'm s="say \"hi\"\\" 1')
    assert pl.fields["s"] == 'say "hi"\\'


def test_string_with_spaces_and_commas():
    pl = parse_line('m s="a, b c",t=2i 9')
    assert pl.fields == {"s": "a, b c", "t": 2}


def test_negative_and_scientific():
    pl = parse_line("m a=-4.2,b=1e3,c=-7i 1")
    assert pl.fields == {"a": -4.2, "b": 1000.0, "c": -7}


def test_errors():
    for bad in [
        "",  # empty
        "onlymeasurement",  # no fields
        "m,tag= f=1",  # empty tag value
        "m f= 1",  # empty field value
        'm s="unterminated 1',
        "m f=1 notanum",
    ]:
        with pytest.raises(LineProtocolError):
            parse_line(bad)


def test_parse_lines_skips_comments_and_blanks():
    out = list(parse_lines("# comment\ncpu u=1 1\n\ncpu u=2 2\n"))
    assert [pl.fields["u"] for pl in out] == [1.0, 2.0]


# ---------------------------------------------------------------------------
# Vectorized fast path (_parse_batch — pure pandas, no Spark)
# ---------------------------------------------------------------------------


def _spec(**kw):
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.line_protocol import _build_spec

    schema = IoxSchema.build(
        kw.pop("tags", ["host", "region"]),
        kw.pop(
            "fields",
            {
                "usage": InfluxColumnType.FIELD_FLOAT,
                "count": InfluxColumnType.FIELD_INTEGER,
                "up": InfluxColumnType.FIELD_BOOLEAN,
                "note": InfluxColumnType.FIELD_STRING,
            },
        ),
    )
    return schema, _build_spec(schema, kw.pop("measurement", "cpu"), kw.pop("default_time", 7))


def test_fast_path_never_calls_parse_line_on_clean_corpus(monkeypatch):
    """An escape-free corpus must be parsed entirely by the vectorized tier."""
    import pandas as pd

    from influxdb_iox_spark.sources import line_protocol as lp

    _, spec = _spec()

    def boom(_line):
        raise AssertionError("parse_line called on fast-path corpus")

    monkeypatch.setattr(lp, "parse_line", boom)
    lines = pd.Series(
        [
            "cpu,host=h1,region=west usage=1.5,count=3i 100",
            "cpu,host=h2 usage=2.25 200",
            "cpu count=7i,up=true",  # no ts -> default_time
            "cpu,region=east usage=-4e-2,count=-9i 300",
            "  ",  # blank
            "# comment",
        ]
    )
    out = lp._parse_batch(lines, spec)
    assert list(out["usage"]) == [1.5, 2.25, None, -0.04]
    assert list(out["count"]) == [3, None, 7, -9]
    assert list(out["up"]) == [None, None, True, None]
    assert list(out["host"]) == ["h1", "h2", None, None]
    assert list(out["region"]) == ["west", None, None, "east"]
    assert list(out["time"]) == [100, 200, 7, 300]


def test_fast_and_slow_tiers_agree(monkeypatch):
    """Forcing every line through the slow tier gives identical output."""
    import pandas as pd

    from influxdb_iox_spark.sources import line_protocol as lp

    _, spec = _spec()
    lines = pd.Series(
        [
            "cpu,host=h1 usage=1.5,count=3i 100",
            'cpu,host=h2 note="hello, world" 150',  # quoted -> slow anyway
            "cpu usage=2.0,up=TRUE",
            "other,host=h9 usage=9.0 400",  # non-target, silently dropped
            "cpu,region=we\\ st usage=0.25 500",  # escape -> slow
            "cpu count=123456789012345678i 600",  # big int, exact
        ]
    )
    fast = lp._parse_batch(lines, spec)

    # reference: run the exact per-line parser over the same corpus
    rows = []
    for raw in lines:
        raw = raw.strip()
        if not raw or raw.startswith("#"):
            continue
        pl = lp.parse_line(raw)
        if pl.measurement != "cpu":
            continue
        row = {**pl.tags, **pl.fields}
        row["time"] = pl.timestamp if pl.timestamp is not None else 7
        rows.append(row)
    assert len(fast) == len(rows)
    for i, row in enumerate(rows):
        for c in spec.colnames:
            got = fast[c].iloc[i]
            want = row.get(c)
            assert (got is None and want is None) or got == want, (i, c, got, want)
    # exactness of the big int (would corrupt via float64 round-trip)
    assert fast["count"].iloc[-1] == 123456789012345678


def test_fast_path_anomalies_still_error():
    """Structurally fast-looking lines with bad values raise via the slow tier."""
    import pandas as pd

    from influxdb_iox_spark.sources import line_protocol as lp

    _, spec = _spec()
    for bad in [
        "cpu usage=notanum 1",  # unparseable float
        "cpu usage=1.0 1 junk",  # trailing garbage
        "cpu,host=h1,host2=x usage=1 1",  # unknown tag column
        "cpu mystery=1 1",  # unknown field column
        "cpu count=1.5 1",  # float into integer field
        "cpu usage=true 1",  # bool into float field
        "cpu note=bare 1",  # unquoted string field
        "other f= 1",  # malformed non-target line must still raise
        "other,host= f=1 1",  # malformed non-target TAGS must still raise
        "other,host f=1 1",  # tag without value on non-target line
        "cpu usage=1 9999999999999999999",  # ts beyond int64 -> clean error
    ]:
        with pytest.raises(LineProtocolError):
            lp._parse_batch(pd.Series([bad]), spec)
