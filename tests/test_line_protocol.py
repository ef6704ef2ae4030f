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
