"""The driver records only the LAST 2000 chars of bench.py stdout and
JSON-parses the final line (BENCH_r07 was recorded as parsed:null because the
line grew to ~3.5k chars and was cut mid-dict).  Pin the envelope: for the
current HEADLINE set — and with headroom for growth — the printed line must
parse and fit the window."""

import json

import bench


def _fake_timings(names):
    # worst-case widths: 3-decimal floats in the tens of seconds
    return {n: 99.999 for n in names}


def test_output_line_fits_driver_window():
    names = list(bench.HEADLINE) + ["ingest_line_protocol"]
    timings = _fake_timings(names)
    sentinels = _fake_timings(names)  # all equal -> every row >= 1.5x median
    # is False, so sent_hi is empty; force the worst case instead:
    sentinels = {n: (99.999 if i % 2 else 0.05) for i, n in enumerate(names)}
    conditions = {
        "cpus": 32,
        "fresh_jvm": True,
        "loadavg_start": 99.99,
        "loadavg_end": 99.99,
        "sentinel_before_sec": 9.999,
        "sentinel_after_sec": 9.999,
    }
    line = bench.build_output_line(timings, sentinels, conditions, 0.1)
    assert len(line) <= 1950, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert set(parsed["queries"]) == set(names)
    assert parsed["unit"] == "sec"


def test_output_line_survives_headline_growth():
    # 10 extra future queries with realistically long names must still fit
    names = list(bench.HEADLINE) + ["ingest_line_protocol"] + [
        f"future_query_with_a_long_name_{i:02d}" for i in range(10)
    ]
    timings = _fake_timings(names)
    sentinels = {n: (99.999 if i % 2 else 0.05) for i, n in enumerate(names)}
    line = bench.build_output_line(timings, sentinels, {"cpus": 32}, 0.1)
    assert len(line) <= 1950, len(line)
    json.loads(line)


def test_sent_hi_empty_on_quiet_machine():
    names = list(bench.HEADLINE)
    timings = _fake_timings(names)
    sentinels = {n: 0.11 for n in names}
    parsed = json.loads(
        bench.build_output_line(timings, sentinels, {"cpus": 32}, 0.1)
    )
    assert parsed["sent_hi"] == {}
    assert parsed["sent_med"] == 0.11


def test_noisy_host_flag():
    """The quiet-host gate (round-13 judge): a record measured with a
    sentinel median (or pre-run sentinel) above 0.12 s carries an
    explicit noisy_host marker the next judge can see; quiet runs say
    false.  The flag sits in the untruncatable head of the payload."""
    names = list(bench.HEADLINE)
    timings = _fake_timings(names)
    quiet = json.loads(
        bench.build_output_line(
            timings, {n: 0.08 for n in names},
            {"cpus": 32, "sentinel_before_sec": 0.09}, 0.1,
        )
    )
    assert quiet["noisy_host"] is False
    # noisy by median
    noisy_med = json.loads(
        bench.build_output_line(
            timings, {n: 0.161 for n in names},
            {"cpus": 32, "sentinel_before_sec": 0.09}, 0.1,
        )
    )
    assert noisy_med["noisy_host"] is True
    # noisy by the pre-run sentinel even with quiet per-row medians
    noisy_pre = json.loads(
        bench.build_output_line(
            timings, {n: 0.08 for n in names},
            {"cpus": 32, "sentinel_before_sec": 0.2}, 0.1,
        )
    )
    assert noisy_pre["noisy_host"] is True
