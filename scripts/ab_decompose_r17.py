"""Round-17 A/B for series_seasonal_decompose's materialization policy
(VERDICT r16 item 2): eager localCheckpoint (round-16 shape) vs lazy
(eager=False — the means broadcast job materializes the blocks as a side
effect) vs none (pre-round-16 two-pipeline lineage shape).

Shapes alternate per round so host drift cancels; single-shot sentinels
bracket each timing.  Output rows are asserted identical across shapes
once before timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from influxdb_iox_spark.session import get_spark

HOUR_NS = 3_600_000_000_000


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    spark = get_spark(
        app_name="ab-decompose-r17",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F
    from pyspark.sql import DataFrame

    from influxdb_iox_spark.operators import decompose as dc

    def bucketed():
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(ev.dtypes)["ts"].startswith("timestamp"):
            ev = ev.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
            )
        return ev.groupBy(
            "event_type", F.expr(f"ts div {HOUR_NS}").alias("hr")
        ).agg(
            (
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                / F.count("*")
            ).alias("value")
        )

    _orig_lc = DataFrame.localCheckpoint

    def build(mode: str):
        if mode == "eager":
            DataFrame.localCheckpoint = lambda self, eager=True: _orig_lc(
                self, eager=True
            )
        else:
            DataFrame.localCheckpoint = _orig_lc
        try:
            return dc.seasonal_decompose(
                bucketed(), 24, key_cols=["event_type"], time_col="hr",
                value_col="value", phase_from_time=True,
                materialize=None if mode == "none" else "local_checkpoint",
            ).orderBy("event_type", "hr")
        finally:
            DataFrame.localCheckpoint = _orig_lc

    def sentinel() -> float:
        t0 = time.perf_counter()
        spark.range(5_000_000).select(
            F.sum(F.col("id").cast("decimal(18,2)")).alias("s"),
            F.min(F.hash("id")).alias("h"),
        ).write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    # warm + exactness gate
    sentinel(); sentinel()
    rows = {m: build(m).collect() for m in ("eager", "lazy", "none")}
    assert rows["eager"] == rows["lazy"] == rows["none"], "rows differ!"
    print(f"exactness: {len(rows['eager'])} rows identical across shapes",
          flush=True)

    times: dict[str, list[float]] = {"eager": [], "lazy": [], "none": []}
    sents: list[float] = []
    order = ["eager", "lazy", "none"]
    for r in range(rounds):
        for m in order[r % 3:] + order[: r % 3]:
            sents.append(sentinel())
            df = build(m)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times[m].append(round(time.perf_counter() - t0, 3))
    sents.append(sentinel())
    print(json.dumps({
        "mins": {m: min(v) for m, v in times.items()},
        "all": times,
        "sent_min": min(sents), "sent_max": max(sents),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
