"""applyInPandasWithState operator: state survives across micro-batches and
checkpoint restarts; out-of-order batches never regress the register."""

from __future__ import annotations

import os

from influxdb_iox_spark.streaming.stateful import streaming_last_value

_captured: list = []


def _run_batch(spark, src, ckpt):
    stream = spark.readStream.schema("series string, value double, time long").parquet(
        str(src) + "/*"
    )
    out = streaming_last_value(stream, ["series"], "value", "time")
    _captured.clear()

    def capture(batch_df, batch_id):
        _captured.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r.series: (r.last_value, r.last_time) for r in _captured}


def test_state_across_batches_and_restart(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    ckpt = tmp_path / "ckpt"

    # batch 1: two series
    spark.createDataFrame(
        [("a", 1.0, 100), ("a", 5.0, 300), ("b", 9.0, 50)],
        "series string, value double, time long",
    ).write.parquet(str(src / "b1"))
    rows = _run_batch(spark, src, ckpt)
    assert rows == {"a": (5.0, 300), "b": (9.0, 50)}

    # batch 2 (restarted query, same checkpoint): series a gets an OLDER
    # row (must not regress the register) and series b a newer one
    spark.createDataFrame(
        [("a", 2.0, 200), ("b", 11.0, 400)],
        "series string, value double, time long",
    ).write.parquet(str(src / "b2"))
    rows = _run_batch(spark, src, ckpt)
    assert rows["a"] == (5.0, 300)  # state survived restart; no regression
    assert rows["b"] == (11.0, 400)
