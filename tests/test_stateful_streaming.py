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


def _run_ema_batch(spark, src, ckpt, n=3):
    from influxdb_iox_spark.streaming.stateful import streaming_ema

    stream = spark.readStream.schema(
        "series string, value double, time long"
    ).parquet(str(src) + "/*")
    out = streaming_ema(stream, ["series"], n, "value", "time")
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
    return {r.series: (r.ema, r.last_time, r.n_points) for r in _captured}


def test_streaming_ema_matches_batch_fold(spark, tmp_path):
    import os as _os

    from influxdb_iox_spark.operators.technical import ema_scan
    import numpy as np

    src = tmp_path / "esrc"
    _os.makedirs(src)
    ckpt = tmp_path / "eckpt"

    spark.createDataFrame(
        [("a", 1.0, 100), ("a", 2.0, 200), ("b", 10.0, 100)],
        "series string, value double, time long",
    ).write.parquet(str(src / "b1"))
    rows = _run_ema_batch(spark, src, ckpt)
    ref_a = ema_scan(np.array([1.0, 2.0]), 3)
    assert rows["a"] == (ref_a[-1], 200, 2)
    assert rows["b"] == (10.0, 100, 1)

    # batch 2 across a RESTART: the incremental fold continues bit-exactly
    # where the batch kernel would be; an out-of-order row is dropped
    spark.createDataFrame(
        [("a", 4.0, 300), ("a", 99.0, 150), ("b", 20.0, 200)],
        "series string, value double, time long",
    ).write.parquet(str(src / "b2"))
    rows = _run_ema_batch(spark, src, ckpt)
    ref_a = ema_scan(np.array([1.0, 2.0, 4.0]), 3)  # 99@150 dropped
    assert rows["a"] == (ref_a[-1], 300, 3)
    ref_b = ema_scan(np.array([10.0, 20.0]), 3)
    assert rows["b"] == (ref_b[-1], 200, 2)
