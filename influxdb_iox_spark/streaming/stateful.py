"""Custom stateful streaming operator: continuous per-series selector_last.

An ``applyInPandasWithState`` exemplar for operators Spark's built-in
streaming aggregates can't express: a running (value, time) register per
series that must survive across micro-batches and ignore out-of-order
updates (the streaming twin of the selector_last aggregate,
/root/reference/query/src/func/selectors.rs last-selector semantics).

State per key = (last_time ns, last_value).  Each batch folds its rows into
the register and emits the series' current value — so downstream sees an
upsert stream of series registers, exactly the shape the reference's
"latest value" queries serve from the mutable buffer.  State is tiny
(one register per series) and keyed by tags, so it scales with series
cardinality, not row volume; Spark checkpoints it across restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def streaming_last_value(
    df: DataFrame,
    tag_columns: list[str],
    value_column: str = "value",
    time_column: str = "time",
) -> DataFrame:
    """Stateful last-(value,time) per series over a streaming DataFrame.

    Output: tags…, last_value double, last_time long — one row per series
    per micro-batch in which that series appeared.
    """
    out_schema = StructType(
        [StructField(t, StringType()) for t in tag_columns]
        + [StructField("last_value", DoubleType()), StructField("last_time", LongType())]
    )
    state_schema = StructType(
        [StructField("last_time", LongType()), StructField("last_value", DoubleType())]
    )

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            last_time, last_value = state.get
        else:
            last_time, last_value = None, None
        for pdf in pdfs:
            sub = pdf[[time_column, value_column]].dropna()
            if len(sub) == 0:
                continue
            idx = sub[time_column].idxmax()
            t, v = int(sub.loc[idx, time_column]), float(sub.loc[idx, value_column])
            # out-of-order batches never regress the register
            if last_time is None or t >= last_time:
                last_time, last_value = t, v
        if last_time is not None:
            state.update((last_time, last_value))
            yield pd.DataFrame(
                [list(key) + [last_value, last_time]],
                columns=[*tag_columns, "last_value", "last_time"],
            )

    return df.groupBy(*tag_columns).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def streaming_ema(
    df: DataFrame,
    tag_columns: list[str],
    n: int,
    value_column: str = "value",
    time_column: str = "time",
) -> DataFrame:
    """Continuous EXPONENTIAL_MOVING_AVERAGE per series — the streaming
    twin of ``operators/technical.ema_scan`` with the SAME pinned
    recurrence (``ema = ema·(1−α) + α·x``, α = 2/(n+1), seeded by the
    first point), folded incrementally across micro-batches.

    State per key = (last_time ns, ema, points seen): O(1) per series
    regardless of stream volume, checkpointed by Spark across restarts.
    Rows within a batch fold in time order; a row at-or-before the
    register's time is DROPPED (a recurrence cannot rewind — the batch
    twin recomputes from scratch instead; this is the documented
    streaming trade-off, same class as stock's CQ resample windows).
    Output per batch: tags…, ema double, last_time long, n_points long.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    alpha = 2.0 / (n + 1)
    out_schema = StructType(
        [StructField(t, StringType()) for t in tag_columns]
        + [
            StructField("ema", DoubleType()),
            StructField("last_time", LongType()),
            StructField("n_points", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_time", LongType()),
            StructField("ema", DoubleType()),
            StructField("n_points", LongType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            last_time, ema, seen = state.get
        else:
            last_time, ema, seen = None, None, 0
        for pdf in pdfs:
            sub = pdf[[time_column, value_column]].dropna()
            if len(sub) == 0:
                continue
            sub = sub.sort_values(time_column, kind="mergesort")
            for t, v in zip(
                sub[time_column].astype("int64"), sub[value_column]
            ):
                t = int(t)
                if last_time is not None and t <= last_time:
                    continue  # recurrences cannot rewind (docstring)
                v = float(v)
                ema = v if ema is None else ema * (1.0 - alpha) + alpha * v
                last_time = t
                seen += 1
        if last_time is not None:
            state.update((last_time, ema, seen))
            yield pd.DataFrame(
                [list(key) + [ema, last_time, seen]],
                columns=[*tag_columns, "ema", "last_time", "n_points"],
            )

    return df.groupBy(*tag_columns).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
