"""Custom stateful streaming operator (SURVEY.md §2.8 extension; the
driver north star names ``applyInPandasWithState`` for operators the
built-in windows can't express).

``running_user_totals`` keeps one (n_events, sum_value) accumulator per
user in the state store and emits the updated totals every micro-batch —
the streaming analogue of a running groupBy that the reference's
append-only snapshot model implies (scrap_tokopedia.py:81-91: each run
appends rows; consumers want per-key running aggregates without
rescanning history).

Scale posture: state is partitioned by the group key across executors,
the per-batch work is Arrow-batched pandas, and state size is bounded by
|distinct keys| x a fixed-width struct — no per-event state growth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

# The value accumulator is an INTEGER count of value-micros
# (floor(value*1e6) per row): exact, commutative, and identical to the
# batch plan's integer sum — streaming and batch agree with NO float
# tolerance, regardless of micro-batch boundaries or arrival order.
STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("s_micros", T.LongType()),
])


def running_user_totals(events: DataFrame, key_col: str = "user_id",
                        value_col: str = "value") -> DataFrame:
    """Streaming frame -> per-key running (count, sum) via
    applyInPandasWithState; batch frame -> the equivalent one-shot
    groupBy (unified-model fallback, what the tests compare against)."""
    if not events.isStreaming:
        # Per-row floor(value*1e6) integer sum: floor of a double is a
        # pure IEEE op (bit-identical in any engine) and integer
        # addition is exact and commutative, so the batch result is
        # bit-stable across runs/partitionings and equals the streaming
        # path's accumulator exactly.
        return (events.groupBy(key_col)
                .agg(F.count(F.lit(1)).alias("n_events"),
                     (F.sum(F.floor(F.col(value_col) * 1000000)
                             .cast("decimal(38,0)"))
                       .cast("double") / F.lit(1000000.0)).alias("sum_value"))
                .select(F.col(key_col).alias("user_id"), "n_events", "sum_value"))

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        n, s_micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # np.floor on float64 == SQL floor on DOUBLE: same IEEE op,
            # so the streaming accumulator matches the batch plan's
            # integer sum bit for bit.
            s_micros += int(np.floor(pdf[value_col].to_numpy()
                                     * 1000000.0).sum())
        state.update((n, s_micros))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [s_micros / 1000000.0]})

    return (events.select(key_col, value_col)
            .groupBy(key_col)
            .applyInPandasWithState(update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))
