"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all; this is the north-star
'custom stateful operator' surface (SURVEY.md §2.10/§2.11): when the
built-in windowed aggregations can't express the semantics (running
decayed averages, cross-batch counters), ``applyInPandasWithState``
holds explicit per-key state between micro-batches.

Operator here: per-user exponentially-weighted moving average of
event values with a cumulative event counter — state is two floats
per user, updated per micro-batch in event-time order. State size is
O(users), bounded; a ProcessingTimeTimeout would expire idle keys in
a long-running deployment.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("ewma", DoubleType())]
)


def _ewma_fn(alpha: float):
    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, ewma = state.get
            # n == 0 means the stored ewma is the placeholder written
            # after an all-null batch, not a prior observation — treat
            # it as "no prior" so the first real value seeds the
            # recursion as v, not alpha*v.
            ewma = ewma if n else None
        else:
            n, ewma = 0, None
        batches = [pdf for pdf in pdfs if len(pdf)]
        if batches:
            # null/NaN values are not events: dropped before the
            # recursion and excluded from the counter (pandas ewm
            # would silently skip them anyway — make that explicit
            # so n and the state agree on what was observed)
            vals = (
                pd.concat(batches, ignore_index=True)
                .sort_values("ts", kind="stable")["value"]
                .astype("float64")
                .dropna()
            )
            n += int(vals.size)
            # Carry prior state into the vectorized recursion by seeding
            # the series with it: ewm(adjust=False) computes exactly
            # e_i = alpha*v_i + (1-alpha)*e_{i-1} from its first element.
            if vals.size:
                if ewma is not None:
                    vals = pd.concat(
                        [pd.Series([float(ewma)]), vals], ignore_index=True
                    )
                ewma = float(vals.ewm(alpha=alpha, adjust=False).mean().iloc[-1])
        state.update((n, float(ewma if ewma is not None else 0.0)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma_value": [round(ewma or 0.0, 6)]}
        )

    return update


def ewma_per_user(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """ST-custom: per-user running EWMA + counter with explicit state.

    Emits one row per user per micro-batch (update mode) carrying the
    cumulative state — the streaming analogue of a stateful
    ``applyInPandas`` that survives across batches.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_fn(alpha),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
