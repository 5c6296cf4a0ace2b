"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.4 "custom stateful operators" escape hatch).

``running_user_totals`` keeps per-user (count, sum) state across
micro-batches and emits the updated totals whenever a user appears in a
batch — the building block for live engagement counters, rate limiting, or
incremental feature stores.

Scale: state is per-key and partitioned by the groupBy key, checkpointed to
the state store; a 1000-executor run shards the key space exactly like a
shuffle. Arrow batches bound the per-call memory. (GroupState timeouts
would evict idle users in a production config.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """events(user_id, value) stream -> per-user running totals, updated
    each micro-batch the user appears in."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
