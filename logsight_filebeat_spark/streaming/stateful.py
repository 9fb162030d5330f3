"""Custom stateful streaming operators (applyInPandasWithState).

The stock engine covers watermarked windows (streaming_aggregates) and
session windows (operators/aggregate.py::sessionize); this module is the
escape hatch for state the built-ins cannot express — per-key state that
must OUTLIVE a micro-batch with caller-defined transition logic. The shape
here mirrors the reference's delivery accounting (the registrar's per-source
running totals, /root/reference/plugin/client.go:121-122 ACK counting): each
key's state rides the state store, each micro-batch folds its rows into it,
and the operator emits the updated running view.

Scale notes: state is partitioned by the grouping key across executors (the
state store shuffles exactly like a groupBy), so per-key state size — one
struct here — is the only thing that must stay bounded; a timeout
(GroupStateTimeout.ProcessingTimeTimeout) evicts idle keys when the key
space is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def running_totals(
    stream: DataFrame,
    key_col: str = "sink",
    bytes_col: str | None = None,
) -> DataFrame:
    """Per-key running delivery totals across micro-batches: emits one row
    per (key, micro-batch) with that batch's event count and the running
    total since stream start — exactly-once per-key accounting state that
    survives batch boundaries (and restarts, via the checkpoint).

    Output: (key, batch_events, total_events[, batch_bytes, total_bytes]).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    with_bytes = bytes_col is not None
    out_schema = f"{key_col} string, batch_events bigint, total_events bigint"
    state_schema = "total bigint"
    if with_bytes:
        out_schema += ", batch_bytes bigint, total_bytes bigint"
        state_schema += ", total_b bigint"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n = 0
        b = 0
        for pdf in pdfs:
            n += len(pdf)
            if with_bytes:
                b += int(pdf[bytes_col].fillna(0).sum())
        if state.exists:
            st = state.get
            prev_n = int(st[0])
            prev_b = int(st[1]) if with_bytes else 0
        else:
            prev_n = prev_b = 0
        total_n, total_b = prev_n + n, prev_b + b
        state.update((total_n, total_b) if with_bytes else (total_n,))
        row = {
            key_col: [key[0]],
            "batch_events": [n],
            "total_events": [total_n],
        }
        if with_bytes:
            row["batch_bytes"] = [b]
            row["total_bytes"] = [total_b]
        yield pd.DataFrame(row)

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
