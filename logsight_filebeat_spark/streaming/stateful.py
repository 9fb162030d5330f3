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


def multiline_events(
    stream: DataFrame,
    key_col: str = "file",
    idx_col: str = "line_idx",
    line_col: str = "line",
    pattern: str = r"^\s",
    negate: bool = False,
    match: str = "after",
    max_lines: int | None = None,
    timeout_ms: int = 5000,
) -> DataFrame:
    """Streaming multiline join with the Beats ``timeout`` flush — the one
    multiline config knob that is wall-clock by nature and therefore only
    meaningful on the streaming path (the batch fold in operators/parse
    deliberately omits it: a materialized page has no 'waiting for the next
    line' state). Semantics per key (a file/source):

      * lines fold into events exactly like the batch ``multiline_join``
        (``match='after'``: a line passing the continuation test appends to
        the open event; ``match='before'``: every line appends and a line
        FAILING the test terminates; ``negate`` inverts; ``max_lines``
        discards overflow continuation lines, Beats truncation), ordered
        by ``idx_col`` — line order must be carried explicitly because a
        shuffled micro-batch has no implicit row order;
      * an event still open at the end of a micro-batch WAITS in the state
        store for its continuation lines;
      * if no new line for that key arrives within ``timeout_ms``
        (processing time), the pending event FLUSHES — emitted with
        ``by_timeout=true`` — exactly Beats' guarantee that a stalled
        harvester cannot hold the final event of a file forever.

    Output: (key, event_idx bigint, event_text string, by_timeout boolean),
    event_idx monotone per key across micro-batches (persisted in state).
    A key idle past the timeout is evicted entirely — its ordinal restarts
    at 0 on the next line, like a fresh Beats harvester on a rotated file.

    Scale shape: state is one (pending_text, counters) struct per key,
    partitioned by key like any groupBy shuffle; ``max_lines`` bounds the
    pending text, the timeout evicts idle keys, so state size is
    O(active keys), never O(stream).

    Operational note (measured on Spark 4.1): once any processing-time
    timeout is registered the engine keeps scheduling no-data micro-batches
    to fire it — which is exactly what makes the flush work — but as a
    consequence an ``availableNow`` drain of this operator NEVER
    self-terminates (it loops no-data batches even after all state is
    flushed and removed). Run it under a normal processing-time trigger and
    stop the query explicitly.
    """
    import re as _re

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if match not in ("after", "before"):
        raise ValueError(f"multiline match mode {match!r}: 'after' or 'before'")
    if max_lines is not None and max_lines < 1:
        raise ValueError(f"multiline max_lines must be >= 1, got {max_lines}")
    if timeout_ms < 1:
        raise ValueError(f"multiline timeout_ms must be >= 1, got {timeout_ms}")
    _re.compile(pattern)  # driver-time validation, like compile_grok

    out_schema = (
        f"{key_col} string, event_idx bigint, event_text string, "
        "by_timeout boolean"
    )
    # pending: the open event (NULL = none); n_lines: lines in it (for the
    # max_lines cap); next_idx: the next event ordinal for this key
    state_schema = "pending string, n_lines int, next_idx bigint"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        rx = _re.compile(pattern)

        def cont(line: str) -> bool:
            m = bool(rx.search(line))
            return (not m) if negate else m

        out_idx: list[int] = []
        out_text: list[str] = []
        out_to: list[bool] = []

        if state.hasTimedOut:
            # no data for this key within timeout_ms → flush the pending
            pending, _, next_idx = state.get
            if pending is not None:
                out_idx.append(int(next_idx))
                out_text.append(pending)
                out_to.append(True)
            state.remove()
        else:
            if state.exists:
                pending, n_lines, next_idx = state.get
                n_lines, next_idx = int(n_lines), int(next_idx)
            else:
                pending, n_lines, next_idx = None, 0, 0

            def flush(text: str) -> None:
                nonlocal next_idx
                out_idx.append(next_idx)
                out_text.append(text)
                out_to.append(False)
                next_idx += 1

            chunks = [pdf for pdf in pdfs if len(pdf)]
            if chunks:
                batch = pd.concat(chunks, ignore_index=True).sort_values(
                    idx_col, kind="stable"
                )
                for line in batch[line_col].astype(str):
                    if match == "after":
                        if pending is not None and cont(line):
                            if max_lines is None or n_lines < max_lines:
                                pending += "\n" + line
                                n_lines += 1
                        else:
                            if pending is not None:
                                flush(pending)
                            pending, n_lines = line, 1
                    else:  # before: append, a FAILING line terminates
                        if pending is None:
                            pending, n_lines = line, 1
                        elif max_lines is None or n_lines < max_lines:
                            pending += "\n" + line
                            n_lines += 1
                        if not cont(line):
                            flush(pending)
                            pending, n_lines = None, 0
            if pending is not None:
                state.update((pending, n_lines, next_idx))
                state.setTimeoutDuration(timeout_ms)
            elif state.exists:
                state.update((None, 0, next_idx))
                state.setTimeoutDuration(timeout_ms)

        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out_idx),
                "event_idx": out_idx,
                "event_text": out_text,
                "by_timeout": out_to,
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def hourly_rates(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    max_hours: int | None = None,
) -> DataFrame:
    """Per-(key, hour) running event counts across micro-batches — the
    stateful substrate for LIVE burst detection: state holds each key's
    exact hour→count histogram, each micro-batch folds its rows in, and
    only the buckets the batch TOUCHED are re-emitted with their updated
    cumulative count. Counts per bucket are monotone, so the drained
    stream reduces to final counts with one max() per (key, hour), and
    scoring those with operators/aggregate.py::ewma_from_hourly yields
    float-identical results to the batch ewma_scores backfill — the
    stream and the backfill share the scoring expression, so no second
    EWMA implementation exists to drift.

    Output: (key, hour, n) — n is the bucket's cumulative count as of
    this micro-batch. State per key is its hour histogram: exact
    integers, bounded by hours of retention; ``max_hours`` evicts the
    OLDEST buckets beyond that many distinct hours (the streaming
    analogue of a watermark — stream≡backfill equality then holds as
    long as no event arrives for an evicted hour, i.e. out-of-orderness
    is bounded by the horizon, the standard watermark contract).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, hour timestamp, n bigint"
    state_schema = "hours array<bigint>, counts array<bigint>"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        batch: dict[int, int] = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            # datetime64 unit varies by pandas/Arrow version (ns vs us);
            # cast to seconds explicitly rather than assuming ns
            floored = (
                pdf[ts_col]
                .dt.floor("h")
                .astype("datetime64[s]")
                .astype("int64")
            )
            for h, c in floored.value_counts().items():
                batch[int(h)] = batch.get(int(h), 0) + int(c)
        if state.exists:
            hours, counts = state.get
            hist = dict(zip(hours, counts))
        else:
            hist = {}
        for h, c in batch.items():
            hist[h] = hist.get(h, 0) + c
        if max_hours is not None and len(hist) > max_hours:
            for h in sorted(hist)[: len(hist) - max_hours]:
                del hist[h]
        ordered = sorted(hist)
        state.update((ordered, [hist[h] for h in ordered]))
        touched = sorted(h for h in batch if h in hist)
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(touched),
                "hour": pd.to_datetime(touched, unit="s"),
                "n": [hist[h] for h in touched],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
