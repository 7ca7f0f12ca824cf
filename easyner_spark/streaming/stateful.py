"""Custom stateful streaming operators via applyInPandasWithState.

Reference analog: none (the reference is batch-only); mandated by the
target brief's streaming surface ("applyInPandasWithState for custom
stateful operators"). Two operators:

* :func:`sessionized_user_stats` — per-user event sessionization with
  a gap timeout: state carries (session_count, last_event_us,
  event_count); a session closes when the gap exceeds ``gap``
  seconds OR the state times out (ProcessingTimeTimeout), at which
  point a summary row is emitted. This is the streaming twin of the
  batch lag/cumsum sessionization (queries.events_sessionize).
* :func:`first_seen_filter` — stateful exactly-once-per-key emission
  (streaming dedup with explicit state, the unbounded-state-free
  alternative to dropDuplicates for keys that must never re-emit
  within the state TTL).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionized_user_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int = 30_000,
) -> DataFrame:
    """events(user_id, ts, event_id, ...) stream → closed-session rows
    (user_id, n_events, start_us, end_us).

    State per user: [start_us, last_us, n_events]. Events are processed
    in event-time order within each micro-batch; a gap > gap_seconds
    closes the current session and emits it. On timeout the open
    session is flushed.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield pd.DataFrame(
                    [
                        {
                            "user_id": user_id,
                            "n_events": int(n),
                            "start_us": int(start_us),
                            "end_us": int(last_us),
                        }
                    ]
                )
            return
        closed = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        # a group may arrive as SEVERAL Arrow chunks — buffer all
        # timestamps and sort ONCE across chunks, otherwise a later
        # chunk holding earlier events regresses last_us and corrupts
        # session boundaries
        all_us: list[int] = []
        for pdf in pdfs:
            if pdf["ts"].dtype.kind == "M":
                all_us.extend((pdf["ts"].astype("int64") // 1000).tolist())
            else:
                all_us.extend(pdf["ts"].tolist())
        for t in sorted(all_us):
            if last_us is not None and t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, n = t, 0
            if start_us is None:
                start_us = t
            last_us = t
            n += 1
        if start_us is None:
            return  # no events and no prior state
        state.update((int(start_us), int(last_us), int(n)))
        state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_events": int(cn),
                        "start_us": int(cs),
                        "end_us": int(cl),
                    }
                    for cs, cl, cn in closed
                ]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id bigint, n_events int, start_us bigint, end_us bigint",
        stateStructType="start_us bigint, last_us bigint, n int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def first_seen_filter(stream: DataFrame, key_col: str = "url") -> DataFrame:
    """Stateful first-seen dedup: emit a key's row only the FIRST time
    it is observed; later occurrences are swallowed while state lives.
    State is one boolean per key (bounded by distinct keys in the TTL
    window — contrast dropDuplicates, whose state Spark manages only
    under a watermark)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = not state.exists
        rows = []
        for pdf in pdfs:
            if first and len(pdf) > 0:
                rows.append(pdf.iloc[[0]][[key_col]])
                first = False
        state.update((True,))
        state.setTimeoutDuration(3_600_000)
        for r in rows:
            yield r

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
