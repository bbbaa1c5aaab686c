"""Streaming sessionization — the streaming face of
operators/temporal.sessionize (gap-based sessions per key), as a custom
stateful operator over ``applyInPandasWithState``.

Semantics (matching the batch form): per key, events ordered by event time
belong to one session until a gap > ``gap_seconds`` appears; session ids are
1-based in time order. The stream emits one row per CLOSED session
(key, session_id, n_events, session_start, session_end):

* a session closes when a later event for the same key arrives past the
  gap (the closing event starts the next session), or
* on event-time timeout when a watermark is configured upstream — idle
  sessions flush once the watermark passes last_ts + gap.

State per key is one fixed-size tuple (session_id, start, last, n) —
bounded by key cardinality, not event count. In-order arrival per key is
assumed within the gap (micro-batches are sorted internally); an event
older than the current session's last timestamp joins that session without
reordering — the standard low-state streaming relaxation of the batch
operator, which tests pin explicitly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "key {kt}, session_id long, n_events long, "
    "session_start double, session_end double"
)
_STATE_SCHEMA = "session_id long, start double, last double, n long"


def streaming_sessionize(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    use_event_time_timeout: bool = False,
) -> DataFrame:
    """Closed gap-sessions per key. ``ts_col`` must be castable to double
    epoch seconds. With ``use_event_time_timeout`` (requires a watermark on
    the stream) idle sessions also flush via timeout."""
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = _OUT_SCHEMA.format(kt=key_type)
    gap = float(gap_seconds)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            sid, start, last, n = state.get
            # keep the session_id counter (remove() would restart numbering
            # at 1 for this key, emitting duplicate (key, session_id) rows);
            # start=None marks "no open session"
            state.update((sid, None, None, 0))
            if start is not None:
                yield pd.DataFrame(
                    [[key[0], sid, n, start, last]],
                    columns=["key", "session_id", "n_events", "session_start", "session_end"],
                )
            return
        sid, start, last, n = state.get if state.exists else (0, None, None, 0)
        closed: list[list] = []
        # a large group arrives as MULTIPLE Arrow chunks in arbitrary order:
        # gather the whole micro-batch before the single sort, or cross-chunk
        # out-of-order events get absorbed into the wrong session
        all_ts: list[float] = []
        for pdf in pdfs:
            all_ts.extend(float(t) for t in pdf[ts_col])
        for ts in sorted(all_ts):
            if start is None:
                sid, start, last, n = sid + 1, ts, ts, 1
            elif ts - last > gap:
                closed.append([key[0], sid, n, start, last])
                sid, start, last, n = sid + 1, ts, ts, 1
            else:
                last, n = max(last, ts), n + 1
        state.update((sid, start, last, n))
        if use_event_time_timeout and last is not None:
            state.setTimeoutTimestamp(int((last + gap) * 1000))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["key", "session_id", "n_events", "session_start", "session_end"],
            )

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if use_event_time_timeout
        else GroupStateTimeout.NoTimeout
    )
    # no .select(): a withWatermark column upstream must survive into the
    # stateful operator for EventTimeTimeout to fire
    return (
        stream
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
