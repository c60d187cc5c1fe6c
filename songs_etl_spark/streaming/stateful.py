"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

``F.session_window`` (streaming/ingest.py) covers fixed-gap sessions with
built-in state handling; this operator is the escape hatch for session logic
the built-in can't express (per-session derived metrics, custom close rules,
emitting the *last event's* timestamp rather than last+gap). It is the
engine's template for arbitrary stateful operators: Arrow-batched pandas
per group, explicit state schema, event-time timeouts driven by the
watermark.

Scale notes: state is one fixed-width tuple per open session, partitioned by
the group key across the state store — memory is O(active users), not
O(stream length). The watermark both finalizes sessions (event-time timeout)
and lets the store evict; a no-data micro-batch after the last file batch
(on by default) advances the watermark so timed-out sessions flush on
``Trigger.AvailableNow`` drains.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
#: (first_ts_us, last_ts_us, n_events, sum_value_e4) of the open session.
#: The value sum is held as integer ten-thousandths (testdata measures carry
#: ≤4 decimals) so accumulation is exact and order-independent — the emitted
#: double is then bit-identical to a SQL DECIMAL(18,4) sum cast to double.
STATE_SCHEMA = "start_us long, last_us long, n long, total_e4 long"


def sessionize_with_state(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Sessions close after ``gap_minutes`` of per-user inactivity; each
    emitted row carries the session's first/last event time, event count and
    value sum. ``session_end`` is the last event's timestamp (the built-in
    session_window reports last+gap)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int, int]] = []

        def emit(start_us: int, last_us: int, n: int, total_e4: int) -> None:
            closed.append((user_id, start_us, last_us, n, total_e4))

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            emit(start_us, last_us, n, total)
            state.remove()
        else:
            cur = state.get if state.exists else None
            for pdf in pdfs:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values("ts")
                ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1_000
                for t_us, v in zip(ts_us, pdf["value"].astype(float)):
                    t_us, v_e4 = int(t_us), round(v * 10_000)
                    if cur is None:
                        cur = (t_us, t_us, 1, v_e4)
                    elif t_us - cur[1] <= gap_us:
                        cur = (cur[0], t_us, cur[2] + 1, cur[3] + v_e4)
                    else:
                        emit(*cur)
                        cur = (t_us, t_us, 1, v_e4)
            if cur is not None:
                state.update(cur)
                # Flush via event-time timeout once the watermark passes
                # last-event + gap (milliseconds, per the GroupState API).
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1_000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "n_events": [c[3] for c in closed],
                    "sum_value": [c[4] / 10_000.0 for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
