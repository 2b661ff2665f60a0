"""Custom stateful streaming operator (SURVEY §2.10 / task brief:
`applyInPandasWithState` for operators Spark lacks): event-time
gap-timeout SESSIONIZATION.

Semantics match the batch rel_sessionize catalog entry (lag -> gap >
1800 s -> new session): a user's events within `gap_sec` of each other
form one session; a session CLOSES either inline (a later event
arrives past the gap — emitted immediately) or via EVENT-TIME TIMEOUT
(the watermark passes last_event + gap with no new events — the state
store emits and clears it). Output rows are (user_id, sess_start,
sess_end, n_events) with epoch-second bounds.

Scale shape: state is one tiny tuple per ACTIVE user (bounded by the
gap horizon x active-key cardinality, not corpus size); the state
store shuffles by user_id only once; per-trigger work is Arrow-batched
pandas over each updated key group. The same operator serves a Kafka
source unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = "user_id long, sess_start long, sess_end long, n_events long"
STATE_SCHEMA = "sess_start long, sess_end long, n_events long"


def sessionize_stream(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """events: streaming DF with (user_id long, ts timestamp<LTZ>).
    Returns the append-mode stream of CLOSED sessions."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        import pandas as pd

        uid = int(key[0])
        closed: list[tuple[int, int, int, int]] = []
        if state.hasTimedOut:
            s, e, n = state.get
            closed.append((uid, int(s), int(e), int(n)))
            state.remove()
        else:
            ts: list[int] = []
            for pdf in pdf_iter:
                ts.extend(
                    (pdf["ts"].astype("datetime64[ns]").astype("int64") // 10**9)
                    .tolist()
                )
            ts.sort()
            cur = tuple(state.get) if state.exists else None
            for t in ts:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_sec:
                    closed.append((uid, int(cur[0]), int(cur[1]), int(cur[2])))
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], t, cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # fires once the event-time watermark passes the gap
                state.setTimeoutTimestamp((int(cur[1]) + gap_sec) * 1000)
        yield pd.DataFrame(
            closed, columns=["user_id", "sess_start", "sess_end", "n_events"]
        )

    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
