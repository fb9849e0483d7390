"""Event-time streaming ops over the events schema
(event_id long, ts timestamp, user_id long, event_type string, value double).

Streaming twins of __spark_entry__.q_ev_tumbling_counts / q_ev_sessionize:
same aggregation logic, expressed with watermarks + event-time windows so late
data is handled. Tested with a rate/memory source feeding the same rows as the
batch parquet — outputs must converge to the batch results once the watermark
passes (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame) -> DataFrame:
    # watermarks require TIMESTAMP (tz-aware); parquet often carries NTZ
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-hour tumbling window per event_type with late-data watermark."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            (F.unix_timestamp(F.col("w.start")) / 3600).cast("long").alias("hour_bucket"),
            "event_type",
            "n_events",
            F.round(F.col("min_value").cast("double"), 6).alias("min_value"),
            F.round(F.col("max_value").cast("double"), 6).alias("max_value"),
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessions via the native session_window (stateful streaming
    analogue of the batch lag/cumsum sessionizer)."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def sessionize_capped_batch(
    events: DataFrame, gap_seconds: int = 1800, max_events: int = 5
) -> DataFrame:
    """Batch twin of :func:`sessionize_capped_stream`: gap-based sessions that
    ALSO close after ``max_events`` events. Native ``session_window`` cannot
    express the cap, so the batch form is lag/cumsum gap sessions followed by
    a row_number chunking inside each gap session — one shuffle on user_id,
    window + groupBy reuse the same partitioning.

    Output: (user_id, session_start, session_end, n_events, sum_value)."""
    from pyspark.sql import Window

    ev = _with_event_time(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact µs arithmetic: unix_timestamp truncates to seconds and would
    # disagree with the streaming kernel on sub-second gap boundaries
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    gid = F.sum(
        F.when(gap.isNull() | (gap > int(gap_seconds) * 1_000_000), 1).otherwise(0)
    ).over(w)
    rn = F.row_number().over(
        Window.partitionBy("user_id", "_gid").orderBy("ts", "event_id")
    )
    return (
        ev.withColumn("_gid", gid)
        .withColumn("_sub", ((rn - 1) / F.lit(int(max_events))).cast("long"))
        .groupBy("user_id", "_gid", "_sub")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .drop("_gid", "_sub")
    )


def _capped_session_fold(
    ts: "np.ndarray",
    val: "np.ndarray",
    carried: tuple | None,
    gap_us: int,
    cap: int,
) -> tuple[list[tuple[int, int, int, float]], tuple[int, int, int, float]]:
    """One micro-batch step of the capped sessionizer over ONE user's
    time-ordered events: ``ts`` epoch-µs int64 (nondecreasing), ``val``
    float64, ``carried`` = the open session from state as
    (start_us, last_us, n_events, sum_value) or None.

    Returns (closed, open): the sessions this batch CLOSES (in order —
    including the carried one when the batch's first event opens a new
    session by gap or cap) and the still-open last session.  An empty
    batch is the fold identity: ``([], carried)`` (open may be None iff
    the batch is empty and nothing was carried).

    Module-level (not a closure) so the fold law the streaming operator
    relies on — folding any split of a stream batch-by-batch yields exactly
    the single-pass :func:`sessionize_capped_batch` sessions — is
    property-testable without a SparkSession
    (tests/test_sessionize_kernel.py, hypothesis-driven).

    Fully vectorized: gap boundaries via diff, cap chunking via per-segment
    cumcount (the carried event count offsets the leading continuation run,
    so the cap keeps counting across micro-batches), per-session aggregates
    via bincount."""
    import numpy as np

    m = len(ts)
    if m == 0:
        # empty batch = the fold identity: nothing closes, the carried
        # session (possibly None) stays as-is.  The Spark caller never sends
        # empty groups, but the kernel is a documented module-level fold
        # step where an empty slice is a legal call (ADVICE r4).
        return [], (None if carried is None else tuple(carried))
    # gap boundaries: first row continues the open session iff within gap
    new_seg = np.empty(m, dtype=bool)
    new_seg[0] = carried is None or (ts[0] - carried[1]) > gap_us
    if m > 1:
        new_seg[1:] = np.diff(ts) > gap_us
    # position within each gap segment (leading continuation rows get the
    # carried event count as offset so the cap keeps counting across
    # micro-batches)
    idx = np.arange(m, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(new_seg, idx, -1))
    pos = idx - np.maximum(seg_start, 0)
    if carried is not None and not new_seg[0]:
        pos = pos + np.where(seg_start < 0, np.int64(carried[2]), 0)
    # composite session id: (gap segment, cap chunk) — nondecreasing
    sess_key = (np.cumsum(new_seg).astype(np.int64) << 32) + pos // cap
    b = np.empty(m, dtype=bool)
    b[0] = True
    if m > 1:
        b[1:] = sess_key[1:] != sess_key[:-1]
    sid = np.cumsum(b) - 1
    n_sess = int(sid[-1]) + 1
    cnt = np.bincount(sid, minlength=n_sess).astype(np.int64)
    sums = np.bincount(sid, weights=val, minlength=n_sess)
    starts = ts[b].copy()
    ends = ts[np.concatenate([np.flatnonzero(b)[1:] - 1, [m - 1]])]
    if carried is not None and not new_seg[0] and pos[0] // cap == 0:
        # session 0 continues the carried open session
        starts[0] = carried[0]
        cnt[0] += carried[2]
        sums[0] += carried[3]
        closed_carry: list[tuple[int, int, int, float]] = []
    elif carried is not None:
        # the carried session closed at the batch boundary (gap or cap)
        closed_carry = [tuple(carried)]
    else:
        closed_carry = []
    open_sess = (int(starts[-1]), int(ends[-1]), int(cnt[-1]), float(sums[-1]))
    closed = closed_carry + [
        (int(starts[i]), int(ends[i]), int(cnt[i]), float(sums[i]))
        for i in range(n_sess - 1)
    ]
    return closed, open_sess


def sessionize_capped_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    max_events: int = 5,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful streaming sessionizer via ``applyInPandasWithState``:
    gap-based sessions (like ``session_window``) that ADDITIONALLY close after
    ``max_events`` events — a policy the native operator cannot express, so
    this is the genuine custom-stateful-operator path (Arrow-batched, one
    state row per user, event-time timeout flushes idle sessions).

    Semantics (must match :func:`sessionize_capped_batch` exactly): events are
    processed per user in (ts, event_id) order; a new session opens when the
    gap since the previous event exceeds ``gap_seconds`` OR the open session
    already holds ``max_events`` events. Closed sessions are APPENDED as they
    close; the open session lives in state and is emitted when the event-time
    watermark passes its last event + gap (state is therefore bounded: one
    fixed-width row per active user, exactly the session_window state shape).

    Per-batch work is fully vectorized NumPy (no per-event Python loop): gap
    boundaries via diff, cap chunking via per-segment cumcount, per-session
    aggregates via bincount — the same kernel discipline as the pair scorer
    (BENCH/PAIR_STAGE.md). Requires in-order arrival per user within the
    watermark horizon (the standard caveat of custom stateful ops; the file/
    kafka replay paths used here deliver that).

    Output: (user_id, session_start, session_end, n_events, sum_value)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000
    cap = int(max_events)
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double"
    )
    # epoch-µs longs in state: fixed width, exact (the events table carries
    # µs precision), no tz ambiguity across the Arrow state boundary
    state_schema = "start_us long, last_us long, n long, sv double"

    def _emit(uid: int, rows: list[tuple[int, int, int, float]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": np.full(len(rows), uid, dtype=np.int64),
                "session_start": pd.to_datetime(
                    [r[0] for r in rows], unit="us"
                ),
                "session_end": pd.to_datetime([r[1] for r in rows], unit="us"),
                "n_events": np.array([r[2] for r in rows], dtype=np.int64),
                "sum_value": np.array(
                    [round(r[3], 6) for r in rows], dtype=np.float64
                ),
            }
        )

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            state.remove()
            yield _emit(uid, [(start_us, last_us, n, sv)])
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        order = np.lexsort(
            (rows["event_id"].to_numpy(), rows["ts"].to_numpy())
        )
        ts = (
            rows["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )[order]
        val = rows["value"].to_numpy(dtype=np.float64)[order]
        carried = state.get if state.exists else None
        closed, open_sess = _capped_session_fold(ts, val, carried, gap_us, cap)
        state.update(open_sess)
        # event-time timeout: flush the open session once the watermark
        # passes its gap horizon (clamped above the current watermark, which
        # Spark requires)
        state.setTimeoutTimestamp(
            max((open_sess[1] + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield _emit(uid, closed)

    return (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup: drop events whose event_id was already seen
    within the watermark horizon — the streaming twin of the batch
    dedup_keep_first / OnlyOnceDataset contract (state is bounded by the
    watermark, so this runs forever on an unbounded stream; at-least-once
    sources become effectively-once downstream)."""
    return (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
