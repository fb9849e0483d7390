"""Property tests for the capped-sessionizer kernel (streaming/events.py).

The streaming operator's correctness rests on a FOLD LAW: processing a
user's event stream in ANY partition into micro-batches — carrying the open
session through state — must close exactly the sessions a single pass over
the whole stream closes (sessionize_capped_batch's semantics: gap-based
sessions that also close after ``cap`` events). The existing Spark tests
exercise one split point; hypothesis drives the kernel itself through
random streams, random split points, and adversarial gap/cap boundaries
(gap-equal deltas, ties, carried-session-exactly-at-cap) with no
SparkSession in the loop.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mel_spark.streaming.events import _capped_session_fold


def _reference(events: list[tuple[int, float]], gap_us: int, cap: int):
    """Single-pass per-event oracle: close on gap exceeded OR cap reached.
    Returns (closed_sessions, open_session), each (start, end, n, sum)."""
    closed: list[tuple[int, int, int, float]] = []
    cur: list | None = None
    for t, v in events:
        if cur is not None and ((t - cur[1]) > gap_us or cur[2] >= cap):
            closed.append(tuple(cur))
            cur = None
        if cur is None:
            cur = [t, t, 1, v]
        else:
            cur[1] = t
            cur[2] += 1
            cur[3] += v
    return closed, tuple(cur)


# deltas in the same order of magnitude as the gap so boundary cases
# (delta == gap, delta == gap ± 1, ties) occur constantly; values are
# multiples of 0.25 so every partial float sum is exact and the fold can be
# compared with == rather than tolerances
_streams = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12), st.integers(-40, 40)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(
    stream=_streams,
    gap_us=st.integers(min_value=0, max_value=8),
    cap=st.integers(min_value=1, max_value=5),
    data=st.data(),
)
def test_fold_law_random_splits(stream, gap_us, cap, data):
    ts = np.cumsum([d for d, _ in stream]).astype(np.int64)
    val = np.array([k * 0.25 for _, k in stream], dtype=np.float64)
    events = list(zip(ts.tolist(), val.tolist()))
    ref_closed, ref_open = _reference(events, gap_us, cap)

    n = len(events)
    n_cuts = data.draw(st.integers(min_value=0, max_value=min(6, n - 1)))
    # NOT unique: duplicate cuts produce EMPTY micro-batches, which must be
    # the fold identity (ADVICE r4 — the m == 0 path)
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(1, n - 1),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
        if n > 1
        else []
    )
    bounds = [0, *cuts, n]

    carried = None
    folded: list[tuple[int, int, int, float]] = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        closed, carried = _capped_session_fold(
            ts[lo:hi], val[lo:hi], carried, gap_us, cap
        )
        folded.extend(closed)

    assert folded == ref_closed
    assert carried == ref_open


@settings(max_examples=100, deadline=None)
@given(stream=_streams, gap_us=st.integers(0, 8), cap=st.integers(1, 5))
def test_single_batch_matches_reference(stream, gap_us, cap):
    ts = np.cumsum([d for d, _ in stream]).astype(np.int64)
    val = np.array([k * 0.25 for _, k in stream], dtype=np.float64)
    ref_closed, ref_open = _reference(
        list(zip(ts.tolist(), val.tolist())), gap_us, cap
    )
    closed, open_sess = _capped_session_fold(ts, val, None, gap_us, cap)
    assert closed == ref_closed
    assert open_sess == ref_open


def test_empty_batch_is_fold_identity():
    """An empty slice closes nothing and passes the carried session (or its
    absence) through unchanged (ADVICE r4)."""
    empty_ts = np.array([], dtype=np.int64)
    empty_val = np.array([], dtype=np.float64)
    assert _capped_session_fold(empty_ts, empty_val, None, 10, 3) == ([], None)
    carried = (0, 2, 3, 3.0)
    assert _capped_session_fold(empty_ts, empty_val, carried, 10, 3) == (
        [],
        carried,
    )


def test_carried_session_exactly_at_cap_closes_on_next_in_gap_event():
    """A carried open session holding exactly ``cap`` events must close when
    the next event arrives WITHIN the gap (cap boundary, not gap boundary) —
    the subtlest branch of the carry logic."""
    closed, carried = _capped_session_fold(
        np.array([0, 1, 2], dtype=np.int64),
        np.array([1.0, 1.0, 1.0]),
        None,
        gap_us=10,
        cap=3,
    )
    assert closed == [] and carried == (0, 2, 3, 3.0)
    closed, carried = _capped_session_fold(
        np.array([3], dtype=np.int64),
        np.array([5.0]),
        carried,
        gap_us=10,
        cap=3,
    )
    assert closed == [(0, 2, 3, 3.0)]
    assert carried == (3, 3, 1, 5.0)
