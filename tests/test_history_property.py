"""Property-based tests for operators/history.py: whatever the event log,
SCD2 intervals must tile each key's timeline and transitions must conserve
counts."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_data_counter_spark.operators import history as HS

_BASE = dt.datetime(2021, 12, 1)

# small alphabets force state repeats and timestamp ties — the interesting
# cases for run-collapse and deterministic ordering
_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # user
        st.integers(min_value=0, max_value=20),       # minute (ties likely)
        st.sampled_from(["a", "b", "c"]),             # state
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, evs):
    rows = [
        (i, u, _BASE + dt.timedelta(minutes=m), s) for i, (u, m, s) in enumerate(evs)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


@settings(max_examples=12, deadline=None)
@given(_events)
def test_scd2_intervals_tile_each_timeline(spark, evs):
    out = HS.scd2_intervals(_df(spark, evs)).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    assert set(by_key) == {u for u, _, _ in evs}
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from)
        # exactly one open (current) interval per key, and it is the last
        assert [r.is_current for r in rows] == [False] * (len(rows) - 1) + [True]
        assert rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from  # no gaps, no overlaps
            assert a.state != b.state          # runs are collapsed


@settings(max_examples=12, deadline=None)
@given(_events)
def test_transition_counts_conserve_events(spark, evs):
    out = HS.transition_counts(_df(spark, evs)).collect()
    per_user = {}
    for u, _, _ in evs:
        per_user[u] = per_user.get(u, 0) + 1
    # total transitions = sum over users of (n_events - 1)
    assert sum(r.n for r in out) == sum(n - 1 for n in per_user.values())
    # probabilities within a source state sum to 1 (rounded)
    by_from: dict[str, float] = {}
    for r in out:
        by_from[r.from_state] = by_from.get(r.from_state, 0.0) + r.p
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-4
