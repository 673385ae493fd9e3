"""Third-engine pin for SCD2 run-collapse (VERDICT r9 task 3).

``history.scd2_intervals`` turns an event log into type-2 validity
intervals. Its Spark/DuckDB twins (scd2_user_state) share one mental
model; this file pins the two free semantic choices against hand-derived
vectors and an independent loop reimplementation:

1. RUN COLLAPSE: consecutive same-state events merge into ONE interval
   (an event that repeats the current state extends it, never splits it).
2. TIE-BREAK: equal timestamps order by the sequence column (event_id)
   ASCENDING — the Kinesis sequence-number role; the LAST event of a tie
   group is the one whose state survives as of that instant.

Worked example (key u1, ts in epoch-millis for readability):

    (ts=1000, id=1, A)            -> run A starts at 1000
    (ts=2000, id=2, A)            -> same state: still run A
    (ts=3000, id=3, B)            -> run A closes at 3000; run B starts
    (ts=3000, id=4, A)            -> SAME ts, higher id: run B closes at
                                     3000 (zero-length), run A2 starts
    (ts=5000, id=5, A)            -> still run A2

    expected intervals:
      (u1, A, 1000, 3000, false)
      (u1, B, 3000, 3000, false)   -- zero-length, superseded in-tie
      (u1, A, 3000, NULL, true)

Falsifiers: (a) a DESCENDING tie-break yields a different interval set on
the tie group (A closes, B becomes current); (b) a no-collapse variant
(one interval per event) yields 5 rows instead of 3. Both are asserted to
differ, proving the differential discriminates.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

from kinesis_data_counter_spark.operators.history import scd2_intervals


def _ms(ms: int) -> datetime:
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(tzinfo=None)


def scd2_loop(events, tie="asc", collapse=True):
    """Independent reimplementation: plain sorted loop, no Spark.

    events: list of (key, ts_ms, event_id, state). Returns a sorted list
    of (key, state, valid_from, valid_to, is_current).
    """
    out = []
    bykey = {}
    for k, ts, eid, st in events:
        bykey.setdefault(k, []).append((ts, eid, st))
    for k, evs in bykey.items():
        evs.sort(key=lambda e: (e[0], e[1] if tie == "asc" else -e[1]))
        runs = []
        for ts, eid, st in evs:
            if collapse and runs and runs[-1][1] == st:
                continue
            runs.append((ts, st))
        for i, (ts, st) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            out.append((k, st, ts, nxt, nxt is None))
    return sorted(out, key=lambda r: (r[0], r[2], str(r[1])))


WORKED = [
    ("u1", 1000, 1, "A"),
    ("u1", 2000, 2, "A"),
    ("u1", 3000, 3, "B"),
    ("u1", 3000, 4, "A"),
    ("u1", 5000, 5, "A"),
]
WORKED_EXPECTED = [
    ("u1", "A", 1000, 3000, False),
    ("u1", "A", 3000, None, True),
    ("u1", "B", 3000, 3000, False),
]


def _spark_scd2(spark, events):
    df = spark.createDataFrame(
        [(k, _ms(ts), eid, st) for k, ts, eid, st in events],
        "user_id string, ts timestamp, event_id long, event_type string",
    )
    rows = scd2_intervals(df).collect()
    return sorted(
        (
            (r["key"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in rows
        ),
        key=lambda r: (r[0], r[2], str(r[1])),
    )


def test_worked_example_hand_derived(spark):
    assert _spark_scd2(spark, WORKED) == WORKED_EXPECTED


def test_worked_example_independent_loop():
    assert scd2_loop(WORKED) == WORKED_EXPECTED


def test_random_logs_match_independent_loop(spark):
    rng = random.Random(1007)
    events = []
    eid = 0
    for k in ("a", "b", "c"):
        for _ in range(rng.randrange(5, 25)):
            eid += 1
            # coarse ts grid forces plenty of ties; 3 states force runs
            events.append(
                (k, rng.randrange(1, 8) * 1000, eid, rng.choice("XYZ"))
            )
    assert _spark_scd2(spark, events) == scd2_loop(events)


def test_falsifier_desc_tiebreak_differs():
    got_asc = scd2_loop(WORKED, tie="asc")
    got_desc = scd2_loop(WORKED, tie="desc")
    assert got_asc != got_desc
    # desc orders the tie group (id4 A, id3 B): run A from 1000 extends
    # through the tie's A, then B becomes and STAYS current until ts=5000
    # reasserts A — the current-state flag lands on a different run
    cur_asc = [r for r in got_asc if r[4]]
    cur_desc = [r for r in got_desc if r[4]]
    assert cur_asc != cur_desc or got_asc != got_desc


def test_falsifier_no_collapse_differs():
    got = scd2_loop(WORKED, collapse=False)
    assert len(got) == 5  # one interval per event
    assert len(scd2_loop(WORKED)) == 3
