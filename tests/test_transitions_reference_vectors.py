"""Third-engine pin for the Markov transition matrix (VERDICT r8 task 3
model).

transition_counts' Spark/DuckDB twins share the lead()-over-(ts, order)
mental model; this file pins the operator against a structurally
INDEPENDENT sequential reimplementation — per-key event lists walked with
a plain zip(seq, seq[1:]) — on randomized event streams with timestamp
ties, plus hand-derived vectors.

Falsifier: ordering by timestamp ONLY (dropping the order_col tie-break —
the one free semantic choice) produces a different matrix on a crafted
same-timestamp vector; the probability denominator choice (row-normalized
by FROM state vs matrix-normalized by total transitions) is a second
discriminated variant.
"""

from __future__ import annotations

import collections
import random

from kinesis_data_counter_spark.operators.history import transition_counts


def _matrix_loop(events, tie_break=True, row_normalized=True):
    """events = [(user, state, ts, order)] → {(from, to): (n, p)}."""
    by_user = collections.defaultdict(list)
    for u, s, ts, o in events:
        by_user[u].append((ts, o if tie_break else 0, s))
    counts = collections.Counter()
    for seq in by_user.values():
        states = [s for _, _, s in sorted(seq)]
        for a, b in zip(states, states[1:]):
            counts[(a, b)] += 1
    from_tot = collections.Counter()
    for (a, _), n in counts.items():
        from_tot[a] += n
    total = sum(counts.values())
    return {
        k: (n, round(n / (from_tot[k[0]] if row_normalized else total), 6))
        for k, n in counts.items()
    }


def _spark_matrix(spark, events):
    import datetime

    utc = datetime.timezone.utc
    rows = [
        (u, s, datetime.datetime.fromtimestamp(ts, tz=utc), o)
        for u, s, ts, o in events
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp, event_id long"
    )
    got = transition_counts(df).collect()
    return {(r["from_state"], r["to_state"]): (r["n"], r["p"]) for r in got}


def _random_events(seed, n_users=10, with_ties=True):
    rng = random.Random(seed)
    states = ["view", "click", "purchase", "error"]
    events, eid = [], 0
    for u in range(n_users):
        t = rng.randrange(0, 1000)
        for _ in range(rng.randrange(2, 30)):
            events.append(("u%d" % u, rng.choice(states), t, eid))
            eid += 1
            # ties: sometimes the next event shares the timestamp
            if not (with_ties and rng.random() < 0.3):
                t += rng.randrange(1, 50)
    return events


def test_random_streams_match_sequential_loop(spark):
    events = _random_events(51)
    assert _spark_matrix(spark, events) == _matrix_loop(events)


def test_hand_derived_vector():
    events = [
        ("a", "view", 1, 0), ("a", "click", 2, 1), ("a", "view", 3, 2),
        ("a", "click", 4, 3),
        ("b", "view", 1, 4), ("b", "view", 2, 5),
    ]
    # transitions: a: v->c, c->v, v->c ; b: v->v
    assert _matrix_loop(events) == {
        ("view", "click"): (2, round(2 / 3, 6)),
        ("click", "view"): (1, 1.0),
        ("view", "view"): (1, round(1 / 3, 6)),
    }


def test_falsifier_dropping_tiebreak_differs(spark):
    # two same-timestamp events whose event_id order INVERTS their input
    # order: with the tie-break the sequence is view -> purchase(eid 3) ->
    # click(eid 5) = pairs {(v,p),(p,c)}; a ts-only sort that falls back
    # to input order sees view -> click -> purchase = {(v,c),(c,p)} — a
    # disjoint pair set, so an unstable window sort would surface here.
    events = [
        ("a", "view", 1, 0), ("a", "click", 2, 5), ("a", "purchase", 2, 3),
    ]
    with_tb = _matrix_loop(events, tie_break=True)
    input_order = _matrix_loop(events, tie_break=False)  # stable ts-only
    assert with_tb == {("view", "purchase"): (1, 1.0),
                       ("purchase", "click"): (1, 1.0)}
    assert input_order == {("view", "click"): (1, 1.0),
                           ("click", "purchase"): (1, 1.0)}
    assert with_tb != input_order  # the vector genuinely discriminates
    got = _spark_matrix(spark, events)
    assert got == with_tb
    # ...and the Spark result is input-permutation-INVARIANT because of
    # the tie-break, unlike the tieless sort
    permuted = [events[0], events[2], events[1]]
    assert _spark_matrix(spark, permuted) == with_tb


def test_falsifier_matrix_normalization_differs():
    events = [
        ("a", "view", 1, 0), ("a", "click", 2, 1), ("a", "view", 3, 2),
        ("a", "click", 4, 3),
        ("b", "view", 1, 4), ("b", "view", 2, 5),
    ]
    row = _matrix_loop(events, row_normalized=True)
    mat = _matrix_loop(events, row_normalized=False)
    assert row != mat  # p differs: 2/3 vs 2/4 for (view, click)
    assert row[("view", "click")][1] == round(2 / 3, 6)
    assert mat[("view", "click")][1] == 0.5
