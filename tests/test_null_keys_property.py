"""NULL-key property tests (VERDICT r3 item 6): randomized rows with NULL
user_id / doc_id / lang / value columns pushed through the operators whose
semantics around NULLs carry correctness contracts —

- counter F2 skip semantics: ``target_column=<key>`` counts only rows
  where the key is present and non-null (counter.go:273-277), and distinct
  mode likewise skips nil values (counter.go:307-313);
- GDPR erasure audit: NULL-subject rows can never match a request (join
  equality is NULL-safe by construction) and must always be retained,
  with the audit identity retained ≡ total − purged intact; NULLs in the
  REQUEST set must purge nothing;
- stratified sampling: NULL ids hash to NULL and are dropped by the
  predicate in BOTH engines (Spark filter and the ANSI-SQL twin), NULL
  strata fall through to the default rate;
- segment dedup: NULL/empty texts contribute zero chunks but still
  produce an output row, and chunk conservation holds for the rest.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_BASE = dt.datetime(2021, 12, 1, 11, 19)

# (minute, user_id|None, value|None) — small alphabets force collisions,
# None injects the NULL paths
_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.one_of(st.none(), st.integers(min_value=1, max_value=5)),
        st.one_of(st.none(), st.sampled_from(["a", "b", ""])),
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows):
    data = [
        (i, _BASE + dt.timedelta(minutes=m), u, v)
        for i, (m, u, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, v string"
    )


@settings(max_examples=10, deadline=None)
@given(_rows)
def test_counter_target_column_skips_null_rows(spark, rows):
    from kinesis_data_counter_spark.config import CounterSpec
    from kinesis_data_counter_spark.operators.counter import build_counter

    spec = CounterSpec(
        id="c", counter_type="count", target_column="v", window="1 minute",
        input_stream_arn="arn:aws:kinesis:us-east-1:1:stream/events",
    ).validate()
    got = {
        r["window_start"]: r["value"]
        for r in build_counter(_df(spark, rows), spec).collect()
    }
    want: dict[int, int] = {}
    for m, _u, v in rows:
        if v is None:  # F2: absent/nil values never count (counter.go:273-277)
            continue
        ws = int((_BASE + dt.timedelta(minutes=m)).timestamp() * 1000)
        want[ws] = want.get(ws, 0) + 1
    # windows whose rows are ALL null-valued still emit a 0 row (the window
    # itself was observed); pure-null windows beyond that cannot appear
    for ws, n in want.items():
        assert got[ws] == n
    for ws, n in got.items():
        assert want.get(ws, 0) == n


@settings(max_examples=10, deadline=None)
@given(_rows)
def test_counter_distinct_skips_null_values(spark, rows):
    from kinesis_data_counter_spark.config import CounterSpec
    from kinesis_data_counter_spark.operators.counter import build_counter

    spec = CounterSpec(
        id="d", counter_type="approx_count_distinct", target_column="user_id",
        window="1 minute",
        input_stream_arn="arn:aws:kinesis:us-east-1:1:stream/events",
    ).validate()
    got = {
        r["window_start"]: r["value"]
        for r in build_counter(_df(spark, rows), spec).collect()
    }
    want: dict[int, set] = {}
    for m, u, _v in rows:
        ws = int((_BASE + dt.timedelta(minutes=m)).timestamp() * 1000)
        s = want.setdefault(ws, set())
        if u is not None:  # nil skipped in distinct mode too (counter.go:307-313)
            s.add(u)
    assert set(got) == set(want)
    for ws, s in want.items():
        # ≤5 distinct values: HLL++ at the engine's precision is exact here
        assert got[ws] == len(s), (ws, s)


_subject_rows = st.lists(
    st.one_of(st.none(), st.integers(min_value=1, max_value=6)),
    min_size=1,
    max_size=30,
)
_requests = st.lists(
    st.one_of(st.none(), st.integers(min_value=1, max_value=8)),
    min_size=0,
    max_size=5,
)


@settings(max_examples=10, deadline=None)
@given(_subject_rows, _requests)
def test_erasure_audit_null_subjects_always_retained(spark, subjects, requests):
    from kinesis_data_counter_spark.operators.corpus import erase_subjects

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(subjects)], "row_id long, user_id long"
    )
    req = spark.createDataFrame(
        [(r,) for r in requests] or [(None,)], "user_id long"
    )
    if not requests:
        req = req.filter(F.lit(False))
    retained, audit = erase_subjects(df, req, "user_id", "t")
    kept = [(r["row_id"], r["user_id"]) for r in retained.collect()]
    a = audit.collect()[0]

    req_set = {r for r in requests if r is not None}
    want_kept = [
        (i, s) for i, s in enumerate(subjects) if s is None or s not in req_set
    ]
    # NULL subjects never match any request (even a NULL request row) and
    # NULL requests purge nothing
    assert sorted(kept) == sorted(want_kept)
    assert a["n_total"] == len(subjects)
    assert a["n_retained"] == len(want_kept)
    assert a["n_purged"] == len(subjects) - len(want_kept)
    assert a["n_total"] == a["n_purged"] + a["n_retained"]  # NULL-safe identity
    assert a["n_subjects_hit"] == len(
        {s for s in subjects if s is not None and s in req_set}
    )


_strat_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
        st.one_of(st.none(), st.sampled_from(["en", "de", "fr"])),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(_strat_rows)
def test_stratified_keep_null_keys_match_sql_twin(spark, rows):
    import duckdb

    from kinesis_data_counter_spark.operators.sampling import (
        stratified_keep,
        stratified_sql_predicate,
    )

    rates = {"en": 0.5, "de": 1.0}
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = (
        df.filter(
            stratified_keep(F.col("doc_id"), F.col("lang"), rates, default_rate=0.25)
        )
        .collect()
    )
    # hypothesis can emit duplicate doc_ids with mixed None/str langs, so
    # the comparison key must be None-safe
    key = lambda t: (t[0] if t[0] is not None else -1, t[1] or "")  # noqa: E731
    got = sorted(((r["doc_id"], r["lang"]) for r in kept), key=key)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(rows))
    pred = stratified_sql_predicate("doc_id", "lang", rates, default_rate=0.25)
    want = sorted(
        ((r[0], r[1])
         for r in con.execute(f"SELECT doc_id, lang FROM t WHERE {pred}").fetchall()),
        key=key,
    )
    # engine parity INCLUDING the null paths: NULL doc_id hashes to NULL →
    # dropped by both; NULL lang falls to the default rate in both
    assert got == want
    assert all(d is not None for d, _l in got)


def test_split_column_null_ids_get_null_label_on_both_engines(spark):
    import duckdb

    from kinesis_data_counter_spark.operators.sampling import (
        hash_split,
        split_sql_case,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(20)] + [(None,)], "doc_id long"
    )
    got = {
        r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in range(20)] + [(None,)])
    case = split_sql_case("doc_id")
    want = dict(con.execute(f"SELECT doc_id, {case} FROM t").fetchall())
    assert got == want
    assert got[None] is None  # NULL key → NULL label, never a real split


_seg_docs = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
        ).map(" ".join),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(_seg_docs)
def test_segment_dedup_null_and_empty_texts(spark, texts):
    from kinesis_data_counter_spark.operators.corpus import segment_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in segment_dedup(df, chunk_words=3).collect()}
    # one output row per input doc, including NULL/empty texts
    assert set(out) == set(range(len(texts)))
    total = 0
    for i, t in enumerate(texts):
        r = out[i]
        assert r["n_kept"] + r["n_dropped"] >= 0
        if not t:  # None or "" → zero chunks, empty reassembly
            assert (r["text_out"], r["n_kept"], r["n_dropped"]) == ("", 0, 0)
        else:
            total += math.ceil(len(t.split(" ")) / 3)
    assert total == sum(out[i]["n_kept"] + out[i]["n_dropped"] for i in out)
    # global uniqueness of kept chunks survives the null injection
    kept_chunks = []
    for r in out.values():
        if not r["text_out"]:
            continue
        w = r["text_out"].split(" ")
        kept_chunks.extend(" ".join(w[j : j + 3]) for j in range(0, len(w), 3))
    assert len(kept_chunks) == len(set(kept_chunks))
