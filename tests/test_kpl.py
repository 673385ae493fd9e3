"""KPL deaggregation tests (SURVEY.md §2 S3): codec round trip + Spark plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_data_counter_spark.sources.kpl import (
    KPL_MAGIC,
    aggregate_records,
    deaggregate,
    deaggregate_blob,
)


def test_roundtrip_preserves_records_and_keys():
    items = [("pk-a", b'{"x":1}'), ("pk-b", b""), ("pk-a", b"\x00\xffbin")]
    assert deaggregate_blob(aggregate_records(items)) == items


def test_non_kpl_payload_passes_through():
    raw = b'{"plain": "record"}'
    assert deaggregate_blob(raw) == [(None, raw)]
    assert deaggregate_blob(b"") == [(None, b"")]


def test_corrupt_checksum_passes_through_whole():
    blob = aggregate_records([("pk", b"data")])
    bad = blob[:-1] + bytes([blob[-1] ^ 0xFF])
    assert deaggregate_blob(bad) == [(None, bad)]


def test_truncated_protobuf_passes_through():
    bad = KPL_MAGIC + b"\x1a\xff"  # claims a huge field, then ends
    assert deaggregate_blob(bad) == [(None, bad)]


def test_spark_deaggregate_fans_out(spark):
    blob1 = aggregate_records([("k1", b"r1"), ("k2", b"r2"), ("k1", b"r3")])
    blob2 = aggregate_records([("k3", b"r4")])
    plain = b"not-aggregated"
    df = spark.createDataFrame(
        [("s1", blob1), ("s2", blob2), ("s3", plain)], "shard string, data binary"
    )
    out = deaggregate(df, "data", keep_cols=("shard",)).collect()
    assert len(out) == 5
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append((r.partition_key, bytes(r.data)))
    assert by_shard["s1"] == [("k1", b"r1"), ("k2", b"r2"), ("k1", b"r3")]
    assert by_shard["s2"] == [("k3", b"r4")]
    assert by_shard["s3"] == [(None, plain)]


def test_deaggregate_fixture_roundtrip_counts(spark, sf_dir):
    # pack events.props into KPL aggregates, unpack, reconcile counts
    import pandas as pd

    ev = __import__(
        "kinesis_data_counter_spark.session", fromlist=["load_tables"]
    ).load_tables(spark, sf_dir, ("events",))["events"]
    src = ev.select(
        F.col("user_id").cast("string").alias("pk"),
        F.encode("props", "UTF-8").alias("payload"),
        (F.col("event_id") % 10).alias("g"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        items = list(zip(pdf["pk"], (bytes(b) for b in pdf["payload"])))
        return pd.DataFrame({"data": [aggregate_records(items)]})

    blobs = src.groupBy("g").applyInPandas(_pack, "data binary")
    recs = deaggregate(blobs, "data")
    n_events = ev.count()
    assert recs.count() == n_events
    assert recs.filter(F.col("partition_key").isNull()).count() == 0


def test_roundtrip_property():
    # property-based: any (printable-key, bytes) list survives the round trip
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x10FF), max_size=40
    )
    items = st.lists(st.tuples(keys, st.binary(max_size=200)), max_size=30)

    @settings(max_examples=200, deadline=None)
    @given(items)
    def check(xs):
        # an empty aggregate is a valid blob containing zero user records
        assert deaggregate_blob(aggregate_records(xs)) == xs

    check()
