"""Multimodal binary-column plumbing: media_features and frame sampling.

The decode step is stubbed (no codecs in this container) — these tests pin
the Spark-side contract that IS real: mapInPandas schema, Arrow binary
transfer, one-to-many fan-out shape, and chunk-boundary arithmetic.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_data_counter_spark.operators import multimodal as MM

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _payloads(spark, rows):
    return spark.createDataFrame(rows, PAYLOAD_SCHEMA)


def test_media_features_byte_stats(spark):
    df = _payloads(
        spark,
        [
            (1, b"\x7fELF" + b"x" * 100),
            (2, b""),
            (3, None),
            (4, b"a" * MM.FRAME_BYTES),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in MM.media_features(df).collect()}
    assert got[1]["size_bytes"] == 104
    assert got[1]["n_frames"] == 1
    assert got[1]["head_byte"] == 0x7F
    assert got[2] == {"doc_id": 2, "size_bytes": 0, "n_frames": 0, "head_byte": -1}
    assert got[3]["size_bytes"] == 0 and got[3]["head_byte"] == -1
    assert got[4]["n_frames"] == 1  # exactly one full frame, not two


def test_sample_frames_fanout_and_boundaries(spark):
    fb = MM.FRAME_BYTES
    df = _payloads(
        spark,
        [
            (1, b"a" * (3 * fb + 10)),  # 4 frames -> keep idx 0, 2
            (2, b"b" * fb),  # exactly one frame -> idx 0 only
            (3, b""),  # empty -> no rows
            (4, None),  # null -> no rows
            (5, b"c" * (2 * fb)),  # 2 frames -> idx 0 only (every_k=2)
        ],
    )
    rows = MM.sample_frames(df, every_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)

    assert sorted(by_doc) == [1, 2, 5]
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [0, 2]
    assert len(by_doc[1][0]["frame"]) == fb
    # last kept frame of doc 1 is a full frame (idx 2 of 4)
    assert all(len(r["frame"]) == fb for r in by_doc[1])
    assert by_doc[2][0]["frame_idx"] == 0 and len(by_doc[2][0]["frame"]) == fb
    assert by_doc[5][0]["frame_idx"] == 0


def test_sample_frames_tail_frame_is_short(spark):
    fb = MM.FRAME_BYTES
    df = _payloads(spark, [(1, b"x" * (2 * fb + 7))])  # 3 frames: idx 0,1,2
    rows = {r["frame_idx"]: r for r in MM.sample_frames(df, every_k=1).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert len(rows[0]["frame"]) == fb
    assert len(rows[2]["frame"]) == 7  # short tail preserved, not padded


def test_sample_frames_every_k_one_covers_all(spark):
    fb = MM.FRAME_BYTES
    df = _payloads(spark, [(1, b"y" * (5 * fb))])
    idxs = sorted(r["frame_idx"] for r in MM.sample_frames(df, every_k=1).collect())
    assert idxs == [0, 1, 2, 3, 4]
    # reassembling every frame recovers the payload exactly
    frames = sorted(MM.sample_frames(df, every_k=1).collect(), key=lambda r: r["frame_idx"])
    assert b"".join(bytes(r["frame"]) for r in frames) == b"y" * (5 * fb)


def test_decode_stubs_raise_without_codecs(spark):
    if not MM._HAS_PIL:
        with pytest.raises(NotImplementedError):
            MM.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"RIFF")


def test_resize_media_exact_nearest_neighbor(spark):
    # 9 bytes -> 3x3 grid; resize to 2x2 must pick src pixels (0,0) (0,1)
    # via xs=[0,1], ys=[0,1]: rows 0,1 / cols 0,1 of the 3x3 grid
    payload = bytes(range(9))  # grid [[0,1,2],[3,4,5],[6,7,8]]
    df = _payloads(spark, [(1, payload)])
    (r,) = MM.resize_media(df, out_w=2, out_h=2).collect()
    assert (r["orig_w"], r["orig_h"], r["out_w"], r["out_h"]) == (3, 3, 2, 2)
    assert bytes(r["resized"]) == bytes([0, 1, 3, 4])


def test_resize_media_clamps_and_pads(spark):
    # 5 bytes -> 3x2 grid (ceil(sqrt(5))=3, ceil(5/3)=2), last cell padded;
    # out 16x16 clamps to 3x2 = identity (with the pad byte materialized)
    df = _payloads(spark, [(1, bytes([9, 8, 7, 6, 5])), (2, b"")])
    rows = {r["doc_id"]: r for r in MM.resize_media(df).collect()}
    r = rows[1]
    assert (r["orig_w"], r["orig_h"], r["out_w"], r["out_h"]) == (3, 2, 3, 2)
    assert bytes(r["resized"]) == bytes([9, 8, 7, 6, 5, 0])
    z = rows[2]
    assert (z["orig_w"], z["out_w"], len(bytes(z["resized"]))) == (0, 0, 0)


def test_resize_media_output_is_bounded(spark):
    # any payload collapses to at most out_w*out_h bytes — the property
    # that makes the feature table broadcastable at scale
    df = _payloads(spark, [(1, bytes(10_000))])
    (r,) = MM.resize_media(df, out_w=8, out_h=8).collect()
    assert len(bytes(r["resized"])) == 64
