"""Multimodal (image/audio/video) column plumbing.

Beyond-reference operators (SURVEY.md §7 Phase 5). The pattern for opaque
media at 100 TB: payloads travel as ``binary`` columns with typed metadata
alongside; decode / feature-extraction runs in ``mapInPandas`` so each Arrow
batch of payload bytes is handed to Python exactly once — never row-at-a-time.

The container ships no image/audio codecs, so the actual decode step is a
STUB: ``decode_image``/``decode_audio`` raise NotImplementedError unless the
optional libs exist. Everything around the stub is real and tested — schema,
batch iteration, Arrow binary transfer, partition sizing — and
``media_features`` computes deterministic byte-level features so the pipeline
has an oracle-checkable output today.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_data_counter_spark.session import fan_out

# Optional decoders — gate behind import-try (none are bundled here).
try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(payload: bytes) -> Any:
    """Decode an image payload. STUB: requires pillow (not bundled)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires pillow; install it or use media_features()"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def decode_audio(payload: bytes) -> Any:
    """Decode an audio payload. STUB: no audio codec is bundled."""
    raise NotImplementedError("audio decode requires soundfile/librosa (not bundled)")


MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("head_byte", T.IntegerType()),
    ]
)

FRAME_BYTES = 1024  # fake fixed-size frame for frame-sampling simulation


def _feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-Arrow-batch feature extraction over raw payload bytes.

    Deterministic byte-level features stand in for real decode output:
    payload size, simulated frame count (⌈size/FRAME_BYTES⌉ — where a real
    pipeline would return sampled video frames), and the first byte (where
    a real pipeline would sniff the container magic).
    """
    for pdf in batches:
        payloads = pdf["payload"]
        sizes = payloads.map(lambda b: len(b) if b is not None else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "size_bytes": sizes.astype("int64"),
                "n_frames": ((sizes + FRAME_BYTES - 1) // FRAME_BYTES).astype("int64"),
                "head_byte": payloads.map(
                    lambda b: int(b[0]) if b else -1
                ).astype("int32"),
            }
        )


def media_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, size_bytes, n_frames, head_byte) via mapInPandas.

    Input: any DataFrame with a binary ``payload_col``. The projection to
    exactly (id, payload) happens before the Python stage so Arrow transfers
    only what the extractor needs (column pruning across the UDF boundary is
    manual — Spark can't prune inside Python).
    """
    slim = fan_out(df, id_col).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(payload_col).alias("payload"),
    )
    return slim.mapInPandas(_feature_batches, MEDIA_FEATURE_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: wrap the documents fixture's text as a fake binary payload.

    The fixtures carry no real media; UTF-8 bytes of ``text`` make a
    deterministic payload so the binary plumbing runs (and has a SQL oracle:
    size_bytes == octet_length(text))."""
    return df.select(
        F.col("doc_id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_w", T.IntegerType()),
        T.StructField("orig_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame,
    out_w: int = 16,
    out_h: int = 16,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Nearest-neighbor resize of media payloads to ``out_w × out_h``.

    A real pipeline decodes the payload (``decode_image`` — stubbed without
    pillow) and resizes pixels; here the payload's bytes ARE the pixels of a
    square-ish ``orig_w × orig_h`` grid (``orig_w = ⌈√n⌉``), and the resize
    is a genuine 2-D nearest-neighbor downsample done as one numpy fancy-
    index per payload. That keeps every production-relevant part real —
    Arrow binary transfer both directions, typed dimension metadata
    alongside the opaque payload, the vectorized batch kernel, output size
    bounded by ``out_w × out_h`` regardless of input size (the property
    that makes a 100 TB media table shrink to a broadcastable feature
    table). Output dims clamp to the original (never upsample).
    """
    import math

    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ows, ohs, tws, ths, outs = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                n = len(p)
                if n == 0:
                    ids.append(doc_id); ows.append(0); ohs.append(0)
                    tws.append(0); ths.append(0); outs.append(b"")
                    continue
                ow = int(math.ceil(math.sqrt(n)))
                oh = int(math.ceil(n / ow))
                tw, th = min(out_w, ow), min(out_h, oh)
                m = np.frombuffer(p.ljust(ow * oh, b"\0"), dtype=np.uint8).reshape(oh, ow)
                xs = (np.arange(tw) * ow) // tw
                ys = (np.arange(th) * oh) // th
                ids.append(doc_id); ows.append(ow); ohs.append(oh)
                tws.append(tw); ths.append(th)
                outs.append(m[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"),
                 "orig_w": pd.array(ows, dtype="int32"),
                 "orig_h": pd.array(ohs, dtype="int32"),
                 "out_w": pd.array(tws, dtype="int32"),
                 "out_h": pd.array(ths, dtype="int32"),
                 "resized": pd.array(outs, dtype=object)}
            )

    slim = fan_out(df, id_col).select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return slim.mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_k: int = 2,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """One payload row → many (doc_id, frame_idx, frame) rows: every
    ``every_k``-th fixed-size chunk of the payload (a real pipeline would
    decode the container and sample actual video frames — the stubbed
    chunking keeps the one-to-many mapInPandas batch shape, the binary
    frame column, and the fan-out factor real and oracle-checkable).

    Scale note: output rows ≈ input_bytes / (FRAME_BYTES × every_k) — the
    fan-out multiplies downstream shuffle volume, so frame-level operators
    should aggregate or filter before any wide transformation.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not payload:
                    continue
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"),
                 "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame": pd.array(frames, dtype=object)}
            )

    slim = fan_out(df, id_col).select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return slim.mapInPandas(_frames, FRAME_SAMPLE_SCHEMA)
