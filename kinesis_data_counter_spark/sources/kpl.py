"""KPL (Kinesis Producer Library) record deaggregation (SURVEY.md §2 S3).

The reference unpacks KPL protobuf-aggregated Kinesis records into individual
user records before processing (deaggregate.go:12-43, via the public
awslabs kinesis-aggregation format). The wire format is public and fixed:

    [4-byte magic 0xF3 0x89 0x9A 0xC2][protobuf AggregatedRecord][16-byte MD5]

with the protobuf message (aggregation-format.proto, awslabs):

    message AggregatedRecord {
      repeated string partition_key_table    = 1;
      repeated string explicit_hash_key_table = 2;
      repeated Record records                 = 3;
    }
    message Record {
      required uint64 partition_key_index     = 1;
      optional uint64 explicit_hash_key_index = 2;
      required bytes  data                    = 3;
    }

No protobuf library is bundled, so this module speaks the wire format
directly (varint keys + length-delimited fields — ~40 lines); it also
provides the matching encoder so tests can synthesize KPL batches.

Spark integration: ``deaggregate`` runs the decoder per Arrow batch in
``mapInPandas`` (one Python crossing per batch, not per record) and returns
one row per user record; non-KPL payloads pass through unchanged, exactly
like the reference (a record without the magic prefix is already a user
record). MD5-corrupt aggregates also pass through whole rather than failing
the job — bad input is data, not an exception (SURVEY.md §2.6.7).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

KPL_MAGIC = b"\xf3\x89\x9a\xc2"
_MD5_LEN = 16


# ---------------------------------------------------------------------------
# Minimal protobuf wire codec (varint + length-delimited only — all the
# aggregation format uses)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _iter_fields(buf: bytes) -> Iterator[tuple[int, int, int | bytes]]:
    """Yield (field_number, wire_type, value) for a protobuf message body."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x07
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            if len(val) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_field(field: int, value: int | bytes) -> bytes:
    if isinstance(value, int):
        return _encode_varint(field << 3) + _encode_varint(value)
    return _encode_varint((field << 3) | 2) + _encode_varint(len(value)) + value


# ---------------------------------------------------------------------------
# Aggregate / deaggregate
# ---------------------------------------------------------------------------


def aggregate_records(items: list[tuple[str, bytes]]) -> bytes:
    """Encode (partition_key, data) user records as one KPL aggregate blob.

    Test/producer helper — the inverse of ``deaggregate_blob``. Partition
    keys are deduplicated into the key table like the real KPL.
    """
    key_table: list[str] = []
    key_index: dict[str, int] = {}
    body = bytearray()
    recs = []
    for pk, data in items:
        if pk not in key_index:
            key_index[pk] = len(key_table)
            key_table.append(pk)
        rec = _encode_field(1, key_index[pk]) + _encode_field(3, data)
        recs.append(rec)
    for pk in key_table:
        body += _encode_field(1, pk.encode("utf-8"))
    for rec in recs:
        body += _encode_field(3, rec)
    payload = bytes(body)
    return KPL_MAGIC + payload + hashlib.md5(payload).digest()


def deaggregate_blob(data: bytes) -> list[tuple[str | None, bytes]]:
    """One Kinesis record payload → its user records.

    Non-KPL payloads (no magic, bad checksum, malformed protobuf) pass
    through as a single ``(None, data)`` record — mirroring the reference,
    where only well-formed aggregates are unpacked (deaggregate.go:12-43).
    """
    if not data.startswith(KPL_MAGIC) or len(data) < len(KPL_MAGIC) + _MD5_LEN:
        return [(None, data)]
    body = data[len(KPL_MAGIC) : -_MD5_LEN]
    if hashlib.md5(body).digest() != data[-_MD5_LEN:]:
        return [(None, data)]
    try:
        key_table: list[str] = []
        raw_records: list[bytes] = []
        for field, wire, val in _iter_fields(body):
            if field == 1 and wire == 2:
                key_table.append(val.decode("utf-8"))
            elif field == 3 and wire == 2:
                raw_records.append(val)
        out: list[tuple[str | None, bytes]] = []
        for raw in raw_records:
            pk_idx: int | None = None
            payload = b""
            for field, wire, val in _iter_fields(raw):
                if field == 1 and wire == 0:
                    pk_idx = int(val)
                elif field == 3 and wire == 2:
                    payload = val
            pk = key_table[pk_idx] if pk_idx is not None and pk_idx < len(key_table) else None
            out.append((pk, payload))
        return out
    except (ValueError, UnicodeDecodeError, IndexError):
        return [(None, data)]


DEAGG_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def deaggregate(
    df: DataFrame, data_col: str = "data", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """KPL deaggregation over a binary column: one output row per user record.

    ``mapInPandas`` hands whole Arrow batches of payloads to the decoder —
    the fan-out (one aggregate → many user records) happens inside the
    batch, so output batch sizes grow but the Python boundary is crossed
    once per batch. ``keep_cols`` are duplicated onto every user record
    (shard id, sequence number, arrival time — the envelope the reference
    threads through, deaggregate.go:23-41).
    """
    schema = T.StructType(
        [f for f in df.schema.fields if f.name in keep_cols] + list(DEAGG_SCHEMA.fields)
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in keep_cols}
            pks: list[str | None] = []
            datas: list[bytes] = []
            for i, blob in enumerate(pdf[data_col]):
                for pk, payload in deaggregate_blob(bytes(blob) if blob is not None else b""):
                    for c in keep_cols:
                        rows[c].append(pdf[c].iloc[i])
                    pks.append(pk)
                    datas.append(payload)
            rows["partition_key"] = pks
            rows["data"] = datas
            yield pd.DataFrame(rows, columns=[*keep_cols, "partition_key", "data"])

    return df.mapInPandas(_batches, schema)
