"""Sink dispatch: the K-side of the engine (SURVEY.md §2.4 K1-K5).

The reference routes output records by ARN service — kinesis PutRecord,
firehose PutRecord, or a warning — with an ``ignore_put_record`` dry-run mode
(counter.go:514-555). OSS Spark has no Kinesis/Firehose writer, so the
production path is ``foreachBatch``: each micro-batch DataFrame is serialized
to JSON lines and handed to a writer callable. boto3 is optional and gated
behind import-try; without it the kinesis/firehose writers raise cleanly and
the console/collect writers still work.

Batching note: Kinesis PutRecords caps at 500 records / 5 MB per call — the
writer chunks accordingly. partition key = counter_id, matching the
reference (counter.go:530, 501).
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame

from kinesis_data_counter_spark.arn import Arn

try:  # pragma: no cover - boto3 not bundled in this container
    import boto3  # type: ignore

    _HAS_BOTO3 = True
except ImportError:
    _HAS_BOTO3 = False

PUT_RECORDS_BATCH = 500


def rows_as_json(df: DataFrame) -> list[str]:
    """Collect a (small, already-aggregated) result as JSON lines.

    ``shard_id`` is dropped when null to match the reference's
    ``omitempty`` output (counter.go:423-425).
    """
    out = []
    for row in df.collect():
        d = {k: v for k, v in row.asDict().items() if not (k == "shard_id" and v is None)}
        out.append(json.dumps(d, separators=(",", ":"), default=str))
    return out


def console_writer(stream: Any = None) -> Callable[[DataFrame, int], None]:
    """K1: stdout/io.Writer sink — one JSON line per output record."""

    def write(df: DataFrame, epoch_id: int) -> None:
        target = stream or sys.stdout
        for line in rows_as_json(df):
            print(line, file=target)

    return write


def _chunks(items: list[Any], size: int) -> Iterable[list[Any]]:
    for i in range(0, len(items), size):
        yield items[i : i + size]


def kinesis_writer(output_arn: str, partition_key_col: str = "counter_id"):
    """K2: Kinesis PutRecords sink (requires boto3 + credentials)."""
    arn = Arn.parse_strict(output_arn)
    if not arn.is_kinesis_stream:
        raise ValueError(f"not a kinesis stream ARN: {output_arn}")

    def write(df: DataFrame, epoch_id: int) -> None:
        if not _HAS_BOTO3:
            raise NotImplementedError("kinesis sink requires boto3 (not bundled)")
        client = boto3.client("kinesis", region_name=arn.region)  # pragma: no cover
        rows = df.collect()  # pragma: no cover
        records = [  # pragma: no cover
            {
                "Data": (json.dumps(r.asDict(), default=str) + "\n").encode(),
                "PartitionKey": str(r[partition_key_col]),
            }
            for r in rows
        ]
        for chunk in _chunks(records, PUT_RECORDS_BATCH):  # pragma: no cover
            client.put_records(StreamName=arn.stream_name, Records=chunk)

    return write


def firehose_writer(output_arn: str):
    """K3: Firehose PutRecordBatch sink (requires boto3 + credentials)."""
    arn = Arn.parse_strict(output_arn)
    if not arn.is_firehose:
        raise ValueError(f"not a firehose ARN: {output_arn}")

    def write(df: DataFrame, epoch_id: int) -> None:
        if not _HAS_BOTO3:
            raise NotImplementedError("firehose sink requires boto3 (not bundled)")
        client = boto3.client("firehose", region_name=arn.region)  # pragma: no cover
        records = [  # pragma: no cover
            {"Data": (json.dumps(r.asDict(), default=str) + "\n").encode()}
            for r in df.collect()
        ]
        for chunk in _chunks(records, PUT_RECORDS_BATCH):  # pragma: no cover
            client.put_record_batch(DeliveryStreamName=arn.stream_name, Records=chunk)

    return write


def writer_for_arn(
    output_arn: str | None, dry_run: bool = False, stream: Any = None
) -> Callable[[DataFrame, int], None]:
    """K5: route by ARN service; dry-run / no ARN → console.

    ≈ putRecord dispatch (counter.go:514-555) incl. the ``ignorePutRecord``
    dry-run flag (counter.go:58-60).
    """
    if dry_run or not output_arn:
        return console_writer(stream)
    arn = Arn.parse_strict(output_arn)
    if arn.is_kinesis_stream:
        return kinesis_writer(output_arn)
    if arn.is_firehose:
        return firehose_writer(output_arn)
    return console_writer(stream)  # pragma: no cover - parse_strict precludes
