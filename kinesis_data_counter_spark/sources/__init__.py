from kinesis_data_counter_spark.sources.json_records import (
    parse_json_records,
    split_corrupt_records,
)

__all__ = ["parse_json_records", "split_corrupt_records"]
