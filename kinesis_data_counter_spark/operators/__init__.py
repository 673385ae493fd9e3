from kinesis_data_counter_spark.operators.counter import (
    build_counter,
    counter_value_column,
    finalize_counter,
    merge_partials,
    partial_counter,
)

__all__ = [
    "build_counter",
    "counter_value_column",
    "finalize_counter",
    "merge_partials",
    "partial_counter",
]
