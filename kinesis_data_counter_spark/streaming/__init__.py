from kinesis_data_counter_spark.streaming.runner import (
    run_counter_stream_once,
    stream_counter,
)

__all__ = ["run_counter_stream_once", "stream_counter"]
