"""kinesis_data_counter_spark — a PySpark-native analytics engine with the
capabilities of mashiike/kinesis-data-counter (reference surveyed in SURVEY.md).

Design stance (SURVEY.md §7): batch-core first — every counter is a pure
DataFrame transformation ``records_df -> results_df``; the same builder runs
under ``spark.read`` (tests / oracle) and ``spark.readStream`` + watermark
(streaming parity with the reference's Lambda/CLI drivers).
"""

from kinesis_data_counter_spark.config import Config, CounterSpec
from kinesis_data_counter_spark.session import get_spark, load_tables

__all__ = ["Config", "CounterSpec", "get_spark", "load_tables"]

__version__ = "0.1.0"
