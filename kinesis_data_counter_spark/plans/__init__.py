from kinesis_data_counter_spark.plans.registry import QUERIES, QueryDef, oracle_sql_map

__all__ = ["QUERIES", "QueryDef", "oracle_sql_map"]
