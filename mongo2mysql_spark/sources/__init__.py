from mongo2mysql_spark.sources.parquet import TABLES, fan_out, load_table, load_tables, register_views

__all__ = ["TABLES", "fan_out", "load_table", "load_tables", "register_views"]
