from mongo2mysql_spark.functions.scalar import dsum, davg, dmul

__all__ = ["dsum", "davg", "dmul"]
