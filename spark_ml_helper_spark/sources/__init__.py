from spark_ml_helper_spark.sources.parquet import TABLES, load_tables, table

__all__ = ["TABLES", "load_tables", "table"]
