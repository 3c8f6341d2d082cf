"""spark_ml_helper_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the ``tech1900/spark-ml-helper`` category (Spark ML helper
library + large-scale training-data-pipeline operators).

NOTE on provenance: the reference repo at /root/reference/ is EMPTY
(verified — see SURVEY.md §0). Every operator here is therefore derived from
the declared contract in SURVEY.md §2 and public PySpark knowledge only; no
reference code exists to cite or copy.

Architecture: everything is a declarative DataFrame program — Catalyst picks
physical strategies (broadcast vs shuffle joins, partial aggregation,
whole-stage codegen, AQE). Python touches data only in the explicitly
UDF-flavored operators (SURVEY.md §2.J), always via Arrow-batched pandas
UDFs, never row-at-a-time in a hot path.
"""

from spark_ml_helper_spark.registry import REGISTRY, query
from spark_ml_helper_spark.session import get_spark
from spark_ml_helper_spark.sources.parquet import TABLES, load_tables

__all__ = ["REGISTRY", "query", "get_spark", "load_tables", "TABLES"]
