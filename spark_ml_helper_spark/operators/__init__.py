"""Operator modules — importing this package populates the registry."""

import spark_ml_helper_spark.operators.scans  # noqa: F401
import spark_ml_helper_spark.operators.filters  # noqa: F401
import spark_ml_helper_spark.operators.joins  # noqa: F401
import spark_ml_helper_spark.operators.aggregates  # noqa: F401
import spark_ml_helper_spark.operators.windows  # noqa: F401
import spark_ml_helper_spark.operators.setops  # noqa: F401
import spark_ml_helper_spark.functions.scalar  # noqa: F401
import spark_ml_helper_spark.operators.text  # noqa: F401
import spark_ml_helper_spark.operators.vectors  # noqa: F401
import spark_ml_helper_spark.operators.mlprep  # noqa: F401
import spark_ml_helper_spark.streaming.batch_equiv  # noqa: F401
import spark_ml_helper_spark.streaming.runs  # noqa: F401
import spark_ml_helper_spark.operators.udfs  # noqa: F401
import spark_ml_helper_spark.operators.pipeline  # noqa: F401
import spark_ml_helper_spark.operators.multimodal  # noqa: F401
import spark_ml_helper_spark.operators.scale  # noqa: F401
import spark_ml_helper_spark.operators.ml  # noqa: F401
import spark_ml_helper_spark.operators.reshape  # noqa: F401
import spark_ml_helper_spark.operators.curation  # noqa: F401
import spark_ml_helper_spark.operators.analytics  # noqa: F401
import spark_ml_helper_spark.operators.sqlapi  # noqa: F401
import spark_ml_helper_spark.sources.files  # noqa: F401
