from reffy_spark.functions import text, urls  # noqa: F401
