from quackpipe_spark.functions.dialect import register_dialect, rewrite_sql  # noqa: F401
