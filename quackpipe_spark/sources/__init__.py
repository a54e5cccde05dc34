from quackpipe_spark.sources.tables import TABLES, load_tables, register_views  # noqa: F401
