from csvs_to_sqlite_spark.sinks.sqlite_sink import SQLiteSink, best_fts_version  # noqa: F401
