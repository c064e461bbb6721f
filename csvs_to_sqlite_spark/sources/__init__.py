from csvs_to_sqlite_spark.sources.csv_source import (  # noqa: F401
    LoadCsvError,
    csvs_from_paths,
    infer_reference_types,
    load_csv,
)
