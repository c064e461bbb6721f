from csvs_to_sqlite_spark.plans.specs import (  # noqa: F401
    DimSpec,
    ImportPlan,
    ShapeCol,
    SinkSpec,
    SourceSpec,
    Table,
)
