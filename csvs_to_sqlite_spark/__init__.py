"""csvs_to_sqlite_spark — a PySpark-native analytics/ETL engine with the
capabilities of simonw/csvs-to-sqlite (reference: /root/reference).

Architecture (SURVEY.md §7): declarative DataFrame plans optimized by
Catalyst; explicit plan dataclasses (plans/), CSV sources with reference
type-inference semantics (sources/), relational operators incl. dimension
extraction with first-appearance ids (operators/), a driver-side SQLite
sink with FTS/FK/index DDL (sinks/), and large-scale pipeline extensions
(dedup, similarity, text analysis, streaming).
"""

__version__ = "0.1.0"

from csvs_to_sqlite_spark.session import get_spark  # noqa: F401
