"""Explicit plan objects.

The reference mutates strings and grafts attributes onto DataFrames
(reference cli.py:198-221, the --shape mutation bug at cli.py:204-220).
We use immutable per-table specs instead, which kills that bug class by
construction (SURVEY.md §7.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class Table:
    """A named DataFrame. Never graft attributes onto DataFrames
    (reference cli.py:201 does ``df.table_name = name``).

    ``overrides`` carries this table's OWN C1 integer-downcast DDL
    overrides (column → "INTEGER"): the reference computes these at write
    time per table (utils.py:285-303), so they must never leak across
    tables that happen to share a column name."""

    name: str
    df: DataFrame
    overrides: dict = field(default_factory=dict)


@dataclass(frozen=True)
class ShapeCol:
    """One entry of a --shape spec (reference utils.py:444-466)."""

    csv_name: str
    db_name: str
    type_override: str | None = None  # TEXT/INTEGER/REAL/BLOB/NUMERIC


@dataclass(frozen=True)
class SourceSpec:
    path: str
    table_name: str
    separator: str = ","
    quoting: int = 0
    skip_errors: bool = False
    just_strings: bool = False
    shape: tuple[ShapeCol, ...] | None = None


@dataclass(frozen=True)
class DimSpec:
    """A column → lookup-table extraction (reference cli.py:230-238).

    ``column`` in the fact table is replaced by an integer id into the
    dimension table ``table`` whose value column is ``value_column``.
    """

    column: str
    table: str = ""
    value_column: str = "value"

    def resolved(self) -> "DimSpec":
        return DimSpec(self.column, self.table or self.column, self.value_column)


@dataclass(frozen=True)
class SinkSpec:
    db_path: str
    replace_tables: bool = False
    index_fks: bool = True
    fts_columns: tuple[str, ...] = ()
    fts_fks: bool = True
    indexes: tuple[str, ...] = ()
    primary_keys: tuple[str, ...] = ()


@dataclass
class ImportPlan:
    sources: list[SourceSpec] = field(default_factory=list)
    dims: list[DimSpec] = field(default_factory=list)
    date_columns: tuple[str, ...] = ()
    datetime_columns: tuple[str, ...] = ()
    datetime_formats: tuple[str, ...] = ()
    filename_column: str | None = None
    fixed_columns: tuple[tuple[str, str], ...] = ()
    fixed_columns_int: tuple[tuple[str, int], ...] = ()
    fixed_columns_float: tuple[tuple[str, float], ...] = ()
