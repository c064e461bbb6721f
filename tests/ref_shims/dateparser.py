# test shim: route the reference's dateparser calls to our vendored parser
import sys
sys.path.insert(0, "/root/repo")
from csvs_to_sqlite_spark.functions.fuzzydate import UnparseableDate, parse_datetime


def parse(datestring, date_formats=None):
    try:
        return parse_datetime(datestring, list(date_formats or []))
    except UnparseableDate:
        return None
