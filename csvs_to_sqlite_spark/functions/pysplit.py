"""Arrow-batched line splitter for the pandas PYTHON-engine emulation
(multi-char separators — see sources/csv_source._load_python_engine).

Lives in its own module because the UDF needs REAL type annotations
(``from __future__ import annotations`` would stringify them and
pandas_udf's hint inference rejects string hints).

Python's own ``re`` does the splitting, so regex-dialect semantics are
bit-exact with pandas (which calls ``re.split(sep, line.strip())`` per
line in its python engine — probed, including the pathological
``sep='|~|'`` empty-match alternation)."""

import re

import pandas as pd
from pyspark.sql import functions as F


def split_lines_udf(pattern: str):
    """Column UDF: line string -> array<string> of re.split(pattern,
    line.strip()); a NULL line becomes [''] (filtered as blank by the
    caller)."""

    @F.pandas_udf("array<string>")
    def _pysplit(s: pd.Series) -> pd.Series:
        comp = re.compile(pattern)
        return s.map(lambda ln: comp.split((ln or "").strip()))

    return _pysplit
