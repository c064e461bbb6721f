"""Session-factory behavior the bench/oracle paths rely on."""

import pyspark.errors.utils as perr

from csvs_to_sqlite_spark.session import prep_session


def test_dataframe_debugging_disabled(spark):
    """The call-site-capture tax (pyspark _with_origin wrapper) must be
    OFF on both our own sessions (get_spark — the conftest fixture) and
    host-provided ones (prep_session): it costs a py4j conf.get round
    trip + a stack walk on EVERY DataFrame/functions call, which is real
    wall time on plan-construction-heavy paths (ingest 12.2->10.0 s at
    sf0.1, tools/ab_dataframe_debugging.py). The gate is cached in a
    module global at first use, so the conf alone is not enough — the
    cache must agree."""
    assert spark.conf.get("spark.python.sql.dataFrameDebugging.enabled") == "false"
    assert perr.is_debugging_enabled() is False

    # a host session that already populated the cache gets realigned
    perr._enable_debugging_cache = True
    try:
        prep_session(spark)
        assert perr.is_debugging_enabled() is False
    finally:
        perr._enable_debugging_cache = False
