"""Driver-contract smoke: entry() returns rows; queries()/oracle_sql()
are consistent; every oracle SQL parses and runs in DuckDB."""

import importlib

import pytest


def _entry_module():
    import __spark_entry__

    return importlib.reload(__spark_entry__)


def test_entry_returns_rows(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_and_oracles_consistent(sf_dir):
    mod = _entry_module()
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0


@pytest.mark.slow
def test_oracles_run_in_duckdb(sf_dir):
    from video_stream_processing_spark.oracle import duckdb_connection

    mod = _entry_module()
    con = duckdb_connection(sf_dir)
    for name, sql in mod.oracle_sql().items():
        con.execute(f"SELECT * FROM ({sql}) LIMIT 1")
