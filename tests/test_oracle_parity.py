"""The engine's primary correctness gate, run locally at sf0.001:
every declared query with an oracle must match DuckDB on
row count + columns + order-insensitive values (mirrors the driver's t2).
"""

import pytest

from video_stream_processing_spark.oracle import duckdb_connection, run_query_pair
from video_stream_processing_spark.plans.registry import all_queries

SPECS = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, con, sf_dir, name):
    spec = SPECS[name]
    res = run_query_pair(spark, con, spec, sf_dir)
    assert res.ok, str(res)
    if spec.oracle is None:
        assert res.spark_rows >= 0
