"""DuckDB-oracle differential gate over every registered query (sf0.001 smoke;
the driver repeats this at sf0.01). Mirrors the driver's correctness check."""

import pytest

from guardian_for_apache_kafka_spark.plans import REGISTRY
from guardian_for_apache_kafka_spark.plans.differential import duckdb_connection, run_one


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    res = run_one(spark, sf_dir, name, duck)
    assert res.ok, res.detail


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
    # column names are sort-stable identifiers on both sides
    for name, sql in e.oracle_sql().items():
        assert sql.strip(), name
