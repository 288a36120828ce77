"""Third-opinion gate: independent pure-Python reimplementations vs oracle.

Complements the DuckDB differential (tests/test_query_oracle.py): that gate
proves Spark == oracle; this one proves oracle == an INDEPENDENT from-spec
reimplementation (scripts/third_opinion.py), so a spec-level mistake typed
identically into the Spark builder and the oracle SQL cannot survive both
gates. Coverage is the full round-9 attestation window + round-10 pool
(80 queries); runs at sf0.001 in seconds.
"""

import runpy
from pathlib import Path

import pytest

_NS = runpy.run_path(
    str(Path(__file__).resolve().parent.parent / "scripts" / "third_opinion.py"),
    run_name="imported_for_tests",
)
CHECKERS = _NS["CHECKERS"]
_compare = _NS["_compare"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CHECKERS))
def test_independent_reimplementation_matches_oracle(sf_dir, duck, name):
    from guardian_for_apache_kafka_spark.plans import REGISTRY

    oracle = duck.execute(REGISTRY[name].oracle).fetchdf()
    err = _compare(name, oracle, CHECKERS[name](sf_dir))
    assert err is None, f"{name}: {err}"


def test_coverage_spans_the_attestation_surface():
    """Every query in the head-50 window and the never-attested pool must
    have an independent checker — new registry rounds extend the script."""
    from guardian_for_apache_kafka_spark.plans import REGISTRY, _LAST_ATTESTED

    names = list(REGISTRY)
    surface = set(names[:50]) | {n for n in names if n not in _LAST_ATTESTED}
    missing = surface - set(CHECKERS)
    assert not missing, f"attestation-surface queries lacking a checker: {sorted(missing)}"
