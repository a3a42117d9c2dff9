"""Run every registered query with an oracle against DuckDB at sf0.01 —
the same differential check the driver performs (row count + schema +
order-insensitive values). Queries without an oracle get a rows-runs
smoke check here; their semantics are covered by dedicated tests.
"""

from __future__ import annotations

import pytest

from local_datalakehouse_phase2_spark.registry import all_specs

from .conftest import SF_ORACLE
from .oracle import compare, duckdb_connection

SPECS = all_specs()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, con):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke; semantics tested elsewhere
    else:
        compare(df, con, spec.oracle)


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
