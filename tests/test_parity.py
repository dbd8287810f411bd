"""Differential test: every registered query vs its DuckDB oracle.

This replicates the verify driver's correctness gate locally. Runs at
sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
to match the driver's scale before committing.
"""

import pytest

from activedata_etl_spark.parity import compare, duck_connect
from activedata_etl_spark.queries import ORACLES, QUERIES


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    res = compare(name, QUERIES[name](spark, sf_dir), ORACLES.get(name), con)
    assert res.ok, str(res)
