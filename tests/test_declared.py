"""Declared-query oracle check at sf0.001 (fast twin of the driver's
sf0.01 gate; tools/check_oracle.py runs the full thing)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import TABLES, table_hash  # noqa: E402

from kafana_spark.plans.declared import DECLARED_ORACLE, DECLARED_QUERIES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_SMOKE, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(DECLARED_QUERIES))
def test_declared_query_matches_oracle(spark, oracle, name):
    sdf = DECLARED_QUERIES[name](spark, SF_SMOKE)
    scount, shash = table_hash([tuple(r) for r in sdf.collect()], sdf.columns)
    res = oracle.execute(DECLARED_ORACLE[name])
    dcols = [d[0] for d in res.description]
    dcount, dhash = table_hash(res.fetchall(), dcols)
    assert sorted(sdf.columns) == sorted(dcols)
    assert scount == dcount
    assert shash == dhash
