"""Local replica of the driver's correctness gate: every registered query's
Spark result must hash-match its DuckDB oracle at sf0.001 (fast tier).
tools/check_parity.py runs the same comparison standalone (and at sf0.01)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from stockpulse_batch_realtime_etl_spark.schemas import TESTDATA_TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    return str(v)


def _keyed(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, oracle_con, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        pytest.skip("rows-only query (no SQL-expressible oracle)")
    rel = oracle_con.execute(oracles[name])
    ocols = [d[0] for d in rel.description]
    orows = [tuple(r) for r in rel.fetchall()]
    assert sorted(sdf.columns) == sorted(ocols), "column names differ"
    assert len(srows) == len(orows), "row counts differ"
    assert _keyed(sdf.columns, srows) == _keyed(ocols, orows), "values differ"
