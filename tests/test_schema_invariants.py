"""Type-level regression fence against silent environment changes.

Round-2 postmortem: the driver hashes query results AFTER Arrow/pandas
conversion, where DuckDB's HUGEINT (the result type of ``sum(BIGINT)``)
becomes float64/decimal128 while Spark emits int64 — so 10 value-identical
queries hash-mismatched even though the Python-level comparison in
tests/test_oracle_parity.py (HUGEINT → Python int) was green.  Separately,
a PySpark upgrade (4.1.2 ignoring ``nanosAsLong``) flipped ``events.ts`` to
TIMESTAMP_NTZ and crashed every ``unix_micros`` consumer.

These tests pin the type surface at the ARROW level, where the driver
compares, so the next silent env change fails a local test instead of a
round's correctness gate:

* every oracle's DuckDB result schema must carry integer Arrow types
  wherever Spark emits int/bigint (no HUGEINT→decimal/float leaks);
* no decimal types on either side of any comparison;
* Spark query outputs stay within the expected dtype vocabulary (a new
  INTERVAL/NTZ/decimal column appearing unexpectedly is a red flag).

DuckDB side runs with ``LIMIT 0`` — type inference only, no compute — so
the whole fence adds seconds, not minutes, to the suite.
"""

from __future__ import annotations

import os
import re

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entry_mod
from stockpulse_batch_realtime_etl_spark.schemas import TESTDATA_TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)

#: dtype vocabulary a registered query may emit (base types; array<> of
#: these is also fine).  decimal / interval / map are deliberately absent.
ALLOWED_SPARK_BASE = {
    "string",
    "double",
    "float",
    "bigint",
    "int",
    "smallint",
    "boolean",
    "timestamp",
    "timestamp_ntz",
    "date",
    "binary",
}

_ARRAY_RE = re.compile(r"^array<(.+)>$")


def _base_types(dtype: str):
    m = _ARRAY_RE.match(dtype)
    if m:
        yield from _base_types(m.group(1))
    else:
        yield dtype


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def spark_schemas(spark):
    """One pass over the registry: name → {col: spark dtype}.

    Built once because a handful of queries execute eagerly on call
    (streaming availableNow, storage write, iterative dedup)."""
    out = {}
    for name, fn in entry_mod.queries().items():
        out[name] = dict(fn(spark, SF_DIR).dtypes)
    return out


def test_spark_output_dtypes_in_vocabulary(spark_schemas):
    bad = {
        name: {c: t for c, t in schema.items()
               if any(b not in ALLOWED_SPARK_BASE for b in _base_types(t))}
        for name, schema in spark_schemas.items()
    }
    bad = {k: v for k, v in bad.items() if v}
    assert not bad, f"unexpected output dtypes (decimal/interval leak?): {bad}"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_arrow_types_align_with_spark(name, oracle_con, spark_schemas):
    sql = entry_mod.oracle_sql()[name]
    # LIMIT 0 preserves the result schema with zero compute
    tbl = oracle_con.execute(
        f"SELECT * FROM ({sql}) __typeprobe LIMIT 0"
    ).fetch_arrow_table()
    sdtypes = spark_schemas[name]
    for field in tbl.schema:
        assert not pa.types.is_decimal(field.type), (
            f"{name}.{field.name}: oracle yields {field.type} at the Arrow "
            "layer (DuckDB HUGEINT/DECIMAL) — the driver's hash will diverge "
            "from Spark; CAST the oracle expression"
        )
        st = sdtypes.get(field.name)
        if st in ("bigint", "int", "smallint"):
            assert pa.types.is_integer(field.type), (
                f"{name}.{field.name}: Spark emits {st} but the oracle's "
                f"Arrow type is {field.type} — driver hash would diverge"
            )
