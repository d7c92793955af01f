"""Regression: registry queries must work on a BARE SparkSession.

The driver's correctness harness builds its own ``SparkSession.builder
.getOrCreate()`` without any of the confs from ``session.get_spark`` — in
round 1 every events.parquet read died with PARQUET_TYPE_ILLEGAL because
``spark.sql.legacy.parquet.nanosAsLong`` was only set by the repo's session
factory.  ``sources.tables.load_table`` now sets the required runtime confs
itself; this test proves it in a subprocess that never imports the factory.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# Runs in a fresh interpreter: bare session, no stockpulse session factory.
_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[2]").getOrCreate()
assert "session" not in [m.split(".")[-1] for m in sys.modules
                         if m.startswith("stockpulse") and m.endswith(".session")]

from stockpulse_batch_realtime_etl_spark.sources.tables import load_table

ev = load_table(spark, {sf_dir!r}, "events")
# Spark <=3.x (nanosAsLong honored) -> converted to "timestamp";
# Spark 4.1+ ignores the conf and reads TIMESTAMP(NANOS) as "timestamp_ntz".
# Consumers tolerate both (functions.scalars.ts_micros casts when bucketing).
assert dict(ev.dtypes)["ts"] in ("timestamp", "timestamp_ntz"), ev.dtypes
n = ev.count()
assert n > 0, n

# timezone parity: conf must now be UTC regardless of host TZ
assert spark.conf.get("spark.sql.session.timeZone") == "UTC"

from stockpulse_batch_realtime_etl_spark import queries_registry
df = queries_registry.QUERIES["ohlcv_bars"](spark, {sf_dir!r})
rows = df.count()
assert rows > 0, rows
print("BARE_SESSION_OK", n, rows)
"""


def test_registry_runs_on_bare_session():
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):  # pragma: no cover - driver always provides it
        import pytest

        pytest.skip("driver testdata not present")
    env = dict(os.environ)
    # Simulate a non-UTC harness host to catch timezone-dependent results.
    env["TZ"] = "America/New_York"
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=str(REPO), sf_dir=sf_dir)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BARE_SESSION_OK" in proc.stdout
