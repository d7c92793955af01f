"""Central registry: query name → (spark, sf_dir) -> DataFrame, plus the
DuckDB oracle SQL for each (the driver's correctness gate, and our own
tests/test_oracle_parity.py).

Conventions:
* every computed column is aliased identically in the Spark expression and
  the oracle SQL (driver compare sorts columns by name before hashing);
* floating aggregates are rounded at 4dp on BOTH sides (the reference's
  visible rounding point, ticks.py:73 / bars.py:141) so cross-engine float
  summation order can't flip the hash;
* "now"-relative predicates (op F9) are parameterized by deriving ``as_of``
  from the data (max event_time) so queries are deterministic at any sf.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stockpulse_batch_realtime_etl_spark.operators.ohlcv import ohlcv_bars
from stockpulse_batch_realtime_etl_spark.sources.ticks import (
    TICKS_FROM_EVENTS_SQL,
    ticks_from_events,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: DuckDB CTE prelude giving the oracle the same tick view the Spark side
#: builds in sources/ticks.py (events → stock_ticks model, FIXTURES.md §5).
TICKS_CTE = f"WITH ticks AS ({TICKS_FROM_EVENTS_SQL})"


# --- flagship: A1/A2 OHLCV bars --------------------------------------------

@register(
    "ohlcv_bars",
    oracle=f"""
{TICKS_CTE}
SELECT
  symbol,
  date_trunc('minute', event_time) AS bucket_start,
  round(arg_min(price, event_time), 4) AS open,
  round(max(price), 4)  AS high,
  round(min(price), 4)  AS low,
  round(arg_max(price, event_time), 4) AS close,
  sum(coalesce(volume, 0)) AS volume_sum,
  count(*) AS tick_count
FROM ticks
GROUP BY symbol, date_trunc('minute', event_time)
""",
)
def q_ohlcv_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    bars = ohlcv_bars(ticks_from_events(spark, sf_dir))
    return bars.select(
        "symbol",
        "bucket_start",
        F.round("open", 4).alias("open"),
        F.round("high", 4).alias("high"),
        F.round("low", 4).alias("low"),
        F.round("close", 4).alias("close"),
        F.col("volume_sum").cast("long").alias("volume_sum"),
        F.col("tick_count").cast("long").alias("tick_count"),
    )
