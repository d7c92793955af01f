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

from pyspark.sql import functions as F

from stockpulse_batch_realtime_etl_spark.operators import serving
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


#: DuckDB CTE for the derived bars table (matches q_ohlcv_bars without the
#: output rounding — serving queries consume raw bar values, and min/max/
#: arg_min picks are exact input doubles, not accumulations).
BARS_CTE = f"""
{TICKS_CTE},
bars AS (
  SELECT
    symbol,
    date_trunc('minute', event_time) AS bucket_start,
    arg_min(price, event_time) AS open,
    max(price)  AS high,
    min(price)  AS low,
    arg_max(price, event_time) AS close,
    sum(coalesce(volume, 0)) AS volume_sum,
    count(*) AS tick_count
  FROM ticks
  GROUP BY symbol, date_trunc('minute', event_time)
)
"""


# --- serving suite (SURVEY.md §2.10) ---------------------------------------

@register(
    "symbols",
    oracle=f"{TICKS_CTE} SELECT DISTINCT symbol FROM ticks ORDER BY symbol",
)
def q_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return serving.symbols(ticks_from_events(spark, sf_dir))


@register(
    "latest_ticks",
    oracle=f"""
{TICKS_CTE}
SELECT symbol, price, volume, event_time
FROM ticks WHERE symbol = 'PURCHASE'
ORDER BY event_time DESC, price DESC, volume DESC NULLS LAST
LIMIT 100
""",
)
def q_latest_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return serving.latest_ticks(ticks_from_events(spark, sf_dir), "purchase", 100)


@register(
    "tick_summary",
    oracle=f"""
{TICKS_CTE}
SELECT
  symbol,
  count(*) AS tick_count,
  round(avg(price), 4) AS avg_price,
  min(price) AS min_price,
  max(price) AS max_price,
  sum(coalesce(volume, 0)) AS volume_sum,
  min(event_time) AS first_tick,
  max(event_time) AS last_tick
FROM ticks
WHERE symbol = 'PURCHASE'
  AND event_time >= (SELECT max(event_time) FROM ticks) - INTERVAL 60 MINUTE
GROUP BY symbol
""",
)
def q_tick_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return serving.tick_summary(ticks_from_events(spark, sf_dir), "purchase", 60)


@register(
    "latest_bars",
    oracle=f"""
{BARS_CTE}
SELECT symbol, bucket_start, open, high, low, close, volume_sum, tick_count
FROM bars WHERE symbol = 'CLICK'
ORDER BY bucket_start DESC
LIMIT 100
""",
)
def q_latest_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = ohlcv_bars(ticks_from_events(spark, sf_dir))
    return serving.latest_bars(bars, "click", 100)


@register(
    "bar_summary",
    oracle=f"""
{BARS_CTE}
SELECT *,
  round((close - open) / nullif(open, 0) * 100, 4) AS change_pct
FROM (
  SELECT
    symbol,
    count(*) AS bar_count,
    arg_min(open, bucket_start) AS open,
    max(high) AS high,
    min(low)  AS low,
    arg_max(close, bucket_start) AS close,
    sum(volume_sum) AS volume_sum,
    sum(tick_count) AS tick_count,
    min(bucket_start) AS first_bucket,
    max(bucket_start) AS last_bucket
  FROM bars
  WHERE symbol = 'CLICK'
    AND bucket_start >= (SELECT max(bucket_start) FROM bars) - INTERVAL 180 MINUTE
  GROUP BY symbol
) s
""",
)
def q_bar_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = ohlcv_bars(ticks_from_events(spark, sf_dir))
    return serving.bar_summary(bars, "click", 180)


@register(
    "movers",
    oracle=f"""
{BARS_CTE},
windowed AS (
  SELECT * FROM bars
  WHERE bucket_start >= (SELECT max(bucket_start) FROM bars) - INTERVAL 180 MINUTE
),
per_symbol AS (
  SELECT
    symbol,
    arg_min(open, bucket_start) AS open,
    arg_max(close, bucket_start) AS close
  FROM windowed
  GROUP BY symbol
)
SELECT symbol, open, close,
  round((close - open) / nullif(open, 0) * 100, 4) AS change_pct
FROM per_symbol
ORDER BY abs(change_pct) DESC NULLS LAST, symbol ASC
LIMIT 20
""",
)
def q_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = ohlcv_bars(ticks_from_events(spark, sf_dir))
    return serving.movers(bars, 180, 20)


@register(
    "latest_tick_per_symbol",
    oracle=f"""
{TICKS_CTE}
SELECT symbol, price, volume, event_time FROM (
  SELECT *, row_number() OVER (
    PARTITION BY symbol ORDER BY event_time DESC, price DESC
  ) AS rn
  FROM ticks
) t WHERE rn = 1
""",
)
def q_latest_tick_per_symbol(spark: SparkSession, sf_dir: str) -> DataFrame:
    return serving.latest_tick_per_symbol(ticks_from_events(spark, sf_dir)).select(
        "symbol", "price", "volume", "event_time"
    )
