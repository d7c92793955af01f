"""Tick-shaped sources and normalization.

The reference has two producer shapes (SURVEY.md §1.2):

* narrow ``{symbol, price, volume, event_time}`` (producer.py:66-74)
* wide ``{symbol, open, high, low, close, volume, event_time, source}``
  (producer_yfinance.py:100-109) — no ``price`` field; the reference consumer
  dead-letters these on ``tick["price"]`` KeyError (consumer.py:82, 137-139).

Design decision (SURVEY.md §1.2): we *normalize* instead —
``price := coalesce(price, close)`` — and only dead-letter genuinely malformed
records (sources/dlq.py).

For oracle-checked batch queries, the tick role is played by the driver's
``events`` table per FIXTURES.md §5:

=================  =======================================================
reference column   events column
=================  =======================================================
symbol             ``upper(event_type)``  (low-cardinality string key,
                   uppercased like the reference's F7 normalization)
price              ``value``
volume             ``CASE WHEN event_id % 20 = 0 THEN NULL
                   ELSE event_id % 15000 + 500 END``  (deterministic;
                   ~5%% nulls exercise ``SUM(COALESCE(volume,0))``,
                   aggregator.py:34)
event_time         ``ts``
=================  =======================================================
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_batch_realtime_etl_spark.sources.tables import fan_out, load_table

#: SQL fragment used verbatim in DuckDB oracles (keep in sync with
#: ``ticks_from_events``).
TICKS_FROM_EVENTS_SQL = """
SELECT
  upper(event_type) AS symbol,
  value      AS price,
  CASE WHEN event_id % 20 = 0 THEN NULL
       ELSE event_id % 15000 + 500 END AS volume,
  ts         AS event_time
FROM events
"""


def ticks_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's ``events`` table onto the ``stock_ticks`` model."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.upper(F.col("event_type")).alias("symbol"),
        F.col("value").alias("price"),
        F.when(F.col("event_id") % 20 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("event_id") % 15000 + 500)
        .alias("volume"),
        F.col("ts").alias("event_time"),
    )


def _norm_price() -> Column:
    return F.coalesce(F.col("price"), F.col("close")).alias("price")


def normalize_ticks(decoded: DataFrame) -> DataFrame:
    """Normalize a union-decoded tick DataFrame (schemas.TICK_UNION_SCHEMA).

    Accepts both producer shapes: ``price := coalesce(price, close)``, keeps
    the extra OHLC/source columns, parses ISO-8601 ``event_time`` (F10) and
    stamps ``created_at`` (init.sql:6).  Rows that remain invalid after
    normalization (null symbol / price / event_time) belong in the DLQ —
    the split lives in sources/dlq.py so the predicate is defined once.
    """
    return decoded.select(
        F.upper(F.col("symbol")).alias("symbol"),
        _norm_price(),
        F.col("open"),
        F.col("high"),
        F.col("low"),
        F.col("close"),
        F.col("volume").cast("long").alias("volume"),
        F.try_to_timestamp(F.col("event_time")).alias("event_time"),
        F.col("source"),
        F.current_timestamp().alias("created_at"),
    )


#: Deterministic raw-JSON corpus derived from events — exercises the wire
#: format (op S6/F11) and the DLQ split (op S8) with a mix of valid ticks,
#: truncated JSON (event_id % 7 == 0), and JSON missing all price fields
#: (event_id % 11 == 0).  The matching DuckDB fragment is RAW_JSON_SQL.
RAW_JSON_SQL = """
SELECT
  CASE
    WHEN event_id % 7 = 0 THEN '{"symbol": "' || upper(event_type)
    WHEN event_id % 11 = 0 THEN '{"symbol": "' || upper(event_type) || '"}'
    ELSE '{"symbol": "' || upper(event_type)
         || '", "price": ' || value
         || ', "volume": ' || (event_id % 15000 + 500)
         || ', "event_time": "' || CAST(ts AS VARCHAR) || '"}'
  END AS value,
  'stock.ticks.v1' AS topic,
  CAST(event_id % 3 AS INT) AS partition,
  event_id AS offset
FROM events
"""


def raw_json_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped raw records (value/topic/partition/offset) built from
    ``events`` — the batch stand-in for the reference's tick topic.

    ``fan_out`` before the JSON-build: everything downstream of this corpus
    (string concat here, ``from_json`` + the validity split in dlq.py) is
    per-row compute pipelined onto the scan, and the driver's single-row-group
    parquet would otherwise run it all in one task."""
    ev = fan_out(load_table(spark, sf_dir, "events"))
    sym = F.upper(F.col("event_type"))
    valid = F.concat(
        F.lit('{"symbol": "'), sym,
        F.lit('", "price": '), F.col("value").cast("string"),
        F.lit(', "volume": '), (F.col("event_id") % 15000 + 500).cast("string"),
        F.lit(', "event_time": "'), F.col("ts").cast("string"), F.lit('"}'),
    )
    raw = (
        F.when(F.col("event_id") % 7 == 0, F.concat(F.lit('{"symbol": "'), sym))
        .when(F.col("event_id") % 11 == 0, F.concat(F.lit('{"symbol": "'), sym, F.lit('"}')))
        .otherwise(valid)
    )
    return ev.select(
        raw.alias("value"),
        F.lit("stock.ticks.v1").alias("topic"),
        (F.col("event_id") % 3).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
    )
