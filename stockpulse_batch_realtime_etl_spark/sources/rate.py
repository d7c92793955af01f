"""Simulated tick producer (op S1) as a Spark ``rate`` stream.

The reference's producer emits one random-walk tick every 2 s: a random
symbol from a fixed list, price = per-symbol base + uniform drift ±0.5
(cumulative in the reference; memoryless here — same distribution family,
stateless by design so the stream is a pure function of (timestamp, value)),
volume ~ U(500, 15000), now() timestamp (producer.py:66-93).

``rate`` → deterministic column mapping keeps everything JVM-side and
replayable: every derived field is seeded md5/pmod arithmetic over the rate
source's monotonically increasing ``value``, so two runs at the same offsets
produce identical ticks (useful for checkpoint/recovery tests; the
reference's ``random`` is unseeded, producer.py:82).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: producer.py:20-29 — the reference's symbol universe and base prices.
BASE_PRICES: dict[str, float] = {
    "AAPL": 190.0,
    "MSFT": 420.0,
    "GOOG": 175.0,
    "AMZN": 185.0,
    "TSLA": 250.0,
    "NVDA": 1150.0,
}


def _hash_unit(value: Column, salt: str) -> Column:
    """Deterministic pseudo-uniform double in [0, 1) from a long column."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), value.cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(16**8))
    )


def tick_columns(value: Column, ts: Column) -> list[Column]:
    """The S1 tick shape from a (value, timestamp) pair."""
    symbols = list(BASE_PRICES)
    sym = F.element_at(
        F.array(*[F.lit(s) for s in symbols]),
        (F.pmod(value, F.lit(len(symbols))) + 1).cast("int"),
    )
    base = F.element_at(
        F.array(*[F.lit(BASE_PRICES[s]) for s in symbols]),
        (F.pmod(value, F.lit(len(symbols))) + 1).cast("int"),
    )
    price = F.round(base + (_hash_unit(value, "drift") - 0.5), 2)
    volume = (F.lit(500) + (_hash_unit(value, "vol") * 14500).cast("long")).alias(
        "volume"
    )
    return [
        sym.alias("symbol"),
        price.alias("price"),
        volume,
        ts.alias("event_time"),
    ]


def simulated_tick_stream(
    spark: SparkSession, rows_per_second: int = 1
) -> DataFrame:
    """Streaming S1 source: ``rate`` → tick schema.  The reference's cadence
    is 0.5 ticks/s (PRODUCE_INTERVAL=2, producer.py:18) — the rate source
    takes integer rows/s, so 1/s is the closest setting; any rate works.
    The point of moving generation into the engine is that load tests just
    turn this dial (the reference would need a process per 0.5 t/s)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(int(rows_per_second)))
        .load()
    )
    return rate.select(*tick_columns(F.col("value"), F.col("timestamp")))


def simulated_tick_batch(
    spark: SparkSession, n: int, start_ts: str = "2024-01-15 12:00:00"
) -> DataFrame:
    """Batch flavor of S1 (same columns, ``spark.range`` instead of rate) —
    deterministic fixture generator for tests and backfills."""
    return spark.range(n).select(
        *tick_columns(
            F.col("id"),
            F.to_timestamp(F.lit(start_ts)) + F.make_interval(secs=F.col("id") * 2),
        )
    )
