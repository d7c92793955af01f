"""Batch yfinance connector (reference S3/S4) with a recorded fixture.

The reference's producer (services/producer/producer_yfinance.py:63-157)
polls ``yf.download`` for a wide per-symbol OHLCV frame and emits ticks of
shape ``{symbol, open, high, low, close, volume, event_time, source}`` —
no ``price`` field; downstream the engine treats ``price := close``
(normalize_ticks, SURVEY.md §1.2).

Live network access is out of correctness scope, so the connector is
driven by a RECORDED fixture replicating the yf.download row shape
(cached mode ``source='yfinance'``, poll mode ``'yfinance_poll'``,
producer_yfinance.py:100-109 / 139-147).  When the real library is
importable the same code path accepts its frames — the seam is one
function argument, not a fork.

Scale note: a market-data poll is dimension-sized (symbols × minutes),
so driver-side pandas → ``createDataFrame`` is the right shape; the big
side is always the stored tick/bar tables this feed appends to.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from stockpulse_batch_realtime_etl_spark.schemas import TICK_UNION_SCHEMA
from stockpulse_batch_realtime_etl_spark.sources.ticks import normalize_ticks

#: Recorded yf.download-shaped rows: one per (symbol, minute), wide OHLCV,
#: ISO-8601 UTC event_time, no ``price`` key — exactly the wire shape the
#: reference's consumer dead-letters and ours normalizes.
YFINANCE_FIXTURE: list[dict[str, Any]] = [
    {"symbol": "AAPL", "open": 189.10, "high": 189.55, "low": 188.90,
     "close": 189.32, "volume": 1_204_500,
     "event_time": "2024-01-15T14:30:00+00:00", "source": "yfinance"},
    {"symbol": "AAPL", "open": 189.32, "high": 189.80, "low": 189.21,
     "close": 189.77, "volume": 980_200,
     "event_time": "2024-01-15T14:31:00+00:00", "source": "yfinance"},
    {"symbol": "MSFT", "open": 390.00, "high": 390.45, "low": 389.60,
     "close": 390.12, "volume": 640_100,
     "event_time": "2024-01-15T14:30:00+00:00", "source": "yfinance"},
    {"symbol": "msft", "open": 390.12, "high": 391.02, "low": 390.05,
     "close": 390.88, "volume": 712_800,
     "event_time": "2024-01-15T14:31:00+00:00", "source": "yfinance_poll"},
    {"symbol": "GOOG", "open": 142.50, "high": 142.71, "low": 142.33,
     "close": 142.60, "volume": 410_900,
     "event_time": "2024-01-15T14:30:00+00:00", "source": "yfinance_poll"},
]


def fetch_live(symbols: list[str]) -> list[dict[str, Any]] | None:
    """Fetch one wide row per symbol via yfinance, or None when the library
    (or the network) is unavailable — callers fall back to the fixture."""
    try:  # pragma: no cover - yfinance not installed in the test container
        import yfinance as yf
    except ImportError:
        return None
    data = yf.download(  # pragma: no cover
        " ".join(symbols), period="1d", interval="1m",
        progress=False, group_by="ticker",
    )
    if data is None or data.empty:  # pragma: no cover
        return None
    rows: list[dict[str, Any]] = []  # pragma: no cover
    for sym in symbols:  # pragma: no cover
        latest = data[sym].dropna().iloc[-1]
        rows.append({
            "symbol": sym,
            "open": round(float(latest["Open"]), 2),
            "high": round(float(latest["High"]), 2),
            "low": round(float(latest["Low"]), 2),
            "close": round(float(latest["Close"]), 2),
            "volume": int(latest["Volume"]),
            "event_time": latest.name.isoformat(),
            "source": "yfinance",
        })
    return rows  # pragma: no cover


def yfinance_ticks(
    spark: SparkSession, rows: list[dict[str, Any]] | None = None
) -> DataFrame:
    """Wide yfinance rows → normalized tick DataFrame (price := close).

    ``rows=None`` uses the recorded fixture.  Output matches the stored
    tick model: uppercased symbol, parsed timestamp, OHLC retained.
    """
    rows = YFINANCE_FIXTURE if rows is None else rows
    wide = spark.createDataFrame(
        [
            tuple(r.get(f.name) for f in TICK_UNION_SCHEMA.fields)
            for r in rows
        ],
        TICK_UNION_SCHEMA,
    )
    return normalize_ticks(wide)
