from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from stockpulse_batch_realtime_etl_spark.session import get_spark  # noqa: E402

UTC = dt.timezone.utc


def ts(minute: int, second: int = 0, hour: int = 12) -> dt.datetime:
    """Naive-UTC timestamp helper: 2024-01-15 {hour}:{minute}:{second}."""
    return dt.datetime(2024, 1, 15, hour, minute, second)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="stockpulse-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def make_ticks(spark):
    """Build a ticks DataFrame from (symbol, price, volume, event_time) rows."""

    def _make(rows):
        return spark.createDataFrame(
            rows, "symbol string, price double, volume long, event_time timestamp"
        )

    return _make


@pytest.fixture(scope="session")
def make_docs(spark):
    def _make(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )

    return _make
