"""Bucketed window frames (operators/frames.py) must be EXACTLY equal to
the plain per-symbol windows they replace — same rows, same values, across
bucket boundaries, sparse buckets, and carry chains several buckets long."""

from __future__ import annotations

import random

from conftest import ts

from stockpulse_batch_realtime_etl_spark.operators.analytics import time_range_stats
from stockpulse_batch_realtime_etl_spark.operators.ohlcv import gapfill_bars
from stockpulse_batch_realtime_etl_spark.operators.rolling import rolling_stats


def _ticks_rows():
    rng = random.Random(11)
    rows = []
    for sym in ("AAPL", "MSFT"):
        # irregular arrivals over ~3 hours, incl. a silent hour (sparse
        # bucket) so a row-frame carry must reach >1 bucket back
        minutes = [0, 1, 1, 2, 5, 9, 10, 30, 31, 32, 55]
        minutes += [m + 120 for m in (0, 1, 2, 3, 40, 59)]
        for i, m in enumerate(minutes):
            vol = None if i % 5 == 4 else rng.randrange(1, 500)
            rows.append(
                (sym, round(100 + rng.uniform(-3, 3), 2), vol,
                 ts(m % 60, hour=12 + m // 60))
            )
    return rows


def _collect(df, keyc=("symbol", "event_time")):
    out = {}
    for r in df.collect():
        d = r.asDict()
        key = tuple(str(d[k]) for k in keyc) + (str(d.get("price", "")),
                                                str(d.get("volume", "")))
        assert key not in out or out[key] == d, f"dup key {key}"
        out[key] = d
    return out


def test_rolling_stats_bucketed_equals_plain(make_ticks):
    t = make_ticks(_ticks_rows())
    plain = _collect(rolling_stats(t, 5, bucket_seconds=None))
    buck = _collect(rolling_stats(t, 5, bucket_seconds=600))
    assert len(plain) == len(buck)
    assert plain == buck


def test_time_range_stats_bucketed_equals_plain(make_ticks):
    t = make_ticks(_ticks_rows())
    plain = _collect(time_range_stats(t, 10, bucket_seconds=None))
    buck = _collect(time_range_stats(t, 10, bucket_seconds=600))
    assert len(plain) == len(buck)
    assert plain == buck


def test_gapfill_bucketed_equals_plain(spark):
    rows = []
    for sym in ("AAPL", "MSFT"):
        # bars with multi-hour gaps: carry must cross several 600s buckets
        for m, c in [(0, 10.0), (2, 11.0), (59, 12.5)]:
            rows.append((sym, ts(m, hour=9), c, 100))
        rows.append((sym, ts(30, hour=14), 15.0, 50))
    bars = spark.createDataFrame(
        rows, "symbol string, bucket_start timestamp, close double, volume_sum long"
    )
    keyc = ("symbol", "bucket_start")
    plain = {}
    for r in gapfill_bars(bars, bucket_seconds=None).collect():
        plain[(r.symbol, str(r.bucket_start))] = (
            r.close_filled, r.volume_sum, r.is_gap
        )
    buck = {}
    for r in gapfill_bars(bars, bucket_seconds=600).collect():
        buck[(r.symbol, str(r.bucket_start))] = (
            r.close_filled, r.volume_sum, r.is_gap
        )
    assert len(plain) == len(buck) > 600  # dense minute grid over >5h
    assert plain == buck


def test_rsi_bucketed_equals_plain(make_ticks):
    from stockpulse_batch_realtime_etl_spark.operators.rolling import rsi

    t = make_ticks(_ticks_rows())
    plain = _collect(rsi(t, 5, bucket_seconds=None), keyc=("symbol", "event_time"))
    buck = _collect(rsi(t, 5, bucket_seconds=600), keyc=("symbol", "event_time"))
    assert len(plain) == len(buck)
    assert plain == buck


def test_donchian_bucketed_equals_plain(make_ticks):
    from stockpulse_batch_realtime_etl_spark.operators.rolling import (
        donchian_breakouts,
    )

    t = make_ticks(_ticks_rows())
    plain = _collect(donchian_breakouts(t, 5, bucket_seconds=None))
    buck = _collect(donchian_breakouts(t, 5, bucket_seconds=600))
    assert len(plain) == len(buck)
    assert plain == buck


def test_obv_two_pass_equals_plain_window(make_ticks):
    from stockpulse_batch_realtime_etl_spark.operators.rolling import obv

    t = make_ticks(_ticks_rows())
    plain = _collect(obv(t, bucket_seconds=None))
    buck = _collect(obv(t, bucket_seconds=600))
    assert len(plain) == len(buck)
    assert plain == buck
    # OBV is a running signed-volume sum: last row per symbol equals the
    # direct per-symbol flow total (integer-exact, no tolerance)
    assert any(d["obv"] != 0 for d in plain.values())


def test_max_drawdown_two_pass_equals_plain(make_ticks):
    from stockpulse_batch_realtime_etl_spark.operators.rolling import (
        max_drawdown,
    )

    t = make_ticks(_ticks_rows())
    plain = {
        r["symbol"]: r.asDict()
        for r in max_drawdown(t, bucket_seconds=None).collect()
    }
    buck = {
        r["symbol"]: r.asDict()
        for r in max_drawdown(t, bucket_seconds=600).collect()
    }
    assert plain == buck
    for d in plain.values():
        assert d["max_drawdown"] <= 0.0
        assert d["trough_price"] <= d["peak_price"]
        assert d["peak_price"] <= d["all_time_high"]
