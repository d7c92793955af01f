"""Rolling window-frame analytics + as-of join semantics on constructed
fixtures with hand-computed expectations."""

from __future__ import annotations

from conftest import ts

from stockpulse_batch_realtime_etl_spark.operators.asof import asof_join
from stockpulse_batch_realtime_etl_spark.operators.rolling import rolling_stats


def test_rolling_sma_and_extrema(make_ticks):
    t = make_ticks(
        [
            ("AAPL", 10.0, 1, ts(0)),
            ("AAPL", 20.0, 1, ts(1)),
            ("AAPL", 30.0, 1, ts(2)),
            ("MSFT", 5.0, 1, ts(0)),
        ]
    )
    rows = {
        (r.symbol, r.event_time): r for r in rolling_stats(t, n=2).collect()
    }
    a0, a1, a2 = (rows[("AAPL", ts(i))] for i in range(3))
    assert a0.sma == 10.0 and a0.ret is None          # first tick: no prior
    assert a1.sma == 15.0 and a1.ret == 1.0           # (20-10)/10
    assert a2.sma == 25.0 and a2.ret == 0.5           # frame = last 2 rows
    assert a2.roll_min == 20.0 and a2.roll_max == 30.0
    m = rows[("MSFT", ts(0))]
    assert m.sma == 5.0 and m.ret is None             # partitions isolated


def test_asof_join_picks_latest_preceding(spark):
    left = spark.createDataFrame(
        [
            ("A", ts(0, 30), 1),   # between bars @0 and @1 → bar 0
            ("A", ts(1, 0), 2),    # exactly at bar 1 → inclusive → bar 1
            ("A", ts(5, 0), 3),    # far after → latest bar (1)
            ("B", ts(0, 10), 4),   # no bar for B → nulls
        ],
        "symbol string, t timestamp, tick_id int",
    )
    right = spark.createDataFrame(
        [("A", ts(0), 100.0), ("A", ts(1), 200.0)],
        "symbol string, bucket timestamp, close double",
    )
    out = {
        r.tick_id: r
        for r in asof_join(left, right, "symbol", "t", "bucket", ["close"]).collect()
    }
    assert out[1].close == 100.0
    assert out[2].close == 200.0   # equal timestamp is visible (inclusive)
    assert out[3].close == 200.0   # carried forward
    assert out[4].close is None    # left join: no preceding right row
    assert len(out) == 4           # every left row exactly once


def test_asof_join_preserves_left_columns(spark):
    left = spark.createDataFrame(
        [("A", ts(2), 7, 9.9)], "symbol string, t timestamp, n int, x double"
    )
    right = spark.createDataFrame(
        [("A", ts(1), 1.0)], "symbol string, bt timestamp, v double"
    )
    (row,) = asof_join(left, right, "symbol", "t", "bt", ["v"]).collect()
    assert (row.symbol, row.t, row.n, row.x, row.v) == ("A", ts(2), 7, 9.9, 1.0)


def test_ema_matches_closed_form(make_ticks):
    import numpy as np

    from stockpulse_batch_realtime_etl_spark.operators.rolling import ema

    prices = [10.0, 12.0, 11.0, 15.0, 14.0]
    t = make_ticks(
        [("AAPL", p, 1, ts(i)) for i, p in enumerate(prices)]
        + [("MSFT", 50.0, 1, ts(0))]
    )
    rows = {
        (r.symbol, str(r.event_time)): r.ema for r in ema(t, 0.5).collect()
    }
    # closed form: EMA_t = sum_k alpha*(1-alpha)^k * p_{t-k} + (1-a)^t p_0
    e = prices[0]
    for i, p in enumerate(prices):
        if i > 0:
            e = 0.5 * p + 0.5 * e
        assert abs(rows[("AAPL", str(ts(i)))] - round(e, 6)) < 1e-9
    assert rows[("MSFT", str(ts(0)))] == 50.0  # singleton: EMA = price


def test_ema_chunked_equals_single_group(make_ticks):
    """The (symbol, chunk) split + carry stitch must reproduce the
    single-group-per-symbol recursion exactly (same 6dp rounding)."""
    import random

    from stockpulse_batch_realtime_etl_spark.operators.rolling import ema

    rng = random.Random(7)
    rows = []
    for sym in ("AAPL", "MSFT", "TSLA"):
        # 40 ticks over >3 hours: spans many 600s chunks, several ticks each
        for i in range(40):
            rows.append(
                (sym, round(100 + rng.uniform(-5, 5), 2), 1, ts(i % 60, hour=12 + i // 60))
            )
    t = make_ticks(rows)
    single = {
        (r.symbol, str(r.event_time)): r.ema
        for r in ema(t, 0.3, chunk_seconds=None).collect()
    }
    chunked = {
        (r.symbol, str(r.event_time)): r.ema
        for r in ema(t, 0.3, chunk_seconds=600).collect()
    }
    assert len(single) == len(chunked) == 120
    for k, v in single.items():
        assert abs(chunked[k] - v) < 1e-9, (k, v, chunked[k])


def test_ema_subchunk_boundary_equals_single_group(make_ticks):
    """Force rows-per-subchunk far below the row count so the renormalized
    prefix sum crosses MANY sub-chunk boundaries inside one time chunk, and
    the carry stitch runs at sub granularity — must still equal the plain
    per-symbol recursion at 6dp."""
    import random

    from stockpulse_batch_realtime_etl_spark.operators.rolling import ema

    rng = random.Random(11)
    rows = [
        ("AAPL", round(100 + rng.uniform(-5, 5), 2), 1, ts(i % 60, hour=12 + i // 60))
        for i in range(55)
    ]
    t = make_ticks(rows)
    single = {
        str(r.event_time): r.ema
        for r in ema(t, 0.3, chunk_seconds=None).collect()
    }
    # one giant time chunk, sub-chunks of 7 rows → 8 stitched sub-chunks
    chunked = {
        str(r.event_time): r.ema
        for r in ema(t, 0.3, chunk_seconds=86_400, rows_per_subchunk=7).collect()
    }
    assert len(single) == len(chunked) == 55
    for k, v in single.items():
        assert abs(chunked[k] - v) < 1e-9, (k, v, chunked[k])


def test_bollinger_bands_exact_small_case(spark):
    from stockpulse_batch_realtime_etl_spark.operators.rolling import (
        bollinger_bands,
    )

    ticks = spark.createDataFrame(
        [("A", p, 10, f"2024-01-01 09:3{i}:00") for i, p in enumerate([10.0, 12.0, 14.0])],
        "symbol string, price double, volume long, event_time string",
    ).selectExpr("symbol", "price", "volume", "CAST(event_time AS TIMESTAMP) AS event_time")
    out = sorted(
        bollinger_bands(ticks, n=3, k=2.0).collect(),
        key=lambda r: r.event_time,
    )
    # row 3: frame {10,12,14} → mid 12, var = ((100+144+196) - 36²/3)/3 = 8/3
    import math

    assert out[2].bb_mid == 12.0
    assert out[2].bb_sd == round(math.sqrt((440 - 36 * 36 / 3) / 3), 6)
    assert out[2].bb_upper == round(12.0 + 2 * out[2].bb_sd, 6)
    # row 1: single-row frame → sd 0, bands collapse onto price
    assert out[0].bb_sd == 0.0 and out[0].bb_upper == out[0].bb_mid == 10.0


def test_asof_forward_picks_earliest_following(spark):
    from stockpulse_batch_realtime_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("A", "2024-01-01 09:30:30"), ("A", "2024-01-01 09:32:00"),
         ("A", "2024-01-01 09:40:00")],
        "symbol string, t string",
    ).selectExpr("symbol", "CAST(t AS TIMESTAMP) AS t")
    right = spark.createDataFrame(
        [("A", "2024-01-01 09:31:00", 1.0), ("A", "2024-01-01 09:32:00", 2.0),
         ("A", "2024-01-01 09:33:00", 3.0)],
        "symbol string, rt string, v double",
    ).selectExpr("symbol", "CAST(rt AS TIMESTAMP) AS rt", "v")
    out = {
        str(r.t): r.v
        for r in asof_join(
            left, right, "symbol", "t", "rt", ["v"], direction="forward"
        ).collect()
    }
    assert out["2024-01-01 09:30:30"] == 1.0     # earliest following
    assert out["2024-01-01 09:32:00"] == 2.0     # equal time matches (inclusive)
    assert out["2024-01-01 09:40:00"] is None    # nothing follows


def test_return_outliers_flags_spike(spark):
    from stockpulse_batch_realtime_etl_spark.operators.rolling import (
        return_outliers,
    )

    # many tiny returns + one huge spike → only the spike flags
    prices = [100.0 + 0.01 * i for i in range(30)] + [200.0, 202.0]
    rows = [
        ("A", p, 10, f"2024-01-01 09:{30 + i // 60:02d}:{i % 60:02d}")
        for i, p in enumerate(prices)
    ]
    ticks = spark.createDataFrame(
        rows, "symbol string, price double, volume long, event_time string"
    ).selectExpr(
        "symbol", "price", "volume", "CAST(event_time AS TIMESTAMP) AS event_time"
    )
    out = return_outliers(ticks, 3.0).collect()
    flagged = [r for r in out if r.is_outlier]
    assert len(flagged) == 1 and abs(flagged[0].ret - 1.0) < 0.02  # the 100→200 jump
    assert all(r.z is not None for r in out)
