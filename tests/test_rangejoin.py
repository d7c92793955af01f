"""Range-join semantics: half-open containment, overlap fan-out, bucket
boundaries, and the no-cartesian plan guarantee."""

from __future__ import annotations

from datetime import datetime

from stockpulse_batch_realtime_etl_spark.operators.rangejoin import range_join
from stockpulse_batch_realtime_etl_spark.plans import assertions as P


def ts(minute, second=0, hour=12):
    return datetime(2024, 1, 2, hour, minute, second)


def _intervals(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, win_start timestamp, win_end timestamp"
    )


def test_half_open_containment_and_bucket_crossing(spark, make_ticks):
    pts = make_ticks(
        [
            ("A", 1.0, 1, ts(0)),   # == start → in
            ("A", 2.0, 1, ts(59)),  # just before end → in
            ("A", 3.0, 1, ts(0, hour=13)),  # == end → OUT (half-open)
            ("A", 4.0, 1, ts(0, hour=11)),  # before start → out
            ("B", 5.0, 1, ts(30)),  # wrong key → out
        ]
    )
    iv = _intervals(spark, [("A", ts(0), ts(0, hour=13))])  # [12:00, 13:00)
    # bucket far smaller than the interval: forces multi-bucket expansion
    out = range_join(
        pts, iv, "symbol", "event_time", "win_start", "win_end", 300
    ).collect()
    assert sorted(r.price for r in out) == [1.0, 2.0]


def test_overlapping_intervals_fan_out_not_duplicate(spark, make_ticks):
    pts = make_ticks([("A", 1.0, 1, ts(10))])
    iv = _intervals(
        spark,
        [
            ("A", ts(0), ts(20)),   # contains the point
            ("A", ts(5), ts(15)),   # also contains it (overlap)
            ("A", ts(11), ts(20)),  # does not
        ],
    )
    out = range_join(
        pts, iv, "symbol", "event_time", "win_start", "win_end", 60
    ).collect()
    # one row per CONTAINING interval — never per covered bucket
    assert len(out) == 2
    assert sorted(str(r.win_start) for r in out) == [str(ts(0)), str(ts(5))]


def test_empty_interval_matches_nothing(spark, make_ticks):
    pts = make_ticks([("A", 1.0, 1, ts(0))])
    iv = _intervals(
        spark,
        [("A", ts(0), ts(0)), ("A", ts(10), ts(5))],  # empty + inverted
    )
    out = range_join(
        pts, iv, "symbol", "event_time", "win_start", "win_end", 60
    ).collect()
    assert out == []


def test_range_join_plans_equi_join_not_cartesian(spark, make_ticks):
    pts = make_ticks([("A", 1.0, 1, ts(0))])
    iv = _intervals(spark, [("A", ts(0), ts(30))])
    df = range_join(pts, iv, "symbol", "event_time", "win_start", "win_end", 600)
    P.assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
