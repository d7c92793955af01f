"""Edge semantics of the analytics operator classes (operators/analytics.py):
VWAP null/zero-volume guards, RANGE-frame time windows, moment-derived
statistics vs numpy, grouped top-k tie-breaks, pivot zero-fill, and the
set-operation day classification."""

from __future__ import annotations

import math

from conftest import ts

from stockpulse_batch_realtime_etl_spark.operators.analytics import (
    hourly_symbol_pivot,
    notable_days,
    stats_summary,
    time_range_stats,
    top_bars_per_day,
    vwap_bars,
)


def test_vwap_weighted_and_zero_volume_guard(make_ticks):
    t = make_ticks(
        [
            ("AAPL", 10.0, 100, ts(5, 10)),
            ("AAPL", 20.0, 300, ts(5, 50)),    # vwap = (10*100+20*300)/400
            ("MSFT", 50.0, None, ts(5, 10)),   # null volume → 0 → NULL vwap
        ]
    )
    rows = {r.symbol: r for r in vwap_bars(t).collect()}
    assert rows["AAPL"].vwap == 17.5
    assert rows["AAPL"].turnover == 7000.0
    assert rows["AAPL"].volume_sum == 400
    assert rows["MSFT"].vwap is None and rows["MSFT"].volume_sum == 0


def test_time_range_frame_bounds_and_peers(make_ticks):
    t = make_ticks(
        [
            ("AAPL", 10.0, 1, ts(0)),
            ("AAPL", 20.0, 2, ts(10)),     # exactly 10 min later → in frame
            ("AAPL", 30.0, 4, ts(21)),     # >10 min after both → alone
            ("AAPL", 40.0, 8, ts(21)),     # equal-timestamp peer: same frame
        ]
    )
    rows = sorted(
        time_range_stats(t, 10).collect(), key=lambda r: (r.event_time, r.price)
    )
    assert rows[0].range_tick_count == 1 and rows[0].range_avg_price == 10.0
    assert rows[1].range_tick_count == 2 and rows[1].range_avg_price == 15.0
    # both 12:21 peers see BOTH 12:21 rows (RANGE peers) and neither earlier
    assert rows[2].range_tick_count == 2 and rows[2].range_avg_price == 35.0
    assert rows[3].range_tick_count == 2 and rows[3].range_volume_sum == 12


def test_stats_summary_matches_numpy(make_ticks):
    import numpy as np

    prices = [10.0, 12.5, 11.0, 14.0, 9.5, 13.25]
    vols = [100, 200, None, 150, 300, 250]
    t = make_ticks(
        [("AAPL", p, v, ts(i)) for i, (p, v) in enumerate(zip(prices, vols))]
    )
    r = stats_summary(t).collect()[0]
    assert r.tick_count == 6
    assert math.isclose(r.var_price, np.var(prices, ddof=1), abs_tol=1e-6)
    px = [p for p, v in zip(prices, vols) if v is not None]
    pv = [float(v) for v in vols if v is not None]
    assert math.isclose(
        r.corr_price_volume, np.corrcoef(px, pv)[0, 1], abs_tol=1e-6
    )
    assert math.isclose(
        r.p50_price, float(np.percentile(prices, 50)), abs_tol=1e-6
    )


def test_top_bars_per_day_rank_and_tiebreak(spark):
    bars = spark.createDataFrame(
        [
            ("A", ts(1), 100),
            ("B", ts(2), 300),
            ("C", ts(3), 200),
            ("D", ts(4), 300),  # ties B on volume → B first (symbol asc)
            ("E", ts(5), 50),
        ],
        "symbol string, bucket_start timestamp, volume_sum long",
    )
    rows = top_bars_per_day(bars, 3).collect()
    assert [(r.day_rank, r.symbol) for r in rows] == [(1, "B"), (2, "D"), (3, "C")]


def test_pivot_fills_absent_symbols_with_zero(make_ticks):
    t = make_ticks(
        [("CLICK", 1.0, 1, ts(0, hour=9)), ("VIEW", 1.0, 1, ts(0, hour=9))]
    )
    r = hourly_symbol_pivot(t).collect()[0]
    assert r.hour_of_day == 9
    assert (r.CLICK, r.VIEW, r.ERROR, r.PURCHASE, r.SIGNUP) == (1, 1, 0, 0, 0)


def test_notable_days_set_classification(make_ticks):
    # Day 15: AAPL volatile (wide range) but light volume; MSFT heavy + flat;
    # day 16: AAPL volatile AND heavy → 'both'.
    import datetime as dt

    def at(day, minute):
        return dt.datetime(2024, 1, day, 12, minute)

    t = make_ticks(
        [
            ("AAPL", 10.0, 1, at(15, 0)),
            ("AAPL", 30.0, 1, at(15, 30)),       # rr=2.0, vol=2
            ("MSFT", 100.0, 1000, at(15, 0)),
            ("MSFT", 100.1, 1000, at(15, 30)),   # rr≈0.001, vol=2000
            ("AAPL", 10.0, 1500, at(16, 0)),
            ("AAPL", 25.0, 1500, at(16, 30)),    # rr=1.5, vol=3000
        ]
    )
    rows = {(r.tag, r.symbol, str(r.day)) for r in notable_days(t).collect()}
    assert ("volatile_only", "AAPL", "2024-01-15") in rows
    assert ("both", "AAPL", "2024-01-16") in rows
    assert not any(r[1] == "MSFT" for r in rows if r[0] != "heavy")


def test_histogram_buckets_and_constant_price(make_ticks):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        price_histogram,
    )

    t = make_ticks(
        [("AAPL", float(p), 1, ts(p)) for p in range(10, 30)]  # 10..29
        + [("FLAT", 5.0, 1, ts(0)), ("FLAT", 5.0, 1, ts(1))]
    )
    rows = price_histogram(t, 4).collect()
    aapl = {r.bucket: r for r in rows if r.symbol == "AAPL"}
    assert set(aapl) == {0, 1, 2, 3}
    assert aapl[3].bucket_max == 29.0  # max price clamps INTO last bucket
    flat = [r for r in rows if r.symbol == "FLAT"]
    assert len(flat) == 1 and flat[0].bucket == 0 and flat[0].n == 2


def test_deciles_equal_counts(make_ticks):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        price_deciles,
    )

    t = make_ticks([("AAPL", float(i), 1, ts(i % 60, i // 60)) for i in range(100)])
    rows = price_deciles(t).collect()
    assert len(rows) == 10
    assert all(r.n == 10 for r in rows)
    d1 = next(r for r in rows if r.decile == 1)
    assert (d1.lo, d1.hi) == (0.0, 9.0)


def test_symbol_correlations_perfect_and_anti(make_ticks):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        symbol_correlations,
    )
    from stockpulse_batch_realtime_etl_spark.operators.ohlcv import ohlcv_bars

    t = make_ticks(
        [("A", float(i), 1, ts(i)) for i in range(1, 6)]
        + [("B", 2.0 * i + 1, 1, ts(i)) for i in range(1, 6)]   # corr(A,B)=1
        + [("C", 10.0 - i, 1, ts(i)) for i in range(1, 6)]      # corr(A,C)=-1
    )
    rows = {(r.sym_a, r.sym_b): r for r in symbol_correlations(ohlcv_bars(t)).collect()}
    assert rows[("A", "B")].close_corr == 1.0
    assert rows[("A", "C")].close_corr == -1.0
    assert rows[("A", "B")].aligned_minutes == 5


# --- sessionization ----------------------------------------------------------

def test_user_sessions_gap_split(spark):
    import datetime as dt

    rows = [
        # user 1: two events 5 min apart (one session), then 40-min gap
        (1, dt.datetime(2024, 1, 15, 12, 0, 0), 100, "view", 1.0, '{"k": 2}'),
        (2, dt.datetime(2024, 1, 15, 12, 5, 0), 100, "click", 2.0, '{"k": 3}'),
        (3, dt.datetime(2024, 1, 15, 12, 45, 0), 100, "view", 4.0, '{"k": 5}'),
        # user 2: single event
        (4, dt.datetime(2024, 1, 15, 12, 1, 0), 200, "view", 8.0, '{"k": 7}'),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        user_sessions,
    )

    out = {(r.user_id, r.session_id): r for r in user_sessions(ev, 30).collect()}
    assert set(out) == {(100, 1), (100, 2), (200, 1)}
    s1 = out[(100, 1)]
    assert s1.n_events == 2 and s1.n_event_types == 2
    assert s1.total_value == 3.0 and s1.k_sum == 5
    assert s1.session_start == dt.datetime(2024, 1, 15, 12, 0, 0)
    assert s1.session_end == dt.datetime(2024, 1, 15, 12, 5, 0)
    s2 = out[(100, 2)]
    assert s2.n_events == 1 and s2.k_sum == 5 and s2.total_value == 4.0


def test_user_sessions_exact_gap_is_same_session(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 15, 12, 0, 0), 1, "view", 1.0, '{"k": 0}'),
        (2, dt.datetime(2024, 1, 15, 12, 30, 0), 1, "view", 1.0, '{"k": 0}'),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        user_sessions,
    )

    out = user_sessions(ev, 30).collect()
    assert len(out) == 1 and out[0].n_events == 2  # gap is STRICTLY greater


def test_table_profile_stats(spark):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        table_profile,
    )

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", None), (2, None, 4.0)],
        "k long, s string, v double",
    )
    out = {r.column: r for r in table_profile(df).collect()}
    assert set(out) == {"k", "s", "v"}
    k = out["k"]
    assert (k.n_rows, k.n_null, k.n_distinct) == (3, 0, 2)
    assert (k.min_num, k.max_num) == (1.0, 2.0)
    assert k.min_str is None and k.min_ts is None
    s = out["s"]
    assert (s.n_null, s.n_distinct, s.min_str, s.max_str) == (1, 2, "a", "b")
    v = out["v"]
    assert (v.n_null, v.min_num, v.max_num) == (1, 2.0, 4.0)


def test_missing_minutes_counts_gaps(spark):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        missing_minutes,
    )

    ticks = spark.createDataFrame(
        [
            ("A", 1.0, 10, "2024-01-01 09:30:10"),
            ("A", 2.0, 10, "2024-01-01 09:31:20"),
            ("A", 3.0, 10, "2024-01-01 09:34:00"),  # 09:32,09:33 silent
            ("B", 1.0, 10, "2024-01-01 09:30:00"),
        ],
        "symbol string, price double, volume long, event_time string",
    ).selectExpr("symbol", "price", "volume", "CAST(event_time AS TIMESTAMP) AS event_time")
    out = {r.symbol: r for r in missing_minutes(ticks).collect()}
    a = out["A"]
    assert (a.active_minutes, a.expected_minutes, a.missing_minutes) == (3, 5, 2)
    b = out["B"]
    assert (b.active_minutes, b.expected_minutes, b.missing_minutes) == (1, 1, 0)


def test_funnel_counts_strict_ordering(spark):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        funnel_counts,
    )

    rows = [
        # user 1: full funnel in order
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:01:00"),
        (1, "purchase", "2024-01-01 10:02:00"),
        # user 2: clicked BEFORE first view → click doesn't count
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        # user 3: view only
        (3, "view", "2024-01-01 10:00:00"),
        # user 4: purchase without any view → reaches nothing
        (4, "purchase", "2024-01-01 10:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).selectExpr("user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts")
    out = {r.step: r.n_users for r in funnel_counts(ev).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_cohort_retention_offsets(spark):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        cohort_retention,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),  # cohort wk of Jan 1
        (1, "2024-01-09 10:00:00"),  # active wk offset 1
        (2, "2024-01-02 10:00:00"),  # same cohort
        (3, "2024-01-09 10:00:00"),  # cohort wk of Jan 8
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts", "'x' AS event_type"
    )
    out = {
        (str(r.cohort_period), r.period_offset): r.n_users
        for r in cohort_retention(ev, "week").collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_symbol_beta_equal_weight_identity(spark):
    """With the symbol itself inside the equal-weight index, betas average
    to 1 across symbols when every minute has all symbols aligned — here we
    assert the weaker invariants that hold for ragged alignment too."""
    from stockpulse_batch_realtime_etl_spark.operators.analytics import symbol_beta
    from stockpulse_batch_realtime_etl_spark.operators.ohlcv import ohlcv_bars
    from stockpulse_batch_realtime_etl_spark.sources.ticks import ticks_from_events

    from pyspark.sql import functions as F

    bars = ohlcv_bars(ticks_from_events(spark, "/root/testdata/sf0.001"))
    out = {r["symbol"]: r for r in symbol_beta(bars).collect()}
    assert len(out) == 5
    for r in out.values():
        assert r["n_periods"] > 0
        assert r["mkt_corr"] is None or -1.0 <= r["mkt_corr"] <= 1.0
    # a single-symbol universe regresses on itself: beta 1, alpha 0, r 1
    one = bars.filter(F.col("symbol") == "PURCHASE")
    solo = symbol_beta(one).collect()[0]
    assert solo["beta"] == 1.0 and solo["alpha"] == 0.0 and solo["mkt_corr"] == 1.0


def test_event_transitions_rows_are_probabilities(spark):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        event_transitions,
    )
    from stockpulse_batch_realtime_etl_spark.sources.tables import load_table

    out = event_transitions(load_table(spark, "/root/testdata/sf0.001", "events"))
    rows = out.collect()
    assert rows
    by_src = {}
    for r in rows:
        assert r["n_transitions"] > 0 and 0.0 < r["p_transition"] <= 1.0
        by_src.setdefault(r["from_event"], 0.0)
        by_src[r["from_event"]] += r["p_transition"]
    for s, tot in by_src.items():
        assert abs(tot - 1.0) < 1e-4, (s, tot)


def test_rfm_segments_scores_quartile_invariants(spark):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import rfm_segments
    from stockpulse_batch_realtime_etl_spark.sources.tables import load_table

    out = rfm_segments(load_table(spark, "/root/testdata/sf0.001", "events"))
    rows = out.collect()
    assert rows
    for r in rows:
        for k in ("r_score", "f_score", "m_score"):
            assert 1 <= r[k] <= 4
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
        assert r["recency_us"] >= 0
    # someone bought most recently: their recency is 0 and r_score is max
    best = min(rows, key=lambda r: r["recency_us"])
    assert best["recency_us"] == 0 and best["r_score"] == 4
    # each quartile band is populated for frequency unless degenerate ties
    fs = {r["f_score"] for r in rows}
    assert len(fs) >= 2


def test_approx_percentile_within_tolerance_of_exact(spark):
    """The sketch swap-in documented for extreme cardinalities
    (`approx_percentile`, like lang_vocab's HLL note): measured accuracy
    against the exact interpolated percentile on real tick prices.
    Engine-specific sketches are never oracle-gated — this pins them."""
    from pyspark.sql import functions as F
    from stockpulse_batch_realtime_etl_spark.sources.ticks import ticks_from_events

    t = ticks_from_events(spark, "/root/testdata/sf0.001")
    rows = (
        t.groupBy("symbol")
        .agg(
            F.expr("approx_percentile(price, array(0.5, 0.95), 1000)").alias("ap"),
            F.percentile("price", F.lit(0.5)).alias("p50"),
            F.percentile("price", F.lit(0.95)).alias("p95"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        spread = max(r["p95"], 1e-9)
        assert abs(r["ap"][0] - r["p50"]) / spread < 0.05, r
        assert abs(r["ap"][1] - r["p95"]) / spread < 0.05, r


def test_weekday_hour_profile_arithmetic_dow(spark, make_ticks):
    """The arithmetic weekday ((epoch_days+4)%7, 0=Sunday) must agree with
    the calendar: 1970-01-05 was a Monday."""
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        weekday_hour_profile,
    )
    import datetime as dt

    t = make_ticks(
        [
            ("A", 10.0, 5, dt.datetime(1970, 1, 5, 13, 30)),   # Monday
            ("A", 12.0, 5, dt.datetime(1970, 1, 5, 13, 45)),   # Monday, same hr
            ("A", 20.0, None, dt.datetime(1970, 1, 4, 9, 0)),  # Sunday
        ]
    )
    out = {(r["weekday"], r["hour"]): r for r in weekday_hour_profile(t).collect()}
    assert set(out) == {(1, 13), (0, 9)}
    mon = out[(1, 13)]
    assert mon["tick_count"] == 2 and mon["avg_price"] == 11.0
    assert mon["volume_sum"] == 10
    assert out[(0, 9)]["volume_sum"] == 0  # null volume coalesces


def test_stats_summary_degenerate_symbols_yield_nulls_not_aborts(make_ticks):
    """One tick → NULL variance/stddev/covar/corr (not an ANSI
    DIVIDE_BY_ZERO job abort); constant price → variance exactly 0 and
    stddev 0 (the cancellation residue is clamped before the sqrt);
    constant volume → NULL correlation (zero denominator)."""
    import datetime as dt

    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        stats_summary,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = (
        [("ONE", 5.0, 10, t0)]
        + [("FLAT", 0.01, 10 + i, t0 + dt.timedelta(seconds=i)) for i in range(5)]
        + [("CVOL", 1.0 + i, 7, t0 + dt.timedelta(seconds=i)) for i in range(5)]
    )
    out = {r.symbol: r for r in stats_summary(make_ticks(rows)).collect()}
    one = out["ONE"]
    assert one.tick_count == 1
    assert one.var_price is None and one.stddev_price is None
    assert one.covar_price_volume is None and one.corr_price_volume is None
    flat = out["FLAT"]
    assert flat.var_price == 0.0 and flat.stddev_price == 0.0
    cvol = out["CVOL"]
    assert cvol.corr_price_volume is None  # zero volume variance
    assert cvol.var_price is not None and cvol.var_price > 0


def test_funnel_and_cohort_parameter_validation(spark):
    import pytest as _pytest

    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        cohort_retention,
        funnel_counts,
    )

    ev = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp"
    )
    with _pytest.raises(ValueError, match="steps"):
        funnel_counts(ev, steps=())
    with _pytest.raises(ValueError, match="unit"):
        cohort_retention(ev, unit="month")


def test_table_profile_100_columns_bounded_plan(spark):
    """Wide-table stress (the r5 hazard, fanned out in r6): at 100 columns
    the profile must still be ONE scan + a CONSTANT number of exchanges —
    per-column work rides the single Expand-based aggregate, never
    per-column jobs or a plan that widens with the schema."""
    from pyspark.sql import functions as F
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        table_profile,
    )
    from stockpulse_batch_realtime_etl_spark.plans import assertions as P

    base = spark.range(500).withColumnRenamed("id", "c0")
    wide = base.withColumns(
        {
            f"c{i}": (
                F.col("c0") % i
                if i % 3 == 0
                else (
                    F.concat(F.lit("s"), (F.col("c0") % i).cast("string"))
                    if i % 3 == 1
                    else (F.col("c0") * i).cast("double")
                )
            )
            for i in range(1, 100)
        }
    )
    assert len(wide.columns) == 100

    out = table_profile(wide)
    plan = P.formatted_plan(out)
    n_scans = plan.count("Scan ") + plan.count("* Range")
    n_exchanges = plan.count("Exchange")
    assert n_scans <= 1, f"profile must be one scan, saw {n_scans}"
    # fan-out round-robin + the Expand-based distinct-aggregate phases: a
    # CONSTANT (4 on this Spark), and — the actual wide-table guarantee —
    # identical to a 10-column profile's count, never a function of width
    assert n_exchanges <= 4, plan
    narrow_plan = P.formatted_plan(
        table_profile(wide.select(*[f"c{i}" for i in range(10)]))
    )
    assert n_exchanges == narrow_plan.count("Exchange")

    rows = {r.column: r for r in out.collect()}
    assert len(rows) == 100
    # spot-check typed slots across the three column kinds
    assert rows["c3"].n_rows == 500 and rows["c3"].n_distinct == 3
    assert rows["c4"].min_str == "s0" and rows["c4"].n_null == 0
    assert rows["c5"].max_num == 499.0 * 5
