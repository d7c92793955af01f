"""OHLCV 1-minute bar aggregation — the engine's flagship operator.

Reference: AGGREGATE_SQL (aggregator.py:26-39) —

    GROUP BY symbol, date_trunc('minute', event_time) producing
    open  = (array_agg(price ORDER BY event_time ASC))[1]     -- op A2
    high  = MAX(price)                                        -- A3
    low   = MIN(price)                                        -- A3
    close = (array_agg(price ORDER BY event_time DESC))[1]    -- A2
    volume_sum = SUM(COALESCE(volume, 0))                     -- A4
    tick_count = COUNT(*)                                     -- A5

Spark restatement: ``min_by``/``max_by`` replace the ordered-array-agg trick —
they are single-pass, order-insensitive aggregates that survive partial/final
split (map-side combine), so the whole bar aggregation is ONE hash-aggregate
with no sort and no window function.  At 100 TB this matters: the shuffle
carries only partially-combined per-(symbol, minute) state, not raw ticks.

Tie behavior on equal event_time is nondeterministic in BOTH systems (the
reference's array_agg ordering is equally unstable on ties — SURVEY.md §7);
fixtures keep timestamps unique within a group.

The same aggregate-expression list serves the batch path (this module) and
the streaming path (streaming/job.py groups by ``window(event_time, "1
minute")`` instead of ``date_trunc`` — identical semantics for tumbling 1-min
windows, SURVEY.md op F1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Aggregate expressions shared by the batch and streaming bar paths.
def bar_agg_exprs(
    price: str = "price", event_time: str = "event_time", volume: str = "volume"
) -> list[Column]:
    return [
        F.min_by(F.col(price), F.col(event_time)).alias("open"),
        F.max(F.col(price)).alias("high"),
        F.min(F.col(price)).alias("low"),
        F.max_by(F.col(price), F.col(event_time)).alias("close"),
        F.sum(F.coalesce(F.col(volume), F.lit(0))).alias("volume_sum"),
        F.count(F.lit(1)).alias("tick_count"),
    ]


def ohlcv_bars(
    ticks: DataFrame,
    bucket: str = "1 minute",
) -> DataFrame:
    """Batch OHLCV bars: one row per (symbol, minute bucket).

    ``bucket`` accepts any Spark interval understood by ``date_trunc`` units
    via the mapping below; the reference only ever uses 1 minute (op ST5) but
    the rollup generalizes (hypertable-style coarser bars in
    operators/serving.py build on this).
    """
    unit = {"1 minute": "minute", "1 hour": "hour", "1 day": "day"}[bucket]
    return ticks.groupBy(
        F.col("symbol"),
        F.date_trunc(unit, F.col("event_time")).alias("bucket_start"),
    ).agg(*bar_agg_exprs())


def ohlcv_bars_in_range(
    ticks: DataFrame, from_time: Column | str, to_time: Column | str
) -> DataFrame:
    """The aggregator's exact batch shape: half-open range filter (op P4,
    aggregator.py:37) then bar aggregation.  The filter is a plain Catalyst
    predicate → parquet row-group pruning at scale."""
    c = F.col("event_time")
    return ohlcv_bars(ticks.filter((c >= F.lit(from_time)) & (c < F.lit(to_time))))


def sliding_bars(
    ticks: DataFrame, length_minutes: int = 5, slide_minutes: int = 1
) -> DataFrame:
    """Sliding-window OHLCV: a ``length``-minute bar every ``slide`` minutes
    (the smoothed chart view; the reference has tumbling only, SURVEY.md ST5).

    Pane-merge plan (default when slide divides length): a naive
    ``F.window(ts, length, slide)`` duplicates every TICK into
    length/slide windows before the shuffle — the shuffle volume
    multiplies by the overlap factor.  Instead aggregate tumbling
    slide-sized PANES first (one ordinary hash aggregate: map-side
    combined, shuffle carries per-(symbol, pane) state only), then
    explode each pane into the length/slide sliding windows it feeds and
    merge with the bar-combine identities (open/close = min_by/max_by on
    pane start; extrema/sums associative).  The explode multiplies PANE
    rows — bounded by symbols × time span / slide — not ticks.  This is
    exactly the pane optimization of streaming slide implementations,
    done relationally.
    """
    if length_minutes % slide_minutes != 0:
        w = F.window(
            "event_time", f"{length_minutes} minutes", f"{slide_minutes} minutes"
        )
        return (
            ticks.groupBy(F.col("symbol"), w.alias("w"))
            .agg(*bar_agg_exprs())
            .select(
                "symbol",
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "open",
                "high",
                "low",
                "close",
                "volume_sum",
                "tick_count",
            )
        )
    k = length_minutes // slide_minutes
    panes = (
        ticks.groupBy(
            F.col("symbol"),
            F.window("event_time", f"{slide_minutes} minutes").alias("p"),
        )
        .agg(*bar_agg_exprs())
        .select("symbol", F.col("p.start").alias("pane_start"), "open",
                "high", "low", "close", "volume_sum", "tick_count")
    )
    exploded = panes.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    ).withColumn(
        "window_start",
        F.col("pane_start")
        - F.col("j") * F.expr(f"INTERVAL {slide_minutes} MINUTES"),
    )
    return (
        exploded.groupBy("symbol", "window_start")
        .agg(
            F.min_by("open", "pane_start").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "pane_start").alias("close"),
            F.sum("volume_sum").alias("volume_sum"),
            F.sum("tick_count").alias("tick_count"),
        )
        .select(
            "symbol",
            "window_start",
            (
                F.col("window_start")
                + F.expr(f"INTERVAL {length_minutes} MINUTES")
            ).alias("window_end"),
            "open",
            "high",
            "low",
            "close",
            "volume_sum",
            "tick_count",
        )
    )


def session_bars(ticks: DataFrame, gap_minutes: int = 5) -> DataFrame:
    """Session-window OHLCV: per-symbol activity bursts separated by ≥ gap
    of silence (the third window class; absent from the reference).

    ``F.session_window`` is a keyed sort + running merge under the hood —
    one shuffle on symbol.  The oracle replays it with the classic
    gaps-and-islands SQL (lag + cumulative sum of gap-breaks), proving the
    semantics match the relational definition exactly.
    """
    w = F.session_window("event_time", f"{gap_minutes} minutes")
    return (
        ticks.groupBy(F.col("symbol"), w.alias("w"))
        .agg(*bar_agg_exprs())
        .select(
            "symbol",
            F.col("w.start").alias("session_start"),
            "open",
            "high",
            "low",
            "close",
            "volume_sum",
            "tick_count",
        )
    )


def rollup_bars(bars: DataFrame, unit: str = "hour") -> DataFrame:
    """Coarser bars computed FROM finer bars — the materialized-rollup
    cascade (1m → 1h → 1d) a hypertable/OLAP store maintains.

    OHLCV is mergeable: a coarse bar is an exact function of its fine bars
    (open = open of the earliest fine bar, close = close of the latest,
    extrema/sums combine), so the hourly rollup reads ~60× fewer rows than
    re-aggregating raw ticks — at 100 TB, THE difference between scanning a
    bar table and re-scanning the tick firehose.  Same single hash-aggregate
    plan shape as the flagship, keyed by the coarser bucket.
    """
    return (
        bars.groupBy(
            F.col("symbol"),
            F.date_trunc(unit, F.col("bucket_start")).alias("bucket_start"),
        )
        .agg(
            F.min_by(F.col("open"), F.col("bucket_start")).alias("open"),
            F.max(F.col("high")).alias("high"),
            F.min(F.col("low")).alias("low"),
            F.max_by(F.col("close"), F.col("bucket_start")).alias("close"),
            F.sum(F.col("volume_sum")).alias("volume_sum"),
            F.sum(F.col("tick_count")).alias("tick_count"),
        )
    )


def gapfill_bars(
    bars: DataFrame, step: str = "1 minute", bucket_seconds: int | None = 86_400
) -> DataFrame:
    """Gap-filled continuous bar series: emit EVERY bucket in each symbol's
    [min, max] span, carrying the last known close forward through silent
    minutes (LOCF) — the hypertable ``time_bucket_gapfill`` + ``locf``
    operation a charting/backtest consumer needs, absent from both the
    reference and vanilla SQL stores.

    Plan: per-symbol span (one tiny aggregate) → ``sequence`` + ``explode``
    builds the dense grid JVM-side (no driver loop, no Python) → left join
    real bars (grid and bars share the (symbol, bucket) key — with bars
    bucketed/partitioned by symbol this is co-located) → LOCF carry.
    Grid size is span/step rows per symbol — generation is O(output),
    unavoidable and embarrassingly parallel.

    LOCF at scale (default): an unbounded-preceding ``last(ignorenulls)``
    partitioned by symbol alone is one task per symbol over the whole grid.
    Instead: within-day LOCF over (symbol, day), plus a per-DAY summary
    table (last real close per day, rows = days not minutes) windowed per
    symbol for the cross-day carry — ``coalesce(local, carry)`` is exact
    because a null local fill means the day had no real bar before that
    minute, so the fill is the last close of a prior day.
    ``bucket_seconds=None`` keeps the single-window path (test baseline).
    """
    span = bars.groupBy("symbol").agg(
        F.min("bucket_start").alias("mn"), F.max("bucket_start").alias("mx")
    )
    grid = span.select(
        "symbol",
        F.explode(
            F.sequence("mn", "mx", F.expr(f"INTERVAL {step}"))
        ).alias("bucket_start"),
    )
    joined = grid.join(
        bars.select(
            "symbol",
            "bucket_start",
            "close",
            "volume_sum",
            F.lit(False).alias("_real"),
        ),
        ["symbol", "bucket_start"],
        "left",
    )
    if bucket_seconds is None:
        w = (
            Window.partitionBy("symbol")
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return joined.select(
            "symbol",
            "bucket_start",
            F.last("close", ignorenulls=True).over(w).alias("close_filled"),
            F.coalesce("volume_sum", F.lit(0)).alias("volume_sum"),
            F.col("_real").isNull().alias("is_gap"),
        )

    from stockpulse_batch_realtime_etl_spark.operators import frames

    g = joined.withColumn(
        frames.BUCKET_COL, frames.bucket_of("bucket_start", bucket_seconds)
    )
    w_local = (
        Window.partitionBy("symbol", frames.BUCKET_COL)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-day summary: close of the LAST real minute that day, then LOCF
    # over days per symbol — the sequential window touches day COUNTS,
    # not minutes.  max_by(close, <null-masked bucket_start>) rather than
    # max(when(... struct)): max_by skips null ordering keys (silent
    # minutes) exactly like the null-masked struct-max did, but its
    # buffer is two flat primitives, so this aggregate over the DENSE
    # GRID (the widest stream in the query) stays a HashAggregate — a
    # struct buffer is not UnsafeRow-mutable and demoted it to
    # SortAggregate, a per-partition sort of the grid (round 12).
    day_last = (
        g.groupBy("symbol", frames.BUCKET_COL)
        .agg(
            F.max_by(
                "close",
                F.when(F.col("close").isNotNull(), F.col("bucket_start")),
            ).alias("day_close")
        )
    )
    w_days = (
        Window.partitionBy("symbol")
        .orderBy(frames.BUCKET_COL)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = day_last.select(
        "symbol",
        frames.BUCKET_COL,
        F.last("day_close", ignorenulls=True).over(w_days).alias("carry_close"),
    )
    return (
        g.join(F.broadcast(carries), ["symbol", frames.BUCKET_COL])
        .select(
            "symbol",
            "bucket_start",
            F.coalesce(
                F.last("close", ignorenulls=True).over(w_local),
                F.col("carry_close"),
            ).alias("close_filled"),
            F.coalesce("volume_sum", F.lit(0)).alias("volume_sum"),
            F.col("_real").isNull().alias("is_gap"),
        )
    )
