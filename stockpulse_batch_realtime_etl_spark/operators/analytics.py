"""Market-analytics operator classes beyond the reference's API surface:
volume-weighted pricing, time-range window frames, deterministic statistical
aggregates, per-group top-k, pivot, and relational set operations.

The reference's analytics stop at the serving queries (SURVEY.md §2.10) —
min/max/avg summaries and a join-based movers ranking.  This module supplies
the operator classes a quant/analytics user reaches for next, each expressed
as a declarative single-pass plan so Catalyst keeps partial aggregation,
pushdown, and whole-stage codegen:

* ``vwap_bars``        — weighted-average aggregate (sum ratios)
* ``time_range_stats`` — RANGE-BETWEEN-INTERVAL window frames (event-time
  based frames, robust to irregular tick spacing, vs rolling.py's ROWS)
* ``stats_summary``    — variance / correlation via exact decimal moments
* ``top_bars_per_day`` — windowed top-k per group (rank ≤ k)
* ``hourly_symbol_pivot`` — pivot (wide conditional aggregation)
* ``notable_days``     — UNION / INTERSECT / EXCEPT over derived sets

Determinism contract (tools/check_parity.py hashes values): every floating
aggregate either sums exactly in DECIMAL before one final double cast
(tpch.money_sum pattern) or is a min/max/count; derived arithmetic uses the
SAME expression shape as the oracle so IEEE doubles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stockpulse_batch_realtime_etl_spark.operators import frames
from stockpulse_batch_realtime_etl_spark.operators.tpch import money_sum


def vwap_bars(ticks: DataFrame, bucket: str = "1 minute") -> DataFrame:
    """Per (symbol, bucket): volume-weighted average price + participation.

    One hash aggregate (identical plan shape to the flagship OHLCV bars —
    partial/final, single shuffle).  The ``price·volume`` turnover sums in
    DECIMAL(25,6) so the result is independent of partitioning; zero traded
    volume ⇒ NULL vwap (division guard, reference F4 pattern).
    """
    w = F.window("event_time", bucket)
    vol = F.coalesce(F.col("volume"), F.lit(0))
    return (
        ticks.groupBy(F.col("symbol"), w.alias("w"))
        .agg(
            money_sum(F.col("price") * vol).alias("turnover"),
            F.sum(vol).alias("volume_sum"),
            F.count(F.lit(1)).alias("tick_count"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("bucket_start"),
            F.round(
                F.when(
                    F.col("volume_sum") > 0,
                    F.col("turnover") / F.col("volume_sum"),
                ),
                6,
            ).alias("vwap"),
            F.round("turnover", 4).alias("turnover"),
            "volume_sum",
            "tick_count",
        )
    )


def time_range_stats(
    ticks: DataFrame, minutes: int = 10, bucket_seconds: int | None = 86_400
) -> DataFrame:
    """Per tick: mean price / tick count / traded volume over the PRECEDING
    ``minutes`` of event time (current row inclusive) — a RANGE frame keyed
    by the timestamp itself.

    Why RANGE and not ROWS (rolling.py): with irregular tick arrival a
    row-count frame spans a variable wall-clock horizon; a time-range frame
    is the semantics "last 10 minutes" actually means.  Frames over
    timestamp ORDER BY treat equal-timestamp rows as peers — every peer
    sees the same frame — so the result is deterministic without any
    tie-break column.

    Scale: the window runs over (symbol, time bucket) with rows inside the
    horizon of a bucket end duplicated into the next bucket
    (``frames.with_time_overlap`` — exact, ≤2× shuffle volume, and no
    sequential step), so tasks scale with n_symbols × n_buckets instead of
    capping at n_symbols.  Spark evaluates bounded RANGE frames
    incrementally (running two-pointer pass), not per-row rescans.  The
    mean divides two exact sums, so no float-order noise exists for the
    oracle to disagree with.  ``bucket_seconds=None`` keeps the plain
    per-symbol window (test baseline).
    """
    if bucket_seconds is None:
        src = ticks
        part = "symbol"
    else:
        src = frames.with_time_overlap(
            ticks.select("symbol", "event_time", "price", "volume"),
            "event_time",
            horizon_seconds=minutes * 60,
            bucket_seconds=max(bucket_seconds, minutes * 60),
        )
        part = f"symbol, {frames.BUCKET_COL}"
    frame = (
        f"PARTITION BY {part} ORDER BY event_time "
        f"RANGE BETWEEN INTERVAL {minutes} MINUTES PRECEDING AND CURRENT ROW"
    )
    out = src.select(
        "symbol",
        "event_time",
        "price",
        F.round(
            F.expr(f"sum(cast(price AS DECIMAL(25,6))) OVER ({frame})").cast(
                "double"
            )
            / F.expr(f"count(price) OVER ({frame})"),
            6,
        ).alias("range_avg_price"),
        F.expr(f"count(*) OVER ({frame})").alias("range_tick_count"),
        F.expr(
            f"sum(coalesce(volume, 0)) OVER ({frame})"
        ).alias("range_volume_sum"),
        *([] if bucket_seconds is None else [frames.BUCKET_COL, frames.CARRY_COL]),
    )
    return out if bucket_seconds is None else frames.finalize(out)


def _moments(x: Column, y: Column) -> list[Column]:
    """Exact decimal power sums — the partial-aggregatable core of every
    second-order statistic.  DECIMAL(38,6) sums are associative and
    commutative, so the derived stats are identical under any partitioning
    (and bit-identical to an oracle computing the same shape)."""
    dec = "decimal(38,6)"
    # Pair stats must draw every sum from the SAME population: rows where
    # BOTH x and y are present.  Guard symmetrically (not just on y) so a
    # null x can never leak into py/pyy/pxy while being excluded from px/pxx.
    both = x.isNotNull() & y.isNotNull()
    x_p = F.when(both, x)
    y_p = F.when(both, y)
    return [
        F.count(x).alias("n"),
        F.sum(x.cast(dec)).cast("double").alias("sx"),
        F.sum((x * x).cast(dec)).cast("double").alias("sxx"),
        F.count(x_p).alias("np"),
        F.sum(x_p.cast(dec)).cast("double").alias("px"),
        F.sum(y_p.cast(dec)).cast("double").alias("py"),
        F.sum((x_p * x_p).cast(dec)).cast("double").alias("pxx"),
        F.sum((y_p * y_p).cast(dec)).cast("double").alias("pyy"),
        F.sum((x_p * y_p).cast(dec)).cast("double").alias("pxy"),
    ]


def stats_summary(ticks: DataFrame) -> DataFrame:
    """Per symbol: price variance/stddev, price-volume covariance and
    correlation, and exact interpolated percentiles.

    Built-in ``stddev``/``corr`` stream Welford-style updates whose float
    error depends on partition boundaries — correct, but not reproducible
    across engines or even two runs with different partitioning.  Instead:
    exact DECIMAL power sums (one hash aggregate, fully map-side
    combinable), then textbook closed forms in double — deterministic at
    any parallelism.  Pair stats (covar/corr) use only rows where volume is
    present, matching SQL null-pair semantics.

    ``percentile`` is Spark's exact linear-interpolation aggregate
    (= DuckDB ``quantile_cont``); at 100 TB swap for ``approx_percentile``
    — same plan shape, bounded state.
    """
    x, y = F.col("price"), F.col("volume").cast("double")
    pcts = F.expr("percentile(price, array(0.5D, 0.9D, 0.99D))")
    m = (
        ticks.groupBy("symbol")
        .agg(*_moments(x, y), pcts.alias("pct"))
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    np_, px, py = F.col("np"), F.col("px"), F.col("py")
    pxx, pyy, pxy = F.col("pxx"), F.col("pyy"), F.col("pxy")
    # degenerate-input guards, mirrored in the oracle: a 1-tick symbol has
    # no sample variance (n−1 = 0 would ANSI-abort the whole job), a
    # constant-volume symbol has zero correlation denominator, and flat
    # prices can cancel to a 1e-19-NEGATIVE variance numerator (Spark NaN,
    # DuckDB sqrt hard-error) — clamp at 0 before the root
    var_raw = (sxx - sx * sx / n) / (n - 1)
    var = F.when(n > 1, var_raw)
    # clamp INSIDE the guard: greatest() ignores NULLs on both engines,
    # so greatest(var, 0) would turn the n=1 NULL into stddev 0.0
    stddev = F.when(n > 1, F.sqrt(F.greatest(var_raw, F.lit(0.0))))
    covar = F.when(np_ > 1, (pxy - px * py / np_) / (np_ - 1))
    det = (np_ * pxx - px * px) * (np_ * pyy - py * py)
    corr = F.when(det > 0, (np_ * pxy - px * py) / F.sqrt(det))
    return m.select(
        "symbol",
        n.alias("tick_count"),
        F.round(sx / n, 6).alias("mean_price"),
        F.round(var, 6).alias("var_price"),
        F.round(stddev, 6).alias("stddev_price"),
        F.round(covar, 4).alias("covar_price_volume"),
        F.round(corr, 6).alias("corr_price_volume"),
        F.round(F.col("pct")[0], 6).alias("p50_price"),
        F.round(F.col("pct")[1], 6).alias("p90_price"),
        F.round(F.col("pct")[2], 6).alias("p99_price"),
    ).orderBy("symbol")


def top_bars_per_day(bars: DataFrame, k: int = 3) -> DataFrame:
    """Top-k bars per trading day by traded volume — windowed top-k per
    group (the reference's movers ranking is a GLOBAL top-k, O2; this is the
    grouped generalization).

    ``row_number`` over (day DESC-volume) then ``rank <= k``: one shuffle on
    day, one sort per partition, early-out after k rows per group under
    codegen.  Deterministic total order: ties broken by (symbol,
    bucket_start).  At scale, skewed days are handled by AQE; for extreme k
    ≪ group size a partial per-partition top-k pre-prune (groupBy day +
    min_by heap) drops shuffle volume — unnecessary at k=3.
    """
    w = Window.partitionBy("day").orderBy(
        F.col("volume_sum").desc(), F.col("symbol"), F.col("bucket_start")
    )
    return (
        bars.withColumn("day", F.to_date("bucket_start"))
        .withColumn("day_rank", F.row_number().over(w))
        .filter(F.col("day_rank") <= k)
        .select("day", "day_rank", "symbol", "bucket_start", "volume_sum")
    )


#: The driver corpus's full symbol set (upper(event_type), stable across all
#: provided scale factors).  Pivot REQUIRES a static value list on both the
#: Spark side (fixed output schema, single-pass plan — no extra distinct-scan
#: job) and the oracle side (SQL columns are static).
PIVOT_SYMBOLS = ("CLICK", "ERROR", "PURCHASE", "SIGNUP", "VIEW")


def hourly_symbol_pivot(ticks: DataFrame) -> DataFrame:
    """Tick count per (hour-of-day × symbol), symbols as columns — pivot.

    With explicit values ``pivot`` skips the distinct-values pre-job and
    plans a two-level aggregate: partial count per (hour, symbol) — so the
    first shuffle carries one row per group, not per tick — then
    ``pivotfirst`` packs the ≤ |values| rows per hour into columns.  The
    second shuffle moves only |hours|·|symbols| pre-aggregated rows, which
    is noise at any scale; the oracle states the equivalent conditional-
    aggregation form.
    """
    return (
        ticks.withColumn("hour_of_day", F.hour("event_time"))
        .groupBy("hour_of_day")
        .pivot("symbol", list(PIVOT_SYMBOLS))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(PIVOT_SYMBOLS))
        .orderBy("hour_of_day")
    )


def daily_symbol_stats(ticks: DataFrame) -> DataFrame:
    """Shared input for ``notable_days``: per (symbol, day) intraday range
    ratio and traded volume."""
    return (
        ticks.withColumn("day", F.to_date("event_time"))
        .groupBy("symbol", "day")
        .agg(
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.sum(F.coalesce(F.col("volume"), F.lit(0))).alias("volume_sum"),
        )
        .select(
            "symbol",
            "day",
            # F4 guard (NULLIF pattern): a zero low (prices can touch 0 in
            # the corpus) would divide-by-zero under ANSI mode; NULL ratio
            # days drop out of the volatile set and its mean.
            F.when(
                F.col("low") != 0,
                (F.col("high") - F.col("low")) / F.col("low"),
            ).alias("range_ratio"),
            "volume_sum",
        )
    )


def notable_days(ticks: DataFrame) -> DataFrame:
    """Relational set operations over derived day sets (a class the
    reference lacks entirely — SURVEY.md §2.6 records "none").

    volatile := days whose intraday range ratio exceeds the corpus mean;
    heavy    := days whose traded volume exceeds the corpus mean.
    Result   := ('volatile_only', volatile EXCEPT heavy)
              ∪ ('both',          volatile INTERSECT heavy)   (UNION ALL)

    Thresholds are scalar subqueries (corpus means), so the query is
    self-scaling — no magic constants that break at a different sf.  Spark
    plans the scalar as a one-row broadcast; EXCEPT/INTERSECT become hash
    left-anti / left-semi aggregates over the (already tiny) day sets.
    """
    daily = daily_symbol_stats(ticks)
    # Corpus means as window aggregates over the WHOLE (tiny: symbols×days
    # rows) daily table rather than a separate agg branch: every set-op arm
    # below then hangs off ONE identical subtree, which AQE's exchange reuse
    # dedupes at runtime — a join against a separately-aggregated means row
    # would give each arm a different column-pruned lineage and re-scan the
    # tick table once per arm.
    # mean_rr sums exactly in decimal first: a float-ordered avg could move
    # the threshold by an ulp and flip a borderline day between engines.
    # mean_vol's integer sums are exact in double below 2^53 on both sides.
    everything = Window.partitionBy()
    flagged = daily.select(
        "symbol",
        "day",
        (
            F.col("range_ratio")
            > F.sum(F.col("range_ratio").cast("decimal(38,12)"))
            .over(everything)
            .cast("double")
            / F.count("range_ratio").over(everything)
        ).alias("is_volatile"),
        (
            F.col("volume_sum")
            > F.sum("volume_sum").over(everything)
            / F.count("volume_sum").over(everything)
        ).alias("is_heavy"),
    )
    volatile = flagged.filter("is_volatile").select("symbol", "day")
    heavy = flagged.filter("is_heavy").select("symbol", "day")
    tagged_only = volatile.exceptAll(heavy).select(
        F.lit("volatile_only").alias("tag"), "symbol", "day"
    )
    tagged_both = volatile.intersect(heavy).select(
        F.lit("both").alias("tag"), "symbol", "day"
    )
    return tagged_only.unionAll(tagged_both).orderBy("tag", "symbol", "day")


def price_histogram(ticks: DataFrame, nbins: int = 20) -> DataFrame:
    """Fixed-width per-symbol price histogram — the profiling aggregate
    behind distribution dashboards and range-partition planning.

    Bucket edges derive from per-symbol min/max window aggregates, the
    bucket index is explicit floor arithmetic (identical IEEE expression on
    both engines — no reliance on a builtin's edge-case convention), and
    the top edge clamps into the last bin.  Two hash aggregates: the first
    computes extents (window over symbol = one shuffle), the second the
    histogram itself; both map-side combine.
    """
    w = Window.partitionBy("symbol")
    mn, mx = F.min("price").over(w), F.max("price").over(w)
    spread = mx - mn
    bucket = F.when(
        spread > 0,
        F.least(
            F.floor((F.col("price") - mn) * nbins / spread),
            F.lit(nbins - 1),
        ),
    ).otherwise(0)
    return (
        ticks.select("symbol", "price", bucket.alias("bucket"))
        .groupBy("symbol", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("price"), 6).alias("bucket_min"),
            F.round(F.max("price"), 6).alias("bucket_max"),
        )
        .orderBy("symbol", "bucket")
    )


def price_deciles(ticks: DataFrame) -> DataFrame:
    """Per-symbol decile profile via ``ntile(10)`` — the ranked-bucketing
    window class (distinct from both frames and fixed-width buckets).

    ntile splits a TOTAL order into equal-count buckets, so the ORDER BY
    carries tie-breakers (event_time, volume) to pin equal prices to a
    deterministic bucket on every engine.  ``volume`` is nullable and the
    engines disagree on default ASC null placement (Spark NULLS FIRST,
    DuckDB NULLS LAST) — pin it explicitly.  One shuffle + one sort, then
    a tiny aggregate.
    """
    w = Window.partitionBy("symbol").orderBy(
        F.col("price").asc(),
        F.col("event_time").asc(),
        F.col("volume").asc_nulls_last(),
    )
    return (
        ticks.select(
            "symbol", "price", F.ntile(10).over(w).alias("decile")
        )
        .groupBy("symbol", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("price"), 6).alias("lo"),
            F.round(F.max("price"), 6).alias("hi"),
        )
        .orderBy("symbol", "decile")
    )


def symbol_correlations(bars: DataFrame) -> DataFrame:
    """Pairwise close-price correlation between symbols over ALIGNED minute
    buckets — the cross-series join+aggregate a portfolio/risk view needs.

    Self-join bars on bucket_start (A < B keeps each unordered pair once),
    then the same exact-decimal moment sums as ``stats_summary`` derive
    Pearson r per pair.  The join shuffles on bucket_start (uniform key, no
    skew); pair count is |symbols|², independent of data volume, so the
    aggregate output is trivially small at any scale.
    """
    left = bars.select(
        F.col("symbol").alias("sym_a"),
        F.col("bucket_start").alias("b"),
        F.col("close").alias("x"),
    )
    right = bars.select(
        F.col("symbol").alias("sym_b"),
        F.col("bucket_start").alias("b"),
        F.col("close").alias("y"),
    )
    dec = "decimal(38,6)"
    joined = left.join(right, "b").filter(F.col("sym_a") < F.col("sym_b"))
    x, y = F.col("x"), F.col("y")
    m = joined.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).cast("double").alias("sx"),
        F.sum(y.cast(dec)).cast("double").alias("sy"),
        F.sum((x * x).cast(dec)).cast("double").alias("sxx"),
        F.sum((y * y).cast(dec)).cast("double").alias("syy"),
        F.sum((x * y).cast(dec)).cast("double").alias("sxy"),
    )
    n = F.col("n")
    # r is undefined when either side has zero variance over the aligned
    # span (single aligned minute, or a flat series) — NULL, not a 0/0.
    det = (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    corr = F.when(
        det > 0,
        (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(det),
    )
    return m.select(
        "sym_a",
        "sym_b",
        n.alias("aligned_minutes"),
        F.round(corr, 6).alias("close_corr"),
    ).orderBy("sym_a", "sym_b")


def symbol_beta(bars: DataFrame) -> DataFrame:
    """Market-model regression per symbol: beta, alpha and correlation of
    minute close-returns against an EQUAL-WEIGHT index of all symbols —
    the systematic-risk decomposition a portfolio view runs next to
    :func:`symbol_correlations`.

    Pipeline (three aggregates, one small join, zero Python):

    1. per-symbol minute returns from close prices (6dp-rounded — the
       module's cross-engine float convention);
    2. the index return per minute = DECIMAL-exact mean of that minute's
       symbol returns (each symbol is inside the index — documented
       equal-weight convention, not a bug; with 5+ symbols the self-term
       biases beta toward 1 by a known 1/n factor);
    3. join returns to index on minute (uniform key), then per-symbol
       DECIMAL moment sums → closed-form OLS slope/intercept/r in double
       with the oracle's identical expression shape.

    Scale: returns-per-minute output is |symbols|·|minutes| rows — tiny
    relative to ticks; every aggregate is map-side combinable; the minute
    join shuffles on bucket_start with no skew.  NULL beta when the index
    has zero variance over the aligned span.
    """
    w = Window.partitionBy("symbol").orderBy("bucket_start")
    prev = F.lag("close", 1).over(w)
    rets = (
        bars.select("symbol", "bucket_start", "close")
        .withColumn(
            "ret",
            F.round(F.when(prev != 0, (F.col("close") - prev) / prev), 6),
        )
        .filter(F.col("ret").isNotNull())
    )
    dec = "decimal(38,6)"
    mkt = rets.groupBy("bucket_start").agg(
        F.round(
            F.sum(F.col("ret").cast(dec)).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("mkt_ret")
    )
    j = rets.join(mkt, "bucket_start")
    x, y = F.col("mkt_ret"), F.col("ret")
    m = j.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.sum(x.cast(dec)).cast("double").alias("sx"),
        F.sum(y.cast(dec)).cast("double").alias("sy"),
        F.sum((x * x).cast(dec)).cast("double").alias("sxx"),
        F.sum((y * y).cast(dec)).cast("double").alias("syy"),
        F.sum((x * y).cast(dec)).cast("double").alias("sxy"),
    )
    n = F.col("n_periods").cast("double")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    beta = F.when(varx > 0, (n * F.col("sxy") - F.col("sx") * F.col("sy")) / varx)
    alpha = (F.col("sy") - beta * F.col("sx")) / n
    det = varx * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    corr = F.when(
        det > 0,
        (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(det),
    )
    return m.select(
        "symbol",
        "n_periods",
        F.round(beta, 6).alias("beta"),
        F.round(alpha, 6).alias("alpha"),
        F.round(corr, 6).alias("mkt_corr"),
    ).orderBy("symbol")


# --- event-log sessionization -----------------------------------------------

def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization of the raw event log: a new session starts
    when a user is idle longer than ``gap_minutes``.  Classic event
    analytics (the batch twin of streaming ``session_window``), plus JSON
    property extraction (``props.k``) — the one surface that parses the
    events table's JSON payload column.

    Plan: ONE shuffle on user_id; the lag/running-sum window and the
    per-(user, session) aggregate both consume the same hash partitioning
    (clustering on user_id satisfies the groupBy's (user_id, session_id)
    distribution), so Catalyst plans no second exchange.  Per-task state is
    one user's event stream — 1000 executors sessionize 1000×.

    Determinism: gap arithmetic in epoch-µs (NTZ-proof via ts_micros);
    the double `value` sum is rounded-then-DECIMAL-summed so float order
    can never flip the gate hash; ordering ties broken by event_id.
    """
    from stockpulse_batch_realtime_etl_spark.functions.scalars import ts_micros

    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = ts_micros(F.col("ts"))
    new_s = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        # try_cast: get_json_object nulls structurally-bad JSON but NOT a
        # type-mismatched value — an ANSI cast would abort the whole batch
        # on one '{"k": "abc"}' event instead of nulling it (the module's
        # malformed-input convention is null/DLQ, never job death)
        F.get_json_object("props", "$.k").try_cast("int").alias("k"),
        F.round(F.col("value"), 8).cast("decimal(20,8)").alias("v"),
    ).withColumn("session_id", F.sum(new_s).over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_event_types"),
        F.round(F.sum("v").cast("double"), 4).alias("total_value"),
        F.sum("k").alias("k_sum"),
    )


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Deequ-style data profile: one row per column with null count, exact
    distinct count, and TYPED min/max (numeric → ``min_num``/``max_num``,
    timestamp → ``min_ts``/``max_ts``, string → ``min_str``/``max_str``;
    inapplicable slots stay null) plus the table row count — the
    completeness / domain / freshness check every ingestion pipeline runs
    before trusting a table.

    Typed stat slots instead of stringified values: casting min/max to
    string would couple the gate to each engine's float/timestamp
    formatting; typed columns hash on the values themselves.

    Plan: ONE aggregate over one scan computes every per-column stat
    (count_distinct expands into the standard two-phase partial dedup per
    column, all map-side combined), then the single result row explodes
    into per-column rows from an in-memory struct array — no second scan,
    no per-column job.  At 100 TB this is exactly as expensive as the
    widest count_distinct, and columns are independent so the aggregate
    parallelizes per partition.
    """
    from pyspark.sql.types import (
        NumericType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    # driver parquet carries TIMESTAMP(NANOS) → TimestampNTZType; both tz'd
    # and naive timestamps share the ts slot (output cast unifies them)
    ts_kinds = (TimestampType, TimestampNTZType)

    cols = (
        columns if columns is not None else [f.name for f in df.schema.fields]
    )
    if not cols:
        raise ValueError("table_profile: empty column list")
    types = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_null_{i}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{i}"))
        aggs.append(F.min(F.col(c)).alias(f"_min_{i}"))
        aggs.append(F.max(F.col(c)).alias(f"_max_{i}"))
    from stockpulse_batch_realtime_etl_spark.sources.tables import fan_out

    # fan_out: no-op on production tables (thousands of row groups); on the
    # harness's one-row-group parquet it spreads the per-column Expand work
    # across cores instead of one task (3.2 s → 2.5 s at sf0.1 — the rest
    # is the count_distinct two-phase exchange, already map-side combined)
    row = fan_out(df).agg(*aggs)

    def slot(i: int, c: str, kind, out_type: str) -> tuple[Column, Column]:
        if not isinstance(types[c], kind):
            null = F.lit(None).cast(out_type)
            return null, null
        mn, mx = F.col(f"_min_{i}"), F.col(f"_max_{i}")
        if out_type != "string":  # unify int/long/double and tz/ntz slots
            mn, mx = mn.cast(out_type), mx.cast(out_type)
        return mn, mx

    structs = []
    for i, c in enumerate(cols):
        mn_n, mx_n = slot(i, c, NumericType, "double")
        mn_t, mx_t = slot(i, c, ts_kinds, "timestamp")
        mn_s, mx_s = slot(i, c, StringType, "string")
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{i}").alias("n_null"),
                F.col(f"_nd_{i}").alias("n_distinct"),
                mn_n.alias("min_num"),
                mx_n.alias("max_num"),
                mn_t.alias("min_ts"),
                mx_t.alias("max_ts"),
                mn_s.alias("min_str"),
                mx_s.alias("max_str"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def missing_minutes(ticks: DataFrame) -> DataFrame:
    """Time-series continuity audit: per (symbol, day), how many minute
    buckets inside the symbol's active span that day carried NO ticks —
    the gap census a charting/backtest consumer runs before trusting a
    feed (the counting companion of ``gapfill_bars``, which FILLS gaps).

    One hash aggregate: count_distinct of minute buckets + span min/max
    per (symbol, day); expected = span minutes + 1; missing = expected −
    active.  All integer arithmetic on whole-minute timestamps — engine
    exact."""
    m = ticks.select(
        "symbol", F.date_trunc("minute", "event_time").alias("m")
    )
    per = m.groupBy("symbol", F.to_date("m").alias("day")).agg(
        F.count_distinct("m").alias("active_minutes"),
        F.min("m").alias("_first"),
        F.max("m").alias("_last"),
    )
    expected = (
        (F.unix_timestamp("_last") - F.unix_timestamp("_first")) / 60
    ).cast("long") + 1
    return per.select(
        "symbol",
        "day",
        "active_minutes",
        expected.alias("expected_minutes"),
        (expected - F.col("active_minutes")).alias("missing_minutes"),
    )


def funnel_counts(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered-step behavioral funnel over the event log: how many users
    performed step 1, then step 2 STRICTLY AFTER their first step 1, then
    step 3 strictly after that — the product-analytics staple (the
    sequenced counterpart of :func:`user_sessions`' gap sessionization).

    Semantics: a user reaches step i+1 if any step-(i+1) event is later
    than their EARLIEST qualifying step-i time (first-touch attribution;
    the earliest-qualifying choice maximizes reach and makes the result a
    pure function of the input).

    Plan: one pass per step — filter that step's events (predicate in the
    scan), join the previous reached-set on user_id (reached-sets shrink
    monotonically and are user-dimension-sized — AQE broadcasts them as
    they shrink), keep events after the user's prior-step time, min-
    aggregate.  Step count is small and fixed, so total work is
    |steps| · O(events-of-that-step).
    """
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    reached = None
    outs = []
    for i, s in enumerate(steps):
        e = events.filter(F.col("event_type") == s).select("user_id", "ts")
        if reached is None:
            reached = e.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            prev = reached.select("user_id", F.col("t").alias("_prev_t"))
            reached = (
                e.join(prev, "user_id")
                .filter(F.col("ts") > F.col("_prev_t"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        outs.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(s).alias("step"),
                F.lit(i + 1).alias("step_idx"),
                F.col("n_users").cast("long"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def cohort_retention(events: DataFrame, unit: str = "week") -> DataFrame:
    """Cohort retention matrix over the event log: users grouped by the
    period of their FIRST event (their cohort), counted by how many were
    active again k periods later — the standard growth-analytics view
    (rows = cohorts, k = period offset, cells = retained users).

    Plan: first-event period per user is one aggregate; (user, period)
    activity de-dups in a second (count_distinct-style) aggregate; the
    join back on user_id carries only (cohort, offset) out — three hash
    exchanges total, all map-side combined, nothing wider than
    user-dimension tables.  Offsets are exact integer arithmetic on
    ``date_trunc`` boundaries, so any engine replays them bit-for-bit.
    """
    per = F.date_trunc(unit, F.col("ts"))
    first = (
        events.groupBy("user_id")
        .agg(F.min(per).alias("cohort_period"))
    )
    active = events.select("user_id", per.alias("p")).distinct()
    diff_days = F.datediff(F.to_date("p"), F.to_date("cohort_period"))
    if unit not in ("week", "day"):
        raise ValueError(
            f"cohort_retention: unit must be 'week' or 'day', got {unit!r}"
        )
    per_len = {"week": 7, "day": 1}[unit]
    return (
        active.join(first, "user_id")
        .select(
            # DATE output (not midnight timestamp): the natural grain of a
            # cohort label, and what DuckDB's date_trunc('week') yields
            F.to_date("cohort_period").alias("cohort_period"),
            (diff_days / per_len).cast("long").alias("period_offset"),
            "user_id",
        )
        .groupBy("cohort_period", "period_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over the event log: for each
    (from_event → to_event) pair, how often a user's next action follows,
    and the conditional probability per source state.

    Plan: ONE shuffle on user_id for the lead() window (ties broken by
    event_id — a total order), then a hash aggregate on the pair (25 cells
    for 5 event types) and a window over the aggregate output (rows =
    |event_types|², not events) for the per-source normalization.
    ``p_transition`` is a single exact-BIGINT division — deterministic
    across engines without decimal scaffolding.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type", 1).over(w)
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("_to", nxt)
        .filter(F.col("_to").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("event_type").alias("from_event"), F.col("_to").alias("to_event")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    wsrc = Window.partitionBy("from_event")
    return counts.select(
        "from_event",
        "to_event",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(wsrc).cast("double"),
            6,
        ).alias("p_transition"),
    ).orderBy("from_event", "to_event")


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM customer segmentation over purchase events: recency (µs since
    the user's last purchase, against the corpus max timestamp), frequency
    (purchase count), monetary (decimal-exact value sum), each scored into
    quartiles against exact interpolated percentile cutoffs.

    Scale notes: the user rollup is ONE hash aggregate; the corpus max
    timestamp and the three cutoffs-per-metric are 1-row aggregates OVER
    THE ROLLUP (users, not events) broadcast back — an ntile() over all
    users would be a single-partition global sort, exactly the shape this
    avoids.  Cutoffs round to 6dp before comparison (``F.percentile`` ≡
    DuckDB ``quantile_cont``) so an engine ulp can't flip a boundary user;
    boundary ties score identically in both engines by construction.
    """
    from stockpulse_batch_realtime_etl_spark.functions.scalars import ts_micros

    per_user = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(ts_micros("ts")).alias("_last_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    gmax = per_user.agg(F.max("_last_us").alias("_gmax"))
    r = per_user.crossJoin(F.broadcast(gmax)).select(
        "user_id",
        (F.col("_gmax") - F.col("_last_us")).alias("recency_us"),
        "frequency",
        "monetary",
    )
    cuts = r.agg(
        *[
            F.round(F.percentile(c, F.lit(q)), 6).alias(f"_{c[0]}{int(q*100)}")
            for c in ("recency_us", "frequency", "monetary")
            for q in (0.25, 0.50, 0.75)
        ]
    )
    j = r.crossJoin(F.broadcast(cuts))
    one = F.lit(1).cast("int")

    def score_desc(c: str, p: str) -> Column:
        # smaller is better (recency): below a cutoff earns the point
        return (
            one
            + (F.col(c) < F.col(f"_{p}25")).cast("int")
            + (F.col(c) < F.col(f"_{p}50")).cast("int")
            + (F.col(c) < F.col(f"_{p}75")).cast("int")
        )

    def score_asc(c: str, p: str) -> Column:
        return (
            one
            + (F.col(c) > F.col(f"_{p}25")).cast("int")
            + (F.col(c) > F.col(f"_{p}50")).cast("int")
            + (F.col(c) > F.col(f"_{p}75")).cast("int")
        )

    return j.select(
        "user_id",
        "recency_us",
        "frequency",
        F.round("monetary", 6).alias("monetary"),
        score_desc("recency_us", "r").alias("r_score"),
        score_asc("frequency", "f").alias("f_score"),
        score_asc("monetary", "m").alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws(
            "",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    ).orderBy("user_id")


def weekday_hour_profile(ticks: DataFrame) -> DataFrame:
    """Seasonality heatmap: per (symbol, weekday, hour-of-day) tick count,
    decimal-exact average price, and volume sum — the activity-profile
    rollup behind "when does this symbol trade".

    Engine-portable weekday: Spark's ``dayofweek`` is 1-7/Sunday=1 while
    other engines differ, so the day number is derived arithmetically —
    ``(epoch_days + 4) % 7`` (0 = Sunday; 1970-01-01 was a Thursday) —
    identical integer math everywhere.  ONE map-side-combinable aggregate;
    output is |symbols|·7·24 rows at any data scale.
    """
    from stockpulse_batch_realtime_etl_spark.functions.scalars import ts_micros

    us = ts_micros("event_time")
    # pmod, not %: remainder takes the dividend's sign, so pre-epoch
    # timestamps (epoch_day < -4) would yield weekday in [-6,-1]
    dow = F.pmod(F.floor(us / F.lit(86_400_000_000)) + 4, F.lit(7)).cast(
        "int"
    )
    return (
        ticks.groupBy(
            "symbol",
            dow.alias("weekday"),
            F.hour("event_time").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("tick_count"),
            # raw exact-decimal division, deliberately UNROUNDED: a 4dp
            # round can land on a decimal tie where Spark (HALF_UP on the
            # decimal string) and binary-double rounding disagree; the
            # identical operands make the raw double bit-equal instead
            (
                F.sum(F.col("price").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
            F.sum(F.coalesce(F.col("volume"), F.lit(0))).alias("volume_sum"),
        )
        .orderBy("symbol", "weekday", "hour")
    )
