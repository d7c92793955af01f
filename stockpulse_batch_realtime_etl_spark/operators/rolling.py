"""Rolling window-frame analytics over ticks — the operator class the
reference's API *implies* (price change over a window, bars.py:141) but
never generalizes: moving averages, rolling extrema, per-tick returns.

All are window-frame expressions (``ROWS BETWEEN n PRECEDING AND CURRENT
ROW``) — one shuffle on the partition key, one sort per partition, then a
single running pass; everything stays in whole-stage codegen.

Scale shape: a shuffle keyed by symbol alone puts a symbol's whole history
in one task — with few hot symbols (the reference has 6) that is the
parallelism ceiling.  Both operators here therefore default to bucketed
frames (``operators/frames.py``): partition on (symbol, day bucket) with an
exact overlap carry, yielding n_symbols × n_days tasks and bounded per-task
state; ``bucket_seconds=None`` restores the plain window (the equality-test
baseline, and optimal when keys ≫ cores).  Deterministic ordering: ties on
event_time are broken by (price, volume) in the frame ORDER BY, matching
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


from stockpulse_batch_realtime_etl_spark.functions.scalars import ts_micros
from stockpulse_batch_realtime_etl_spark.operators import frames


def rolling_stats(
    ticks: DataFrame, n: int = 10, bucket_seconds: int | None = 86_400
) -> DataFrame:
    """Per tick: simple moving average / min / max of the last ``n`` ticks
    (current row inclusive) and the tick-over-tick return.

    ``sma`` / extrema use a ROWS frame (count-based — robust to irregular
    tick spacing); ``ret`` is ``price/lag(price) - 1``.  6dp rounding on
    both sides of the oracle pins float noise.

    Scale shape (default): the window runs over (symbol, day bucket) with
    the previous ``n-1`` stream rows injected per bucket by
    :func:`frames.with_row_overlap` — n_symbols × n_days tasks instead of
    one unbounded task per symbol.  ``bucket_seconds=None`` keeps the plain
    per-symbol window (test baseline; also optimal when keys ≫ cores).
    """
    order = [F.col("event_time"), F.col("price"), F.col("volume")]
    if bucket_seconds is None:
        w = Window.partitionBy("symbol").orderBy(*order)
        src = ticks.select("symbol", "event_time", "price", "volume")
    else:
        src = frames.with_row_overlap(
            ticks.select("symbol", "event_time", "price", "volume"),
            key="symbol",
            order_cols=("event_time", "price", "volume"),
            m=max(n - 1, 1),
            time_col="event_time",
            bucket_seconds=bucket_seconds,
        )
        w = Window.partitionBy("symbol", frames.BUCKET_COL).orderBy(*order)
    frame = w.rowsBetween(-(n - 1), Window.currentRow)
    prev = F.lag("price", 1).over(w)
    out = src.select(
        "symbol",
        "event_time",
        "price",
        "volume",
        F.round(F.avg("price").over(frame), 6).alias("sma"),
        F.min("price").over(frame).alias("roll_min"),
        F.max("price").over(frame).alias("roll_max"),
        F.round(
            F.when(prev != 0, (F.col("price") - prev) / prev), 6
        ).alias("ret"),
        *([] if bucket_seconds is None else [frames.BUCKET_COL, frames.CARRY_COL]),
    )
    return out if bucket_seconds is None else frames.finalize(out)


EMA_SCHEMA = (
    "symbol string, event_time timestamp, price double, ema double"
)


def ema(
    ticks: DataFrame,
    alpha: float = 0.2,
    chunk_seconds: int | None = 86_400,
    rows_per_subchunk: int | None = None,
) -> DataFrame:
    """Per-symbol exponential moving average — the recursive time-series
    operator (EMA_t = α·p_t + (1−α)·EMA_{t−1}) that no finite window frame
    can express: every output depends on the ENTIRE history.

    Scale shape (default, ``chunk_seconds`` set): a per-SYMBOL group would
    be one task holding the symbol's entire history — a ~n_symbols
    parallelism ceiling and an executor-memory cliff at deep histories.
    Instead the recursion is split by (symbol, time chunk, row sub-chunk)
    using its linearity:

        EMA_i = local_i + (1−α)^i · C_sub

    where ``local_i`` is the zero-seeded in-sub-chunk contribution
    Σ_{j≤i} α(1−α)^{i−j} p_j and ``C_sub`` is the EMA carried into the
    sub-chunk.  The per-row pass stays ENTIRELY in whole-stage codegen via
    the renormalized prefix sum

        local_i = (1−α)^i · Σ_{j≤i} α(1−α)^{−j} p_j

    — a running-frame SUM over a window, no Python in the hot path.  The
    growing (1−α)^{−j} factor is kept finite by bounding sub-chunks to
    ``B ≈ min(1024, 600/|ln(1−α)|)`` rows (exponent < e^600 ≪ double max;
    the addends an early term is absorbed against are exactly the ones the
    true EMA decays to nothing, so 6dp output precision is unaffected).

    Stages:

    1. window over (symbol, chunk) ordered (event_time, price): row_number
       → sub-chunk id and in-sub index j; one shuffle, one sort;
    2. running-frame sum over (symbol, chunk, sub) → per-row ``local`` and
       ``decay=(1−α)^j`` (same exchange, codegen);
    3. per (symbol, chunk, sub) hash-aggregate → summary (n, first price,
       L_end) — a ~B×-reduced stream, so the per-symbol sequential stitch
       C_next = L + (1−α)^n·C (Arrow ``applyInPandas``, the only
       inherently sequential step) touches summaries, not ticks;
    4. broadcast the carry table back and finish the identity.  Carry rows
       = ticks/B; if a deployment's history outgrows the broadcast
       threshold (≳10¹¹ ticks), raise B or repeat step 3 hierarchically
       (chunk level then symbol level) — the identity composes.

    The seed matches pandas ``adjust=False`` (EMA_1 = p_1): C_1 = first
    price of the symbol.  ``chunk_seconds=None`` falls back to the
    single-group-per-symbol pandas ``ewm`` path (the equality-test
    baseline).

    Oracle-checked: the DuckDB oracle replays the textbook recursion as a
    per-symbol ``list_reduce`` left fold (queries_registry.q_ema_ticks) —
    an independent algorithm, so the gate cross-checks the renormalized
    prefix-sum identity itself.  Additionally pinned by
    tests/test_rolling_asof.py against the closed form Σ α(1−α)^k p_{t−k}
    computed independently in numpy, plus a chunked-vs-single equality
    test.
    """
    import math

    import numpy as np
    import pandas as pd

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if alpha == 1.0:  # degenerate: EMA_t = p_t; avoids ln(0) below
        return ticks.select(
            "symbol", "event_time", "price", F.round("price", 6).alias("ema")
        )

    if chunk_seconds is None:

        def _ema_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["event_time", "price"])
            pdf["ema"] = (
                pdf["price"].ewm(alpha=alpha, adjust=False).mean().round(6)
            )
            return pdf[["symbol", "event_time", "price", "ema"]]

        return (
            ticks.select("symbol", "event_time", "price")
            .groupBy("symbol")
            .applyInPandas(_ema_group, EMA_SCHEMA)
        )

    q = 1.0 - alpha
    # (1−α)^{−j} must stay finite for j ≤ B: cap the exponent around e^600
    # (double max ≈ e^709, leaving ~e^100 of headroom for the price factor).
    # ``rows_per_subchunk`` overrides only to force boundary crossings in
    # tests; the cap still applies.
    B = max(1, min(rows_per_subchunk or 1024, int(600.0 / abs(math.log(q)))))

    base = ticks.select("symbol", "event_time", "price").withColumn(
        "chunk", frames.bucket_of("event_time", chunk_seconds)
    )

    wo = Window.partitionBy("symbol", "chunk").orderBy("event_time", "price")
    ranked = (
        base.withColumn("rn", F.row_number().over(wo))
        .withColumn("sub", ((F.col("rn") - F.lit(1)) / F.lit(B)).cast("long"))
        .withColumn("j", F.col("rn") - F.col("sub") * F.lit(B))  # 1-based
    )
    wsub = (
        Window.partitionBy("symbol", "chunk", "sub")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = ranked.withColumn(
        "local",
        F.pow(F.lit(q), F.col("j"))
        * F.sum(
            F.lit(alpha) * F.pow(F.lit(q), -F.col("j")) * F.col("price")
        ).over(wsub),
    ).withColumn("decay", F.pow(F.lit(q), F.col("j")))

    # Sub-chunk end states — consumed alongside the join below; the shuffle
    # on (symbol, chunk) is a ReusedExchange under AQE, and everything here
    # is hash-aggregate codegen.
    summaries = run.groupBy("symbol", "chunk", "sub").agg(
        F.count(F.lit(1)).alias("n"),
        F.min_by("price", "rn").alias("p_head"),
        F.max_by("local", "rn").alias("l_end"),
    )

    carry_schema = "symbol string, chunk long, sub long, carry double"

    def _carries(pdf: pd.DataFrame) -> pd.DataFrame:
        # one row per SUB-CHUNK (~ticks/B) — the only sequential step
        pdf = pdf.sort_values(["chunk", "sub"]).reset_index(drop=True)
        carries = np.empty(len(pdf))
        carry = float(pdf["p_head"].iloc[0])  # seed: EMA_1 = p_1
        for i in range(len(pdf)):
            carries[i] = carry
            carry = float(pdf["l_end"].iloc[i]) + q ** int(
                pdf["n"].iloc[i]
            ) * carry
        return pd.DataFrame(
            {
                "symbol": pdf["symbol"],
                "chunk": pdf["chunk"],
                "sub": pdf["sub"],
                "carry": carries,
            }
        )

    carries = summaries.groupBy("symbol").applyInPandas(_carries, carry_schema)

    return run.join(F.broadcast(carries), ["symbol", "chunk", "sub"]).select(
        "symbol",
        "event_time",
        "price",
        F.round(F.col("local") + F.col("decay") * F.col("carry"), 6).alias("ema"),
    )


def bollinger_bands(
    ticks: DataFrame,
    n: int = 20,
    k: float = 2.0,
    bucket_seconds: int | None = 86_400,
) -> DataFrame:
    """Bollinger bands per tick: rolling mean ± ``k``·σ over the last ``n``
    ticks — the canonical volatility envelope, and the rolling SECOND
    moment the SMA/extrema operator doesn't cover.

    Numerics: rolling sums of price and price² accumulate in
    DECIMAL(25,6) (exact, slide-order-proof — a float running sum with
    subtract-on-slide drifts, and σ's ``sxx − sx²/n`` cancellation
    amplifies that drift catastrophically), then the closed form runs in
    double with the SAME expression shape as the oracle — bit-identical.
    σ is the population σ of the frame; var clamps at 0 against residual
    representation error.

    Scale shape: same bucketed-frame treatment as :func:`rolling_stats`
    (n_symbols × n_days tasks via the exact row-overlap carry);
    ``bucket_seconds=None`` keeps the plain per-symbol window.
    """
    order = [F.col("event_time"), F.col("price"), F.col("volume")]
    if bucket_seconds is None:
        w = Window.partitionBy("symbol").orderBy(*order)
        src = ticks.select("symbol", "event_time", "price", "volume")
    else:
        src = frames.with_row_overlap(
            ticks.select("symbol", "event_time", "price", "volume"),
            key="symbol",
            order_cols=("event_time", "price", "volume"),
            m=max(n - 1, 1),
            time_col="event_time",
            bucket_seconds=bucket_seconds,
        )
        w = Window.partitionBy("symbol", frames.BUCKET_COL).orderBy(*order)
    frame = w.rowsBetween(-(n - 1), Window.currentRow)
    # materialize the THREE frame aggregates once in their own projection:
    # Catalyst does not common-subexpression-eliminate window expressions,
    # so inlining sx/sxx/cnt into the four output formulas plans 21
    # identical sliding-frame aggregates (7× the work, measured 2.9 s →
    # 1.1 s at sf0.1); this select pins the Window node to exactly 3
    moments = src.select(
        "symbol",
        "event_time",
        "price",
        F.sum(F.col("price").cast("decimal(25,6)"))
        .over(frame)
        .cast("double")
        .alias("_sx"),
        F.sum((F.col("price") * F.col("price")).cast("decimal(25,6)"))
        .over(frame)
        .cast("double")
        .alias("_sxx"),
        F.count("price").over(frame).cast("double").alias("_cnt"),
        *([] if bucket_seconds is None else [frames.BUCKET_COL, frames.CARRY_COL]),
    )
    mid = F.col("_sx") / F.col("_cnt")
    var = F.greatest(
        (F.col("_sxx") - F.col("_sx") * F.col("_sx") / F.col("_cnt"))
        / F.col("_cnt"),
        F.lit(0.0),
    )
    sd = F.sqrt(var)
    out = moments.select(
        "symbol",
        "event_time",
        "price",
        F.round(mid, 6).alias("bb_mid"),
        F.round(sd, 6).alias("bb_sd"),
        F.round(mid + F.lit(k) * sd, 6).alias("bb_upper"),
        F.round(mid - F.lit(k) * sd, 6).alias("bb_lower"),
        *([] if bucket_seconds is None else [frames.BUCKET_COL, frames.CARRY_COL]),
    )
    return out if bucket_seconds is None else frames.finalize(out)


def return_outliers(
    ticks: DataFrame, k_sigma: float = 3.0
) -> DataFrame:
    """Anomaly detection on tick-over-tick returns: flag ticks whose
    return deviates more than ``k_sigma`` standard deviations from their
    symbol's mean return — the feed-quality / fat-finger screen every
    market-data consumer runs.

    Plan: one window pass computes per-symbol returns (6dp-rounded, the
    module convention), one hash aggregate derives exact DECIMAL moments
    over those rounded returns (n, Σr, Σr² — order-proof), and the
    n_symbols-row moment table broadcasts back; z and the flag are pure
    double arithmetic with the oracle's identical expression shape.
    First-tick rows (null return) are excluded.
    """
    w = Window.partitionBy("symbol").orderBy(
        F.col("event_time"), F.col("price"), F.col("volume")
    )
    prev = F.lag("price", 1).over(w)
    ret = F.round(F.when(prev != 0, (F.col("price") - prev) / prev), 6)
    r = ticks.select(
        "symbol", "event_time", "price", ret.alias("ret")
    ).filter(F.col("ret").isNotNull())
    dec = "decimal(25,6)"
    mom = r.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(F.col("ret").cast(dec)).cast("double").alias("_sr"),
        F.sum((F.col("ret") * F.col("ret")).cast(dec))
        .cast("double")
        .alias("_srr"),
    )
    mean = F.col("_sr") / F.col("_n")
    sd = F.sqrt(
        F.greatest(
            (F.col("_srr") - F.col("_sr") * F.col("_sr") / F.col("_n"))
            / F.col("_n"),
            F.lit(0.0),
        )
    )
    # canonicalize IEEE negative zero: a tiny-negative z rounds to -0.0 in
    # engines that keep the sign (DuckDB) but to +0.0 through Spark's
    # BigDecimal round — the sf0.1 parity sweep caught 5 such rows hashing
    # apart.  x == 0 is true for both zeros, so the CASE rewrites -0.0 to
    # +0.0 on BOTH sides (mirrored in the oracle SQL) and cannot be
    # constant-folded away.
    zraw = F.round(F.when(sd > 0, (F.col("ret") - mean) / sd), 4)
    z = F.when(zraw == 0, F.lit(0.0)).otherwise(zraw)
    return (
        r.join(F.broadcast(mom), "symbol")
        .select(
            "symbol",
            "event_time",
            "price",
            "ret",
            z.alias("z"),
            F.when(
                sd > 0,
                F.abs((F.col("ret") - mean) / sd) > F.lit(k_sigma),
            ).otherwise(F.lit(False)).alias("is_outlier"),
        )
    )


def rsi(
    ticks: DataFrame, n: int = 14, bucket_seconds: int | None = 86_400
) -> DataFrame:
    """Cutler's RSI (SMA-based relative strength index) over the last ``n``
    tick returns: ``100 − 100/(1 + Σgain/Σloss)``.

    Cutler's variant (simple moving averages of gains/losses) is chosen
    over Wilder's because it is a pure window-frame expression — Wilder's
    recursive smoothing would force a sequential per-symbol scan, exactly
    the shape this module exists to avoid.  Early rows use the partial
    frame (same convention as :func:`rolling_stats`); ``Σloss = 0`` pins
    RSI to 100, a frame with no returns yields NULL.

    Numerics: returns are 6dp-rounded FIRST, then gain/loss sums
    accumulate in DECIMAL(25,6) — order-insensitive, so the bucketed and
    plain plans (and the oracle) agree bit-for-bit.  RSI rounds to 4dp.

    Scale shape: ``m = n`` row-overlap carry (the frame's oldest return
    needs ITS predecessor row, so lag-1 plus the ``n−1`` frame depth needs
    exactly ``n`` carried rows); n_symbols × n_days tasks.
    """
    order = [F.col("event_time"), F.col("price"), F.col("volume")]
    if bucket_seconds is None:
        w = Window.partitionBy("symbol").orderBy(*order)
        src = ticks.select("symbol", "event_time", "price", "volume")
    else:
        src = frames.with_row_overlap(
            ticks.select("symbol", "event_time", "price", "volume"),
            key="symbol",
            order_cols=("event_time", "price", "volume"),
            m=n,
            time_col="event_time",
            bucket_seconds=bucket_seconds,
        )
        w = Window.partitionBy("symbol", frames.BUCKET_COL).orderBy(*order)
    prev = F.lag("price", 1).over(w)
    ret = F.round(F.when(prev != 0, (F.col("price") - prev) / prev), 6)
    frame = w.rowsBetween(-(n - 1), Window.currentRow)
    dec = "decimal(25,6)"
    withret = src.withColumn("_ret", ret)
    sg = (
        F.sum(F.greatest(F.col("_ret"), F.lit(0.0)).cast(dec))
        .over(frame)
        .cast("double")
    )
    sl = (
        F.sum(F.greatest(-F.col("_ret"), F.lit(0.0)).cast(dec))
        .over(frame)
        .cast("double")
    )
    cnt = F.count("_ret").over(frame)
    # materialize the frame aggregates once (window expressions are not
    # CSE'd by Catalyst — re-using `sl` in two branches would plan the
    # sliding decimal sum twice), then finish in a plain projection
    moments = withret.select(
        "symbol",
        "event_time",
        "price",
        sg.alias("_sg"),
        sl.alias("_sl"),
        cnt.alias("_cnt"),
        *([] if bucket_seconds is None else [frames.BUCKET_COL, frames.CARRY_COL]),
    )
    out = moments.select(
        "symbol",
        "event_time",
        "price",
        F.round(
            F.when(F.col("_cnt") == 0, F.lit(None).cast("double"))
            .when(F.col("_sl") == 0, F.lit(100.0))
            .otherwise(
                100.0 - 100.0 / (1.0 + F.col("_sg") / F.col("_sl"))
            ),
            4,
        ).alias("rsi"),
        *([] if bucket_seconds is None else [frames.BUCKET_COL, frames.CARRY_COL]),
    )
    return out if bucket_seconds is None else frames.finalize(out)


def donchian_breakouts(
    ticks: DataFrame, n: int = 20, bucket_seconds: int | None = 86_400
) -> DataFrame:
    """Donchian channel breakout screen: each tick against the max/min of
    the PREVIOUS ``n`` ticks (current row excluded — the channel must not
    contain the tick being tested, or a new high could never fire).

    ``ROWS BETWEEN n PRECEDING AND 1 PRECEDING`` frame; comparisons are
    raw-double exact (both engines take extrema of the same values — no
    arithmetic, no rounding needed).  Global-first rows have an empty
    channel → flags pin to false, channel NULL.

    Scale shape: ``m = n`` row-overlap carry, n_symbols × n_days tasks.
    """
    order = [F.col("event_time"), F.col("price"), F.col("volume")]
    if bucket_seconds is None:
        w = Window.partitionBy("symbol").orderBy(*order)
        src = ticks.select("symbol", "event_time", "price", "volume")
    else:
        src = frames.with_row_overlap(
            ticks.select("symbol", "event_time", "price", "volume"),
            key="symbol",
            order_cols=("event_time", "price", "volume"),
            m=n,
            time_col="event_time",
            bucket_seconds=bucket_seconds,
        )
        w = Window.partitionBy("symbol", frames.BUCKET_COL).orderBy(*order)
    frame = w.rowsBetween(-n, -1)
    # frame extrema materialized once (no window-expression CSE in
    # Catalyst; the breakout comparisons reuse the columns, not the
    # window aggregates)
    chans = src.select(
        "symbol",
        "event_time",
        "price",
        F.max("price").over(frame).alias("channel_high"),
        F.min("price").over(frame).alias("channel_low"),
        *([] if bucket_seconds is None else [frames.BUCKET_COL, frames.CARRY_COL]),
    )
    out = chans.select(
        "symbol",
        "event_time",
        "price",
        "channel_high",
        "channel_low",
        F.coalesce(
            F.col("price") > F.col("channel_high"), F.lit(False)
        ).alias("breakout_up"),
        F.coalesce(
            F.col("price") < F.col("channel_low"), F.lit(False)
        ).alias("breakout_down"),
        *([] if bucket_seconds is None else [frames.BUCKET_COL, frames.CARRY_COL]),
    )
    return out if bucket_seconds is None else frames.finalize(out)


def obv(ticks: DataFrame, bucket_seconds: int | None = 86_400) -> DataFrame:
    """On-balance volume: running Σ of signed volume (+vol on an uptick,
    −vol on a downtick, 0 on flat / first tick / null volume).

    UNBOUNDED cumulative windows can't use an overlap carry (the frame is
    the whole history), so the scale path is a genuine distributed prefix
    sum — the textbook two-pass scan:

    1. per (symbol, day bucket): local running Σ, with a 1-row overlap
       carry only to compute the boundary tick's direction;
    2. per symbol over BUCKET SUMMARIES (n_buckets rows, not ticks): the
       exclusive prefix of bucket totals;
    3. broadcast-shaped join back; ``obv = bucket_prefix + local_running``.

    Integer arithmetic throughout (volume is BIGINT) — the two-pass and
    single-window plans are exactly equal, no rounding needed.
    ``bucket_seconds=None`` keeps the plain per-symbol cumulative window.
    """
    order = [F.col("event_time"), F.col("price"), F.col("volume")]
    cols = ("symbol", "event_time", "price", "volume")
    if bucket_seconds is None:
        w = Window.partitionBy("symbol").orderBy(*order)
        prev = F.lag("price", 1).over(w)
        flow = (
            F.when(F.col("price") > prev, F.coalesce(F.col("volume"), F.lit(0)))
            .when(F.col("price") < prev, -F.coalesce(F.col("volume"), F.lit(0)))
            .otherwise(F.lit(0))
        )
        cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return ticks.select(*cols).select(
            *cols, F.sum(flow).over(cum).cast("long").alias("obv")
        )
    src = frames.with_row_overlap(
        ticks.select(*cols),
        key="symbol",
        order_cols=("event_time", "price", "volume"),
        m=1,
        time_col="event_time",
        bucket_seconds=bucket_seconds,
    )
    w = Window.partitionBy("symbol", frames.BUCKET_COL).orderBy(*order)
    prev = F.lag("price", 1).over(w)
    flow = (
        F.when(F.col("price") > prev, F.coalesce(F.col("volume"), F.lit(0)))
        .when(F.col("price") < prev, -F.coalesce(F.col("volume"), F.lit(0)))
        .otherwise(F.lit(0))
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = src.withColumn("_flow", flow).withColumn(
        "_local", F.sum("_flow").over(cum)
    )
    # carry rows have prev=NULL → flow 0: they pad the local prefix without
    # perturbing it, and the bucket totals below exclude nothing real
    totals = local.groupBy("symbol", frames.BUCKET_COL).agg(
        F.sum("_flow").alias("_total")
    )
    wb = Window.partitionBy("symbol").orderBy(frames.BUCKET_COL)
    prefix = totals.withColumn(
        "_prefix",
        F.coalesce(
            F.sum("_total").over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("symbol", frames.BUCKET_COL, "_prefix")
    return frames.finalize(
        local.join(prefix, ["symbol", frames.BUCKET_COL])
    ).select(
        *cols, (F.col("_prefix") + F.col("_local")).cast("long").alias("obv")
    )


def max_drawdown(
    ticks: DataFrame, bucket_seconds: int | None = 86_400
) -> DataFrame:
    """Per-symbol maximum drawdown: the most negative peak-to-trough price
    decline, with the running peak and the (earliest) trough timestamp.

    Per-tick drawdown needs the RUNNING MAX from the stream start — like
    :func:`obv`, an unbounded window — so the scale path is the same
    distributed prefix scan: per-bucket local running max, bucket-summary
    prefix max per symbol (rows = buckets), and
    ``peak = greatest(prefix_max, local_running_max)``.  The final
    per-symbol reduction (``min_by`` on (drawdown, time)) is a plain hash
    aggregate; ties at the same 6dp drawdown resolve to the earliest tick.
    """
    order = [F.col("event_time"), F.col("price"), F.col("volume")]
    cols = ("symbol", "event_time", "price", "volume")
    if bucket_seconds is None:
        w = Window.partitionBy("symbol").orderBy(*order)
        cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ticked = ticks.select(*cols).withColumn("_peak", F.max("price").over(cum))
    else:
        src = ticks.select(*cols).withColumn(
            frames.BUCKET_COL,
            frames.bucket_of("event_time", bucket_seconds),
        )
        w = Window.partitionBy("symbol", frames.BUCKET_COL).orderBy(*order)
        cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        local = src.withColumn("_local_max", F.max("price").over(cum))
        totals = src.groupBy("symbol", frames.BUCKET_COL).agg(
            F.max("price").alias("_bmax")
        )
        wb = Window.partitionBy("symbol").orderBy(frames.BUCKET_COL)
        prefix = totals.withColumn(
            "_prefix_max",
            F.max("_bmax").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        ).select("symbol", frames.BUCKET_COL, "_prefix_max")
        ticked = (
            local.join(prefix, ["symbol", frames.BUCKET_COL])
            .withColumn(
                "_peak", F.greatest(F.col("_local_max"), F.col("_prefix_max"))
            )
            .drop(frames.BUCKET_COL, "_local_max", "_prefix_max")
        )
    dd = F.round((F.col("price") - F.col("_peak")) / F.col("_peak"), 6)
    perdd = ticked.withColumn("_dd", dd)
    return (
        perdd.groupBy("symbol")
        .agg(
            F.min("_dd").alias("max_drawdown"),
            F.min_by(
                F.struct(
                    F.col("event_time").alias("trough_time"),
                    F.col("_peak").alias("peak_price"),
                    F.col("price").alias("trough_price"),
                ),
                # total order: duplicate (symbol, event_time) ticks exist, so
                # (dd, time) alone leaves peak/trough nondeterministic — add
                # price then peak to the tie-break, per the module's
                # (event_time, price, volume) ordering convention
                F.struct(
                    F.col("_dd"),
                    F.col("event_time"),
                    F.col("price"),
                    F.col("_peak"),
                ),
            ).alias("_at"),
            F.max("price").alias("all_time_high"),
        )
        .select(
            "symbol",
            "max_drawdown",
            F.col("_at.trough_time").alias("trough_time"),
            F.col("_at.peak_price").alias("peak_price"),
            F.col("_at.trough_price").alias("trough_price"),
            "all_time_high",
        )
        .orderBy("symbol")
    )
