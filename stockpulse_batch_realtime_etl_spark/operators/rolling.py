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
    ticks: DataFrame, alpha: float = 0.2, chunk_seconds: int | None = 86_400
) -> DataFrame:
    """Per-symbol exponential moving average — the recursive time-series
    operator (EMA_t = α·p_t + (1−α)·EMA_{t−1}) that no finite window frame
    can express: every output depends on the ENTIRE history, so it is the
    textbook case for ``applyInPandas`` (custom-operator ladder step (b) —
    composition of built-ins is impossible, a full stateful stream operator
    is overkill for batch).

    Scale shape (default, ``chunk_seconds`` set): a per-SYMBOL group would
    be one task holding the symbol's entire history — a ~n_symbols
    parallelism ceiling and an executor-memory cliff at deep histories.
    Instead the recursion is split by (symbol, time chunk) using its
    linearity:

        EMA_i = local_i + (1−α)^i · C_chunk

    where ``local_i`` is the zero-seeded in-chunk contribution
    Σ_{j≤i} α(1−α)^{i−j} p_j and ``C_chunk`` is the EMA carried out of the
    previous chunk.  Three fully distributed steps:

    1. per (symbol, chunk): vectorized pandas ``ewm`` on a zero-prepended
       series → per-row ``local_i`` and decay (1−α)^i (Arrow-batched);
    2. per (symbol, chunk): JVM-side fold (``aggregate`` over a sorted
       ``collect_list``) → chunk end-state summary (n, first price, L_end)
       — rows ≈ #chunks, so the per-symbol sequential stitch
       C_{k+1} = L_k + (1−α)^{n_k}·C_k touches chunk COUNTS, not ticks;
    3. broadcast the tiny carry table back and finish the identity.

    The seed matches pandas ``adjust=False`` (EMA_1 = p_1): C_1 = first
    price of the symbol.  ``chunk_seconds=None`` falls back to the
    single-group-per-symbol path (used by tests as the equality baseline).
    Chunk span trades per-group Arrow overhead against parallelism /
    per-task memory: daily chunks keep a symbol-day (≲ a few hundred MB at
    exchange feed rates) per task while yielding n_symbols×n_days tasks.

    Not oracle-checked (the driver records a rows-only check): the
    recursion is inexpressible in DuckDB short of a per-row recursive CTE.
    Correctness is pinned instead by tests/test_rolling_asof.py against the
    closed form Σ α(1−α)^k p_{t−k} computed independently in numpy, plus a
    chunked-vs-single equality test.
    """
    import numpy as np
    import pandas as pd

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

    base = ticks.select("symbol", "event_time", "price").withColumn(
        "chunk", F.floor(F.unix_micros("event_time") / (chunk_seconds * 1_000_000))
    )

    local_schema = (
        "symbol string, chunk long, event_time timestamp, price double, "
        "local double, decay double"
    )

    def _local(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["event_time", "price"]).reset_index(drop=True)
        prices = pdf["price"].to_numpy(dtype="float64")
        # zero-prepended ewm ≡ the recursion seeded with 0: exactly local_i
        seeded = pd.Series(np.concatenate(([0.0], prices)))
        pdf["local"] = seeded.ewm(alpha=alpha, adjust=False).mean().to_numpy()[1:]
        pdf["decay"] = np.power(
            1.0 - alpha, np.arange(1, len(prices) + 1, dtype="float64")
        )
        return pdf[["symbol", "chunk", "event_time", "price", "local", "decay"]]

    local = base.groupBy("symbol", "chunk").applyInPandas(_local, local_schema)

    # Chunk summaries computed independently of the pandas stage (no cache /
    # double compute), via the recursion's closed form
    # l_end = Σ_j α(1−α)^(n−j) p_j — row_number/count window + one
    # hash-aggregate, all whole-stage codegen (an earlier sorted
    # collect_list + interpreted HOF fold benched ~3× slower; float
    # summation-order noise vs the fold is ~1e-15, under the 6dp output
    # rounding, and EMA is rows-only checked).  The window shuffles on the
    # same (symbol, chunk) key as the pandas stage, so AQE reuses the
    # exchange, and the groupBy below inherits that partitioning.
    wc = Window.partitionBy("symbol", "chunk")
    wo = wc.orderBy("event_time", "price")
    ranked = base.select(
        "symbol",
        "chunk",
        "price",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
        F.first("price").over(wo).alias("p_head"),
    )
    summaries = ranked.groupBy("symbol", "chunk").agg(
        F.max("n").alias("n"),
        F.min_by("p_head", "rn").alias("p_first"),
        F.sum(
            F.lit(alpha)
            * F.pow(F.lit(1.0 - alpha), F.col("n") - F.col("rn"))
            * F.col("price")
        ).alias("l_end"),
    )

    carry_schema = "symbol string, chunk long, carry double"

    def _carries(pdf: pd.DataFrame) -> pd.DataFrame:
        # one row per CHUNK (not per tick) — the only sequential step
        pdf = pdf.sort_values("chunk").reset_index(drop=True)
        carries = np.empty(len(pdf))
        carry = float(pdf["p_first"].iloc[0])  # seed: EMA_1 = p_1
        for i in range(len(pdf)):
            carries[i] = carry
            carry = float(pdf["l_end"].iloc[i]) + (1.0 - alpha) ** int(
                pdf["n"].iloc[i]
            ) * carry
        return pd.DataFrame(
            {"symbol": pdf["symbol"], "chunk": pdf["chunk"], "carry": carries}
        )

    carries = summaries.groupBy("symbol").applyInPandas(_carries, carry_schema)

    return local.join(F.broadcast(carries), ["symbol", "chunk"]).select(
        "symbol",
        "event_time",
        "price",
        F.round(F.col("local") + F.col("decay") * F.col("carry"), 6).alias("ema"),
    )
