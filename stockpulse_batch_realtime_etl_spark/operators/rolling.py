"""Rolling window-frame analytics over ticks — the operator class the
reference's API *implies* (price change over a window, bars.py:141) but
never generalizes: moving averages, rolling extrema, per-tick returns.

All are window-frame expressions (``ROWS BETWEEN n PRECEDING AND CURRENT
ROW``) — one shuffle on the partition key, one sort per partition, then a
single running pass; everything stays in whole-stage codegen.

Scale shape: the shuffle is keyed by symbol.  With few hot symbols (the
reference has 6) a single symbol's history lands in one partition — the
standard fix is range-partitioning on (symbol, coarse time bucket) and
computing frames per bucket with a ``bucket-1`` overlap carry; at the
reference's cardinalities (and the driver's, ~10 keys) plain partitioning
is correct and optimal.  Deterministic ordering: ties on event_time are
broken by (price, volume) in the frame ORDER BY, matching the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _frame():
    return Window.partitionBy("symbol").orderBy(
        F.col("event_time"), F.col("price"), F.col("volume")
    )


def rolling_stats(ticks: DataFrame, n: int = 10) -> DataFrame:
    """Per tick: simple moving average / min / max of the last ``n`` ticks
    (current row inclusive) and the tick-over-tick return.

    ``sma`` / extrema use a ROWS frame (count-based — robust to irregular
    tick spacing); ``ret`` is ``price/lag(price) - 1``.  6dp rounding on
    both sides of the oracle pins float noise.
    """
    w = _frame()
    frame = w.rowsBetween(-(n - 1), Window.currentRow)
    prev = F.lag("price", 1).over(w)
    return ticks.select(
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
    )


EMA_SCHEMA = (
    "symbol string, event_time timestamp, price double, ema double"
)


def ema(ticks: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Per-symbol exponential moving average — the recursive time-series
    operator (EMA_t = α·p_t + (1−α)·EMA_{t−1}) that no finite window frame
    can express: every output depends on the ENTIRE history, so it is the
    textbook case for ``applyInPandas`` (custom-operator ladder step (b) —
    composition of built-ins is impossible, a full stateful stream operator
    is overkill for batch).

    One shuffle on symbol; each group is ordered and EMA'd vectorized in
    pandas (Arrow-batched, C-loop ``ewm`` — not a Python row loop).  Skew
    note: one group = one task; with few hot symbols and deep history,
    split by (symbol, coarse epoch) and stitch with the carry-in
    EMA·(1−α)^gap identity.

    Not oracle-checked (the driver records a rows-only check): the
    recursion is inexpressible in DuckDB short of a per-row recursive CTE.
    Correctness is pinned instead by tests/test_rolling_asof.py against the
    closed form Σ α(1−α)^k p_{t−k} computed independently in numpy.
    """
    import pandas as pd

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
