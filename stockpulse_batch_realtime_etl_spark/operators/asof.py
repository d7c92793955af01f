"""As-of join: for every left row, the single most recent right row with
``right_time <= left_time``, per key — the canonical time-series join
(ticks → their bar context, trades → quotes).

The reference expresses only the degenerate "latest per key" flavor
(DISTINCT ON, bars.py:122-135 — our serving.latest_tick_per_symbol); the
general binary operator is implemented here the Spark-native way:

**union + ordered last_value carry-forward** — tag both inputs, union them,
sort each key's timeline once, and carry the latest right-side values
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
frame; left rows then read their carried context.  Cost: ONE shuffle on the
key + one sort per partition — the merge-join shape, with no range-join
explosion and no per-row subquery.  (A broadcast-able right side could also
use a bucketed range join; the union form needs no size assumption and is
the 100 TB default.  Key skew → the same coarse-time-bucket salting as any
keyed sort.)

At equal timestamps the right row sorts BEFORE the left row (tag ordering),
so a bar stamped exactly at the tick's time IS visible — inclusive
semantics, identical to DuckDB's native ``ASOF JOIN`` (``l.t >= r.t``),
which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join; output = every left row + the matched right_cols
    (null where no right row qualifies).

    ``direction="backward"`` (default): latest right row with
    ``right_time <= left_time`` — the trades→quotes classic.
    ``direction="forward"``: EARLIEST right row with ``right_time >=
    left_time`` (the next bar/quote after an event — fill simulation,
    forward-looking labels).  Same single-shuffle union+carry plan, with
    the timeline ordered descending so the carry runs from the future
    backward; at equal timestamps the right row still wins the tie
    (inclusive semantics in both directions, matching DuckDB ASOF's
    ``>=`` / ``<=``)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    lt = F.col(left_time)
    l_tagged = left.select(
        F.col(key).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    t_order = F.col("_t") if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_side",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rc_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rc_{c}").alias(c) for c in right_cols],
    )
    return out
