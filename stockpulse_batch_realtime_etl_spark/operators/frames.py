"""Bucketed window-frame helpers — retire the per-symbol parallelism ceiling.

Window operators partitioned by symbol alone (rolling frames, LOCF) put a
symbol's ENTIRE history into one task: with ~5 hot symbols that is a 5-way
parallelism ceiling and an executor-memory cliff at deep histories.  These
helpers re-partition on (symbol, coarse time bucket) and restore exactness
with a small overlap carry, so the window stage runs n_symbols × n_buckets
tasks and per-task state is bounded by the bucket span.

Three primitives, one shared shape (bounded per-bucket work → per-symbol
stitch over per-BUCKET summaries → broadcast back):

* :func:`with_time_overlap` — bounded RANGE frames (``RANGE t PRECEDING``):
  rows within the horizon of their bucket's end are duplicated into the next
  bucket as carry rows.  Exact when ``bucket_seconds >= horizon_seconds``
  (a frame can then reach at most one bucket back).  ≤ 2× shuffle volume,
  no sequential step at all.
* :func:`with_row_overlap` — bounded ROWS frames (``ROWS m PRECEDING``):
  per-bucket last-``m`` tails (JVM-side sorted ``collect_list`` slice),
  telescoped per symbol over bucket COUNTS (the only sequential step, one
  tiny Arrow group per symbol), exploded back as carry rows.  Exact for any
  bucket population — a sparse bucket's carry list reaches arbitrarily far
  back because the stitch threads the stream tail through every bucket.
* LOCF carries for gap-fill live in ``ohlcv.gapfill_bars`` directly: the
  per-bucket "last non-null value" summary table is windowed per symbol
  (rows = buckets, not ticks) — no pandas, no row duplication.

Callers run their window over ``PARTITION BY (key, _bucket)`` and drop the
``_carry`` rows from the output.  Determinism requirement for row frames:
``order_cols`` must order rows totally up to full-row equality (true for
the tick model, where payload == order columns).

Preconditions (validated where cheap, documented where not):

* ``time_col`` must be NON-NULL — a null time has no bucket, and the
  bucketed and plain plans would disagree on where nulls sort.  The tick
  model guarantees this (null event_time is dead-lettered before any
  window operator); enforce the same upstream for new sources.
* ``order_cols`` must LEAD with ``time_col`` — exactness relies on carry
  rows (earlier buckets) sorting strictly before a bucket's own rows in
  the caller's window order (validated below).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stockpulse_batch_realtime_etl_spark.functions.scalars import ts_micros

BUCKET_COL = "_bucket"
CARRY_COL = "_carry"


def bucket_of(time_col: str, bucket_seconds: int):
    return F.floor(ts_micros(time_col) / (bucket_seconds * 1_000_000))


def with_time_overlap(
    df: DataFrame,
    time_col: str,
    horizon_seconds: int,
    bucket_seconds: int,
) -> DataFrame:
    """Prepare ``df`` for a bounded RANGE frame over (key, ``_bucket``).

    Every row lands in its own bucket (``_carry = false``); rows within
    ``horizon_seconds`` of their bucket's END are additionally copied into
    the following bucket (``_carry = true``), so any row's
    ``[t - horizon, t]`` frame is fully contained in its partition.
    """
    if bucket_seconds < horizon_seconds:
        raise ValueError(
            f"bucket_seconds={bucket_seconds} must cover the frame horizon "
            f"{horizon_seconds}s — otherwise a frame spans >1 bucket back"
        )
    b = bucket_of(time_col, bucket_seconds)
    own = df.withColumn(BUCKET_COL, b).withColumn(CARRY_COL, F.lit(False))
    micros = ts_micros(time_col)
    carry = (
        df.withColumn(BUCKET_COL, b + 1)
        .withColumn(CARRY_COL, F.lit(True))
        .filter(
            micros
            >= (F.col(BUCKET_COL) * bucket_seconds - horizon_seconds) * 1_000_000
        )
    )
    return own.unionByName(carry)


def with_row_overlap(
    df: DataFrame,
    key: str,
    order_cols: Sequence[str],
    m: int,
    time_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Prepare ``df`` for a ``ROWS m PRECEDING`` frame over (key, _bucket).

    The ``m`` rows immediately preceding each bucket's start in the
    symbol's full stream are injected as carry rows.  Computed without ever
    materializing a symbol's history in one task:

    1. per (key, bucket): rank rows from the bucket's END with a window
       (``row_number`` descending — sort-based, spills gracefully), keep
       ``rn <= m``, and only THEN ``collect_list`` — the aggregate buffer
       holds at most ``m`` rows per bucket.  (Collecting the whole bucket
       and slicing after would bound the ARRAY by m but the agg buffer by
       bucket population — exactly the memory cliff this helper retires.)
    2. per key: telescope ``tail(k) = last_m(tail(k-1) ++ own_tail(k))``
       over bucket summaries (#buckets rows, one tiny Arrow group);
    3. explode each bucket's carry-in list back and union with the data.
    """
    import pandas as pd

    from pyspark.sql.window import Window

    if bucket_seconds <= 0 or m < 1:
        raise ValueError(
            f"with_row_overlap: bucket_seconds={bucket_seconds} must be > 0 "
            f"and m={m} >= 1"
        )
    if not order_cols or order_cols[0] != time_col:
        raise ValueError(
            f"with_row_overlap: order_cols must lead with time_col "
            f"({time_col!r}); got {tuple(order_cols)!r} — carry rows from "
            "earlier buckets must sort before a bucket's own rows or the "
            "injected tail is not the m preceding rows"
        )
    payload = [c for c in df.columns if c != key]
    ordered = list(order_cols) + [c for c in payload if c not in order_cols]

    b = bucket_of(time_col, bucket_seconds)
    own = df.withColumn(BUCKET_COL, b).withColumn(CARRY_COL, F.lit(False))

    wdesc = Window.partitionBy(key, BUCKET_COL).orderBy(
        *[F.col(c).desc() for c in ordered]
    )
    tails = (
        df.withColumn(BUCKET_COL, b)
        .withColumn("_rn", F.row_number().over(wdesc))
        .filter(F.col("_rn") <= m)
        .groupBy(key, BUCKET_COL)
        .agg(
            F.sort_array(F.collect_list(F.struct(*ordered))).alias("tail")
        )
    )

    def _stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        # one row per BUCKET; tails are lists of ≤ m row-dicts.  Plain
        # list iteration, not iterrows: this is the one sequential step,
        # and at fine buckets over deep histories (hundreds of thousands
        # of bucket rows per key) a Series-per-row loop would stall it
        pdf = pdf.sort_values(BUCKET_COL).reset_index(drop=True)
        carry_rows, stream_tail = [], []
        for tail in pdf["tail"]:
            carry_rows.append(list(stream_tail))
            stream_tail = (stream_tail + list(tail))[-m:]
        out = pdf[[key, BUCKET_COL]].copy()
        out["carry"] = carry_rows
        return out

    tail_type = tails.schema["tail"].dataType
    key_type = df.schema[key].dataType.simpleString()
    carries = tails.groupBy(key).applyInPandas(
        _stitch,
        f"{key} {key_type}, {BUCKET_COL} long, "
        f"carry {tail_type.simpleString()}",
    )
    carry_rows = (
        carries.select(key, BUCKET_COL, F.explode("carry").alias("r"))
        .select(key, BUCKET_COL, *[F.col(f"r.{c}").alias(c) for c in ordered])
        .select(*df.columns, BUCKET_COL)
        .withColumn(CARRY_COL, F.lit(True))
    )
    return own.unionByName(carry_rows)


def finalize(df: DataFrame) -> DataFrame:
    """Drop carry rows and the bucketing scaffolding after the window."""
    return df.filter(~F.col(CARRY_COL)).drop(BUCKET_COL, CARRY_COL)
