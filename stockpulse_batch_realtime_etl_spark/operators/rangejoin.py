"""Interval (range) containment join — the bucket-expansion equi-join.

Spark has no native range join: ``point.t BETWEEN iv.start AND iv.end``
with only a key equality plans a per-key cartesian (SortMergeJoin on the
key, range as a residual filter) — with a handful of hot keys that is
|points_per_key| × |intervals_per_key| pair evaluations, the classic
range-join blowup; with no key at all it degrades to
BroadcastNestedLoopJoin.  The fix every interval-aware engine applies
(and Databricks' range-join "binning" optimization mirrors): quantize
time into coarse buckets, EXPLODE each interval into the buckets it
covers, and equi-join on (key, bucket) so only same-bucket pairs are ever
formed.  The exact containment predicate runs as a post-join filter on
that restricted pair set.

No duplicate results by construction — an interval appears once per
covered bucket, and a point equi-joins only the copy tagged with the
point's OWN bucket, so each (point, interval) pair meets exactly once
even when intervals overlap.

Choosing ``bucket_seconds`` ≈ the typical interval length bounds the
expansion factor at ~2 copies per interval while keeping buckets
selective; at 100 TB both sides shuffle (or the dimension-sized interval
side broadcasts) on (key, bucket) — never a per-key cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stockpulse_batch_realtime_etl_spark.functions.scalars import ts_micros


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Inner join of point rows to every interval containing them:
    ``points.key == intervals.key AND start <= t < end`` (half-open).

    Output: all point columns + all interval columns (key once).
    ``broadcast_intervals`` fits the common shape (dimension-sized interval
    table — the points side then never shuffles); pass False to let
    AQE pick a shuffled hash join when the interval side is large.
    """
    us = bucket_seconds * 1_000_000
    # Empty intervals (end <= start) contain nothing; drop them before the
    # explode — Spark's sequence(a, b) would otherwise run DESCENDING for
    # them and tag phantom buckets.
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    expanded = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(ts_micros(start_col) / us),
                # half-open end: the end-instant itself needs no bucket
                F.floor((ts_micros(end_col) - 1) / us),
            )
        ),
    )
    if broadcast_intervals:
        expanded = F.broadcast(expanded)
    pts = points.withColumn("_bucket", F.floor(ts_micros(time_col) / us))
    out_cols = points.columns + [c for c in intervals.columns if c != key]
    return (
        pts.join(expanded, [key, "_bucket"])
        .filter(
            (F.col(time_col) >= F.col(start_col))
            & (F.col(time_col) < F.col(end_col))
        )
        .select(*out_cols)
    )
