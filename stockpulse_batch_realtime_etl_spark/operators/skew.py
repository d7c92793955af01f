"""Skew-salted aggregation: exact results when one group key is hot.

The reference's key space is 6 symbols (producer.py:20) — at 100 TB a
popular symbol concentrates on one reducer.  Plain SUM/COUNT/MIN/MAX are
already immune (partial aggregation combines map-side), but **per-key
DISTINCT counting is not**: Spark plans count(DISTINCT v) as an Expand +
re-shuffle where every distinct (key, value) pair of a hot key still lands
on that key's single reducer.

``salted_distinct_count`` spreads each key's VALUE space across
``buckets`` reducers by salting with ``hash(value) % buckets``:

    stage 1: distinct over (key, salt, value)   — shuffle keyed (key, salt);
             a hot key's dedup work is now buckets-way parallel
    stage 2: count per (key, salt), sum per key — tiny

Because the salt is a pure function of the value, the same value never
lands in two buckets, so the per-bucket counts sum to the EXACT global
distinct count — no approximation.  AQE's skew handling splits oversized
partitions after the fact; salting removes the hotspot by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame, key: str, value: str, buckets: int = 32
) -> DataFrame:
    """Exact per-key distinct-value count, hot-key-proof.

    Output: (key, distinct_count), one row per key.  ``xxhash64`` is the
    salt (engine-private is fine — the salt never leaves the query; results
    are engine-portable and oracle-checked against plain COUNT(DISTINCT)).
    """
    salted = df.select(
        F.col(key),
        F.col(value),
        F.pmod(F.xxhash64(F.col(value)), F.lit(buckets)).alias("_salt"),
    )
    per_bucket = (
        salted.distinct()
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_bucket.groupBy(key)
        .agg(F.sum("c").alias("distinct_count"))
        .orderBy(key)
    )
