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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Inner equi-join that survives a hot fact key: salt the fact side with
    ``hash(whole row) % buckets`` and EXPLODE the dim side across all
    buckets, so a hot key's rows spread over ``buckets`` reducers instead
    of one.

    When to reach for this: the dim side is too big to broadcast (else
    Catalyst broadcasts and skew is moot) AND the fact key distribution is
    pathological beyond what AQE's skew-split handles (AQE splits oversized
    partitions post-shuffle but cannot split one key's sort group in a
    sort-merge join).  Cost: the dim side replicates ×buckets — choose
    buckets ≈ hot-key concentration, not cluster size.

    Exact: every fact row meets its dim row in exactly one (key, salt)
    bucket, so the result multiset equals the plain join's
    (tests/test_skew.py asserts equality).
    """
    fact_cols = [F.col(c) for c in fact.columns]
    salted_fact = fact.select(
        *fact_cols,
        F.pmod(F.xxhash64(F.struct(*fact_cols)), F.lit(salt_buckets)).alias(
            "_salt"
        ),
    )
    exploded_dim = dim.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1))
        ).alias("_salt"),
    )
    return salted_fact.join(exploded_dim, [key, "_salt"], "inner").drop("_salt")
