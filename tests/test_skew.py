"""Salted distinct count: exact under salting, hot-key spread verified."""

from __future__ import annotations

from pyspark.sql import functions as F

from stockpulse_batch_realtime_etl_spark.operators.skew import salted_distinct_count


def test_salted_distinct_count_is_exact(spark):
    # hot key: 10k values for A (some repeated), 3 for B
    df = spark.range(10000).select(
        F.lit("A").alias("k"), (F.col("id") % 7000).alias("v")
    ).union(
        spark.range(3).select(F.lit("B").alias("k"), F.col("id").alias("v"))
    )
    got = {r.k: r.distinct_count for r in salted_distinct_count(df, "k", "v").collect()}
    assert got == {"A": 7000, "B": 3}


def test_salted_matches_plain_count_distinct(spark):
    from stockpulse_batch_realtime_etl_spark.sources.ticks import ticks_from_events

    ticks = ticks_from_events(spark, "/root/testdata/sf0.001")
    plain = {
        r.symbol: r.c
        for r in ticks.groupBy("symbol")
        .agg(F.countDistinct("price").alias("c"))
        .collect()
    }
    salted = {
        r.symbol: r.distinct_count
        for r in salted_distinct_count(ticks, "symbol", "price").collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key_across_buckets(spark):
    df = spark.range(1000).select(F.lit("HOT").alias("k"), F.col("id").alias("v"))
    salted = df.select(
        F.pmod(F.xxhash64(F.col("v")), F.lit(32)).alias("_salt")
    ).distinct()
    n_buckets = salted.count()
    assert n_buckets == 32  # every bucket occupied → 32-way parallel dedup


def test_salted_join_equals_plain_join(spark):
    from stockpulse_batch_realtime_etl_spark.operators.skew import salted_join

    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [("HOT" if i % 10 else f"K{i}", float(i)) for i in range(1000)],
        "symbol string, v double",
    )
    dim = spark.createDataFrame(
        [("HOT", 1), ("K10", 2), ("K20", 3), ("K30", 4)],
        "symbol string, meta int",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = sorted(map(tuple, salted_join(fact, dim, "symbol", 8).collect()))
        want = sorted(map(tuple, fact.join(dim, "symbol").collect()))
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
