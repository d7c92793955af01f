"""S1 simulated producer and S2/S5 Kafka builders."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from stockpulse_batch_realtime_etl_spark.sources import kafka, rate


def test_simulated_tick_batch_shape_and_determinism(spark):
    a = rate.simulated_tick_batch(spark, 100).collect()
    b = rate.simulated_tick_batch(spark, 100).collect()
    assert a == b  # fully deterministic (seeded md5, not random())
    assert len(a) == 100
    syms = {r.symbol for r in a}
    assert syms == set(rate.BASE_PRICES)  # all 6 symbols appear
    for r in a:
        base = rate.BASE_PRICES[r.symbol]
        assert abs(r.price - base) <= 0.5 + 1e-9  # drift bound ±0.5
        assert 500 <= r.volume < 15000  # producer.py:70 volume range
        assert r.event_time is not None


def test_simulated_tick_stream_is_streaming_with_tick_schema(spark):
    s = rate.simulated_tick_stream(spark, 2)
    assert s.isStreaming
    assert [f.name for f in s.schema.fields] == [
        "symbol",
        "price",
        "volume",
        "event_time",
    ]


def test_encode_ticks_for_kafka_round_trips(spark):
    ticks = rate.simulated_tick_batch(spark, 10)
    enc = kafka.encode_ticks_for_kafka(ticks).collect()
    assert all(r.key == json.loads(r.value)["symbol"] for r in enc)
    # keyed by symbol → per-symbol partition ordering (producer.py:87)
    payload = json.loads(enc[0].value)
    assert set(payload) == {"symbol", "price", "volume", "event_time"}


def test_kafka_value_to_raw_maps_dlq_metadata(spark):
    fake = spark.createDataFrame(
        [(b"x", "stock.ticks.v1", 0, 7)],
        "value binary, topic string, partition int, offset long",
    )
    row = kafka.kafka_value_to_raw(fake).collect()[0]
    assert (row.value, row.topic, row.partition, row.offset) == (
        "x",
        "stock.ticks.v1",
        0,
        7,
    )


def test_rate_ticks_feed_ohlcv(spark):
    from stockpulse_batch_realtime_etl_spark.operators.ohlcv import ohlcv_bars

    bars = ohlcv_bars(rate.simulated_tick_batch(spark, 240)).collect()
    # 240 ticks at 2s cadence = 480s = 8 minutes × up to 6 symbols
    assert len(bars) > 0
    for b in bars:
        assert b.low <= b.open <= b.high
        assert b.low <= b.close <= b.high


def test_yfinance_fixture_normalizes_wide_shape(spark):
    """Reference S3/S4 (producer_yfinance.py:100-109): wide OHLCV rows with
    no price field land as ticks with price := close, uppercased symbol."""
    from stockpulse_batch_realtime_etl_spark.sources.yfinance_batch import (
        YFINANCE_FIXTURE,
        yfinance_ticks,
    )

    out = {
        (r.symbol, str(r.event_time), r.source): r
        for r in yfinance_ticks(spark).collect()
    }
    assert len(out) == len(YFINANCE_FIXTURE)
    for rec in YFINANCE_FIXTURE:
        row = out[(rec["symbol"].upper(),
                   rec["event_time"].replace("T", " ").replace("+00:00", ""),
                   rec["source"])]
        assert row.price == rec["close"]  # price := close
        assert row.open == rec["open"] and row.volume == rec["volume"]
        assert row.event_time is not None and row.created_at is not None
