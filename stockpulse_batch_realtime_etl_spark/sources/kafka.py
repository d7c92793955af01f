"""Kafka source/sink builders (ops S2, S5, S11) — the reference's wire
topology as Structured Streaming configuration.

No broker exists in the test environment, so these builders are exercised
two ways: the *transformations* (encode to key/value, decode from value)
are pure DataFrame functions tested on batch data, and the reader/writer
builders are constructed (not started) to pin their configuration.  Against
a real cluster, ``spark-sql-kafka-0-10`` must be on the classpath and
``bootstrap_servers`` set — everything else is identical.

Reference parity:
* topic ``stock.ticks.v1``, 3 partitions, keyed by symbol → per-symbol
  ordering (README.md:22,94; producer.py:87)
* consumer group semantics are subsumed by the checkpoint (consumer.py:111-117
  at-least-once auto-commit upgrades to exactly-once bookkeeping)
* ``startingOffsets=earliest`` (consumer.py:113)
* the declared-but-unused bars topic ``stock.bars.1m.v1`` (README.md:95)
  gets a real publisher here (op S11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TICKS_TOPIC = "stock.ticks.v1"
BARS_TOPIC = "stock.bars.1m.v1"


#: Wire timestamp format: microsecond precision (the default SSS truncates
#: to millis and would make the encode/decode round trip lossy).
WIRE_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def encode_ticks_for_kafka(ticks: DataFrame) -> DataFrame:
    """S2: tick rows → Kafka (key, value) pairs.  key = symbol (per-symbol
    partition ordering, producer.py:87), value = JSON of the full row
    (producer.py:84-90, op F11) with lossless µs timestamps."""
    # TIMESTAMP_NTZ (what Spark 4.1 reads parquet TIMESTAMP(NANOS) as) has
    # no zone offset, so formatting it through the XXX pattern yields NULL
    # for every value — cast to a real timestamp first.  Instant-preserving
    # under the UTC session this library asserts (sources/tables.py), and
    # the wire then carries an explicit offset as producer.py:84-90 does.
    payload = [
        F.col(c).cast("timestamp").alias(c) if t == "timestamp_ntz" else F.col(c)
        for c, t in ticks.dtypes
    ]
    return ticks.select(
        F.col("symbol").cast("string").alias("key"),
        F.to_json(
            F.struct(*payload), {"timestampFormat": WIRE_TS_FORMAT}
        ).alias("value"),
    )


def kafka_tick_reader(spark, bootstrap_servers: str, topic: str = TICKS_TOPIC):
    """S5: the consumer's subscription as a streaming reader builder.
    Returns the DataStreamReader (caller ``.load()``s when a broker exists)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false")
    )


def kafka_value_to_raw(kafka_df: DataFrame) -> DataFrame:
    """Kafka records → the raw (value, topic, partition, offset) shape the
    DLQ split consumes (sources/dlq.py) — Kafka metadata columns map 1:1
    onto failed_events (init.sql:30-39)."""
    return kafka_df.select(
        F.col("value").cast("string").alias("value"),
        F.col("topic"),
        F.col("partition").alias("partition"),
        F.col("offset").alias("offset"),
    )


def kafka_bar_writer(bars: DataFrame, bootstrap_servers: str, checkpoint: str):
    """S11: publish bars to ``stock.bars.1m.v1`` — the topic the reference
    declares but never uses.  Returns the DataStreamWriter (caller
    ``.start()``s)."""
    encoded = bars.select(
        F.col("symbol").cast("string").alias("key"),
        F.to_json(F.struct(*bars.columns)).alias("value"),
    )
    return (
        encoded.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", BARS_TOPIC)
        .option("checkpointLocation", checkpoint)
    )
