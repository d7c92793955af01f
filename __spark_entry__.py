"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (1-minute OHLCV bars) at sf0.001.
``queries()`` maps every implemented operator from SURVEY.md §2 to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` provides the
DuckDB-equivalent SQL for the correctness gate.  Column names/aliases are
kept identical between the Spark and SQL sides (the driver's compare sorts
columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stockpulse_batch_realtime_etl_spark import queries_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries_registry.QUERIES["ohlcv_bars"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(queries_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(queries_registry.ORACLES)
