"""Batch Parquet sources for the driver-provided tables (TESTDATA.md).

Replaces the reference's JDBC/SQLAlchemy read path (services/api/app/db.py:10-19):
tables become columnar Parquet scans with Catalyst predicate pushdown and
column pruning, registered as temp views so every serving query can also run
as ``spark.sql``.

Scale notes: ``spark.read.parquet`` on a directory of files is already the
100 TB shape — file listing is distributed, row-group pruning applies, and
nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_batch_realtime_etl_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make table reads self-sufficient on ANY SparkSession, not just one
    built by :func:`stockpulse_batch_realtime_etl_spark.session.get_spark`.

    Both confs are runtime-settable SQL confs, so ``spark.conf.set`` works on
    a bare ``SparkSession.builder.getOrCreate()`` session (e.g. an external
    harness).  Without them:

    * ``spark.sql.legacy.parquet.nanosAsLong`` — ``events.parquet`` stores
      ``ts`` as TIMESTAMP(NANOS), which Spark rejects at the scan with
      PARQUET_TYPE_ILLEGAL unless read as long nanos.
    * ``spark.sql.session.timeZone=UTC`` — date_trunc/to_date/collected
      timestamps must match the UTC-normalized DuckDB oracle regardless of
      host timezone.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover - conf locked down; verified below
        pass
    # UTC is a hard correctness precondition, not a nicety: NTZ→timestamp
    # casts (functions.scalars.ts_micros) and the Kafka wire format's +00:00
    # offset are instant-preserving ONLY under a UTC session.  A locked-down
    # non-UTC session would silently shift every derived instant — fail loudly
    # instead.
    tz = spark.conf.get("spark.sql.session.timeZone")
    # Instant-equivalent spellings of UTC are fine — a locked-down session
    # pinned to 'Etc/UTC' or 'GMT' produces identical NTZ casts.  Only a
    # genuinely offset zone shifts derived instants.
    if tz not in {"UTC", "Etc/UTC", "Etc/GMT", "GMT", "Z", "+00:00", "UT"}:
        raise RuntimeError(
            f"spark.sql.session.timeZone={tz!r} but this library requires UTC "
            "(NTZ casts and the Kafka wire format are timezone-sensitive); "
            "the conf could not be set on this session"
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table (``{sf_dir}/{name}.parquet``).

    ``events.ts`` is stored as TIMESTAMP(NANOS), which Spark reads as long
    nanos under ``spark.sql.legacy.parquet.nanosAsLong``; convert to a real
    µs timestamp here (integer ``div 1000`` — truncation, matching DuckDB's
    parquet read of the same column) so every consumer sees TimestampType.
    """
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def fan_out(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition a NARROW scan up to cluster parallelism before
    a compute-heavy stage (shingle explode, per-token hashing, mapInPandas).

    Why: the driver's single-file, single-row-group parquet gives Spark no
    split points, so the scan — and every pipelined operator above it, i.e.
    ALL the per-row compute — runs in one task while 31 cores idle.  A
    round-robin exchange of the (MB-scale) input buys full parallelism for
    the expensive stage.

    Guarded: when the source already has ≥ parallelism/min_factor partitions
    (the 100 TB case — real tables have thousands of row groups), this is a
    no-op, so no gratuitous shuffle is ever added at scale.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df


def literal_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Small literal DataFrame WITHOUT the Python-RDD parallelize path.

    ``spark.createDataFrame(list)`` always routes local data through
    ``sc.parallelize`` with defaultParallelism slices, so EVERY downstream
    action evaluates ~core-count pickled Python-worker tasks for a handful
    of rows — measured at 45 executor-seconds (1.4 s/task × 32) for the
    3-row method table inside ``ann_recall_report``.  Building the same
    rows as a literal array-of-structs inlined over ``range(1)`` stays
    entirely in the JVM: one task, no Python workers, no shuffle.

    For dimension-table-sized literals only (the plan carries one literal
    per cell); bulk local data should go through Arrow ``createDataFrame``
    (a pandas payload) instead.
    """
    from pyspark.sql.types import _parse_datatype_string

    fields = _parse_datatype_string(schema).fields
    if not rows:
        return spark.range(0).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in fields
            ]
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, fields)
            ]
        )
        for row in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register every driver table as a temp view (idempotent)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
