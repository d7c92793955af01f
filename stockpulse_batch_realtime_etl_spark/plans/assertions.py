"""Physical-plan assertions: executable guarantees that the engine keeps the
plans it promises at 100 TB.

The reference delegates physical design to Postgres (B-tree indexes,
init.sql:10-11/27-28; planner-chosen joins — SURVEY.md §4).  Our equivalent
contract is Catalyst plan *shape*: filters reach the parquet scan, scans
prune columns, small dimensions broadcast, top-k never global-sorts, the hot
path stays inside whole-stage codegen.  These helpers make that contract a
test suite (tests/test_plans.py) instead of a hope — a plan regression
(e.g. a future edit turning a broadcast join into a cartesian product)
fails CI at sf0.001, long before it burns a cluster at scale.

All helpers operate on ``df._jdf`` explain output — public Spark surface via
``DataFrame.explain``, captured as a string.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text of the final (post-AQE-planning)
    physical plan, as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    """The parquet scan must carry a pushed filter mentioning ``column``
    (predicate pushdown — row-group min/max pruning at scale)."""
    plan = formatted_plan(df)
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    if not any(column in p for p in pushed):
        raise AssertionError(
            f"no pushed filter on {column!r}; PushedFilters={pushed}\n{plan}"
        )


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of every parquet ReadSchema in the plan (column pruning:
    a scan reading columns the query never touches is a bug)."""
    plan = formatted_plan(df)
    schemas = re.findall(r"ReadSchema: struct<(.*?)>", plan)
    return [
        [c.split(":")[0] for c in s.split(",") if c] for s in schemas
    ]


def assert_take_ordered(df: DataFrame) -> None:
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k + merge), never a global sort."""
    plan = simple_plan(df)
    if "TakeOrderedAndProject" not in plan:
        raise AssertionError(f"expected TakeOrderedAndProject:\n{plan}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """At least ``min_count`` BroadcastHashJoins (small dims must broadcast,
    never shuffle the fact side)."""
    plan = simple_plan(df)
    n = plan.count("BroadcastHashJoin")
    if n < min_count:
        raise AssertionError(
            f"expected >= {min_count} BroadcastHashJoin, found {n}:\n{plan}"
        )


def assert_no_cartesian(df: DataFrame) -> None:
    """No CartesianProduct anywhere — the classic accidental cross join."""
    plan = simple_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"CartesianProduct in plan:\n{plan}")


def assert_hash_aggregate_only(df: DataFrame) -> None:
    """Every aggregate in the plan is hash-based (HashAggregate /
    ObjectHashAggregate) — no SortAggregate demotion.  Only flat
    primitive buffers are UnsafeRow-mutable, so a string / struct /
    array-typed aggregation buffer silently drops the groupBy to
    SortAggregate: a per-partition sort of the aggregate's INPUT stream,
    which is the scale trap when that stream is corpus-wide (the r11
    array-buffer lesson; measured again for string buffers in r12)."""
    plan = simple_plan(df)
    if "SortAggregate" in plan:
        raise AssertionError(f"SortAggregate demotion in plan:\n{plan}")


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """The plan must contain at least one WholeStageCodegen span (the hot
    path is compiled, not interpreted).

    Under AQE codegen annotations only exist on the *final* plan, which is
    materialized by executing THIS DataFrame's own query execution (a noop
    write would plan a fresh copy and leave this one unfinalized) — so this
    helper collects.  Intended for small-SF tests only.
    """
    df.collect()
    plan = formatted_plan(df)
    if "WholeStageCodegen" not in plan and "codegen id" not in plan:
        raise AssertionError(f"no WholeStageCodegen span:\n{plan}")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the physical plan (broadcast exchanges
    excluded).  Use to pin a query's shuffle budget in tests."""
    plan = simple_plan(df)
    return len(re.findall(r"(?<!Broadcast)Exchange", plan))


def assert_skew_join_ready(df: DataFrame) -> None:
    """Pin the skew-resilience posture for a shuffle join whose key can be
    pathologically hot (e.g. the line-dedup join on raw segment text):
    AQE + skew-join splitting must be ON in the session that will execute
    this plan, so an oversized partition is split at runtime instead of
    stalling one task.  (The salting fallback for keys beyond what split
    tasks absorb is documented in SCALE.md.)"""
    conf = df.sparkSession.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
