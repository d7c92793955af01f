"""Generic relational coverage over the TPC-H-ish driver tables.

The reference's operator classes (hash aggregate A1-A8, equi-join J1, top-k
O1/O2 — SURVEY.md §2) exercised at analytic scale on ``lineitem``/``orders``/
``customer``/``supplier``/``part``/``nation``/``region``.  These are the
queries that stress the 100 TB design: multi-way joins with broadcast vs
shuffle decisions, partial→final aggregation, and top-k without global sorts.

Cross-engine determinism for money sums: a double sum's value depends on
accumulation order, which differs between Spark's partial/final hash
aggregate and any other engine — enough to flip a rounded 4dp hash at sf0.1
magnitudes.  So every Σ(price-expression) casts the per-row expression to
DECIMAL(25,6) first (exact, order-insensitive summation; per-row double→
decimal rounding is deterministic and identical across engines since binary
doubles never land exactly on decimal tie points) and casts the exact sum
back to double at the output boundary.  Spark's decimal sum is still a
single-pass codegen'd hash aggregate — the exactness is free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def money_sum(expr: Column) -> Column:
    """Order-insensitive, engine-portable sum of a double money expression."""
    return F.sum(expr.cast("decimal(25,6)")).cast("double")


def _revenue() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q1_pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy single-pass aggregate.

    Plan at scale: parquet scan with l_shipdate pushdown + only the 7 needed
    columns → partial hash agg per partition (4 groups) → 4-row exchange →
    final agg.  The shuffle carries ~num_partitions×4 rows regardless of
    table size — this is the canonical "aggregation is cheap, scan is the
    cost" query.
    """
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(_revenue()).alias("sum_disc_price"),
            money_sum(_revenue() * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            (money_sum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias(
                "avg_price_raw"
            ),
            (money_sum(F.col("l_discount")) / F.count(F.lit(1))).alias(
                "avg_disc_raw"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "avg_qty",
            F.round("avg_price_raw", 4).alias("avg_price"),
            F.round("avg_disc_raw", 4).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-07-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join chain → agg → top-k.

    customer is tiny relative to lineitem → broadcast into orders; the
    orders⋈lineitem join shuffles on orderkey (both sides pre-filtered, so
    the shuffle is on the reduced sets — filters stay below the join).
    Top-k is TakeOrderedAndProject, never a global sort.  Revenue is
    decimal-exact, so the ordering itself is cross-engine deterministic;
    o_orderkey breaks any remaining ties.
    """
    cut = F.lit(cutoff).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(
            ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
            li.l_orderkey == ords.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money_sum(_revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
    )


def q5_local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the classic same-nation constraint.

    All dims (region→nation→supplier) are broadcast; the only shuffles are
    orders⋈lineitem on orderkey and customer⋈orders on custkey.  The
    c_nationkey = s_nationkey predicate rides the join, not a post-filter.
    """
    nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    sup = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = customer.select("c_custkey", "c_nationkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .join(cust, (F.col("o_custkey") == cust.c_custkey)
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(money_sum(_revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def top_customers_by_revenue(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """Revenue per customer across the full fact table, top-k.

    lineitem⋈orders shuffles on orderkey; the per-customer rollup then
    shuffles only the pre-aggregated (custkey, revenue) pairs; customer
    names join in by broadcast at the very end (smallest possible probe).
    """
    li = lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
    ords = orders.select("o_orderkey", "o_custkey")
    per_cust = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_custkey")
        .agg(money_sum(_revenue()).alias("revenue"))
    )
    return (
        per_cust.join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            per_cust.o_custkey == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def brand_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Broadcast-join rollup: revenue by part brand.

    ``part`` is dimension-sized at every sf (200 rows at sf0.001; even real
    TPC-H part at SF100 broadcasts fine) — the explicit ``broadcast()`` hint
    pins the plan to BroadcastHashJoin so the fact table never shuffles
    before aggregation.
    """
    return (
        lineitem.select("l_partkey", "l_extendedprice", "l_discount")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            money_sum(_revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("p_brand")
    )


def order_priority_counts(
    orders: DataFrame, lineitem: DataFrame,
    date_from: str = "1996-07-01", date_to: str = "1996-10-01",
) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join → the operator class the reference
    lacks entirely (no semi/anti joins, SURVEY.md §2.4) but any real engine
    needs.  ``left_semi`` never materializes lineitem columns."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    late_lines = lineitem.filter(F.col("l_shipdate") > F.col("l_commitdate")) \
        if "l_commitdate" in lineitem.columns else lineitem
    return (
        ords.join(
            late_lines.select("l_orderkey"),
            ords.o_orderkey == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti-join coverage (also absent from the reference): customers with
    no orders at all.  left_anti on custkey — at scale this is a shuffled
    hash anti-join; output is customer-sized, never fact-sized."""
    return (
        customer.join(
            orders.select("o_custkey"),
            customer.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the pushdown
    benchmark.  Every predicate reaches the parquet scan (range on
    l_shipdate, range on l_discount, bound on l_quantity → row-group
    min/max skipping); the aggregate is a single partial→final sum with no
    group key, so the shuffle carries exactly one row per partition."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


def _customer_revenue_join(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Shared lineitem⋈orders⋈customer⋈nation revenue input of the
    grouping-sets family (rollup + cube): fact shuffles once on orderkey,
    dims broadcast.

    fan_out on the projected fact scan: no-op on production tables
    (thousands of row groups), but the harness's few-row-group parquet
    otherwise pins the whole broadcast-join + Expand(×3/×4) + partial-
    aggregate pipeline to the scan's 3 tasks while 29 cores idle (r16
    profile: 2.9 s wall, 3 tasks).  The exchange carries only the three
    projected fact columns."""
    from stockpulse_batch_realtime_etl_spark.sources.tables import fan_out

    return (
        fan_out(lineitem.select("l_orderkey", "l_extendedprice", "l_discount"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )


def revenue_rollup(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """ROLLUP(nation, market segment): revenue at three grain levels —
    (nation, segment), (nation), and grand total — in ONE pass.

    The operator class the reference lacks entirely (SURVEY.md §2.3 notes
    no grouping sets/cube/rollup anywhere).  Spark plans rollup as an
    Expand (3 output rows per input) feeding one hash aggregate — still a
    single shuffle; at scale prefer rollup over N separate aggregations
    precisely because the scan and shuffle are shared.  Null grouping
    columns mark the subtotal rows (SQL standard), made explicit here via
    ``grouping_id`` so consumers don't confuse a null key with a subtotal.
    """
    joined = _customer_revenue_join(lineitem, orders, customer, nation)
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            money_sum(_revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
            F.grouping_id().alias("grouping_level"),
        )
        .orderBy(
            F.col("n_name").asc_nulls_last(),
            F.col("c_mktsegment").asc_nulls_last(),
        )
    )


def q14_promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-03-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio over a broadcast join.

    One month of lineitem joins part BROADCAST (dimension-sized at any sf);
    promo share = 100·Σ(rev | p_type='PROMO') / Σ(rev), both sums DECIMAL-
    exact (order-insensitive) and divided once in double at the output.
    The date range prunes the scan; the conditional sum is ONE aggregate —
    no second pass, no self-join."""
    rev = _revenue()
    j = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
    )
    agg = j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", rev)
            .otherwise(F.lit(0.0))
            .cast("decimal(25,6)")
        )
        .cast("double")
        .alias("promo_revenue"),
        money_sum(rev).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 4
        ).alias("promo_pct"),
    )


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter(s).

    The selective fact filter (l_returnflag = 'R' + order-date range) cuts
    the join input FIRST; lineitem⋈orders shuffles on orderkey, the
    revenue rollup aggregates by o_custkey ALONE (the exchange carries
    (custkey, partial-decimal) pairs — not the five wide customer
    attributes, which are functionally dependent on the key), and the
    customer/nation dimensions broadcast onto the customer-sized rollup.
    Final ranking is TakeOrderedAndProject (top-k, never a global sort);
    ties pin to c_custkey."""
    rev = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(money_sum(_revenue()).alias("revenue"))
    )
    return (
        rev.join(
            F.broadcast(
                customer.select(
                    "c_custkey", "c_name", "c_nationkey", "c_acctbal",
                    "c_mktsegment",
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey", "c_name", "n_name", "c_mktsegment", "c_acctbal",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def revenue_cube(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """CUBE(nation, market segment): ALL four grain combinations —
    (nation, segment), (nation), (segment), and grand total — in one pass,
    completing the grouping-sets family next to :func:`revenue_rollup`.
    Same single Expand→hash-aggregate plan, 4 output rows per input
    instead of rollup's 3; the (segment)-only grain is the one rollup
    cannot produce without a second scan."""
    joined = _customer_revenue_join(lineitem, orders, customer, nation)
    return (
        joined.cube("n_name", "c_mktsegment")
        .agg(
            money_sum(_revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
            F.grouping_id().alias("grouping_level"),
        )
        .orderBy(
            F.col("n_name").asc_nulls_last(),
            F.col("c_mktsegment").asc_nulls_last(),
        )
    )


def q13_order_count_distribution(
    customer: DataFrame,
    orders: DataFrame,
    excluded_priority: str = "1-URGENT",
) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    INCLUDING zero-order customers.

    The zero bucket is the whole point — it forces a LEFT OUTER join from
    customer to a filtered orders side (Q13 excludes a comment pattern; the
    driver tables carry no comment column, so the stand-in exclusion is an
    order-priority class — same shape: a non-key predicate on the right
    side that must NOT become a pre-join filter on customer).  Plan at
    scale: orders pre-aggregates to (custkey, cnt) BEFORE the outer join —
    the join input shrinks from |orders| to |customers-with-orders| — then
    customer LEFT joins that rollup, null counts coalesce to 0, and the
    second aggregate (count-of-counts) is a few-hundred-row exchange.
    """
    per_cust = (
        orders.filter(F.col("o_orderpriority") != excluded_priority)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q18_large_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: float = 300.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with customer attribution — the canonical HAVING-then-join-back plan.

    The aggregate-with-HAVING runs FIRST and is maximally selective
    (sum(l_quantity) > 300 keeps well under 0.5% of orders at any sf), so
    the surviving (orderkey, total_qty) set is tiny and broadcasts onto
    orders — the big table is scanned once for the aggregate and never
    joined at full width.  customer broadcasts too.  Final ranking is
    top-k (TakeOrderedAndProject), tie-pinned on o_orderkey.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > qty_threshold)
    )
    return (
        orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(
            F.col("total_qty").desc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(k)
    )


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under a 3-way DISJUNCTION of conjunctive
    (brand, size-range, quantity-range) blocks.

    The optimizer test here is OR-handling: Catalyst pulls the common
    structure apart so the part-side conjuncts (brand, size) evaluate on
    the broadcast dimension and the lineitem-side conjuncts (quantity)
    evaluate pre-join, with the residual OR as the join filter.  A naive
    engine evaluates the whole disjunction post-join; at 100 TB the
    difference is scanning 3 narrow brand slices vs materializing the full
    join.  One conditional-free DECIMAL sum finishes it.
    """
    j = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    block = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.filter(
        block("Brand#12", 15, 1, 11)
        | block("Brand#23", 25, 10, 20)
        | block("Brand#34", 35, 20, 30)
    ).agg(
        money_sum(_revenue()).alias("revenue"),
        F.count(F.lit(1)).alias("line_count"),
    )


def q7_nation_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between nation PAIRS — the fact
    table resolves two different dimension paths (customer's nation via
    orders, supplier's nation via l_suppkey) in one query.

    Plan at scale: lineitem⋈orders shuffles on orderkey (the only
    data-sized exchange); customer, supplier, and BOTH nation lookups
    broadcast.  The year is grouped from the ship date; the pair aggregate
    output is |nations|² × years rows.  Revenue sums are DECIMAL-exact.
    """
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    # NO fan_out here (unlike _customer_revenue_join): Q7's lineitem⋈orders
    # exchange on l_orderkey already re-parallelizes everything downstream
    # of the scan, so a round-robin exchange before it only adds a shuffle.
    # r16 measured the fan_out variant neutral-to-worse (A/B 2.11 s without
    # vs 2.18 s with; idle floor 1.85→2.51 s) and the r16 verdict directed
    # the revert.
    j = (
        lineitem.select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate",
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            money_sum(_revenue()).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q22_global_sales_opportunity(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and balance of ABOVE-AVERAGE-
    balance customers with no orders since a cutoff (lapsed high-value
    accounts) — scalar subquery (the average over positive balances) +
    date-bounded anti-join + small-key aggregate in one plan.  (Q22's
    literal "never ordered" predicate is empty on the driver tables —
    every customer has historical orders — so the recency-bounded variant
    keeps the plan shape AND a non-degenerate result at every sf.)

    The average is a 1-row aggregate broadcast into the filter; the
    anti-join probes only the orders AFTER the cutoff (the date filter
    pushes to the orders scan — the anti-join input shrinks first);
    output is |nations| rows.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    never_ordered = rich.join(
        orders.filter(
            F.col("o_orderdate") >= F.lit(since).cast("timestamp")
        ).select("o_custkey"),
        rich["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return (
        never_ordered.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("nationkey")
    )
