"""Relational analytics surface: aggregates, joins, windows, set ops.

The reference has NO aggregates/joins/windows (SURVEY.md §2.7) — its
only analytical op is the merge dedup — but the engine ships a full
surface because that's what the north-star contract demands.  Every
function is a declarative DataFrame build; Catalyst owns the physical
strategy (broadcast vs SMJ, AQE partition sizing, pushdown).

Scale notes (100 TB) per query are in each docstring; the recurring
themes: small dims broadcast (region/nation/supplier at TPC-H ratios),
partial aggregation before every shuffle, windows partitioned on
high-cardinality keys, explicit tie-breaks so top-k is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter + 2-key hash aggregate.

    Map-side partial agg means the single shuffle carries only
    (flag, status) groups — a few rows per task regardless of input
    size.  The date filter pushes into the Parquet scan.
    """
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.

    customer(BUILDING) is small → broadcast into orders; the
    orders⋈lineitem join shuffles on o_orderkey (uniform).  Top-10 is a
    TakeOrdered, not a full sort.  Tie-break on o_orderkey for
    determinism.
    """
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit("1997-06-01"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.lit("1997-06-01"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


def q5_regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with co-located customer/supplier
    nation predicate.

    region/nation/supplier/customer all broadcast at TPC-H ratios; only
    orders⋈lineitem shuffles.  Catalyst reorders the joins; AQE picks
    broadcast at runtime when sizes allow.
    """
    return (
        region.join(nation, F.col("r_regionkey") == F.col("n_regionkey"))
        .join(customer, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


def rollup_revenue(
    region: DataFrame, nation: DataFrame, customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """ROLLUP(region, nation) over order totals — grouping-sets surface.

    Spark expands the rollup into grouping sets inside one aggregate;
    still a single shuffle with partial aggregation.
    """
    joined = (
        region.join(nation, F.col("r_regionkey") == F.col("n_regionkey"))
        .join(customer, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


def window_top_customers(customer: DataFrame, nation: DataFrame, k: int = 3) -> DataFrame:
    """Ranking window: top-k customers by balance per nation.

    Window partitions on n_nationkey (uniform); at scale this is the
    canonical 'top-k per group' — no global sort, one shuffle.
    """
    # rank over the RAW balance (the oracle's window also sees the raw
    # column); round only in the projection
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("n_name", "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "rank")
        .orderBy("n_name", "rank")
    )


def window_running_total(orders: DataFrame) -> DataFrame:
    """Analytic window with frame: per-customer running order total.

    Partition by customer (high cardinality → uniform shuffle), order
    by date with key tie-break, unbounded-preceding frame.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).cast("long").alias("order_seq"),  # match the oracle's BIGINT
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti-join surface: customers that never ordered, per segment.

    left_anti against the distinct o_custkey set; Catalyst broadcasts
    the smaller side.  At 100 TB: pre-aggregate orders to distinct keys
    first (done here) so the anti-join probe side is minimal.
    """
    order_keys = orders.select("o_custkey").distinct()
    return (
        customer.join(order_keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_no_orders"))
        .orderBy("c_mktsegment")
    )


def nation_key_set_ops(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """Set-op surface: nation keys with customers ∩/∖ nation keys with
    suppliers, tagged.  intersect/exceptAll map to hash-based set ops
    with one shuffle each over tiny distinct sets.
    """
    c = customer.select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = c.intersect(s).withColumn("tag", F.lit("both"))
    only_c = c.exceptAll(s).withColumn("tag", F.lit("customer_only"))
    return both.unionByName(only_c).orderBy("tag", "nationkey")


def distinct_counts(lineitem: DataFrame) -> DataFrame:
    """Multi-distinct aggregate: exact distinct counts in one pass.

    Spark plans multi-distinct as expand+two-phase aggregate; at scale
    prefer approx_count_distinct (HLL) — provided alongside for the
    non-oracle path.
    """
    return lineitem.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling-window aggregate (batch twin of the streaming windowed
    agg in streaming/pipeline.py — same combinator runs under
    readStream with a watermark).
    """
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
        .orderBy("hour", "event_type")
    )


def events_props_json(events: DataFrame) -> DataFrame:
    """from_json over a real JSON column (P2 parity on fixture data):
    parse ``props`` and aggregate the extracted field per event type."""
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def cube_order_stats(orders: DataFrame) -> DataFrame:
    """CUBE grouping-sets surface over order priority × status."""
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(), F.col("o_orderstatus").asc_nulls_first()
        )
    )


def above_avg_customers(customer: DataFrame) -> DataFrame:
    """Correlated-subquery pattern (customers richer than their nation's
    average) — decorrelated declaratively as a window average, the plan
    Catalyst itself would rewrite the subquery into."""
    w = Window.partitionBy("c_nationkey")
    return (
        customer.withColumn("nation_avg", F.avg("c_acctbal").over(w))
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal", F.round("nation_avg", 6).alias("nation_avg"))
    )


def price_quantiles(lineitem: DataFrame) -> DataFrame:
    """Exact percentiles (sort-based, order-independent) per return flag."""
    # one percentile buffer per column (array form) instead of one per
    # requested fraction — halves the per-group sort work
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("_p"),
            F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q1_qty"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("_p").getItem(0), 4).alias("median_price"),
            F.round(F.col("_p").getItem(1), 4).alias("p90_price"),
            "q1_qty",
        )
        .orderBy("l_returnflag")
    )


def nation_segments(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Ordered string aggregation: per nation, the sorted distinct
    market segments (deterministic listagg)."""
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
        .orderBy("n_name")
    )


def orders_by_month(orders: DataFrame) -> DataFrame:
    """Date-part extraction surface: per (year, month) order stats."""
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("yr", "mo")
    )


def scalar_function_census(events: DataFrame) -> DataFrame:
    """One row per event exercising the §2.6 scalar-function census:
    split/element_at/substring/concat_ws/regexp_extract/when+isin/
    cast/md5/conv — every function the reference's UDFs needed, as
    native expressions (reference: scripts/spark_processing.py:137-246)."""
    return events.select(
        "event_id",
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.element_at(F.split("event_type", ""), -1).alias("type_last_char"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias("type_user"),
        F.regexp_extract("props", "[0-9]+", 0).alias("first_num"),
        F.when(F.col("event_type").isin("click", "view"), "web")
        .otherwise("other")
        .alias("type_class"),
        F.md5("event_type").alias("type_md5"),
        F.conv(F.substring(F.md5("event_type"), 1, 4), 16, 10).alias("md5_prefix_dec"),
        F.hour("ts").cast("int").alias("hr"),
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(events: DataFrame) -> DataFrame:
    """Pivot surface: events per (hour-of-day × event_type) as columns.
    Explicit pivot values keep the plan static (no extra pass to
    discover them) — required practice at scale."""
    return (
        events.groupBy(F.hour("ts").cast("int").alias("hr"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0)
        .orderBy("hr")
    )


def word_counts(documents: DataFrame, k: int = 50) -> DataFrame:
    """The canonical explode+aggregate: corpus token frequencies, top-k
    with deterministic tie-break.  Explode is map-side; the single
    shuffle carries (word, partial count) — uniform keys."""
    # explode first, row-filter after: the WHERE stays inside
    # whole-stage codegen (an array_filter lambda would not)
    return (
        documents.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(k)
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session assignment via gap detection: lag + conditional cumsum.

    Two windows over the same (user_id, ts) partitioning — one shuffle
    total; the classic scalable sessionization (no UDF, no state).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    with_flag = events.withColumn(
        "new_session", F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    )
    with_id = with_flag.withColumn("session_seq", F.sum("new_session").over(w))
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def q13_customer_distribution(customer, orders):
    """TPC-H Q13 shape: distribution of customers by order count —
    LEFT OUTER join (customers with zero orders must appear), filtered
    on the JOIN side (not a WHERE, which would turn it inner), then a
    double aggregate.  The order-count histogram is the classic
    outer-join-then-count-distribution plan."""
    from pyspark.sql import functions as F

    # fixture orders carry no comment column; the shape's point is the
    # join-side filter, played here on priority (urgent orders excluded)
    filtered = orders.where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(filtered, customer["c_custkey"] == filtered["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q18_large_orders(customer, orders, lineitem, threshold: int = 300):
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (group-by-having pushed into a semi-join), joined back to customer.
    The HAVING subquery reduces to a tiny key set, so the big joins
    probe it broadcast-style."""
    from pyspark.sql import functions as F

    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > threshold)
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


def q4_late_orders(orders, lineitem):
    """TPC-H Q4 shape: EXISTS-correlated semi-join — orders with at
    least one late-shipped item (fixtures carry no commit/receipt
    dates, so "late" is l_shipdate > o_orderdate), counted by priority.

    Plan: the date filter prunes orders BEFORE the semi-join (pushed
    to the scan); LEFT SEMI stops probing an order at its first
    matching item, so no fan-out ever materializes — the scale-safe
    EXISTS plan."""
    window = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    late = window.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(lineitem, orders, customer, supplier, nation):
    """TPC-H Q7 shape: the two-role dimension join — nation joined
    TWICE (supplier's and customer's side), directional pair filter,
    per-year revenue.  Both nation copies and both dims broadcast; the
    only shuffle left is the lineitem⋈orders key join + final agg."""
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") | (
        F.col("supp_nation") == "NATION_7"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q10_returned_items(customer, orders, lineitem, nation, k: int = 20):
    """TPC-H Q10 shape: revenue lost to returns per customer over a
    quarter — 4-way join, agg on a composite customer key, top-k.
    Returns are a small fraction, so the returnflag filter does the
    pruning before the join; top-20 is TakeOrdered (no full sort)."""
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-04-01"))
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(k)
    )


def q14_promo_revenue(lineitem, part):
    """TPC-H Q14 shape: conditional-aggregate ratio over a broadcast
    dim join — promo revenue share of one month.  One number out; the
    CASE rides inside the same partial aggregate as the denominator
    (single pass, map-side combined)."""
    promo = F.when(
        F.col("p_type") == "PROMO", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).otherwise(F.lit(0.0))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-03-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(promo)
                / F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def q15_top_supplier(lineitem, supplier):
    """TPC-H Q15 shape: scalar-subquery max — supplier(s) whose
    quarterly revenue equals the global maximum.  Revenue is rounded
    BEFORE the max/equality so the comparison is stable under
    double-sum ordering; the one-row max broadcasts into the probe."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q17_small_quantity(lineitem, part):
    """TPC-H Q17 shape: correlated per-part average — items whose
    quantity is below 20% of their part's average, for one brand.
    The correlated subquery decomposes into a per-part aggregate
    broadcast back onto the probe (quantities are integer-valued, so
    the avg is an exact double — the 0.2× threshold is stable)."""
    brand_parts = part.where(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") < 15)
    ).select("p_partkey")
    li = lineitem.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q19_disjunctive(lineitem, part):
    """TPC-H Q19 shape: OR-of-ANDs predicate across the join — three
    (brand, size, quantity) bands.  Catalyst extracts the common
    p_partkey equi-join and evaluates the disjunction post-join; the
    per-side conjuncts (quantity bounds, size bounds) are pushed to
    the scans as a derived OR filter."""
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(band)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q22_global_sales(customer, orders, cutoff: str = "2000-01-01"):
    """TPC-H Q22 shape: anti-join + scalar-average subquery — LAPSED
    customers (no orders since the cutoff; every fixture customer has
    SOME order, so the pure no-orders variant would be vacuous) with
    above-average positive balance, grouped by nation.  The average is
    one broadcast row; the anti-join broadcasts the distinct recent
    custkeys (the recency filter prunes them at the scan first)."""
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = customer.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
    recent = orders.where(F.col("o_orderdate") >= F.lit(cutoff))
    idle = rich.join(
        F.broadcast(recent.select("o_custkey").distinct()),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q21_waiting_suppliers(supplier, lineitem, orders):
    """TPC-H Q21 shape: the classic multi-EXISTS + NOT-EXISTS pattern —
    suppliers whose returned line (l_returnflag = 'R') sits in a
    finished multi-supplier order where NO other supplier also
    returned.  (The fixture schema has no l_receiptdate/l_commitdate,
    so "at fault" is the return flag; the join topology is the point.)

    Plan shape: both the EXISTS and NOT-EXISTS decompose into
    LeftSemi / LeftAnti self-joins on l_orderkey with the
    supplier-inequality as a residual condition — one hash key each,
    no correlated re-execution; the supplier dim broadcasts.
    """
    l1 = lineitem.where(F.col("l_returnflag") == "R").alias("l1")
    fin = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    base = l1.join(fin, F.col("l1.l_orderkey") == F.col("o_orderkey"))
    l2 = lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    base = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    l3 = (
        lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    base = base.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    return (
        base.join(F.broadcast(supplier), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


def q20_dominant_suppliers(supplier, lineitem, part, frac: float = 0.5):
    """TPC-H Q20 shape: nested semi-join over an AGGREGATED subquery —
    suppliers who shipped more than ``frac`` of some selected part's
    1997 volume (the fixture has no partsupp/ps_availqty; the
    aggregate-inside-IN topology is the point).

    Plan shape: per-(part,supplier) and per-part aggregates share one
    exchange (the second groups a subset of the first's key), the
    part filter semi-joins as a broadcast, and the outer supplier
    probe is a broadcast LeftSemi — the supplier table never shuffles.
    """
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    per_p = per_ps.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("total_qty")
    )
    sel_parts = part.where(F.col("p_size") < 20).select("p_partkey")
    dominant = (
        per_ps.join(F.broadcast(per_p), F.col("l_partkey") == F.col("pk"))
        .where(F.col("qty") > frac * F.col("total_qty"))
        .join(
            F.broadcast(sel_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


def q2_min_cost_supplier(lineitem, part, supplier):
    """TPC-H Q2 shape: correlated scalar MIN over a group — for each
    small part, the supplier(s) whose unit cost equals that part's
    minimum (the fixture has no partsupp.ps_supplycost; unit cost =
    sum(price)/sum(qty) per (part, supplier), rounded BEFORE the
    min/equality so the correlated comparison is stable under
    double-sum ordering — same discipline as q15).

    Plan shape (VERDICT r7 item 5 — the 281 MB sf1 shuffle audit):
    the correlated min is a WINDOW over the per-(part, supplier) cost
    frame, not a re-join against a separate per-part min aggregate.
    The join formulation read + aggregated lineitem TWICE (once for
    cost, once under the unshared ``mn`` subtree — the 281 MB was
    mostly that doubled map output) and force-broadcast ``mn``, which
    is PART-cardinality — fine at fixture scale, an OOM at 100 TB where
    part is a fact-sized table.  The window needs one repartition of
    the already-aggregated cost frame on l_partkey (suppliers-per-part
    is bounded, so no skew), after which the min and the equality
    filter are map-side.  Measured at sf0.1: lineitem scans 2 → 1,
    exchanges 4 → 3 (runtime unchanged there — the query sits at the
    session floor; the halved lineitem aggregation is the sf1+ win,
    re-measured in BENCH_SF1).  Part and supplier dims broadcast.
    """
    from pyspark.sql import Window

    cost = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 4).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("min_cost")
    )
    sel = part.where(F.col("p_size") < 10).select("p_partkey", "p_brand")
    return (
        best.join(F.broadcast(sel), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "p_partkey", "p_brand", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
    )


def q11_important_stock(lineitem, mult: float = 1.5):
    """TPC-H Q11 shape: HAVING against a GLOBAL scalar aggregate —
    parts whose total inventory value exceeds ``mult`` × the average
    per-part value (no partsupp in the fixture; value = sum(price ×
    qty) per part).  The canonical Q11 compares against a FRACTION of
    the total, which is scale-dependent (part count grows with SF, so
    any fixed fraction goes empty or total at the wrong scale); a
    multiple of the average keeps the predicate — and the test —
    non-trivial at every SF (4 / 49 / 514 rows at sf0.001/0.01/0.1).

    Plan shape: one hash-aggregate on l_partkey; the global average is
    a one-row broadcast re-joined as a range predicate — the classic
    "scalar subquery in HAVING" decomposition, no second scan of
    lineitem (the scalar re-aggregates the per-part frame).

    Both sides of the HAVING predicate are rounded BEFORE the
    comparison (same discipline as q2/q15): Spark and an ANSI engine
    sum doubles in different orders, so an unrounded `v > mult*a` can
    flip for a borderline part on last-bit differences.
    """
    val = lineitem.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("v")
    )
    avg = val.agg(F.round(F.avg("v"), 2).alias("a"))
    return (
        val.join(F.broadcast(avg), F.col("v") > mult * F.col("a"))
        .select("l_partkey", F.col("v").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


def q8_market_share(
    lineitem, orders, customer, supplier, nation, region,
    target_nation: str = "NATION_2", region_name: str = "ASIA",
):
    """TPC-H Q8 shape: national market share — per order-year, the
    fraction of a region's customer revenue delivered by suppliers of
    one nation, as a conditional-sum ratio inside one aggregate.

    Plan shape: the region→nation→customer filter chain collapses to a
    broadcast semi-join on the orders side; supplier→nation broadcasts
    onto lineitem; one hash-aggregate on the year computes both sums.
    """
    rnations = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(rnations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    o = orders.select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    supp = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("o_year", volume.alias("volume"), "n_name")
    )
    national = F.sum(
        F.when(F.col("n_name") == target_nation, F.col("volume")).otherwise(0.0)
    )
    return (
        rev.groupBy("o_year")
        .agg(F.round(national / F.sum("volume"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


def q9_product_profit(lineitem, orders, part, supplier, nation, name_like: str = "%red%"):
    """TPC-H Q9 shape: product-type profit by nation and year — profit
    = revenue minus a deterministic unit-cost proxy (0.1 × retail ×
    qty; the fixture has no partsupp.ps_supplycost), parts selected by
    name pattern, grouped by the SUPPLIER's nation and order year.

    Plan shape: part (name-filtered) and supplier→nation broadcast
    onto lineitem; orders joins on the orderkey for the year; one
    hash-aggregate on (nation, o_year).
    """
    sel_part = part.where(F.col("p_name").like(name_like)).select(
        "p_partkey", "p_retailprice"
    )
    supp = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(F.broadcast(sel_part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q12_priority_counts(lineitem, orders, from_date: str = "1997-01-01", to_date: str = "1998-01-01"):
    """TPC-H Q12 shape: conditional-count aggregation after the join —
    per return flag (the fixture has no l_shipmode), how many lines
    belong to high- vs low-priority orders, for a ship-date year.

    Plan shape: the date filter pushes to the lineitem scan; orders
    joins on the orderkey; one hash-aggregate computes both CASE
    counts in a single pass.
    """
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(from_date))
            & (F.col("l_shipdate") < F.lit(to_date))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q16_supplier_counts(lineitem, part, supplier, excluded_brand: str = "Brand#12"):
    """TPC-H Q16 shape: distinct-count by part attributes with a
    NOT-IN supplier exclusion — the excluded set is "complaint"
    suppliers (negative account balance stands in for the comment
    scan), removed via a broadcast anti-join BEFORE the distinct
    count.

    Plan shape: anti-join broadcasts the tiny exclusion set; part
    attributes broadcast; one aggregate with count(DISTINCT
    l_suppkey) — Spark plans it as the standard two-phase distinct
    expand, keys are (brand, type, size), uniform.
    """
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    attrs = part.where(F.col("p_brand") != excluded_brand).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    return (
        lineitem.join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(attrs), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )
