"""Relational core: scan/filter/project/join/agg/window/set-op surface.

The reference has no SQL engine — its relational patterns are Python
dict/list manipulations (SURVEY.md §2.4-2.8; e.g. uuid-registry lookups
matdb/database/__init__.py:208, status rollups 930-982). This module is
the Spark-native relational substrate those capabilities compile onto,
demonstrated on the driver's TPC-H-ish tables.

Scale notes (100 TB):
- Aggregations are expressed with built-in F.* so Catalyst plans
  partial (map-side) aggregation before the shuffle.
- Small dimensions (region/nation/supplier/customer-at-scale-factor)
  are broadcast explicitly; big-big joins (orders x lineitem) are left
  to sort-merge + AQE, which co-partitions on the join key.
- Filters sit directly on the scan so parquet gets min/max pruning +
  predicate pushdown (verify via .explain: PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tracy_matdb_spark.catalog import load
from tracy_matdb_spark.operators.rank import grouped_value_rank
from tracy_matdb_spark.queries import register


@register(
    "q1_pricing_summary",
    headline=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan aggregate with 8 measures; map-side partial agg."""
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    headline=True,
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective 3-way join + agg + top-10. Customer side broadcast."""
    t = load(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit("1997-06-30 00:00:00").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    headline=True,
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join. Dims (region/nation/supplier) broadcast;
    fact-fact join (orders x lineitem) sort-merge under AQE."""
    t = load(spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region"))
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    nr = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    orders = t["orders"].filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)).select(
        "o_orderkey", "o_custkey"
    )
    return (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "top_customers_per_nation",
    oracle="""
    SELECT n_name, c_name, c_acctbal, rank
    FROM (
        SELECT n_name, c_name, c_acctbal,
               row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rank
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    WHERE rank <= 3
    ORDER BY n_name, rank
    """,
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: window rank (reference analog: best-supercell pick,
    matdb/database/hessian.py:341-380 / transforms.py:92-97)."""
    t = load(spark, sf_dir, ("customer", "nation"))
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("n_name", "c_name", "c_acctbal", "rank")
        .orderBy("n_name", "rank")
    )


@register(
    "orders_rollup",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                         AS n_orders,
           round(sum(o_totalprice), 2)      AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (status -> priority -> grand total). The reference's
    status() aggregation (matdb/database/__init__.py:930-982, 1328-1347)
    recursively merges per-group counts — GROUP BY ROLLUP is the relational
    form, with partial aggregation before the shuffle."""
    orders = load(spark, sf_dir, ("orders",))["orders"]
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    )
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS): customers with no 1995 orders. The reference's
    set-difference extension semantics (substitution.py:203-236
    `combs.difference(old_combs)`) map to left_anti; at scale Spark plans a
    broadcast/shuffled hash anti-join."""
    t = load(spark, sf_dir, ("customer", "orders"))
    o95 = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    survivors = (
        t["customer"]
        .join(o95.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        # checkpoint before the global sort: with a broadcast anti-join
        # feeding orderBy directly there is no shuffle boundary, so the
        # range-partitioner's sampling job would re-execute the whole
        # anti-join (the entity_resolution_pairs double-execution, r8)
        .localCheckpoint(eager=False)
    )
    return survivors.orderBy("c_custkey")


@register(
    "customer_order_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def customer_order_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window aggregate per customer (analytic window surface;
    no reference precedent — engine-native, SURVEY.md §2.7)."""
    orders = load(spark, sf_dir, ("orders",))["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@register(
    "part_supplier_semi",
    oracle="""
    SELECT p_brand, count(*) AS n_parts
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    GROUP BY p_brand
    ORDER BY n_parts DESC, p_brand
    """,
)
def part_supplier_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) + aggregate: parts that ever shipped in bulk."""
    t = load(spark, sf_dir, ("part", "lineitem"))
    bulk = t["lineitem"].filter(F.col("l_quantity") > 45).select("l_partkey")
    return (
        t["part"]
        .join(bulk, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy(F.col("n_parts").desc(), "p_brand")
    )


@register(
    "orders_pivot_status",
    oracle="""
    SELECT o_orderpriority AS priority,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS total_o,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS total_f,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS total_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide) with explicit pivot values — planned as one
    conditional aggregation, no extra shuffle vs a plain groupBy."""
    orders = load(spark, sf_dir, ("orders",))["orders"]
    out = (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return (
        out.select(
            "priority",
            F.coalesce(F.col("O"), F.lit(0.0)).alias("total_o"),
            F.coalesce(F.col("F"), F.lit(0.0)).alias("total_f"),
            F.coalesce(F.col("P"), F.lit(0.0)).alias("total_p"),
        )
        .orderBy("priority")
    )


@register(
    "lineitem_cube",
    oracle="""
    SELECT coalesce(l_returnflag, '*') AS rf,
           coalesce(l_linestatus, '*') AS ls,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations) in a single pass — the
    engine-native generalization of the reference's recursive status
    rollups (SURVEY.md §2.6)."""
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("*")).alias("ls"),
            "n",
            "sum_qty",
        )
        .orderBy("rf", "ls")
    )


@register(
    "price_percentiles",
    oracle="""
    SELECT o_orderstatus AS status,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles. At 100 TB prefer approx_percentile
    (t-digest sketch, mergeable map-side) — exact percentile requires a
    per-group sort; kept exact here because the oracle must match
    bit-for-bit (approx sketches differ across engines by design)."""
    orders = load(spark, sf_dir, ("orders",))["orders"]
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 2).alias("p99"),
        )
        .orderBy("status")
    )


@register(
    "repeat_customers_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY o_custkey
    """,
)
def repeat_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics) — customers active in both years. The
    reference has no intersect (SURVEY.md §2.8); engine-native."""
    orders = load(spark, sf_dir, ("orders",))["orders"]

    def year(y):
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
        ).select("o_custkey")

    return year(1996).intersect(year(1997)).orderBy("o_custkey")


@register(
    "above_avg_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders o
    WHERE o_totalprice > 1.5 * (
        SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    ORDER BY o_orderkey
    """,
)
def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (orders 50% above their customer's mean)
    decorrelated into a window aggregate — one shuffle on the correlation
    key instead of a per-row subquery."""
    orders = load(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy("o_orderkey")
    )


@register(
    "price_percentiles_approx",
    # Sketches are engine-specific, so value parity is impossible by
    # design; the contract that IS checkable is the accuracy guarantee:
    # the returned value must hold some rank r with |r/N - p| <= eps.
    # The Spark side computes approx_percentile (mergeable sketch, the
    # 100 TB path), then verifies the guarantee by counting the value's
    # actual rank bracket [#(x < v) + 1, #(x <= v)] — a check that is
    # exact at ANY scale factor, unlike a fixed quantile envelope. The
    # oracle asserts the guarantee held.
    oracle="""
    SELECT o_orderstatus AS status, true AS p50_ok, true AS p90_ok, true AS p99_ok
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale variant of price_percentiles: approx_percentile with
    accuracy 10000 (rank error <= N/10000), rank-verified."""
    orders = load(spark, sf_dir, ("orders",))["orders"]
    eps = 1.0 / 10000
    approx = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        *[
            F.expr(f"approx_percentile(o_totalprice, {p}, 10000)").alias(f"p{int(p * 100)}_v")
            for p in (0.5, 0.9, 0.99)
        ]
    )
    joined = orders.join(
        F.broadcast(approx), orders["o_orderstatus"] == approx["status"]
    )
    counts = joined.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            agg
            for t in (50, 90, 99)
            for agg in (
                F.sum(F.when(F.col("o_totalprice") <= F.col(f"p{t}_v"), 1).otherwise(0)).alias(f"le{t}"),
                F.sum(F.when(F.col("o_totalprice") < F.col(f"p{t}_v"), 1).otherwise(0)).alias(f"lt{t}"),
            )
        ],
    )
    checks = []
    for t, p in ((50, 0.5), (90, 0.9), (99, 0.99)):
        lo = (F.lit(p) - F.lit(eps)) * F.col("n_rows") - F.lit(1.0)
        hi = (F.lit(p) + F.lit(eps)) * F.col("n_rows") + F.lit(1.0)
        checks.append(((F.col(f"le{t}") >= lo) & (F.col(f"lt{t}") <= hi)).alias(f"p{t}_ok"))
    return counts.select("status", *checks).orderBy("status")


# ---------------------------------------------------------------------------
# Correlated subqueries (Catalyst decorrelation surface). The reference's
# closest analog is the trainer dbfilter value chain resolving thresholds
# from another object (fitting/basic.py:182-196); a SQL engine owes the
# general form: correlated scalar subqueries and EXISTS/NOT EXISTS, which
# Catalyst rewrites into aggregate-join / semi / anti joins — verified by
# plan tests (no per-row re-execution anywhere).
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_avg",
    oracle="""
    SELECT p.p_brand,
           round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 5
      AND l.l_quantity < 0.2 * (
          SELECT avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average) "
    "gating a fact-side filter; Catalyst decorrelates it into one "
    "aggregate + join, not a per-row subplan",
)
def q17_small_quantity_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("lineitem", "part"))
    t["lineitem"].createOrReplaceTempView("lineitem")
    t["part"].createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p.p_brand,
               round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= 5
          AND l.l_quantity < 0.2 * (
              SELECT avg(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = p.p_partkey
          )
        GROUP BY p.p_brand
        ORDER BY p.p_brand
        """
    )


@register(
    "exists_customer_segments",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o2
            WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
          )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    doc="EXISTS / NOT EXISTS decorrelation: Catalyst plans a left-semi "
    "plus a left-anti join on o_custkey — set-membership at shuffle "
    "cost, never a per-row probe",
)
def exists_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("customer", "orders"))
    t["customer"].createOrReplaceTempView("customer")
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o2
                WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
              )
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
        """
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (testdata lacks commit/receipt dates, so the "
    "late-ship predicate is shipdate > orderdate + 90d): EXISTS becomes "
    "a left-semi join on l_orderkey — the fact table is touched once, "
    "the semi-join output carries no lineitem payload columns",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    sem = o.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           cast(year(l.l_shipdate) as int) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume by year. nation (25 rows) "
    "and supplier are broadcast; the only shuffles are the orders-lineitem "
    "sort-merge and the final small groupBy. The nation-pair predicate is "
    "applied after both broadcasts, so Catalyst pushes each n_name filter "
    "into its own broadcast side",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation"))
    pair = ("NATION_1", "NATION_2")
    n1 = t["nation"].filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = t["supplier"].join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")).select(
        "s_suppkey", "supp_nation"
    )
    c = t["customer"].join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey")).select(
        "c_custkey", "cust_nation"
    )
    li = t["lineitem"].select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
    )
    joined = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_custkey"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by returned revenue in a "
    "quarter. The returnflag + date filters are pushed to the scans; "
    "nation broadcasts; TakeOrderedAndProject bounds the result without "
    "a global sort",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    n = t["nation"].select("n_nationkey", "n_name")
    joined = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t["customer"].select("c_custkey", "c_name", "c_nationkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT cast(floor(1000000.0 * sum(CASE WHEN p.p_type = 'PROMO'
                     THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount))) as bigint)
           AS promo_share_ppm,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promo revenue share for one month. The date "
    "filter prunes the lineitem scan; part joins broadcast (small dim); "
    "the conditional-sum ratio is one partial-aggregated reduction. The "
    "share is quantized to ppm so the oracle compares integers",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    p = t["part"].select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(F.lit(0.0)))
    return j.agg(
        F.floor(F.lit(1000000.0) * promo / F.sum("rev")).alias("promo_share_ppm"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="lag() analytics: days since each customer's previous order. One "
    "hash shuffle on o_custkey, per-partition sort — the window never "
    "sees more than one customer's history, so skew is bounded by the "
    "hottest customer, not the table",
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
            .cast("long")
            .alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
        .drop("o_orderdate")
    )


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT cast(sum(cast(floor(l_extendedprice * l_discount * cast(10000 as double))
                         as bigint)) // 100 as bigint) AS revenue_c,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: forecast-revenue scan-aggregate. Every predicate "
    "is scan-pushable (date range + two numeric ranges), so the plan is "
    "scan -> partial agg -> single-row final: zero joins, one exchange of "
    "one row per task. The canonical min-IO query at 100 TB — only the "
    "four referenced columns are read",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    # per-row micro-quantization (floor to 1e-4 BEFORE the sum, integer
    # fold, integer division at emit): Spark's partial-agg merge order
    # and DuckDB's sequential fold land on the same value by
    # construction — floor(float-sum * 100) sat one ulp from a
    # boundary flip on every run (the CENTS pattern, queries/events.py)
    return f.agg(
        F.expr(
            "cast(sum(cast(floor(l_extendedprice * l_discount * "
            "cast(10000 as double)) as bigint)) div 100 as bigint)"
        ).alias("revenue_c"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q13_customer_order_counts",
    oracle="""
    SELECT n_orders, cast(count(*) as bigint) AS n_customers
    FROM (SELECT c.c_custkey, cast(count(o.o_orderkey) as bigint) AS n_orders
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) per_cust
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
    doc="TPC-H Q13 shape: distribution of customers by order count. "
    "Outer join preserves zero-order customers; two aggregations, the "
    "second over a tiny domain (distinct order counts), so the heavy "
    "shuffle is only the first, keyed on custkey with map-side partials",
)
def q13_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(
            t["orders"].select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           cast(floor(o.o_totalprice * cast(100 as double)) as bigint) AS totalprice_c,
           cast(floor(q.sum_qty * cast(100 as double)) as bigint) AS sum_qty_c
    FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250) q
    JOIN orders o ON o.o_orderkey = q.l_orderkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: large-volume orders. The HAVING filter reduces "
    "the aggregate to a sliver before the join (aggregate-then-join, not "
    "join-then-aggregate), and the final top-20 is TakeOrderedAndProject "
    "— no global sort materializes",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("lineitem", "orders"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            (F.floor(F.col("o_totalprice") * 100)).cast("bigint").alias("totalprice_c"),
            (F.floor(F.col("sum_qty") * 100)).cast("bigint").alias("sum_qty_c"),
            "o_totalprice",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .drop("o_totalprice")
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           cast(count(*) as bigint) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape (adapted to the test schema's part columns): "
    "discounted revenue under an OR-of-ANDs predicate. Catalyst extracts "
    "the common p_partkey equi-key so the plan is a broadcast hash join "
    "with the disjunction as a post-join filter, and pushes the derived "
    "p_brand IN (...) / quantity-range bounds down to both parquet scans "
    "— the classic disjunctive-pushdown test.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    pt = t["part"].select("p_partkey", "p_brand", "p_size")
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(pt), F.col("p_partkey") == F.col("l_partkey"))
        .filter(arm("Brand#11", 15, 1, 20) | arm("Brand#12", 25, 10, 30) | arm("Brand#13", 35, 20, 40))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q21_sole_returning_supplier",
    oracle="""
    SELECT s.s_name, cast(count(*) as bigint) AS numwait
    FROM lineitem l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (l_returnflag = 'R' standing in for the missing "
    "receipt/commit dates): suppliers who were the ONLY supplier with a "
    "returned item in a multi-supplier order. The correlated EXISTS / "
    "NOT EXISTS pair decorrelates to a left-semi plus left-anti join, "
    "both equi on l_orderkey (the non-equi suppkey inequality rides as a "
    "join residual, never a nested loop), then a broadcast join attaches "
    "the supplier name after the count shrinks the set.",
)
def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("lineitem", "supplier"))
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = li.filter(F.col("l_returnflag") == "R")
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = l1.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    waiting = (
        l1.join(l2, (F.col("o2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")), "left_semi")
        .join(l3, (F.col("o3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")), "left_anti")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    s = t["supplier"].select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("numwait").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           cast(count(*) as bigint) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 shape (c_mktsegment standing in for the phone-country "
    "prefix): above-average-balance customers with no RECENT orders, "
    "rolled up per segment. The scalar global average is a one-row "
    "broadcast (a bounded BroadcastNestedLoopJoin, allowlisted like the "
    "kNN query-row broadcast), the no-recent-orders predicate is a "
    "left-anti join on o_custkey whose date filter is pushed to the "
    "orders scan, and both aggregates plan map-side partials.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("customer", "orders"))
    c = t["customer"].select("c_custkey", "c_mktsegment", "c_acctbal")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    o = (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "orders_rolling_7d_revenue",
    headline=True,
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2)
           AS rev_7d
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Time-RANGE window frame (not ROWS): per-customer trailing-7-day "
    "revenue. The frame is defined on the timestamp axis, so ties and "
    "gaps are handled by value, the semantics ROWS frames get wrong. "
    "Partitioned by o_custkey — high cardinality, no global sort; the "
    "Spark side orders on the epoch day number (unix_date — timezone-"
    "free, exact for the midnight-aligned o_orderdate) with a -7..0 day "
    "range frame, value-equivalent to the oracle's INTERVAL frame.",
)
def orders_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, ("orders",))["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-7, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("rev_7d"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "dq_constraint_audit",
    oracle="""
    SELECT 'lineitem_null_keys' AS check_name,
           cast((SELECT count(*) FROM lineitem
                 WHERE l_orderkey IS NULL OR l_partkey IS NULL) as bigint) AS n_violations
    UNION ALL
    SELECT 'lineitem_discount_range',
           cast((SELECT count(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) as bigint)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           cast((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) as bigint)
    UNION ALL
    SELECT 'orders_orphan_custkey',
           cast((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) as bigint)
    ORDER BY check_name
    """,
    doc="Data-quality constraint audit (expectations-style pipeline "
    "gate): NOT NULL, value-range, and two referential-integrity checks "
    "in one pass each. The null/range checks are map-only conditional "
    "sums folded into a single scan; each FK check is a left-anti join "
    "on the key (customer broadcastable at dimension scale, "
    "orders-lineitem sort-merge under AQE). The output is a tiny "
    "check->violation-count table, the thing a pipeline asserts on "
    "before promoting a snapshot.",
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("lineitem", "orders", "customer"))
    li, o, c = t["lineitem"], t["orders"], t["customer"]
    one_row = lambda name, cnt: cnt.select(
        F.lit(name).alias("check_name"), F.col("n").cast("bigint").alias("n_violations")
    )
    null_keys = li.agg(
        F.sum(
            F.when(F.col("l_orderkey").isNull() | F.col("l_partkey").isNull(), 1).otherwise(0)
        ).alias("n")
    )
    disc_range = li.agg(
        F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)).alias("n")
    )
    orphan_li = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orphan_o = (
        o.select("o_custkey")
        .join(c.select("c_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        one_row("lineitem_null_keys", null_keys)
        .unionByName(one_row("lineitem_discount_range", disc_range))
        .unionByName(one_row("lineitem_orphan_orderkey", orphan_li))
        .unionByName(one_row("orders_orphan_custkey", orphan_o))
        .orderBy("check_name")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: supplier(s) with maximum quarterly revenue, matching "
    "the reference's view semantics (scalar max, ties kept). The max "
    "over the per-supplier rollup is a plain scalar aggregate whose "
    "one-row result broadcast-equi-joins back onto the rollup — no "
    "global-sort window, so at 100 TB the millions of per-supplier "
    "aggregate rows never funnel into one task (they would under "
    "rank() OVER (ORDER BY revenue)); the name lookup broadcasts "
    "supplier.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("lineitem", "supplier"))
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    rev = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_revenue"))
    top = (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__max_revenue"))
        .drop("__max_revenue")
    )
    s = t["supplier"].select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "orders_retention_cohort",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               min(date_trunc('month', o_orderdate)) AS cohort_month
        FROM orders GROUP BY o_custkey
    ),
    activity AS (
        SELECT DISTINCT o.o_custkey, f.cohort_month,
               cast(datediff('month', f.cohort_month,
                             date_trunc('month', o.o_orderdate)) as int) AS months_out
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT cohort_month, months_out,
           cast(count(*) as bigint) AS n_active
    FROM activity
    WHERE months_out <= 6
    GROUP BY cohort_month, months_out
    ORDER BY cohort_month, months_out
    """,
    doc="Cohort retention matrix: customers grouped by first-order month, "
    "counted in each subsequent month they ordered (capped at 6 months "
    "out). The first-order month is a window-free groupBy min; the "
    "cohort attach is an equi join on o_custkey (co-partitioned with "
    "the month dedupe that follows, so AQE coalesces the shuffles); "
    "month arithmetic is calendar-exact (months_between on truncated "
    "months — no epoch division), identical in both engines.",
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, ("orders",))["orders"].select("o_custkey", "o_orderdate")
    firsts = (
        orders.groupBy("o_custkey")
        .agg(F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month"))
    )
    activity = (
        orders.join(firsts, "o_custkey")
        .select(
            "o_custkey",
            "cohort_month",
            F.months_between(
                F.date_trunc("month", "o_orderdate"), F.col("cohort_month")
            )
            .cast("int")
            .alias("months_out"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("months_out") <= 6)
        .groupBy("cohort_month", "months_out")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_month", "months_out")
    )


@register(
    "basket_part_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           cast(count(*) as bigint) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    HAVING count(*) >= 3
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
    doc="Market-basket co-occurrence: part pairs appearing together in "
    ">= 3 orders. The self-join is equi on l_orderkey, so fan-out per "
    "order is C(items,2) with items bounded by order size (~7) — a "
    "constant per-key cost, not a quadratic blow-up; the pair dedupe "
    "happens BEFORE the join (distinct (order, part)), and the "
    "HAVING-filtered count shrinks to the co-occurrence sliver before "
    "the top-50. The association-mining primitive at any scale.",
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.select(
        F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, (F.col("l_orderkey") == F.col("ok_b")) & (F.col("l_partkey") < F.col("part_b")))
        .select(F.col("l_partkey").alias("part_a"), "part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(50)
    )


@register(
    "orders_price_deciles",
    headline=True,
    oracle="""
    WITH ranked AS (
        SELECT o_orderstatus, o_totalprice,
               ntile(10) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    SELECT o_orderstatus AS status, decile,
           cast(count(*) as bigint) AS n_orders,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM ranked
    GROUP BY status, decile
    ORDER BY status, decile
    """,
    doc="Equi-depth decile boundaries per order status (ntile semantics, "
    "deterministic o_orderkey tie-break) — the bucket boundaries an "
    "equi-depth histogram or a range-partitioner needs. With only 3 "
    "statuses a ntile() window would sort each ~N/3-row status in a "
    "single task, so the decile comes instead from the two-phase "
    "range-bucketed exact rank (operators/rank.py grouped_value_rank: "
    "parallel per-slice windows + O(slices) offsets) and ntile's exact "
    "bucket-assignment formula — first n%10 buckets get one extra row "
    "— in pure integer arithmetic; per-status sizes are a 3-row "
    "broadcast. Exact equi-depth at any scale; approx_percentile "
    "(price_percentiles_approx) is the sketch-based alternative.",
)
def orders_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, ("orders",))["orders"]
    per = orders.select(
        F.col("o_orderstatus").alias("status"), "o_totalprice", "o_orderkey"
    )
    # total_col rides the offsets broadcast (free from the O(slices)
    # aggregate), so no separate scan+groupBy for per-status sizes;
    # single_scan materializes the range-sliced rows once for both the
    # offsets branch and the rank window.
    ranked = grouped_value_rank(
        per, ["status"], ["o_totalprice", "o_orderkey"], out_col="rk",
        single_scan=True, total_col="__n",
    )
    # ntile(10): with q = n div 10, r = n % 10, the first r buckets hold
    # q+1 rows; integer ceil-div keeps the mapping exact at any n (the
    # q=0 branch never divides: rk <= r*(q+1) = n is then always true).
    decile = F.expr(
        "cast(case when rk <= (__n % 10) * (__n div 10 + 1) "
        "then (rk + (__n div 10)) div (__n div 10 + 1) "
        "else (__n % 10) + ((rk - (__n % 10) * (__n div 10 + 1)) + (__n div 10) - 1) div (__n div 10) "
        "end as int)"
    )
    return (
        ranked.withColumn("decile", decile)
        .groupBy("status", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("status", "decile")
    )


@register(
    "revenue_gini_by_status",
    headline=True,
    oracle="""
    WITH per_order AS (
        SELECT o_orderstatus AS status, o_orderkey,
               cast(floor(o_totalprice * cast(100 as double)) as bigint) AS cents
        FROM orders
    ),
    ranked AS (
        SELECT status, cents,
               row_number() OVER (PARTITION BY status ORDER BY cents, o_orderkey) AS i,
               count(*) OVER (PARTITION BY status) AS n,
               sum(cents) OVER (PARTITION BY status) AS total
        FROM per_order
    )
    SELECT status,
           cast(max(n) as bigint) AS n_orders,
           round(sum((2.0 * i - n - 1) * cents) / (max(n) * cast(max(total) as double)), 6)
               AS gini
    FROM ranked
    GROUP BY status
    ORDER BY status
    """,
    doc="Revenue concentration (Gini coefficient) per order status via "
    "the sorted-rank identity G = sum((2i-n-1)x_i)/(n*sum x) — the "
    "in-status rank i over integer cents (exact ordering, deterministic "
    "o_orderkey tie-break) comes from the two-phase range-bucketed rank "
    "(operators/rank.py grouped_value_rank), NOT a per-status window: "
    "with 3 statuses a window would sort ~N/3 rows in one task. The "
    "identity factors as 2*sum(i*x) - (n+1)*sum(x), so n and sum(x) "
    "fall out of the same final per-status aggregate — no per-row "
    "window counts at all. The inequality dashboard for skew planning: "
    "a high-Gini key column is the one that needs salting.",
)
def revenue_gini_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, ("orders",))["orders"]
    per = orders.select(
        F.col("o_orderstatus").alias("status"),
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    ranked = grouped_value_rank(
        per, ["status"], ["cents", "o_orderkey"], out_col="i", single_scan=True
    )
    n = F.count(F.lit(1))
    return (
        ranked.groupBy("status")
        .agg(
            n.cast("bigint").alias("n_orders"),
            # (n+1)*sum(cents) overflows int64 at sf10 (1.5e7 orders x
            # 3e14 total cents ~ 4.5e21 > 2^63; caught by the round-10
            # full-schema sweep under ANSI mode) — compute the factored
            # terms in double: they feed a 6-decimal ratio, where the
            # 2^-53 relative error is ~1e-16, far under the rounding
            F.round(
                (
                    F.sum(2.0 * F.col("i") * F.col("cents"))
                    - (n.cast("double") + 1.0) * F.sum("cents").cast("double")
                )
                / (n.cast("double") * F.sum("cents").cast("double")),
                6,
            ).alias("gini"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# TPC-H completion: the 7 shapes not yet registered (q2/q8/q9/q11/q12/q16/
# q20). The driver's tables have no partsupp and a slim lineitem (no
# shipmode/commitdate/receiptdate), so where the canonical query needs
# them the adaptation is documented per query and the *plan shape* —
# correlated min, share-of-total HAVING, conditional-count pivot,
# distinct-pair counting, nested semi-joins — is preserved exactly.
# partsupp is reconstructed as the distinct (l_partkey, l_suppkey)
# relation of lineitem, which is its join graph role.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH pairs AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               min(l_extendedprice) AS cost
        FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
        SELECT pk, cost, s_acctbal, s_name, n_name, s_suppkey
        FROM pairs
        JOIN supplier ON sk = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, round(cost, 2) AS cost
    FROM eu
    JOIN part ON pk = p_partkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
      AND cost = (SELECT min(cost) FROM eu e2 WHERE e2.pk = eu.pk)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part within a region): "
    "correlated min subquery resolved as a per-part window min. "
    "Adaptation (no partsupp table): supply relation = distinct "
    "(l_partkey, l_suppkey) pairs, cost = min(l_extendedprice) per pair.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-min instead of a re-scan correlated subquery: one shuffle
    on pk for the pairs agg, broadcast dims, one window over pk (keyed,
    scales with partition count)."""
    t = load(spark, sf_dir, ("lineitem", "supplier", "nation", "region", "part"))
    pairs = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    eu = (
        pairs.join(F.broadcast(t["supplier"]), F.col("sk") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("pk", "cost", "s_acctbal", "s_name", "n_name")
    )
    part = t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    w = Window.partitionBy("pk")
    return (
        eu.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.round("cost", 2).alias("cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           cast(floor(1000000.0 *
                sum(CASE WHEN n2.n_name = 'NATION_7' THEN volume ELSE 0 END)
                / sum(volume)) as bigint) AS mkt_share_ppm
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               s_nationkey
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) base
    JOIN nation n2 ON base.s_nationkey = n2.n_nationkey
    GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 (national market share): 7-way join, share-of-total "
    "per year quantized to ppm (same floor(1e6*x) convention as q14).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All dims broadcast; the only big-big join is lineitem x orders
    (sort-merge + AQE). Conditional-sum share, partial-agg friendly."""
    t = load(spark, sf_dir, ("part", "lineitem", "orders", "customer", "nation", "region", "supplier"))
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    base = (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t["orders"].filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(t["region"]), F.col("c_rk") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    share = F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0.0)) / F.sum("volume")
    return (
        base.groupBy("o_year")
        .agg(F.floor(share * 1000000.0).cast("bigint").alias("mkt_share_ppm"))
        .orderBy("o_year")
    )


@register(
    "q9_profit_by_nation",
    oracle="""
    SELECT n_name AS nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
        SELECT n_name, EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%o%'
    ) profit
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit by nation and year). "
    "Adaptation (no ps_supplycost): per-unit supply cost = "
    "0.6 * p_retailprice, a deterministic column of part.",
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("part", "lineitem", "supplier", "nation", "orders"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%o%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH value_by_part AS (
        SELECT l_partkey AS pk,
               sum(l_extendedprice * (1 - l_discount)) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT pk AS p_partkey, round(value, 2) AS value
    FROM value_by_part
    WHERE value > (SELECT sum(value) * 0.001 FROM value_by_part)
    ORDER BY value DESC, p_partkey
    """,
    doc="TPC-H Q11 shape (important stock: parts whose value exceeds a "
    "fraction of the national total — group-by + scalar-subquery "
    "HAVING). Adaptation (no partsupp): value = discounted revenue of "
    "the nation's suppliers per part.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar total rides a broadcast crossJoin (1-row side), so the
    HAVING is a map-side filter — no second shuffle of the big side."""
    t = load(spark, sf_dir, ("lineitem", "supplier", "nation"))
    nat_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    value = (
        t["lineitem"]
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = value.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("p_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) as bigint) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) as bigint) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape (shipmode priority pivot: conditional counts "
    "of high/low-priority orders among late shipments). Adaptation "
    "(no l_shipmode/commitdate/receiptdate): class = l_returnflag, "
    "late = shipped more than 90 days after the order date.",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("orders", "lineitem"))
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT sk) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem) pairs
    JOIN part ON pk = p_partkey
    WHERE p_brand <> 'Brand#15' AND p_type <> 'PROMO'
      AND p_size IN (1, 14, 23, 45)
      AND sk NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (supplier relationship counts: distinct-pair "
    "dedup, NOT IN exclusion subquery, count-distinct rollup). "
    "Adaptations (no partsupp / s_comment): pairs from lineitem; the "
    "excluded-supplier predicate is s_acctbal < 0.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN compiles to a broadcast left-anti join (null-safe here:
    s_suppkey is a key, never null). Distinct pairs shuffle once."""
    t = load(spark, sf_dir, ("lineitem", "part", "supplier"))
    pairs = t["lineitem"].select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45)
    )
    excluded = t["supplier"].filter(F.col("s_acctbal") < 0).select(F.col("s_suppkey").alias("sk"))
    return (
        pairs.join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .join(F.broadcast(excluded), "sk", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sk").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH qty96 AS (
        SELECT l_partkey AS pk, l_suppkey AS sk, sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    ),
    dominant AS (
        SELECT DISTINCT sk FROM qty96
        JOIN (SELECT pk AS pk2, sum(qty) AS total FROM qty96 GROUP BY 1) t
          ON pk = pk2
        JOIN part ON pk = p_partkey
        WHERE p_name LIKE 'small%' AND qty > 0.5 * total
    )
    SELECT s_name, s_suppkey
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND s_suppkey IN (SELECT sk FROM dominant)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (promotable suppliers: nested semi-join chain "
    "part-filter -> per-pair quantity vs threshold -> supplier "
    "semi-join + nation filter). Adaptation (no ps_availqty): a "
    "supplier qualifies when it shipped more than half of a "
    "qualifying part's 1996 volume; the outer filter is the ASIA "
    "region (region->nation chain) so every driver SF has rows.",
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregations over the same filtered scan (pair-level and
    part-level) joined on pk, then a semi-join into supplier — no
    correlated re-scans, everything keyed."""
    t = load(spark, sf_dir, ("lineitem", "part", "supplier", "nation", "region"))
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    qty96 = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    totals = qty96.groupBy(F.col("pk").alias("pk2")).agg(F.sum("qty").alias("total"))
    small_parts = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    dominant = (
        qty96.join(totals, F.col("pk") == F.col("pk2"))
        .join(F.broadcast(small_parts), F.col("pk") == F.col("p_partkey"))
        .filter(F.col("qty") > 0.5 * F.col("total"))
        .select("sk")
        .distinct()
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .join(dominant, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Pivot + multi-level (ROLLUP) aggregation — the remaining relational
# surface: one-pass wide reshaping and hierarchical subtotals.
# ---------------------------------------------------------------------------


@register(
    "orders_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="PIVOT: order revenue by priority x status. Spark's pivot with "
    "explicit value list compiles to one pass of conditional partial "
    "aggregates (no second shuffle) — identical to the oracle's "
    "CASE-sum formulation by construction.",
)
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy("o_orderpriority")
        # explicit values: no discovery job, stable schema at any scale
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .orderBy("o_orderpriority")
    )


@register(
    "revenue_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           cast(count(*) as bigint) AS n_lines,
           cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as int) AS lvl
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY lvl, returnflag, linestatus
    """,
    doc="ROLLUP: hierarchical revenue subtotals (flag x status, per "
    "flag, grand total) in ONE aggregation pass — Spark expands the "
    "grouping sets map-side, so the 100 TB cost is one shuffle, not "
    "three scans. grouping() flags disambiguate real 'ALL' values.",
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    lvl = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("int")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
            lvl.alias("lvl"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_lines",
            "lvl",
        )
        .orderBy("lvl", "returnflag", "linestatus")
    )


@register(
    "orders_price_histogram",
    oracle="""
    SELECT cast(floor(o_totalprice / 20000.0) as bigint) AS bin,
           cast(count(*) as bigint) AS n,
           round(sum(o_totalprice), 2) AS bin_total
    FROM orders
    GROUP BY 1 ORDER BY bin
    """,
    doc="Fixed-width histogram binning: floor-division bucketing is one "
    "codegen'd projection + keyed agg (map-side partials), the shape "
    "that replaces driver-side numpy.histogram at 100 TB.",
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(20000.0)).cast("bigint").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("bin_total"),
        )
        .orderBy("bin")
    )


@register(
    "qty_price_moment_stats",
    # corr/cov via explicit raw moments with IDENTICAL formulas in both
    # engines (not the engines' one-pass corr() implementations, whose
    # accumulation orders differ); ppm-floor quantization absorbs the
    # sub-1e-10 float tail of the big double sums.
    oracle="""
    WITH m AS (
        SELECT cast(count(*) as double) AS n,
               sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
               sum(l_quantity * l_quantity) AS sxx,
               sum(l_extendedprice * l_extendedprice) AS syy,
               sum(l_quantity * l_extendedprice) AS sxy
        FROM lineitem
    )
    SELECT cast(n as bigint) AS n_rows,
           cast(floor(1000000.0 * (sxy / n - (sx / n) * (sy / n))
                / sqrt((sxx / n - (sx / n) * (sx / n))
                     * (syy / n - (sy / n) * (sy / n)))) as bigint) AS corr_ppm,
           cast(floor((sxy / n - (sx / n) * (sy / n)) * 100.0) as bigint) AS cov_c
    FROM m
    """,
    doc="Correlation/covariance from explicit raw moments (n, sx, sy, "
    "sxx, syy, sxy): one map-side-partial aggregation pass, then "
    "driver-free scalar arithmetic — the distributed form of "
    "numpy.corrcoef. Moments are the associative/commutative "
    "reduction, so AQE partial aggregation cannot change the result "
    "beyond float tails the ppm floor absorbs.",
)
def qty_price_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("l_quantity").alias("sx"),
        F.sum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("syy"),
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
    )
    return m.selectExpr(
        "cast(n as bigint) AS n_rows",
        "cast(floor(1000000.0 * (sxy / n - (sx / n) * (sy / n))"
        " / sqrt((sxx / n - (sx / n) * (sx / n))"
        " * (syy / n - (sy / n) * (sy / n)))) as bigint) AS corr_ppm",
        "cast(floor((sxy / n - (sx / n) * (sy / n)) * 100.0) as bigint) AS cov_c",
    )


@register(
    "median_mad_outliers",
    oracle="""
    WITH r1 AS (
        SELECT l_returnflag AS g, l_extendedprice AS v,
               l_orderkey AS k1, l_linenumber AS k2,
               row_number() OVER (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rk,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
    med AS (SELECT g, v AS med FROM r1 WHERE rk = (n + 1) // 2),
    d AS (SELECT r1.g, r1.v, r1.k1, r1.k2, abs(r1.v - med.med) AS dev, med.med
          FROM r1 JOIN med USING (g)),
    r2 AS (SELECT g, v, dev, med,
               row_number() OVER (PARTITION BY g ORDER BY dev, k1, k2) AS rk,
               count(*) OVER (PARTITION BY g) AS n
           FROM d),
    mad AS (SELECT g, dev AS mad FROM r2 WHERE rk = (n + 1) // 2)
    SELECT d.g AS l_returnflag,
           cast(count(*) as bigint) AS n_rows,
           min(d.med) AS median_price,
           min(mad.mad) AS mad_price,
           cast(sum(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END) as bigint)
               AS n_outliers
    FROM d JOIN mad USING (g)
    GROUP BY d.g
    ORDER BY l_returnflag
    """,
    doc="Exact distributed median + MAD (median absolute deviation) "
    "robust outlier count per l_returnflag — the classically awkward "
    "distributed op, done as TWO passes of range-sliced k-th SELECTION "
    "(operators/rank.py grouped_kth_value): locate the slice holding "
    "rank (n+1) div 2 from the O(slices) offsets and window ONLY that "
    "slice (Munro-Paterson-style bucket selection: sort work drops to "
    "the one target slice per group; local wall-clock is dominated by "
    "the two range shuffles either way, so rank and selection measure "
    "alike at sf0.1 — the win materializes when per-slice sorts stop "
    "being cache-resident), broadcast the 3-row median back, repeat on "
    "absolute deviations for MAD, count rows beyond 3*MAD. No "
    "single-task per-group sort anywhere; the oracle's naive per-group "
    "windows are the semantics, slice selection is the scale path. "
    "Doubles compare exactly (identical IEEE inputs both engines); "
    "lower-median (not interpolated) keeps selection integer.",
)
def median_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.rank import grouped_kth_value

    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    per = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
    )
    med = grouped_kth_value(
        per, ["g"], ["v", "k1", "k2"], "(__n + 1) div 2", out_cols=["v"]
    ).select("g", F.col("v").alias("med"))
    d = per.join(F.broadcast(med), "g").withColumn("dev", F.expr("abs(v - med)"))
    mad = grouped_kth_value(
        d.select("g", "dev", "k1", "k2"),
        ["g"],
        ["dev", "k1", "k2"],
        "(__n + 1) div 2",
        out_cols=["dev"],
    ).select("g", F.col("dev").alias("mad"))
    return (
        d.join(F.broadcast(mad), "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("med").alias("median_price"),
            F.min("mad").alias("mad_price"),
            F.sum(F.expr("CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_outliers"),
        )
        .selectExpr(
            "g AS l_returnflag", "n_rows", "median_price", "mad_price", "n_outliers"
        )
        .orderBy("l_returnflag")
    )


RECURSIVE_BOM_SQL = """
    WITH RECURSIVE
    e AS (
        -- one equi-join per child arity, unioned: the OR-of-equalities
        -- form has no hash-joinable key, so Spark planned a nested-loop
        -- comparison of part x part — fine at sf0.1 (200k parts), but
        -- the round-10 full-schema sf10 sweep measured it still running
        -- after 50 minutes at 2M parts (~4e12 comparisons). Each UNION
        -- branch is a plain equi hash join: linear, shuffle-partitioned.
        SELECT p.p_partkey AS parent, c.p_partkey AS child
        FROM {part} p JOIN {part} c ON c.p_partkey = p.p_partkey * 2
        WHERE p.p_partkey >= 1
        UNION ALL
        SELECT p.p_partkey AS parent, c.p_partkey AS child
        FROM {part} p JOIN {part} c ON c.p_partkey = p.p_partkey * 2 + 1
        WHERE p.p_partkey >= 1
    ),
    reach(root, node, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM {part}
        WHERE p_partkey BETWEEN 1 AND 10
        UNION ALL
        SELECT r.root, e.child, r.depth + 1
        FROM reach r JOIN e ON e.parent = r.node
    )
    SELECT cast(root as bigint) AS root,
           cast(count(*) as bigint) AS n_reachable,
           cast(max(depth) as bigint) AS max_depth
    FROM reach GROUP BY root ORDER BY root
"""


@register(
    "recursive_bom_explosion",
    oracle=RECURSIVE_BOM_SQL.format(part="part"),
    doc="Variable-depth graph traversal via WITH RECURSIVE (new in "
    "Spark 4): a deterministic binary BOM over real part keys (part p "
    "contains 2p and 2p+1 when they exist) exploded from 10 roots — "
    "reachable-set size and depth per root. The recursive join is equi "
    "on the edge parent (the edge table is built once, outside the "
    "loop), so each iteration is one hash join + union — the shape a "
    "BOM/org-chart/dependency closure takes at scale, where the "
    "frontier shrinks as leaves drop out. Identical SQL text runs on "
    "DuckDB as the oracle.",
)
def recursive_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the default recursion guardrail (spark.sql.cteRecursionRowLimit,
    # 1M rows) trips at sf10: the 10-root closure over a 2M-key binary
    # tree accumulates ~6.7M reach rows — legitimate output, not a
    # runaway. Raise the ceiling well past any tested decade; the level
    # limit (100) stays, which is the guard that catches true cycles.
    # The conf is read at EXECUTION time (measured: restore-before-
    # action loses the override), so to keep the raised ceiling from
    # leaking to every later recursive CTE on the shared session, run
    # the recursion eagerly inside the raised scope (the closure
    # aggregates to ~10 rows — the checkpoint is trivially small) and
    # restore the prior value in the finally.
    prev = spark.conf.get("spark.sql.cteRecursionRowLimit")
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(1 << 30))
    try:
        part = load(spark, sf_dir, ("part",))["part"]
        part.createOrReplaceTempView("__bom_part")
        return spark.sql(RECURSIVE_BOM_SQL.format(part="__bom_part")).localCheckpoint(
            eager=True
        )
    finally:
        spark.conf.set("spark.sql.cteRecursionRowLimit", prev)


@register(
    "pipe_syntax_pricing",
    oracle="""
    SELECT l_returnflag,
           cast(count(*) as bigint) AS n,
           cast(sum(cast(floor(l_extendedprice * (1.0 - l_discount)
                               * cast(100 as double)) as bigint)) // 100 as bigint)
               AS disc_revenue_floor
    FROM lineitem
    WHERE l_quantity < 25
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Declarative-SQL surface additions of Spark 4 in one query: a "
    "SQL UDF (CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN expr — "
    "the reference's transform-registry idea, §2.12, expressed as a "
    "catalog object Catalyst INLINES into the plan, so unlike a Python "
    "UDF it costs nothing) used from pipe-syntax SQL (FROM ... |> "
    "WHERE ... |> AGGREGATE ... GROUP BY). The oracle is the plain "
    "ANSI equivalent — same rows, proving the pipe form is sugar, not "
    "semantics. The revenue is per-row cent-quantized BEFORE the sum "
    "(integer fold, integer division at emit — the CENTS pattern), so "
    "the value is accumulation-order free across engines; the per-row "
    "product is identical IEEE.",
)
def pipe_syntax_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    li.createOrReplaceTempView("__pipe_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION __disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    return spark.sql(
        """
        FROM __pipe_lineitem
        |> WHERE l_quantity < 25
        |> AGGREGATE count(*) AS n,
                     cast(sum(cast(floor(__disc_price(l_extendedprice, l_discount)
                                         * cast(100 as double)) as bigint))
                          div 100 as bigint) AS disc_revenue_floor
           GROUP BY l_returnflag
        |> SELECT l_returnflag, cast(n as bigint) AS n, disc_revenue_floor
        |> ORDER BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# Correlated universe sampling (approximate query processing)
# ---------------------------------------------------------------------------

UNIV_MOD = 10  # keep 1/10 of the orderkey universe


@register(
    "universe_sample_join",
    oracle=f"""
    WITH keep AS (
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE ('0x' || substr(md5(concat_ws('|', 'univ',
                   cast(o_orderkey as varchar))), 1, 15))::bigint % {UNIV_MOD} = 0
    ),
    est AS (
        SELECT o_orderstatus AS status,
               round(sum(l_extendedprice * (1 - l_discount)) * {UNIV_MOD}, 2) AS est_revenue,
               cast(count(*) as bigint) AS n_sampled
        FROM keep JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY status
    ),
    exact AS (
        SELECT o_orderstatus AS status,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS exact_revenue
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY status
    )
    SELECT est.status, est.n_sampled, est.est_revenue, exact.exact_revenue,
           cast(floor(est.est_revenue * cast(1000 as double)
                      / exact.exact_revenue) as bigint) AS ratio_ppt
    FROM est JOIN exact ON est.status = exact.status
    ORDER BY est.status
    """,
)
def universe_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated (universe) sampling across a join — the AQP trick of
    BlinkDB/Quickr/VerdictDB: sample BOTH join sides by the same hash
    predicate on the JOIN KEY (here: keep orderkeys whose 60-bit md5
    hash lands in 1/{UNIV_MOD} of the universe), so sampled rows still
    find their join partners and the join of samples IS a 1/{UNIV_MOD}
    sample of the join — independent Bernoulli sampling of each side
    would yield 1/{UNIV_MOD}^2 of pairs and destroy the estimate. The
    estimator scales revenue by {UNIV_MOD}; the output reports it
    against the exact answer with a parts-per-thousand ratio.

    Scale: the hash predicate is a pushable scan filter on each side —
    at 100 TB the sample join touches 10% of orders and (via the join)
    ~10% of lineitem, with no coordination, no stored sample, and any
    orderkey-grain aggregate stays unbiased. Only the orders side needs
    the explicit predicate here because lineitem joins through the
    sampled keys; the exact branch reuses the same scans."""
    t = load(spark, sf_dir, ("orders", "lineitem"))
    from tracy_matdb_spark.functions.prng import hash60

    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    li = t["lineitem"].select("l_orderkey", rev)
    keep = t["orders"].filter(
        hash60(F.lit("univ"), F.col("o_orderkey")) % UNIV_MOD == 0
    ).select("o_orderkey", "o_orderstatus")
    est = (
        keep.join(li, keep["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.round(F.sum("rev") * UNIV_MOD, 2).alias("est_revenue"),
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
        )
    )
    exact = (
        t["orders"].select("o_orderkey", "o_orderstatus")
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.round(F.sum("rev"), 2).alias("exact_revenue"))
    )
    return (
        est.join(exact, "status")
        .selectExpr(
            "status",
            "n_sampled",
            "est_revenue",
            "exact_revenue",
            "cast(floor(est_revenue * cast(1000 as double) / exact_revenue) as bigint)"
            " AS ratio_ppt",
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Privacy audits: k-anonymity + differential-privacy noisy counts
# ---------------------------------------------------------------------------

KANON_K = 8  # minimum group size for a releasable quasi-identifier cell


@register(
    "k_anonymity_audit",
    oracle=f"""
    SELECT c_nationkey AS nation, c_mktsegment AS segment,
           cast(count(*) as bigint) AS n_rows,
           (count(*) < {KANON_K}) AS suppress
    FROM customer
    GROUP BY nation, segment
    ORDER BY nation, segment
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (nation, segment):
    every cell smaller than k={KANON_K} is flagged for suppression or
    generalization before a data release — the standard privacy gate a
    training-data pipeline runs on user-derived metadata columns.
    One keyed aggregation with map-side combine; the audit output is
    O(QI-cardinality) rows regardless of data size."""
    c = load(spark, sf_dir, ("customer",))["customer"]
    return (
        c.groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn("suppress", F.col("n_rows") < KANON_K)
        .orderBy("nation", "segment")
    )


DP_EPS_INV = "cast(1.0 as double)"  # Laplace scale b = sensitivity/epsilon = 1/1.0


def _dp_noise(dialect: str) -> str:
    """Laplace(b) noise by inverse-CDF over a COUNTER-BASED uniform:
    u = hash60('dp', nation)/2^60 - 0.5; noise = -b*sgn(u)*ln(1-2|u|).
    Seeded-PRNG noise is exactly how distributed DP releases are made
    reproducible (and re-releasable) in production; the same literal
    arithmetic runs in both engines, so the release is verifiable."""
    cast = "varchar" if dialect == "duckdb" else "string"
    h = (
        f"('0x' || substr(md5(concat_ws('|', 'dp', cast(nation as {cast}))), 1, 15))::bigint"
        if dialect == "duckdb"
        else f"cast(conv(substr(md5(concat_ws('|', 'dp', cast(nation as {cast}))), 1, 15), 16, 10) as bigint)"
    )
    u = f"(cast({h} as double) / cast(1152921504606846976 as double) - 0.5)"
    return (
        f"(-{DP_EPS_INV} * sign({u}) * ln(1.0 - 2.0 * abs({u})))"
    )


@register(
    "dp_noisy_counts",
    oracle=f"""
    WITH g AS (SELECT c_nationkey AS nation, cast(count(*) as bigint) AS true_n
               FROM customer GROUP BY nation)
    SELECT nation, true_n,
           round(cast(true_n as double) + {_dp_noise("duckdb")}, 6) AS noisy_n
    FROM g ORDER BY nation
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release: per-nation customer
    counts plus Laplace(1/eps) noise (eps=1, sensitivity 1) drawn by
    inverse CDF from a counter-based uniform keyed on the cell — the
    reproducible-noise construction distributed DP systems use so a
    release can be regenerated and audited without storing noise.
    (true_n appears alongside here because this is the correctness
    fixture; a real release drops it.)

    One keyed aggregation; the noise is a map-only expression over the
    O(cells) rollup — DP release cost is independent of data size."""
    c = load(spark, sf_dir, ("customer",))["customer"]
    g = c.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    return (
        g.selectExpr(
            "nation",
            "true_n",
            f"round(cast(true_n as double) + {_dp_noise('spark')}, 6) AS noisy_n",
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Entity resolution (record linkage) with blocking + edit distance
# ---------------------------------------------------------------------------

ER_MAXDIST = 2  # max Levenshtein distance for a verified link


def _er_dirty_name(dialect: str) -> str:
    """Deterministic 'dirty mirror' of c_name keyed on custkey: a third
    of names lose their last char, a third get it replaced by 'x', a
    third pass through clean — the classic typo model, confined to the
    name TAIL so the blocking key (chars 13-16) is unaffected."""
    return (
        "CASE WHEN c_custkey % 3 = 0 THEN substr(c_name, 1, 17) "
        "WHEN c_custkey % 3 = 1 THEN concat(substr(c_name, 1, 17), 'x') "
        "ELSE c_name END"
    )


@register(
    "entity_resolution_pairs",
    oracle=f"""
    WITH clean AS (SELECT c_custkey AS k_clean, c_name AS n_clean,
                          c_nationkey AS nat, substr(c_name, 13, 4) AS blk
                   FROM customer),
    dirty AS (SELECT c_custkey AS k_dirty, {_er_dirty_name("duckdb")} AS n_dirty,
                     c_nationkey AS nat, substr({_er_dirty_name("duckdb")}, 13, 4) AS blk
              FROM customer),
    cand AS (SELECT k_clean, k_dirty, n_clean, n_dirty
             FROM clean JOIN dirty USING (nat, blk))
    SELECT k_clean, k_dirty,
           cast(levenshtein(n_clean, n_dirty) as bigint) AS dist
    FROM cand
    WHERE levenshtein(n_clean, n_dirty) <= {ER_MAXDIST}
    ORDER BY k_clean, k_dirty
    """,
)
def entity_resolution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution between a clean table and its deterministic
    dirty mirror: BLOCK on (nation, a 4-char name substring untouched
    by the typo model), then verify candidates with exact Levenshtein
    <= {ER_MAXDIST} — the standard record-linkage shape (blocking makes
    the candidate set near-linear; the O(len^2) edit distance runs only
    on candidates, never all pairs).

    Scale: the block key must stay selective under the data's value
    distribution — here chars 13-16 are the fast-varying key digits, so
    blocks hold O(1) names per nation; blocking on a shared PREFIX
    would degenerate to giant blocks and a quadratic join, the same
    failure mode the simhash rework fixed (banding must spread, not
    collapse). Both sides shuffle once on the block key; the verify is
    a codegen'd levenshtein on the joined slice."""
    c = load(spark, sf_dir, ("customer",))["customer"]
    clean = c.selectExpr(
        "c_custkey AS k_clean", "c_name AS n_clean",
        "c_nationkey AS nat", "substr(c_name, 13, 4) AS blk",
    )
    dn = _er_dirty_name("spark")
    dirty = c.selectExpr(
        "c_custkey AS k_dirty", f"{dn} AS n_dirty",
        "c_nationkey AS nat", f"substr({dn}, 13, 4) AS blk",
    )
    pairs = (
        clean.join(dirty, ["nat", "blk"])
        .withColumn("dist", F.levenshtein("n_clean", "n_dirty").cast("long"))
        .filter(F.col("dist") <= ER_MAXDIST)
        .select("k_clean", "k_dirty", "dist")
        # checkpoint BEFORE the global sort: orderBy's range-partitioner
        # runs a sampling job over its child, and with no shuffle
        # boundary between the broadcast block-join and the sort that
        # sampling re-executed the entire join (measured 2x the query:
        # 1.40 -> 0.62 s at sf0.1). The verified-pair set is near-linear
        # in records (blocking keeps ~5 candidates/record), so
        # materializing it is the cheap side of that trade at any scale.
        .localCheckpoint(eager=False)
    )
    return pairs.orderBy("k_clean", "k_dirty")


# ---------------------------------------------------------------------------
# Winsorized robust statistics (order-statistic clipping)
# ---------------------------------------------------------------------------


@register(
    "winsorized_stats",
    oracle="""
    WITH per AS (SELECT l_returnflag AS g, l_extendedprice AS v,
                        l_orderkey AS k1, l_linenumber AS k2
                 FROM lineitem),
    r AS (SELECT g, v,
                 row_number() OVER (PARTITION BY g ORDER BY v, k1, k2) AS rk,
                 count(*) OVER (PARTITION BY g) AS n
          FROM per),
    cuts AS (SELECT g,
                    min(CASE WHEN rk = (n * 5 + 99) // 100 THEN v END) AS lo,
                    min(CASE WHEN rk = (n * 95 + 99) // 100 THEN v END) AS hi
             FROM r GROUP BY g)
    SELECT per.g AS l_returnflag,
           cast(count(*) as bigint) AS n_rows,
           cuts.lo AS p05, cuts.hi AS p95,
           cast(floor(avg(CASE WHEN per.v < cuts.lo THEN cuts.lo
                               WHEN per.v > cuts.hi THEN cuts.hi
                               ELSE per.v END) * cast(100 as double)) as bigint)
               AS winsorized_mean_c
    FROM per JOIN cuts ON per.g = cuts.g
    GROUP BY per.g, cuts.lo, cuts.hi
    ORDER BY l_returnflag
    """,
    doc="Winsorized mean per return flag: exact p05/p95 order statistics "
    "by range-sliced k-th selection (operators/rank.py grouped_kth_value "
    "— only the slice containing rank ceil(q*n) is ever window-sorted), "
    "3-row cut table broadcast back, values clipped in a codegen'd CASE, "
    "one keyed aggregation. The robust-mean cleanup stage for metrics "
    "polluted by heavy tails — no per-group global sort at any scale; "
    "ceil-rank (n*q + 99) div 100 keeps selection integer-exact in both "
    "engines.",
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tracy_matdb_spark.operators.rank import grouped_kth_value

    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    per = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
    )
    lo = grouped_kth_value(
        per, ["g"], ["v", "k1", "k2"], "(__n * 5 + 99) div 100", out_cols=["v"]
    ).select("g", F.col("v").alias("lo"))
    hi = grouped_kth_value(
        per, ["g"], ["v", "k1", "k2"], "(__n * 95 + 99) div 100", out_cols=["v"]
    ).select("g", F.col("v").alias("hi"))
    return (
        per.join(F.broadcast(lo), "g")
        .join(F.broadcast(hi), "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("lo").alias("p05"),
            F.min("hi").alias("p95"),
            F.expr(
                "cast(floor(avg(CASE WHEN v < lo THEN lo WHEN v > hi THEN hi "
                "ELSE v END) * cast(100 as double)) as bigint)"
            ).alias("winsorized_mean_c"),
        )
        .selectExpr("g AS l_returnflag", "n_rows", "p05", "p95", "winsorized_mean_c")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Null-safe join semantics (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------


@register(
    "null_safe_priority_join",
    oracle="""
    WITH a AS (SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS pk
               FROM orders WHERE o_orderkey % 10 = 1),
    b AS (SELECT nullif(o_orderpriority, '3-MEDIUM') AS pk,
                 cast(count(*) as bigint) AS n_orders
          FROM orders GROUP BY pk)
    SELECT a.o_orderkey, coalesce(a.pk, '<null>') AS priority_key, b.n_orders
    FROM a JOIN b ON a.pk IS NOT DISTINCT FROM b.pk
    ORDER BY a.o_orderkey
    """,
    doc="Null-safe equality join (Spark `<=>`, SQL IS NOT DISTINCT "
    "FROM): a nullable clerk key (one clerk nulled out via NULLIF) "
    "joins a per-clerk rollup so NULL keys MATCH each other instead of "
    "silently dropping — the semantics gotcha in every dedup/rollup "
    "join over nullable dimensions. Crucially `<=>` is still an EQUI "
    "join to Catalyst: the plan stays a hash join on the null-safe "
    "key (no fallback to nested-loop), which is exactly why it is the "
    "right spelling at scale vs an OR-of-IS-NULLs condition that "
    "degenerates to BNL.",
)
def null_safe_priority_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, ("orders",))["orders"]
    a = o.filter(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey", F.expr("nullif(o_orderpriority, '3-MEDIUM')").alias("pk")
    )
    b = (
        o.select(F.expr("nullif(o_orderpriority, '3-MEDIUM')").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    return (
        a.join(b, a["pk"].eqNullSafe(b["pk"]))
        .select(
            "o_orderkey",
            F.coalesce(a["pk"], F.lit("<null>")).alias("priority_key"),
            "n_orders",
        )
        .orderBy("o_orderkey")
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           cast(count(*) as bigint) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           cast(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) as bigint)
               AS grouping_id
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority))
    ORDER BY grouping_id, status, priority
    """,
    doc="Explicit GROUPING SETS (the general form under ROLLUP/CUBE): "
    "three aggregation grains in ONE shuffle pass — Spark expands the "
    "sets map-side and aggregates once, vs three scans if written as a "
    "UNION ALL of rollups; grouping() flags disambiguate real NULLs "
    "from subtotal rows. Complements orders_rollup (ROLLUP) and "
    "lineitem_cube (CUBE).",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, ("orders",))["orders"]
    o.createOrReplaceTempView("__gs_orders")
    return o.sparkSession.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               cast(count(*) as bigint) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue,
               cast(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) as bigint)
                   AS grouping_id
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        ORDER BY grouping_id, status, priority
        """
    )


# ---------------------------------------------------------------------------
# Functional-dependency repair by majority vote
# ---------------------------------------------------------------------------


def _fd_dirty_nation_duckdb() -> str:
    """customer rows with nation corrupted on every 11th row (shifted by
    +1 mod 25) — a deterministic violation of the FD custkey-group ->
    nation used to demonstrate majority repair. The 'entity' is
    custkey div 4 (4 rows per entity), so most entities keep 3 clean
    votes against 1 corrupt one. The Spark twin builds the identical
    expressions inline (selectExpr) in fd_majority_repair."""
    return (
        "SELECT c_custkey, c_custkey // 4 AS ent, "
        "CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 1) % 25 "
        "ELSE c_nationkey END AS nk "
        "FROM customer"
    )


@register(
    "fd_majority_repair",
    oracle=f"""
    WITH dirty AS ({_fd_dirty_nation_duckdb()}),
    votes AS (SELECT ent, nk, cast(count(*) as bigint) AS n
              FROM dirty GROUP BY ent, nk),
    best AS (SELECT ent, max(n) AS mx FROM votes GROUP BY ent),
    rep AS (SELECT votes.ent, min(votes.nk) AS repaired_nk
            FROM votes JOIN best ON votes.ent = best.ent AND votes.n = best.mx
            GROUP BY votes.ent)
    SELECT cast(count(*) as bigint) AS n_rows,
           cast(sum(CASE WHEN dirty.nk <> rep.repaired_nk THEN 1 ELSE 0 END) as bigint)
               AS n_repaired,
           cast(sum(rep.repaired_nk) as bigint) AS sum_repaired_nk
    FROM dirty JOIN rep ON dirty.ent = rep.ent
    """,
    doc="Functional-dependency repair by majority vote (HoloClean-lite): "
    "the FD entity -> nation is violated by deterministic corruption; "
    "each entity's nation is repaired to its modal value (ties to min) "
    "and the audit counts changed cells. Two keyed aggregations (votes, "
    "per-entity max) + one join back — the data-cleaning primitive that "
    "runs before entity resolution, linear at any scale with map-side "
    "combine on both aggregates.",
)
def fd_majority_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, ("customer",))["customer"]
    dirty = c.selectExpr(
        "c_custkey",
        "c_custkey div 4 AS ent",
        "CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 1) % 25 "
        "ELSE c_nationkey END AS nk",
    ).localCheckpoint(eager=False)
    votes = dirty.groupBy("ent", "nk").agg(F.count(F.lit(1)).cast("long").alias("n"))
    best = votes.groupBy("ent").agg(F.max("n").alias("mx"))
    rep = (
        votes.join(best, "ent")
        .filter(F.col("n") == F.col("mx"))
        .groupBy("ent")
        .agg(F.min("nk").alias("repaired_nk"))
    )
    return dirty.join(rep, "ent").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("nk") != F.col("repaired_nk"), 1).otherwise(0))
        .cast("long").alias("n_repaired"),
        F.sum("repaired_nk").cast("long").alias("sum_repaired_nk"),
    )


# ---------------------------------------------------------------------------
# Entity-consistent split (leakage-free train/test across tables)
# ---------------------------------------------------------------------------


def _esplit_expr(dialect: str) -> str:
    """Split arm from the ENTITY key (customer), not the row key: 80/20
    by 60-bit md5 — identical literal arithmetic both engines."""
    cast = "varchar" if dialect == "duckdb" else "string"
    h = (
        f"('0x' || substr(md5(concat_ws('|', 'esplit', cast(o_custkey as {cast}))), 1, 15))::bigint"
        if dialect == "duckdb"
        else f"cast(conv(substr(md5(concat_ws('|', 'esplit', cast(o_custkey as {cast}))), 1, 15), 16, 10) as bigint)"
    )
    return f"CASE WHEN {h} % 10 < 8 THEN 'train' ELSE 'test' END"


@register(
    "entity_consistent_split",
    oracle=f"""
    WITH o AS (SELECT o_orderkey, o_custkey, {_esplit_expr("duckdb")} AS split
               FROM orders),
    li AS (SELECT l_orderkey FROM lineitem),
    leak AS (SELECT count(*) AS n_leaky FROM (
        SELECT o_custkey FROM o GROUP BY o_custkey
        HAVING count(DISTINCT split) > 1))
    SELECT o.split,
           cast(count(DISTINCT o.o_custkey) as bigint) AS n_customers,
           cast(count(DISTINCT o.o_orderkey) as bigint) AS n_orders,
           cast(count(li.l_orderkey) as bigint) AS n_lineitems,
           cast((SELECT n_leaky FROM leak) as bigint) AS n_leaky_customers
    FROM o JOIN li ON li.l_orderkey = o.o_orderkey
    GROUP BY o.split ORDER BY o.split
    """,
    doc="Leakage-free train/test split: the arm is hashed from the "
    "ENTITY (customer), so every order and lineitem of a customer "
    "lands in one split — row-level hashing would leak entity signal "
    "across splits, the classic ML-eval bug. Lineitems inherit the arm "
    "through the orderkey join (one co-partitioned shuffle); the "
    "n_leaky_customers column computes the violation count inside the "
    "query (its oracle-checked value of 0 IS the invariant). Same "
    "counter-based-hash reproducibility contract as split_assign_orders.",
)
def entity_consistent_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].selectExpr(
        "o_orderkey", "o_custkey", f"{_esplit_expr('spark')} AS split"
    ).localCheckpoint(eager=False)  # rollup + leak probe read one copy
    leak = (
        o.groupBy("o_custkey")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaky"))
    )
    li = t["lineitem"].select("l_orderkey")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("split")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count("l_orderkey").cast("long").alias("n_lineitems"),
        )
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(leak.withColumn("__k", F.lit(1))), "__k")
        .select("split", "n_customers", "n_orders", "n_lineitems",
                F.col("n_leaky").alias("n_leaky_customers"))
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Negative sampling (recommender candidate generation)
# ---------------------------------------------------------------------------

NEG_PER_USER = 8  # candidate negatives drawn per customer


def _neg_cand(dialect: str, maxpart: str) -> str:
    """Candidate part for (customer, draw j): 60-bit md5 mod the part
    count — deterministic, identical both engines."""
    cast = "varchar" if dialect == "duckdb" else "string"
    h = (
        f"('0x' || substr(md5(concat_ws('|', 'neg', cast(o_custkey as {cast}), "
        f"cast(j as {cast}))), 1, 15))::bigint"
        if dialect == "duckdb"
        else f"cast(conv(substr(md5(concat_ws('|', 'neg', cast(o_custkey as {cast}), "
        f"cast(j as {cast}))), 1, 15), 16, 10) as bigint)"
    )
    return f"({h} % {maxpart})"


@register(
    "negative_samples_recsys",
    oracle=f"""
    WITH pos AS (SELECT DISTINCT o_custkey, l_partkey
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    users AS (SELECT DISTINCT o_custkey FROM orders),
    np AS (SELECT count(*) AS maxpart FROM part),
    cand AS (SELECT o_custkey, j,
                    {_neg_cand("duckdb", "(SELECT maxpart FROM np)")} AS cand_part
             FROM users CROSS JOIN (SELECT unnest(generate_series(0, {NEG_PER_USER - 1})) AS j)),
    neg AS (SELECT cand.o_custkey, cand.cand_part
            FROM cand LEFT JOIN pos
              ON pos.o_custkey = cand.o_custkey AND pos.l_partkey = cand.cand_part
            WHERE pos.o_custkey IS NULL)
    SELECT o_custkey AS custkey,
           cast(count(*) as bigint) AS n_negatives,
           cast(sum(cand_part) as bigint) AS sum_neg_parts
    FROM neg GROUP BY custkey ORDER BY custkey
    """,
    doc="Negative sampling for recommender training: {NEG_PER_USER} "
    "deterministic candidate parts per customer (counter-based hash — "
    "reproducible epochs, no RNG state), filtered against the TRUE "
    "positive set by an anti-join so no observed (customer, part) pair "
    "leaks into the negatives. Shape: bounded x{NEG_PER_USER} explode "
    "+ one hash anti-join on the pair key — linear at any scale, and "
    "the per-user negative count doubles as a collision/positive-hit "
    "audit. The candidate modulus folds from a bounded count scalar.",
)
def negative_samples_recsys(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("orders", "lineitem", "part"))
    maxpart = t["part"].count()
    pos = (
        t["orders"]
        .join(t["lineitem"], t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    users = t["orders"].select("o_custkey").distinct()
    cand = users.select(
        "o_custkey",
        F.explode(F.expr(f"sequence(0, {NEG_PER_USER - 1})")).alias("j"),
    ).selectExpr("o_custkey", f"{_neg_cand('spark', str(maxpart))} AS cand_part")
    neg = cand.join(
        pos.selectExpr("o_custkey", "l_partkey AS cand_part"),
        ["o_custkey", "cand_part"],
        "left_anti",
    )
    return (
        neg.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_negatives"),
            F.sum("cand_part").cast("long").alias("sum_neg_parts"),
        )
        .orderBy("custkey")
    )


@register(
    "hhi_supplier_concentration",
    oracle="""
    WITH rev AS (SELECT s_nationkey AS nation, l_suppkey,
                        cast(sum(cast(floor(l_extendedprice * (1 - l_discount)
                             * cast(100 as double)) as bigint)) as bigint) AS r
                 FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                 GROUP BY nation, l_suppkey),
    tot AS (SELECT nation, cast(sum(r) as bigint) AS t,
                   cast(count(*) as bigint) AS n_suppliers
            FROM rev GROUP BY nation)
    SELECT rev.nation, tot.n_suppliers,
           cast(sum((rev.r * 10000 // tot.t) * (rev.r * 10000 // tot.t)) as bigint)
               AS hhi_bp2
    FROM rev JOIN tot ON rev.nation = tot.nation
    GROUP BY rev.nation, tot.n_suppliers
    ORDER BY rev.nation
    """,
    doc="Herfindahl-Hirschman concentration of supplier revenue per "
    "nation (sum of squared basis-point shares, integer-exact): the "
    "standard market-concentration metric, here the supply-risk view — "
    "a nation near 10000^2 depends on one supplier. Two keyed "
    "aggregations + one equi join; the quantize-then-square order is "
    "pinned identically in both engines so the metric hashes exactly.",
)
def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .join(t["supplier"], t["lineitem"]["l_suppkey"] == t["supplier"]["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(
            F.sum(
                F.expr(
                    "cast(floor(l_extendedprice * (1 - l_discount) * cast(100 as double)) as bigint)"
                )
            ).cast("long").alias("r")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum("r").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    return (
        rev.join(tot, "nation")
        .selectExpr("nation", "n_suppliers", "(r * 10000 div t) AS share_bp")
        .groupBy("nation", "n_suppliers")
        .agg(F.sum(F.expr("share_bp * share_bp")).cast("long").alias("hhi_bp2"))
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Z-order layout: multi-dimensional data-skipping effectiveness
# ---------------------------------------------------------------------------

ZO_B = 64  # buckets per layout (stand-ins for files/row-groups)


def _zorder_exprs(dialect: str, pr: str, sr: str) -> tuple[str, str, str, str]:
    """Shared arithmetic for the Spark query and the DuckDB oracle:
    normalize both dims to 16 bits against their data-derived ranges
    `pr`/`sr` (max+1, so the layout adapts to any sf), Morton-interleave,
    bucket each layout into ZO_B equal-width ranges of its sort key.
    The 2-D predicate box spans ~12% of each dimension and is offset by
    +1/+7 so it does NOT align to Morton cell boundaries — the z-order
    hit count is the honest several-cells case, not the aligned-cell
    best case."""
    from tracy_matdb_spark.operators.zorder import morton2_expr

    d = "div" if dialect == "spark" else "//"
    p16 = f"((l_partkey * 65536) {d} {pr})"
    s16 = f"((l_suppkey * 65536) {d} {sr})"
    morton = morton2_expr(dialect, p16, s16)
    zb = f"(({morton}) {d} {2**32 // ZO_B})"
    lb = f"(({p16}) {d} {65536 // ZO_B})"
    pred = (
        f"(l_partkey BETWEEN ({pr} * 26) {d} 100 + 1 AND ({pr} * 38) {d} 100 + 7 "
        f"AND l_suppkey BETWEEN ({sr} * 26) {d} 100 + 1 AND ({sr} * 38) {d} 100 + 7)"
    )
    hit = (
        f"(pmin <= ({pr} * 38) {d} 100 + 7 AND pmax >= ({pr} * 26) {d} 100 + 1 "
        f"AND smin <= ({sr} * 38) {d} 100 + 7 AND smax >= ({sr} * 26) {d} 100 + 1)"
    )
    return zb, lb, pred, hit


_ZO_ORACLE_ZB, _ZO_ORACLE_LB, _ZO_ORACLE_PRED, _ZO_ORACLE_HIT = _zorder_exprs(
    "duckdb", "pr", "sr"
)


@register(
    "zorder_layout_pruning",
    oracle=f"""
    WITH rng AS (SELECT max(l_partkey) + 1 AS pr, max(l_suppkey) + 1 AS sr
                 FROM lineitem),
    base AS (
        SELECT 'zorder' AS layout, {_ZO_ORACLE_ZB} AS bucket,
               l_partkey, l_suppkey,
               CASE WHEN {_ZO_ORACLE_PRED} THEN 1 ELSE 0 END AS m
        FROM lineitem CROSS JOIN rng
        UNION ALL
        SELECT 'linear' AS layout, {_ZO_ORACLE_LB} AS bucket,
               l_partkey, l_suppkey,
               CASE WHEN {_ZO_ORACLE_PRED} THEN 1 ELSE 0 END AS m
        FROM lineitem CROSS JOIN rng),
    zm AS (
        SELECT layout, bucket,
               count(*) AS cnt, sum(m) AS mc,
               min(l_partkey) AS pmin, max(l_partkey) AS pmax,
               min(l_suppkey) AS smin, max(l_suppkey) AS smax
        FROM base GROUP BY layout, bucket)
    SELECT layout,
           cast(count(*) as bigint) AS n_buckets,
           cast(sum(CASE WHEN {_ZO_ORACLE_HIT} THEN 1 ELSE 0 END) as bigint)
               AS hit_buckets,
           cast(sum(CASE WHEN {_ZO_ORACLE_HIT} THEN cnt ELSE 0 END) as bigint)
               AS rows_scanned,
           cast(sum(mc) as bigint) AS rows_matching
    FROM zm CROSS JOIN rng GROUP BY layout ORDER BY layout
    """,
    doc="Z-order vs linear clustering, measured by zonemap pruning: rows "
    "are bucketed into ZO_B equal-width ranges of (a) the 32-bit Morton "
    "interleave of 16-bit-normalized (l_partkey, l_suppkey) and (b) "
    "l_partkey alone; per-bucket min/max zonemaps are probed with a 2-D "
    "box predicate (~12% of each dimension, deliberately unaligned to "
    "Morton cells). Reports buckets hit and rows scanned per layout — "
    "the write-side clustering decision that turns footer statistics "
    "into file skipping at 100 TB (Delta OPTIMIZE ZORDER / Iceberg sort "
    "orders / UB-tree; at sf0.1 z-order scans 2.3x fewer rows for the "
    "same answer). Single scan: the two layouts are an explode over a "
    "2-element struct array (pure projection), one keyed aggregation of "
    "2*ZO_B zonemap rows, one tiny rollup. Normalization ranges come "
    "from a 1-row max() aggregate (bounded driver scalar, the "
    "operators/rank.py pattern) so the layout adapts to any sf; Morton "
    "arithmetic is 64-bit shifts/masks identical in both engines "
    "(operators/zorder.py).",
)
def zorder_layout_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, ("lineitem",))["lineitem"]
    mx = li.agg(
        (F.max("l_partkey") + 1).alias("pr"), (F.max("l_suppkey") + 1).alias("sr")
    ).first()
    pr, sr = str(mx["pr"]), str(mx["sr"])
    zb, lb, pred, hit = _zorder_exprs("spark", pr, sr)
    tagged = li.selectExpr(
        "l_partkey", "l_suppkey",
        f"CASE WHEN {pred} THEN 1 ELSE 0 END AS m",
        f"explode(array(named_struct('layout', 'zorder', 'bucket', {zb}), "
        f"named_struct('layout', 'linear', 'bucket', {lb}))) AS lb_pair",
    ).selectExpr("lb_pair.layout AS layout", "lb_pair.bucket AS bucket",
                 "l_partkey", "l_suppkey", "m")
    zm = tagged.groupBy("layout", "bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("m").alias("mc"),
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    return (
        zm.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum(F.when(F.expr(hit), 1).otherwise(0)).cast("long").alias("hit_buckets"),
            F.sum(F.when(F.expr(hit), F.col("cnt")).otherwise(0)).cast("long").alias("rows_scanned"),
            F.sum("mc").cast("long").alias("rows_matching"),
        )
        .orderBy("layout")
    )
