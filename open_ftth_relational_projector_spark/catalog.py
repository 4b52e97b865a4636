"""Query catalog: the driver-contract surface (__spark_entry__.py).

Each entry pairs a Spark implementation with an ANSI-SQL DuckDB oracle that
must hash-match it (column names and value semantics aligned; doubles
rounded to 4 dp on BOTH sides; counts cast to BIGINT on the DuckDB side
because its integer SUM widens to HUGEINT).

The catalog demonstrates every operator family from SURVEY §2 over the
driver tables, plus the LLM-pipeline surface (functions/*), plus two
queries that run the REAL projection engine over domain events synthesized
deterministically from the events table (proj_work_task_sim,
proj_installation_sim) — those oracles re-implement the fold semantics in
pure SQL, so the engine's epoch/guard/null-write behavior is checked against
an independent implementation on driver data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W

from open_ftth_relational_projector_spark.sources.tables import load_table, scattered
from open_ftth_relational_projector_spark.events.reader import EventLog
from open_ftth_relational_projector_spark.operators import asof_join, latest_by_key
from open_ftth_relational_projector_spark.functions import dedup as D
from open_ftth_relational_projector_spark.functions import similarity as S
from open_ftth_relational_projector_spark.functions import text as TXT
from open_ftth_relational_projector_spark.functions.multimodal import (
    attach_binary,
    extract_features,
)
from open_ftth_relational_projector_spark.projections.core import (
    project_installation,
    project_work_task,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

SPARK_QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _r4(col):
    return F.round(col, 4)


# ===========================================================================
# 1. TPC-H-ish relational core
# ===========================================================================


@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum("l_quantity")).alias("sum_qty"),
            _r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r4(F.sum(disc)).alias("sum_disc_price"),
            _r4(F.sum(disc * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_extendedprice")).alias("avg_price"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "q3_order_revenue",
    """
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    HAVING SUM(l.l_extendedprice * (1 - l.l_discount)) > 100000
    """,
)
def q3_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r4(rev).alias("revenue"), rev.alias("_raw"))
        .filter(F.col("_raw") > 100000)
        .drop("_raw")
    )


@_q(
    "q5_region_nation_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q5_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q(
    "q4_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1995-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery = left-semi join (the Spark-native
    decorrelation Catalyst would produce). The driver's lineitem has no
    commit/receipt dates, so 'late' is modeled as a returned line."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp_ntz"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_q(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate pushable to the parquet scan —
    the canonical predicate-pushdown showcase (plans/checks pins this)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


@_q(
    "q12_shipmode_priority",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-01-01'
      AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_linestatus
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE) aggregation after an equi-join
    with a cross-table predicate (ship after order). The driver's lineitem
    has no shipmode column; l_linestatus plays the grouping role."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_q(
    "q18_large_volume_customers",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(SUM(l.l_quantity), 4) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate feeding a semi-join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(_r4(F.sum("l_quantity")).alias("total_qty"))
    )


@_q(
    "q7_nation_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border revenue by (supplier nation, customer
    nation, ship year). supplier and nation are dims → broadcast probes; the
    only fact shuffle is lineitem⋈orders then the final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@_q(
    "q9_product_type_profit",
    """
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for one
    product family. The part filter broadcasts BEFORE the fact join, so the
    lineitem scan is cut down ahead of the lineitem⋈orders shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "profit"
            )
        )
    )


@_q(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1995-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    HAVING SUM(l.l_extendedprice * (1 - l.l_discount)) > 50000
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost revenue from returned lines per customer.
    (HAVING threshold instead of the spec's top-20 — output must be an
    order-insensitive set for the oracle compare.)"""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(_r4(rev).alias("revenue"), rev.alias("_raw"))
        .filter(F.col("_raw") > 50000)
        .drop("_raw")
    )


@_q(
    "q13_customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer including the
    zero-order bucket (LEFT join + COUNT(col)'s null-skipping)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_q(
    "q14_promo_effect",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-07-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio (promo revenue share)
    over a ship-date slice; part is a broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            _r4(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc)
            ).alias("promo_pct")
        )
    )


@_q(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_rev, 4) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate feeding a scalar-subquery max filter —
    expressed as an unpartitioned window max over the (supplier-sized)
    aggregate, which ties are returned from naturally."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    top = rev.withColumn("_max", F.max("total_rev").over(W.partitionBy())).filter(
        F.col("total_rev") == F.col("_max")
    )
    return (
        top.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", _r4(F.col("total_rev")).alias("total_revenue"))
    )


@_q(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_size IN (1, 9, 19, 29, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with a NOT-IN exclusion — the exclusion is a broadcast anti-join
    (negative-balance suppliers stand in for the spec's complaints)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 9, 19, 29, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery decorrelated into a
    per-part average aggregate joined back to the fact — the same rewrite
    Catalyst performs for the SQL form."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgq = branded.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("_qlim")
    )
    return (
        branded.join(F.broadcast(avgq), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qlim"))
        .agg(_r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@_q(
    "q19_discounted_revenue",
    """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicate across the
    join. The part side of each disjunct is pre-filtered into the broadcast
    (brand ∈ {12,23,34}, size ≤ 15), so the OR evaluates over a reduced
    build side while lineitem keeps a single scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & F.col("p_size").between(1, 15)
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@_q(
    "q22_sales_opportunity",
    """
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (global average as a
    1-row broadcast cross join) + NOT EXISTS as a left-anti join (every
    customer has SOME order in this data, so the exclusion keys on urgent
    orders to stay non-vacuous)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


@_q(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT p.p_partkey, p.p_name, s.s_name, l.l_extendedprice
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE p.p_size = 15)
    SELECT DISTINCT o.p_partkey, o.p_name, o.s_name,
           ROUND(o.l_extendedprice, 4) AS min_price
    FROM offers o
    WHERE o.l_extendedprice = (
      SELECT MIN(o2.l_extendedprice) FROM offers o2
      WHERE o2.p_partkey = o.p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp absent from the driver tables, so the
    min-cost relation is lineitem): the correlated MIN subquery decorrelates
    to a partition-window minimum — one shuffle on p_partkey instead of a
    per-row re-scan. Ties keep every (part, supplier) at the minimum, like
    the correlated form; the equality compares a stored double against
    itself (no arithmetic), so it is FP-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("p_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .withColumn("_min", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("_min"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            _r4(F.col("l_extendedprice")).alias("min_price"),
        )
        .distinct()
    )


@_q(
    "q8_market_share",
    """
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY')
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                          ELSE 0 END) / SUM(volume), 4) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue per order
    year. Every dimension (part filter, supplier, customer, both nation
    roles, region) broadcasts, so the only fact shuffles are
    lineitem⋈orders and the final 7-group agg; the conditional numerator
    rides the same aggregate (no second pass over the facts)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _r4(
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(0.0))
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


@_q(
    "q11_important_part_values",
    """
    WITH pv AS (
      SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS part_value
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, ROUND(part_value, 4) AS part_value
    FROM pv
    WHERE part_value > (SELECT SUM(part_value) * 0.0005 FROM pv)
    """,
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key value HAVING a scalar-subquery fraction of
    the global total. The per-key aggregate is persisted — it is the TINY
    side (one row per part key), and without it Spark plans two full fact
    scans because the threshold branch and the filter branch don't share
    subplans (no exchange reuse fires across the differing downstream
    aggregates; verified empirically). With the persist the fact table is
    scanned and shuffled exactly once (pinned in test_plans), and the global
    total re-aggregates the cached relation and broadcasts as a 1-row cross
    join."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value")
    ).persist()
    threshold = pv.agg((F.sum("part_value") * 0.0005).alias("_threshold"))
    return (
        pv.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("_threshold"))
        .select("l_partkey", _r4(F.col("part_value")).alias("part_value"))
    )


@_q(
    "q20_part_promo_suppliers",
    """
    SELECT s.s_name, ROUND(s.s_acctbal, 4) AS s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l.l_suppkey
      HAVING SUM(l.l_quantity) > 2000)
    """,
)
def q20_part_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a two-level nested-IN chain (supplier ← qualifying
    lineitem volume ← part name family). Inner IN = broadcast semi-join
    cutting lineitem before its groupBy; outer IN = semi-join of the small
    qualifying-supplier set back onto supplier."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    qualifying = (
        li.join(
            F.broadcast(p.withColumnRenamed("p_partkey", "l_partkey")),
            "l_partkey",
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 2000)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return s.join(qualifying, "s_suppkey", "left_semi").select(
        "s_name", _r4(F.col("s_acctbal")).alias("s_acctbal")
    )


@_q(
    "q21_waiting_suppliers",
    """
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (the driver lineitem has no commit/receipt dates, so
    the fault marker is l_returnflag='R'): suppliers solely at fault on a
    multi-supplier finalized order. The oracle states the spec with
    correlated EXISTS / NOT EXISTS; this plan decorrelates both into ONE
    per-order aggregate — n_supp>1 ⟺ "another supplier exists", n_rsupp=1
    (with l1 itself flagged) ⟺ "no OTHER flagged supplier exists" — so the
    fact table is shuffled once on l_orderkey instead of twice per
    correlated probe."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    ordstats = li.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_rsupp"),
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
        .join(ordstats, li.l_orderkey == F.col("_ok"))
        .filter((F.col("_n_supp") > 1) & (F.col("_n_rsupp") == 1))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@_q(
    "merged_order_activity_periods",
    """
    WITH iv AS (SELECT o_custkey AS custkey,
                       date_diff('day', DATE '1992-01-01',
                                 CAST(o_orderdate AS DATE))::INT AS s
                FROM orders),
    iv2 AS (SELECT custkey, s, s + 30 AS e FROM iv),
    m AS (SELECT custkey, s, e,
                 MAX(e) OVER (PARTITION BY custkey ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pmax
          FROM iv2),
    fl AS (SELECT custkey, s, e,
                  CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS f
           FROM m),
    isl AS (SELECT custkey, s, e,
                   SUM(f) OVER (PARTITION BY custkey ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS gid
            FROM fl)
    SELECT custkey, CAST(MIN(s) AS INT) AS period_start_d,
           CAST(MAX(e) AS INT) AS period_end_d
    FROM isl GROUP BY custkey, gid
    """,
)
def merged_order_activity_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval stitching (operators/range_join.merge_intervals): each
    order opens a 30-day activity window; overlapping windows coalesce
    into maximal per-customer activity periods — the interval-set union
    (coverage/downtime spans) expressed as one keyed sweep; the oracle
    replays the running-max island construction."""
    from open_ftth_relational_projector_spark.operators.range_join import (
        merge_intervals,
    )

    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("s"),
    ).withColumn("e", F.col("s") + 30)
    out = merge_intervals(iv, ["custkey"], "s", "e")
    return out.select(
        "custkey",
        F.col("s").cast("int").alias("period_start_d"),
        F.col("e").cast("int").alias("period_end_d"),
    )


@_q(
    "unpivot_lineitem_measures",
    """
    WITH m AS (
      SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
    SELECT measure, CAST(COUNT(value) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value,
           ROUND(AVG(value), 4) AS avg_value
    FROM m GROUP BY measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of the four lineitem measures (DataFrame.unpivot —
    the inverse of pivot_event_counts) rolled up per measure. The melt is
    a map-side Expand (4 output rows per input row, no shuffle); the only
    exchange is the 4-group aggregate. Oracle spells the melt as the
    equivalent UNION ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            [],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "value",
        )
        .groupBy("measure")
        .agg(
            F.count("value").cast("long").alias("n"),
            _r4(F.sum("value")).alias("sum_value"),
            _r4(F.avg("value")).alias("avg_value"),
        )
    )


@_q(
    "skyline_parts",
    """
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE p.p_retailprice IS NOT NULL AND p.p_size IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts (cheapest price vs largest size) — the
    multi-criteria dominance shortlist (operators/skyline.skyline_2d,
    hierarchical prefix-max sweep, no global single-partition window);
    the oracle is the quadratic NOT EXISTS dominance definition."""
    from open_ftth_relational_projector_spark.operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part")
    return skyline_2d(part, "p_retailprice", "p_size").select(
        "p_partkey", "p_retailprice", "p_size"
    )


@_q(
    "cube_orders_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping id: all four grouping
    sets in ONE pass — Spark expands the sets map-side (Expand node) and
    aggregates once; identical GROUPING bit semantics in DuckDB."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        _r4(F.sum("o_totalprice")).alias("total"),
    )


@_q(
    "approx_distinct_users",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_u,
           TRUE AS approx_within_3sd
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting, self-verified: HyperLogLog++
    (relative sd 0.05) beside the exact count, emitting whether the sketch
    landed within 3 relative sd (15%; measured error is 0.7% at sf0.01 and
    6.7% at sf0.1 — the estimate is deterministic for fixed data, so the
    bound is a stable regression gate, not a coin flip). The oracle pins
    the exact count AND asserts the bound column is TRUE — so the
    approximate path is re-validated
    against ground truth every driver round. At 100 TB the exact
    countDistinct (two-level shuffle) is replaced by the HLL column alone:
    a fixed-size mergeable sketch per partition, no second shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("_approx"),
            F.countDistinct("user_id").alias("exact_u"),
        )
        .select(
            "event_type",
            "exact_u",
            (
                F.abs(F.col("_approx") - F.col("exact_u"))
                <= 0.15 * F.col("exact_u")
            ).alias("approx_within_3sd"),
        )
    )


@_q(
    "dim_join_customer_geo",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers, ROUND(AVG(c.c_acctbal), 4) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def dim_join_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _r4(F.avg("c_acctbal")).alias("avg_acctbal"),
        )
    )


@_q(
    "anti_join_customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "semi_join_customers_with_urgent_orders",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def semi_join_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@_q(
    "order_item_seq",
    """
    SELECT l_orderkey, l_partkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                ORDER BY l_linenumber, l_partkey) AS INT) AS seq_no
    FROM lineitem
    """,
)
def order_item_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/X1: array unroll with dense per-group sequence via posexplode."""
    li = load_table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
            lambda s: s["l_partkey"],
        ).alias("parts")
    )
    return arr.select(
        "l_orderkey", F.posexplode("parts").alias("_pos", "l_partkey")
    ).select(
        "l_orderkey", "l_partkey", (F.col("_pos") + 1).cast("int").alias("seq_no")
    )


@_q(
    "dedup_first_occurrence",
    """
    WITH firsts AS (
      SELECT l_orderkey, l_partkey, MIN(l_linenumber) AS first_ln
      FROM lineitem GROUP BY l_orderkey, l_partkey)
    SELECT l_orderkey, l_partkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                ORDER BY first_ln, l_partkey) AS INT) AS seq_no
    FROM firsts
    """,
)
def dedup_first_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: order-preserving dedup via array_distinct on an ordered array."""
    li = load_table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.array_distinct(
            F.transform(
                F.sort_array(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
                lambda s: s["l_partkey"],
            )
        ).alias("parts")
    )
    return arr.select(
        "l_orderkey", F.posexplode("parts").alias("_pos", "l_partkey")
    ).select(
        "l_orderkey", "l_partkey", (F.col("_pos") + 1).cast("int").alias("seq_no")
    )


@_q(
    "exists_nested_high_value_first_line",
    """
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_linenumber = 1 AND l.l_extendedprice > 50000)
    """,
)
def exists_nested_high_value_first_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: nested-array EXISTS via higher-order function over collected segments."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_linenumber", "l_extendedprice")).alias("segs")
    )
    hit = nested.filter(
        F.exists(
            "segs",
            lambda s: (s["l_linenumber"] == 1) & (s["l_extendedprice"] > 50000),
        )
    )
    return o.join(hit, o.o_orderkey == hit.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@_q(
    "first_last_part_per_order",
    """
    SELECT l_orderkey,
           ARG_MIN(l_partkey, l_linenumber * 10000000 + l_partkey) AS first_part,
           ARG_MAX(l_partkey, l_linenumber * 10000000 + l_partkey) AS last_part
    FROM lineitem GROUP BY l_orderkey
    """,
)
def first_last_part_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: First()/Last() of an ordered array via element_at(1)/(-1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.element_at(
            F.transform(
                F.sort_array(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
                lambda s: s["l_partkey"],
            ),
            1,
        ).alias("first_part"),
        F.element_at(
            F.transform(
                F.sort_array(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
                lambda s: s["l_partkey"],
            ),
            -1,
        ).alias("last_part"),
    )


@_q(
    "top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@_q(
    "rollup_lineitem_status",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS grp_id,
           ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("grp_id"),
        _r4(F.sum("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "grp_id", "sum_qty", "n")


@_q(
    "pivot_event_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=kinds)
    )


# ===========================================================================
# 2. event-stream semantics in batch (A2, as-of, epochs, sessions, JSON)
# ===========================================================================


@_q(
    "lww_latest_event_per_user",
    """
    SELECT user_id,
           ARG_MAX(event_type, event_id) AS event_type,
           ROUND(ARG_MAX(value, event_id), 4) AS value,
           MAX(event_id) AS seq
    FROM events GROUP BY user_id
    """,
)
def lww_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: dict[id] = state ≡ max_by over the sequence."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("event_id").alias("seq"), "event_type", "value"
    )
    out = latest_by_key(ev, "user_id", value_cols=["event_type", "value"])
    return out.select("user_id", "event_type", _r4(F.col("value")).alias("value"), "seq")


@_q(
    "asof_purchase_prior_signup",
    """
    SELECT event_id, user_id,
           ROUND(value, 4) AS purchase_value,
           ROUND(prior_signup_value, 4) AS prior_signup_value
    FROM (
      SELECT event_id, user_id, value, event_type,
             LAST_VALUE(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_signup_value
      FROM events)
    WHERE event_type = 'purchase'
    """,
)
def asof_purchase_prior_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase sees the latest strictly-earlier signup."""
    ev = load_table(spark, sf_dir, "events")
    versions = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("seq"), F.col("value").alias("prior_signup_value")
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("seq"), F.col("value").alias("purchase_value")
    )
    out = asof_join(facts, versions, "user_id")
    return out.select(
        F.col("seq").alias("event_id"),
        "user_id",
        _r4(F.col("purchase_value")).alias("purchase_value"),
        _r4(F.col("prior_signup_value")).alias("prior_signup_value"),
    )


@_q(
    "asof_forward_error_recovery",
    """
    WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    err AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'error'),
    cand AS (
      SELECT r.event_id, n.event_id AS next_event_id,
             n.event_type AS next_type, n.us AS nus,
             ROW_NUMBER() OVER (PARTITION BY r.event_id ORDER BY n.us) AS rn
      FROM err r JOIN e n
        ON n.user_id = r.user_id AND n.event_type <> 'error'
       AND n.us > r.us AND n.us <= r.us + 3600000000)
    SELECT err.event_id, err.user_id, c.next_event_id, c.next_type,
           CAST(c.nus - err.us AS BIGINT) AS gap_us
    FROM err LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
      ON err.event_id = c.event_id
    """,
)
def asof_forward_error_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with tolerance (operators/asof.asof_join_directed):
    each error event finds the user's first subsequent non-error event
    within one hour — time-to-recovery attribution, the
    pandas-merge_asof(direction='forward', tolerance=…) surface run as a
    backward as-of over negated micros (single shuffle, no range join).
    Unmatched/late recoveries stay as NULL rows (left semantics)."""
    from open_ftth_relational_projector_spark.operators.asof import (
        asof_join_directed,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    facts = ev.filter(F.col("event_type") == "error").select(
        "user_id", "us", "event_id"
    )
    versions = ev.filter(F.col("event_type") != "error").select(
        "user_id",
        "us",
        F.col("event_id").alias("next_event_id"),
        F.col("event_type").alias("next_type"),
    )
    out = asof_join_directed(
        facts,
        versions,
        "user_id",
        fact_seq="us",
        version_seq="us",
        version_cols=["next_event_id", "next_type"],
        direction="forward",
        strict=True,
        tolerance=3_600_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        "next_event_id",
        "next_type",
        (F.col("matched_seq") - F.col("us")).cast("long").alias("gap_us"),
    )


@_q(
    "attribution_last_touch",
    """
    WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    pur AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
    cand AS (
      SELECT p.event_id, c.event_id AS click_id, c.us AS cus,
             ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.us DESC) AS rn
      FROM pur p JOIN e c
        ON c.user_id = p.user_id AND c.event_type = 'click'
       AND c.us < p.us AND c.us >= p.us - 604800000000)
    SELECT pur.event_id, pur.user_id, c.click_id,
           CAST(pur.us - c.cus AS BIGINT) AS touch_age_us,
           c.click_id IS NOT NULL AS attributed
    FROM pur LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
      ON pur.event_id = c.event_id
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent click within a 7-day lookback — asof_join_directed in
    backward mode with tolerance (one shuffle, no range join);
    out-of-window purchases stay as unattributed NULL rows."""
    from open_ftth_relational_projector_spark.operators.asof import (
        asof_join_directed,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "us", "event_id"
    )
    versions = ev.filter(F.col("event_type") == "click").select(
        "user_id", "us", F.col("event_id").alias("click_id")
    )
    out = asof_join_directed(
        facts,
        versions,
        "user_id",
        fact_seq="us",
        version_seq="us",
        version_cols=["click_id"],
        direction="backward",
        strict=True,
        tolerance=604_800_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        "click_id",
        (F.col("us") - F.col("matched_seq")).cast("long").alias("touch_age_us"),
        F.col("click_id").isNotNull().alias("attributed"),
    )


@_q(
    "json_props_stats",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY k_bucket
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: JSON payload parsing with schema-on-read."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_bucket", F.get_json_object("props", "$.k").cast("bigint") % 10
        )
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), _r4(F.sum("value")).alias("sum_value"))
    )


@_q(
    "running_value_per_user",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
    FROM events
    """,
)
def running_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id", "user_id", _r4(F.sum("value").over(w)).alias("running_value")
    )


@_q(
    "event_deltas_range_frame",
    """
    WITH t AS (
      SELECT event_id, user_id, value,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
      FROM events)
    SELECT event_id, user_id,
           ROUND(value - LAG(value, 1, 0.0)
                 OVER (PARTITION BY user_id ORDER BY event_id), 4) AS delta_prev,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW), 4)
             AS day_window_sum
    FROM t
    """,
)
def event_deltas_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag with default + a RANGE frame keyed on event-time seconds (the
    trailing-24h running sum). Both windows share one partition-by-user
    shuffle; the range frame is evaluated by a single ordered sweep per
    key — no self-join-per-row, the shape that survives wide keys."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "sec", F.col("ts").cast("timestamp").cast("long")
    )
    w_row = W.partitionBy("user_id").orderBy("event_id")
    w_range = (
        W.partitionBy("user_id").orderBy("sec").rangeBetween(-86400, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        _r4(F.col("value") - F.lag("value", 1, 0.0).over(w_row)).alias("delta_prev"),
        _r4(F.sum("value").over(w_range)).alias("day_window_sum"),
    )


@_q(
    "doc_length_deciles",
    """
    SELECT lang, doc_id,
           CAST(NTILE(10) OVER (PARTITION BY lang
                ORDER BY n_chars, doc_id) AS INTEGER) AS decile
    FROM documents
    """,
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length deciles (data-mixing strata). Deterministic:
    the NTILE order breaks ties on doc_id so both engines cut identical
    buckets."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    return d.select(
        "lang", "doc_id", F.ntile(10).over(w).cast("int").alias("decile")
    )


@_q(
    "repeat_buyer_churn_setops",
    """
    SELECT user_id FROM (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-10 00:00:00'
      INTERSECT
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-20 00:00:00')
    EXCEPT
    SELECT DISTINCT user_id FROM events
    WHERE event_type = 'purchase'
      AND ts >= TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def repeat_buyer_churn_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set ops: buyers purchasing in both early windows
    (INTERSECT) with no purchase in the final decade (EXCEPT). Spark
    plans both as hash semi/anti joins on the distinct sets — no
    sort-based set op, no cartesian."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    h1 = (
        ev.filter((F.col("event_type") == "purchase") & (ts < F.lit("2024-01-10").cast("timestamp_ntz")))
        .select("user_id").distinct()
    )
    h2 = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (ts >= F.lit("2024-01-10").cast("timestamp_ntz"))
            & (ts < F.lit("2024-01-20").cast("timestamp_ntz"))
        )
        .select("user_id").distinct()
    )
    later = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (ts >= F.lit("2024-01-20").cast("timestamp_ntz"))
        )
        .select("user_id").distinct()
    )
    return h1.intersect(h2).exceptAll(later)


@_q(
    "sessionize_30min",
    """
    WITH t AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             CAST(FLOOR(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id))) AS BIGINT) AS prev_sec
      FROM events),
    flags AS (
      SELECT user_id,
             CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_session
      FROM t)
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM flags GROUP BY user_id
    """,
)
def sessionize_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "sec", F.col("ts").cast("timestamp").cast("long")
    )
    w = W.partitionBy("user_id").orderBy("event_id")
    flags = ev.withColumn("prev_sec", F.lag("sec").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_sec").isNull() | (F.col("sec") - F.col("prev_sec") > 1800), 1
        ).otherwise(0),
    )
    return flags.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@_q(
    "tumbling_event_windows",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def tumbling_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming/windows.tumbling_counts in batch mode — the same
    expression the streaming path runs with a watermark (tested against
    real late-data eviction in tests/test_streaming_windows.py)."""
    from open_ftth_relational_projector_spark.streaming.windows import (
        tumbling_counts,
    )

    return tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")


@_q(
    "sliding_event_windows",
    """
    SELECT time_bucket(INTERVAL '30 minutes', ts)
             - to_minutes(30 * k.k) AS window_start,
           time_bucket(INTERVAL '30 minutes', ts)
             - to_minutes(30 * k.k) + INTERVAL '1 hour' AS window_end,
           event_type, COUNT(*) AS n_events
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    GROUP BY 1, 2, 3
    """,
)
def sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in exactly
    duration/slide = 2 windows (the oracle materializes both by bucket
    arithmetic; Spark's window expression does the same expansion)."""
    from open_ftth_relational_projector_spark.streaming.windows import (
        sliding_counts,
    )

    return sliding_counts(
        load_table(spark, sf_dir, "events"), "1 hour", "30 minutes"
    )


@_q(
    "session_event_windows",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    numbered AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM numbered GROUP BY user_id, sid
    """,
)
def session_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (gap-based) per user — the oracle derives the
    same sessions via gaps-and-islands SQL; session_end = last event + gap
    (Spark's session_window close semantics)."""
    from open_ftth_relational_projector_spark.streaming.windows import (
        session_windows,
    )

    return session_windows(load_table(spark, sf_dir, "events"), "30 minutes")


# ===========================================================================
# 3. the projection engine over synthesized domain events
# ===========================================================================


def _sim_work_task_log(spark: SparkSession, sf_dir: str) -> EventLog:
    ev = load_table(spark, sf_dir, "events")
    created = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("seq"),
        F.col("user_id").cast("string").alias("workTaskId"),
        F.struct(
            F.concat(F.lit("N-"), F.col("user_id").cast("string")).alias("number"),
            F.when(F.col("value") >= 10, F.lit("open")).alias("status"),
        ).alias("workTask"),
    )
    changed = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("seq"),
        F.col("user_id").cast("string").alias("workTaskId"),
        F.concat(F.lit("spent-"), F.floor("value").cast("int").cast("string")).alias(
            "status"
        ),
    )
    return EventLog.from_typed(
        spark, {"WorkTaskCreated": created, "WorkTaskStatusChanged": changed}
    )


@_q(
    "proj_work_task_sim",
    """
    WITH created AS (
      SELECT CAST(user_id AS VARCHAR) AS id, event_id AS seq,
             'N-' || CAST(user_id AS VARCHAR) AS number,
             CASE WHEN value >= 10 THEN 'open' END AS status
      FROM events WHERE event_type = 'signup' AND value >= 10),
    last_created AS (
      SELECT id, ARG_MAX(number, seq) AS number, ARG_MAX(status, seq) AS status,
             MAX(seq) AS cseq
      FROM created GROUP BY id),
    changed AS (
      SELECT CAST(user_id AS VARCHAR) AS id, event_id AS seq,
             'spent-' || CAST(CAST(FLOOR(value) AS INT) AS VARCHAR) AS status
      FROM events WHERE event_type = 'purchase'),
    late AS (
      SELECT c.id, ARG_MAX(c.status, c.seq) AS status
      FROM changed c JOIN last_created lc ON c.id = lc.id AND c.seq > lc.cseq
      GROUP BY c.id)
    SELECT lc.id, lc.number, COALESCE(late.status, lc.status) AS status
    FROM last_created lc LEFT JOIN late ON lc.id = late.id
    """,
)
def proj_work_task_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL work_task projection over synthesized domain events."""
    return project_work_task(_sim_work_task_log(spark, sf_dir))


def _sim_installation_log(spark: SparkSession, sf_dir: str) -> EventLog:
    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    fv = F.floor("value").cast("int").cast("string")
    created = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("seq"),
        uid.alias("id"),
        F.concat(F.lit("I-"), uid).alias("installationId"),
        F.when(F.col("value") >= 50, F.concat(F.lit("U-"), fv)).alias("unitAddressId"),
        F.lit("NEW").alias("status"),
        F.when(F.col("value") < 25, F.lit("low")).alias("locationRemark"),
    )
    status = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("seq"),
        uid.alias("id"),
        F.concat(F.lit("S-"), fv).alias("status"),
    )
    addr = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("seq"),
        uid.alias("id"),
        F.when(F.col("value") >= 50, F.concat(F.lit("U2-"), fv)).alias("unitAddressId"),
    )
    remark = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("seq"),
        uid.alias("id"),
        F.when(F.col("value") < 50, F.concat(F.lit("R-"), fv)).alias("locationRemark"),
    )
    return EventLog.from_typed(
        spark,
        {
            "InstallationCreated": created,
            "InstallationStatusChanged": status,
            "InstallationUnitAddressChanged": addr,
            "InstallationLocationRemarkChanged": remark,
        },
    )


@_q(
    "proj_installation_sim",
    """
    WITH created AS (
      SELECT CAST(user_id AS VARCHAR) AS id, event_id AS seq,
             'I-' || CAST(user_id AS VARCHAR) AS installation_id,
             CASE WHEN value >= 50 THEN 'U-' || CAST(CAST(FLOOR(value) AS INT) AS VARCHAR) END AS unit_address_id,
             'NEW' AS status,
             CASE WHEN value < 25 THEN 'low' END AS location_remark
      FROM events WHERE event_type = 'signup'),
    last_created AS (
      SELECT id, MAX(seq) AS cseq,
             ARG_MAX(installation_id, seq) AS installation_id,
             ARG_MAX(STRUCT_PACK(v := unit_address_id), seq)['v'] AS unit_address_id,
             ARG_MAX(status, seq) AS status,
             ARG_MAX(STRUCT_PACK(v := location_remark), seq)['v'] AS location_remark
      FROM created GROUP BY id),
    upd_status AS (
      SELECT CAST(user_id AS VARCHAR) AS id, event_id AS seq,
             'S-' || CAST(CAST(FLOOR(value) AS INT) AS VARCHAR) AS status
      FROM events WHERE event_type = 'click'),
    upd_addr AS (
      SELECT CAST(user_id AS VARCHAR) AS id, event_id AS seq,
             CASE WHEN value >= 50 THEN 'U2-' || CAST(CAST(FLOOR(value) AS INT) AS VARCHAR) END AS unit_address_id
      FROM events WHERE event_type = 'view'),
    upd_remark AS (
      SELECT CAST(user_id AS VARCHAR) AS id, event_id AS seq,
             CASE WHEN value < 50 THEN 'R-' || CAST(CAST(FLOOR(value) AS INT) AS VARCHAR) END AS location_remark
      FROM events WHERE event_type = 'error'),
    late_status AS (
      SELECT u.id, ARG_MAX(u.status, u.seq) AS status
      FROM upd_status u JOIN last_created lc ON u.id = lc.id AND u.seq > lc.cseq
      GROUP BY u.id),
    late_addr AS (
      SELECT u.id, ARG_MAX(STRUCT_PACK(v := u.unit_address_id), u.seq) AS unit_address_id
      FROM upd_addr u JOIN last_created lc ON u.id = lc.id AND u.seq > lc.cseq
      GROUP BY u.id),
    late_remark AS (
      SELECT u.id, ARG_MAX(STRUCT_PACK(v := u.location_remark), u.seq) AS location_remark
      FROM upd_remark u JOIN last_created lc ON u.id = lc.id AND u.seq > lc.cseq
      GROUP BY u.id)
    SELECT lc.id, lc.installation_id,
           CASE WHEN la.id IS NOT NULL THEN la.unit_address_id['v'] ELSE lc.unit_address_id END AS unit_address_id,
           COALESCE(ls.status, lc.status) AS status,
           CASE WHEN lr.id IS NOT NULL THEN lr.location_remark['v'] ELSE lc.location_remark END AS location_remark
    FROM last_created lc
    LEFT JOIN late_status ls ON lc.id = ls.id
    LEFT JOIN late_addr la ON lc.id = la.id
    LEFT JOIN late_remark lr ON lc.id = lr.id
    """,
)
def proj_installation_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL installation projection (null-writing updates included)."""
    return project_installation(_sim_installation_log(spark, sf_dir))


@_q(
    "stream_incremental_sim",
    """
    WITH created AS (
      SELECT CAST(user_id AS VARCHAR) AS id, event_id AS seq,
             'N-' || CAST(user_id AS VARCHAR) AS number,
             CASE WHEN value >= 10 THEN 'open' END AS status
      FROM events WHERE event_type = 'signup' AND value >= 10),
    last_created AS (
      SELECT id, ARG_MAX(number, seq) AS number, ARG_MAX(status, seq) AS status,
             MAX(seq) AS cseq
      FROM created GROUP BY id),
    changed AS (
      SELECT CAST(user_id AS VARCHAR) AS id, event_id AS seq,
             'spent-' || CAST(CAST(FLOOR(value) AS INT) AS VARCHAR) AS status
      FROM events WHERE event_type = 'purchase'),
    late AS (
      SELECT c.id, ARG_MAX(c.status, c.seq) AS status
      FROM changed c JOIN last_created lc ON c.id = lc.id AND c.seq > lc.cseq
      GROUP BY c.id)
    SELECT lc.id, lc.number, COALESCE(late.status, lc.status) AS status
    FROM last_created lc LEFT JOIN late ON lc.id = late.id
    """,
)
def stream_incremental_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The work_task projection driven through the STREAMING path: events →
    JSON envelopes → dehydrate(prefix) → incremental apply_batch(tail) →
    relational sink; returns the sink table. Must hash-match the same oracle
    as proj_work_task_sim — the batch/streaming duality (SURVEY §2.7 T2/T5)
    under the driver's correctness gate.
    """
    from open_ftth_relational_projector_spark.events.reader import (
        EventLog as _EL,
    )
    from open_ftth_relational_projector_spark.projections.core import (
        project_work_task as _pwt,
    )
    from open_ftth_relational_projector_spark.sinks import DuckDBSink
    from open_ftth_relational_projector_spark.streaming.runner import apply_batch

    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    created = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("seq"),
        F.lit("WorkTaskCreated").alias("event_type"),
        F.to_json(
            F.struct(
                uid.alias("workTaskId"),
                F.struct(
                    F.concat(F.lit("N-"), uid).alias("number"),
                    F.when(F.col("value") >= 10, F.lit("open")).alias("status"),
                ).alias("workTask"),
            )
        ).alias("payload"),
    )
    changed = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("seq"),
        F.lit("WorkTaskStatusChanged").alias("event_type"),
        F.to_json(
            F.struct(
                uid.alias("workTaskId"),
                F.concat(
                    F.lit("spent-"), F.floor("value").cast("int").cast("string")
                ).alias("status"),
            )
        ).alias("payload"),
    )
    env = created.unionByName(changed)
    max_seq = env.agg(F.max("seq")).collect()[0][0]
    cut = max_seq // 2

    sink = DuckDBSink()
    sink.ensure_schema()
    prefix = env.filter(F.col("seq") <= cut)
    sink.overwrite("work_task", _pwt(_EL.from_envelopes(prefix)))
    sink.set_meta("watermark", str(cut))
    apply_batch(env, env.filter(F.col("seq") > cut), sink, batch_id=0)

    out = sink.read_table("work_task")
    return spark.createDataFrame(out, "id string, number string, status string")


@_q(
    "proj_node_container_sim",
    """
    WITH ev AS (
      SELECT event_id AS seq, CAST(user_id AS VARCHAR) AS u, event_type, value,
             CAST(FLOOR(value) AS INT) AS fv
      FROM events),
    specs AS (
      SELECT seq, 'SP-' || CAST(fv % 20 AS VARCHAR) AS spec_id,
             'N-' || CAST(fv AS VARCHAR) AS name,
             'C-' || CAST(fv % 5 AS VARCHAR) AS category
      FROM ev WHERE event_type = 'view'),
    placed AS (
      SELECT seq, u AS id, 'RN-' || u AS route_node_id,
             'SP-' || CAST(fv % 20 AS VARCHAR) AS spec_id
      FROM ev WHERE event_type = 'signup'),
    placed_spec AS (
      SELECT p.id, p.seq, p.route_node_id, s.name AS spec_name,
             s.category AS spec_category
      FROM placed p ASOF LEFT JOIN specs s
        ON p.spec_id = s.spec_id AND p.seq > s.seq),
    last_created AS (
      SELECT id, MAX(seq) AS cseq,
             ARG_MAX(route_node_id, seq) AS route_node_id,
             ARG_MAX(STRUCT_PACK(v := spec_name), seq)['v'] AS spec_name,
             ARG_MAX(STRUCT_PACK(v := spec_category), seq)['v'] AS spec_category
      FROM placed_spec GROUP BY id),
    changed AS (
      SELECT seq, u AS id, 'SP-' || CAST(fv % 20 AS VARCHAR) AS spec_id
      FROM ev WHERE event_type = 'click' AND value >= 100),
    changed_spec AS (
      SELECT c.id, c.seq, s.name AS spec_name, s.category AS spec_category
      FROM changed c ASOF LEFT JOIN specs s
        ON c.spec_id = s.spec_id AND c.seq > s.seq),
    late AS (
      SELECT c.id,
             ARG_MAX(STRUCT_PACK(v := c.spec_name), c.seq) AS sn,
             ARG_MAX(STRUCT_PACK(v := c.spec_category), c.seq) AS sc
      FROM changed_spec c JOIN last_created lc
        ON c.id = lc.id AND c.seq > lc.cseq
      GROUP BY c.id),
    removed AS (
      SELECT u AS id, MAX(seq) AS rseq
      FROM ev WHERE event_type = 'error' AND value < 20 GROUP BY u)
    SELECT lc.id, lc.route_node_id,
           CASE WHEN late.id IS NOT NULL THEN late.sn['v'] ELSE lc.spec_name END AS spec_name,
           CASE WHEN late.id IS NOT NULL THEN late.sc['v'] ELSE lc.spec_category END AS spec_category
    FROM last_created lc
    LEFT JOIN late ON lc.id = late.id
    LEFT JOIN removed r ON lc.id = r.id
    WHERE r.id IS NULL OR r.rseq < lc.cseq
    """,
)
def proj_node_container_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL node_container projection (as-of spec joins J2, epoch fold,
    removal) over domain events synthesized from the driver events table."""
    from open_ftth_relational_projector_spark.projections.core import (
        project_node_container,
    )

    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    fv = F.floor("value").cast("int")
    seq = F.col("event_id").alias("seq")
    specs = ev.filter(F.col("event_type") == "view").select(
        seq,
        F.struct(
            F.concat(F.lit("SP-"), (fv % 20).cast("string")).alias("id"),
            F.concat(F.lit("N-"), fv.cast("string")).alias("name"),
            F.concat(F.lit("C-"), (fv % 5).cast("string")).alias("category"),
        ).alias("specification"),
    )
    placed = ev.filter(F.col("event_type") == "signup").select(
        seq,
        F.struct(
            u.alias("id"),
            F.concat(F.lit("RN-"), u).alias("routeNodeId"),
            F.concat(F.lit("SP-"), (fv % 20).cast("string")).alias(
                "specificationId"
            ),
        ).alias("container"),
    )
    changed = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") >= 100)
    ).select(
        seq,
        u.alias("nodeContainerId"),
        F.concat(F.lit("SP-"), (fv % 20).cast("string")).alias(
            "newSpecificationId"
        ),
    )
    removed = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") < 20)
    ).select(seq, u.alias("nodeContainerId"))
    log = EventLog.from_typed(
        spark,
        {
            "NodeContainerSpecificationAdded": specs,
            "NodeContainerPlacedInRouteNetwork": placed,
            "NodeContainerSpecificationChanged": changed,
            "NodeContainerRemovedFromRouteNetwork": removed,
        },
    )
    return project_node_container(log)


@_q(
    "proj_rel_interest_sim",
    """
    WITH ev AS (
      SELECT event_id AS seq, CAST(user_id AS VARCHAR) AS u, event_type, value,
             CAST(FLOOR(value) AS INT) AS fv
      FROM events),
    walks AS (
      SELECT seq, u AS interest_id,
             ['E-' || CAST((fv * 1) % 25 AS VARCHAR),
              'E-' || CAST((fv * 2) % 25 AS VARCHAR),
              'E-' || CAST((fv * 3) % 25 AS VARCHAR),
              'E-' || CAST((fv * 4) % 25 AS VARCHAR),
              'E-' || CAST((fv * 5) % 25 AS VARCHAR)] AS walk
      FROM ev WHERE event_type = 'signup'
      UNION ALL
      SELECT seq, u,
             ['E-' || CAST((fv * 2) % 25 AS VARCHAR),
              'E-' || CAST((fv * 3) % 25 AS VARCHAR),
              'E-' || CAST((fv * 5) % 25 AS VARCHAR),
              'E-' || CAST((fv * 7) % 25 AS VARCHAR)]
      FROM ev WHERE event_type = 'view' AND value >= 30),
    lastw AS (
      SELECT interest_id, MAX(seq) AS seq, ARG_MAX(walk, seq) AS walk
      FROM walks GROUP BY interest_id),
    unreg AS (
      SELECT u AS interest_id, MAX(seq) AS rseq
      FROM ev WHERE event_type = 'error' AND value < 10 GROUP BY u),
    live AS (
      SELECT l.interest_id,
             list_filter(l.walk, (x, i) -> list_position(l.walk, x) = i) AS walk
      FROM lastw l LEFT JOIN unreg r ON l.interest_id = r.interest_id
      WHERE r.interest_id IS NULL OR r.rseq < l.seq)
    SELECT interest_id, walk[g.i] AS route_network_element_id,
           CAST(g.i AS INT) AS seq_no
    FROM live, UNNEST(generate_series(1, len(walk))) AS g(i)
    """,
)
def proj_rel_interest_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL rel_interest_to_route_element projection (A3 order-preserving
    dedup + W1/X1 posexplode seq_no + unregister) on synthesized walks."""
    from open_ftth_relational_projector_spark.projections.core import (
        project_rel_interest_to_route_element,
    )

    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    fv = F.floor("value").cast("int")
    seq = F.col("event_id").alias("seq")

    def elem(mult: int):
        return F.concat(F.lit("E-"), ((fv * mult) % 25).cast("string"))

    reg = ev.filter(F.col("event_type") == "signup").select(
        seq,
        F.struct(
            u.alias("id"),
            F.array(elem(1), elem(2), elem(3), elem(4), elem(5)).alias(
                "routeNetworkElementRefs"
            ),
        ).alias("interest"),
    )
    mod = ev.filter(
        (F.col("event_type") == "view") & (F.col("value") >= 30)
    ).select(
        seq,
        u.alias("interestId"),
        F.array(elem(2), elem(3), elem(5), elem(7)).alias(
            "routeNetworkElementIds"
        ),
    )
    unreg = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") < 10)
    ).select(seq, u.alias("interestId"))
    log = EventLog.from_typed(
        spark,
        {
            "WalkOfInterestRegistered": reg,
            "WalkOfInterestRouteNetworkElementsModified": mod,
            "InterestUnregistered": unreg,
        },
    )
    return project_rel_interest_to_route_element(log)


@_q(
    "proj_service_termination_sim",
    """
    WITH ev AS (
      SELECT event_id AS seq, CAST(user_id AS VARCHAR) AS u, event_type, value,
             CAST(FLOOR(value) AS INT) AS fv
      FROM events),
    tspec AS (
      SELECT seq, 'TS-' || CAST(fv % 10 AS VARCHAR) AS spec_id,
             (fv % 2 = 0) AS is_cust
      FROM ev WHERE event_type = 'view'),
    ncrel AS (
      SELECT seq, 'NC-' || u AS cid, 'RN-' || CAST(fv % 40 AS VARCHAR) AS rn
      FROM ev WHERE event_type = 'signup'
      UNION ALL
      SELECT seq, 'NC-' || u, NULL
      FROM ev WHERE event_type = 'error' AND value >= 400),
    placed AS (
      SELECT seq, u || '-' || CAST(seq % 2 AS VARCHAR) AS id,
             'T-' || CAST(fv AS VARCHAR) AS name,
             'TS-' || CAST(fv % 10 AS VARCHAR) AS spec_id, 'NC-' || u AS cid,
             CASE WHEN fv >= 200 THEN 'AA-' || CAST(fv AS VARCHAR) END AS access_address_id,
             CASE WHEN fv % 3 = 0 THEN 'UA-' || CAST(fv AS VARCHAR) END AS unit_address_id
      FROM ev WHERE event_type = 'purchase'),
    placed_q AS (
      SELECT p.id, p.seq, p.name, p.access_address_id, p.unit_address_id,
             r.rn AS route_node_id
      FROM placed p
      ASOF LEFT JOIN tspec s ON p.spec_id = s.spec_id AND p.seq > s.seq
      ASOF LEFT JOIN ncrel r ON p.cid = r.cid AND p.seq > r.seq
      WHERE s.is_cust AND r.rn IS NOT NULL),
    last_created AS (
      SELECT id, MAX(seq) AS cseq,
             ARG_MAX(route_node_id, seq) AS route_node_id,
             ARG_MAX(name, seq) AS name,
             ARG_MAX(STRUCT_PACK(v := access_address_id), seq)['v'] AS access_address_id,
             ARG_MAX(STRUCT_PACK(v := unit_address_id), seq)['v'] AS unit_address_id
      FROM placed_q GROUP BY id),
    renamed AS (
      SELECT seq, u || '-0' AS id, 'TN-' || CAST(fv AS VARCHAR) AS name
      FROM ev WHERE event_type = 'click' AND value < 50),
    late_name AS (
      SELECT c.id, ARG_MAX(c.name, c.seq) AS name
      FROM renamed c JOIN last_created lc ON c.id = lc.id AND c.seq > lc.cseq
      GROUP BY c.id),
    readdr AS (
      SELECT seq, u || '-1' AS id,
             CASE WHEN fv % 2 = 0 THEN 'AB-' || CAST(fv AS VARCHAR) END AS access_address_id,
             CAST(NULL AS VARCHAR) AS unit_address_id
      FROM ev WHERE event_type = 'click' AND value >= 50 AND value < 100),
    late_addr AS (
      SELECT c.id,
             ARG_MAX(STRUCT_PACK(v := c.access_address_id), c.seq) AS aa,
             ARG_MAX(STRUCT_PACK(v := c.unit_address_id), c.seq) AS ua
      FROM readdr c JOIN last_created lc ON c.id = lc.id AND c.seq > lc.cseq
      GROUP BY c.id),
    removed AS (
      SELECT u || '-0' AS id, MAX(seq) AS rseq
      FROM ev WHERE event_type = 'error' AND value < 15 GROUP BY u)
    SELECT lc.id, lc.route_node_id,
           COALESCE(ln.name, lc.name) AS name,
           CASE WHEN la.id IS NOT NULL THEN la.aa['v'] ELSE lc.access_address_id END AS access_address_id,
           CASE WHEN la.id IS NOT NULL THEN la.ua['v'] ELSE lc.unit_address_id END AS unit_address_id
    FROM last_created lc
    LEFT JOIN late_name ln ON lc.id = ln.id
    LEFT JOIN late_addr la ON lc.id = la.id
    LEFT JOIN removed r ON lc.id = r.id
    WHERE r.id IS NULL OR r.rseq < lc.cseq
    """,
)
def proj_service_termination_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL service_termination projection: J3 spec semi-join filter,
    J4 container→route-node as-of relation (with removal tombstones),
    P5 give-up guards, P7 nullable addresses, epoch fold + removal."""
    from open_ftth_relational_projector_spark.projections.core import (
        project_service_termination,
    )

    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    fv = F.floor("value").cast("int")
    seq = F.col("event_id").alias("seq")
    tspec = ev.filter(F.col("event_type") == "view").select(
        seq,
        F.struct(
            F.concat(F.lit("TS-"), (fv % 10).cast("string")).alias("id"),
            (fv % 2 == 0).alias("isCustomerTermination"),
        ).alias("specification"),
    )
    nc_placed = ev.filter(F.col("event_type") == "signup").select(
        seq,
        F.struct(
            F.concat(F.lit("NC-"), u).alias("id"),
            F.concat(F.lit("RN-"), (fv % 40).cast("string")).alias("routeNodeId"),
            F.lit("SP-x").alias("specificationId"),
        ).alias("container"),
    )
    nc_removed = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 400)
    ).select(seq, F.concat(F.lit("NC-"), u).alias("nodeContainerId"))
    te_placed = ev.filter(F.col("event_type") == "purchase").select(
        seq,
        F.struct(
            F.concat(u, F.lit("-"), (F.col("event_id") % 2).cast("string")).alias(
                "id"
            ),
            F.concat(F.lit("T-"), fv.cast("string")).alias("name"),
            F.concat(F.lit("TS-"), (fv % 10).cast("string")).alias(
                "specificationId"
            ),
            F.concat(F.lit("NC-"), u).alias("nodeContainerId"),
            F.struct(
                F.when(
                    fv >= 200, F.concat(F.lit("AA-"), fv.cast("string"))
                ).alias("accessAddressId"),
                F.when(
                    fv % 3 == 0, F.concat(F.lit("UA-"), fv.cast("string"))
                ).alias("unitAddressId"),
            ).alias("addressInfo"),
        ).alias("equipment"),
    )
    renamed = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") < 50)
    ).select(
        seq,
        F.concat(u, F.lit("-0")).alias("terminalEquipmentId"),
        F.struct(
            F.concat(F.lit("TN-"), fv.cast("string")).alias("name")
        ).alias("namingInfo"),
    )
    readdr = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("value") >= 50)
        & (F.col("value") < 100)
    ).select(
        seq,
        F.concat(u, F.lit("-1")).alias("terminalEquipmentId"),
        F.struct(
            F.when(fv % 2 == 0, F.concat(F.lit("AB-"), fv.cast("string"))).alias(
                "accessAddressId"
            ),
            F.lit(None).cast("string").alias("unitAddressId"),
        ).alias("addressInfo"),
    )
    te_removed = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") < 15)
    ).select(seq, F.concat(u, F.lit("-0")).alias("terminalEquipmentId"))
    log = EventLog.from_typed(
        spark,
        {
            "TerminalEquipmentSpecificationAdded": tspec,
            "NodeContainerPlacedInRouteNetwork": nc_placed,
            "NodeContainerRemovedFromRouteNetwork": nc_removed,
            "TerminalEquipmentPlacedInNodeContainer": te_placed,
            "TerminalEquipmentNamingInfoChanged": renamed,
            "TerminalEquipmentAddressInfoChanged": readdr,
            "TerminalEquipmentRemoved": te_removed,
        },
    )
    return project_service_termination(log)


@_q(
    "proj_span_equipment_sim",
    """
    WITH ev AS (
      SELECT event_id AS seq, CAST(user_id AS VARCHAR) AS u, event_type, value,
             CAST(FLOOR(value) AS INT) AS fv
      FROM events),
    span_spec AS (
      SELECT seq, 'SS-' || CAST(fv % 8 AS VARCHAR) AS spec_id,
             CASE WHEN fv % 3 = 0 THEN 'N-Ø12-' || CAST(fv AS VARCHAR)
                  ELSE 'N-' || CAST(fv AS VARCHAR) END AS spec_name,
             'ST-' || CAST(fv % 6 AS VARCHAR) AS struct_spec_id
      FROM ev WHERE event_type = 'view'),
    struct_spec AS (
      SELECT seq, 'ST-' || CAST(fv % 6 AS VARCHAR) AS struct_spec_id,
             fv AS outer_diameter
      FROM ev WHERE event_type = 'error' AND value < 100),
    placed AS (
      SELECT seq, u AS id, 'E-' || u AS name,
             'SS-' || CAST(fv % 8 AS VARCHAR) AS spec_id,
             'W-' || u AS interest_id, (fv % 2 = 1) AS is_cable,
             CASE WHEN fv >= 250 THEN 'AA-' || CAST(fv AS VARCHAR) END AS access_address_id,
             CASE WHEN fv % 5 = 0 THEN 'UA-' || CAST(fv AS VARCHAR) END AS unit_address_id
      FROM ev WHERE event_type = 'signup'),
    placed_spec AS (
      SELECT p.*, s.spec_name, s.struct_spec_id
      FROM placed p ASOF LEFT JOIN span_spec s
        ON p.spec_id = s.spec_id AND p.seq > s.seq),
    placed_full AS (
      SELECT p.*, st.outer_diameter
      FROM placed_spec p ASOF LEFT JOIN struct_spec st
        ON p.struct_spec_id = st.struct_spec_id AND p.seq > st.seq),
    last_created AS (
      SELECT id, MAX(seq) AS cseq,
             ARG_MAX(name, seq) AS name,
             ARG_MAX(interest_id, seq) AS interest_id,
             ARG_MAX(is_cable, seq) AS is_cable,
             ARG_MAX(STRUCT_PACK(v := spec_name), seq)['v'] AS spec_name,
             ARG_MAX(STRUCT_PACK(v := outer_diameter), seq)['v'] AS outer_diameter,
             ARG_MAX(STRUCT_PACK(v := access_address_id), seq)['v'] AS access_address_id,
             ARG_MAX(STRUCT_PACK(v := unit_address_id), seq)['v'] AS unit_address_id
      FROM placed_full GROUP BY id),
    spec_changed AS (
      SELECT seq, u AS id, 'SS-' || CAST(fv % 8 AS VARCHAR) AS spec_id
      FROM ev WHERE event_type = 'purchase' AND value >= 300),
    changed_full AS (
      SELECT c.id, c.seq, s.spec_name, st.outer_diameter
      FROM spec_changed c
      ASOF LEFT JOIN span_spec s ON c.spec_id = s.spec_id AND c.seq > s.seq
      ASOF LEFT JOIN struct_spec st
        ON s.struct_spec_id = st.struct_spec_id AND c.seq > st.seq),
    late_spec AS (
      SELECT c.id,
             ARG_MAX(STRUCT_PACK(v := c.spec_name), c.seq) AS sn,
             ARG_MAX(STRUCT_PACK(v := c.outer_diameter), c.seq) AS od
      FROM changed_full c JOIN last_created lc
        ON c.id = lc.id AND c.seq > lc.cseq
      GROUP BY c.id),
    readdr AS (
      SELECT seq, u AS id,
             CASE WHEN fv % 2 = 0 THEN 'AB-' || CAST(fv AS VARCHAR) END AS access_address_id,
             CASE WHEN fv % 7 = 0 THEN 'UB-' || CAST(fv AS VARCHAR) END AS unit_address_id
      FROM ev WHERE event_type = 'click' AND value >= 120),
    late_addr AS (
      SELECT c.id,
             ARG_MAX(STRUCT_PACK(v := c.access_address_id), c.seq) AS aa,
             ARG_MAX(STRUCT_PACK(v := c.unit_address_id), c.seq) AS ua
      FROM readdr c JOIN last_created lc ON c.id = lc.id AND c.seq > lc.cseq
      GROUP BY c.id),
    removed AS (
      SELECT u AS id, MAX(seq) AS rseq
      FROM ev WHERE event_type = 'error' AND value >= 450 GROUP BY u)
    SELECT lc.id, lc.interest_id,
           CASE WHEN ls.id IS NOT NULL THEN ls.od['v'] ELSE lc.outer_diameter END AS outer_diameter,
           lc.is_cable, lc.name,
           CASE WHEN ls.id IS NOT NULL THEN ls.sn['v'] ELSE lc.spec_name END AS spec_name,
           CASE WHEN la.id IS NOT NULL THEN la.aa['v'] ELSE lc.access_address_id END AS access_address_id,
           CASE WHEN la.id IS NOT NULL THEN la.ua['v'] ELSE lc.unit_address_id END AS unit_address_id
    FROM last_created lc
    LEFT JOIN late_spec ls ON lc.id = ls.id
    LEFT JOIN late_addr la ON lc.id = la.id
    LEFT JOIN removed r ON lc.id = r.id
    WHERE r.id IS NULL OR r.rseq < lc.cseq
    """,
)
def proj_span_equipment_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL span_equipment projection: J1 chained as-of spec joins
    (equipment spec → root-structure spec → outer diameter), P1 wide-payload
    projection, P7 nullable addresses, A2 field-wise epoch fold, removal."""
    from open_ftth_relational_projector_spark.projections.core import (
        project_span_equipment,
    )
    from open_ftth_relational_projector_spark.operators.arrays import EMPTY_GUID

    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    fv = F.floor("value").cast("int")
    seq = F.col("event_id").alias("seq")
    span_spec = ev.filter(F.col("event_type") == "view").select(
        seq,
        F.struct(
            F.concat(F.lit("SS-"), (fv % 8).cast("string")).alias("id"),
            F.when(
                fv % 3 == 0, F.concat(F.lit("N-Ø12-"), fv.cast("string"))
            )
            .otherwise(F.concat(F.lit("N-"), fv.cast("string")))
            .alias("name"),
            (fv % 2 == 0).alias("isCable"),
            F.struct(
                F.concat(F.lit("ST-"), (fv % 6).cast("string")).alias(
                    "spanStructureSpecificationId"
                )
            ).alias("rootTemplate"),
        ).alias("specification"),
    )
    struct_spec = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") < 100)
    ).select(
        seq,
        F.struct(
            F.concat(F.lit("ST-"), (fv % 6).cast("string")).alias("id"),
            fv.alias("outerDiameter"),
        ).alias("specification"),
    )
    seg = F.struct(
        F.concat(F.lit("SEG-"), u).alias("id"),
        F.lit(0).alias("fromNodeOfInterestIndex"),
        F.lit(2).alias("toNodeOfInterestIndex"),
        F.when(fv % 4 == 0, F.concat(F.lit("T-"), fv.cast("string")))
        .otherwise(F.lit(EMPTY_GUID))
        .alias("fromTerminalId"),
        F.when(fv % 4 == 1, F.concat(F.lit("T-"), fv.cast("string")))
        .otherwise(F.lit(EMPTY_GUID))
        .alias("toTerminalId"),
    )
    hop_t = (
        "array<struct<fromNodeId:string,toNodeId:string,"
        "parentAffixes:array<struct<spanSegmentId:string>>>>"
    )
    placed = ev.filter(F.col("event_type") == "signup").select(
        seq,
        F.struct(
            u.alias("id"),
            F.concat(F.lit("E-"), u).alias("name"),
            F.concat(F.lit("SS-"), (fv % 8).cast("string")).alias(
                "specificationId"
            ),
            F.concat(F.lit("W-"), u).alias("walkOfInterestId"),
            F.array(
                F.concat(F.lit("ND-"), (fv % 50).cast("string")),
                F.concat(F.lit("ND-"), ((fv + 1) % 50).cast("string")),
                F.concat(F.lit("ND-"), ((fv + 2) % 50).cast("string")),
            ).alias("nodesOfInterestIds"),
            (fv % 2 == 1).alias("isCable"),
            F.array(F.struct(F.array(seg).alias("spanSegments"))).alias(
                "spanStructures"
            ),
            F.lit(None).cast(hop_t).alias("utilityNetworkHops"),
            F.struct(
                F.when(
                    fv >= 250, F.concat(F.lit("AA-"), fv.cast("string"))
                ).alias("accessAddressId"),
                F.when(
                    fv % 5 == 0, F.concat(F.lit("UA-"), fv.cast("string"))
                ).alias("unitAddressId"),
            ).alias("addressInfo"),
        ).alias("equipment"),
    )
    spec_changed = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 300)
    ).select(
        seq,
        u.alias("spanEquipmentId"),
        F.concat(F.lit("SS-"), (fv % 8).cast("string")).alias(
            "newSpecificationId"
        ),
    )
    readdr = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") >= 120)
    ).select(
        seq,
        u.alias("spanEquipmentId"),
        F.struct(
            F.when(fv % 2 == 0, F.concat(F.lit("AB-"), fv.cast("string"))).alias(
                "accessAddressId"
            ),
            F.when(fv % 7 == 0, F.concat(F.lit("UB-"), fv.cast("string"))).alias(
                "unitAddressId"
            ),
        ).alias("addressInfo"),
    )
    removed = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 450)
    ).select(seq, u.alias("spanEquipmentId"))
    log = EventLog.from_typed(
        spark,
        {
            "SpanEquipmentSpecificationAdded": span_spec,
            "SpanStructureSpecificationAdded": struct_spec,
            "SpanEquipmentPlacedInRouteNetwork": placed,
            "SpanEquipmentSpecificationChanged": spec_changed,
            "SpanEquipmentAddressInfoChanged": readdr,
            "SpanEquipmentRemoved": removed,
        },
    )
    return project_span_equipment(log)


@_q(
    "proj_conduit_slack_sim",
    """
    WITH ev AS (
      SELECT event_id AS seq, CAST(user_id AS VARCHAR) AS u, event_type, value,
             CAST(FLOOR(value) AS INT) AS fv
      FROM events),
    span_spec AS (
      SELECT seq, 'SS-' || CAST(fv % 8 AS VARCHAR) AS spec_id,
             CASE WHEN fv % 3 = 0 THEN 'N-Ø12-' || CAST(fv AS VARCHAR)
                  ELSE 'N-' || CAST(fv AS VARCHAR) END AS spec_name
      FROM ev WHERE event_type = 'view'),
    placed AS (
      SELECT seq, u AS id, 'SS-' || CAST(fv % 8 AS VARCHAR) AS spec_id,
             'ND-' || CAST(fv % 50 AS VARCHAR) AS from_node,
             'ND-' || CAST((fv + 2) % 50 AS VARCHAR) AS to_node,
             (fv % 4 = 0) AS from_conn, (fv % 4 = 1) AS to_conn
      FROM ev WHERE event_type = 'signup'),
    placed_spec AS (
      SELECT p.*,
             COALESCE(CONTAINS(LOWER(s.spec_name), 'ø12'), FALSE) AS is_cc
      FROM placed p ASOF LEFT JOIN span_spec s
        ON p.spec_id = s.spec_id AND p.seq > s.seq),
    last_created AS (
      SELECT id, MAX(seq) AS cseq,
             ARG_MAX(from_node, seq) AS from_node,
             ARG_MAX(to_node, seq) AS to_node,
             ARG_MAX(from_conn, seq) AS from_conn,
             ARG_MAX(to_conn, seq) AS to_conn,
             ARG_MAX(is_cc, seq) AS is_cc
      FROM placed_spec GROUP BY id),
    moved AS (
      SELECT seq, u AS id,
             'NM-' || CAST(fv % 50 AS VARCHAR) AS from_node,
             'NM-' || CAST((fv + 3) % 50 AS VARCHAR) AS to_node
      FROM ev WHERE event_type = 'click' AND value < 80),
    late_moved AS (
      SELECT m.id, ARG_MAX(m.from_node, m.seq) AS from_node,
             ARG_MAX(m.to_node, m.seq) AS to_node
      FROM moved m JOIN last_created lc ON m.id = lc.id AND m.seq > lc.cseq
      GROUP BY m.id),
    removed AS (
      SELECT u AS id, MAX(seq) AS rseq
      FROM ev WHERE event_type = 'error' AND value >= 450 GROUP BY u),
    live AS (
      SELECT lc.id, lc.from_conn, lc.to_conn,
             COALESCE(lm.from_node, lc.from_node) AS from_node,
             COALESCE(lm.to_node, lc.to_node) AS to_node
      FROM last_created lc
      LEFT JOIN late_moved lm ON lc.id = lm.id
      LEFT JOIN removed r ON lc.id = r.id
      WHERE (r.id IS NULL OR r.rseq < lc.cseq) AND lc.is_cc),
    ends AS (
      SELECT from_node AS route_node_id FROM live WHERE NOT from_conn
      UNION ALL
      SELECT to_node FROM live WHERE NOT to_conn),
    counts AS (
      SELECT route_node_id, CAST(COUNT(*) AS INT) AS number_of_ends
      FROM ends GROUP BY route_node_id)
    SELECT substr(md5(route_node_id),1,8) || '-' || substr(md5(route_node_id),9,4)
           || '-' || substr(md5(route_node_id),13,4) || '-' || substr(md5(route_node_id),17,4)
           || '-' || substr(md5(route_node_id),21,12) AS id,
           route_node_id, number_of_ends
    FROM counts
    """,
)
def proj_conduit_slack_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL conduit_slack projection: P2 ø12 customer-conduit heuristic
    (frozen at placement), P4 nested from/to connection scan, P8 first/last
    node of interest (moved events re-point the ends), A1 count-per-node
    with delete-at-zero, X6 deterministic md5-uuid replacement."""
    from open_ftth_relational_projector_spark.projections.core import (
        project_conduit_slack,
    )
    from open_ftth_relational_projector_spark.operators.arrays import EMPTY_GUID

    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    fv = F.floor("value").cast("int")
    seq = F.col("event_id").alias("seq")
    span_spec = ev.filter(F.col("event_type") == "view").select(
        seq,
        F.struct(
            F.concat(F.lit("SS-"), (fv % 8).cast("string")).alias("id"),
            F.when(
                fv % 3 == 0, F.concat(F.lit("N-Ø12-"), fv.cast("string"))
            )
            .otherwise(F.concat(F.lit("N-"), fv.cast("string")))
            .alias("name"),
            (fv % 2 == 0).alias("isCable"),
            F.struct(
                F.lit("ST-0").alias("spanStructureSpecificationId")
            ).alias("rootTemplate"),
        ).alias("specification"),
    )
    seg = F.struct(
        F.concat(F.lit("SEG-"), u).alias("id"),
        F.lit(0).alias("fromNodeOfInterestIndex"),
        F.lit(2).alias("toNodeOfInterestIndex"),
        F.when(fv % 4 == 0, F.concat(F.lit("T-"), fv.cast("string")))
        .otherwise(F.lit(EMPTY_GUID))
        .alias("fromTerminalId"),
        F.when(fv % 4 == 1, F.concat(F.lit("T-"), fv.cast("string")))
        .otherwise(F.lit(EMPTY_GUID))
        .alias("toTerminalId"),
    )
    hop_t = (
        "array<struct<fromNodeId:string,toNodeId:string,"
        "parentAffixes:array<struct<spanSegmentId:string>>>>"
    )
    placed = ev.filter(F.col("event_type") == "signup").select(
        seq,
        F.struct(
            u.alias("id"),
            F.concat(F.lit("E-"), u).alias("name"),
            F.concat(F.lit("SS-"), (fv % 8).cast("string")).alias(
                "specificationId"
            ),
            F.concat(F.lit("W-"), u).alias("walkOfInterestId"),
            F.array(
                F.concat(F.lit("ND-"), (fv % 50).cast("string")),
                F.concat(F.lit("ND-"), ((fv + 1) % 50).cast("string")),
                F.concat(F.lit("ND-"), ((fv + 2) % 50).cast("string")),
            ).alias("nodesOfInterestIds"),
            (fv % 2 == 1).alias("isCable"),
            F.array(F.struct(F.array(seg).alias("spanSegments"))).alias(
                "spanStructures"
            ),
            F.lit(None).cast(hop_t).alias("utilityNetworkHops"),
            F.struct(
                F.lit(None).cast("string").alias("accessAddressId"),
                F.lit(None).cast("string").alias("unitAddressId"),
            ).alias("addressInfo"),
        ).alias("equipment"),
    )
    moved = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") < 80)
    ).select(
        seq,
        u.alias("spanEquipmentId"),
        F.array(
            F.concat(F.lit("NM-"), (fv % 50).cast("string")),
            F.concat(F.lit("NM-"), ((fv + 3) % 50).cast("string")),
        ).alias("nodesOfInterestIds"),
    )
    removed = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 450)
    ).select(seq, u.alias("spanEquipmentId"))
    log = EventLog.from_typed(
        spark,
        {
            "SpanEquipmentSpecificationAdded": span_spec,
            "SpanEquipmentPlacedInRouteNetwork": placed,
            "SpanEquipmentMoved": moved,
            "SpanEquipmentRemoved": removed,
        },
    )
    return project_conduit_slack(log)


@_q(
    "walk_hop_subtract_sim",
    """
    WITH ev AS (
      SELECT event_id AS seq, CAST(user_id AS VARCHAR) AS u, value,
             CAST(FLOOR(value) AS INT) AS fv,
             CAST(FLOOR(value / 7) AS INT) AS fv7
      FROM events WHERE event_type = 'signup'),
    latest AS (
      SELECT u, ARG_MAX(fv, seq) AS fv, ARG_MAX(fv7, seq) AS fv7
      FROM ev GROUP BY u),
    hops AS (
      SELECT u, fv % 5 AS i,
             (fv % 5) + 1 + (fv7 % (5 - (fv % 5))) AS j
      FROM latest),
    elems AS (
      SELECT h.u, g.k,
             'W-' || h.u || '-' || CAST(g.k AS VARCHAR) AS element
      FROM hops h, UNNEST(generate_series(0, 5)) AS g(k)
      WHERE g.k < h.i OR g.k >= h.j)
    SELECT u AS walk_id, element AS route_network_element_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY k) AS INT) AS seq_no
    FROM elems
    """,
)
def walk_hop_subtract_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 walk ⊖ hop-interval subtraction (the one custom operator) under
    the driver oracle gate: one hop per walk, hop = [walk[i], walk[j]) with
    i < j, so the position arithmetic is SQL-expressible. Stack-discipline
    multi-hop cases are pinned by tests/test_walk_hops.py."""
    from open_ftth_relational_projector_spark.operators.explode_seq import (
        explode_with_seq,
    )
    from open_ftth_relational_projector_spark.operators.walk_hops import (
        subtract_hops,
    )

    ev = load_table(spark, sf_dir, "events")
    sig = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").cast("string").alias("walk_id"),
        F.col("event_id").alias("seq"),
        F.floor("value").cast("int").alias("fv"),
        F.floor(F.col("value") / 7).cast("int").alias("fv7"),
    )
    latest = latest_by_key(sig, "walk_id")
    i = F.col("fv") % 5
    j = i + 1 + (F.col("fv7") % (5 - i))
    mk = lambda k: F.concat(  # noqa: E731
        F.lit("W-"), F.col("walk_id"), F.lit("-"), k.cast("string")
    )
    hopped = latest.select(
        "walk_id",
        F.array(*[mk(F.lit(k)) for k in range(6)]).alias("walk"),
        F.array(
            F.struct(
                mk(i).alias("from_node_id"), mk(j).alias("to_node_id")
            )
        ).alias("hops"),
    )
    reduced = hopped.select(
        "walk_id", subtract_hops(F.col("walk"), F.col("hops")).alias("elements")
    )
    return explode_with_seq(
        reduced, "walk_id", "elements", "route_network_element_id"
    )


@_q(
    "walk_hop_multi_sim",
    """
    WITH RECURSIVE ev AS (
      SELECT event_id AS seq, CAST(user_id AS VARCHAR) AS u, value,
             CAST(FLOOR(value) AS INT) AS fv,
             CAST(FLOOR(value / 7) AS INT) AS fv7,
             CAST(FLOOR(value / 11) AS INT) AS fv11
      FROM events WHERE event_type = 'signup'),
    latest AS (
      SELECT u, ARG_MAX(fv, seq) AS fv, ARG_MAX(fv7, seq) AS fv7,
             ARG_MAX(fv11, seq) AS fv11
      FROM ev GROUP BY u),
    pos AS (
      SELECT u, fv, fv % 3 AS a,
             (fv % 3) + 1 + (fv7 % 2) AS b
      FROM latest),
    pos2 AS (
      SELECT p.u, p.fv, l.fv11, p.a, p.b, p.b + (p.fv % 2) AS c
      FROM pos p JOIN latest l ON p.u = l.u),
    input AS (
      SELECT u AS walk_id,
             list_transform(generate_series(0, 7),
                            k -> 'W-' || u || '-' || CAST(k AS VARCHAR)) AS walk,
             [{'f': CASE WHEN fv % 5 = 0 THEN 'MISS'
                         ELSE 'W-' || u || '-' || CAST(a AS VARCHAR) END,
               't': 'W-' || u || '-' || CAST(b AS VARCHAR)},
              {'f': 'W-' || u || '-' || CAST(c AS VARCHAR),
               't': CASE WHEN fv % 7 = 0 THEN 'GONE'
                         ELSE 'W-' || u || '-' || CAST(c + 1 + (fv11 % 2) AS VARCHAR) END}
             ] AS hops
      FROM pos2),
    scan AS (
      SELECT walk_id, walk, hops, 0 AS pos, 0 AS hop_idx,
             CAST(NULL AS VARCHAR) AS skip_to, CAST([] AS VARCHAR[]) AS kept
      FROM input
      UNION ALL
      SELECT walk_id, walk, hops, pos + 1,
             hop_idx + CASE WHEN NOT in_skip AND starts THEN 1 ELSE 0 END,
             CASE WHEN in_skip THEN skip_to
                  WHEN starts THEN hops[hop_idx + 1]['t']
                  ELSE NULL END,
             CASE WHEN in_skip OR starts THEN kept ELSE list_append(kept, x) END
      FROM (
        SELECT *, walk[pos + 1] AS x,
               (skip_to IS NOT NULL AND walk[pos + 1] != skip_to) AS in_skip,
               (NOT (skip_to IS NOT NULL AND walk[pos + 1] != skip_to)
                AND hop_idx < len(hops)
                AND hops[hop_idx + 1]['f'] = walk[pos + 1]) AS starts
        FROM scan WHERE pos < len(walk)) s),
    final AS (
      SELECT walk_id, kept FROM scan WHERE pos = len(walk))
    SELECT walk_id, kept[g.i] AS route_network_element_id,
           CAST(g.i AS INT) AS seq_no
    FROM final, UNNEST(generate_series(1, len(kept))) AS g(i)
    """,
)
def walk_hop_multi_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 multi-hop STACK semantics under the driver gate: two ordered hops
    per walk, including blocked-stack (hop1.from absent ⇒ hop2 never
    consumed), tail-drop (hop2.to absent ⇒ rest of walk skipped), and
    to-element-starts-next-hop (c == b). The DuckDB oracle is a recursive
    CTE transcription of the same stack machine — an independent
    implementation, not shared code."""
    from open_ftth_relational_projector_spark.operators.explode_seq import (
        explode_with_seq,
    )
    from open_ftth_relational_projector_spark.operators.walk_hops import (
        subtract_hops,
    )

    ev = load_table(spark, sf_dir, "events")
    sig = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").cast("string").alias("walk_id"),
        F.col("event_id").alias("seq"),
        F.floor("value").cast("int").alias("fv"),
        F.floor(F.col("value") / 7).cast("int").alias("fv7"),
        F.floor(F.col("value") / 11).cast("int").alias("fv11"),
    )
    latest = latest_by_key(sig, "walk_id")
    fv, fv7, fv11 = F.col("fv"), F.col("fv7"), F.col("fv11")
    a = fv % 3
    b = a + 1 + (fv7 % 2)
    c = b + (fv % 2)
    d = c + 1 + (fv11 % 2)
    mk = lambda k: F.concat(  # noqa: E731
        F.lit("W-"), F.col("walk_id"), F.lit("-"), k.cast("string")
    )
    hop1 = F.struct(
        F.when(fv % 5 == 0, F.lit("MISS")).otherwise(mk(a)).alias("from_node_id"),
        mk(b).alias("to_node_id"),
    )
    hop2 = F.struct(
        mk(c).alias("from_node_id"),
        F.when(fv % 7 == 0, F.lit("GONE")).otherwise(mk(d)).alias("to_node_id"),
    )
    hopped = latest.select(
        "walk_id",
        F.array(*[mk(F.lit(k)) for k in range(8)]).alias("walk"),
        F.array(hop1, hop2).alias("hops"),
    )
    reduced = hopped.select(
        "walk_id", subtract_hops(F.col("walk"), F.col("hops")).alias("elements")
    )
    return explode_with_seq(
        reduced, "walk_id", "elements", "route_network_element_id"
    )


@_q(
    "proj_rel_fiber_cable_sim",
    """
    WITH ev AS (
      SELECT event_id AS eid, CAST(user_id AS VARCHAR) AS u, event_type, value,
             CAST(FLOOR(value) AS INT) AS fv,
             CAST(FLOOR(value / 7) AS INT) AS fv7
      FROM events),
    spec AS (
      SELECT 2 * eid AS seq, 'SS-' || CAST(fv % 8 AS VARCHAR) AS spec_id,
             (fv % 2 = 0) AS is_cable
      FROM ev WHERE event_type = 'view'),
    placed AS (
      SELECT 2 * eid + 1 AS seq, u, 'SS-' || CAST(fv % 8 AS VARCHAR) AS spec_id
      FROM ev WHERE event_type = 'signup'),
    placed_spec AS (
      SELECT p.seq, p.u, COALESCE(s.is_cable, FALSE) AS spec_is_cable
      FROM placed p ASOF LEFT JOIN spec s
        ON p.spec_id = s.spec_id AND p.seq > s.seq),
    first_place AS (SELECT u, MIN(seq) AS pseq FROM placed GROUP BY u),
    aff AS (
      SELECT 2 * a.eid AS seq, a.u,
             CASE WHEN a.fv % 5 = 0 THEN NULL ELSE a.fv % 4 END AS hop_i,
             (a.fv % 4) + 1 + (a.fv7 % (5 - (a.fv % 4))) AS hop_j
      FROM ev a JOIN first_place fp ON a.u = fp.u AND 2 * a.eid > fp.pseq
      WHERE a.event_type = 'purchase' AND a.fv % 3 = 0),
    det AS (
      SELECT 2 * e.eid AS seq, e.u,
             CAST(NULL AS INT) AS hop_i, CAST(NULL AS INT) AS hop_j
      FROM ev e JOIN first_place fp ON e.u = fp.u AND 2 * e.eid > fp.pseq
      WHERE e.event_type = 'error' AND e.fv % 5 = 1),
    trig AS (
      SELECT u, seq, hop_i, hop_j FROM aff
      UNION ALL SELECT u, seq, hop_i, hop_j FROM det
      UNION ALL SELECT u, seq, CAST(NULL AS INT), CAST(NULL AS INT)
      FROM placed_spec WHERE spec_is_cable),
    win AS (
      SELECT u, seq AS tseq, hop_i, hop_j FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY u ORDER BY seq DESC) AS rn
        FROM trig) WHERE rn = 1),
    walks AS (
      SELECT 2 * eid AS wseq, u, 6 AS wlen FROM ev WHERE event_type = 'signup'
      UNION ALL
      SELECT 2 * eid, u, 7 FROM ev WHERE event_type = 'click' AND value < 80),
    wver AS (
      SELECT u, hop_i, hop_j, wlen FROM (
        SELECT win.u, win.hop_i, win.hop_j, w.wlen,
               ROW_NUMBER() OVER (PARTITION BY win.u ORDER BY w.wseq DESC) AS rn
        FROM win JOIN walks w ON w.u = win.u AND w.wseq < win.tseq)
      WHERE rn = 1),
    kept AS (
      SELECT u, k FROM (
        SELECT u, hop_i, hop_j, UNNEST(range(0, wlen)) AS k FROM wver)
      WHERE hop_i IS NULL OR k < hop_i OR k >= hop_j)
    SELECT u AS fiber_cable_id,
           'W-' || u || '-' || CAST(k AS VARCHAR) AS route_network_element_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY k) AS INT) AS seq_no
    FROM kept
    """,
)
def proj_rel_fiber_cable_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL rel_fiber_cable_to_route_element projection
    (projections/core.py:project_rel_fiber_cable_to_route_element =
    ProjektorState.cs:178-221) end to end under the driver gate — the last
    of the 8 tables to get its own driver row. Exercises, composed: the
    spec-says-cable trigger (spec flag, NOT the payload flag — the sim
    sets them opposite), unconditional affix/detach triggers (even for
    non-cables), latest-trigger-wins (J5), walk resolved as-of the trigger
    (registered ∪ modified versions), X2 hop subtraction (hop [i, j) with
    a MISS variant that never fires, detach = empty hop list = identity),
    and W1 posexplode seq_no. The oracle re-derives the same fold with
    ASOF/window SQL; walk contents are position-determined so subtraction
    is expressible as a range predicate.
    """
    from open_ftth_relational_projector_spark.operators.arrays import EMPTY_GUID
    from open_ftth_relational_projector_spark.projections.core import (
        project_rel_fiber_cable_to_route_element,
    )

    ev = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    fv = F.floor("value").cast("int")
    fv7 = F.floor(F.col("value") / 7).cast("int")
    seq2 = (F.col("event_id") * 2).alias("seq")
    mkw = lambda k: F.concat(  # noqa: E731
        F.lit("W-"), u, F.lit("-"), k.cast("string")
    )
    hop_t = (
        "array<struct<fromNodeId:string,toNodeId:string,"
        "parentAffixes:array<struct<spanSegmentId:string>>>>"
    )

    span_spec = ev.filter(F.col("event_type") == "view").select(
        seq2,
        F.struct(
            F.concat(F.lit("SS-"), (fv % 8).cast("string")).alias("id"),
            F.concat(F.lit("N-"), fv.cast("string")).alias("name"),
            (fv % 2 == 0).alias("isCable"),
            F.struct(
                F.concat(F.lit("ST-"), (fv % 6).cast("string")).alias(
                    "spanStructureSpecificationId"
                )
            ).alias("rootTemplate"),
        ).alias("specification"),
    )
    struct_spec = ev.filter(
        (F.col("event_type") == "view") & (F.col("value") < 100)
    ).select(
        seq2,
        F.struct(
            F.concat(F.lit("ST-"), (fv % 6).cast("string")).alias("id"),
            fv.alias("outerDiameter"),
        ).alias("specification"),
    )
    walk_reg = ev.filter(F.col("event_type") == "signup").select(
        seq2,
        F.struct(
            F.concat(F.lit("W-"), u).alias("id"),
            F.array(*[mkw(F.lit(k)) for k in range(6)]).alias(
                "routeNetworkElementRefs"
            ),
        ).alias("interest"),
    )
    seg = F.struct(
        F.concat(F.lit("SEG-"), u).alias("id"),
        F.lit(0).alias("fromNodeOfInterestIndex"),
        F.lit(1).alias("toNodeOfInterestIndex"),
        F.lit(EMPTY_GUID).alias("fromTerminalId"),
        F.lit(EMPTY_GUID).alias("toTerminalId"),
    )
    placed = ev.filter(F.col("event_type") == "signup").select(
        (F.col("event_id") * 2 + 1).alias("seq"),
        F.struct(
            u.alias("id"),
            F.concat(F.lit("E-"), u).alias("name"),
            F.concat(F.lit("SS-"), (fv % 8).cast("string")).alias(
                "specificationId"
            ),
            F.concat(F.lit("W-"), u).alias("walkOfInterestId"),
            F.array(mkw(F.lit(0)), mkw(F.lit(5))).alias("nodesOfInterestIds"),
            # payload flag deliberately OPPOSITE of the spec flag: the
            # projection must trust the spec (ProjektorState.cs:169)
            (fv % 2 == 1).alias("isCable"),
            F.array(F.struct(F.array(seg).alias("spanSegments"))).alias(
                "spanStructures"
            ),
            F.lit(None).cast(hop_t).alias("utilityNetworkHops"),
            F.struct(
                F.lit(None).cast("string").alias("accessAddressId"),
                F.lit(None).cast("string").alias("unitAddressId"),
            ).alias("addressInfo"),
        ).alias("equipment"),
    )
    walk_mod = ev.filter(
        (F.col("event_type") == "click") & (F.col("value") < 80)
    ).select(
        seq2,
        F.concat(F.lit("W-"), u).alias("interestId"),
        F.array(*[mkw(F.lit(k)) for k in range(7)]).alias(
            "routeNetworkElementIds"
        ),
    )
    i_ = fv % 4
    j_ = i_ + 1 + (fv7 % (5 - i_))
    hop = F.struct(
        F.when(fv % 5 == 0, F.lit("MISS")).otherwise(mkw(i_)).alias(
            "fromNodeId"
        ),
        mkw(j_).alias("toNodeId"),
        F.lit(None)
        .cast("array<struct<spanSegmentId:string>>")
        .alias("parentAffixes"),
    )
    affix = ev.filter(
        (F.col("event_type") == "purchase") & (fv % 3 == 0)
    ).select(seq2, u.alias("spanEquipmentId"), F.array(hop).alias("newUtilityHopList"))
    detach = ev.filter(
        (F.col("event_type") == "error") & (fv % 5 == 1)
    ).select(
        seq2,
        u.alias("spanEquipmentId"),
        F.array().cast(hop_t).alias("newUtilityHopList"),
    )
    log = EventLog.from_typed(
        spark,
        {
            "SpanEquipmentSpecificationAdded": span_spec,
            "SpanStructureSpecificationAdded": struct_spec,
            "WalkOfInterestRegistered": walk_reg,
            "WalkOfInterestRouteNetworkElementsModified": walk_mod,
            "SpanEquipmentPlacedInRouteNetwork": placed,
            "SpanEquipmentAffixedToParent": affix,
            "SpanEquipmentDetachedFromParent": detach,
        },
    )
    return project_rel_fiber_cable_to_route_element(log)


# ===========================================================================
# 4. LLM-pipeline surface: text, dedup, similarity, multimodal
# ===========================================================================


@_q(
    "text_stats",
    """
    SELECT doc_id,
           LEN(string_split(text, ' ')) AS n_tokens,
           LENGTH(text) AS n_chars_actual,
           ROUND(LEN(LIST_FILTER(string_split(text, ' '), t -> t = 'the'))
                 / CAST(LEN(string_split(text, ' ')) AS DOUBLE), 4) AS the_ratio
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scattered(load_table(spark, sf_dir, "documents"))
    toks = TXT.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        _r4(
            F.size(F.filter(toks, lambda t: t == "the"))
            / F.size(toks).cast("double")
        ).alias("the_ratio"),
    )


@_q(
    "token_counts_bpe",
    """
    SELECT doc_id,
           LEN(string_split(text, ' ')) AS ws_tokens,
           LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
               AS subword_tokens
    FROM documents
    """,
)
def token_counts_bpe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish pre-tokenization token counts per document —
    the token-budget accounting pass of an LLM-corpus pipeline. Both counts
    are single-pass JVM expressions over the scan (no shuffle, no UDF)."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        TXT.token_count(F.col("text")).alias("ws_tokens"),
        TXT.subword_token_count(F.col("text")).alias("subword_tokens"),
    )


@_q(
    "lang_quality_stats",
    """
    WITH scored AS (
      SELECT lang, LEN(string_split(text, ' ')) AS n_tokens, n_chars
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(n_tokens), 4) AS avg_tokens,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM scored GROUP BY lang
    """,
)
def lang_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", TXT.token_count(F.col("text")).alias("n_tokens"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _r4(F.avg("n_tokens")).alias("avg_tokens"),
            _r4(F.avg("n_chars")).alias("avg_chars"),
        )
    )


@_q(
    "exact_dedup_groups",
    """
    SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_id
    FROM documents GROUP BY md5(text)
    """,
)
def exact_dedup_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@_q(
    "doc_fingerprint_groups",
    """
    SELECT md5(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint,
           COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
    FROM documents
    GROUP BY fingerprint
    """,
)
def doc_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scattered(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(TXT.fingerprint(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


@_q(
    "ngram_jaccard_pairs",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b,
           ROUND(n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = D.ngram_jaccard_pairs(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.05, n=3
    )
    return out.select("doc_a", "doc_b", _r4(F.col("jaccard")).alias("jaccard"))


@_q(
    "containment_near_dups",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    d AS (
      SELECT i.doc_a AS contained, i.doc_b AS container,
             ROUND(i.n_inter / CAST(sa.n AS DOUBLE), 4) AS containment
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
      UNION ALL
      SELECT i.doc_b, i.doc_a, ROUND(i.n_inter / CAST(sb.n AS DOUBLE), 4)
      FROM inter i JOIN sizes sb ON i.doc_b = sb.doc_id)
    SELECT contained, container, containment
    FROM d WHERE containment >= 0.2
    """,
)
def containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment ≥ 0.2 over the corpus
    (functions/dedup.containment_pairs) — the quote/subset detector that
    catches a paragraph wholly copied into a longer document, which
    Jaccard structurally under-scores; dedup policy drops the CONTAINED
    side. Same inverted-index scale shape as ngram_jaccard_pairs."""
    return D.containment_pairs(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.2, n=3
    )


@_q(
    "dedup_clusters",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, node) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a)
    SELECT src AS doc_id, MIN(node) AS component_id
    FROM reach GROUP BY src
    """,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → dedup CLUSTERS: connected components by iterative
    min-label propagation (functions/graph.py) over the exact n-gram
    Jaccard pairs; the oracle derives the same components via a recursive
    transitive-closure CTE. component_id = min doc_id of the cluster, i.e.
    the canonical document a dedup pass would keep."""
    from open_ftth_relational_projector_spark.functions.graph import (
        connected_components,
    )

    pairs = D.ngram_jaccard_pairs(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.05, n=3
    )
    return connected_components(pairs)


@_q(
    "corpus_filter_report",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks, LOWER(text) AS low
      FROM documents),
    c AS (
      SELECT doc_id,
             LEN(toks) AS n,
             LEN(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) AS c_en,
             LEN(list_filter(toks, x -> list_contains(['der','die','das','und','zu'], x))) AS c_de,
             LEN(list_filter(toks, x -> list_contains(['le','la','et','les','des'], x))) AS c_fr,
             LEN(list_filter(toks, x -> list_contains(['el','la','los','y','de'], x))) AS c_es,
             LENGTH(regexp_replace(low, '[a-z0-9 ]', '', 'g'))
               / CAST(LENGTH(low) AS DOUBLE) AS pr
      FROM t),
    s AS (
      SELECT doc_id, n,
             (CASE WHEN n BETWEEN 20 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN c_en / CAST(n AS DOUBLE) > 0.01 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN pr < 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality,
             CASE WHEN c_es > GREATEST(c_en, c_de, c_fr) THEN 'es'
                  WHEN c_fr > GREATEST(c_en, c_de) THEN 'fr'
                  WHEN c_de > c_en THEN 'de'
                  WHEN c_en > 0 THEN 'en'
                  ELSE 'und' END AS lang_guess
      FROM c)
    SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
           ROUND(quality, 4) AS quality, lang_guess,
           quality >= 0.7 AND lang_guess = 'en' AS keep
    FROM s
    """,
)
def corpus_filter_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filter verdict a C4/RefinedWeb-style pipeline executes
    per document: composite quality score (length band + stopword presence
    + punctuation ratio, text.quality_score), stopword-vote language guess
    (text.lang_guess, ties resolved in fixed en/de/fr/es order), and the
    resulting keep decision. Single-pass row-local JVM expressions; the
    oracle re-derives score and vote in SQL."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    qual = TXT.quality_score(F.col("text"))
    guessed = TXT.lang_guess(F.col("text"))
    return docs.select(
        "doc_id",
        TXT.token_count(F.col("text")).alias("n_tokens"),
        _r4(qual).alias("quality"),
        guessed.alias("lang_guess"),
        ((qual >= 0.7) & (guessed == F.lit("en"))).alias("keep"),
    )


@_q(
    "dedup_keep_list",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, node) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
    comp AS (
      SELECT src AS doc_id, MIN(node) AS component_id
      FROM reach GROUP BY src)
    SELECT d.doc_id,
           COALESCE(c.component_id, d.doc_id) AS component_id,
           COALESCE(c.component_id, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """,
)
def dedup_keep_list_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION a corpus pipeline actually executes: every doc
    mapped to its near-dup component (exact n-gram Jaccard pairs →
    connected components) with keep = is-the-canonical-member; singleton
    docs keep themselves. Composes ngram_jaccard_pairs + graph.py over the
    full corpus — the end-to-end keep/drop verdict, not just the pair or
    cluster list."""
    from open_ftth_relational_projector_spark.functions.graph import (
        connected_components,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.05, n=3)
    comp = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component_id"), F.col("doc_id")).alias(
                "component_id"
            ),
            (
                F.coalesce(F.col("component_id"), F.col("doc_id"))
                == F.col("doc_id")
            ).alias("keep"),
        )
    )


@_q(
    "weighted_doc_sample",
    """
    WITH u AS (
      SELECT doc_id, n_chars,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 13))::BIGINT + 1)
               / CAST(16::HUGEINT ** 13 AS DOUBLE) AS unif
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, n_chars,
           ROUND(-ln(unif) / n_chars, 4) AS priority
    FROM u
    ORDER BY ROUND(-ln(unif) / n_chars, 4), doc_id
    LIMIT 50
    """,
)
def weighted_doc_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (sampling.weighted_sample, Efraimidis–Spirakis 2006) — the data-mixing
    primitive: longer documents drawn proportionally more often, yet the
    sample is exactly reproducible across runs, partitionings, and engines
    because the uniforms derive from md5(doc_id‖salt). The oracle replays
    the identical priorities in SQL."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(
        docs.select("doc_id", "n_chars"),
        F.col("n_chars"),
        k=50,
        key="doc_id",
        salt="mix1",
    )


@_q(
    "corpus_pipeline_stats",
    """
    WITH RECURSIVE t AS (
      SELECT doc_id, text, string_split(text, ' ') AS toks, LOWER(text) AS low
      FROM documents),
    c AS (
      SELECT doc_id, text, LEN(toks) AS n,
             LEN(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) AS c_en,
             LEN(list_filter(toks, x -> list_contains(['der','die','das','und','zu'], x))) AS c_de,
             LEN(list_filter(toks, x -> list_contains(['le','la','et','les','des'], x))) AS c_fr,
             LEN(list_filter(toks, x -> list_contains(['el','la','los','y','de'], x))) AS c_es,
             LENGTH(regexp_replace(low, '[a-z0-9 ]', '', 'g'))
               / CAST(LENGTH(low) AS DOUBLE) AS pr
      FROM t),
    scored AS (
      SELECT doc_id, text, n,
             (CASE WHEN n BETWEEN 20 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN c_en / CAST(n AS DOUBLE) > 0.01 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN pr < 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality,
             CASE WHEN c_es > GREATEST(c_en, c_de, c_fr) THEN 'es'
                  WHEN c_fr > GREATEST(c_en, c_de) THEN 'fr'
                  WHEN c_de > c_en THEN 'de'
                  WHEN c_en > 0 THEN 'en'
                  ELSE 'und' END AS lang_guess
      FROM c),
    keepq AS (
      SELECT doc_id, text, n FROM scored
      WHERE quality >= 0.7 AND lang_guess = 'en'),
    canon AS (SELECT MIN(doc_id) AS doc_id FROM keepq GROUP BY md5(text)),
    surv AS (SELECT k.doc_id, k.text, k.n FROM keepq k JOIN canon USING (doc_id)),
    stoks AS (SELECT doc_id, string_split(text, ' ') AS st FROM surv),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(st) - 2, 0)),
               i -> st[i] || ' ' || st[i+1] || ' ' || st[i+2]))) AS shingle
      FROM stoks),
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT i.doc_a, i.doc_b FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE n_inter / CAST(sa.ns + sb.ns - n_inter AS DOUBLE) >= 0.05),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, node) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
    comp AS (SELECT src AS doc_id, MIN(node) AS component_id
             FROM reach GROUP BY src),
    final AS (
      SELECT s.doc_id, s.n FROM surv s LEFT JOIN comp c2 ON s.doc_id = c2.doc_id
      WHERE COALESCE(c2.component_id, s.doc_id) = s.doc_id)
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS ws_tokens
    FROM final GROUP BY 1
    """,
)
def corpus_pipeline_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-corpus pipeline as one composed dataflow — the
    flagship LLM-pipeline query: quality/language filter (text.py) →
    exact dedup keeping the canonical copy (md5 groupBy) → near-dup dedup
    via exact n-gram Jaccard pairs + connected components (dedup.py,
    graph.py) → deterministic md5-bucket train/test split (sampling.py) →
    per-split doc and whitespace-token budget. Every stage is individually
    driver-verified elsewhere; this row pins their composition. Plan
    shape: row-local filters, one hash-dedup shuffle, the inverted-index
    pair join, the iterative component join, then a map-side split — no
    all-pairs anything, no driver state."""
    from open_ftth_relational_projector_spark.functions.graph import (
        connected_components,
    )
    from open_ftth_relational_projector_spark.functions.sampling import (
        hash_split,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    qual = TXT.quality_score(F.col("text"))
    guessed = TXT.lang_guess(F.col("text"))
    keepq = docs.filter((qual >= 0.7) & (guessed == F.lit("en")))
    canon = keepq.groupBy(F.md5("text").alias("th")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # surv feeds BOTH the pair-generation branch and the final keep join;
    # without a persist Spark recomputes the quality filter + md5-dedup
    # semi-join once per consumer (a real pipeline would checkpoint the
    # filtered corpus to parquet here for exactly the same reason).
    surv = keepq.join(canon.select("doc_id"), "doc_id", "semi").persist()
    pairs = D.ngram_jaccard_pairs(surv, threshold=0.05, n=3)
    comp = connected_components(pairs)
    final = (
        surv.join(comp, "doc_id", "left")
        .filter(
            F.coalesce(F.col("component_id"), F.col("doc_id"))
            == F.col("doc_id")
        )
        .select("doc_id", "text")
    )
    return hash_split(final, "doc_id", {"train": 0.9, "test": 0.1}).groupBy(
        "split"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TXT.token_count(F.col("text")).cast("long")).alias("ws_tokens"),
    )


@_q(
    "train_test_split_stats",
    """
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n_docs, ROUND(AVG(n_chars), 4) AS avg_chars
    FROM documents GROUP BY 1
    """,
)
def train_test_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic engine-portable 90/10 split (functions/sampling.py):
    md5-bucket compared against a hex threshold as a STRING, so the DuckDB
    oracle reproduces the assignment byte-for-byte. Per-row expression —
    no shuffle, stable under repartitioning."""
    from open_ftth_relational_projector_spark.functions.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _r4(F.avg("n_chars")).alias("avg_chars"),
        )
    )


@_q("minhash_near_dups")  # xxhash64 path; hash-matched via minhash_near_dups_md5
def minhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = D.minhash_near_dups(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.05
    )
    return out.select("doc_a", "doc_b", _r4(F.col("jaccard")).alias("jaccard"))


@_q(
    "minhash_near_dups_md5",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    mh AS (
      SELECT doc_id, s,
             MIN(('0x' || substr(md5(shingle || '#' || CAST(s AS VARCHAR)), 1, 15))::BIGINT) AS m
      FROM sh CROSS JOIN (SELECT UNNEST(range(0, 32)) AS s) seeds
      GROUP BY doc_id, s),
    bands AS (
      SELECT doc_id, CAST(s // 4 AS INT) AS band_id,
             string_agg(CAST(m AS VARCHAR), ',' ORDER BY s) AS band_key
      FROM mh GROUP BY doc_id, s // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
      FROM cand c JOIN sh x ON x.doc_id = c.doc_a
                  JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
      GROUP BY c.doc_a, c.doc_b)
    SELECT i.doc_a, i.doc_b,
           ROUND(n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                 JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05
    """,
)
def minhash_near_dups_md5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for minhash_near_dups: the SAME pipeline —
    signatures (functions/dedup.py:minhash_signature), banding, candidate
    join, exact-Jaccard verification — run with the SQL-portable md5 hash
    (portable_hash64) and string band keys, so the oracle reimplements
    every stage in DuckDB SQL and the driver hash-matches end to end. The
    xxhash64 production variant differs ONLY in the hash constants."""
    out = D.minhash_near_dups(
        scattered(load_table(spark, sf_dir, "documents")),
        threshold=0.05,
        hash_fn=D.portable_hash64,
        portable_bands=True,
    )
    return out.select("doc_a", "doc_b", _r4(F.col("jaccard")).alias("jaccard"))


@_q("simhash_fingerprints")  # xxhash64 path; hash-matched via simhash_fingerprints_md5
def simhash_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash64(scattered(load_table(spark, sf_dir, "documents")))


@_q(
    "simhash_fingerprints_md5",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
      FROM documents),
    h AS (SELECT doc_id,
                 ('0x' || substr(md5(tok || '#0'), 1, 15))::BIGINT AS h
          FROM tok),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT UNNEST(range(0, 60)) AS b) bs
      GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT))
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def simhash_fingerprints_md5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for simhash_fingerprints: the SAME row-local
    aggregate fold (functions/dedup.py:simhash_column) with the
    SQL-portable 60-bit md5 hash, hash-matched against a DuckDB oracle
    that re-derives every bit sum. The xxhash64 production variant differs
    ONLY in hash constants and width."""
    return D.simhash64(
        scattered(load_table(spark, sf_dir, "documents")),
        n_bits=60,
        hash_fn=D.portable_hash64,
    )


@_q(
    "simhash_near_dups",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
      FROM documents),
    h AS (SELECT doc_id,
                 ('0x' || substr(md5(tok || '#0'), 1, 15))::BIGINT AS h
          FROM tok),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT UNNEST(range(0, 60)) AS b) bs
      GROUP BY doc_id, b),
    fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT))
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def simhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole banding (dedup.simhash_near_dups)
    — completes the SimHash family: fingerprints → banded candidate join →
    Hamming verification. Runs the md5-portable 60-bit variant so the
    oracle can recompute every fingerprint and do the (oracle-scale-only)
    quadratic Hamming join in SQL; banding with max_hamming < bands is
    provably full-recall, so the band-joined result equals the oracle's
    all-pairs result."""
    return D.simhash_near_dups(
        scattered(load_table(spark, sf_dir, "documents")),
        max_hamming=3,
        n_bits=60,
        bands=4,
        hash_fn=D.portable_hash64,
    )


@_q(
    "embedding_norms_by_label",
    """
    SELECT label,
           COUNT(*) AS n,
           ROUND(AVG(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))), 4) AS avg_l2
    FROM embeddings GROUP BY label
    """,
)
def embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        _r4(F.avg(S.l2_norm(S.as_double(F.col("embedding"))))).alias("avg_l2"),
    )


_EMB_NEAR_DUPS_SQL = """
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(generate_series(1, 64),
                      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))) AS c
      FROM v a JOIN v b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, ROUND(c, 4) AS cosine FROM pairs WHERE c >= 0.45
    """


@_q("embedding_near_dups", _EMB_NEAR_DUPS_SQL)
def embedding_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate dedup, exact all-pairs baseline.

    The synthetic embeddings have no planted duplicates (max cosine ≈ 0.51),
    so the threshold is set inside the tail of the similarity distribution
    to exercise the operator end-to-end.
    """
    out = S.embedding_near_dups(
        scattered(load_table(spark, sf_dir, "embeddings")), threshold=0.45
    )
    return out.select("id_a", "id_b", _r4(F.col("cosine")).alias("cosine"))


@_q("embedding_near_dups_lsh")  # approximate; machinery hash-matched via _fullprobe
def embedding_near_dups_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = S.embedding_near_dups(
        scattered(load_table(spark, sf_dir, "embeddings")),
        threshold=0.45,
        bucketed=True,
        n_planes=4,
    )
    return out.select("id_a", "id_b", _r4(F.col("cosine")).alias("cosine"))


@_q("embedding_near_dups_lsh_fullprobe", _EMB_NEAR_DUPS_SQL)
def embedding_near_dups_lsh_fullprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for embedding_near_dups_lsh: the SAME bucketed
    pipeline (signatures, bucket assignment, probe expansion, in-bucket
    pair join) multi-probed at radius == n_planes, which scans every
    bucket ⇒ provably equals the exact all-pairs result — so the exact
    SQL oracle hash-matches the LSH machinery end to end. The production
    variant differs ONLY in probe_radius."""
    out = S.embedding_near_dups(
        scattered(load_table(spark, sf_dir, "embeddings")),
        threshold=0.45,
        bucketed=True,
        n_planes=4,
        probe_radius=4,
    )
    return out.select("id_a", "id_b", _r4(F.col("cosine")).alias("cosine"))


@_q(
    "embedding_quantize_int8",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) AS amax FROM v),
    s2 AS (SELECT vec_id, e,
                  CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127.0 END AS scale
           FROM s),
    q AS (SELECT vec_id, e, scale,
                 list_transform(e, x -> CAST(FLOOR(x / scale + 0.5) AS INT)) AS qv
          FROM s2)
    SELECT vec_id,
           CAST(len(qv) AS INT) AS n_dims,
           ROUND(scale, 4) AS scale,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS l1,
           CAST(list_sum(list_transform(range(1, len(qv) + 1),
                                        i -> qv[i] * i)) AS BIGINT) AS checksum,
           ROUND(list_max(list_transform(range(1, len(qv) + 1),
                                         i -> abs(qv[i] * scale - e[i]))), 4)
             AS max_err
    FROM q
    """,
)
def embedding_quantize_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (similarity.quantize_int8_stats):
    scale/L1/position-weighted checksum/max reconstruction error per
    vector, all row-local JVM — the oracle recomputes the same explicit
    half-up quantizer in SQL."""
    return S.quantize_int8_stats(
        scattered(load_table(spark, sf_dir, "embeddings"))
    )


_KNN_BRUTEFORCE_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS sim
      FROM c, q WHERE c.neighbor_id != q.query_id)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """


@_q("knn_bruteforce", _KNN_BRUTEFORCE_SQL)
def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = S.knn_bruteforce(emb, queries, k=5)
    return out.withColumnRenamed("rank", "rnk")


_KNN_LABEL_NOISE_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
      FROM embeddings WHERE vec_id % 50 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nlabel
          FROM embeddings),
    scored AS (
      SELECT q.query_id, q.qlabel, c.neighbor_id, c.nlabel,
             list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS sim
      FROM c, q WHERE c.neighbor_id != q.query_id),
    top AS (
      SELECT query_id, qlabel, nlabel FROM (
        SELECT query_id, qlabel, nlabel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rnk
        FROM scored) t
      WHERE rnk <= 5)
    SELECT query_id AS vec_id, CAST(qlabel AS INT) AS label,
           CAST(SUM(CASE WHEN nlabel <> qlabel THEN 1 ELSE 0 END) AS INT)
             AS n_disagree,
           SUM(CASE WHEN nlabel <> qlabel THEN 1 ELSE 0 END) >= 3 AS flagged
    FROM top GROUP BY query_id, qlabel
    """


@_q("knn_label_noise", _KNN_LABEL_NOISE_SQL)
def knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit à la confident learning: each probe point's
    label vs its 5 exact nearest neighbors' labels; majority disagreement
    flags a likely mislabel — the data-centric cleaning pass run before
    training on a labeled corpus. Rides knn_bruteforce (broadcast
    queries, corpus streams); the tiny (queries × k) neighbor table then
    broadcasts against the label column twice."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    nb = S.knn_bruteforce(emb, queries, k=5)
    lbl = emb.select("vec_id", "label")
    nlab = lbl.join(
        F.broadcast(nb), lbl["vec_id"] == nb["neighbor_id"]
    ).select("query_id", F.col("label").alias("nlabel"))
    qlab = lbl.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    dis = F.sum(
        F.when(F.col("nlabel") != F.col("qlabel"), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        nlab.join(F.broadcast(qlab), "query_id")
        .groupBy("query_id", "qlabel")
        .agg(
            dis.cast("int").alias("n_disagree"),
            (dis >= 3).alias("flagged"),
        )
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("qlabel").cast("int").alias("label"),
            "n_disagree",
            "flagged",
        )
    )


@_q("knn_lsh")  # approximate; machinery hash-matched via knn_lsh_fullprobe
def knn_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.knn_lsh(emb, queries, k=5).withColumnRenamed("rank", "rnk")


@_q("knn_lsh_fullprobe", _KNN_BRUTEFORCE_SQL)
def knn_lsh_fullprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for knn_lsh: the SAME pipeline — hyperplane
    signatures, corpus bucket assignment, query multi-probe expansion,
    bucket-keyed candidate join, per-query ranking — probed at radius ==
    n_planes (probe_masks covers all buckets ⇒ provably exact), so the
    brute-force SQL oracle hash-matches the LSH machinery end to end. The
    production variant differs ONLY in n_planes/probe_radius."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.knn_lsh(
        emb, queries, k=5, n_planes=4, probe_radius=4
    ).withColumnRenamed("rank", "rnk")


@_q("knn_ivf")  # approximate; machinery hash-matched via knn_ivf_fullprobe
def knn_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors — the inverted-file scale path
    next to knn_bruteforce (exact oracle) and knn_lsh (hash path)."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.knn_ivf(emb, queries, k=5).withColumnRenamed("rank", "rnk")


@_q("knn_ivf_fullprobe", _KNN_BRUTEFORCE_SQL)
def knn_ivf_fullprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for knn_ivf: the SAME pipeline — sampled
    quantizer training, JVM corpus-to-centroid assignment, probe-join,
    per-query ranking — with n_probe == n_centroids (every cell probed ⇒
    provably exact regardless of the quantizer), so the brute-force SQL
    oracle hash-matches the IVF machinery end to end. The production
    variant differs ONLY in n_probe."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.knn_ivf(
        emb, queries, k=5, n_centroids=16, n_probe=16
    ).withColumnRenamed("rank", "rnk")


@_q(
    "multimodal_features",
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256,
           CAST(octet_length(CAST(text AS BLOB)) % 1920 + 1 AS INT) AS width,
           CAST(octet_length(CAST(text AS BLOB)) % 1080 + 1 AS INT) AS height
    FROM documents
    """,
)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary(scattered(load_table(spark, sf_dir, "documents")))
    return extract_features(docs, fake=True)


@_q(
    "multimodal_frames",
    """
    -- documents.text is pure ASCII, so VARCHAR substr == byte slicing
    WITH f AS (
      SELECT doc_id, text,
             UNNEST(generate_series(
               0, CAST(FLOOR((length(text) - 1) / 256.0) AS INT))) AS k
      FROM documents WHERE length(text) > 0)
    SELECT doc_id, CAST(k AS INTEGER) AS frame_idx,
           sha256(substring(text, k * 256 + 1, 256)) AS frame_sha256,
           CAST(LEAST(256, length(text) - k * 256) AS INTEGER) AS n_bytes
    FROM f
    """,
)
def multimodal_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: the JVM twin (sequence + binary substring + sha2,
    whole-stage codegen) — byte-range frames never need Python. The
    mapInPandas variant (sample_frames) carries the codec-shaped 1→N
    batch contract and is differential-pinned equal in tests."""
    from open_ftth_relational_projector_spark.functions.multimodal import (
        sample_frames_jvm,
    )

    docs = attach_binary(scattered(load_table(spark, sf_dir, "documents")))
    return sample_frames_jvm(docs, frame_bytes=256)


@_q(
    "multimodal_resize",
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) % 1920 + 1 AS INTEGER) AS width,
           CAST(octet_length(CAST(text AS BLOB)) % 1080 + 1 AS INTEGER) AS height,
           224 AS target_w, 224 AS target_h,
           sha256(text || '224x224') AS resized_sha256
    FROM documents
    """,
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub resize (functions/multimodal.resize_images): deterministic
    payload⊕geometry hash pins the full contract the real codec swap must
    preserve."""
    from open_ftth_relational_projector_spark.functions.multimodal import (
        resize_images,
    )

    docs = attach_binary(scattered(load_table(spark, sf_dir, "documents")))
    return resize_images(docs, 224, 224)


@_q(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)) AS tf_idf
      FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf_idf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tf_idf DESC, term ASC) AS rnk
      FROM scored)
    SELECT doc_id, term, CAST(rnk AS INTEGER) AS rnk,
           ROUND(tf_idf, 4) AS tf_idf
    FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (functions/text.tf_idf_top_terms) —
    deterministic tie-break on term text; term-keyed shuffles only."""
    return TXT.tf_idf_top_terms(
        scattered(load_table(spark, sf_dir, "documents")), k=3
    )


@_q(
    "value_quantiles_by_type",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.75), 4) AS p75,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per key (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation). At 100 TB swap for
    `approx_percentile` (t-digest, mergeable partial agg) — same query
    shape, bounded memory; the exact form stays as its oracle."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile("value", F.lit([0.25, 0.5, 0.75, 0.9]))
    return (
        ev.groupBy("event_type")
        .agg(q.alias("qs"), F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            _r4(F.element_at("qs", 1)).alias("p25"),
            _r4(F.element_at("qs", 2)).alias("p50"),
            _r4(F.element_at("qs", 3)).alias("p75"),
            _r4(F.element_at("qs", 4)).alias("p90"),
            "n",
        )
    )


@_q(
    "weekly_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, MIN(time_bucket(INTERVAL '7 days', ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id,
             time_bucket(INTERVAL '7 days', e.ts) AS active_week
      FROM events e)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INTEGER)
             AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort/retention matrix: users bucketed by first-seen week, counted
    per week-offset of later activity. Two aggregations + one join, all
    keyed on user_id — the first-seen aggregate broadcasts (dimension-sized
    at one row per user per shuffle partition)."""
    ev = load_table(spark, sf_dir, "events")
    # DuckDB's time_bucket anchors week intervals at 2000-01-03 (Monday),
    # not the 1970 epoch (Thursday) — use the same origin
    origin = 946_857_600  # 2000-01-03 00:00:00 UTC
    week = F.timestamp_seconds(
        ((F.col("ts").cast("timestamp").cast("long") - origin) / (7 * 86400))
        .cast("long") * (7 * 86400) + origin
    ).cast("timestamp_ntz")
    bucketed = ev.select("user_id", week.alias("week"))
    firsts = bucketed.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = bucketed.distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@_q(
    "signup_to_purchase_funnel",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_clicked_after,
           (SELECT COUNT(*) FROM p) AS n_purchased_after
    """,
)
def signup_to_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: each stage keeps users
    whose stage event strictly follows their previous stage's first event.
    Implemented as per-user min-aggregations chained by broadcast joins;
    event-order comparison, not mere existence."""
    ev = load_table(spark, sf_dir, "events")

    def stage(etype, prev, prev_ts):
        src = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            src = src.join(F.broadcast(prev), "user_id").filter(
                F.col("ts") > F.col(prev_ts)
            )
        return src.groupBy("user_id").agg(F.min("ts").alias(f"{etype}_ts"))

    s = stage("signup", None, "")
    c = stage("click", s, "signup_ts")
    p = stage("purchase", c, "click_ts")
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )


@_q(
    "clicks_within_signup_day",
    """
    WITH s AS (
      SELECT user_id, ts AS start_ts, ts + INTERVAL '1 day' AS end_ts
      FROM events WHERE event_type = 'signup'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.user_id, COUNT(*) AS n_clicks
    FROM c JOIN s ON c.user_id = s.user_id
               AND c.ts >= s.start_ts AND c.ts < s.end_ts
    GROUP BY c.user_id
    """,
)
def clicks_within_signup_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join via operators/range_join.interval_join:
    clicks falling inside any same-user [signup, +24h) window. Bucketized
    equi-join on (user_id, 6h bucket) + exact containment filter — no
    BroadcastNestedLoopJoin anywhere in the plan (pinned in test_plans)."""
    from open_ftth_relational_projector_spark.operators.range_join import (
        interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = interval_join(
        clicks,
        signups,
        fact_ts="ts",
        start="start_ts",
        end="end_ts",
        bucket_seconds=21_600,
        extra_keys=["user_id"],
    )
    return joined.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_clicks"))


@_q(
    "stratified_doc_sample",
    """
    WITH ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             ) AS rn
      FROM documents)
    SELECT lang, doc_id FROM ranked WHERE rn <= 20
    """,
)
def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-per-language sample (functions/sampling.
    stratified_sample): hash-ranked inside each group, reproducible across
    engines and partitionings."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    return stratified_sample(docs, "lang", 20, "doc_id")


@_q(
    "token_budget_chunks",
    """
    WITH t AS (
      SELECT doc_id, LEN(string_split(text, ' ')) AS tok FROM documents),
    c AS (
      SELECT doc_id, tok,
             SUM(tok) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT CAST(FLOOR((cum - tok) / 2048.0) AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens
    FROM c GROUP BY 1
    """,
)
def token_budget_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: contiguous 2048-token chunks over the
    corpus (functions/sampling.token_budget_chunks)."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        token_budget_chunks,
    )

    return token_budget_chunks(load_table(spark, sf_dir, "documents"), 2048)


@_q(
    "sliding_window_chunks",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    base AS (
      SELECT doc_id, toks,
             1 + CAST(FLOOR((GREATEST(LEN(toks) - 64, 0) + 47) / 48.0)
                      AS BIGINT) AS n_chunks
      FROM t),
    idx AS (
      SELECT doc_id, toks,
             UNNEST(range(0, n_chunks)) AS chunk_idx
      FROM base)
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(chunk_idx * 48 AS INTEGER) AS start_token,
           CAST(LEN(list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64))
                AS INTEGER) AS n_tokens,
           md5(array_to_string(
                 list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64),
                 ' ')) AS chunk_md5
    FROM idx
    """,
)
def sliding_window_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token windows every 48 tokens (functions/sampling.
    sliding_window_chunks): map-only context-window preparation; chunk
    identity as md5 for downstream dedup/packing."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        sliding_window_chunks,
    )

    return sliding_window_chunks(
        load_table(spark, sf_dir, "documents"), window=64, stride=48
    )


@_q(
    "bm25_top_docs",
    """
    WITH ql AS (
      SELECT * FROM (VALUES ('hash'), ('merge'), ('window')) AS t(term)),
    tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok SEMI JOIN ql USING (term) GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    dl AS (
      SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS dl
      FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl)
    SELECT tf.doc_id, COUNT(*) AS n_matched,
           ROUND(SUM(
             ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
           ), 4) AS score
    FROM tf
    JOIN df USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id ASC
    LIMIT 25
    """,
)
def bm25_top_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-25 retrieval for a fixed 3-term query (functions/text.
    bm25_top_docs): token stream filtered to query terms before any
    aggregation; N/avgdl/df broadcast; global top-k via sort+limit. The
    rank key is the ROUNDED score with doc_id tie-break, so the top-k cut
    is FP-stable across engines."""
    return TXT.bm25_top_docs(
        load_table(spark, sf_dir, "documents"),
        ["hash", "merge", "window"],
        k=25,
    )


@_q(
    "salted_event_counts",
    """
    SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation (operators/skew.py): 5 event types over 100k
    rows is exactly the hot-key shape that stalls a single reducer at
    100 TB — count/sum fold per (key, salt) first, then per key, so no
    reducer sees more than 1/n_salts of a hot key. Result must equal the
    plain GROUP BY (the oracle)."""
    from open_ftth_relational_projector_spark.operators.skew import (
        salted_aggregate,
    )

    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        ["event_type"],
        partial={
            "_n": F.count(F.lit(1)),
            "_sv": F.sum("value"),
        },
        merge={
            "n_events": F.sum("_n"),
            "sum_value": _r4(F.sum("_sv")),
        },
    )


@_q(
    "lineitem_profile",
    """
    SELECT 'l_quantity' AS col, COUNT(*) AS n,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
           ROUND(MIN(l_quantity), 4) AS min_v, ROUND(MAX(l_quantity), 4) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
           ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
           ROUND(MIN(l_extendedprice), 4), ROUND(MAX(l_extendedprice), 4)
    FROM lineitem
    """,
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (n, distinct, nulls, min/max) for three numeric
    lineitem columns in ONE scan: per-column aggregates computed side by
    side, then unpivoted — the data-quality pass a pipeline runs before
    training ingestion. (At 100 TB swap COUNT DISTINCT for
    approx_count_distinct — same shape, mergeable sketch.)"""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_extendedprice"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nn"),
            _r4(F.min(c)).alias(f"{c}__min"),
            _r4(F.max(c)).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__nd, {c}__nn, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col, n, n_distinct, n_null, min_v, max_v)"
    )


# ===========================================================================
# 9. Corpus-quality / decontamination surface (functions/quality.py,
#    dedup.py cross-doc, similarity.py centroid audit)
# ===========================================================================


@_q(
    "repetition_stats",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    big AS (
      SELECT doc_id,
             UNNEST([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))])
               AS bigram
      FROM tok
    ),
    cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM big GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           ROUND(1.0 - COUNT(*) / SUM(c), 4) AS dup_bigram_frac,
           ROUND(MAX(c) / SUM(c), 4) AS top_bigram_frac
    FROM cnt GROUP BY doc_id
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_ftth_relational_projector_spark.functions import quality as Q

    return Q.repetition_stats(scattered(load_table(spark, sf_dir, "documents")))


@_q(
    "token_entropy",
    """
    WITH cnt AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c), 4) AS entropy
    FROM cnt GROUP BY doc_id
    """,
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_ftth_relational_projector_spark.functions import quality as Q

    return Q.token_entropy(scattered(load_table(spark, sf_dir, "documents")))


@_q(
    "pii_scan",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || doc_id || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' call 555-' || (1000 + doc_id % 9000)
                     ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN ' host 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
                     ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+'))
                AS INTEGER) AS n_emails,
           CAST(LEN(regexp_extract_all(text, '\d{3}-\d{4}')) AS INTEGER)
             AS n_phones,
           CAST(LEN(regexp_extract_all(text, '\d+\.\d+\.\d+\.\d+')) AS INTEGER)
             AS n_ips,
           MD5(regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+',
                                  '<EMAIL>', 'g'),
                   '\d{3}-\d{4}', '<PHONE>', 'g'),
                 '\d+\.\d+\.\d+\.\d+', '<IP>', 'g')) AS redacted_md5
    FROM aug
    """,
)
def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_ftth_relational_projector_spark.functions import quality as Q

    docs = scattered(load_table(spark, sf_dir, "documents"))
    return Q.pii_scan(Q.with_synthetic_pii(docs))


@_q(
    "cross_doc_shingle_dup",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                       || toks[i+3] || ' ' || toks[i+4]
                       FOR i IN range(1, len(toks) - 3)]) AS shingle
        FROM tok)
    ),
    cnt AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_shingles,
           CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_shared,
           ROUND(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) / COUNT(*), 4)
             AS shared_frac
    FROM sh JOIN cnt USING (shingle)
    GROUP BY doc_id
    """,
)
def cross_doc_shingle_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.cross_doc_shingle_dup(
        scattered(load_table(spark, sf_dir, "documents"))
    )


@_q(
    "benchmark_decontamination",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    allsh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                       || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]
                       || ' ' || toks[i+6] || ' ' || toks[i+7]
                       FOR i IN range(1, len(toks) - 6)]) AS shingle
        FROM tok)
    ),
    eval_sh AS (SELECT DISTINCT shingle FROM allsh WHERE doc_id % 50 = 0)
    SELECT t.doc_id,
           CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS INTEGER) AS n_overlap,
           SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) > 0
             AS contaminated
    FROM (SELECT * FROM allsh WHERE doc_id % 50 <> 0) t
    LEFT JOIN eval_sh e USING (shingle)
    GROUP BY t.doc_id
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.benchmark_decontamination(
        scattered(load_table(spark, sf_dir, "documents"))
    )


@_q(
    "label_centroid_stats",
    """
    WITH pe AS (
      SELECT vec_id, label,
             UNNEST(range(1, len(embedding) + 1)) AS pos,
             UNNEST(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ),
    cent AS (SELECT label, pos, AVG(val) AS cv FROM pe GROUP BY 1, 2),
    per_vec AS (
      SELECT pe.vec_id, pe.label,
             SUM(val * cv) AS dot_vc, SUM(val * val) AS vv, SUM(cv * cv) AS cc
      FROM pe JOIN cent USING (label, pos)
      GROUP BY 1, 2
    )
    SELECT label,
           CAST(COUNT(*) AS INTEGER) AS n_vecs,
           ROUND(AVG(dot_vc / (SQRT(vv) * SQRT(cc))), 4) AS avg_cos_to_centroid
    FROM per_vec GROUP BY label
    """,
)
def label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.label_centroid_stats(scattered(load_table(spark, sf_dir, "embeddings")))


# --- distributed clustering + SemDeDup + DSIR selection --------------------
# Shared oracle CTE chain replaying kmeans_fit(k=4, iters=2) exactly:
# deterministic init (first 4 ids), two Lloyd iterations with centroids
# ROUNDED TO 6 DP after every M-step (the cross-engine determinism contract,
# functions/clustering.py module doc), then a final assignment a3 against
# the returned centroids c2 — mirroring kmeans_cluster_stats/semantic_dedup,
# which re-assign with the fitted centroids.
_KMEANS_CTES = """
    WITH pe AS (
      SELECT vec_id,
             UNNEST(range(1, len(embedding) + 1)) AS pos,
             UNNEST(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ),
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)
    ),
    c0 AS (SELECT i.cid, pe.pos, ROUND(pe.val, 6) AS cv
           FROM init i JOIN pe USING (vec_id)),
    d1 AS (SELECT pe.vec_id, c.cid,
                  SUM((pe.val - c.cv) * (pe.val - c.cv)) AS d2
           FROM pe JOIN c0 c USING (pos) GROUP BY 1, 2),
    a1 AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
             FROM d1) WHERE rn = 1),
    c1 AS (SELECT a1.cid, pe.pos, ROUND(AVG(pe.val), 6) AS cv
           FROM a1 JOIN pe USING (vec_id) GROUP BY 1, 2),
    d2t AS (SELECT pe.vec_id, c.cid,
                   SUM((pe.val - c.cv) * (pe.val - c.cv)) AS d2
            FROM pe JOIN c1 c USING (pos) GROUP BY 1, 2),
    a2 AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
             FROM d2t) WHERE rn = 1),
    c2 AS (SELECT a2.cid, pe.pos, ROUND(AVG(pe.val), 6) AS cv
           FROM a2 JOIN pe USING (vec_id) GROUP BY 1, 2),
    d3 AS (SELECT pe.vec_id, c.cid,
                  SUM((pe.val - c.cv) * (pe.val - c.cv)) AS d2
           FROM pe JOIN c2 c USING (pos) GROUP BY 1, 2),
    a3 AS (SELECT vec_id, cid, d2 FROM (
             SELECT vec_id, cid, d2,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
             FROM d3) WHERE rn = 1)
"""


@_q(
    "kmeans_cluster_stats",
    _KMEANS_CTES
    + """
    SELECT cid AS cluster_id,
           CAST(COUNT(*) AS INTEGER) AS n_members,
           MIN(vec_id) AS min_vec_id,
           ROUND(AVG(SQRT(d2)), 4) AS avg_dist
    FROM a3 GROUP BY cid
    """,
)
def kmeans_cluster_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (functions/clustering.kmeans_cluster_stats):
    E-step is a map-only broadcast-literal expression, M-step a k×dim-group
    aggregation — the oracle unrolls both iterations in SQL."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        kmeans_cluster_stats,
    )

    return kmeans_cluster_stats(
        scattered(load_table(spark, sf_dir, "embeddings")), k=4, iters=2
    )


@_q(
    "semantic_dedup_verdicts",
    _KMEANS_CTES
    + """,
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sims AS (
      SELECT y.vec_id, y.cid,
             MAX(list_dot_product(ex.v, ey.v)
                 / (SQRT(list_dot_product(ex.v, ex.v))
                    * SQRT(list_dot_product(ey.v, ey.v)))) AS max_sim
      FROM a3 x JOIN a3 y ON x.cid = y.cid AND x.vec_id < y.vec_id
      JOIN emb ex ON ex.vec_id = x.vec_id
      JOIN emb ey ON ey.vec_id = y.vec_id
      GROUP BY y.vec_id, y.cid
    )
    SELECT a3.vec_id, a3.cid AS cluster_id,
           ROUND(COALESCE(s.max_sim, -1.0), 4) AS max_intra_sim,
           COALESCE(s.max_sim, -1.0) < 0.9 AS keep
    FROM a3 LEFT JOIN sims s ON s.vec_id = a3.vec_id
    """,
)
def semantic_dedup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): quadratic near-dup search confined to
    k-means cells; keep-first-representative drop rule
    (functions/clustering.semantic_dedup)."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        semantic_dedup,
    )

    return semantic_dedup(
        scattered(load_table(spark, sf_dir, "embeddings")),
        threshold=0.9,
        k=4,
        iters=2,
    )


@_q(
    "dsir_doc_weights",
    """
    WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
                 FROM documents),
    feats AS (
      SELECT doc_id, lang, UNNEST(toks) AS f FROM tok
      UNION ALL
      SELECT doc_id, lang,
             UNNEST([toks[i] || ' ' || toks[i + 1]
                     FOR i IN range(1, len(toks))]) AS f
      FROM tok
    ),
    fb AS (SELECT doc_id, lang,
                  CAST(('0x' || substr(md5(f || '#0'), 1, 15)) AS BIGINT)
                    % 256 AS b
           FROM feats),
    counts AS (SELECT b, COUNT(*) AS cr,
                      SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
               FROM fb GROUP BY b),
    lw AS (SELECT b,
                  LN(CAST(ct + 1 AS DOUBLE))
                  - LN(CAST((SELECT SUM(ct) FROM counts) + 256 AS DOUBLE))
                  - LN(CAST(cr + 1 AS DOUBLE))
                  + LN(CAST((SELECT SUM(cr) FROM counts) + 256 AS DOUBLE))
                  AS w
           FROM counts)
    SELECT fb.doc_id, CAST(COUNT(*) AS INTEGER) AS n_feats,
           ROUND(SUM(lw.w), 4) AS log_weight
    FROM fb JOIN lw USING (b)
    GROUP BY fb.doc_id
    """,
)
def dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weights (arXiv:2302.03169) under hashed
    unigram+bigram features, md5-portable buckets
    (functions/sampling.dsir_importance_weights)."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        dsir_importance_weights,
    )

    return dsir_importance_weights(
        scattered(load_table(spark, sf_dir, "documents")),
        target_lang="en",
        n_buckets=256,
    )


def _pagerank_iter_sql(i: int) -> str:
    """One unrolled PageRank iteration: contribs keyed on dst, dangling
    scalar, update with per-iteration ROUND(…, 10) — mirroring
    functions/graph.pagerank's determinism contract."""
    p = i - 1
    return f"""
    c{i} AS (SELECT e.dst, SUM(r.rank / deg.deg) AS c
             FROM e JOIN deg USING (src)
             JOIN r{p} r ON r.node = e.src
             GROUP BY e.dst),
    d{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM r{p}
             WHERE node NOT IN (SELECT src FROM deg)),
    r{i} AS (SELECT nodes.node,
                    ROUND(CAST(0.15 AS DOUBLE) / nn.n
                          + CAST(0.85 AS DOUBLE)
                            * (COALESCE(c.c, 0.0) + d.dm / nn.n), 10) AS rank
             FROM nodes CROSS JOIN nn CROSS JOIN d{i} d
             LEFT JOIN c{i} c ON c.dst = nodes.node)"""


_PAGERANK_SQL = (
    """
    WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n
           FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),"""
    + ",".join(_pagerank_iter_sql(i) for i in (1, 2, 3))
    + """
    SELECT node, ROUND(rank, 6) AS rank FROM r3
    """
)


def _kc_d2(a: str, b: str) -> str:
    """Unrolled squared-L2 between list columns, (x−c)·(x−c) form and
    per-pair ROUND(…, 6) — mirroring clustering.kcenter_select's
    determinism contract."""
    return (
        f"ROUND(list_sum(list_transform(generate_series(1, 64), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE))), 6)"
    )


_KCENTER_SQL = f"""
    WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
    c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
    m1 AS (SELECT e.vec_id, e.v, {_kc_d2('e.v', 'c1.v')} AS d
           FROM e, c1 WHERE e.vec_id <> c1.vec_id),
    c2 AS (SELECT vec_id, v, d FROM m1 ORDER BY d DESC, vec_id LIMIT 1),
    m2 AS (SELECT m.vec_id, m.v, LEAST(m.d, {_kc_d2('m.v', 'c2.v')}) AS d
           FROM m1 m, c2 WHERE m.vec_id <> c2.vec_id),
    c3 AS (SELECT vec_id, v, d FROM m2 ORDER BY d DESC, vec_id LIMIT 1),
    m3 AS (SELECT m.vec_id, m.v, LEAST(m.d, {_kc_d2('m.v', 'c3.v')}) AS d
           FROM m2 m, c3 WHERE m.vec_id <> c3.vec_id),
    c4 AS (SELECT vec_id, v, d FROM m3 ORDER BY d DESC, vec_id LIMIT 1)
    SELECT 1 AS sel_order, vec_id, 0.0 AS dist FROM c1
    UNION ALL SELECT 2, vec_id, ROUND(d, 4) FROM c2
    UNION ALL SELECT 3, vec_id, ROUND(d, 4) FROM c3
    UNION ALL SELECT 4, vec_id, ROUND(d, 4) FROM c4
    """


@_q("kcenter_coreset", _KCENTER_SQL)
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection over the
    embeddings — the diversity-maximizing sampler for curation
    (functions/clustering.kcenter_select, k=4); the oracle unrolls the
    four greedy rounds with the same per-pair rounding and id
    tie-breaks."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        kcenter_select,
    )

    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    return kcenter_select(emb, k=4)


def _kcore_round(prev: str, out: str, k: int) -> str:
    """One unrolled peel round: degrees from the surviving edge set,
    drop nodes under k, keep edges whose BOTH endpoints survive."""
    return f"""
    {out} AS (
      SELECT e.u, e.v FROM {prev} e
      WHERE e.u IN (SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= {k})
        AND e.v IN (SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= {k}))"""


_KCORE_SQL = (
    """
    WITH raw AS (SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
                 FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e0 AS (SELECT u, v FROM raw UNION SELECT v, u FROM raw),"""
    + ",".join(_kcore_round(f"e{i}", f"e{i+1}", 3) for i in range(4))
    + """
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM e4 GROUP BY u
    """
)


@_q("kcore_purchase_graph", _KCORE_SQL)
def kcore_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the customer↔supplier purchase graph after 4 peel
    rounds (functions/graph.kcore_peel) — the density filter that strips
    weakly-attached fringe nodes in webgraph-style curation; the oracle
    unrolls the same fixed peel rounds."""
    from open_ftth_relational_projector_spark.functions.graph import kcore_peel

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1000000)).alias("dst"),
        )
        .distinct()
    )
    return kcore_peel(edges, k=3, rounds=4)


def _wsp_relax(prev: str, out: str) -> str:
    """One unrolled Bellman-Ford round: keep old costs, add relaxed
    candidates ROUNDed to 6 dp, take the min per node — mirroring
    graph.weighted_shortest_paths' determinism contract."""
    return f"""
    {out} AS (SELECT node, MIN(d) AS d FROM (
        SELECT node, d FROM {prev}
        UNION ALL
        SELECT s.v AS node, ROUND(p.d + s.w, 6) AS d
        FROM {prev} p JOIN sym s ON s.u = p.node) t
      GROUP BY node)"""


_WSP_SQL = (
    """
    WITH e0 AS (SELECT o_custkey AS u, l_suppkey + 1000000 AS v,
                       ROUND(MIN(l_extendedprice) / 10000, 6) AS w
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                GROUP BY 1, 2),
    sym AS (SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0),
    r0 AS (SELECT DISTINCT c_custkey AS node, 0.0::DOUBLE AS d
           FROM customer
           WHERE c_mktsegment = 'AUTOMOBILE'
             AND c_custkey IN (SELECT u FROM sym)),"""
    + ",".join(_wsp_relax(f"r{i}", f"r{i+1}") for i in range(3))
    + """
    SELECT node, d AS cost FROM r3
    """
)


@_q("weighted_purchase_paths", _WSP_SQL)
def weighted_purchase_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman-Ford cheapest paths from the AUTOMOBILE seed set
    over the purchase graph, edge cost = cheapest item price/10⁴ on that
    customer↔supplier edge, ≤ 3 hops (functions/
    graph.weighted_shortest_paths) — the weighted companion to
    bfs_purchase_distances; the oracle unrolls the three relaxation
    rounds with identical per-round rounding."""
    from open_ftth_relational_projector_spark.functions.graph import (
        weighted_shortest_paths,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1000000)).alias("dst"),
        )
        .agg(F.round(F.min("l_extendedprice") / 10000, 6).alias("w"))
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("node"))
    )
    return weighted_shortest_paths(edges, seeds, max_hops=3)


@_q("pagerank_purchase_graph", _PAGERANK_SQL)
def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 power iterations, dangling redistribution)
    over the directed customer→supplier purchase graph — the webgraph
    authority-scoring shape used for corpus quality filtering
    (functions/graph.pagerank); oracle unrolls the iterations in SQL."""
    from open_ftth_relational_projector_spark.functions.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1000000)).alias("dst"),
        )
    )
    return pagerank(edges, damping=0.85, iters=3)


@_q(
    "bfs_purchase_distances",
    """
    WITH RECURSIVE e AS (
      SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    seed AS (SELECT DISTINCT c_custkey AS node FROM customer
             WHERE c_mktsegment = 'AUTOMOBILE'
               AND c_custkey IN (SELECT u FROM sym)),
    walk(node, dist) AS (
      SELECT node, 0 FROM seed
      UNION
      SELECT s.v, w.dist + 1 FROM walk w JOIN sym s ON s.u = w.node
      WHERE w.dist < 4)
    SELECT node, CAST(MIN(dist) AS INTEGER) AS dist FROM walk GROUP BY node
    """,
)
def bfs_purchase_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance from the AUTOMOBILE-segment seed set
    over the undirected customer↔supplier purchase graph, capped at 4 hops
    — the proximity-to-trusted-seed graph feature (functions/
    graph.bfs_distances, frontier-based level-synchronous BFS); the oracle
    derives the same minimum distances via a recursive CTE."""
    from open_ftth_relational_projector_spark.functions.graph import bfs_distances

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1000000)).alias("dst"),
        )
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("node"))
    )
    return bfs_distances(edges, seeds, max_hops=4)


@_q(
    "bigram_lm_doc_scores",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    uni AS (SELECT doc_id, UNNEST(toks) AS w FROM tok),
    big AS (SELECT doc_id,
                   UNNEST([toks[i] FOR i IN range(1, len(toks))]) AS w1,
                   UNNEST([toks[i] || ' ' || toks[i + 1]
                           FOR i IN range(1, len(toks))]) AS bg
            FROM tok),
    c2 AS (SELECT bg, COUNT(*) AS c12 FROM big GROUP BY bg),
    c1 AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY w),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM uni)
    SELECT big.doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
           ROUND(AVG(LN((c2.c12 + 1.0) / (c1.c1 + v.v))), 4) AS avg_logprob
    FROM big JOIN c2 USING (bg)
    JOIN c1 ON c1.w = big.w1
    CROSS JOIN v
    GROUP BY big.doc_id
    """,
)
def bigram_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM log-probability per document — the
    CCNet/KenLM perplexity-filter shape (functions/quality.bigram_lm_scores):
    count tables keyed on the gram, corpus joins back on the same keys."""
    from open_ftth_relational_projector_spark.functions.quality import (
        bigram_lm_scores,
    )

    return bigram_lm_scores(scattered(load_table(spark, sf_dir, "documents")))


# --- the capstone curation composition -------------------------------------
# One declarative plan = the whole modern pretraining-curation pass:
# C4-style quality filter + SemDeDup semantic dedup (over the aligned
# embeddings, vec_id == doc_id) + DSIR target-likeness + bigram-LM
# perplexity, the latter two gated at their corpus 20th percentile
# (PERCENTILE_CONT twin: Spark's exact interpolating `percentile`).
# The oracle concatenates the four already-verified sub-oracles as CTEs.
_KM_BODY = _KMEANS_CTES.strip()[len("WITH "):]

_CURATION_SQL = (
    "\n    WITH "
    + _KM_BODY
    + """,
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    ssim AS (
      SELECT y.vec_id,
             MAX(list_dot_product(ex.v, ey.v)
                 / (SQRT(list_dot_product(ex.v, ex.v))
                    * SQRT(list_dot_product(ey.v, ey.v)))) AS max_sim
      FROM a3 x JOIN a3 y ON x.cid = y.cid AND x.vec_id < y.vec_id
      JOIN emb ex ON ex.vec_id = x.vec_id
      JOIN emb ey ON ey.vec_id = y.vec_id
      GROUP BY y.vec_id
    ),
    sem AS (SELECT a3.vec_id AS doc_id,
                   COALESCE(s.max_sim, -1.0) < 0.9 AS sem_keep
            FROM a3 LEFT JOIN ssim s ON s.vec_id = a3.vec_id),
    qt AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  LOWER(text) AS low
           FROM documents),
    qc AS (
      SELECT doc_id,
             LEN(toks) AS n,
             LEN(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) AS c_en,
             LENGTH(regexp_replace(low, '[a-z0-9 ]', '', 'g'))
               / CAST(LENGTH(low) AS DOUBLE) AS pr
      FROM qt),
    qs AS (
      SELECT doc_id,
             (CASE WHEN n BETWEEN 20 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN c_en / CAST(n AS DOUBLE) > 0.01 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN pr < 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
               >= 0.7 AS q_keep
      FROM qc),
    dfeats AS (
      SELECT doc_id, lang, UNNEST(toks) AS f
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
      UNION ALL
      SELECT doc_id, lang,
             UNNEST([toks[i] || ' ' || toks[i + 1]
                     FOR i IN range(1, len(toks))]) AS f
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
    ),
    dfb AS (SELECT doc_id, lang,
                   CAST(('0x' || substr(md5(f || '#0'), 1, 15)) AS BIGINT)
                     % 256 AS b
            FROM dfeats),
    dcounts AS (SELECT b, COUNT(*) AS cr,
                       SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
                FROM dfb GROUP BY b),
    dlw AS (SELECT b,
                   LN(CAST(ct + 1 AS DOUBLE))
                   - LN(CAST((SELECT SUM(ct) FROM dcounts) + 256 AS DOUBLE))
                   - LN(CAST(cr + 1 AS DOUBLE))
                   + LN(CAST((SELECT SUM(cr) FROM dcounts) + 256 AS DOUBLE))
                   AS w
            FROM dcounts),
    dw AS (SELECT dfb.doc_id, ROUND(SUM(dlw.w), 4) AS log_weight
           FROM dfb JOIN dlw USING (b) GROUP BY dfb.doc_id),
    ltok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    lmu AS (SELECT doc_id, UNNEST(toks) AS w FROM ltok),
    lmb AS (SELECT doc_id,
                   UNNEST([toks[i] FOR i IN range(1, len(toks))]) AS w1,
                   UNNEST([toks[i] || ' ' || toks[i + 1]
                           FOR i IN range(1, len(toks))]) AS bg
            FROM ltok),
    lc2 AS (SELECT bg, COUNT(*) AS c12 FROM lmb GROUP BY bg),
    lc1 AS (SELECT w, COUNT(*) AS c1 FROM lmu GROUP BY w),
    lv AS (SELECT COUNT(DISTINCT w) AS v FROM lmu),
    lms AS (SELECT lmb.doc_id,
                   ROUND(AVG(LN((lc2.c12 + 1.0) / (lc1.c1 + lv.v))), 4)
                     AS avg_logprob
            FROM lmb JOIN lc2 USING (bg)
            JOIN lc1 ON lc1.w = lmb.w1
            CROSS JOIN lv
            GROUP BY lmb.doc_id),
    dthr AS (SELECT percentile_cont(0.2) WITHIN GROUP (ORDER BY log_weight)
               AS t FROM dw),
    lthr AS (SELECT percentile_cont(0.2) WITHIN GROUP (ORDER BY avg_logprob)
               AS t FROM lms)
    SELECT d.doc_id, qs.q_keep, sem.sem_keep,
           dw.log_weight >= dthr.t AS dsir_ok,
           lms.avg_logprob >= lthr.t AS lm_ok,
           qs.q_keep AND sem.sem_keep
             AND dw.log_weight >= dthr.t
             AND lms.avg_logprob >= lthr.t AS keep,
           CASE WHEN NOT qs.q_keep THEN 'quality'
                WHEN NOT sem.sem_keep THEN 'semantic_dup'
                WHEN dw.log_weight < dthr.t THEN 'off_target'
                WHEN lms.avg_logprob < lthr.t THEN 'high_perplexity'
                ELSE 'kept' END AS reason
    FROM documents d
    JOIN qs USING (doc_id)
    JOIN sem USING (doc_id)
    JOIN dw USING (doc_id)
    JOIN lms USING (doc_id)
    CROSS JOIN dthr CROSS JOIN lthr
    """
)


@_q("curation_decisions", _CURATION_SQL)
def curation_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pass as ONE plan: per document, quality-filter
    verdict (text.quality_score ≥ 0.7), SemDeDup keep (embeddings aligned
    by id, clustering.semantic_dedup), DSIR target-likeness and bigram-LM
    score each gated at their corpus 20th percentile, plus the combined
    keep and a first-failing-filter reason.

    Scale shape: each signal keeps its own verified plan (see its
    standalone catalog entry); the composition adds only doc-id-keyed
    joins of per-doc aggregates and two 1-row percentile aggregates
    broadcast back — no new corpus-sized state, no new quadratic work."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        semantic_dedup,
    )
    from open_ftth_relational_projector_spark.functions.quality import (
        bigram_lm_scores,
    )
    from open_ftth_relational_projector_spark.functions.sampling import (
        dsir_importance_weights,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    q = docs.select(
        "doc_id",
        (TXT.quality_score(F.col("text")) >= 0.7).alias("q_keep"),
    )
    sem = semantic_dedup(emb, threshold=0.9, k=4, iters=2).select(
        F.col("vec_id").alias("doc_id"), F.col("keep").alias("sem_keep")
    )
    dw = dsir_importance_weights(docs, target_lang="en", n_buckets=256)
    lms = bigram_lm_scores(docs)
    dthr = dw.agg(F.expr("percentile(log_weight, 0.2)").alias("dt"))
    lthr = lms.agg(F.expr("percentile(avg_logprob, 0.2)").alias("lt"))
    dsir_ok = F.col("log_weight") >= F.col("dt")
    lm_ok = F.col("avg_logprob") >= F.col("lt")
    return (
        q.join(sem, "doc_id")
        .join(dw.select("doc_id", "log_weight"), "doc_id")
        .join(lms.select("doc_id", "avg_logprob"), "doc_id")
        .crossJoin(F.broadcast(dthr))
        .crossJoin(F.broadcast(lthr))
        .select(
            "doc_id",
            "q_keep",
            "sem_keep",
            dsir_ok.alias("dsir_ok"),
            lm_ok.alias("lm_ok"),
            (F.col("q_keep") & F.col("sem_keep") & dsir_ok & lm_ok).alias(
                "keep"
            ),
            F.when(~F.col("q_keep"), "quality")
            .when(~F.col("sem_keep"), "semantic_dup")
            .when(~dsir_ok, "off_target")
            .when(~lm_ok, "high_perplexity")
            .otherwise("kept")
            .alias("reason"),
        )
    )


# --- fixed-memory sketches, self-verified ----------------------------------


@_q(
    "kmv_distinct_rollup",
    """
    WITH h AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
                      ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#7'), 1, 15))::BIGINT AS hv
               FROM events),
    cellk AS (SELECT event_type, hv FROM (
                SELECT event_type, day, hv,
                       ROW_NUMBER() OVER (PARTITION BY event_type, day ORDER BY hv) AS rn
                FROM h) t WHERE rn <= 64),
    merged AS (SELECT event_type, hv FROM (
                 SELECT event_type, hv,
                        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
                 FROM (SELECT DISTINCT event_type, hv FROM cellk) u) t
               WHERE rn <= 64),
    direct AS (SELECT event_type, hv FROM (
                 SELECT event_type, hv,
                        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
                 FROM (SELECT DISTINCT event_type, hv FROM h) u) t
               WHERE rn <= 64),
    ms AS (SELECT event_type, COUNT(*) AS kn, MAX(hv) AS hk, SUM(hv) AS hs
           FROM merged GROUP BY event_type),
    ds AS (SELECT event_type, COUNT(*) AS kn, MAX(hv) AS hk, SUM(hv) AS hs
           FROM direct GROUP BY event_type),
    ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n
           FROM events GROUP BY event_type)
    SELECT ms.event_type,
           CAST(ex.n AS BIGINT) AS exact_distinct,
           ROUND(CASE WHEN ms.kn < 64 THEN CAST(ms.kn AS DOUBLE)
                      ELSE 63.0 / ((ms.hk + 0.5) / 1152921504606846976.0)
                 END, 4) AS kmv_est,
           (ms.kn = ds.kn AND ms.hk = ds.hk AND ms.hs = ds.hs) AS merge_lossless
    FROM ms JOIN ds ON ms.event_type = ds.event_type
    JOIN ex ON ms.event_type = ex.event_type
    """,
)
def kmv_distinct_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KMV distinct-user sketches per (event_type, day), merged
    to event_type and compared to the exact COUNT DISTINCT — the
    pre-aggregated sketch-table rollup for 100 TB distinct counting
    (functions/sketches.kmv_distinct_rollup, k=64 md5-portable hashes);
    the oracle replays sketch construction, merge, estimator, and the
    merge-losslessness proof bit-for-bit in SQL."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        kmv_distinct_rollup,
    )

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return kmv_distinct_rollup(
        ev, "event_type", "day", "user_id", k=64, seed=7, pre_reduce_salt=8
    )


@_q(
    "kmv_segment_overlap",
    """
    WITH ha AS (SELECT DISTINCT
                  ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#7'), 1, 15))::BIGINT AS hv
                FROM events WHERE event_type = 'click'),
    hb AS (SELECT DISTINCT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#7'), 1, 15))::BIGINT AS hv
           FROM events WHERE event_type = 'purchase'),
    ak AS (SELECT hv FROM ha ORDER BY hv LIMIT 64),
    bk AS (SELECT hv FROM hb ORDER BY hv LIMIT 64),
    uk AS (SELECT hv FROM (SELECT hv FROM ak UNION SELECT hv FROM bk) u
           ORDER BY hv LIMIT 64),
    us AS (SELECT COUNT(*) AS kn, MAX(hv) AS hk FROM uk),
    nb AS (SELECT COUNT(*) AS n_both FROM uk
           WHERE hv IN (SELECT hv FROM ak) AND hv IN (SELECT hv FROM bk)),
    exu AS (SELECT COUNT(DISTINCT user_id) AS exact_union FROM events
            WHERE event_type IN ('click', 'purchase')),
    exi AS (SELECT COUNT(*) AS exact_inter FROM
            (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') a
            JOIN (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'purchase') b USING (user_id)),
    eu AS (SELECT kn,
                  CASE WHEN kn < 64 THEN CAST(kn AS DOUBLE)
                       ELSE 63.0 / ((hk + 0.5) / 1152921504606846976.0)
                  END AS est_u
           FROM us)
    SELECT CAST(exu.exact_union AS BIGINT) AS exact_union,
           ROUND(eu.est_u, 4) AS est_union,
           CAST(exi.exact_inter AS BIGINT) AS exact_inter,
           ROUND((nb.n_both / CAST(eu.kn AS DOUBLE)) * eu.est_u, 4)
             AS est_inter,
           ROUND(nb.n_both / CAST(eu.kn AS DOUBLE), 4) AS jaccard_est
    FROM exu, exi, eu, nb
    """,
)
def kmv_segment_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches: |click ∪
    purchase|, Jaccard, and |click ∩ purchase| of distinct users
    estimated purely from two 64-hash sketches, beside exact answers
    (functions/sketches.kmv_segment_overlap); the oracle replays sketch
    construction, union k-min, both-membership count, and every
    estimator identity bit-for-bit."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        kmv_segment_overlap,
    )

    ev = load_table(spark, sf_dir, "events")
    return kmv_segment_overlap(
        ev, "event_type", "click", "purchase", "user_id", k=64, seed=7
    )


@_q(
    "cms_join_size_estimate",
    """
    WITH ka AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
                WHERE l_partkey IS NOT NULL),
    seeds AS (SELECT UNNEST([0, 1, 2, 3]) AS seed),
    cells AS (SELECT seed,
                     ('0x' || substr(md5(k || '#' || CAST(seed AS VARCHAR)), 1, 15))::BIGINT
                       % 256 AS bucket
              FROM ka CROSS JOIN seeds),
    grid AS (SELECT seed, bucket, COUNT(*) AS c FROM cells GROUP BY 1, 2),
    ipj AS (SELECT a.seed, SUM(a.c * b.c) AS ip
            FROM grid a JOIN grid b USING (seed, bucket) GROUP BY a.seed),
    ip AS (SELECT s.seed, COALESCE(ipj.ip, 0) AS ip
           FROM seeds s LEFT JOIN ipj USING (seed)),
    est AS (SELECT MIN(ip) AS cms_est FROM ip),
    cnt AS (SELECT k, COUNT(*) AS n FROM ka GROUP BY k),
    ex AS (SELECT COALESCE(SUM(n * n), 0) AS exact_size FROM cnt)
    SELECT CAST(ex.exact_size AS BIGINT) AS exact_size,
           CAST(est.cms_est AS BIGINT) AS cms_est,
           est.cms_est >= ex.exact_size AS overestimates
    FROM ex CROSS JOIN est
    """,
)
def cms_join_size_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality pre-flight for the skew-sensitive lineitem
    self-join on l_partkey: CMS inner-product estimate vs the exact
    Σ n(k)² size, with the never-underestimates guarantee as a live
    column (functions/sketches.cms_join_size_estimate) — what a planner
    consults before admitting a possibly-exploding join at 100 TB."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        cms_join_size_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return cms_join_size_estimate(li, "l_partkey", li, "l_partkey", d=4, w=256)


@_q(
    "cms_heavy_hitters",
    """
    WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token
                  FROM documents),
    seeds AS (SELECT UNNEST([0, 1, 2, 3]) AS seed),
    cells AS (
      SELECT token, seed,
             CAST(('0x' || substr(md5(token || '#' || seed), 1, 15))
               AS BIGINT) % 128 AS bucket
      FROM toks CROSS JOIN seeds),
    sketch AS (SELECT seed, bucket, COUNT(*) AS cell_n
               FROM cells GROUP BY 1, 2),
    exact AS (SELECT token, COUNT(*) AS exact_n FROM toks GROUP BY 1),
    topk AS (SELECT token, exact_n FROM exact
             ORDER BY exact_n DESC, token ASC LIMIT 20),
    probes AS (
      SELECT t.token, t.exact_n, seed,
             CAST(('0x' || substr(md5(t.token || '#' || seed), 1, 15))
               AS BIGINT) % 128 AS bucket
      FROM topk t CROSS JOIN seeds)
    SELECT p.token, p.exact_n, MIN(sk.cell_n) AS cms_n,
           MIN(sk.cell_n) >= p.exact_n AS overestimates
    FROM probes p JOIN sketch sk USING (seed, bucket)
    GROUP BY p.token, p.exact_n
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters, self-verified: the d×w counter grid
    is fixed-size mergeable state (the 100 TB replacement for the unbounded
    token table); every run re-proves est ≥ exact on the top-20 tokens
    (functions/sketches.count_min_heavy_hitters, md5-portable hashes)."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        count_min_heavy_hitters,
    )

    return count_min_heavy_hitters(
        scattered(load_table(spark, sf_dir, "documents")), d=4, w=128, k=20
    )


@_q(
    "bloom_decontamination",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    allsh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                       || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]
                       || ' ' || toks[i+6] || ' ' || toks[i+7]
                       FOR i IN range(1, len(toks) - 6)]) AS shingle
        FROM tok)
    ),
    eval_sh AS (SELECT DISTINCT shingle FROM allsh WHERE doc_id % 50 = 0),
    train AS (SELECT * FROM allsh WHERE doc_id % 50 <> 0),
    seeds AS (SELECT UNNEST([0, 1, 2]) AS seed),
    bloom AS (SELECT DISTINCT
                CAST(('0x' || substr(md5(shingle || '#' || seed), 1, 15))
                  AS BIGINT) % 16384 AS bit
              FROM eval_sh CROSS JOIN seeds),
    probe AS (SELECT t.doc_id, t.shingle, seed,
                CAST(('0x' || substr(md5(t.shingle || '#' || seed), 1, 15))
                  AS BIGINT) % 16384 AS bit
              FROM train t CROSS JOIN seeds),
    per_sh AS (
      SELECT p.doc_id, p.shingle,
             SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) = 3
               AS bloom_pos
      FROM probe p LEFT JOIN bloom b USING (bit)
      GROUP BY p.doc_id, p.shingle),
    th AS (
      SELECT t.doc_id,
             SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_true
      FROM train t LEFT JOIN eval_sh e USING (shingle)
      GROUP BY t.doc_id)
    SELECT p.doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_shingles,
           CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS INTEGER)
             AS n_bloom_hits,
           CAST(th.n_true AS INTEGER) AS n_true_hits,
           SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) >= th.n_true
             AS no_false_negatives
    FROM per_sh p JOIN th USING (doc_id)
    GROUP BY p.doc_id, th.n_true
    """,
)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination probed through a FIXED-memory Bloom filter of the
    eval shingles (broadcast bit set instead of the unbounded shingle
    table); per train doc the bloom hit count sits beside the exact
    overlap, re-proving no-false-negatives every run
    (functions/sketches.bloom_probe_decontamination)."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        bloom_probe_decontamination,
    )

    return bloom_probe_decontamination(
        scattered(load_table(spark, sf_dir, "documents")),
        eval_mod=50,
        n_bits=16384,
        n_hashes=3,
        n_shingle=8,
    )


@_q(
    "embedding_outlier_stats",
    """
    WITH pe AS (
      SELECT vec_id,
             UNNEST(range(1, len(embedding) + 1)) AS pos,
             UNNEST(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ),
    dims AS (
      SELECT pos, AVG(val) AS mu,
             SQRT(AVG(val * val) - AVG(val) * AVG(val)) AS sigma
      FROM pe GROUP BY pos
    ),
    mz AS (
      SELECT pe.vec_id, MAX(ABS(pe.val - d.mu) / d.sigma) AS m
      FROM pe JOIN dims d USING (pos) GROUP BY pe.vec_id
    )
    SELECT vec_id, ROUND(m, 4) AS max_abs_z, m > 3.5 AS is_outlier
    FROM mz
    """,
)
def embedding_outlier_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-shard QA: per-vector max per-dimension |z| and outlier
    flag (functions/similarity.embedding_outlier_stats) — corrupt-shard
    screen before an ANN index build; dim stats broadcast, corpus never
    shuffles."""
    return S.embedding_outlier_stats(
        scattered(load_table(spark, sf_dir, "embeddings")), z_threshold=3.5
    )


@_q(
    "hybrid_rrf_retrieval",
    """
    WITH ql AS (
      SELECT * FROM (VALUES ('hash'), ('merge'), ('window')) AS t(term)),
    tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok SEMI JOIN ql USING (term) GROUP BY doc_id, term),
    idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    dl AS (
      SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS dl
      FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    bm AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               ln(1 + (stats.n_docs - idf.df + 0.5) / (idf.df + 0.5))
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
             ), 4) AS score
      FROM tf
      JOIN idf USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id),
    trank AS (
      SELECT doc_id, rnk AS rank_a FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM bm) WHERE rnk <= 25),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id AS doc_id, embedding AS cv FROM embeddings
          WHERE vec_id <> 0),
    scored AS (
      SELECT c.doc_id,
             list_sum(list_transform(generate_series(1, 64),
               i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64),
                    i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS sim
      FROM c, q),
    vrank AS (
      SELECT doc_id, rnk AS rank_b FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS rnk
        FROM scored) WHERE rnk <= 25)
    SELECT doc_id,
           CAST(rank_a AS INT) AS rank_a,
           CAST(rank_b AS INT) AS rank_b,
           ROUND(COALESCE(1.0 / (60 + rank_a), 0.0)
                 + COALESCE(1.0 / (60 + rank_b), 0.0), 6) AS rrf_score
    FROM trank FULL OUTER JOIN vrank USING (doc_id)
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT 15
    """,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-25 (3-term query) fused with vector
    top-25 (cosine to embedding 0) by reciprocal-rank fusion
    (functions/similarity.rrf_fuse). Each leg reuses its verified
    machinery; the fusion itself only ever joins k-sized lists."""
    from pyspark.sql import Window as W2

    docs = load_table(spark, sf_dir, "documents")
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    text = TXT.bm25_top_docs(docs, ["hash", "merge", "window"], k=25)
    trank = text.select(
        "doc_id",
        F.row_number()
        .over(W2.orderBy(F.col("score").desc(), F.col("doc_id")))
        .alias("rank"),
    )
    vec = S.knn_bruteforce(
        emb, emb.filter(F.col("vec_id") == 0), k=25
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank"))
    fused = S.rrf_fuse(trank, vec, k_rrf=60, top=15)
    return fused.select(
        "doc_id",
        F.col("rank_a").cast("int").alias("rank_a"),
        F.col("rank_b").cast("int").alias("rank_b"),
        "rrf_score",
    )


@_q(
    "incremental_dedup_report",
    """
    WITH newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
    oldd AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    nsh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 generate_series(1, GREATEST(LEN(t) - 2, 0)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM newd))),
    osh AS (
      SELECT DISTINCT doc_id AS old_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 generate_series(1, GREATEST(LEN(t) - 2, 0)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM oldd))),
    nsz AS (SELECT doc_id, COUNT(*) AS n_new FROM nsh GROUP BY doc_id),
    osz AS (SELECT old_id, COUNT(*) AS n_old FROM osh GROUP BY old_id),
    ij AS (
      SELECT n.doc_id, o.old_id, COUNT(*) AS n_inter
      FROM nsh n JOIN osh o USING (shingle)
      GROUP BY n.doc_id, o.old_id),
    scoredp AS (
      SELECT ij.doc_id, ij.old_id,
             ij.n_inter / CAST(nsz.n_new + osz.n_old - ij.n_inter AS DOUBLE)
               AS jaccard
      FROM ij JOIN nsz USING (doc_id) JOIN osz USING (old_id)),
    best AS (
      SELECT doc_id, old_id AS best_match, jaccard AS best_jaccard FROM (
        SELECT doc_id, old_id, jaccard,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY jaccard DESC, old_id ASC) AS rn
        FROM scoredp) WHERE rn = 1),
    ex AS (
      SELECT n.doc_id, MIN(o.doc_id) AS exact_dup_of
      FROM newd n LEFT JOIN oldd o ON md5(n.text) = md5(o.text)
      GROUP BY n.doc_id)
    SELECT ex.doc_id, ex.exact_dup_of, best.best_match,
           ROUND(COALESCE(best.best_jaccard, -1.0), 4) AS best_jaccard,
           CASE WHEN ex.exact_dup_of IS NOT NULL THEN 'exact_dup'
                WHEN COALESCE(best.best_jaccard, -1.0) >= 0.2
                  THEN 'near_dup'
                ELSE 'unique' END AS verdict
    FROM ex LEFT JOIN best USING (doc_id)
    """,
)
def incremental_dedup_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only ingestion dedup (functions/dedup.incremental_dedup_report):
    odd-id docs screened against the even-id standing corpus — exact hash
    screen + new-against-old-only shingle inverted index, never old×old."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    return D.incremental_dedup_report(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        threshold=0.2,
        n=3,
    )


@_q(
    "knn_label_propagation",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS true_label
      FROM embeddings WHERE vec_id % 20 = 0),
    c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv, label AS nb_label
      FROM embeddings WHERE vec_id % 20 <> 0),
    scored AS (
      SELECT q.query_id, q.true_label, c.neighbor_id, c.nb_label,
             list_sum(list_transform(generate_series(1, 64),
               i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64),
                    i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS sim
      FROM c, q),
    topk AS (
      SELECT query_id, true_label, nb_label FROM (
        SELECT query_id, true_label, nb_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rnk
        FROM scored) WHERE rnk <= 5),
    votes AS (
      SELECT query_id, true_label, nb_label, COUNT(*) AS vote_n
      FROM topk GROUP BY 1, 2, 3)
    SELECT query_id AS vec_id, nb_label AS predicted_label,
           CAST(vote_n AS INT) AS vote_n, true_label,
           nb_label = true_label AS agrees
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY vote_n DESC, nb_label ASC)
                      AS r
          FROM votes) WHERE r = 1
    """,
)
def knn_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak supervision by k-NN majority vote with leave-out accuracy
    riding along (functions/similarity.knn_label_propagation): every 20th
    vector is held out and relabeled from its 5 nearest labeled
    neighbors."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    return S.knn_label_propagation(emb, F.col("vec_id") % 20 == 0, k=5)


@_q(
    "temperature_mixture_sample",
    """
    WITH shares AS (SELECT source, COUNT(*) AS n_g FROM documents
                    GROUP BY source),
    raw AS (SELECT source,
                   POW(n_g / CAST((SELECT SUM(n_g) FROM shares) AS DOUBLE),
                       0.7 - 1.0) AS rr
            FROM shares),
    rates AS (SELECT source,
                     ROUND(rr / (SELECT MAX(rr) FROM raw), 6) AS keep_rate
              FROM raw)
    SELECT d.doc_id, d.source, r.keep_rate,
           (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix'), 1, 13))::BIGINT + 1)
             / CAST(16::HUGEINT ** 13 AS DOUBLE) <= r.keep_rate AS sampled
    FROM documents d JOIN rates r USING (source)
    """,
)
def temperature_mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (α=0.7 exponentiated sampling
    — the multilingual mixing rule): rare sources up-sampled, dominant
    ones down-sampled, deterministic md5-uniform verdicts
    (functions/sampling.temperature_mixture_sample)."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        temperature_mixture_sample,
    )

    return temperature_mixture_sample(
        scattered(load_table(spark, sf_dir, "documents")),
        alpha=0.7,
        salt="mix",
    )


@_q(
    "length_bucketed_batches",
    """
    WITH base AS (
      SELECT doc_id, LEN(string_split(text, ' ')) AS n_tokens
      FROM documents),
    b AS (SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                 CASE WHEN n_tokens < 64 THEN 0
                      WHEN n_tokens < 128 THEN 1
                      WHEN n_tokens < 256 THEN 2
                      ELSE 3 END AS bucket
          FROM base),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
                                       ORDER BY doc_id) AS rn
          FROM b),
    wb AS (SELECT doc_id, n_tokens, bucket,
                  CAST(FLOOR((rn - 1) / 8) AS INT) AS batch_id
           FROM r)
    SELECT doc_id, n_tokens, bucket, batch_id,
           CAST(MAX(n_tokens) OVER (PARTITION BY bucket, batch_id)
                - n_tokens AS INT) AS pad_waste
    FROM wb
    """,
)
def length_bucketed_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment for padding efficiency
    (functions/sampling.length_bucketed_batches): bucket by token count,
    deterministic batch ids within buckets, per-doc pad waste vs the
    batch max."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        length_bucketed_batches,
    )

    return length_bucketed_batches(
        scattered(load_table(spark, sf_dir, "documents")),
        bucket_edges=[64, 128, 256],
        batch_size=8,
    )


@_q(
    "winnow_fingerprints",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                 FROM documents),
    h AS (SELECT doc_id,
                 [('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                      || ' ' || t[i+3] || '#0'), 1, 15))::BIGINT
                  FOR i IN range(1, len(t) - 2)] AS hs
          FROM tok),
    w AS (SELECT doc_id,
                 CASE WHEN len(hs) >= 5
                        THEN [list_min(hs[i:i+4])
                              FOR i IN range(1, len(hs) - 3)]
                      WHEN len(hs) > 0 THEN [list_min(hs)]
                      ELSE [] END AS fps
          FROM h)
    SELECT DISTINCT doc_id, fingerprint FROM (
      SELECT doc_id, UNNEST(list_distinct(fps)) AS fingerprint FROM w)
    """,
)
def winnow_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — MOSS):
    min-hash of each sliding window of 4-gram hashes, guaranteeing any
    shared substring of length ≥ 8 tokens shares a fingerprint at ~2/6 the
    storage (functions/dedup.winnow_fingerprints, md5-portable)."""
    return D.winnow_fingerprints(
        scattered(load_table(spark, sf_dir, "documents")), k=4, window=5
    )


# --- audio modality: real PCM WAV decode + DSP -----------------------------
# The synthesis rule (byte → (min(b,127)−64)·256) lets DuckDB re-derive
# every DSP number from the TEXT while Spark decodes the actual WAV binary
# — the same differential trick as multimodal_features, but here the
# binary format itself is fully real (stdlib `wave` parses the payloads,
# pinned in tests).

@_q(
    "audio_wav_features",
    """
    WITH sm AS (
      SELECT doc_id,
             [(LEAST(ascii(text[i]), 127) - 64) * 256
              FOR i IN range(1, length(text) + 1)] AS s
      FROM documents)
    SELECT doc_id,
           CAST(len(s) AS INT) AS n_frames,
           CAST(8000 AS INT) AS sample_rate,
           CAST((len(s) * 1000) // 8000 AS INT) AS duration_ms,
           CAST(list_max(list_transform(s, x -> abs(x))) AS INT) AS peak,
           ROUND(sqrt(list_avg(list_transform(s,
                 x -> CAST(x AS DOUBLE) * x))), 4) AS rms,
           CAST(len([i FOR i IN range(1, len(s)) IF s[i] * s[i+1] < 0])
             AS INT) AS zero_crossings
    FROM sm
    """,
)
def audio_wav_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio-corpus screens (silence/clipping/energy): RIFF header
    parse + numpy DSP over decoded PCM (functions/audio.wav_features on
    attach_wav payloads)."""
    from open_ftth_relational_projector_spark.functions.audio import (
        attach_wav,
        wav_features,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    return wav_features(attach_wav(docs))


@_q(
    "audio_wav_resample",
    """
    WITH sm AS (
      SELECT doc_id,
             [(LEAST(ascii(text[i]), 127) - 64) * 256
              FOR i IN range(1, length(text) + 1)] AS s
      FROM documents),
    dec AS (
      SELECT doc_id, len(s) AS n_in,
             [s[i] FOR i IN range(1, len(s) + 1) IF (i - 1) % 2 = 0] AS d
      FROM sm)
    SELECT doc_id,
           CAST(n_in AS INT) AS n_frames_in,
           CAST(len(d) AS INT) AS n_frames_out,
           CAST(4000 AS INT) AS sample_rate_out,
           ROUND(sqrt(list_avg(list_transform(d,
                 x -> CAST(x AS DOUBLE) * x))), 4) AS rms_out
    FROM dec
    """,
)
def audio_wav_resample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-factor decimation to a re-encoded valid WAV at half the
    rate (functions/audio.resample_wav); the oracle replays the kept
    sample set's RMS."""
    from open_ftth_relational_projector_spark.functions.audio import (
        attach_wav,
        resample_wav,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    return resample_wav(attach_wav(docs), factor=2)


@_q(
    "scd2_user_value_history",
    """
    SELECT user_id,
           ROUND(value, 4) AS value,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 view of the purchase stream: each
    user's value as validity intervals [valid_from, valid_to) with the
    open current row — the warehouse-history pattern the reference's
    last-write-wins tables flatten away. One keyed window, no joins."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        _r4(F.col("value")).alias("value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@_q(
    "expectations_audit",
    """
    WITH agg AS (
      SELECT
        SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS nn,
        SUM(CASE WHEN l_quantity IS NULL
                   OR l_quantity < 1 OR l_quantity > 25
                 THEN 1 ELSE 0 END) AS rng,
        SUM(CASE WHEN l_returnflag IS NULL
                   OR l_returnflag NOT IN ('A', 'N', 'R')
                 THEN 1 ELSE 0 END) AS av
      FROM lineitem),
    dup AS (
      SELECT COALESCE(SUM(CASE WHEN n > 1 THEN n - 1 END), 0) AS d
      FROM (SELECT l_orderkey, COUNT(*) AS n FROM lineitem
            GROUP BY l_orderkey)),
    orph AS (
      SELECT COUNT(*) AS o FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
    rows_out AS (
      SELECT 'lineitem' AS tbl, 'not_null' AS rule, 'l_orderkey' AS col,
             CAST(nn AS BIGINT) AS n_violations FROM agg
      UNION ALL
      SELECT 'lineitem', 'accepted_range', 'l_quantity',
             CAST(rng AS BIGINT) FROM agg
      UNION ALL
      SELECT 'lineitem', 'accepted_values', 'l_returnflag',
             CAST(av AS BIGINT) FROM agg
      UNION ALL
      SELECT 'lineitem', 'unique', 'l_orderkey', CAST(d AS BIGINT) FROM dup
      UNION ALL
      SELECT 'orders', 'refers_to', 'o_custkey', CAST(o AS BIGINT) FROM orph)
    SELECT tbl AS "table", rule, col AS "column", n_violations,
           n_violations = 0 AS passed
    FROM rows_out
    """,
)
def expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (functions/expectations — the
    dbt-test/Great-Expectations surface): all column rules fold into ONE
    aggregation pass per table; uniqueness adds a keyed groupBy and the
    foreign-key check a broadcast anti-join. The range rule is set to
    [1, 25] so real violations flow through the report."""
    from open_ftth_relational_projector_spark.functions.expectations import (
        check_expectations,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = check_expectations(
        lineitem,
        "lineitem",
        [
            {"rule": "not_null", "column": "l_orderkey"},
            {"rule": "accepted_range", "column": "l_quantity", "lo": 1, "hi": 25},
            {"rule": "accepted_values", "column": "l_returnflag",
             "values": ["A", "N", "R"]},
            {"rule": "unique", "column": "l_orderkey"},
        ],
    )
    od = check_expectations(
        orders,
        "orders",
        [{"rule": "refers_to", "column": "o_custkey", "ref": customer,
          "ref_column": "c_custkey"}],
    )
    return li.unionByName(od)


@_q(
    "snapshot_diff_orders",
    """
    WITH old_s AS (SELECT o_orderkey, o_totalprice, o_orderstatus
                   FROM orders WHERE o_orderkey % 3 <> 0),
    new_s AS (SELECT o_orderkey, o_totalprice, o_orderstatus
              FROM orders WHERE o_orderkey % 5 <> 0)
    SELECT change, CAST(COUNT(*) AS BIGINT) AS n_keys,
           ROUND(COALESCE(SUM(delta), 0), 2) AS total_price_delta
    FROM (
      SELECT CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                  WHEN n.o_orderkey IS NULL THEN 'deleted'
                  WHEN o.o_totalprice = n.o_totalprice
                       AND o.o_orderstatus = n.o_orderstatus
                    THEN 'unchanged'
                  ELSE 'changed' END AS change,
             COALESCE(n.o_totalprice, 0) - COALESCE(o.o_totalprice, 0)
               AS delta
      FROM old_s o FULL OUTER JOIN new_s n USING (o_orderkey))
    GROUP BY change
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the table-diff a pipeline runs between
    two corpus versions (old = keys % 3 ≠ 0, new = keys % 5 ≠ 0 of the
    same table, giving all four change classes): one key-keyed full outer
    join, per-class counts and value drift. At 100 TB both snapshots
    bucket by the key so the diff join is co-located."""
    o = load_table(spark, sf_dir, "orders")
    old_s = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new_s = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey"),
        F.col("o_totalprice").alias("n_price"),
        F.col("o_orderstatus").alias("n_status"),
    )
    j = old_s.join(new_s, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("o_totalprice").isNull(), "inserted")
        .when(F.col("n_price").isNull(), "deleted")
        .when(
            (F.col("o_totalprice") == F.col("n_price"))
            & (F.col("o_orderstatus") == F.col("n_status")),
            "unchanged",
        )
        .otherwise("changed")
    )
    delta = F.coalesce(F.col("n_price"), F.lit(0)) - F.coalesce(
        F.col("o_totalprice"), F.lit(0)
    )
    return (
        j.select(change.alias("change"), delta.alias("delta"))
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            # r2, not r4: the delta sum reaches ~1e10 at sf0.1, where
            # double summation noise (~2e-6 absolute) crosses the 4-dp
            # quantum between engines — caught by the sf0.1 sweep
            F.round(F.coalesce(F.sum("delta"), F.lit(0.0)), 2).alias(
                "total_price_delta"
            ),
        )
    )


@_q(
    "price_histogram",
    """
    WITH b AS (
      SELECT CAST(LEAST(FLOOR(o_totalprice / 25000.0), 19) AS INT)
               AS bucket
      FROM orders)
    SELECT bucket,
           CAST(bucket * 25000.0 AS DOUBLE) AS lo,
           CAST((bucket + 1) * 25000.0 AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (fixed 25k buckets, top bucket
    clamped): one map-side-combined aggregation over ≤20 groups — the
    profiling primitive behind range-partition planning and skew
    detection."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 25000.0), F.lit(19)
    ).cast("int")
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 25000.0).alias("lo"),
            ((F.col("bucket") + 1) * 25000.0).alias("hi"),
            "n",
        )
    )


@_q(
    "dedup_graph_triangles",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 generate_series(1, GREATEST(LEN(t) - 2, 0)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    e AS (
      SELECT i.u, i.v FROM inter i
      JOIN sizes sa ON i.u = sa.doc_id
      JOIN sizes sb ON i.v = sb.doc_id
      WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05),
    paths AS (
      SELECT a.u, a.v, b.v AS w FROM e a JOIN e b ON a.v = b.u),
    tri AS (
      SELECT 1 FROM paths p JOIN e ON p.u = e.u AND p.w = e.v)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM paths) AS n_paths,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles
    """,
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph (oriented-edge join,
    functions/graph.triangle_count over ngram_jaccard_pairs ≥ 0.05):
    clique-shaped duplicate clusters are triangle-dense, chains are not —
    the density audit behind choosing the dedup clustering strategy."""
    from open_ftth_relational_projector_spark.functions.graph import (
        triangle_count,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.05, n=3)
    return triangle_count(pairs)


@_q(
    "tfidf_cosine_pairs",
    """
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents)
      GROUP BY doc_id, term),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n
           FROM documents),
    w AS (SELECT tf.doc_id, tf.term,
                 tf.tf * LN(nd.n / dft.df) AS w
          FROM tf JOIN dft USING (term) CROSS JOIN nd),
    norms AS (SELECT doc_id, SQRT(SUM(w * w)) AS norm FROM w GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d.doc_a, d.doc_b,
           ROUND(d.dot / (na.norm * nb.norm), 4) AS cosine
    FROM dots d
    JOIN norms na ON na.doc_id = d.doc_a
    JOIN norms nb ON nb.doc_id = d.doc_b
    WHERE d.dot / (na.norm * nb.norm) >= 0.75
    """,
)
def tfidf_cosine_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity join (functions/text.
    tfidf_cosine_pairs): candidate pairs only via the term inverted
    index, weighted dot products, precomputed norms — the weighted
    counterpart to ngram_jaccard_pairs."""
    return TXT.tfidf_cosine_pairs(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.75
    )


@_q(
    "time_weighted_user_value",
    """
    WITH iv AS (
      SELECT user_id, value, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM events WHERE event_type = 'purchase')
    SELECT user_id,
           CAST(COUNT(*) AS INTEGER) AS n_intervals,
           ROUND(SUM(value * (epoch_us(valid_to) - epoch_us(valid_from)))
                 / SUM(epoch_us(valid_to) - epoch_us(valid_from)), 4)
             AS tw_avg_value
    FROM iv WHERE valid_to IS NOT NULL
    GROUP BY user_id
    HAVING SUM(epoch_us(valid_to) - epoch_us(valid_from)) > 0
    """,
)
def time_weighted_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over the SCD2 validity intervals (the correct
    'average balance' semantics — each value weighted by how long it was
    current, open intervals excluded): one keyed window + one keyed
    aggregate, composing scd2_user_value_history."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).filter(F.col("valid_to").isNotNull())
    # exact integer microseconds: unix_timestamp would TRUNCATE to seconds
    # while DuckDB's epoch keeps the fraction — µs is exact on both engines
    dur = (
        F.unix_micros(F.col("valid_to").cast("timestamp"))
        - F.unix_micros(F.col("valid_from").cast("timestamp"))
    ).cast("double")
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_intervals"),
            (F.sum(F.col("value") * dur) / F.sum(dur)).alias("_tw"),
            F.sum(dur).alias("_d"),
        )
        .filter(F.col("_d") > 0)
        .select("user_id", "n_intervals", _r4(F.col("_tw")).alias("tw_avg_value"))
    )


@_q(
    "zorder_locality_audit",
    """
    WITH m AS (
      SELECT o_orderkey,
             o_custkey % 1024 AS ck,
             CAST(FLOOR(date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)) / 7.0)
               AS BIGINT) % 1024 AS wk
      FROM orders),
    z AS (
      SELECT o_orderkey, ck, wk,
             list_sum([(((ck >> b) & 1) << (2 * b))
                       + (((wk >> b) & 1) << (2 * b + 1))
                       FOR b IN range(0, 10)]) AS morton
      FROM m),
    chunks AS (
      SELECT ck, wk, 'zorder' AS ordering,
             CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY morton, o_orderkey) - 1)
                        / 150) AS INT) AS chunk
      FROM z
      UNION ALL
      SELECT ck, wk, 'natural',
             CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1)
                        / 150) AS INT)
      FROM z)
    SELECT ordering, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           ROUND(AVG(ck_span), 4) AS avg_ck_span,
           ROUND(AVG(wk_span), 4) AS avg_wk_span
    FROM (
      SELECT ordering, chunk, MAX(ck) - MIN(ck) AS ck_span,
             MAX(wk) - MIN(wk) AS wk_span
      FROM chunks GROUP BY ordering, chunk)
    GROUP BY ordering
    """,
)
def zorder_locality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit — the Delta/Iceberg OPTIMIZE ZORDER
    primitive: interleave the bits of (custkey, order-week), sort by the
    code, cut into 150-row chunks (stand-ins for row groups), and measure
    per-chunk key spans. Narrow spans on BOTH dimensions are what make
    min/max row-group pruning effective for predicates on EITHER key —
    the property a single-column sort cannot give. Bit interleave is a
    pure JVM expression; the chunking is one global sort (row-group
    assignment is exactly the write-path sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    ck = F.col("o_custkey") % 1024
    wk = (
        F.floor(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
            / F.lit(7)
        ).cast("long")
        % 1024
    )
    morton = None
    for b in range(10):
        term = (
            F.shiftleft((ck.cast("long") / F.lit(2**b)).cast("long") % 2, 2 * b)
            + F.shiftleft((wk / F.lit(2**b)).cast("long") % 2, 2 * b + 1)
        )
        morton = term if morton is None else morton + term
    z = o.select(
        "o_orderkey", ck.alias("ck"), wk.alias("wk"), morton.alias("morton")
    )
    def chunked(order_cols, label):
        wseq = W.orderBy(*order_cols)
        return z.select(
            "ck",
            "wk",
            F.lit(label).alias("ordering"),
            F.floor((F.row_number().over(wseq) - 1) / F.lit(150))
            .cast("int")
            .alias("chunk"),
        )

    chunks = chunked(["morton", "o_orderkey"], "zorder").unionByName(
        chunked(["o_orderkey"], "natural")
    )
    spans = chunks.groupBy("ordering", "chunk").agg(
        (F.max("ck") - F.min("ck")).alias("ck_span"),
        (F.max("wk") - F.min("wk")).alias("wk_span"),
    )
    return spans.groupBy("ordering").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        _r4(F.avg("ck_span")).alias("avg_ck_span"),
        _r4(F.avg("wk_span")).alias("avg_wk_span"),
    )


@_q(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    pairs AS (SELECT event_type AS prev_type, next_type
              FROM seq WHERE next_type IS NOT NULL),
    totals AS (SELECT prev_type, COUNT(*) AS n_from FROM pairs
               GROUP BY prev_type)
    SELECT p.prev_type, p.next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) / CAST(t.n_from AS DOUBLE), 4) AS p_transition
    FROM pairs p JOIN totals t USING (prev_type)
    GROUP BY p.prev_type, p.next_type, t.n_from
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: per-user
    consecutive event-type pairs (one keyed window), counts and row-
    normalized transition probabilities — the behavioral-analytics
    primitive behind next-action prediction and funnel anomaly checks."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return (
        counts.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            _r4(F.col("n") / F.col("n_from").cast("double")).alias(
                "p_transition"
            ),
        )
    )


@_q(
    "rolling_7d_active_users",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day (the WAU curve).
    Distinct-over-sliding-window cannot ride an ordinary window frame, so
    the standing shape is (day, user) pairs range-joined to the day
    spine — pair volume is active-days × 7, linear in users; at 100 TB
    swap the exact distinct for an HLL sketch merged across the frame."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    return (
        days.alias("d")
        .join(
            du.alias("u"),
            F.col("u.day").between(
                F.date_sub(F.col("d.day"), 6), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )


@_q(
    "json_dlq_report",
    """
    WITH raw AS (
      SELECT event_type,
             '{"id": ' || event_id
             || CASE WHEN event_id % 7 = 0 THEN ', "v" ' ELSE ', "v": ' END
             || ROUND(value, 4) || '}' AS payload
      FROM events),
    parsed AS (
      SELECT event_type,
             CASE WHEN json_valid(payload) THEN 1 ELSE 0 END AS ok
      FROM raw)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(ok) AS BIGINT) AS n_ok,
           CAST(SUM(1 - ok) AS BIGINT) AS n_dlq
    FROM parsed GROUP BY event_type
    """,
)
def json_dlq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue ingestion accounting: JSON payloads built from
    the events table with every 7th record deterministically corrupted
    (missing colon); the malformed ones must land in the DLQ
    count, not crash the job and not silently vanish. Spark's PERMISSIVE
    from_json yields a struct of null fields for corrupt rows (the router
    predicate is a required field's nullness) while DuckDB classifies
    with json_valid."""
    ev = load_table(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('{"id": '),
        F.col("event_id").cast("string"),
        # corruption: drop the colon after "v" — invalid for every parser
        # (a missing closing brace is repaired by lenient Jackson readers)
        F.when(F.col("event_id") % 7 == 0, F.lit(', "v" ')).otherwise(
            F.lit(', "v": ')
        ),
        F.round("value", 4).cast("string"),
        F.lit("}"),
    )
    parsed = ev.select(
        "event_type",
        F.from_json(payload, "id LONG, v DOUBLE").alias("j"),
    )
    # PERMISSIVE from_json yields a struct of NULL FIELDS (not a null
    # struct) for corrupt records — route on a required field
    ok = F.col("j.id").isNotNull().cast("int")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(ok).alias("n_ok"),
        F.sum(1 - ok).alias("n_dlq"),
    )


@_q(
    "customer_er_candidates",
    """
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS name_dist,
           a.c_mktsegment = b.c_mktsegment AS same_segment
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def customer_er_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate generation — blocking + pairwise fuzzy
    match: pairs only form INSIDE a nation block (the record-linkage move
    that avoids the all-pairs explosion; at 100 TB block on several
    cheap keys and union), scored with edit distance (JVM levenshtein ==
    DuckDB levenshtein) plus corroborating-attribute agreement."""
    c = load_table(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_a"),
        F.col("c_mktsegment").alias("seg_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_b"),
        F.col("c_mktsegment").alias("seg_b"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "nk")
        .filter(F.col("cust_a") < F.col("cust_b"))
        .filter(dist <= 2)
        .select(
            "cust_a",
            "cust_b",
            dist.cast("int").alias("name_dist"),
            (F.col("seg_a") == F.col("seg_b")).alias("same_segment"),
        )
    )


@_q(
    "sorted_neighborhood_er",
    """
    WITH r AS (SELECT c_custkey, c_name,
                      ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rn
               FROM customer)
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS name_dist
    FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 2
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def sorted_neighborhood_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER pass (operators/sorted_neighborhood):
    customers ranked by name via the distributed global-rank primitive
    (range partition + per-partition window + broadcast offsets — no
    single-partition ORDER BY window), paired with their 2 successors,
    kept at edit distance ≤ 2 — the complement to customer_er_candidates'
    blocking pass for typos in the block key itself."""
    from open_ftth_relational_projector_spark.operators.sorted_neighborhood import (
        sorted_neighborhood_pairs,
    )

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pairs = sorted_neighborhood_pairs(c, ["c_name", "c_custkey"], window=2)
    dist = F.levenshtein(F.col("c_name"), F.col("c_name_b"))
    return (
        pairs.filter(dist <= 2)
        .select(
            F.col("c_custkey").alias("cust_a"),
            F.col("c_custkey_b").alias("cust_b"),
            dist.cast("int").alias("name_dist"),
        )
    )


@_q(
    "point_in_time_features",
    """
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type, value,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS n_clicks_before,
             SUM(CASE WHEN event_type = 'click' THEN value END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS click_value_before
      FROM events)
    SELECT event_id AS label_event_id, user_id, ts AS label_ts,
           CAST(COALESCE(n_clicks_before, 0) AS BIGINT) AS n_clicks_before,
           ROUND(COALESCE(click_value_before, 0.0), 4)
             AS click_value_before
    FROM tagged WHERE event_type = 'purchase'
    """,
)
def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join — the feature-store leakage
    guard: every purchase (label) row carries the user's click count and
    click-value mass STRICTLY BEFORE the label timestamp (frame ends at
    1 PRECEDING, so a click at the exact label row can't leak). One keyed
    window over the unioned stream — no per-label point lookup, no future
    data; the pattern training-set builders must use instead of a naive
    feature join."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.count(F.when(is_click, 1)).over(w).alias("n_clicks_before"),
        F.sum(F.when(is_click, F.col("value"))).over(w).alias(
            "click_value_before"
        ),
    )
    return tagged.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_event_id"),
        "user_id",
        F.col("ts").alias("label_ts"),
        F.coalesce(F.col("n_clicks_before"), F.lit(0))
        .cast("long")
        .alias("n_clicks_before"),
        _r4(F.coalesce(F.col("click_value_before"), F.lit(0.0))).alias(
            "click_value_before"
        ),
    )


@_q(
    "negative_samples_per_customer",
    """
    WITH bought AS (
      SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    custs AS (SELECT DISTINCT custkey FROM bought),
    cand AS (
      SELECT c.custkey, p.p_partkey AS partkey,
             substr(md5(c.custkey || '#' || p.p_partkey || '#neg'), 1, 8)
               AS u
      FROM custs c CROSS JOIN part p),
    unseen AS (
      SELECT cand.custkey, cand.partkey, cand.u
      FROM cand LEFT JOIN bought b
        ON b.custkey = cand.custkey AND b.partkey = cand.partkey
      WHERE b.custkey IS NULL)
    SELECT custkey, partkey FROM (
      SELECT custkey, partkey,
             ROW_NUMBER() OVER (PARTITION BY custkey
                                ORDER BY u, partkey) AS rn
      FROM unseen) WHERE rn <= 3
    """,
)
def negative_samples_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recommender training: per
    customer, 3 parts they never bought, chosen by md5-uniform order —
    reproducible across runs/engines (no rand()). Candidates are the
    customer×part grid minus the purchase set (anti-join); at 100 TB the
    grid is never materialized — sample candidate parts per customer
    first (md5-bucketed) and anti-join only the sampled slice."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bought = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
    )
    custs = bought.select("custkey").distinct()
    cand = custs.crossJoin(
        F.broadcast(part.select(F.col("p_partkey").alias("partkey")))
    ).withColumn(
        "u",
        F.substring(
            F.md5(
                F.concat_ws(
                    "#",
                    F.col("custkey"),
                    F.col("partkey"),
                    F.lit("neg"),
                )
            ),
            1,
            8,
        ),
    )
    unseen = cand.join(bought, ["custkey", "partkey"], "left_anti")
    w = W.partitionBy("custkey").orderBy("u", "partkey")
    return (
        unseen.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("custkey", "partkey")
    )


@_q(
    "winsorized_value_stats",
    """
    WITH thr AS (
      SELECT event_type,
             percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS p05,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS p95
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(e.value), 4) AS raw_mean,
           ROUND(AVG(LEAST(GREATEST(e.value, t.p05), t.p95)), 4)
             AS winsorized_mean,
           CAST(SUM(CASE WHEN e.value < t.p05 OR e.value > t.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_capped
    FROM events e JOIN thr t USING (event_type)
    GROUP BY e.event_type
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — outlier capping at the per-group p05/p95 before
    statistics (the feature-prep step that keeps heavy tails from
    dominating a mean): exact interpolating percentiles per key in one
    pass (a tiny per-group table broadcast back), then clamp-and-average.
    At 100 TB the exact percentile swaps for approx_percentile, same
    shape."""
    ev = load_table(spark, sf_dir, "events")
    thr = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = F.least(
        F.greatest(F.col("value"), F.col("p05")), F.col("p95")
    )
    return (
        ev.join(F.broadcast(thr), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r4(F.avg("value")).alias("raw_mean"),
            _r4(F.avg(clamped)).alias("winsorized_mean"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("p05"))
                    | (F.col("value") > F.col("p95")),
                    1,
                ).otherwise(0)
            ).alias("n_capped"),
        )
    )


@_q(
    "pseudonymized_join_integrity",
    """
    WITH pc AS (
      SELECT md5('tenant-salt#' || c_custkey) AS pid, c_nationkey
      FROM customer),
    po AS (
      SELECT md5('tenant-salt#' || o_custkey) AS pid, o_totalprice
      FROM orders)
    SELECT pc.c_nationkey AS nationkey,
           CAST(COUNT(DISTINCT pc.pid) AS BIGINT) AS n_customers,
           CAST(COUNT(po.pid) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(po.o_totalprice), 0), 4) AS total_price
    FROM pc LEFT JOIN po USING (pid)
    GROUP BY pc.c_nationkey
    """,
)
def pseudonymized_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization that PRESERVES JOINABILITY: customer
    and order keys are independently tokenized with the same salted md5,
    then joined on the pseudonym — per-nation order counts and totals come
    out identical to joining raw keys, while no raw key crosses the
    boundary. The privacy-pipeline pattern for sharing linked tables
    without identifiers (salt rotation = re-keying the whole universe)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def pseudo(col):
        return F.md5(F.concat(F.lit("tenant-salt#"), col.cast("string")))

    pc = cust.select(
        pseudo(F.col("c_custkey")).alias("pid"), "c_nationkey"
    )
    po = orders.select(
        pseudo(F.col("o_custkey")).alias("pid"), "o_totalprice"
    )
    return (
        pc.join(po, "pid", "left")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.countDistinct("pid").alias("n_customers"),
            F.count("o_totalprice").alias("n_orders"),
            _r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias(
                "total_price"
            ),
        )
    )


@_q(
    "k_anonymity_audit",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
      FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(group_size) AS BIGINT) AS min_group,
           CAST(SUM(CASE WHEN group_size < 10 THEN group_size ELSE 0 END)
             AS BIGINT) AS n_rows_below_k,
           MIN(group_size) >= 10 AS k10_anonymous
    FROM g
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (nation, segment):
    smallest equivalence class, rows in classes below k=10, and the
    release verdict — the privacy gate run before publishing a
    pseudonymized extract (pairs with pseudonymized_join_integrity)."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("min_group"),
        F.sum(
            F.when(F.col("group_size") < 10, F.col("group_size")).otherwise(0)
        ).alias("n_rows_below_k"),
        (F.min("group_size") >= 10).alias("k10_anonymous"),
    )


@_q(
    "rolling_zscore_anomalies",
    """
    WITH st AS (
      SELECT event_id, user_id, ts, value,
             AVG(value) OVER w AS mu,
             COUNT(*) OVER w AS n,
             AVG(value * value) OVER w AS m2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id,
           ROUND((value - mu) / SQRT(m2 - mu * mu), 4) AS z
    FROM st
    WHERE n >= 10 AND m2 - mu * mu > 1e-12
      AND ABS((value - mu) / SQRT(m2 - mu * mu)) > 3
    """,
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly flags: each event scored against ITS OWN
    trailing window (20 prior events, self excluded — no leakage), flagged
    when |z| > 3. Variance from the explicit E[x²]−E[x]² form so the
    oracle matches formula-for-formula; the frame is a ROWS window — one
    keyed sort, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    mu = F.avg("value").over(w)
    n = F.count(F.lit(1)).over(w)
    m2 = F.avg(F.col("value") * F.col("value")).over(w)
    var = m2 - mu * mu
    z = (F.col("value") - mu) / F.sqrt(var)
    return (
        ev.select("event_id", "user_id", F.col("value"), mu.alias("mu"),
                  n.alias("n"), var.alias("var"), z.alias("zraw"))
        .filter(
            (F.col("n") >= 10)
            & (F.col("var") > 1e-12)
            & (F.abs(F.col("zraw")) > 3)
        )
        .select("event_id", "user_id", _r4(F.col("zraw")).alias("z"))
    )


@_q(
    "mad_outlier_stats",
    """
    WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY event_type),
    mad AS (SELECT e.event_type,
                   quantile_cont(ABS(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type),
    scored AS (
      SELECT e.event_type, m.med, d.mad,
             0.6745 * (e.value - m.med) / d.mad AS z
      FROM events e
      JOIN med m USING (event_type) JOIN mad d USING (event_type)
      WHERE d.mad > 1e-12)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(med), 4) AS med,
           ROUND(MIN(mad), 4) AS mad,
           CAST(SUM(CASE WHEN ABS(z) > 3.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies
    FROM scored GROUP BY event_type
    """,
)
def mad_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD modified-z outlier audit of event values per type
    (functions/quality.robust_outlier_stats) — the robust complement to
    rolling_zscore_anomalies' mean/stddev gate; oracle replays both
    percentile passes and the 0.6745 scaling formula-for-formula."""
    from open_ftth_relational_projector_spark.functions.quality import (
        robust_outlier_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    return robust_outlier_stats(ev, "event_type", "value", z_thresh=3.5)


@_q(
    "dow_seasonality_index",
    """
    WITH r AS (SELECT dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
                      o_totalprice
               FROM orders),
    agg AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(o_totalprice) AS rev
            FROM r GROUP BY dow),
    tot AS (SELECT SUM(rev) AS trev FROM agg)
    SELECT dow AS dow, n_orders,
           ROUND(rev, 2) AS revenue,
           ROUND(rev / (tot.trev / 7.0), 4) AS seasonal_index
    FROM agg CROSS JOIN tot
    """,
)
def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality: revenue per weekday vs the uniform 1/7
    expectation (index 1.0 = no weekly cycle) — the baseline every
    anomaly detector and forecast deseasonalizes against. dow uses
    Spark's 1=Sunday..7 convention (DuckDB's 0-based dayofweek shifted
    to match); revenue rounded to 2 dp (1e9-magnitude sums exceed 4-dp
    double agreement, the snapshot_diff lesson)."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(
        F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("o_totalprice").alias("rev"),
    )
    tot = agg.agg(F.sum("rev").alias("trev"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_orders",
            F.round(F.col("rev"), 2).alias("revenue"),
            _r4(F.col("rev") / (F.col("trev") / F.lit(7.0))).alias(
                "seasonal_index"
            ),
        )
    )


@_q(
    "peak_concurrent_sessions",
    """
    WITH iv AS (SELECT user_id, epoch_us(ts)::BIGINT AS s,
                       epoch_us(ts)::BIGINT + 1800000000 AS e,
                       event_id
                FROM events),
    pts AS (
      SELECT s AS t, 1 AS d, event_id FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d, event_id FROM iv),
    sw AS (SELECT t, d,
                  SUM(d) OVER (ORDER BY t, d DESC, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS load
           FROM pts)
    SELECT CAST(MAX(load) AS BIGINT) AS peak_concurrency,
           CAST(MIN(t) AS BIGINT) AS first_peak_at
    FROM sw WHERE load = (SELECT MAX(load) FROM sw)
    """,
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency: every event opens a 30-minute session interval;
    the classic +1/−1 boundary sweep finds the maximum simultaneous
    sessions and the first instant it occurs — capacity planning's
    gauge-peak query. Boundary order processes starts BEFORE ends at the
    same instant, so touching intervals count as overlapping
    (closed-interval semantics — a session starting exactly when another
    ends IS concurrent with it; the oracle sorts identically).

    Scale shape: deltas are PRE-AGGREGATED per distinct timestamp (one
    keyed groupBy — the bucketed rewrite the r3 verdict asked for), then
    the running load is a hierarchical cumsum over the bucket series
    (operators/hierarchical.py), not a single-task global window. The
    within-timestamp peak is ``cum + n_ends``: starts-first ordering means
    load at time t crests at cum_before + n_starts = cum_incl + n_ends —
    identical to the point-level sweep at any parallelism."""
    from .operators.hierarchical import hierarchical_cumsum

    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    starts = ev.select(F.col("us").alias("t"), F.lit(1).alias("d"))
    ends = ev.select(
        (F.col("us") + F.lit(1_800_000_000)).alias("t"), F.lit(-1).alias("d")
    )
    per_t = (
        starts.unionByName(ends)
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("ns"),
            F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).alias("ne"),
        )
        .withColumn("delta", F.col("ns") - F.col("ne"))
    )
    sw = hierarchical_cumsum(per_t, [F.col("t")], "delta", "cum").withColumn(
        "peak_t", F.col("cum") + F.col("ne")
    )
    peak = sw.agg(F.max("peak_t").alias("mx"))
    return (
        sw.join(F.broadcast(peak), sw["peak_t"] == peak["mx"])
        .agg(
            F.max("peak_t").cast("long").alias("peak_concurrency"),
            F.min("t").cast("long").alias("first_peak_at"),
        )
    )


@_q(
    "attribution_linear_multitouch",
    """
    WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    pur AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
    clk AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
    touch AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             COUNT(*) OVER (PARTITION BY p.event_id) AS n_touches
      FROM pur p JOIN clk c
        ON c.user_id = p.user_id
       AND c.us < p.us AND c.us >= p.us - 604800000000)
    SELECT click_id, CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(SUM(1.0 / n_touches), 4) AS credit
    FROM touch GROUP BY click_id
    """,
)
def attribution_linear_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in a purchase's 7-day
    lookback shares the conversion credit equally (1/n_touches) — the
    fractional-credit complement to attribution_last_touch. The
    touch join is keyed on user (pairs bounded per user-week); credit
    normalization is one window keyed on the purchase."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("us").alias("pus")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("us").alias("cus")
    )
    touch = (
        pur.join(clk, "user_id")
        .filter(
            (F.col("cus") < F.col("pus"))
            & (F.col("cus") >= F.col("pus") - F.lit(604_800_000_000))
        )
        .withColumn(
            "n_touches",
            F.count(F.lit(1)).over(W.partitionBy("purchase_id")),
        )
    )
    return touch.groupBy("click_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        _r4(F.sum(F.lit(1.0) / F.col("n_touches"))).alias("credit"),
    )


@_q(
    "psi_value_drift",
    """
    WITH src AS (
      SELECT CASE WHEN epoch_us(ts) % 2 = 0 THEN 'ref' ELSE 'cur' END AS half,
             LEAST(GREATEST(CAST(FLOOR(value / 100.0) AS INT), 0), 9) AS bin
      FROM events WHERE value IS NOT NULL),
    c AS (SELECT half, bin, COUNT(*) AS n FROM src GROUP BY half, bin),
    t AS (SELECT half, SUM(n) AS tot FROM c GROUP BY half),
    bins AS (SELECT UNNEST(generate_series(0, 9)) AS bin),
    p AS (SELECT b.bin,
                 COALESCE(r.n, 0) / CAST(tr.tot AS DOUBLE) AS p_ref,
                 COALESCE(u.n, 0) / CAST(tc.tot AS DOUBLE) AS p_cur
          FROM bins b
          LEFT JOIN (SELECT bin, n FROM c WHERE half = 'ref') r USING (bin)
          LEFT JOIN (SELECT bin, n FROM c WHERE half = 'cur') u USING (bin)
          CROSS JOIN (SELECT tot FROM t WHERE half = 'ref') tr
          CROSS JOIN (SELECT tot FROM t WHERE half = 'cur') tc),
    sm AS (SELECT bin, p_ref, p_cur,
                  (GREATEST(p_cur, 0.0001) - GREATEST(p_ref, 0.0001))
                    * LN(GREATEST(p_cur, 0.0001) / GREATEST(p_ref, 0.0001))
                    AS term
           FROM p)
    SELECT bin, ROUND(p_ref, 4) AS p_ref, ROUND(p_cur, 4) AS p_cur,
           ROUND(term, 6) AS psi_term,
           ROUND(SUM(term) OVER (), 4) AS psi_total
    FROM sm
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two slices of the event-value
    distribution (even vs odd microsecond — a deterministic stand-in for
    reference vs current snapshot): per-bin contribution and the total
    PSI — the standard ML-ops drift gate (<0.1 stable, >0.25 retrain).
    Zero-count bins floor at 1e-4 (the conventional PSI smoothing). Two
    map-side histograms onto 10 fixed bins; everything after is
    constant-size."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    half = F.when(
        F.unix_micros(F.col("ts").cast("timestamp")) % 2 == 0, "ref"
    ).otherwise("cur")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / 100.0).cast("int"), F.lit(0)),
        F.lit(9),
    )
    c = (
        ev.select(half.alias("half"), bin_.alias("bin"))
        .groupBy("half", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.groupBy("half").agg(F.sum("n").alias("tot"))
    bins = spark.range(0, 10).select(F.col("id").cast("int").alias("bin"))
    r = c.filter(F.col("half") == "ref").select("bin", F.col("n").alias("nr"))
    u = c.filter(F.col("half") == "cur").select("bin", F.col("n").alias("nc"))
    tr = t.filter(F.col("half") == "ref").select(F.col("tot").alias("tot_r"))
    tc = t.filter(F.col("half") == "cur").select(F.col("tot").alias("tot_c"))
    p = (
        bins.join(F.broadcast(r), "bin", "left")
        .join(F.broadcast(u), "bin", "left")
        .crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(tc))
        .select(
            "bin",
            (F.coalesce(F.col("nr"), F.lit(0)) / F.col("tot_r").cast("double")).alias("p_ref"),
            (F.coalesce(F.col("nc"), F.lit(0)) / F.col("tot_c").cast("double")).alias("p_cur"),
        )
    )
    pr = F.greatest(F.col("p_ref"), F.lit(0.0001))
    pc = F.greatest(F.col("p_cur"), F.lit(0.0001))
    term = (pc - pr) * F.log(pc / pr)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return p.withColumn("term", term).select(
        "bin",
        _r4(F.col("p_ref")).alias("p_ref"),
        _r4(F.col("p_cur")).alias("p_cur"),
        F.round(F.col("term"), 6).alias("psi_term"),
        _r4(F.sum("term").over(wall)).alias("psi_total"),
    )


@_q(
    "rfm_customer_segments",
    """
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       DATE '1999-01-01') AS recency_d,
             COUNT(*) AS frequency,
             ROUND(SUM(o_totalprice), 4) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT custkey, recency_d, frequency, monetary,
             NTILE(5) OVER (ORDER BY recency_d DESC, custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency, custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary, custkey) AS m_score
      FROM rfm)
    SELECT custkey, CAST(recency_d AS INT) AS recency_d,
           CAST(frequency AS BIGINT) AS frequency, monetary,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                  THEN 'champion'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days before the epoch
    close), order frequency, and monetary total, each quintile-scored
    (NTILE with id tie-breaks for cross-engine determinism) and rolled
    into the standard champion/new/at-risk/hibernating labels — the
    composite warehouse segmentation every CRM feed runs. NTILE is
    rank-based (position, not value), so the scale-safe form is an EXACT
    global rank per metric via the hierarchical range-shard row_number
    (operators/hierarchical.py — no single-task global window), then the
    NTILE position formula over the driver-known row count: bit-identical
    to ``NTILE(5) OVER (ORDER BY ...)`` with the same id tie-breaks."""
    from .operators.hierarchical import hierarchical_row_number, ntile_from_rank

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("1999-01-01").cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("recency_d"),
        F.count(F.lit(1)).alias("frequency"),
        _r4(F.sum("o_totalprice")).alias("monetary"),
    )
    ranked = hierarchical_row_number(
        rfm, [F.col("recency_d").desc(), F.col("custkey")], "_r_rn"
    )
    ranked = hierarchical_row_number(
        ranked, [F.col("frequency"), F.col("custkey")], "_f_rn"
    )
    ranked = hierarchical_row_number(
        ranked, [F.col("monetary"), F.col("custkey")], "_m_rn"
    )
    n_cust = ranked.count()  # reads the final localCheckpoint — cheap
    scored = ranked.select(
        "custkey",
        F.col("recency_d").cast("int").alias("recency_d"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
        ntile_from_rank(F.col("_r_rn"), n_cust, 5).cast("int").alias("r_score"),
        ntile_from_rank(F.col("_f_rn"), n_cust, 5).cast("int").alias("f_score"),
        ntile_from_rank(F.col("_m_rn"), n_cust, 5).cast("int").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            F.lit("champion"),
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), F.lit("new"))
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), F.lit("at_risk"))
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2),
            F.lit("hibernating"),
        )
        .otherwise(F.lit("regular"))
    )
    return scored.withColumn("segment", seg)


@_q(
    "corpus_zipf_heaps",
    """
    WITH t AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok
               FROM documents),
    agg AS (SELECT source, COUNT(*) AS n_tokens,
                   COUNT(DISTINCT tok) AS n_vocab
            FROM t GROUP BY source),
    tf AS (SELECT source, tok, COUNT(*) AS f FROM t GROUP BY source, tok),
    rk AS (SELECT source, tok, f,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY f DESC, tok) AS r
           FROM tf),
    top AS (SELECT source, LN(CAST(r AS DOUBLE)) AS x,
                   LN(CAST(f AS DOUBLE)) AS y
            FROM rk WHERE r <= 50),
    ols AS (SELECT source, COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM top GROUP BY source)
    SELECT a.source,
           CAST(a.n_tokens AS BIGINT) AS n_tokens,
           CAST(a.n_vocab AS BIGINT) AS n_vocab,
           ROUND(LN(CAST(a.n_vocab AS DOUBLE))
                 / LN(CAST(a.n_tokens AS DOUBLE)), 4) AS heaps_beta,
           ROUND((o.sxy - o.n * o.mx * o.my)
                 / (o.sxx - o.n * o.mx * o.mx), 4) AS zipf_slope
    FROM agg a JOIN ols o ON a.source = o.source
    """,
)
def corpus_zipf_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-linguistics health diagnostics per source: Heaps' exponent
    proxy (log vocab / log tokens — vocabulary growth; too low ⇒
    boilerplate, too high ⇒ noise/gibberish) and the Zipf slope (OLS on
    the log-log top-50 rank/frequency curve; natural text sits near −1).
    Two keyed aggregations + a 50-row-per-source regression — the
    corpus-level screen run before committing a crawl source to
    training."""
    from open_ftth_relational_projector_spark.functions.text import tokens

    docs = scattered(load_table(spark, sf_dir, "documents"))
    t = docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    agg = t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_vocab"),
    )
    tf = t.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("f"))
    wrk = W.partitionBy("source").orderBy(F.col("f").desc(), F.col("tok"))
    top = (
        tf.withColumn("r", F.row_number().over(wrk))
        .filter(F.col("r") <= 50)
        .select(
            "source",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("f").cast("double")).alias("y"),
        )
    )
    ols = top.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")) / (
        F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx")
    )
    return agg.join(F.broadcast(ols), "source").select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_vocab").cast("long").alias("n_vocab"),
        _r4(
            F.log(F.col("n_vocab").cast("double"))
            / F.log(F.col("n_tokens").cast("double"))
        ).alias("heaps_beta"),
        _r4(slope).alias("zipf_slope"),
    )


@_q(
    "acctbal_distribution_ranks",
    """
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def acctbal_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution position of every customer's balance within its
    market segment: PERCENT_RANK ((rank−1)/(n−1)) and CUME_DIST — the
    relative-standing analytics (plain keyed windows, one shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        _r4(F.percent_rank().over(w)).alias("pct_rank"),
        _r4(F.cume_dist().over(w)).alias("cume_dist"),
    )


@_q(
    "item_item_similarity",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT l_partkey, COUNT(*) AS n_orders FROM li GROUP BY l_partkey),
    co AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2),
    sim AS (
      SELECT co.pa, co.pb,
             ROUND(co.n_ab / SQRT(na.n_orders * CAST(nb.n_orders AS DOUBLE)), 4)
               AS cosine
      FROM co
      JOIN n na ON co.pa = na.l_partkey
      JOIN n nb ON co.pb = nb.l_partkey),
    top AS (
      SELECT pa, pb, cosine,
             ROW_NUMBER() OVER (PARTITION BY pa
                                ORDER BY cosine DESC, pb) AS rnk
      FROM sim)
    SELECT pa AS part_a, pb AS part_b, cosine, CAST(rnk AS INT) AS rnk
    FROM top WHERE rnk <= 3
    """,
)
def item_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering precompute: cosine similarity of
    parts over the order-basket incidence (n_ab/√(n_a·n_b)), top-3
    neighbors per part — the classic recommender neighborhood table. The
    pair expansion is keyed on the basket id (quadratic only within a
    basket, the same skew contract as part_cooccurrence_top_pairs); the
    count vectors broadcast back onto the pair table."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sim = (
        co.join(
            F.broadcast(n.select(F.col("l_partkey").alias("pa"),
                                 F.col("n_orders").alias("na"))), "pa"
        )
        .join(
            F.broadcast(n.select(F.col("l_partkey").alias("pb"),
                                 F.col("n_orders").alias("nb"))), "pb"
        )
        .select(
            "pa",
            "pb",
            _r4(
                F.col("n_ab")
                / F.sqrt(F.col("na") * F.col("nb").cast("double"))
            ).alias("cosine"),
        )
    )
    wtop = W.partitionBy("pa").orderBy(F.col("cosine").desc(), F.col("pb"))
    return (
        sim.withColumn("rnk", F.row_number().over(wtop))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "cosine",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@_q(
    "part_cooccurrence_top_pairs",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_orders
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders
    FROM pairs
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 25
    """,
)
def part_cooccurrence_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought in the same order,
    top-25 by support — the self-join keyed on the basket id, quadratic
    ONLY within a basket (baskets are small; a hot basket is the skew to
    cap, same contract as the shingle inverted index)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(25)
    )


@_q(
    "calendar_monthly_rollup",
    """
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
      FROM events),
    spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds),
    cal AS (
      SELECT day,
             CAST(date_part('year', day) AS INT) AS year,
             CAST(date_part('month', day) AS INT) AS month,
             CAST(date_part('isodow', day) AS INT) AS iso_dow
      FROM spine),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             SUM(value) AS v
      FROM events GROUP BY 1)
    SELECT cal.year, cal.month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN cal.iso_dow >= 6 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_weekend_days,
           CAST(COALESCE(SUM(daily.n), 0) AS BIGINT) AS n_events,
           ROUND(COALESCE(SUM(daily.v), 0), 4) AS total_value
    FROM cal LEFT JOIN daily USING (day)
    GROUP BY cal.year, cal.month
    """,
)
def calendar_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformed calendar dimension generated as a date SPINE (sequence
    between the corpus bounds — days with no events still exist, the
    property a GROUP BY over facts alone loses) joined to daily facts and
    rolled up monthly with weekend accounting. Spine generation is one
    F.sequence over a 2-row bound aggregate — no external table."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    cal = spine.select(
        "day",
        F.year("day").alias("year"),
        F.month("day").alias("month"),
        F.dayofweek("day").alias("_dow"),  # Sun=1..Sat=7
    ).withColumn(
        "iso_dow",
        F.when(F.col("_dow") == 1, 7).otherwise(F.col("_dow") - 1),
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )
    return (
        cal.join(daily, "day", "left")
        .groupBy("year", "month")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(
                F.when(F.col("iso_dow") >= 6, 1).otherwise(0)
            ).alias("n_weekend_days"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_events"),
            _r4(F.coalesce(F.sum("v"), F.lit(0.0))).alias("total_value"),
        )
    )


@_q(
    "user_activity_streaks",
    """
    WITH du AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    grp AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INT) AS island
      FROM du),
    streaks AS (
      SELECT user_id, COUNT(*) AS len FROM grp
      GROUP BY user_id, island)
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user longest run of CONSECUTIVE active days
    (day minus per-user rank is constant within an island — the classic
    trick turning consecutiveness into a grouping key; one keyed window +
    two keyed aggregations, no self-join)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = du.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@_q(
    "lang_source_chisq",
    """
    WITH obs AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
    rows_m AS (SELECT lang, SUM(o) AS rt FROM obs GROUP BY lang),
    cols_m AS (SELECT source, SUM(o) AS ct FROM obs GROUP BY source),
    tot AS (SELECT SUM(o) AS n FROM obs),
    ex AS (
      SELECT o.lang, o.source, o.o,
             r.rt * c.ct / CAST(t.n AS DOUBLE) AS e
      FROM obs o JOIN rows_m r USING (lang) JOIN cols_m c USING (source)
      CROSS JOIN tot t)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM((o - e) * (o - e) / e), 4) AS chi_square,
           CAST((SELECT COUNT(*) FROM rows_m) - 1 AS BIGINT)
             * ((SELECT COUNT(*) FROM cols_m) - 1) AS dof
    FROM ex
    """,
)
def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for (lang × source) — the
    profiling check for whether corpus slices are confounded (a source
    that only speaks one language biases per-source sampling). Expected
    counts from broadcast row/column marginals; the statistic folds in
    one pass over the contingency cells."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rows_m = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    cols_m = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    ex = (
        obs.join(F.broadcast(rows_m), "lang")
        .join(F.broadcast(cols_m), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "e", F.col("rt") * F.col("ct") / F.col("n").cast("double")
        )
    )
    n_rows = rows_m.count()
    n_cols = cols_m.count()
    return ex.agg(
        F.count(F.lit(1)).alias("n_cells"),
        _r4(
            F.sum(
                (F.col("o") - F.col("e"))
                * (F.col("o") - F.col("e"))
                / F.col("e")
            )
        ).alias("chi_square"),
        F.lit((n_rows - 1) * (n_cols - 1)).cast("long").alias("dof"),
    )


@_q(
    "kwic_snippets",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                 FROM documents),
    hits AS (
      SELECT doc_id,
             UNNEST([i FOR i IN range(1, len(t) + 1)
                     IF t[i] = 'window']) AS pos,
             t
      FROM tok)
    SELECT doc_id, CAST(pos AS INT) AS pos,
           array_to_string(
             t[GREATEST(pos - 3, 1):LEAST(pos + 3, len(t))], ' ')
             AS snippet
    FROM hits
    """,
)
def kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context extraction: every occurrence of the term with
    ±3 tokens of context — the corpus-inspection tool behind filter-rule
    debugging (is 'window' a UI word or an SQL word here?). Row-local
    array ops (positions via filtered sequence, snippet via slice), one
    explode — map-only at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    from open_ftth_relational_projector_spark.functions.text import let, tokens

    def hits_of(toks):
        idx = F.filter(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.element_at(toks, i) == F.lit("window"),
        )
        return F.transform(
            idx,
            lambda p: F.struct(
                p.alias("pos"),
                F.array_join(
                    F.slice(
                        toks,
                        F.greatest(p - 3, F.lit(1)),
                        F.least(p + 3, F.size(toks))
                        - F.greatest(p - 3, F.lit(1))
                        + 1,
                    ),
                    " ",
                ).alias("snippet"),
            ),
        )

    return (
        docs.select(
            "doc_id",
            F.explode(let(tokens(F.col("text")), hits_of)).alias("h"),
        )
        .select(
            "doc_id",
            F.col("h.pos").cast("int").alias("pos"),
            F.col("h.snippet").alias("snippet"),
        )
    )


@_q(
    "user_value_trend",
    """
    WITH px AS (
      SELECT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 86400000000.0
               AS x,
             value AS y
      FROM events WHERE event_type = 'purchase'),
    s AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM px GROUP BY user_id)
    SELECT user_id, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope
    FROM s WHERE n >= 5 AND (n * sxx - sx * sx) > 1e-9
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of purchase value over time (closed-form slope
    from one grouped pass of the five sufficient statistics — time in
    fractional days so the normal-equation denominator keeps precision).
    The groupwise-regression shape: no per-key fitting loop, one
    map-side-combined aggregation at any scale."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    x = (
        F.unix_micros(F.col("ts").cast("timestamp")).cast("double")
        / F.lit(86400000000.0)
    )
    px = ev.select("user_id", x.alias("x"), F.col("value").alias("y"))
    s = px.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return (
        s.filter((F.col("n") >= 5) & (denom > 1e-9))
        .select("user_id", F.col("n").cast("long").alias("n"),
                _r4(slope).alias("slope"))
    )


@_q(
    "ab_test_zscore",
    """
    WITH arms AS (
      SELECT user_id,
             CASE WHEN substr(md5(user_id || '#exp1'), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id),
    agg AS (
      SELECT arm, COUNT(*) AS n, SUM(converted) AS conv
      FROM arms GROUP BY arm),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n END) AS na,
        MAX(CASE WHEN arm = 'A' THEN conv END) AS ca,
        MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
        MAX(CASE WHEN arm = 'B' THEN conv END) AS cb
      FROM agg)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
           ROUND((ca / CAST(na AS DOUBLE)) - (cb / CAST(nb AS DOUBLE)), 4)
             AS lift,
           ROUND(((ca / CAST(na AS DOUBLE)) - (cb / CAST(nb AS DOUBLE)))
                 / SQRT(((ca + cb) / CAST(na + nb AS DOUBLE))
                        * (1 - (ca + cb) / CAST(na + nb AS DOUBLE))
                        * (1.0 / na + 1.0 / nb)), 4) AS z
    FROM wide
    """,
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic md5 arm split (the same
    engine-portable assignment as hash_split — an experiment framework
    must reproduce its arms everywhere): per-arm conversion, lift, and the
    pooled-variance z statistic — the experimentation readout, computed
    from two grouped passes and a 2-row pivot."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit("#exp1"))),
            1,
            1,
        )
        < "8",
        "A",
    ).otherwise("B")
    # conversion = any HIGH-VALUE purchase: every user purchases
    # eventually, which would give pooled p = 1 and zero variance
    arms = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", arm)
    agg = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = agg.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    pa = F.col("ca") / F.col("na").cast("double")
    pb = F.col("cb") / F.col("nb").cast("double")
    pp = (F.col("ca") + F.col("cb")) / (
        F.col("na") + F.col("nb")
    ).cast("double")
    z = (pa - pb) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return wide.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("conv_b"),
        _r4(pa - pb).alias("lift"),
        _r4(z).alias("z"),
    )


@_q(
    "top_user_journey_prefixes",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    j AS (
      SELECT user_id,
             string_agg(event_type, ' > ' ORDER BY rn) AS journey
      FROM seq WHERE rn <= 3 GROUP BY user_id)
    SELECT journey, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM j GROUP BY journey
    ORDER BY n_users DESC, journey
    LIMIT 15
    """,
)
def top_user_journey_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top first-3-event journeys: each user's opening event-type sequence
    folded to a path string, ranked by frequency — the onboarding-funnel
    readout. One keyed window + ordered string_agg (ORDER BY inside the
    aggregate keeps the path deterministic on both engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    j = (
        seq.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                " > ",
            ).alias("journey")
        )
    )
    return (
        j.groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "journey")
        .limit(15)
    )


@_q(
    "dedup_strategy_matrix",
    """
    WITH ex AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY md5(text)) < doc_id AS exact_dup
      FROM documents),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 generate_series(1, GREATEST(LEN(t) - 2, 0)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS ni
      FROM sh a JOIN sh b ON a.shingle = b.shingle
                          AND a.doc_id <> b.doc_id
      GROUP BY 1, 2),
    jd AS (
      SELECT DISTINCT i.u AS doc_id FROM inter i
      JOIN sizes sa ON i.u = sa.doc_id
      JOIN sizes sb ON i.v = sb.doc_id
      WHERE i.ni / CAST(sa.n + sb.n - i.ni AS DOUBLE) >= 0.2
        AND i.v < i.u)
    SELECT d.doc_id,
           ex.exact_dup,
           jd.doc_id IS NOT NULL AS jaccard_dup,
           ex.exact_dup = (jd.doc_id IS NOT NULL) AS strategies_agree
    FROM documents d
    JOIN ex USING (doc_id)
    LEFT JOIN jd USING (doc_id)
    """,
)
def dedup_strategy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-strategy agreement matrix: per doc, the EXACT-hash verdict
    beside the n-gram-Jaccard (τ=0.2) verdict and whether they agree —
    the measurement that tells you what fuzzy matching adds over exact
    (exact ⊂ jaccard: identical texts share all shingles). Drop rule in
    both: a LOWER-id duplicate exists."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    wex = W.partitionBy(F.md5(F.col("text")))
    ex = docs.select(
        "doc_id",
        (F.min("doc_id").over(wex) < F.col("doc_id")).alias("exact_dup"),
    )
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.2, n=3)
    jd = (
        pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_jd", F.lit(True))
    )
    return (
        ex.join(jd, "doc_id", "left")
        .select(
            "doc_id",
            "exact_dup",
            F.coalesce(F.col("is_jd"), F.lit(False)).alias("jaccard_dup"),
            (
                F.col("exact_dup")
                == F.coalesce(F.col("is_jd"), F.lit(False))
            ).alias("strategies_agree"),
        )
    )


@_q(
    "jaccard_pairs_prefix_filtered",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b,
           ROUND(n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.3
    """,
)
def jaccard_pairs_prefix_filtered_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs/PPJoin prefix-filtered EXACT similarity join
    (functions/dedup.jaccard_pairs_prefix_filtered): the oracle is the
    SAME full-inverted-index SQL shape as ngram_jaccard_pairs (at τ=0.3)
    — prefix filtering is lossless, only the candidate set shrinks."""
    # threshold 0.3: prefix filtering is a HIGH-threshold technique —
    # at t the prefix is ~(1−t) of the set, so t=0.05 degenerates to the
    # full index plus overhead (measured: 9.2 s vs 2.5 s at sf0.1)
    out = D.jaccard_pairs_prefix_filtered(
        scattered(load_table(spark, sf_dir, "documents")),
        threshold=0.3,
        n=3,
    )
    return out.select("doc_a", "doc_b", _r4(F.col("jaccard")).alias("jaccard"))


def _pq_sub_ctes(j: int, lo: int, hi: int) -> str:
    """The kmeans CTE chain (k=4, iters=2 — see _KMEANS_CTES) restricted
    to subspace ``j`` = embedding positions [lo, hi]; suffixed so two
    chains coexist in one statement."""
    return f"""
    pe{j} AS (
      SELECT vec_id, pos, val FROM (
        SELECT vec_id,
               UNNEST(range(1, len(embedding) + 1)) AS pos,
               UNNEST(CAST(embedding AS DOUBLE[])) AS val
        FROM embeddings)
      WHERE pos BETWEEN {lo} AND {hi}),
    c0{j} AS (SELECT i.cid, p.pos, ROUND(p.val, 6) AS cv
              FROM pqinit i JOIN pe{j} p USING (vec_id)),
    d1{j} AS (SELECT p.vec_id, c.cid,
                     SUM((p.val - c.cv) * (p.val - c.cv)) AS d2
              FROM pe{j} p JOIN c0{j} c USING (pos) GROUP BY 1, 2),
    a1{j} AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cid) AS rn
                FROM d1{j}) WHERE rn = 1),
    c1{j} AS (SELECT a.cid, p.pos, ROUND(AVG(p.val), 6) AS cv
              FROM a1{j} a JOIN pe{j} p USING (vec_id) GROUP BY 1, 2),
    d2t{j} AS (SELECT p.vec_id, c.cid,
                      SUM((p.val - c.cv) * (p.val - c.cv)) AS d2
               FROM pe{j} p JOIN c1{j} c USING (pos) GROUP BY 1, 2),
    a2{j} AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cid) AS rn
                FROM d2t{j}) WHERE rn = 1),
    c2{j} AS (SELECT a.cid, p.pos, ROUND(AVG(p.val), 6) AS cv
              FROM a2{j} a JOIN pe{j} p USING (vec_id) GROUP BY 1, 2),
    d3{j} AS (SELECT p.vec_id, c.cid,
                     SUM((p.val - c.cv) * (p.val - c.cv)) AS d2
              FROM pe{j} p JOIN c2{j} c USING (pos) GROUP BY 1, 2),
    a3{j} AS (SELECT vec_id, cid, d2 FROM (
                SELECT vec_id, cid, d2,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cid) AS rn
                FROM d3{j}) WHERE rn = 1)"""


_PQ_SQL = (
    """
    WITH pqinit AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),"""
    + ",".join([_pq_sub_ctes(1, 1, 32), _pq_sub_ctes(2, 33, 64)])
    + """
    SELECT a.vec_id,
           CAST(a.cid AS INT) AS code_1,
           CAST(b.cid AS INT) AS code_2,
           ROUND(SQRT(a.d2 + b.d2), 4) AS recon_err
    FROM a31 a JOIN a32 b USING (vec_id)
    """
)


@_q("pq_codes", _PQ_SQL)
def pq_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011): two per-subspace k-means
    codebooks (same fixed-point Lloyd contract as kmeans_cluster_stats),
    per-vector code tuple + reconstruction error
    (functions/clustering.pq_codes); the oracle unrolls BOTH codebook
    trainings in one statement."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        pq_codes,
    )

    return pq_codes(
        scattered(load_table(spark, sf_dir, "embeddings")),
        m=2,
        k=4,
        iters=2,
        dim=64,
    )


_PQ_ADC_SQL = (
    """
    WITH pqinit AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),"""
    + ",".join([_pq_sub_ctes(1, 1, 32), _pq_sub_ctes(2, 33, 64)])
    + """,
    qd1 AS (
      SELECT q.vec_id AS query_id, c.cid,
             ROUND(SUM((q.val - c.cv) * (q.val - c.cv)), 6) AS d
      FROM pe1 q JOIN c21 c USING (pos)
      WHERE q.vec_id % 100 = 0 GROUP BY 1, 2),
    qd2 AS (
      SELECT q.vec_id AS query_id, c.cid,
             ROUND(SUM((q.val - c.cv) * (q.val - c.cv)), 6) AS d
      FROM pe2 q JOIN c22 c USING (pos)
      WHERE q.vec_id % 100 = 0 GROUP BY 1, 2),
    scored AS (
      SELECT qd1.query_id, a.vec_id AS neighbor_id, qd1.d + qd2.d AS adist
      FROM a31 a
      JOIN a32 b ON a.vec_id = b.vec_id
      JOIN qd1 ON qd1.cid = a.cid
      JOIN qd2 ON qd2.query_id = qd1.query_id AND qd2.cid = b.cid
      WHERE a.vec_id <> qd1.query_id)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adist, neighbor_id) AS rnk
      FROM scored) WHERE rnk <= 5
    """
)


@_q("pq_knn_adc", _PQ_ADC_SQL)
def pq_knn_adc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance kNN over PQ codes (clustering.pq_knn_adc): the
    corpus is represented only by centroid-id tuples; query→centroid
    lookup tables (rounded 6 dp, the fixed-point contract) rank the
    codes. The oracle unrolls both codebooks and replays the LUT ranking."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        pq_knn_adc,
    )

    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return pq_knn_adc(emb, queries, m=2, k=4, iters=2, knn_k=5, dim=64)


@_q(
    "conversion_survival_curve",
    """
    WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS sus FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS pus
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.sus
          GROUP BY e.user_id),
    life AS (SELECT s.user_id,
                    CAST(FLOOR((p.pus - s.sus) / 86400000000.0) AS INT)
                      AS conv_day
             FROM s LEFT JOIN p ON s.user_id = p.user_id),
    days AS (SELECT UNNEST(generate_series(0, 13)) AS day),
    km AS (
      SELECT d.day,
             (SELECT COUNT(*) FROM life
              WHERE conv_day IS NULL OR conv_day >= d.day) AS n_at_risk,
             (SELECT COUNT(*) FROM life WHERE conv_day = d.day) AS n_conv
      FROM days d),
    hz AS (SELECT day, n_at_risk, n_conv,
                  CASE WHEN n_at_risk > 0
                       THEN n_conv / CAST(n_at_risk AS DOUBLE)
                       ELSE 0.0 END AS h
           FROM km)
    SELECT day, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_conv AS BIGINT) AS n_conv,
           ROUND(h, 4) AS hazard,
           ROUND(CASE WHEN MAX(CASE WHEN h >= 1.0 THEN 1 ELSE 0 END)
                        OVER w = 1
                      THEN 0.0
                      ELSE EXP(SUM(CASE WHEN h < 1.0 THEN LN(1.0 - h)
                                        ELSE 0.0 END) OVER w)
                 END, 4) AS survival
    FROM hz
    WINDOW w AS (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def conversion_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Kaplan-Meier conversion curve: per day since first
    signup, users still unconverted (at risk), conversions that day, the
    hazard, and the KM survival product — the time-to-event view of the
    signup→purchase funnel (censored users never leave the risk set).
    The day spine is a 14-row literal; per-day counts come from one pass
    over per-user lifetimes (a tiny table after the two min-aggregates);
    the KM product is a running sum of logs over 14 rows."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("sus"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s), "user_id")
        .filter(F.col("us") > F.col("sus"))
        .groupBy("user_id")
        .agg(F.min("us").alias("pus"))
    )
    life = s.join(p, "user_id", "left").select(
        "user_id",
        F.floor((F.col("pus") - F.col("sus")) / F.lit(86_400_000_000.0))
        .cast("int")
        .alias("conv_day"),
    )
    days = spark.range(0, 14).select(F.col("id").cast("int").alias("day"))
    joined = days.crossJoin(F.broadcast(life))
    km = joined.groupBy("day").agg(
        F.sum(
            F.when(
                F.col("conv_day").isNull() | (F.col("conv_day") >= F.col("day")),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_at_risk"),
        F.sum(
            F.when(F.col("conv_day") == F.col("day"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_conv"),
    )
    h = F.when(
        F.col("n_at_risk") > 0,
        F.col("n_conv") / F.col("n_at_risk").cast("double"),
    ).otherwise(F.lit(0.0))
    wkm = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    ln_term = F.when(
        F.col("h") < 1.0, F.log(F.lit(1.0) - F.col("h"))
    ).otherwise(F.lit(0.0))
    hit_one = F.max(
        F.when(F.col("h") >= 1.0, F.lit(1)).otherwise(F.lit(0))
    ).over(wkm)
    survival = F.when(hit_one == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(ln_term).over(wkm))
    )
    return (
        km.withColumn("h", h)
        .select(
            "day",
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("n_conv").cast("long").alias("n_conv"),
            _r4(F.col("h")).alias("hazard"),
            _r4(survival).alias("survival"),
        )
    )


@_q(
    "cusum_changepoints",
    """
    WITH s AS (SELECT event_id, user_id, value,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    mu AS (SELECT user_id, ROUND(AVG(value), 2) AS mu FROM s
           GROUP BY user_id),
    c AS (SELECT s.event_id, s.user_id,
                 ROUND(SUM(s.value - mu.mu)
                         OVER (PARTITION BY s.user_id ORDER BY s.us, s.event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       6) AS cusum
          FROM s JOIN mu USING (user_id)),
    r AS (SELECT user_id, event_id, cusum,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ABS(cusum) DESC, event_id) AS rn
          FROM c)
    SELECT user_id, event_id AS changepoint_event,
           ROUND(cusum, 4) AS peak_cusum
    FROM r WHERE rn = 1
    """,
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point location per user: running sum of deviations
    from the user's own mean peaks (in absolute value) where the series'
    level shifts — the classic drift/regime-change locator for metric
    monitoring. Per-iteration ROUND(…, 6) before the argmax is the usual
    cross-engine determinism contract; one keyed window + one broadcast
    mean join, no self-join."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    # mu quantized to 2 dp: the engines' AVG differs at ~1e-10 and the
    # running sum amplifies it by k (row index) — at sf0.1 that is ~1e-5
    # noise on every cusum, enough to cross ANY output quantum near a
    # boundary. With an identical mu the running sums are bit-identical
    # (both engines accumulate the ordered frame sequentially), so the
    # target itself must carry the determinism, not the output rounding.
    mu = ev.groupBy("user_id").agg(F.round(F.avg("value"), 2).alias("mu"))
    wrun = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = (
        ev.join(F.broadcast(mu), "user_id")
        .withColumn(
            "cusum",
            F.round(F.sum(F.col("value") - F.col("mu")).over(wrun), 6),
        )
    )
    wpick = W.partitionBy("user_id").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("event_id")
    )
    return (
        c.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("changepoint_event"),
            _r4(F.col("cusum")).alias("peak_cusum"),
        )
    )


@_q(
    "ewma_user_values",
    """
    WITH s AS (SELECT event_id, user_id, value,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    arr AS (SELECT event_id, user_id,
                   list(value) OVER (PARTITION BY user_id ORDER BY us, event_id
                                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                     AS a
            FROM s)
    SELECT event_id, user_id,
           ROUND(
             list_sum(list_transform(a, (x, i) -> x * pow(0.7, len(a) - i)))
             / list_sum(list_transform(a, (x, i) -> pow(0.7, len(a) - i))),
             4) AS ewma
    FROM arr
    """,
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.3, pandas adjust=True
    normalization) over each user's trailing 20 events — the recency-
    weighted smoother. The recursion is unrolled as a JVM array fold over
    the windowed value list (collect_list frame → F.transform weights →
    aggregate), zero Python; the oracle runs the identical fold with
    DuckDB list lambdas (its 1-based index mirrors the 0-based Spark
    exponent)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-19, 0)
    )
    decay = F.lit(0.7)
    arr = ev.withColumn("a", F.collect_list("value").over(w))
    m = F.size(F.col("a"))
    weighted = F.aggregate(
        F.transform(
            F.col("a"),
            lambda x, i: x * F.pow(decay, (m - 1 - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.aggregate(
        F.transform(
            F.col("a"),
            lambda x, i: F.pow(decay, (m - 1 - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return arr.select(
        "event_id", "user_id", _r4(weighted / norm).alias("ewma")
    )


@_q(
    "exact_median_twopass",
    """
    SELECT CAST(COUNT(l_extendedprice) AS BIGINT) AS n,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median
    FROM lineitem
    """,
)
def exact_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median of the whole l_extendedprice column via the two-pass
    histogram refinement (operators/median.exact_median_two_pass):
    map-side 1024-bin histogram → driver locates the middle bins (O(bins)
    state) → rank only those bins' rows. The technique that gets exact
    order statistics on a column too big to sort as one group; the oracle
    is DuckDB's quantile_cont."""
    from open_ftth_relational_projector_spark.operators.median import (
        exact_median_two_pass,
    )

    li = load_table(spark, sf_dir, "lineitem")
    n, med = exact_median_two_pass(li, "l_extendedprice")
    return spark.createDataFrame(
        [(n, round(med, 4))], "n long, median double"
    )


@_q(
    "benford_price_audit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT c.digit, CAST(c.n AS BIGINT) AS n,
           ROUND(c.n / CAST(t.total AS DOUBLE), 4) AS observed_frac,
           ROUND(LOG10(1.0 + 1.0 / c.digit), 4) AS benford_frac,
           ROUND(ABS(c.n / CAST(t.total AS DOUBLE)
                     - LOG10(1.0 + 1.0 / c.digit)), 4) AS abs_dev
    FROM c CROSS JOIN t
    """,
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    data-forensics screen for fabricated or truncated numeric columns.
    First digit extracted via integer-string arithmetic (FLOOR·100 →
    BIGINT → first char) so both engines agree bit-for-bit where
    double→string formatting would not; observed digit shares vs
    log10(1+1/d) expectation. One groupBy onto ≤9 cells + a broadcast
    scalar total — map-side at any scale."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = (
        F.substring(
            F.floor(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = orders.select(digit).groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    obs = F.col("n") / F.col("total").cast("double")
    ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            _r4(obs).alias("observed_frac"),
            _r4(ben).alias("benford_frac"),
            _r4(F.abs(obs - ben)).alias("abs_dev"),
        )
    )


@_q(
    "fd_violation_profile",
    """
    WITH a AS (
      SELECT 'custkey->orderpriority' AS fd,
             o_custkey AS lhs, o_orderpriority AS rhs FROM orders),
    b AS (
      SELECT 'custkey->orderstatus', o_custkey, o_orderstatus FROM orders),
    c AS (
      SELECT 'orderkey->custkey', o_orderkey, CAST(o_custkey AS VARCHAR)
      FROM orders),
    u AS (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c),
    g AS (SELECT fd, lhs, COUNT(DISTINCT rhs) AS nd, COUNT(*) AS n
          FROM u GROUP BY fd, lhs)
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
             AS rows_in_violation,
           CAST(MAX(nd) AS BIGINT) AS max_distinct_rhs
    FROM g GROUP BY fd
    """,
)
def fd_violation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery profile: candidate FDs X→Y scored
    by groups where X maps to >1 distinct Y — the schema-inference/data-
    profiling pass (does this column determine that one?) that feeds key
    detection and normalization decisions. One groupBy per candidate over
    a unioned long form, linear at any scale; 'orderkey->custkey' is the
    planted TRUE dependency (0 violations expected), the others are
    deliberately false."""
    orders = load_table(spark, sf_dir, "orders")

    def cand(name: str, lhs: str, rhs):
        return orders.select(
            F.lit(name).alias("fd"),
            F.col(lhs).alias("lhs"),
            rhs.alias("rhs"),
        )

    u = (
        cand("custkey->orderpriority", "o_custkey", F.col("o_orderpriority"))
        .unionByName(cand("custkey->orderstatus", "o_custkey", F.col("o_orderstatus")))
        .unionByName(
            cand("orderkey->custkey", "o_orderkey", F.col("o_custkey").cast("string"))
        )
    )
    g = u.groupBy("fd", "lhs").agg(
        F.countDistinct("rhs").alias("nd"), F.count(F.lit(1)).alias("n")
    )
    viol = F.when(F.col("nd") > 1, F.lit(1)).otherwise(F.lit(0))
    return g.groupBy("fd").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(viol).cast("long").alias("violating_groups"),
        F.sum(F.when(F.col("nd") > 1, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_in_violation"),
        F.max("nd").cast("long").alias("max_distinct_rhs"),
    )


@_q(
    "fk_fanout_audit",
    """
    WITH fan AS (
      SELECT o.o_orderkey, COUNT(l.l_orderkey) AS n_items
      FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey),
    orphans AS (
      SELECT COUNT(*) AS n FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parents,
           CAST(MIN(n_items) AS BIGINT) AS min_fanout,
           ROUND(AVG(n_items), 4) AS avg_fanout,
           CAST(MAX(n_items) AS BIGINT) AS max_fanout,
           CAST(SUM(CASE WHEN n_items = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_childless,
           (SELECT CAST(n AS BIGINT) FROM orphans) AS n_orphan_children
    FROM fan
    """,
)
def fk_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key fanout audit for orders→lineitem: per-parent child
    counts (min/avg/max — the max IS the join-skew bound), childless
    parents, and orphaned children — the data-modeling health check that
    predicts join behavior before a query ever runs."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    fan = (
        orders.join(
            lineitem,
            orders["o_orderkey"] == lineitem["l_orderkey"],
            "left",
        )
        .groupBy(orders["o_orderkey"])
        .agg(F.count(lineitem["l_orderkey"]).alias("n_items"))
    )
    n_orphans = (
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti"
        ).count()
    )
    return fan.agg(
        F.count(F.lit(1)).alias("n_parents"),
        F.min("n_items").alias("min_fanout"),
        _r4(F.avg("n_items")).alias("avg_fanout"),
        F.max("n_items").alias("max_fanout"),
        F.sum(F.when(F.col("n_items") == 0, 1).otherwise(0)).alias(
            "n_childless"
        ),
        F.lit(n_orphans).cast("long").alias("n_orphan_children"),
    )


@_q(
    "table_content_fingerprints",
    """
    WITH nh AS (
      SELECT ('0x' || substr(md5(n_nationkey || '|' || n_name || '|'
                                 || n_regionkey), 1, 15))::BIGINT AS h
      FROM nation),
    rh AS (
      SELECT ('0x' || substr(md5(r_regionkey || '|' || r_name), 1, 15))::BIGINT
        AS h
      FROM region)
    SELECT 'nation' AS "table",
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(h % 1000000007) % 1000000007 AS BIGINT) AS content_sum
    FROM nh
    UNION ALL
    SELECT 'region', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(h % 1000000007) % 1000000007 AS BIGINT)
    FROM rh
    """,
)
def table_content_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content fingerprint: each row hashes to a
    portable md5-derived 60-bit value, summed into one DECIMAL per table —
    the cross-system reconciliation primitive (compare against a warehouse
    copy without moving rows; any single changed/missing/extra row moves
    the sum). Dimension tables only here: integer/string columns
    stringify identically on every engine, which float columns do not —
    the documented contract."""
    out = None
    for name, cols in (
        ("nation", ["n_nationkey", "n_name", "n_regionkey"]),
        ("region", ["r_regionkey", "r_name"]),
    ):
        t = load_table(spark, sf_dir, name)
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        # modular sum keeps the fingerprint in BIGINT on every engine
        # (a raw sum of 60-bit hashes overflows, and DECIMAL accumulators
        # trip the driver's typed hasher — the q12 class)
        agg = t.select((h % F.lit(1000000007)).alias("h")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("h") % F.lit(1000000007)).cast("long").alias("content_sum"),
        ).select(
            F.lit(name).alias("table"), "n_rows", "content_sum"
        )
        out = agg if out is None else out.unionByName(agg)
    return out


@_q(
    "grouping_sets_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice), 4) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (neither ROLLUP nor CUBE expresses this
    combination: each single-column marginal plus the grand total, but NOT
    the cross product): one Expand-node pass, identical GROUPING-bit
    semantics on both engines. Completes the grouping-construct family
    beside rollup_lineitem_status and cube_orders_status_priority."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            _r4(F.sum("l_extendedprice")).alias("revenue"),
        )
    )


@_q(
    "null_safe_segment_join",
    """
    WITH l AS (
      SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
             COUNT(*) AS n_customers
      FROM customer GROUP BY 1),
    r AS (
      SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
             ROUND(AVG(c_acctbal), 4) AS avg_bal
      FROM customer GROUP BY 1)
    SELECT COALESCE(l.seg, '(null)') AS segment, l.n_customers, r.avg_bal
    FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg
    """,
)
def null_safe_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    group — here the deliberately nulled-out BUILDING segment — must MATCH
    itself across the two aggregates, which a plain equi-join silently
    drops. The classic silent-data-loss trap in merge keys with nullable
    columns."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    lhs = c.groupBy(seg.alias("seg")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    rhs = c.groupBy(seg.alias("seg")).agg(
        _r4(F.avg("c_acctbal")).alias("avg_bal")
    )
    return lhs.join(
        rhs, lhs["seg"].eqNullSafe(rhs["seg"])
    ).select(
        F.coalesce(lhs["seg"], F.lit("(null)")).alias("segment"),
        "n_customers",
        "avg_bal",
    )


@_q(
    "revenue_share_of_region",
    """
    WITH nrev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2)
    SELECT region, nation,
           ROUND(revenue, 4) AS revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY region), 4)
             AS share_of_region
    FROM nrev
    """,
)
def revenue_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent: each nation's revenue as a share of its region's
    total via a partitioned window sum over the already-aggregated frame
    (25 rows — the window never touches the fact table). Dims broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nrev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = W.partitionBy("region")
    return nrev.select(
        "region",
        "nation",
        _r4(F.col("revenue")).alias("revenue"),
        _r4(F.col("revenue") / F.sum("revenue").over(w)).alias(
            "share_of_region"
        ),
    )


@_q(
    "forward_filled_values",
    """
    WITH gapped AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE ROUND(value, 4) END AS v
      FROM events)
    SELECT event_id, user_id,
           v AS raw_value,
           LAST_VALUE(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value,
           v IS NULL AS was_gap
    FROM gapped
    """,
)
def forward_filled_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): every 7th reading
    deterministically nulled, then imputed from the user's most recent
    non-null value via LAST_VALUE ... IGNORE NULLS over an ordered frame —
    the time-series gap-repair primitive; leading gaps legitimately stay
    null. One keyed window, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
        _r4(F.col("value"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    g = ev.select("event_id", "user_id", "ts", v.alias("v"))
    return g.select(
        "event_id",
        "user_id",
        F.col("v").alias("raw_value"),
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        F.col("v").isNull().alias("was_gap"),
    )


def _interp_sql() -> str:
    return """
    WITH gapped AS (
      SELECT event_id, user_id, epoch_us(ts)::BIGINT AS us,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE ROUND(value, 4) END AS v
      FROM events),
    ctx AS (
      SELECT event_id, user_id, us, v,
             LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
             LAST_VALUE(us_v IGNORE NULLS) OVER wp AS pus,
             FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
             FIRST_VALUE(us_v IGNORE NULLS) OVER wn AS nus
      FROM (SELECT event_id, user_id, us,
                   v, CASE WHEN v IS NOT NULL THEN us END AS us_v
            FROM gapped) g
      WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id, v AS raw_value,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * ((us - pus) / CAST(nus - pus AS DOUBLE))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv END, 4) AS filled_value,
           CASE WHEN v IS NOT NULL THEN 'observed'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                WHEN pv IS NOT NULL THEN 'locf'
                WHEN nv IS NOT NULL THEN 'nocb'
                ELSE 'none' END AS fill_kind
    FROM ctx
    """


# NOTE: the pus/nus columns must come from the same non-null rows as
# pv/nv; LAST_VALUE(us IGNORE NULLS) over all rows would grab the
# current row's us. The oracle therefore masks us to us_v first — see
# the Spark twin below for the same guard.
@_q("linear_interpolated_values", _interp_sql())
def linear_interpolated_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over deterministic gaps (every 7th reading
    nulled): interior gaps are filled proportionally in event time
    between the neighboring observations, edges degrade to LOCF/NOCB,
    all-null groups stay null — pandas' interpolate(limit_direction=
    'both') semantics without extrapolation, as two keyed window passes
    (no self-join); ``fill_kind`` labels the imputation used."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
        _r4(F.col("value"))
    )
    g = ev.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        v.alias("v"),
    ).withColumn("us_v", F.when(F.col("v").isNotNull(), F.col("us")))
    wp = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    pv = F.last("v", ignorenulls=True).over(wp)
    pus = F.last("us_v", ignorenulls=True).over(wp)
    nv = F.first("v", ignorenulls=True).over(wn)
    nus = F.first("us_v", ignorenulls=True).over(wn)
    both = pv.isNotNull() & nv.isNotNull()
    interp = pv + (nv - pv) * (
        (F.col("us") - pus) / (nus - pus).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(both, interp)
        .when(pv.isNotNull(), pv)
        .otherwise(nv)
    )
    kind = (
        F.when(F.col("v").isNotNull(), F.lit("observed"))
        .when(both, F.lit("interp"))
        .when(pv.isNotNull(), F.lit("locf"))
        .when(nv.isNotNull(), F.lit("nocb"))
        .otherwise(F.lit("none"))
    )
    return g.select(
        "event_id",
        "user_id",
        F.col("v").alias("raw_value"),
        _r4(filled).alias("filled_value"),
        kind.alias("fill_kind"),
    )


# ===========================================================================
# Registration order for the driver window
# ===========================================================================
# ROUND-4 WINDOW PLAN (for the next session): lead with q1, then EVERY
# query registered after the r3 window froze — none has held a driver row
# yet. As of end-r3 that is (a) the ~30 entries from kmeans_cluster_stats
# through part_cooccurrence_top_pairs in source order (clustering/DSIR/
# PageRank/bigram-LM/curation, sketches, audio, SCD2/time-weighted,
# snapshot-diff/histogram/zorder, transitions/WAU, expectations, ER,
# PIT-features/negative-samples, winsorize/k-anon/z-score/baskets,
# DLQ/pseudonymization, hybrid RRF, incremental dedup, winnowing,
# label propagation, triangles, mixture/length-bucket sampling), and
# (b) the late-r3 additions that did NOT take a window slot this round:
# cms_join_size_estimate, unpivot_lineitem_measures, kcenter_coreset,
# asof_forward_error_recovery, attribution_last_touch,
# merged_order_activity_periods, linear_interpolated_values,
# knn_label_noise, fd_violation_profile, benford_price_audit,
# kmv_segment_overlap, exact_median_twopass, ewma_user_values,
# cusum_changepoints, conversion_survival_curve, weighted_purchase_paths,
# item_item_similarity, acctbal_distribution_ranks, corpus_zipf_heaps,
# rfm_customer_segments, psi_value_drift, attribution_linear_multitouch,
# kcore_purchase_graph, peak_concurrent_sessions, dow_seasonality_index
# (the five
# late-r3 additions that DID take slots — bfs/kmv/skyline/mad/
# sorted_neighborhood — will hold r3 rows). The window holds 50: fill
# the remainder with the r2-green families whose last green row is
# oldest. Keep every name in _DRIVER_WINDOW_FRONT registered (the
# assert below enforces it).
#
# The driver's CORRECTNESS gate records only the FIRST 50 queries() entries
# per round. The windows rotate so that across rounds every query holds a
# recent green row. Round 3 leads with q1 (the entry() flagship), then the
# six queries NEW this round (the fiber-cable projection sim and the five
# hard-verification twins for the approximate dedup/ANN paths), then the 29
# queries whose green rows are r1-only (regression cover: proj_*_sim,
# walk-hop, windows, asof, text basics), then the five approximate
# rows-only queries (recorded beside their now-oracled twins), with the
# remaining slots spot-checking the biggest r2-green families.
_DRIVER_WINDOW_FRONT = [
    # Round 4: the catalog holds 187 queries but the driver checks only the
    # first 50 per round; r1∪r2∪r3 green rows cover 99, leaving 88 that have
    # never held a driver row (all rest on local check_oracle.py sweeps at
    # sf0.01 + sf0.1). Per the round-3 verdict, this round's window spends
    # every slot except the q1 flagship on never-checked queries, leading
    # with the families carrying the most logic (iterative graph, sketches,
    # time-series, TPC-H joins, slowly-changing dimensions, dedup/ANN, text
    # stats). Round 5 takes the remaining 39 plus regression spot-checks.
    "q1_pricing_summary",
    # -- iterative graph --
    "kcore_purchase_graph",
    "weighted_purchase_paths",
    "pagerank_purchase_graph",
    "dedup_graph_triangles",
    "knn_label_propagation",
    # -- sketches --
    "kmv_segment_overlap",
    "cms_join_size_estimate",
    "cms_heavy_hitters",
    "bloom_decontamination",
    "approx_distinct_users",
    # -- time series --
    "ewma_user_values",
    "cusum_changepoints",
    "linear_interpolated_values",
    "forward_filled_values",
    "conversion_survival_curve",
    "rolling_zscore_anomalies",
    "rolling_7d_active_users",
    "time_weighted_user_value",
    "user_activity_streaks",
    # -- TPC-H joins never driver-checked --
    "q2_min_cost_supplier",
    "q8_market_share",
    "q11_important_part_values",
    "q20_part_promo_suppliers",
    # -- temporal / dimensional modeling --
    "scd2_user_value_history",
    "snapshot_diff_orders",
    "point_in_time_features",
    "merged_order_activity_periods",
    "peak_concurrent_sessions",
    # -- de-globalized this round: first driver rows post-fix --
    "rfm_customer_segments",
    "jaccard_pairs_prefix_filtered",
    # -- dedup / ER / ANN --
    "containment_near_dups",
    "winnow_fingerprints",
    "semantic_dedup_verdicts",
    "customer_er_candidates",
    "pq_codes",
    "pq_knn_adc",
    "incremental_dedup_report",
    "dedup_strategy_matrix",
    # -- clustering --
    "kmeans_cluster_stats",
    "kcenter_coreset",
    # -- text / corpus analysis --
    "tfidf_cosine_pairs",
    "bigram_lm_doc_scores",
    "corpus_zipf_heaps",
    "lang_source_chisq",
    # -- statistical audits --
    "benford_price_audit",
    "psi_value_drift",
    "exact_median_twopass",
    "winsorized_value_stats",
    "ab_test_zscore",
]


def _apply_driver_window_order() -> None:
    assert all(n in SPARK_QUERIES for n in _DRIVER_WINDOW_FRONT), [
        n for n in _DRIVER_WINDOW_FRONT if n not in SPARK_QUERIES
    ]
    rest = [n for n in SPARK_QUERIES if n not in _DRIVER_WINDOW_FRONT]
    order = _DRIVER_WINDOW_FRONT + rest
    for d in (SPARK_QUERIES, ORACLE_SQL):
        reordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(reordered)


_apply_driver_window_order()
