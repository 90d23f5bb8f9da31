"""Relational operator coverage over the TPC-H-ish tables (SURVEY.md §2.1
scans, §2.4 aggregations A1-A6, §2.5 joins J1-J3, §2.6 sorts/top-k T1).

These exercise the Catalyst-native surface the engine relies on: pushed-down
filters, partial aggregation, broadcast-join selection, window top-k. Float
aggregates are rounded (2-6 dp) so cross-engine value hashes are stable under
summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from colbert_spark.sources.tables import load_table


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by order revenue per market segment: broadcast dim join
    + window top-k with deterministic tie-break."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("revenue"))
    )
    joined = rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc(F.round(F.col("revenue"), 6)), F.asc("c_custkey")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            "c_mktsegment",
            "rank",
            "c_custkey",
            F.round("revenue", 2).alias("revenue_r"),
        )
    )


def priority_counts_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style left-semi join: order priorities having returned items."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way broadcast join chain + aggregation: customers per region."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


ORACLES = {
    "tpch_q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "revenue_topk_per_segment": """
        WITH rev AS (
          SELECT o_custkey, sum(o_totalprice) AS revenue
          FROM orders GROUP BY o_custkey),
        ranked AS (
          SELECT c.c_mktsegment, c.c_custkey, rev.revenue,
                 row_number() OVER (PARTITION BY c.c_mktsegment
                                    ORDER BY round(rev.revenue, 6) DESC, c.c_custkey) AS rank
          FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey)
        SELECT c_mktsegment, rank::BIGINT AS rank, c_custkey,
               round(revenue, 2) AS revenue_r
        FROM ranked WHERE rank <= 5
    """,
    "priority_counts_semijoin": """
        SELECT o_orderpriority, count(*)::BIGINT AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "nation_region_rollup": """
        SELECT r.r_name, count(*)::BIGINT AS n_customers,
               round(sum(c.c_acctbal), 2) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
    """,
}

QUERIES = {
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "revenue_topk_per_segment": revenue_topk_per_segment,
    "priority_counts_semijoin": priority_counts_semijoin,
    "nation_region_rollup": nation_region_rollup,
}
