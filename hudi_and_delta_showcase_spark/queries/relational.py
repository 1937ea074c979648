"""Relational operator inventory (SURVEY.md §2.1-2.8) over the driver's
star schema, each paired with a DuckDB oracle.

Design note on floats: SUM/AVG over doubles is order-dependent, and Spark
and DuckDB aggregate in different orders. Every aggregate over a double
column therefore casts elements to DECIMAL first (exact, order-independent)
and casts the final aggregate back to DOUBLE — both engines then produce
bit-identical values. Per-row double arithmetic (same IEEE expression tree)
is deterministic cross-engine and needs no such treatment.

Scale notes: all queries are single declarative plans — Catalyst handles
filter pushdown into parquet, nested column pruning, broadcast for the
dimension tables (region/nation/supplier are tiny at any SF; customer/part
stay broadcastable well past sf100), and AQE re-plans skewed shuffles.
Top-k uses ORDER BY + LIMIT which Spark executes as TakeOrderedAndProject
(per-partition heap + driver merge — no global sort shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.queries.cdc_queries import CUTOFF
from hudi_and_delta_showcase_spark.queries.registry import query


def _dec(col: str, prec: int = 18, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({prec},{scale})")


def _cents(col: str) -> F.Column:
    """Exact 2dp money value -> BIGINT cents. Integer arithmetic stays
    inside whole-stage codegen (decimal ops are object-path and ~3x
    slower per row, measured on q1: 1.5s -> 0.5s at sf0.1); sums and
    products of cents are exact integers, so the final decimal division
    + double cast below reproduces the oracle's decimal aggregation
    bit-for-bit."""
    return F.expr(f"cast(round({col} * 100) as bigint)")


def _exact_money(sum_col: F.Column, scale_pow: int) -> F.Column:
    """SUM of integer-scaled money -> DOUBLE with a SINGLE rounding:
    exact integer sum -> exact decimal -> divide by 10^scale_pow
    (exact, the quotient's scale fits) -> one cast to double — the same
    exact rational, rounded once, that the oracle's decimal-sum +
    double cast produces. (A double division of a >2^53 integer would
    round twice.)

    Overflow-safe WITHOUT a decimal accumulator: a single bigint
    F.sum over scale_pow=4/6 products (per-row magnitude ~1e11) would
    silently wrap around 1e8 rows per group (TPC-H sf>=100) — or throw
    under ANSI. Instead each term is split x = hi*2^20 + lo via
    arithmetic shift + mask (exact two's-complement identity for either
    sign; lo in [0, 2^20)) and the two parts are summed as longs:
    lo < 2^20 and |hi| <= |x|/2^20 <= ~1e5 for 1e11-magnitude terms,
    so both partial sums stay in int64 to ~8e12 rows per group — far
    past any real scale — while the per-row work (shift, mask, two
    long sums) stays inside whole-stage codegen. The parts recombine
    losslessly in decimal(38,0) before the one exact division."""
    hi = F.sum(F.shiftright(sum_col, 20))
    lo = F.sum(sum_col.bitwiseAND(F.lit(0xFFFFF).cast("bigint")))
    exact = hi.cast("decimal(38,0)") * (1 << 20) + lo.cast("decimal(38,0)")
    return (exact / (10 ** scale_pow)).cast("double")


# ---------------------------------------------------------------------------
# Flagship: latest-change-per-key (reference C5/A1/J1 —
# /root/reference/README.md:1215-1221: per-key max-timestamp aggregate
# inner-joined back to the batch), re-aimed at the events table.
# ---------------------------------------------------------------------------


@query(
    "latest_change_per_key",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value
    FROM events e
    INNER JOIN (
        SELECT user_id, max(ts) AS max_ts FROM events GROUP BY user_id
    ) m ON e.user_id = m.user_id AND e.ts = m.max_ts
    """,
    tags=("cdc", "agg", "join"),
    bench=True,
)
def latest_change_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest change per key via groupBy-max + self equi-join (J1+A1).

    The per-key aggregate side is small (one row per key) so Catalyst
    broadcast-joins it back against the full batch — no second shuffle of
    the big side beyond the aggregation's own exchange.
    """
    events = load_table(spark, sf_dir, "events")
    latest = events.groupBy("user_id").agg(F.max("ts").alias("max_ts"))
    return (
        events.alias("e")
        .join(
            F.broadcast(latest).alias("m"),
            (F.col("e.user_id") == F.col("m.user_id"))
            & (F.col("e.ts") == F.col("m.max_ts")),
            "inner",
        )
        .select("e.event_id", "e.user_id", "e.ts", "e.event_type", "e.value")
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped aggregation / join pipeline queries (A1, J1, P-family)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
               * ((1 - CAST(l_discount AS DECIMAL(10,2)))
                  * (1 + CAST(l_tax AS DECIMAL(10,2))))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide grouped aggregate with arithmetic, filter
    pushed to the parquet scan. Partial (map-side) aggregation keeps the
    shuffle at |groups| rows per task regardless of SF."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz")
    )
    qty, price = _cents("l_quantity"), _cents("l_extendedprice")
    disc, tax = _cents("l_discount"), _cents("l_tax")
    hundred = F.lit(100)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _exact_money(qty, 2).alias("sum_qty"),
        _exact_money(price, 2).alias("sum_base_price"),
        _exact_money(price * (hundred - disc), 4).alias("sum_disc_price"),
        _exact_money(price * ((hundred - disc) * (hundred + tax)), 6)
        .alias("sum_charge"),
        (_exact_money(qty, 2) / F.count(F.lit(1))).alias("avg_qty"),
        (_exact_money(disc, 2) / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter -> fact joins -> grouped
    agg -> top-k. customer(filtered) broadcasts; lineitem never shuffles
    for the join, only for the final aggregate."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        l.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
               l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _exact_money(
                _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")),
                4,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_regional_revenue",
    oracle="""
    SELECT
      n.n_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON r.r_regionkey = n.n_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name ASC
    """,
    tags=("join", "agg"),
    bench=True,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. All dimension sides broadcast;
    lineitem is the only large input and it is scanned exactly once."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == n.n_nationkey),
        )
        .groupBy("n_name")
        .agg(
            _exact_money(
                _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")),
                4,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate. Every predicate is a plain
    column comparison, so all four push into the parquet reader (row-group
    min/max skipping does the heavy lifting at scale) and the aggregate is
    a single map-side partial + 1-row final — the cheapest possible shape
    for a 100 TB revenue probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _exact_money(
                _cents("l_extendedprice") * _cents("l_discount"), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q12_priority_by_status",
    oracle="""
    SELECT l.l_linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("join", "agg"),
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode folded to linestatus — the fixture ships
    the trimmed column set): date-filtered fact joined to orders, priority
    bucketed with a codegen'd CASE, two conditional sums in ONE pass.
    The lineitem filter pushes down; no join hint on orders — AQE
    broadcasts it while it fits and shuffles when it doesn't."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.00 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("join", "agg"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share. One month of lineitem (pushed-down
    range) joins broadcast part; conditional + total revenue come out of
    the SAME aggregate pass (no second scan), division at the end.
    Decimal-exact so the ratio is bit-stable across engines."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    disc = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    promo = F.when(
        F.col("p_type").like("PROMO%"), disc
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.00)
                * _exact_money(promo, 4)
                / _exact_money(disc, 4)
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderdate ASC, o.o_orderkey ASC
    LIMIT 100
    """,
    tags=("join", "agg", "topk"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders. The HAVING subquery is ONE grouped
    aggregate over lineitem whose survivors (a tiny key set) broadcast as
    a semi-join filter — lineitem is scanned twice but never shuffled for
    the probe; the final agg shuffles only the filtered remnant. Top-k is
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("s"))
        .filter(F.col("s") > 250 * 100)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_exact_money(_cents("l_quantity"), 2).alias("sum_qty"))
        .withColumn("o_totalprice", _dec("o_totalprice").cast("double"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(
            F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(100)
    )


@query(
    "q19_bracketed_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "filter", "agg"),
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive bracketed predicate over the trimmed
    part columns): three OR'd brand/size/quantity brackets evaluated as
    one join filter. Per-side conjuncts (quantity ranges on lineitem,
    brand/size on part) are derivable by Catalyst's constraint
    propagation; the join stays a single broadcast hash join with the
    residual disjunction as its condition — no union-of-three-joins
    blowup, no second scan of either table."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .filter(bracket)
        .agg(
            _exact_money(
                _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")),
                4,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("join", "agg", "semi"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (late-shipment EXISTS over the trimmed column set):
    the correlated EXISTS compiles to a LEFT SEMI join — lineitem is
    probed once, never materialized into the aggregate, and the order
    date filter pushes into both scans (the semi join's own predicate
    l_shipdate > o_orderdate stays a join condition, not a fabricated
    cross filter)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_regionkey = 0 AND cn.n_regionkey = 1)
        OR (sn.n_regionkey = 1 AND cn.n_regionkey = 0))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY sn.n_name, cn.n_name, YEAR(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two REGIONS by
    year (region pairs stay populated at every fixture SF; a single
    nation pair is empty at sf0.001).
    True dimensions broadcast (nation appears TWICE under different
    aliases — two independent broadcast joins, not a self-join
    shuffle); orders carries no hint — a hard broadcast would OOM past
    the SF where it outgrows memory, so AQE decides per run;
    the nation-pair disjunction is a residual filter after both nation
    joins; lineitem's date range pushes down."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
        F.col("n_regionkey").alias("sn_region"),
    )
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("cn_region"),
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    pair = (
        (F.col("sn_region") == 0) & (F.col("cn_region") == 1)
    ) | ((F.col("sn_region") == 1) & (F.col("cn_region") == 0))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            _exact_money(
                _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")),
                4,
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_rev AS (
      SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      WHERE p.p_type LIKE 'PROMO%'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_rev
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue per
    year. Conditional and total volume come from the SAME decimal
    aggregate pass; all dimensions broadcast; the part-type filter
    prunes lineitem through the join (Catalyst pushes the semi-join
    effect of the selective dimension)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    sn = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    vol = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == sn.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                _exact_money(
                    F.when(F.col("n_name") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("bigint")
                    ),
                    4,
                )
                / _exact_money(vol, 4)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most. Returnflag filter
    pushes into the lineitem scan; customer/orders/nation broadcast;
    top-20 by revenue is TakeOrderedAndProject. Orders carries no
    hint (AQE decides); the true dims broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _exact_money(
                _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")),
                4,
            ).alias("revenue")
        )
        .withColumn("c_acctbal", _dec("c_acctbal").cast("double"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over customers, with the join
    predicate INSIDE the left join (customers with no qualifying orders
    count as 0 — an outer-join filter would silently drop them). Two
    grouped aggregates; the second runs over |customers| rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("join", "agg", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's maximum revenue. The
    per-supplier aggregate is computed ONCE and the scalar max joins
    back as a 1-row broadcast (no window over all suppliers, no second
    lineitem scan). INTEGER (scaled-cents) revenue keeps the max
    comparison exact — a double tie at the top would be
    engine-dependent."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
        ).alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("total_rev"))
    return (
        revenue.join(F.broadcast(top), "total_rev")
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev").cast("decimal(38,0)") / 10000)
            .cast("double")
            .alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                           AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("join", "agg", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity order revenue. The correlated per-part
    average de-correlates into ONE grouped aggregate over lineitem
    joined back by part key — the standard Catalyst rewrite, expressed
    directly so the plan is one scan for averages plus one filtered
    scan, never a per-row subquery. The 0.2x threshold is computed
    decimal-sum / count -> double, the same expression tree DuckDB
    runs."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (
            F.lit(0.2)
            * (_exact_money(_cents("l_quantity"), 2) / F.count(F.lit(1)))
        ).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            _exact_money(_cents("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE)
            > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("join", "agg", "anti", "subquery"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nation standing in for phone country codes):
    above-average-balance customers with no URGENT orders. The NOT
    EXISTS is a LEFT ANTI join probing a filtered orders scan; the
    scalar average
    is a 1-row broadcast; the balance comparison happens in DECIMAL on
    both engines (an avg in double would make the > boundary
    engine-dependent)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (_exact_money(_cents("c_acctbal"), 2) / F.count(F.lit(1)))
            .alias("a")
        )
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter((_cents("c_acctbal") / F.lit(100.0)) > F.col("a"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _exact_money(_cents("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Join family (J1-J3 + the join types the reference delegates to Spark)
# ---------------------------------------------------------------------------


@query(
    "join_left_outer_counts",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "agg"),
)
def join_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one big order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the insert-routing half of upsert (SURVEY J3):
    customers with no order above 250k."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross_dims",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    tags=("join",),
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_range_theta",
    oracle="""
    SELECT p.p_partkey, p.p_size,
           COUNT(*) AS n_smaller
    FROM part p JOIN part q ON q.p_size < p.p_size
    WHERE p.p_partkey <= 50
    GROUP BY p.p_partkey, p.p_size
    """,
    tags=("join",),
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join: for each of the first 50 parts, count
    strictly smaller parts. Spark executes as BroadcastNestedLoopJoin with
    the filtered side broadcast."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    q = load_table(spark, sf_dir, "part").select(F.col("p_size").alias("q_size"))
    return (
        p.join(q, q.q_size < p.p_size)
        .groupBy("p_partkey", "p_size")
        .agg(F.count(F.lit(1)).alias("n_smaller"))
    )


# ---------------------------------------------------------------------------
# Aggregation family (A1-A3 + distinct/rollup/cube "free" coverage)
# ---------------------------------------------------------------------------


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _exact_money(_cents("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "agg_minmax_stats",
    oracle="""
    SELECT l_returnflag,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
           COUNT(DISTINCT l_suppkey) AS n_supp
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# Window functions (W1; reference expresses latest-per-key as A1+J1 — the
# window row_number form is our engine's preferred equivalent, SURVEY §2.5)
# ---------------------------------------------------------------------------


@query(
    "window_latest_per_key",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("window", "cdc"),
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number()==1 latest-per-key — the window form of C5/A3 and the
    merge-on-read resolution kernel. One shuffle on the key, no join."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "event_type", "value")
    )


@query(
    "window_rank_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_sessionize_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, SUM(new_s) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("window", "agg"),
)
def window_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH sessionization (the training-episode builder: group a
    user's event stream into sessions split at >30 min gaps) via the
    classic gap-marker + running-sum idiom: LAG flags session starts,
    a cumulative SUM numbers them, one aggregate summarizes. All three
    windows/aggregates share ONE hash partitioning on user_id — a
    single Exchange, the two window passes reuse its sort — so at
    100 TB this is one shuffle of the events table, not three. The
    streaming twin (session_window) is stream_session_windows; this is
    the batch/backfill path, numerically pinned against the SQL
    definition."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    marked = events.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "stats_drift_psi",
    oracle=f"""
    WITH pre AS (
      SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket, COUNT(*) AS n
      FROM events WHERE ts < TIMESTAMP '{CUTOFF}' GROUP BY 1
    ),
    post AS (
      SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket, COUNT(*) AS n
      FROM events WHERE ts >= TIMESTAMP '{CUTOFF}' GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT SUM(n) FROM pre) AS np, (SELECT SUM(n) FROM post) AS nq,
             (SELECT COUNT(*) FROM (
                SELECT bucket FROM pre UNION SELECT bucket FROM post)) AS b
    )
    SELECT bucket,
           COALESCE(pre.n, 0) AS n_pre,
           COALESCE(post.n, 0) AS n_post,
           round(
             ((COALESCE(pre.n, 0) + 1.0) / (np + b)
              - (COALESCE(post.n, 0) + 1.0) / (nq + b))
             * ln(((COALESCE(pre.n, 0) + 1.0) / (np + b))
                  / ((COALESCE(post.n, 0) + 1.0) / (nq + b))),
             9) AS psi_term
    FROM pre FULL OUTER JOIN post USING (bucket) CROSS JOIN tot
    """,
    tags=("agg", "stats"),
)
def stats_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two corpus slices (the data-ops
    monitor run before shipping a new training mix): per-bucket
    Population Stability Index terms of the ``value`` distribution,
    pre- vs post-cutoff, Laplace-smoothed so empty buckets stay
    finite. One scan, one tiny bucket aggregate each side, a
    bucket-count-sized join — map-side partials do all the work at
    100 TB. Terms rounded at 9dp so Spark's and DuckDB's libm ln()
    agree bit-for-bit; sum the column for the headline PSI (> 0.2 =
    actionable drift by the usual convention)."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50).cast("bigint").alias("bucket")
    cutoff = F.lit(CUTOFF).cast("timestamp_ntz")
    pre = (
        events.filter(F.col("ts") < cutoff).select(bucket)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_pre"))
    )
    post = (
        events.filter(F.col("ts") >= cutoff).select(bucket)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_post"))
    )
    both = (
        pre.join(post, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_pre", F.lit(0)).alias("n_pre"),
            F.coalesce("n_post", F.lit(0)).alias("n_post"),
        )
    )
    tot = both.agg(
        F.sum("n_pre").alias("np"),
        F.sum("n_post").alias("nq"),
        F.count(F.lit(1)).alias("b"),
    )
    p = (F.col("n_pre") + 1.0) / (F.col("np") + F.col("b"))
    q = (F.col("n_post") + 1.0) / (F.col("nq") + F.col("b"))
    return both.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_pre",
        "n_post",
        F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_value
    FROM events
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit ROWS frame. Decimal accumulation so
    the running total is exact (and engine-order-independent)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(_cents("value")).over(w).cast("decimal(38,0)") / 100)
        .cast("double")
        .alias("running_value"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           LAG(value, 2) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("value", 2).over(w).alias("prev2_value"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k / set ops (O1-O2 + free coverage)
# ---------------------------------------------------------------------------


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
    tags=("topk",),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps
    merged on the driver, never a full sort shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "set_ops_nations",
    oracle="""
    SELECT nk, 'both' AS src FROM (
      SELECT c_nationkey AS nk FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT nk, 'customer_only' AS src FROM (
      SELECT c_nationkey AS nk FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
    """,
    tags=("setop",),
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    both = c.intersect(s).withColumn("src", F.lit("both"))
    # subtract == EXCEPT (set semantics); exceptAll would keep multiplicities
    only = c.subtract(s).withColumn("src", F.lit("customer_only"))
    return both.unionByName(only)


@query(
    "union_all_tagged",
    oracle="""
    SELECT 'order' AS kind, o_orderkey AS key FROM orders
    UNION ALL
    SELECT 'line' AS kind, l_orderkey AS key FROM lineitem
    """,
    tags=("setop",),
)
def union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — the MoR base∪log read shape (SURVEY O2)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"), F.col("o_orderkey").alias("key")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        F.lit("line").alias("kind"), F.col("l_orderkey").alias("key")
    )
    return o.unionByName(l)


# ---------------------------------------------------------------------------
# Scalar function batteries (F1-F4 + free string/date/math/json coverage)
# ---------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           substring(p_name, 1, 8) AS name_pre,
           length(p_name) AS name_len,
           concat(p_brand, '#', p_type) AS brand_type,
           replace(p_brand, 'Brand', 'B') AS brand_short,
           ltrim(rtrim(p_name)) AS name_trim
    FROM part
    """,
    tags=("scalar",),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 8).alias("name_pre"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_brand", "Brand", "B").alias("brand_short"),
        F.trim(F.col("p_name")).alias("name_trim"),
    )


@query(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) AS odate
    FROM orders
    """,
    tags=("scalar",),
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 parity: the reference's only scalar transform is timestamp
    normalization (/root/reference/README.md:270-273); full date battery."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("timestamp_ntz")
        .alias("month_start"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )


@query(
    "scalar_unix_timestamp",
    oracle="""
    SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
    FROM events
    """,
    tags=("scalar", "cdc"),
)
def scalar_unix_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's normalize step: timestamp -> epoch seconds bigint
    (`unix_timestamp(col(...))`, /root/reference/README.md:270-273)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        ).alias("ts_epoch"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000.0) AS dist_from_50k,
           floor(l_quantity / 7) AS qty_bucket,
           ceil(l_extendedprice / 1000) AS price_k,
           CAST(l_quantity AS BIGINT) % 5 AS qty_mod,
           sqrt(l_quantity) AS qty_sqrt,
           l_extendedprice * (1.0 - l_discount) AS net
    FROM lineitem
    """,
    tags=("scalar",),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("dist_from_50k"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod"),
        F.sqrt(F.col("l_quantity")).alias("qty_sqrt"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("net"),
    )


@query(
    "scalar_case_when",
    oracle="""
    SELECT
      CASE WHEN o_totalprice >= 150000 THEN 'large'
           WHEN o_totalprice >= 50000 THEN 'medium'
           ELSE 'small' END AS size_class,
      o_orderstatus,
      COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
    tags=("scalar", "agg"),
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    size_class = (
        F.when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_class")
    )
    return o.groupBy(size_class, "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
    tags=("scalar",),
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_num"),
    )


@query(
    "array_explode_agg",
    oracle="""
    SELECT tok AS word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_type, ' ')) AS tok FROM part)
    GROUP BY tok
    """,
    tags=("scalar", "array"),
)
def array_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split -> explode -> count: the array/unnest kernel used throughout
    the text-analysis extensions."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "sql_catalog_roundtrip",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("catalog", "sql", "join", "agg"),
)
def sql_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/D1/D3/D5 catalog surface: register the fixture tables as temp
    views (createOrReplaceTempView — README.md:1206), verify them through
    SHOW TABLES / DROP TABLE IF EXISTS (README.md:1177; notebook cells
    17/30), then answer pure SQL through the session catalog — the
    reference's `spark.sql("select * from ...")` entry point
    (README.md:348,466,710)."""
    from hudi_and_delta_showcase_spark.io import register_views

    register_views(spark, sf_dir)
    # D1/D3: catalog maintenance round-trip on a scratch view
    spark.sql("CREATE OR REPLACE TEMP VIEW __scratch AS SELECT 1 AS x")
    listed = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert {"orders", "customer", "nation", "__scratch"} <= listed
    spark.sql("DROP TABLE IF EXISTS __scratch")
    spark.catalog.dropTempView("__scratch")
    return spark.sql(
        """
        SELECT n.n_name AS nation, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under rollup/cube) via
    the SQL surface — partial aggregation applies per grouping set."""
    from hudi_and_delta_showcase_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(user_id) AS min_user, MAX(user_id) AS max_user
    FROM events GROUP BY event_type
    """,
    tags=("agg", "skew"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation: event_type has very few distinct
    values (each key is hot by construction), so the partial stage on
    (event_type, salt-of-event_id) spreads every key over 16 reducers
    before the final merge. Result is exactly plain GROUP BY (decimal
    sums compose associatively)."""
    from hudi_and_delta_showcase_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_agg(
        events,
        keys=["event_type"],
        aggs={
            "n_events": ("count", "event_id"),
            "sum_dec": ("sum", "value_dec"),
            "min_user": ("min", "user_id"),
            "max_user": ("max", "user_id"),
        },
        salt_col="event_id",
        buckets=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("sum_dec").cast("double").alias("sum_value"),
        "min_user",
        "max_user",
    )


@query(
    "join_asof_events",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderdate AS asof_ts, o.o_orderkey AS asof_orderkey
    FROM events e
    ASOF JOIN r o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("join", "timeseries"),
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the user's most recent order at or
    before the event time — union+window implementation (one shuffle,
    no pair explosion) vs DuckDB's native ASOF JOIN as the oracle. The
    right side is pre-deduped to one row per (key, ts) so both engines
    resolve timestamp ties identically."""
    from hudi_and_delta_showcase_spark.operators.asof import as_of_join

    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    out = as_of_join(
        events, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_vals=["o_orderkey"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        "asof_ts", F.col("asof_o_orderkey").alias("asof_orderkey"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS price_p25,
           quantile_cont(l_extendedprice, 0.5) AS price_p50,
           quantile_cont(l_extendedprice, 0.95) AS price_p95,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition, so the
    doubles are bit-identical). Emitted as one scalar column per
    quantile — array cells crash generic pandas canonicalizers. The
    exact form is a sort-based aggregate; at 100 TB swap in
    approx_percentile (t-digest, mergeable sketch)."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE sort-based aggregate computing all three quantiles (a separate
    # percentile() per column would sort the group three times), split
    # into scalar columns afterwards
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25, 0.5, 0.95))"
            ).alias("__q"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            F.element_at("__q", 1).alias("price_p25"),
            F.element_at("__q", 2).alias("price_p50"),
            F.element_at("__q", 3).alias("price_p95"),
            "n",
        )
    )


@query(
    "rollup_hierarchical",
    oracle="""
    SELECT time_bucket(INTERVAL 1 DAY, ts) AS day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("agg", "window", "timeseries"),
)
def rollup_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: the DAILY aggregate is
    computed FROM the hourly rollup, not from raw events (sum-of-sums /
    sum-of-counts compose exactly with decimal accumulation). This is
    the continuous-aggregate pattern: materialize fine-grained buckets
    once, answer every coarser granularity from them."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("DAY", F.col("w.start")).alias("day"), "event_type"
        )
        .agg(F.sum("n").alias("n_events"), F.sum("s").alias("s"))
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            "event_type",
            "n_events",
            F.col("s").cast("double").alias("sum_value"),
        )
    )
    return daily


@query(
    "catalog_managed_table_roundtrip",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    tags=("catalog", "sql"),
)
def catalog_managed_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/D6: CREATE TABLE ... USING parquet + INSERT through the session
    catalog (the metastore-synced external-table path of the reference,
    README.md:1176-1181), then answer SQL from the MANAGED table and drop
    it. Round-trips real files under spark.sql.warehouse.dir."""
    import uuid

    from hudi_and_delta_showcase_spark.io import register_views

    register_views(spark, sf_dir)
    name = f"nation_managed_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE TABLE {name} USING parquet AS SELECT * FROM nation")
    try:
        out = spark.sql(
            f"SELECT n_regionkey, COUNT(*) AS n_nations FROM {name} "
            f"GROUP BY n_regionkey"
        )
        rows = out.collect()  # materialize before dropping the table
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    return spark.createDataFrame(rows, out.schema)


@query(
    "show_create_table",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations,
           TRUE AS ddl_ok, 3 AS n_cols
    FROM nation GROUP BY n_regionkey
    """,
    tags=("catalog", "sql", "ddl"),
)
def show_create_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: SHOW CREATE TABLE + DESCRIBE TABLE — the reference's only
    *timed* operation (its published numbers are Hive-CLI
    `SHOW CREATE TABLE` fetches, /root/reference/README.md:342,656,704).
    Creates a managed parquet table, round-trips the generated DDL
    (must name every column and the parquet provider), counts DESCRIBE
    rows, then answers SQL from the table. ``ddl_ok``/``n_cols`` fold
    the DDL assertions into the oracle-checked result so a regression
    in DDL generation flips the driver row red."""
    import uuid

    from hudi_and_delta_showcase_spark.io import register_views

    register_views(spark, sf_dir)
    name = f"nation_sct_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE TABLE {name} USING parquet AS SELECT * FROM nation")
    try:
        ddl = spark.sql(f"SHOW CREATE TABLE {name}").collect()[0][0]
        cols = [
            r.col_name
            for r in spark.sql(f"DESCRIBE TABLE {name}").collect()
            if r.col_name and not r.col_name.startswith("#")
        ]
        ddl_ok = (
            ddl.startswith("CREATE TABLE")
            and "USING parquet" in ddl
            and all(c in ddl for c in cols)
        )
        out = spark.sql(
            f"SELECT n_regionkey, COUNT(*) AS n_nations FROM {name} "
            f"GROUP BY n_regionkey"
        )
        rows = out.collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    return (
        spark.createDataFrame(rows, out.schema)
        .withColumn("ddl_ok", F.lit(bool(ddl_ok)))
        .withColumn("n_cols", F.lit(len(cols)))
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "timeseries"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame over event time: trailing-hour
    count and exact decimal sum per user. RANGE frames include all ties
    of the current ts — identical peer semantics in both engines."""
    from hudi_and_delta_showcase_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_1h,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           'type,uid' AS keys_sorted,
           event_type AS type_val,
           CAST(user_id AS VARCHAR) AS uid_val,
           2 AS n_entries,
           CAST(props->>'k' AS INT) AS k_from_json
    FROM events
    """,
    tags=("scalar", "map"),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function battery: create_map from columns, map_keys/size/
    element_at lookups, and from_json into map<string,int>. Keys are
    literals, so the oracle can state the expected extractions directly.
    map_keys output is concat_ws-serialized (scalar, canonicalizer-safe)."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    jm = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_sorted"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "uid").alias("uid_val"),
        F.size(m).alias("n_entries"),
        F.element_at(jm, "k").alias("k_from_json"),
    )


@query(
    "pivot_event_types",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
    tags=("agg", "pivot"),
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type with per-user counts. The pivot
    value list is EXPLICIT — at scale an implicit pivot runs an extra
    distinct-values job and the output schema depends on the data."""
    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .count()
    )
    # pivot leaves null where a group has no rows for the value
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ["click", "view", "purchase", "error"]],
    )


@query(
    "unpivot_nation_stats",
    oracle="""
    SELECT n_nationkey, 'name_len' AS metric,
           CAST(length(n_name) AS BIGINT) AS value
    FROM nation
    UNION ALL
    SELECT n_nationkey, 'regionkey', CAST(n_regionkey AS BIGINT) FROM nation
    """,
    tags=("scalar", "pivot"),
)
def unpivot_nation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide columns to (metric, value) rows — the
    inverse reshaping operator."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.length("n_name").cast("long").alias("name_len"),
        F.col("n_regionkey").cast("long").alias("regionkey"),
    )
    return n.unpivot(
        ["n_nationkey"], ["name_len", "regionkey"], "metric", "value"
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS colocated_ok
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join", "catalog", "bucketing"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — THE shuffle elimination tool for
    repeated large-table joins at 100 TB: both sides are written
    ``bucketBy(8, join_key)`` + ``sortBy`` into the catalog, so the join
    is bucket-to-bucket with NO Exchange on either side (each task joins
    one bucket pair; at scale, re-bucketing once amortizes across every
    downstream join on that key). ``colocated_ok`` folds the physical-
    plan assertion (bucketed scans on both sides, zero shuffle Exchange
    under the join) into the oracle-checked output, so a planner
    regression flips the driver row red.

    Auto-broadcast is disabled for the probe (and restored after): at
    fixture scale Catalyst would rightly broadcast the small side, but
    the plan under test is the 100 TB one where NEITHER side fits in
    memory and bucket-to-bucket SMJ is the only shuffle-free option."""
    import uuid

    from hudi_and_delta_showcase_spark.io import load_table

    sfx = uuid.uuid4().hex[:8]
    bo, bc = f"b_orders_{sfx}", f"b_customer_{sfx}"
    load_table(spark, sf_dir, "orders").write.bucketBy(
        8, "o_custkey"
    ).sortBy("o_custkey").mode("overwrite").saveAsTable(bo)
    load_table(spark, sf_dir, "customer").write.bucketBy(
        8, "c_custkey"
    ).sortBy("c_custkey").mode("overwrite").saveAsTable(bc)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table(bo).join(
            spark.table(bc),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        colocated = (
            "Exchange hashpartitioning" not in plan
            and plan.count("Bucketed: true") == 2
        )
        out = (
            j.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
            .withColumn("colocated_ok", F.lit(colocated))
        )
        rows = out.collect()
        schema = out.schema
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {bo}")
        spark.sql(f"DROP TABLE IF EXISTS {bc}")
    return spark.createDataFrame(rows, schema)


@query(
    "join_dynamic_partition_pruning",
    oracle="""
    SELECT e.event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           TRUE AS dpp_in_plan
    FROM events e
    WHERE e.event_type IN ('click', 'purchase')
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    tags=("join", "scan", "partition"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the events fact is laid out
    hive-partitioned on event_type, then joined to a FILTERED tiny
    dimension. Catalyst injects a runtime ``dynamicpruning`` subquery
    into the fact scan, so only the dimension-selected partitions are
    read — the feature that makes star joins on 100 TB partitioned
    fact tables read O(selected partitions) instead of O(table). The
    plan assertion is folded into the oracle row; results must equal
    the equivalent static filter."""
    import tempfile

    events = load_table(spark, sf_dir, "events")
    fact_path = tempfile.mkdtemp(prefix="dpp_") + "/events_part"
    events.write.partitionBy("event_type").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("click", "web"), ("purchase", "web"), ("error", "ops")],
        "event_type string, channel string",
    ).filter(F.col("channel") == "web")
    out = (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _exact_money(_cents("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    return out.withColumn(
        "dpp_in_plan", F.lit("dynamicpruning" in plan.lower())
    )


# ---------------------------------------------------------------------------
# r6: TPC-H Q2/Q9/Q11/Q16/Q20/Q21 shapes over the trimmed star schema.
# The fixture has no partsupp table, so the partsupp-dependent queries are
# re-aimed at observable lineitem facts (unit price, shipped quantity,
# line value) while keeping each query's DISTINGUISHING operator shape:
# Q2's per-group min equality join, Q9's 5-way join + year rollup, Q11's
# global-scalar HAVING, Q16's NOT IN + COUNT DISTINCT, Q20's grouped
# dominance threshold, Q21's EXISTS / NOT-EXISTS only-late-supplier chain.
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l.l_partkey, l.l_suppkey,
             l.l_extendedprice / l.l_quantity AS unit_cost
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size IN (10, 15, 20, 25)
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost
      FROM costs GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, c.l_partkey AS p_partkey
    FROM costs c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost = b.min_cost
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "agg", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier per part): the correlated
    MIN subquery becomes a per-part aggregate joined back on equality
    with the aggregated minimum — the standard decorrelation, expressed
    directly so Catalyst never sees a correlated plan. Unit cost is an
    IEEE double division (identical expression tree in both engines,
    bit-deterministic); MIN is order-independent, so no decimal detour
    is needed. The part filter (4 of 50 sizes) broadcasts under the
    repo's planning position that the part dim stays broadcastable well
    past sf100 (module docstring); the per-part MIN rides a WINDOW over
    the same rows instead of an aggregate joined back — one evaluation
    of the join branch, one shuffle on l_partkey, no second lineitem
    scan (an agg+join-back re-evaluates the whole probe subtree:
    measured 6 parquet scans -> 4). (Filter is size-only: the tiny
    fixture SFs carry too few parts for a conjunctive size x type cut
    to survive.) ORDER BY covers every output column -> total order is
    deterministic under the LIMIT."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(10, 15, 20, 25)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    costs = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        costs.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
        )
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))
                      * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation and order year): the
    ps_supplycost term has no partsupp to come from, so cost is proxied
    as 10% of retail price x quantity — preserving Q9's defining shape,
    a 5-way join with a mixed-sign money expression rolled up by
    nation x year. Exactness: revenue is cents x (100 - discount-cents)
    x 10 (scale 5) and cost is retail-cents x quantity-cents (scale
    2+2+1(0.1) = 5), so one bigint expression per row carries the exact
    profit x 10^5; the oracle's DECIMAL subtraction lands on the same
    scale-5 rational. Dimensions broadcast; the lineitem-orders join is
    the only large shuffle and AQE owns its strategy."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit5 = _cents("l_extendedprice") * (
        F.lit(100) - _cents("l_discount")
    ) * 10 - _cents("p_retailprice") * _cents("l_quantity")
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(_exact_money(profit5, 5).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH filtered AS (
      SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    )
    SELECT l_partkey AS p_key,
           CAST(SUM(val) AS DOUBLE) AS part_value
    FROM filtered
    GROUP BY l_partkey
    HAVING SUM(val) * (SELECT COUNT(DISTINCT l_partkey) FROM filtered)
           > 2 * (SELECT SUM(val) FROM filtered)
    ORDER BY part_value DESC, p_key
    """,
    tags=("join", "agg", "subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock: per-group value measured
    against a GLOBAL scalar aggregate in HAVING): parts whose traded
    value from one nation's suppliers exceeds 2x the average part's.
    The relative (2x-average) threshold keeps the qualifying tail
    scale-free — a fixed fraction like TPC-H's 0.0001/SF would select
    everything at small SF and nothing at large.

    The global scalar is ONE row derived from the same per-part
    aggregate (sum of sums + count of groups — no second scan of
    lineitem) and joins back as a broadcast-able literal cross join.
    Exactness: per-part sums accumulate cents in DECIMAL(38,0) (exact,
    unwrappable) and the threshold compare multiplies integers —
    sum x n_parts > 2 x total — the same integer inequality the
    oracle's decimal arithmetic evaluates."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    filtered = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select("l_partkey", _cents("l_extendedprice").alias("val_cents"))
    )
    # materialized once: both the totals aggregate and the HAVING probe
    # consume per_part, and Spark re-evaluates shared subtrees (the
    # lineitem scan would run twice) — localCheckpoint caps the fact
    # scan at one pass, leaving only |parts| tiny rows in memory
    per_part = filtered.groupBy("l_partkey").agg(
        F.sum(F.col("val_cents").cast("decimal(38,0)")).alias("cents_sum")
    ).localCheckpoint()
    totals = per_part.agg(
        F.sum("cents_sum").alias("total_cents"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .filter(
            F.col("cents_sum") * F.col("n_parts")
            > F.lit(2).cast("decimal(38,0)") * F.col("total_cents")
        )
        .select(
            F.col("l_partkey").alias("p_key"),
            (F.col("cents_sum") / 100).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_key")
    )


@query(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "agg", "anti"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier diversity per part group, excluding
    complained-about suppliers): the NOT IN subquery is a LEFT ANTI
    join — legal because s_suppkey is non-null, so NOT IN's
    three-valued-logic trap never fires. The exclusion set (suppliers
    in arrears) broadcasts; COUNT(DISTINCT) runs as Spark's two-phase
    distinct-aggregate (partial distinct per map task, exact merge) —
    no driver-side set. ORDER BY appends all group keys after the
    count, so the sort is total and LIMIT-free."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_dominant_shippers",
    oracle="""
    WITH promo_1996 AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(l.l_quantity AS DECIMAL(18,2)) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'PROMO'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ),
    per_supp AS (
      SELECT l_partkey, l_suppkey, SUM(qty) AS supp_qty
      FROM promo_1996 GROUP BY l_partkey, l_suppkey
    ),
    per_part AS (
      SELECT l_partkey, SUM(qty) AS part_qty FROM promo_1996 GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM per_supp ps
    JOIN per_part pp ON pp.l_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE ps.supp_qty * 2 > pp.part_qty
    ORDER BY s_name, n_name
    """,
    tags=("join", "agg", "window", "subquery"),
)
def q20_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers holding a dominant share: per-group
    quantity measured against its parent group's total): suppliers who
    shipped MORE THAN HALF of some promo part's 1996 volume. The
    availqty > 0.5 x shipped threshold becomes supp_qty x 2 > part_qty.

    The per-part total is a window SUM over the (part, supplier)
    aggregate — the part-level re-aggregation rides the same data the
    first groupBy produced instead of re-scanning lineitem and joining
    (the oracle spells the join formulation; values are identical).
    Quantities sum as integer cents, so the dominance compare is exact
    integer arithmetic in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_supp = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_cents("l_quantity")).alias("supp_qty_cents"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        per_supp.withColumn("part_qty_cents", F.sum("supp_qty_cents").over(w))
        .filter(F.col("supp_qty_cents") * 2 > F.col("part_qty_cents"))
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name", "n_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("join", "agg", "semi", "anti", "subquery"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): late line
    items (shipped >90 days after order date — the fixture carries no
    commit/receipt dates, so lateness is measured against the order
    date) on multi-supplier finalized orders where this supplier was
    the ONLY late one. (TPC-H's nation cut is dropped: the smallest
    fixture SF has 10 suppliers across 25 nations, so any single-nation
    filter empties the result.)

    Rather than compile the EXISTS / NOT-EXISTS pair into two more
    joins against lineitem (three probes of the big table), both fold
    into per-order statistics derived from ONE (order, supplier)
    aggregate: after the group-by, a WINDOW over l_orderkey yields
    n_supps (partition row count <=> EXISTS other supplier when > 1)
    and n_late_supps (<=> NOT EXISTS other late supplier when == 1 and
    this supplier is late). The window consumes the aggregate's own
    hash-partitioning — lineitem is genuinely scanned ONCE, one
    shuffle on (order, supplier) plus the window's on order (verified:
    2 parquet scans of the fact side collapse to 1 vs the
    aggregate-join-back shape, which re-evaluates the whole subtree —
    Spark only reuses exchanges over identical subplans). The supplier
    dim broadcasts. COUNT(*) over l1 = SUM of per-pair late counts."""
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load_table(spark, sf_dir, "supplier")
    tagged = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).withColumn(
        "late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    pair = tagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("late_cnt")
    )
    w = Window.partitionBy("l_orderkey")
    stats = pair.withColumn("n_supps", F.count(F.lit(1)).over(w)).withColumn(
        "n_late_supps",
        F.sum((F.col("late_cnt") > 0).cast("int")).over(w),
    )
    return (
        stats.filter(
            (F.col("late_cnt") > 0)
            & (F.col("n_supps") > 1)
            & (F.col("n_late_supps") == 1)
        )
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_cnt").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
