"""Classic decision-support queries over the TPC-H-shaped testdata tables
(SURVEY §2 C/E/F extensions — the analytic surface a warehouse user of the
engine runs daily). Shapes follow the public TPC-H specification (Q14, Q15,
Q17, Q18 analogues), adapted to the columns the testdata actually has.

Scale notes (100 TB):
- part / supplier are dimension sides: joined with broadcast() explicitly —
  lineitem (the fact side) is never shuffled for those joins.
- top_supplier avoids the global-window single-reducer trap: the max is a
  1-row aggregate joined back (same pattern as ev_cusum's argmax).
- small_qty_revenue's per-part average is a partial-agg'd groupBy on
  l_partkey, then joined fact-to-fact on the SAME key — at scale both sides
  hash-partition on l_partkey, and AQE handles residual skew.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries import _REGISTRY, Query, canon_types, roundn
from .queries_analytics import _t


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
REV_SQL = "l_extendedprice * (1 - l_discount)"


# --- promo_revenue (Q14 shape): monthly promo revenue share ----------------
def _q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    out = (
        j.groupBy(
            F.year("l_shipdate").alias("yr"), F.month("l_shipdate").cast("bigint").alias("mo")
        )
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0))
                / F.sum(_rev())
            ).alias("promo_share"),
            F.count("*").alias("n_items"),
        )
    )
    return canon_types(roundn(out, 4, "promo_share"))


_PROMO_SQL = f"""
SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, CAST(month(l_shipdate) AS BIGINT) AS mo,
       (round((100.0e0 * sum(CASE WHEN p_type = 'PROMO' THEN {REV_SQL} ELSE 0.0e0 END)
               / sum({REV_SQL})) + 1.0e-9,4)+0.0e0) AS promo_share,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
"""


# --- top_supplier (Q15 shape): max-revenue supplier(s) for a quarter -------
Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def _q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_START)) & (F.col("l_shipdate") < F.lit(Q15_END))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("_r"))
        # round BEFORE the max/filter so both engines agree on who wins
        .withColumn("total_rev", F.round(F.col("_r") + F.lit(1e-9), 2) + F.lit(0.0))
        .drop("_r")
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = (
        rev.join(F.broadcast(mx), rev.total_rev == mx._mx)
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select(F.col("s_suppkey").cast("bigint").alias("s_suppkey"), "s_name", "total_rev")
    )
    return out


_TOP_SUPPLIER_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, (round((sum({REV_SQL})) + 1.0e-9,2)+0.0e0) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START}' AND l_shipdate < TIMESTAMP '{Q15_END}'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""


# --- small_qty_revenue (Q17 shape): revenue locked in small-lot orders -----
def _q_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    brand_parts = (
        _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    )
    per_part = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    out = (
        li.join(F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey)
        .join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )
    return canon_types(roundn(out, 4, "avg_yearly"))


_SMALL_QTY_SQL = """
WITH pa AS (SELECT l_partkey, 0.5e0 * avg(l_quantity) AS half_avg FROM lineitem GROUP BY 1)
SELECT (round((sum(l.l_extendedprice) / 7.0e0) + 1.0e-9,4)+0.0e0) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#4'
JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < pa.half_avg
"""


# --- large_volume_orders (Q18 shape) ---------------------------------------
Q18_MIN_QTY = 170.0


def _q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.unix_timestamp("o_orderdate").alias("o_date_s"), "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_date_s", "o_totalprice", "sum_qty")
    )
    return canon_types(roundn(out, 4, "sum_qty", "o_totalprice"))


_LARGE_ORDERS_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_date_s,
       (round((o_totalprice) + 1.0e-9,4)+0.0e0) AS o_totalprice,
       (round((sum_qty) + 1.0e-9,4)+0.0e0) AS sum_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
      GROUP BY 1 HAVING sum(l_quantity) > {Q18_MIN_QTY:.9e})
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- forecast_revenue_change (Q6 shape): pure scan-aggregate ---------------
# The canonical predicate-pushdown query: every filter reaches the parquet
# scan, output is one row — at 100 TB this is scan-bound and embarrassingly
# parallel (partial agg, no real shuffle).
def _q_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue_delta"),
            F.count("*").alias("n_lines"),
        )
    )
    return canon_types(roundn(out, 4, "revenue_delta"))


_REVENUE_CHANGE_SQL = """
SELECT (round((sum(l_extendedprice * l_discount)) + 1.0e-9,4)+0.0e0) AS revenue_delta,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 5.0e-2 AND l_discount <= 7.0e-2 AND l_quantity < 24
"""


# --- late_order_priority (Q4 shape): EXISTS semi-join ----------------------
# Orders with at least one line shipped after the order date + 90 days,
# counted per priority. left-semi: the fact side never duplicates.
def _q_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 90)),
        "left_semi",
    )
    return canon_types(
        late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
    )


_LATE_ORDERS_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


_REGISTRY.update(
    {
        "promo_revenue": Query("promo_revenue", _q_promo_revenue, _PROMO_SQL, ("agg",)),
        "top_supplier": Query("top_supplier", _q_top_supplier, _TOP_SUPPLIER_SQL, ("agg",)),
        "small_qty_revenue": Query("small_qty_revenue", _q_small_qty, _SMALL_QTY_SQL, ("agg",)),
        "large_volume_orders": Query(
            "large_volume_orders", _q_large_orders, _LARGE_ORDERS_SQL, ("agg",)
        ),
        "revenue_change": Query(
            "revenue_change", _q_revenue_change, _REVENUE_CHANGE_SQL, ("agg",)
        ),
        "late_order_priority": Query(
            "late_order_priority", _q_late_orders, _LATE_ORDERS_SQL, ("join",)
        ),
    }
)


# --- volume_shipping (Q7 shape): bilateral trade volume by year ------------
VS_N1, VS_N2 = "NATION_1", "NATION_2"


def _q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # fact⋈fact (lineitem⋈orders) shuffles on the natural key; customer joins
    # via shuffle (it scales with SF); supplier+nation broadcast (dims)
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .filter(
            ((F.col("supp_nation") == VS_N1) & (F.col("cust_nation") == VS_N2))
            | ((F.col("supp_nation") == VS_N2) & (F.col("cust_nation") == VS_N1))
        )
    )
    out = j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("yr")
    ).agg(F.sum(_rev()).alias("revenue"), F.count("*").alias("n_items"))
    return canon_types(roundn(out, 4, "revenue"))


_VOLUME_SHIPPING_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS yr,
       (round((sum({REV_SQL})) + 1.0e-9,4)+0.0e0) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = '{VS_N1}' AND cn.n_name = '{VS_N2}')
    OR (sn.n_name = '{VS_N2}' AND cn.n_name = '{VS_N1}'))
GROUP BY 1, 2, 3
"""


# --- profit_by_nation (Q9 shape, retailprice-proxy cost) -------------------
def _q_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    # profit proxy: revenue − 60% of retail price × quantity (no partsupp
    # table in the testdata; the plan shape — fact ⋈ two broadcast dims ⋈
    # agg — is the Q9 shape regardless of the cost formula)
    profit = _rev() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        F.broadcast(sn), li.l_suppkey == sn.s_suppkey
    )
    out = j.groupBy("nation", F.year("l_shipdate").alias("yr")).agg(
        F.sum(profit).alias("profit"), F.count("*").alias("n_items")
    )
    return canon_types(roundn(out, 4, "profit"))


_PROFIT_SQL = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS yr,
       (round((sum({REV_SQL} - 6.0e-1 * p_retailprice * l_quantity)) + 1.0e-9,4)+0.0e0) AS profit,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


# --- returned_customers (Q10 shape): top returned-revenue customers --------
def _q_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("revenue"), F.count("*").alias("n_items"))
    )
    out = (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("c_custkey"), F.col("c_name"), F.col("n_name").alias("nation"),
            "revenue", "n_items",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
    return canon_types(roundn(out, 4, "revenue"))


_RETURNED_SQL = f"""
WITH rev AS (
  SELECT o_custkey, sum({REV_SQL}) AS revenue, count(*) AS n_items
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, n_name AS nation,
       (round((revenue) + 1.0e-9,4)+0.0e0) AS revenue, n_items
FROM rev JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY rev.revenue DESC, c_custkey LIMIT 20
"""


# --- order_count_distribution (Q13 shape) ----------------------------------
def _q_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    out = per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))
    return canon_types(out)


_CUSTDIST_SQL = """
WITH pc AS (
  SELECT c_custkey, count(o_custkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist FROM pc GROUP BY c_count
"""


# --- brand_size_revenue (Q19 shape): disjunctive pushdown ------------------
def _q_brand_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 30))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") < 15))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30))
    )
    out = j.filter(cond).agg(
        F.sum(_rev()).alias("revenue"), F.count("*").alias("n_items")
    )
    return canon_types(roundn(out, 4, "revenue"))


_BRAND_SIZE_SQL = f"""
SELECT (round((sum({REV_SQL})) + 1.0e-9,4)+0.0e0) AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 30)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity < 15)
   OR (p_brand = 'Brand#3' AND p_size <= 30)
"""


# --- idle_customers (Q22 shape): anti-join + scalar avg subquery -----------
IDLE_SINCE = "2000-01-01"


def _q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= IDLE_SINCE)
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    cand = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg_bal")
    )
    idle = cand.join(o, cand.c_custkey == o.o_custkey, "left_anti")
    out = idle.groupBy("c_nationkey").agg(
        F.count("*").alias("n_custs"), F.sum("c_acctbal").alias("total_bal")
    )
    return canon_types(roundn(out, 4, "total_bal"))


_IDLE_SQL = f"""
SELECT c_nationkey, count(*) AS n_custs,
       (round((sum(c_acctbal)) + 1.0e-9,4)+0.0e0) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{IDLE_SINCE}')
GROUP BY c_nationkey
"""


_REGISTRY.update(
    {
        "volume_shipping": Query(
            "volume_shipping", _q_volume_shipping, _VOLUME_SHIPPING_SQL, ("tpch",)
        ),
        "profit_by_nation": Query(
            "profit_by_nation", _q_profit_by_nation, _PROFIT_SQL, ("tpch",)
        ),
        "returned_customers": Query(
            "returned_customers", _q_returned_customers, _RETURNED_SQL, ("tpch",)
        ),
        "order_count_distribution": Query(
            "order_count_distribution", _q_custdist, _CUSTDIST_SQL, ("tpch",)
        ),
        "brand_size_revenue": Query(
            "brand_size_revenue", _q_brand_size, _BRAND_SIZE_SQL, ("tpch",)
        ),
        "idle_customers": Query(
            "idle_customers", _q_idle_customers, _IDLE_SQL, ("tpch",)
        ),
    }
)
