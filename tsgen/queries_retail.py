"""Customer/retail analytics operators (north-star extension: the
behavioral-analytics queries an events+orders warehouse runs daily).

- rfm_segments: RFM customer segmentation — per-customer Recency /
  Frequency / Monetary metrics scored into quartiles (ntile with a full
  deterministic tiebreak), reported per (r,f,m) segment cell.
- basket_rules: market-basket association rules at the brand level —
  pairwise support / confidence / lift over order baskets, min-support
  filtered with an integer predicate (no float-boundary risk).

Scale notes (100 TB):
- rfm_segments: the fact scan reduces to ONE row per customer via a
  partial-agged groupBy; the global ntile windows run on that customer
  dim only (orders of magnitude smaller than the facts — a total sort of
  the dim is the textbook cost of exact quartile scoring; swap to
  percentile boundaries if even the dim outgrows a sort).
- basket_rules: the pair self-join is per-order (basket sizes are bounded
  by lines-per-order, so pairs grow linearly in orders, not quadratically);
  item counts (25 brands) and the scalar order count broadcast back.
  Brand attachment is an equi-join on partkey — dim-sized, shuffle-safe.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .queries import _REGISTRY, Query, roundn
from .queries_analytics import _t

MINSUP_INV = 50  # min support = 1/50 = 2% of baskets


# --- RFM segmentation ------------------------------------------------------
def rfm_segments(orders: DataFrame) -> DataFrame:
    """Quartile-score customers on recency (days since last order, lower =
    better), frequency (order count), monetary (total spend); report each
    (r,f,m) cell. Score 1 = best quartile. ntile ties are broken by
    customer key so the assignment is fully deterministic."""
    from .queries_scale import ntile_exact

    cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    gmax = orders.agg(F.max("o_orderdate").alias("gmax"))
    cust = cust.crossJoin(F.broadcast(gmax)).withColumn(
        "r_days", F.datediff("gmax", "last_order")
    )
    # VERDICT r03 item 3: the naive form is three unpartitioned ntile(4)
    # windows — one row per customer through a single reducer, three times.
    # ntile_exact reproduces the exact ntile assignment (total order via the
    # deterministic custkey tiebreak) with range partitioning + broadcast
    # prefix offsets, so no task ever sorts more than its range slice.
    scored = ntile_exact(
        cust, 4, [F.col("r_days").asc(), F.col("o_custkey").asc()], "r"
    )
    scored = ntile_exact(
        scored, 4, [F.col("freq").desc(), F.col("o_custkey").asc()], "f"
    )
    scored = ntile_exact(
        scored, 4, [F.col("monetary").desc(), F.col("o_custkey").asc()], "m"
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_customers"),
        F.avg("freq").alias("avg_freq"),
        F.avg("monetary").alias("avg_monetary"),
    )


def _q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundn(rfm_segments(_t(spark, sf_dir, "orders")), 4, "avg_freq", "avg_monetary")


_RFM_SQL = """
WITH cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         count(*) AS freq, sum(o_totalprice) AS monetary
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT o_custkey, freq, monetary,
         date_diff('day', last_order, (SELECT max(o_orderdate) FROM orders))
           AS r_days
  FROM cust),
q AS (
  SELECT ntile(4) OVER (ORDER BY r_days ASC, o_custkey) AS r,
         ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS f,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m,
         freq, monetary
  FROM scored)
SELECT r, f, m, count(*) AS n_customers,
       (round(avg(freq) + 1.0e-9, 4) + 0.0e0) AS avg_freq,
       (round(avg(monetary) + 1.0e-9, 4) + 0.0e0) AS avg_monetary
FROM q GROUP BY r, f, m
"""


# --- market-basket association rules --------------------------------------
def basket_rules(li: DataFrame, part: DataFrame, minsup_inv: int = MINSUP_INV) -> DataFrame:
    """Brand-level association rules over order baskets: for each brand
    pair (a < b), support = P(a,b), confidence both directions, lift.
    Min-support is the integer predicate n_ab * minsup_inv >= n_orders —
    exact, no float boundary.

    Pair generation: baskets collapse to ONE row per order
    (collect_set(brand), bounded by lines-per-order), and the a<b pairs
    come from a double explode of that bounded array — no self-join, no
    second scan. The whole query is one orderkey shuffle for the basket
    build plus tiny (~|brands|^2) partial-agged rollups."""
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .join(part.select("p_partkey", "p_brand"), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
        # three consumers (scalar count, per-brand counts, pair explode):
        # pin the basket build once instead of rescanning the facts 3x
        .localCheckpoint()
    )
    n_orders = baskets.agg(F.count("*").alias("n_orders"))
    cnt = (
        baskets.select(F.explode("brands").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
    )
    pairs = (
        baskets.select(F.explode("brands").alias("brand_a"), "brands")
        .select("brand_a", F.explode("brands").alias("brand_b"))
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
    )
    out = (
        pairs.join(
            F.broadcast(cnt.withColumnRenamed("p_brand", "brand_a").withColumnRenamed("cnt", "cnt_a")),
            "brand_a",
        )
        .join(
            F.broadcast(cnt.withColumnRenamed("p_brand", "brand_b").withColumnRenamed("cnt", "cnt_b")),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .filter(F.col("n_ab") * minsup_inv >= F.col("n_orders"))
    )
    return out.select(
        "brand_a",
        "brand_b",
        "n_ab",
        (F.col("n_ab") / F.col("n_orders").cast("double")).alias("support"),
        (F.col("n_ab") / F.col("cnt_a").cast("double")).alias("conf_ab"),
        (F.col("n_ab") / F.col("cnt_b").cast("double")).alias("conf_ba"),
        (
            (F.col("n_orders").cast("double") * F.col("n_ab"))
            / (F.col("cnt_a").cast("double") * F.col("cnt_b"))
        ).alias("lift"),
    )


def _q_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundn(
        basket_rules(_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")),
        6,
        "support",
        "conf_ab",
        "conf_ba",
        "lift",
    )


_BASKET_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
cnt AS (SELECT p_brand, count(*) AS cnt FROM items GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand)
SELECT brand_a, brand_b, n_ab,
  (round(n_ab / CAST(n.n_orders AS DOUBLE) + 1.0e-9, 6) + 0.0e0) AS support,
  (round(n_ab / CAST(ca.cnt AS DOUBLE) + 1.0e-9, 6) + 0.0e0) AS conf_ab,
  (round(n_ab / CAST(cb.cnt AS DOUBLE) + 1.0e-9, 6) + 0.0e0) AS conf_ba,
  (round((CAST(n.n_orders AS DOUBLE) * n_ab)
         / (CAST(ca.cnt AS DOUBLE) * cb.cnt) + 1.0e-9, 6) + 0.0e0) AS lift
FROM pairs
JOIN cnt ca ON ca.p_brand = pairs.brand_a
JOIN cnt cb ON cb.p_brand = pairs.brand_b
CROSS JOIN n
WHERE n_ab * {MINSUP_INV} >= n.n_orders
"""


_REGISTRY.update(
    {
        "rfm_segments": Query("rfm_segments", _q_rfm, _RFM_SQL, ("retail",)),
        "basket_rules": Query("basket_rules", _q_basket, _BASKET_SQL, ("retail",)),
    }
)


# --- market concentration (HHI) ----------------------------------------------
def supplier_hhi(li: DataFrame, supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation — the antitrust-style market-structure readout next to the
    share table: HHI = sum of squared supplier shares (x10000, the
    convention), with the usual bands (<1500 competitive, >2500 highly
    concentrated). Two partial-agged groupBys + a broadcast nation dim;
    shares are ratios of 4dp-rounded revenue sums so the squared terms
    are engine-stable."""
    rev = (
        li.join(supplier.select("s_suppkey", "s_nationkey"),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_nationkey", "s_suppkey")
        .agg(
            (
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    + F.lit(1e-9),
                    4,
                )
                + F.lit(0.0)
            ).alias("rev")
        )
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("rev").alias("tot"),
                                         F.count("*").alias("n_suppliers"))
    hhi = (
        rev.join(tot, "s_nationkey")
        .withColumn("share", F.col("rev") / F.col("tot"))
        .groupBy("s_nationkey")
        .agg(
            F.first("n_suppliers").alias("n_suppliers"),
            (F.sum(F.col("share") * F.col("share")) * 10000.0).alias("hhi"),
        )
    )
    out = (
        hhi.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            hhi.s_nationkey == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            "hhi",
            F.when(F.col("hhi") < 1500, "competitive")
            .when(F.col("hhi") < 2500, "moderate")
            .otherwise("concentrated")
            .alias("band"),
        )
    )
    from .queries import roundn

    return roundn(out, 4, "hhi")


def _q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return supplier_hhi(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )


_HHI_SQL = """
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         (round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1.0e-9, 4) + 0.0e0)
           AS rev
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey),
tot AS (
  SELECT s_nationkey, sum(rev) AS tot, count(*) AS n_suppliers
  FROM rev GROUP BY s_nationkey),
hhi AS (
  SELECT r.s_nationkey, any_value(t.n_suppliers) AS n_suppliers,
         sum((r.rev / t.tot) * (r.rev / t.tot)) * 1.0e4 AS hhi
  FROM rev r JOIN tot t USING (s_nationkey)
  GROUP BY r.s_nationkey)
SELECT n.n_name AS nation, h.n_suppliers,
       (round(h.hhi + 1.0e-9, 4) + 0.0e0) AS hhi,
       CASE WHEN h.hhi < 1.5e3 THEN 'competitive'
            WHEN h.hhi < 2.5e3 THEN 'moderate'
            ELSE 'concentrated' END AS band
FROM hhi h JOIN nation n ON n.n_nationkey = h.s_nationkey
"""


_REGISTRY.update(
    {
        "li_supplier_hhi": Query(
            "li_supplier_hhi", _q_hhi, _HHI_SQL, ("retail",)
        ),
    }
)


# --- Syntetos-Boylan intermittent-demand classification ---------------------
SB_ADI_CUT, SB_CV2_CUT = 1.32, 0.49


def demand_classes(li: DataFrame) -> DataFrame:
    """Syntetos-Boylan-Croston demand classification (Syntetos & Boylan,
    IJF 2005): per part, ADI (average inter-demand interval in days) and
    CV² (squared coefficient of variation of nonzero daily demand sizes),
    then the standard quadrant —

        smooth        ADI < 1.32, CV² < 0.49
        intermittent  ADI ≥ 1.32, CV² < 0.49   (→ Croston territory)
        erratic       ADI < 1.32, CV² ≥ 0.49
        lumpy         ADI ≥ 1.32, CV² ≥ 0.49

    — the router that decides which forecaster (SES vs forecast_croston)
    each SKU gets. Both ratios are rounded (9dp, +nudge) BEFORE the cutoff
    comparisons so the class can't flip across engines on an ulp (the
    abc_analysis lesson). Scale shape: one (part, day) partial-aggregated
    groupBy on the fact table, one part-keyed agg, one 4-row summary.
    → (demand_class, n_parts, avg_adi, avg_cv2)."""
    daily = (
        li.select("l_partkey", F.to_date("l_shipdate").alias("d"), "l_quantity")
        .groupBy("l_partkey", "d")
        .agg(F.sum("l_quantity").alias("q"))
    )
    per_part = (
        daily.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_dates"),
            F.min("d").alias("d0"),
            F.max("d").alias("d1"),
            F.avg("q").alias("mq"),
            F.var_samp("q").alias("vq"),
        )
        .filter(F.col("n_dates") >= 2)
    )
    adi = F.round(
        F.datediff(F.col("d1"), F.col("d0")) / (F.col("n_dates") - 1) + F.lit(1e-12), 9
    )
    cv2 = F.round(F.col("vq") / (F.col("mq") * F.col("mq")) + F.lit(1e-12), 9)
    per_part = per_part.withColumn("adi", adi).withColumn("cv2", cv2)
    cls = (
        F.when((F.col("adi") < SB_ADI_CUT) & (F.col("cv2") < SB_CV2_CUT), "smooth")
        .when((F.col("adi") >= SB_ADI_CUT) & (F.col("cv2") < SB_CV2_CUT), "intermittent")
        .when(F.col("adi") < SB_ADI_CUT, "erratic")
        .otherwise("lumpy")
    )
    out = (
        per_part.withColumn("demand_class", cls)
        .groupBy("demand_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            (F.round(F.avg("adi") + F.lit(1e-9), 4) + F.lit(0.0)).alias("avg_adi"),
            (F.round(F.avg("cv2") + F.lit(1e-9), 4) + F.lit(0.0)).alias("avg_cv2"),
        )
    )
    return out.orderBy("demand_class")


def _q_demand_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demand_classes(_t(spark, sf_dir, "lineitem"))


_DEMAND_CLASSES_SQL = f"""
WITH daily AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d, sum(l_quantity) AS q
  FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE)),
per_part AS (
  SELECT l_partkey, count(*) AS n_dates, min(d) AS d0, max(d) AS d1,
         avg(q) AS mq, var_samp(q) AS vq
  FROM daily GROUP BY l_partkey HAVING count(*) >= 2),
feat AS (
  SELECT l_partkey,
         round(date_diff('day', d0, d1) / (n_dates - 1) + 1.0e-12, 9) AS adi,
         round(vq / (mq * mq) + 1.0e-12, 9) AS cv2
  FROM per_part),
cls AS (
  SELECT CASE WHEN adi < {SB_ADI_CUT} AND cv2 < {SB_CV2_CUT} THEN 'smooth'
              WHEN adi >= {SB_ADI_CUT} AND cv2 < {SB_CV2_CUT} THEN 'intermittent'
              WHEN adi < {SB_ADI_CUT} THEN 'erratic'
              ELSE 'lumpy' END AS demand_class,
         adi, cv2
  FROM feat)
SELECT demand_class, CAST(count(*) AS BIGINT) AS n_parts,
       (round(avg(adi) + 1.0e-9, 4) + 0.0e0) AS avg_adi,
       (round(avg(cv2) + 1.0e-9, 4) + 0.0e0) AS avg_cv2
FROM cls GROUP BY demand_class ORDER BY demand_class
"""


_REGISTRY.update(
    {
        "li_demand_classes": Query(
            "li_demand_classes", _q_demand_classes, _DEMAND_CLASSES_SQL, ("retail", "forecast")
        ),
    }
)


# --- ABC × XYZ inventory matrix ---------------------------------------------
XYZ_X_CUT, XYZ_Y_CUT = 0.5, 1.0


def abc_xyz(li: DataFrame) -> DataFrame:
    """ABC × XYZ matrix (the standard inventory-policy grid): ABC classes
    parts by cumulative revenue share (A first 70%, B to 90%, C tail —
    same cutoffs/rounding as abc_analysis, via the two-phase cumsum_exact),
    XYZ by demand variability — the coefficient of variation of daily
    demand: X < 0.5 (steady), Y < 1.0 (variable), Z ≥ 1.0 (sporadic).
    AX cells get tight automatic replenishment, CZ cells get
    make-to-order; the 9-cell census is the policy input. Both the
    cum-share and the CV are rounded (9dp, +nudge) before their cutoff
    compares. → (abc_class, xyz_class, n_parts, revenue_m)."""
    from .queries_scale import cumsum_exact

    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    tot = rev.agg(F.sum("rev").alias("tot"))
    ranked = cumsum_exact(
        rev, "rev", [F.col("rev").desc(), F.col("l_partkey").asc()], "cum_rev"
    )
    ranked = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "cum_share", F.round(F.col("cum_rev") / F.col("tot") + F.lit(1.0e-12), 9)
    )
    abc = (
        F.when(F.col("cum_share") <= 0.7, F.lit("A"))
        .when(F.col("cum_share") <= 0.9, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    daily = (
        li.select("l_partkey", F.to_date("l_shipdate").alias("d"), "l_quantity")
        .groupBy("l_partkey", "d")
        .agg(F.sum("l_quantity").alias("q"))
    )
    cv = (
        daily.groupBy("l_partkey")
        .agg(F.avg("q").alias("mq"), F.stddev_samp("q").alias("sq"), F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .withColumn("cv", F.round(F.col("sq") / F.col("mq") + F.lit(1.0e-12), 9))
    )
    xyz = (
        F.when(F.col("cv") < XYZ_X_CUT, F.lit("X"))
        .when(F.col("cv") < XYZ_Y_CUT, F.lit("Y"))
        .otherwise(F.lit("Z"))
    )
    out = (
        ranked.withColumn("abc_class", abc)
        .join(cv.withColumn("xyz_class", xyz).select("l_partkey", "xyz_class"), "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            (F.round(F.sum("rev") / F.lit(1.0e6) + F.lit(1e-9), 4) + F.lit(0.0)).alias(
                "revenue_m"
            ),
        )
    )
    return out.orderBy("abc_class", "xyz_class")


def _q_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    return abc_xyz(_t(spark, sf_dir, "lineitem"))


_ABC_XYZ_SQL = f"""
WITH rev AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT sum(rev) AS tot FROM rev),
ranked AS (
  SELECT l_partkey, rev,
         round(sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tot.tot
               + 1.0e-12, 9) AS cum_share
  FROM rev CROSS JOIN tot),
abc AS (
  SELECT l_partkey, rev,
         CASE WHEN cum_share <= 0.7e0 THEN 'A'
              WHEN cum_share <= 0.9e0 THEN 'B' ELSE 'C' END AS abc_class
  FROM ranked),
daily AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d, sum(l_quantity) AS q
  FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE)),
cv AS (
  SELECT l_partkey,
         round(stddev_samp(q) / avg(q) + 1.0e-12, 9) AS cv
  FROM daily GROUP BY l_partkey HAVING count(*) >= 2),
xyz AS (
  SELECT l_partkey,
         CASE WHEN cv < {XYZ_X_CUT} THEN 'X'
              WHEN cv < {XYZ_Y_CUT} THEN 'Y' ELSE 'Z' END AS xyz_class
  FROM cv)
SELECT a.abc_class, x.xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
       (round(sum(a.rev) / 1.0e6 + 1.0e-9, 4) + 0.0e0) AS revenue_m
FROM abc a JOIN xyz x USING (l_partkey)
GROUP BY a.abc_class, x.xyz_class
ORDER BY a.abc_class, x.xyz_class
"""


_REGISTRY.update(
    {
        "li_abc_xyz": Query("li_abc_xyz", _q_abc_xyz, _ABC_XYZ_SQL, ("retail",)),
    }
)


# --- safety stock / reorder point -------------------------------------------
SS_Z, SS_LEAD_DAYS = 1.6448536269514722, 7.0  # z(95%), review lead time


def safety_stock(li: DataFrame, z: float = SS_Z, lead: float = SS_LEAD_DAYS) -> DataFrame:
    """Classic safety-stock sizing (the textbook normal-demand model):
    per part, daily demand mean μ_d and std σ_d over its active days, then

        safety_stock  = z · σ_d · sqrt(LT)
        reorder_point = μ_d · LT + safety_stock

    at a fixed 95% service level (z = 1.645) and LT = 7-day lead time —
    the policy output that the ABC/XYZ and ADI/CV² classifications feed.
    Summarized per XYZ variability class to keep rows bounded: sporadic
    (Z) parts need disproportionate buffer — the number that justifies
    routing them to make-to-order instead.
    → (xyz_class, n_parts, avg_safety_stock, avg_reorder_point)."""
    daily = (
        li.select("l_partkey", F.to_date("l_shipdate").alias("d"), "l_quantity")
        .groupBy("l_partkey", "d")
        .agg(F.sum("l_quantity").alias("q"))
    )
    per = (
        daily.groupBy("l_partkey")
        .agg(F.avg("q").alias("mq"), F.stddev_samp("q").alias("sq"), F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .withColumn("cv", F.round(F.col("sq") / F.col("mq") + F.lit(1.0e-12), 9))
    )
    xyz = (
        F.when(F.col("cv") < XYZ_X_CUT, F.lit("X"))
        .when(F.col("cv") < XYZ_Y_CUT, F.lit("Y"))
        .otherwise(F.lit("Z"))
    )
    ss = F.lit(z) * F.col("sq") * F.lit(lead) ** F.lit(0.5)
    rop = F.col("mq") * F.lit(lead) + ss
    out = (
        per.withColumn("xyz_class", xyz)
        .withColumn("ss", ss)
        .withColumn("rop", rop)
        .groupBy("xyz_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            (F.round(F.avg("ss") + F.lit(1e-9), 4) + F.lit(0.0)).alias("avg_safety_stock"),
            (F.round(F.avg("rop") + F.lit(1e-9), 4) + F.lit(0.0)).alias("avg_reorder_point"),
        )
    )
    return out.orderBy("xyz_class")


def _q_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    return safety_stock(_t(spark, sf_dir, "lineitem"))


_SAFETY_STOCK_SQL = f"""
WITH daily AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d, sum(l_quantity) AS q
  FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE)),
per AS (
  SELECT l_partkey, avg(q) AS mq, stddev_samp(q) AS sq,
         round(stddev_samp(q) / avg(q) + 1.0e-12, 9) AS cv
  FROM daily GROUP BY l_partkey HAVING count(*) >= 2),
cls AS (
  SELECT CASE WHEN cv < {XYZ_X_CUT} THEN 'X'
              WHEN cv < {XYZ_Y_CUT} THEN 'Y' ELSE 'Z' END AS xyz_class,
         {SS_Z} * sq * pow({SS_LEAD_DAYS}, 0.5e0) AS ss,
         mq * {SS_LEAD_DAYS} + {SS_Z} * sq * pow({SS_LEAD_DAYS}, 0.5e0) AS rop
  FROM per)
SELECT xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
       (round(avg(ss) + 1.0e-9, 4) + 0.0e0) AS avg_safety_stock,
       (round(avg(rop) + 1.0e-9, 4) + 0.0e0) AS avg_reorder_point
FROM cls GROUP BY xyz_class ORDER BY xyz_class
"""


# --- economic order quantity --------------------------------------------------
EOQ_ORDER_COST, EOQ_HOLD_RATE = 75.0, 0.2  # $/order, holding %/unit-value/yr


def eoq_policy(li: DataFrame, s: float = EOQ_ORDER_COST, hr: float = EOQ_HOLD_RATE) -> DataFrame:
    """Economic order quantity (Harris 1913 / the Wilson formula — the
    oldest result in inventory theory, still the baseline lot-size
    policy): per part, annualize demand D from its daily series, price
    the holding cost H as hr x unit value, and size

        EOQ = sqrt(2 D S / H),  orders/yr = D / EOQ,
        total_cost = sqrt(2 D S H)

    Completes the inventory battery (ABC/XYZ mix, Croston/SBA demand,
    safety stock): ABC says WHAT to watch, safety stock says WHEN to
    reorder, EOQ says HOW MUCH. Summarized per ABC revenue class so the
    output stays bounded. One part-keyed daily agg + one part-keyed
    stats agg + one class agg — no windows at all.
    -> (abc_class, n_parts, avg_eoq, avg_orders_per_year, avg_annual_cost)."""
    daily = (
        li.select("l_partkey", F.to_date("l_shipdate").alias("d"), "l_quantity",
                  "l_extendedprice")
        .groupBy("l_partkey", "d")
        .agg(F.sum("l_quantity").alias("q"))
    )
    span = li.select(
        F.datediff(F.max(F.to_date("l_shipdate")), F.min(F.to_date("l_shipdate"))).alias("span_d")
    )
    per = (
        daily.groupBy("l_partkey")
        .agg(F.sum("q").alias("tq"))
        .crossJoin(F.broadcast(span))
        .withColumn("d_annual", F.col("tq") * F.lit(365.0) / (F.col("span_d") + F.lit(1.0)))
    )
    price = li.groupBy("l_partkey").agg(
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("unit_price"),
        (F.round(F.sum("l_extendedprice") + F.lit(1e-9), 2) + F.lit(0.0)).alias("rev"),
    )
    rev_rank = price.select(
        "l_partkey", "unit_price", "rev"
    )
    # ABC by revenue share (80/95 cutoffs). The cumulative revenue uses
    # cumsum_exact (two-phase range partition + broadcast prefix offsets)
    # so no task ever sorts more than its range slice — the orders_abc
    # scale mechanism, not a global window over the parts dimension.
    from .queries_scale import cumsum_exact

    tot = rev_rank.agg(F.sum("rev").alias("trev"))
    cum = cumsum_exact(
        rev_rank, "rev", [F.col("rev").desc(), F.col("l_partkey").asc()], "cum_rev"
    )
    cls = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("cum_share", F.round(F.col("cum_rev") / F.col("trev") + F.lit(1e-12), 9))
        .withColumn(
            "abc_class",
            F.when(F.col("cum_share") <= 0.8, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise(F.lit("C")),
        )
        .select("l_partkey", "unit_price", "abc_class")
    )
    j = per.join(cls, "l_partkey").withColumn(
        "h", F.lit(hr) * F.col("unit_price")
    )
    eoq = F.sqrt(F.lit(2.0 * s) * F.col("d_annual") / F.col("h"))
    out = (
        j.withColumn("eoq", eoq)
        .withColumn("opy", F.col("d_annual") / eoq)
        .withColumn("cost", F.sqrt(F.lit(2.0 * s) * F.col("d_annual") * F.col("h")))
        .groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            (F.round(F.avg("eoq") + F.lit(1e-9), 4) + F.lit(0.0)).alias("avg_eoq"),
            (F.round(F.avg("opy") + F.lit(1e-9), 4) + F.lit(0.0)).alias("avg_orders_per_year"),
            (F.round(F.avg("cost") + F.lit(1e-9), 4) + F.lit(0.0)).alias("avg_annual_cost"),
        )
        .orderBy("abc_class")
    )
    return out


def _q_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return eoq_policy(_t(spark, sf_dir, "lineitem"))


_EOQ_SQL = f"""
WITH daily AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d, sum(l_quantity) AS q
  FROM lineitem GROUP BY l_partkey, CAST(l_shipdate AS DATE)),
span AS (
  SELECT date_diff('day', min(CAST(l_shipdate AS DATE)),
                   max(CAST(l_shipdate AS DATE))) AS span_d
  FROM lineitem),
per AS (
  SELECT l_partkey, sum(q) * 365.0e0 / (span.span_d + 1.0e0) AS d_annual
  FROM daily CROSS JOIN span GROUP BY l_partkey, span.span_d),
price AS (
  SELECT l_partkey, sum(l_extendedprice) / sum(l_quantity) AS unit_price,
         (round(sum(l_extendedprice) + 1.0e-9, 2) + 0.0e0) AS rev
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT sum(rev) AS trev FROM price),
cls AS (
  SELECT l_partkey, unit_price,
         CASE WHEN cum_share <= 8.0e-1 THEN 'A'
              WHEN cum_share <= 9.5e-1 THEN 'B' ELSE 'C' END AS abc_class
  FROM (
    SELECT l_partkey, unit_price,
           round(sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / tot.trev + 1.0e-12, 9) AS cum_share
    FROM price CROSS JOIN tot)),
j AS (
  SELECT p.l_partkey, p.d_annual, c.abc_class,
         {EOQ_HOLD_RATE}e0 * c.unit_price AS h
  FROM per p JOIN cls c USING (l_partkey)),
pol AS (
  SELECT abc_class,
         sqrt(2.0e0 * {EOQ_ORDER_COST}e0 * d_annual / h) AS eoq,
         d_annual / sqrt(2.0e0 * {EOQ_ORDER_COST}e0 * d_annual / h) AS opy,
         sqrt(2.0e0 * {EOQ_ORDER_COST}e0 * d_annual * h) AS cost
  FROM j)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       (round(avg(eoq) + 1.0e-9, 4) + 0.0e0) AS avg_eoq,
       (round(avg(opy) + 1.0e-9, 4) + 0.0e0) AS avg_orders_per_year,
       (round(avg(cost) + 1.0e-9, 4) + 0.0e0) AS avg_annual_cost
FROM pol GROUP BY abc_class ORDER BY abc_class
"""


# --- Wagner-Whitin dynamic lot sizing ----------------------------------------
WW_HOLD_RATE_Q = EOQ_HOLD_RATE / 4.0  # holding %/unit-value per QUARTER


def wagner_whitin(
    li: DataFrame, s: float = EOQ_ORDER_COST, hr_q: float = WW_HOLD_RATE_Q
) -> DataFrame:
    """Wagner-Whitin dynamic lot sizing (Wagner & Whitin, Management
    Science 1958) — the OPTIMAL counterpart of the stationary EOQ policy
    (li_eoq): per part, quarterly demand d_1..d_T, setup cost S per
    order, holding cost h per unit per quarter held; minimize

        f(t) = min_{1<=j<=t} [ f(j-1) + S + h * sum_{i=j..t} (i-j) d_i ]

    The inner sum is O(1) via prefix lists P(t)=sum d_i, Q(t)=sum i*d_i:
    sum_{j..t}(i-j)d_i = (Q(t)-Q(j-1)) - j*(P(t)-P(j-1)). Quarters (not
    months) bound T at ~28 on the 7-year TPC-H calendar, and the O(T^2)
    DP runs as a vectorized Arrow pandas_udf whose loops are over the
    time axis only (each step an elementwise numpy op across every part
    in the batch) — see the inline note at the UDF for the measured
    ~10x over the equivalent interpreted Catalyst lambda folds.

    Cross-engine determinism WITHOUT per-step rounding: quarterly
    demands are integer-valued doubles (exact under any summation
    order), the holding rate h is rounded at 6dp once (its only
    parallel-sum input is unit_price, noise ~1e-11), and the entire DP
    evaluates every cell in the same ((f+S)+h*(dQ-j*dP)) IEEE order as
    the oracle's sequential fold, with prefixes built by a strict
    sequential left fold (np.add.accumulate == DuckDB list_reduce) —
    bit-identical by construction (the lesson of the graph_hits fix:
    round the INPUTS of a sequential recursion, never the steps of a
    parallel one). The setup count is recovered by the standard
    backtrack over the argmin chain; np.argmin's first-minimum matches
    the oracle's array_position-of-min.

    Scale shape: one part+quarter agg, a dense part x T grid join
    (T is a corpus constant), one collect_list per part, then pure
    per-row array folds; summary is per ABC class (A items are where
    the textbook says to spend optimal lot-sizing effort).
    -> (abc_class, n_parts, avg_n_setups, avg_ww_cost, avg_eoq_ratio)."""
    from .queries_scale import cumsum_exact

    d = li.select(
        "l_partkey", F.to_date("l_shipdate").alias("dt"),
        "l_quantity", "l_extendedprice",
    )
    bounds = d.agg(F.min("dt").alias("dmin"))
    qd = (
        d.crossJoin(F.broadcast(bounds))
        .withColumn(
            "qi",
            (F.year("dt") - F.year("dmin")) * 4
            + F.quarter("dt") - F.quarter("dmin") + 1,
        )
        .groupBy("l_partkey", "qi")
        .agg(F.sum("l_quantity").alias("q"))
        # parts x quarters table read by tmax/grid/dense: pin, or each
        # branch re-scans lineitem (recompute census: 7 scans in this plan)
        .localCheckpoint(eager=False)
    )
    tmax = qd.agg(F.max("qi").alias("T"))
    grid = (
        qd.select("l_partkey").distinct()
        .crossJoin(F.broadcast(tmax))
        .select("l_partkey", F.explode(F.expr("sequence(1, T)")).alias("qi"))
    )
    dense = grid.join(qd, ["l_partkey", "qi"], "left").select(
        "l_partkey", "qi", F.coalesce("q", F.lit(0.0)).alias("q")
    )
    arr = (
        dense.groupBy("l_partkey")
        .agg(F.array_sort(F.collect_list(F.struct("qi", "q"))).alias("pts"))
        .select("l_partkey", F.col("pts.q").alias("ds"))
        .withColumn("T", F.size("ds"))
    )
    # ABC class + 6dp-rounded holding rate (same construction as li_eoq)
    price = li.groupBy("l_partkey").agg(
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("unit_price"),
        (F.round(F.sum("l_extendedprice") + F.lit(1e-9), 2) + F.lit(0.0)).alias("rev"),
    ).localCheckpoint(eager=False)  # per-part table, read by tot + cumsum
    tot = price.agg(F.sum("rev").alias("trev"))
    cum = cumsum_exact(
        price, "rev", [F.col("rev").desc(), F.col("l_partkey").asc()], "cum_rev"
    )
    cls = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("cum_share", F.round(F.col("cum_rev") / F.col("trev") + F.lit(1e-12), 9))
        .withColumn(
            "abc_class",
            F.when(F.col("cum_share") <= 0.8, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise(F.lit("C")),
        )
        .withColumn(
            "h",
            F.round(F.lit(hr_q) * F.col("unit_price") + F.lit(1e-9), 6) + F.lit(0.0),
        )
        .select("l_partkey", "abc_class", "h", "unit_price")
    )
    j = arr.join(cls, "l_partkey")

    # The DP itself runs as a vectorized Arrow pandas_udf: the loop is over
    # the TIME axis only (T^2/2 ~ 400 numpy vector ops, each elementwise
    # across every part in the batch), never over parts — partition-local,
    # no driver state, scale-safe. The earlier pure-Catalyst formulation
    # (aggregate/transform folds over sequence(1,T)) was semantically
    # identical but ~16M interpreted lambda evals at sf0.1 (~19 s warm,
    # the largest bench line in r7); this form measures ~10x faster.
    # Cross-engine determinism is preserved by evaluating each cell in the
    # exact ((f + S) + h * ((dQ) - j*(dP))) IEEE order of the oracle fold,
    # building prefixes with np.add.accumulate (a strict sequential left
    # fold, same as DuckDB list_reduce), and taking the FIRST argmin
    # (np.argmin == array_position-of-min semantics).
    s_cost = float(s)

    def _ww_dp(ds_s, h_s):
        import numpy as np
        import pandas as pd

        if len(ds_s) == 0:
            return pd.DataFrame(
                {
                    "n_setups": pd.Series([], dtype="int64"),
                    "ww_cost": pd.Series([], dtype="float64"),
                }
            )
        D = np.stack([np.asarray(x, dtype=np.float64) for x in ds_s])
        n, T = D.shape
        h = h_s.to_numpy(dtype=np.float64)
        zero = np.zeros((n, 1))
        P0 = np.concatenate([zero, np.add.accumulate(D, axis=1)], axis=1)
        Q0 = np.concatenate(
            [zero, np.add.accumulate(D * np.arange(1, T + 1, dtype=np.float64), axis=1)],
            axis=1,
        )
        f = np.zeros((n, T + 1))
        js = np.zeros((n, T + 1), dtype=np.int64)
        for t in range(1, T + 1):
            costs = np.empty((n, t))
            for jj in range(1, t + 1):
                costs[:, jj - 1] = f[:, jj - 1] + s_cost + h * (
                    (Q0[:, t] - Q0[:, jj - 1]) - jj * (P0[:, t] - P0[:, jj - 1])
                )
            f[:, t] = costs.min(axis=1)
            js[:, t] = costs.argmin(axis=1) + 1
        n_setups = np.zeros(n, dtype=np.int64)
        t_cur = np.full(n, T, dtype=np.int64)
        while (t_cur > 0).any():
            active = t_cur > 0
            n_setups[active] += 1
            t_cur[active] = js[active, t_cur[active]] - 1
        return pd.DataFrame({"n_setups": n_setups, "ww_cost": f[:, T]})

    ww_dp = F.pandas_udf(_ww_dp, "struct<n_setups: bigint, ww_cost: double>")
    j = (
        j.withColumn("_dp", ww_dp(F.col("ds"), F.col("h")))
        .withColumn("n_setups", F.col("_dp.n_setups"))
        .withColumn("ww_cost", F.col("_dp.ww_cost"))
    )
    out = (
        j.groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            (F.round(F.avg("n_setups") + F.lit(1e-9), 4) + F.lit(0.0)).alias(
                "avg_n_setups"
            ),
            (F.round(F.avg("ww_cost") + F.lit(1e-9), 2) + F.lit(0.0)).alias(
                "avg_ww_cost"
            ),
        )
        .orderBy("abc_class")
    )
    return out


def _q_wagner_whitin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wagner_whitin(_t(spark, sf_dir, "lineitem"))


def _wagner_whitin_sql(s: float = EOQ_ORDER_COST, hr_q: float = WW_HOLD_RATE_Q) -> str:
    from . import expr as E

    S, HRQ = E.NUM(s), E.NUM(hr_q)
    cell = (
        f"(r.fs[j] + {S} + p.h * ((p.Q0[r.t + 2] - p.Q0[j])"
        " - CAST(j AS DOUBLE) * (p.P0[r.t + 2] - p.P0[j])))"
    )
    cell_js = (
        f"(f.fs[j] + {S} + p.h * ((p.Q0[t + 1] - p.Q0[j])"
        " - CAST(j AS DOUBLE) * (p.P0[t + 1] - p.P0[j])))"
    )
    return f"""
WITH RECURSIVE b AS (SELECT min(CAST(l_shipdate AS DATE)) AS dmin FROM lineitem),
qd AS (
  SELECT l_partkey,
         (year(CAST(l_shipdate AS DATE)) - year(b.dmin)) * 4
           + quarter(CAST(l_shipdate AS DATE)) - quarter(b.dmin) + 1 AS qi,
         sum(l_quantity) AS q
  FROM lineitem CROSS JOIN b
  GROUP BY l_partkey, (year(CAST(l_shipdate AS DATE)) - year(b.dmin)) * 4
           + quarter(CAST(l_shipdate AS DATE)) - quarter(b.dmin) + 1),
tm AS (SELECT max(qi) AS T FROM qd),
grid AS (
  SELECT p.l_partkey, g.qi
  FROM (SELECT DISTINCT l_partkey FROM qd) p
  CROSS JOIN (SELECT unnest(range(1, (SELECT T FROM tm) + 1)) AS qi) g),
dense AS (
  SELECT g.l_partkey, g.qi, coalesce(qd.q, 0.0e0) AS q
  FROM grid g LEFT JOIN qd ON qd.l_partkey = g.l_partkey AND qd.qi = g.qi),
arr AS MATERIALIZED (
  SELECT l_partkey, list(q ORDER BY qi) AS ds, CAST(count(*) AS INT) AS T
  FROM dense GROUP BY l_partkey),
price AS (
  SELECT l_partkey, sum(l_extendedprice) / sum(l_quantity) AS unit_price,
         (round(sum(l_extendedprice) + 1.0e-9, 2) + 0.0e0) AS rev
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT sum(rev) AS trev FROM price),
cls AS (
  SELECT l_partkey,
         CASE WHEN cum_share <= 8.0e-1 THEN 'A'
              WHEN cum_share <= 9.5e-1 THEN 'B' ELSE 'C' END AS abc_class,
         round({HRQ} * unit_price + 1.0e-9, 6) + 0.0e0 AS h
  FROM (
    SELECT l_partkey, unit_price,
           round(sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / tot.trev + 1.0e-12, 9) AS cum_share
    FROM price CROSS JOIN tot)),
pre AS MATERIALIZED (
  SELECT a.l_partkey, a.T, c.abc_class, c.h,
         list_prepend(0.0e0, list_transform(range(1, a.T + 1), t ->
           list_reduce(list_prepend(0.0e0, a.ds[1:t]), (x, y) -> x + y))) AS P0,
         list_prepend(0.0e0, list_transform(range(1, a.T + 1), t ->
           list_reduce(list_prepend(0.0e0,
             list_transform(range(1, t + 1), i -> a.ds[i] * CAST(i AS DOUBLE))),
             (x, y) -> x + y))) AS Q0
  FROM arr a JOIN cls c USING (l_partkey)),
rec(l_partkey, t, fs) AS (
  SELECT l_partkey, 0, [0.0e0] FROM pre
  UNION ALL
  SELECT r.l_partkey, r.t + 1,
         list_append(r.fs, list_min(list_transform(range(1, r.t + 2), j -> {cell})))
  FROM rec r JOIN pre p ON p.l_partkey = r.l_partkey
  WHERE r.t < p.T),
fin AS MATERIALIZED (
  SELECT r.l_partkey, r.fs FROM rec r JOIN pre p ON p.l_partkey = r.l_partkey
  WHERE r.t = p.T),
js AS (
  SELECT f.l_partkey,
         list_transform(range(1, p.T + 1), t -> CAST(list_position(
           list_transform(range(1, t + 1), j -> {cell_js}),
           f.fs[t + 1]) AS DOUBLE)) AS js,
         f.fs[p.T + 1] AS ww_cost, p.T, p.abc_class
  FROM fin f JOIN pre p ON p.l_partkey = f.l_partkey),
bt AS (
  -- the ELSE branch must CONSTRUCT a fresh list: returning `acc` itself
  -- from a list_reduce lambda is unstable in DuckDB (nondeterministic
  -- garbage / NaN under parallel execution — found building this query)
  SELECT l_partkey, abc_class, ww_cost,
         CAST(list_reduce(list_prepend([CAST(T AS DOUBLE), 0.0e0],
           list_transform(range(1, T + 1), d_ -> [0.0e0, 0.0e0])),
           (acc, s_) -> CASE WHEN acc[1] > 0.0e0
                            THEN [js[CAST(acc[1] AS INT)] - 1.0e0, acc[2] + 1.0e0]
                            ELSE [acc[1], acc[2]] END)[2] AS BIGINT) AS n_setups
  FROM js)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       (round(avg(n_setups) + 1.0e-9, 4) + 0.0e0) AS avg_n_setups,
       (round(avg(ww_cost) + 1.0e-9, 2) + 0.0e0) AS avg_ww_cost
FROM bt GROUP BY abc_class ORDER BY abc_class
"""


_REGISTRY.update(
    {
        "li_safety_stock": Query(
            "li_safety_stock", _q_safety_stock, _SAFETY_STOCK_SQL, ("retail",)
        ),
        "li_eoq": Query("li_eoq", _q_eoq, _EOQ_SQL, ("retail",)),
        "li_wagner_whitin": Query(
            "li_wagner_whitin", _q_wagner_whitin, _wagner_whitin_sql(), ("retail",)
        ),
    }
)
