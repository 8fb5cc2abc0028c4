"""Classical time-series toolkit queries (north-star TS-engine extension;
complements the reference's FFT/polyfit decomposition, SURVEY §2 G4/G5,
models/diffusion_ts_model.py:242-289, with the moving-average classics a
TSDB user reaches for first).

Operators:
- classical_decompose: STL-lite additive decomposition — centered
  moving-average trend + periodic-mean seasonal + residual. The textbook
  "classical decomposition" (Hyndman & Athanasopoulos §3.4), entirely
  window/agg SQL — no UDF, unlike the FFT path.
- ev_interpolate: linear-interpolation gap fill on a regular grid — the
  standard TSDB `interpolate(linear)` operator, via IGNORE NULLS window
  scans (prev/next observation) + the two-point line formula.
- ev_lttb: largest-triangle downsampling for visualization (Steinarsson's
  LTTB, mean-anchor variant): per time bucket keep the point with the
  largest triangle area against the neighboring buckets' mean points.
  The parallel-friendly form — anchors are bucket means, not the
  sequentially-chosen points, so every bucket is independent.

Scale notes (100 TB):
- classical_decompose: two windows + one tiny (series × period) agg joined
  back — all partitioned by series_id; one shuffle, reused by every stage.
- ev_interpolate: two IGNORE-NULLS window scans over the same (user, rn)
  partitioning — single shuffle, no joins, no UDF.
- ev_lttb: per-bucket agg (partial-agged) + lag/lead over the tiny bucket
  table + one equi-join back on (type, bucket) — the events side shuffles
  once on the bucket key; candidate ranking windows are per-bucket, never
  global.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import expr as E, generators, oracle
from .queries import _REGISTRY, Query, round6
from .queries_analytics import _events


# --- classical additive decomposition --------------------------------------
def classical_decompose(
    df: DataFrame,
    period: int = 12,
    half: int = 6,
    key: str = "series_id",
    value: str = "value",
) -> DataFrame:
    """Additive classical decomposition:
        trend_t    = centered (2·half+1)-point moving average (full windows
                     only — edges yield NULL, as in the textbook method)
        seasonal_p = mean of (value − trend) per phase p = t mod period,
                     re-centered to sum to zero per series
        residual_t = value − trend − seasonal
    """
    w = (
        Window.partitionBy(key)
        .orderBy("t")
        .rowsBetween(-half, half)
    )
    full = 2 * half + 1
    dec = df.withColumn(
        "trend",
        F.when(F.count("*").over(w) == full, F.avg(value).over(w)),
    ).withColumn("phase", F.col("t") % period)
    ph = dec.filter(F.col("trend").isNotNull()).groupBy(key, "phase").agg(
        F.avg(F.col(value) - F.col("trend")).alias("s_raw")
    )
    ph = ph.withColumn(
        "seasonal", F.col("s_raw") - F.avg("s_raw").over(Window.partitionBy(key))
    ).drop("s_raw")
    return (
        dec.join(ph, [key, "phase"])
        .withColumn("residual", F.col(value) - F.col("trend") - F.col("seasonal"))
        .select(key, "t", value, "trend", "seasonal", "residual")
    )


def _q_classical(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, 12, 96, "mixed")
    return round6(
        classical_decompose(df), "value", "trend", "seasonal", "residual"
    )


def _classical_sql(period: int = 12, half: int = 6) -> str:
    gen = oracle.generate_sql(12, 96, "mixed", rounded=False)
    full = 2 * half + 1
    return f"""
WITH src AS ({gen}),
d AS (
  SELECT series_id, t, value,
         CASE WHEN count(*) OVER w = {full} THEN avg(value) OVER w END AS trend,
         t % {period} AS phase
  FROM src
  WINDOW w AS (PARTITION BY series_id ORDER BY t
               ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)),
ph AS (
  SELECT series_id, phase, avg(value - trend) AS s_raw
  FROM d WHERE trend IS NOT NULL GROUP BY series_id, phase),
ph2 AS (
  SELECT series_id, phase,
         s_raw - avg(s_raw) OVER (PARTITION BY series_id) AS seasonal
  FROM ph)
SELECT d.series_id, d.t, {E.round6('d.value')} AS value,
       {E.round6('d.trend')} AS trend,
       {E.round6('ph2.seasonal')} AS seasonal,
       {E.round6('d.value - d.trend - ph2.seasonal')} AS residual
FROM d JOIN ph2 ON d.series_id = ph2.series_id AND d.phase = ph2.phase
"""


# --- linear-interpolation gap fill -----------------------------------------
def interpolate_linear(
    df: DataFrame, key: str, order: str, value: str
) -> DataFrame:
    """Fill NULL values by linear interpolation between the previous and
    next non-null observation on the `order` axis; edge gaps take the
    nearest observation (constant extrapolation). Pure window functions —
    one shuffle on the entity key."""
    wp = Window.partitionBy(key).orderBy(order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy(key).orderBy(order).rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_x = F.when(F.col(value).isNotNull(), F.col(order))
    out = (
        df.withColumn("_pv", F.last(value, ignorenulls=True).over(wp))
        .withColumn("_px", F.last(obs_x, ignorenulls=True).over(wp))
        .withColumn("_nv", F.first(value, ignorenulls=True).over(wn))
        .withColumn("_nx", F.first(obs_x, ignorenulls=True).over(wn))
    )
    filled = (
        F.when(F.col(value).isNotNull(), F.col(value))
        .when(F.col("_pv").isNull(), F.col("_nv"))
        .when(F.col("_nv").isNull(), F.col("_pv"))
        .otherwise(
            F.col("_pv")
            + (F.col("_nv") - F.col("_pv"))
            * (F.col(order) - F.col("_px")).cast("double")
            / (F.col("_nx") - F.col("_px")).cast("double")
        )
    )
    return out.withColumn("filled", filled).withColumn(
        "was_observed", F.col(value).isNotNull()
    ).drop("_pv", "_px", "_nv", "_nx")


def _q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "v_obs", F.when(F.col("rn") % 5 < 3, F.col("value"))
    )
    out = interpolate_linear(base, "user_id", "rn", "v_obs")
    return round6(
        out.select("user_id", F.col("rn").cast("bigint").alias("rn"),
                   "was_observed", "filled"),
        "filled",
    )


_INTERPOLATE_SQL = """
WITH base AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         value
  FROM events),
g AS (
  SELECT user_id, rn,
         CASE WHEN rn % 5 < 3 THEN value END AS v_obs
  FROM base),
s AS (
  SELECT user_id, rn, v_obs,
         last_value(v_obs IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN v_obs IS NOT NULL THEN rn END IGNORE NULLS) OVER wp AS px,
         first_value(v_obs IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN v_obs IS NOT NULL THEN rn END IGNORE NULLS) OVER wn AS nx
  FROM g
  WINDOW wp AS (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, CAST(rn AS BIGINT) AS rn,
       v_obs IS NOT NULL AS was_observed,
       (round((CASE WHEN v_obs IS NOT NULL THEN v_obs
                    WHEN pv IS NULL THEN nv
                    WHEN nv IS NULL THEN pv
                    ELSE pv + (nv - pv) * CAST(rn - px AS DOUBLE)
                                        / CAST(nx - px AS DOUBLE) END) + 1.0e-9,6)+0.0e0)
         AS filled
FROM s
"""


# --- LTTB downsampling ------------------------------------------------------
def lttb_downsample(ev: DataFrame, bucket: str = "hour") -> DataFrame:
    """Largest-triangle downsampling, mean-anchor (bucket-parallel) variant:
    per (event_type, bucket), keep the point maximizing the triangle area
    against the previous and next buckets' anchor points. Interior buckets
    only (first/last have no anchor); ties broken by earliest timestamp.

    Anchor x = exact bucket midpoint (an integer, bit-identical on both
    engines), anchor y = bucket mean value (O(1) magnitude, safe at 6 dp) —
    averaging epoch-microsecond x would differ in the last ulp between
    engines (partial-agg association order over 1e9-scale doubles) and
    flip the hash."""
    x = F.unix_micros(F.col("ts")) / F.lit(1000000.0)
    b = ev.withColumn("bucket_s", F.unix_timestamp(F.date_trunc(bucket, "ts")))
    means = b.groupBy("event_type", "bucket_s").agg(F.avg("value").alias("my"))
    mid = F.col("bucket_s").cast("double") + F.lit(1800.0)
    wl = Window.partitionBy("event_type").orderBy("bucket_s")
    anchors = (
        means.withColumn("px", F.lag(mid).over(wl))
        .withColumn("py", F.lag("my").over(wl))
        .withColumn("nx", F.lead(mid).over(wl))
        .withColumn("ny", F.lead("my").over(wl))
        .filter(F.col("px").isNotNull() & F.col("nx").isNotNull())
        .select("event_type", "bucket_s", "px", "py", "nx", "ny")
    )
    cand = b.join(anchors, ["event_type", "bucket_s"]).withColumn(
        "area2",
        F.abs(
            (F.col("px") - F.col("nx")) * (F.col("value") - F.col("py"))
            - (F.col("px") - x) * (F.col("ny") - F.col("py"))
        ),
    )
    wr = Window.partitionBy("event_type", "bucket_s").orderBy(
        F.desc("area2"), F.asc("ts")
    )
    return (
        cand.withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") == 1)
        .select(
            "event_type", "bucket_s", F.unix_micros("ts").alias("ts_us"),
            "value", "area2",
        )
    )


def _q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return round6(lttb_downsample(_events(spark, sf_dir)), "value", "area2")


_LTTB_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_s,
         ts, epoch_us(ts) / 1000000.0e0 AS x, value
  FROM events),
means AS (
  SELECT event_type, bucket_s, avg(value) AS my
  FROM b GROUP BY event_type, bucket_s),
anchors AS (
  SELECT event_type, bucket_s,
         lag(CAST(bucket_s AS DOUBLE) + 1800.0e0) OVER w AS px,
         lag(my) OVER w AS py,
         lead(CAST(bucket_s AS DOUBLE) + 1800.0e0) OVER w AS nx,
         lead(my) OVER w AS ny
  FROM means
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_s)),
cand AS (
  SELECT b.event_type, b.bucket_s, b.ts, b.x, b.value,
         abs((a.px - a.nx) * (b.value - a.py) - (a.px - b.x) * (a.ny - a.py)) AS area2
  FROM b JOIN anchors a
    ON b.event_type = a.event_type AND b.bucket_s = a.bucket_s
  WHERE a.px IS NOT NULL AND a.nx IS NOT NULL),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, bucket_s
                               ORDER BY area2 DESC, ts) AS r
  FROM cand)
SELECT event_type, bucket_s, epoch_us(ts) AS ts_us,
       (round((value) + 1.0e-9,6)+0.0e0) AS value,
       (round((area2) + 1.0e-9,6)+0.0e0) AS area2
FROM ranked WHERE r = 1
"""


_REGISTRY.update(
    {
        "classical_decompose": Query(
            "classical_decompose", _q_classical, _classical_sql(), ("decompose",)
        ),
        "ev_interpolate": Query(
            "ev_interpolate", _q_interpolate, _INTERPOLATE_SQL, ("tsdb",)
        ),
        "ev_lttb": Query("ev_lttb", _q_lttb, _LTTB_SQL, ("tsdb",)),
    }
)
