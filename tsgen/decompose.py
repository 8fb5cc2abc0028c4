"""Trend / seasonality / residual decomposition (SURVEY §2 G4-G7, §3 entry 3).

The reference's interpretable decomposition contract
(diffusion_ts_model.py:550-554, visualisation.py:113-117):
    output = trend + seasonality + residual
with trend ≈ polynomial in t (TrendSynthesisLayer, :200-239, basis
c = arange(seq_len)/seq_len at :219-221) and seasonality = top-k Fourier
modes (FourierSynthesisLayer, :242-289). The learned projections are HOW the
model approximates this; the engine computes the closed-form analogs:

- trend: per-series least-squares polynomial fit. Implemented as *moment
  aggregation* (sums of t^i and t^i·x — a partial-aggregated groupBy, the
  cheapest possible distributed form) followed by a tiny per-series normal-
  equation solve in a pandas UDF, then a co-partitioned join back.
- seasonality: FFT top-k of the detrended signal, one applyInPandas pass.
- residual: remainder (G7).

`decompose` runs trend+seasonality+residual in ONE applyInPandas pass
(single shuffle on series_id) — the fast path used by the sampling loop.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .spectral import topk_filter_mask

DEFAULT_DEGREE = 3  # poly_degree, config.json:22
DEFAULT_TOP_K = 4  # top_k_freq, config.json:21


def _poly_design(n: int, degree: int) -> np.ndarray:
    # basis c = arange(seq_len)/seq_len — diffusion_ts_model.py:219-221
    c = np.arange(n) / n
    return np.vander(c, degree + 1, increasing=True)


def _fit_trend(x: np.ndarray, degree: int) -> np.ndarray:
    A = _poly_design(len(x), degree)
    coef, *_ = np.linalg.lstsq(A, x, rcond=None)
    return A @ coef


def decompose(
    df: DataFrame,
    degree: int = DEFAULT_DEGREE,
    top_k: int = DEFAULT_TOP_K,
    value_col: str = "value",
    key: str | list[str] = "series_id",
) -> DataFrame:
    """Full decomposition, batch-vectorized.

    → (*key, t, value, trend, seasonality, residual) with
    value = trend + seasonality + residual exactly. `key` may be a composite
    (e.g. ["series_id", "channel"] for the reference's dim>1 contract,
    utils/data_generators.py:40,51) — each (series, channel) decomposes
    independently.

    Physical plan: ONE shuffle (groupBy collect_list to wide form), then a
    narrow mapInPandas that processes a whole Arrow batch of series at once —
    equal-length series are stacked into an (n_series, seq_len) matrix so the
    polynomial fit is a single pinv matmul and the FFT a single
    np.fft.rfft(axis=1). ~10-100x less Python/pandas overhead than the
    per-group applyInPandas form (kept below as decompose_grouped).
    """
    from collections.abc import Iterator

    keys = [key] if isinstance(key, str) else list(key)
    key_schema = ", ".join(f"{k} bigint" for k in keys)
    schema = f"{key_schema}, t bigint, {value_col} double, trend double, seasonality double, residual double"
    wide = df.groupBy(*keys).agg(
        F.array_sort(F.collect_list(F.struct("t", F.col(value_col).alias("v")))).alias("pts")
    ).select(*keys, F.col("pts.t").alias("ts"), F.col("pts.v").alias("vs"))
    # field extraction happens JVM-side: Arrow hands the UDF plain
    # list<double> columns, so stacking below is pure numpy (no dict walks)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pinv_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            lengths = pdf["vs"].map(len).to_numpy()
            for n in np.unique(lengths):
                sub = pdf[lengths == n]
                X = np.stack(sub["vs"].to_numpy())
                T = np.stack(sub["ts"].to_numpy())
                if n not in pinv_cache:
                    A = _poly_design(int(n), degree)
                    pinv_cache[int(n)] = (A, np.linalg.pinv(A))
                A, Ainv = pinv_cache[int(n)]
                trend = (A @ (Ainv @ X.T)).T
                det = X - trend
                spec = np.fft.rfft(det, axis=1)
                kk = min(top_k, spec.shape[1])
                mag = np.abs(spec)
                # per-row top-k mask (vectorized argpartition)
                idx = np.argpartition(-mag, kk - 1, axis=1)[:, :kk]
                mask = np.zeros_like(mag)
                np.put_along_axis(mask, idx, 1.0, axis=1)
                seas = np.fft.irfft(spec * mask, n=int(n), axis=1)
                yield pd.DataFrame(
                    {
                        **{k: np.repeat(sub[k].to_numpy(), n) for k in keys},
                        "t": T.reshape(-1),
                        value_col: X.reshape(-1),
                        "trend": trend.reshape(-1),
                        "seasonality": seas.reshape(-1),
                        "residual": (X - trend - seas).reshape(-1),
                    }
                )

    return wide.mapInPandas(fn, schema)


def decompose_grouped(
    df: DataFrame,
    degree: int = DEFAULT_DEGREE,
    top_k: int = DEFAULT_TOP_K,
    value_col: str = "value",
    key: str = "series_id",
) -> DataFrame:
    """Per-group reference implementation (one pandas call per series)."""
    schema = f"{key} bigint, t bigint, {value_col} double, trend double, seasonality double, residual double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        x = pdf[value_col].to_numpy()
        trend = _fit_trend(x, degree)
        det = x - trend
        spec = np.fft.rfft(det)
        seas = np.fft.irfft(spec * topk_filter_mask(spec, top_k), n=len(x))
        return pd.DataFrame(
            {
                key: pdf[key].iloc[0],
                "t": pdf["t"].to_numpy(),
                value_col: x,
                "trend": trend,
                "seasonality": seas,
                "residual": x - trend - seas,
            }
        )

    return df.select(key, "t", value_col).groupBy(key).applyInPandas(fn, schema)


def extract_seasonality(
    df: DataFrame, top_k: int = DEFAULT_TOP_K, value_col: str = "value", key: str = "series_id"
) -> DataFrame:
    """G4 flagship composite: rfft → top-k amplitude mask → irfft, one pass."""
    schema = f"{key} bigint, t bigint, seasonality double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        x = pdf[value_col].to_numpy()
        spec = np.fft.rfft(x)
        seas = np.fft.irfft(spec * topk_filter_mask(spec, top_k), n=len(x))
        return pd.DataFrame({key: pdf[key].iloc[0], "t": pdf["t"].to_numpy(), "seasonality": seas})

    return df.select(key, "t", value_col).groupBy(key).applyInPandas(fn, schema)


def trend_linear(df: DataFrame, value_col: str = "value", key: str = "series_id") -> DataFrame:
    """Degree-1 trend in closed form — pure Catalyst aggregations (no UDF),
    and therefore DuckDB-oracle-checkable. Basis c = t/seq_len.

    slope = cov(c,x)/var(c); intercept = mean(x) − slope·mean(c).
    Returns per-series (intercept, slope).
    """
    # computed via grouped sums so the whole thing is one partial-agg shuffle
    g = df.groupBy(key).agg(
        F.count("*").alias("n"),
        F.sum(F.col("t").cast("double")).alias("st"),
        F.sum(F.col("t").cast("double") * F.col("t")).alias("stt"),
        F.sum(value_col).alias("sx"),
        F.sum(F.col("t").cast("double") * F.col(value_col)).alias("stx"),
    )
    # work in basis c = t/n: slope_c = slope_t * n, etc.
    slope_t = (F.col("n") * F.col("stx") - F.col("st") * F.col("sx")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    intercept = (F.col("sx") - slope_t * F.col("st")) / F.col("n")
    return g.select(
        key,
        intercept.alias("intercept"),
        (slope_t * F.col("n")).alias("slope"),  # slope w.r.t. c = t/n
    )


def quad_trend_sql_exprs() -> dict[str, str]:
    """Degree-2 least squares in CLOSED FORM (Cramer's rule on the 3×3
    normal equations) over moment columns m0..m4, b0..b2 — shared SQL text
    for both engines; no UDF anywhere.

    A = [[m0,m1,m2],[m1,m2,m3],[m2,m3,m4]], rhs = [b0,b1,b2];
    c_i = det(A with column i replaced by rhs) / det(A).
    """

    def det3(a, b, c, d, e, f, g, h, i):
        return (
            f"({a}*({e}*{i} - {f}*{h}) - {b}*({d}*{i} - {f}*{g}) + {c}*({d}*{h} - {e}*{g}))"
        )

    D = det3("m0", "m1", "m2", "m1", "m2", "m3", "m2", "m3", "m4")
    D0 = det3("b0", "m1", "m2", "b1", "m2", "m3", "b2", "m3", "m4")
    D1 = det3("m0", "b0", "m2", "m1", "b1", "m3", "m2", "b2", "m4")
    D2 = det3("m0", "m1", "b0", "m1", "m2", "b1", "m2", "m3", "b2")
    return {"det": D, "c0": f"({D0} / {D})", "c1": f"({D1} / {D})", "c2": f"({D2} / {D})"}


def trend_quadratic(df: DataFrame, value_col: str = "value", key: str = "series_id") -> DataFrame:
    """Degree-2 polynomial trend coefficients per series, pure Catalyst:
    one partial-agg shuffle for the moments, then closed-form Cramer
    expressions (quad_trend_sql_exprs — the identical text runs in the
    DuckDB oracle). Basis c = t/n as in _poly_design."""
    # per-series length via window count over the one hash(key) exchange —
    # the groupBy + join-back form re-evaluated df per branch (recompute
    # census); _n is an exact integer, so values are unchanged
    j = df.withColumn("_n", F.count("*").over(Window.partitionBy(key)))
    c = F.col("t").cast("double") / F.col("_n")
    g = j.groupBy(key).agg(
        F.count("*").cast("double").alias("m0"),
        F.sum(c).alias("m1"),
        F.sum(c * c).alias("m2"),
        F.sum(c * c * c).alias("m3"),
        F.sum(c * c * c * c).alias("m4"),
        F.sum(F.col(value_col)).alias("b0"),
        F.sum(c * F.col(value_col)).alias("b1"),
        F.sum(c * c * F.col(value_col)).alias("b2"),
    )
    e = quad_trend_sql_exprs()
    return g.select(
        key, F.expr(e["c0"]).alias("c0"), F.expr(e["c1"]).alias("c1"), F.expr(e["c2"]).alias("c2")
    )


def det3_expr(a, b, c, d, e, f, g, h, i) -> str:
    """3×3 determinant as shared SQL text over column symbols."""
    return (
        f"({a}*({e}*{i} - {f}*{h}) - {b}*({d}*{i} - {f}*{g}) + {c}*({d}*{h} - {e}*{g}))"
    )


def det4_expr(m: list[list[str]]) -> str:
    """4×4 determinant (cofactor expansion along the first row)."""
    terms = []
    for j, sign in zip(range(4), ("+", "-", "+", "-")):
        sub = [[r[k] for k in range(4) if k != j] for r in m[1:]]
        terms.append(f"{sign} {m[0][j]}*{det3_expr(*sub[0], *sub[1], *sub[2])}")
    return "(" + " ".join(terms) + ")"


def cramer4_exprs(A: list[list[str]], rhs: list[str]) -> dict[str, str]:
    """Solve A·w = rhs in closed form (Cramer's rule) over symbolic 4×4
    entries — returns {'det': ..., 'c0'..'c3': ...} as SQL text usable
    identically in Spark and DuckDB (bit-equal given bit-equal inputs)."""
    D = det4_expr(A)
    out = {"det": D}
    for i in range(4):
        Ai = [list(row) for row in A]
        for r in range(4):
            Ai[r][i] = rhs[r]
        out[f"c{i}"] = f"({det4_expr(Ai)} / {D})"
    return out


def cubic_trend_sql_exprs() -> dict[str, str]:
    """Degree-3 least squares in CLOSED FORM (Cramer's rule on the 4×4
    normal equations) over moments m0..m6, b0..b3 — generalizes
    quad_trend_sql_exprs; the identical text runs in both engines so the
    results are bit-equal.

    A[i][j] = m_{i+j} (i,j ≤ 3), rhs = [b0..b3].
    """
    A = [[f"m{i + j}" for j in range(4)] for i in range(4)]
    return cramer4_exprs(A, ["b0", "b1", "b2", "b3"])


# per-point cubic evaluation — SHARED text (identical parse tree both engines)
CUBIC_EVAL = "(c0 + c1*cc + c2*(cc*cc) + c3*(cc*cc*cc))"


def trend_cubic(df: DataFrame, value_col: str = "value", key: str = "series_id") -> DataFrame:
    """Degree-3 polynomial trend coefficients per series, pure Catalyst (no
    UDF): one partial-agg shuffle for the moments m0..m6 / b0..b3, then the
    closed-form Cramer expressions (cubic_trend_sql_exprs — identical text in
    the DuckDB oracle). Basis c = t/n as in _poly_design."""
    j = df.withColumn(
        "_n", F.count("*").over(Window.partitionBy(key))
    ).withColumn("cc", F.col("t").cast("double") / F.col("_n"))
    aggs = [F.expr("CAST(count(*) AS DOUBLE)").alias("m0")]
    for i in range(1, 7):
        aggs.append(F.expr("sum(" + "*".join(["cc"] * i) + ")").alias(f"m{i}"))
    for i in range(4):
        prod = "*".join(["cc"] * i + [value_col]) if i else value_col
        aggs.append(F.expr(f"sum({prod})").alias(f"b{i}"))
    g = j.groupBy(key).agg(*aggs)
    e = cubic_trend_sql_exprs()
    return g.select(key, *[F.expr(e[f"c{i}"]).alias(f"c{i}") for i in range(4)])


def trend_poly(
    df: DataFrame, degree: int = DEFAULT_DEGREE, value_col: str = "value", key: str = "series_id"
) -> DataFrame:
    """Arbitrary-degree trend via distributed moment aggregation + per-series
    normal-equation solve.

    The groupBy computes Σ c^i (i ≤ 2·degree) and Σ c^i·x (i ≤ degree) with
    map-side partial aggregation — the shuffle carries ~(3·degree+2) doubles
    per series no matter how long the series is. The 4×4 solve runs in a
    pandas UDF over the tiny aggregate table.

    Returns (series_id, t, trend).
    """
    aggs = [F.count("*").alias("m0")]
    cexpr = F.col("t").cast("double") / F.col("_n")
    # window count for _n (no join-back), and pin: `joined` feeds both the
    # moment aggregation and the final trend projection
    joined = df.withColumn(
        "_n", F.count("*").over(Window.partitionBy(key))
    ).localCheckpoint(eager=False)
    for i in range(1, 2 * degree + 1):
        aggs.append(F.sum(F.pow(cexpr, i)).alias(f"m{i}"))
    for i in range(degree + 1):
        aggs.append(F.sum(F.pow(cexpr, i) * F.col(value_col)).alias(f"b{i}"))
    moments = joined.groupBy(key).agg(*aggs)

    coef_schema = f"{key} bigint, " + ", ".join(f"c{i} double" for i in range(degree + 1))

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            m = [r[f"m{i}"] for i in range(2 * degree + 1)]
            A = np.array([[m[i + j] for j in range(degree + 1)] for i in range(degree + 1)])
            b = np.array([r[f"b{i}"] for i in range(degree + 1)])
            coef = np.linalg.solve(A, b)
            out.append([r[key], *coef])
        return pd.DataFrame(out, columns=[key] + [f"c{i}" for i in range(degree + 1)])

    coefs = moments.groupBy(key).applyInPandas(solve, coef_schema)
    trend = sum(
        (F.col(f"c{i}") * F.pow(F.col("t").cast("double") / F.col("_n"), i) for i in range(1, degree + 1)),
        F.col("c0"),
    )
    return (
        joined.join(coefs, key)
        .withColumn("trend", trend)
        .select(key, "t", value_col, "trend")
    )


def decomposition_denoiser(df: DataFrame, t: int) -> DataFrame:
    """Engine-default denoiser for diffusion.sample: x̂₀ = trend + seasonality
    of the current state (the reference model's decomposition contract,
    diffusion_ts_model.py:538-542)."""
    dec = decompose(df.withColumnRenamed("x", "value"))
    return (
        dec.withColumn("x0_pred", F.col("trend") + F.col("seasonality"))
        .withColumnRenamed("value", "x")
        .select("series_id", "t", "x", "x0_pred")
    )


def trend_theilsen(
    df: DataFrame, value_col: str = "value", key: str = "series_id"
) -> DataFrame:
    """Theil–Sen robust slope per series: the MEDIAN of all pairwise slopes
    (y_j − y_i)/(j − i), i < j — breakdown point 29% vs 0% for OLS (one
    outlier can move the OLS line arbitrarily; Theil–Sen shrugs it off).

    Pairs are generated per series by a self-equi-join on the series key
    with i < j — O(T²) rows per series, bounded by the fixed seq_len (64²/2
    ≈ 2k pairs), embarrassingly parallel across series; the median is the
    exact type-1 rank over each series' own pair set (window partitioned by
    series — parallelism = series count). Intercept = median(y) − slope ·
    median(t) (the Siegel form), same rank machinery."""
    from pyspark.sql import Window

    # four branches read df (both pair sides + the y/t medians): pin it,
    # or each branch re-runs the upstream lineage (recompute census: x8)
    df = df.localCheckpoint(eager=False)
    a = df.select(key, F.col("t").alias("ti"), F.col(value_col).alias("yi"))
    b = df.select(key, F.col("t").alias("tj"), F.col(value_col).alias("yj"))
    pairs = a.join(b, key).filter(F.col("ti") < F.col("tj")).select(
        key, ((F.col("yj") - F.col("yi")) / (F.col("tj") - F.col("ti"))).alias("slope")
    )

    def _median(d: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(key).orderBy(col)
        cw = Window.partitionBy(key)
        return (
            d.withColumn("_r", F.row_number().over(w))
            .withColumn("_n", F.count("*").over(cw))
            .filter(F.col("_r") == F.floor((F.col("_n") + 1) / 2))
            .select(key, F.col(col).alias(out))
        )

    med_slope = _median(pairs, "slope", "ts_slope")
    med_y = _median(df.select(key, F.col(value_col).alias("y")), "y", "med_y")
    med_t = _median(df.select(key, F.col("t").cast("double").alias("tt")), "tt", "med_t")
    return (
        med_slope.join(med_y, key)
        .join(med_t, key)
        .select(
            key,
            "ts_slope",
            (F.col("med_y") - F.col("ts_slope") * F.col("med_t")).alias("ts_intercept"),
        )
    )


def theilsen_sql(inner: str) -> str:
    """Oracle twin — same pair join, same type-1 (lower) median rank with
    explicit floor (DuckDB's float→int CAST rounds; Spark's truncates)."""
    return f"""
WITH src AS ({inner}),
pairs AS (
  SELECT a.series_id, (b.value - a.value) / (b.t - a.t) AS slope
  FROM src a JOIN src b ON a.series_id = b.series_id AND a.t < b.t),
ms AS (
  SELECT series_id, slope AS ts_slope FROM (
    SELECT series_id, slope,
           row_number() OVER (PARTITION BY series_id ORDER BY slope) AS r,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM pairs) WHERE r = CAST(floor((n + 1) / 2) AS BIGINT)),
my AS (
  SELECT series_id, value AS med_y FROM (
    SELECT series_id, value,
           row_number() OVER (PARTITION BY series_id ORDER BY value) AS r,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM src) WHERE r = CAST(floor((n + 1) / 2) AS BIGINT)),
mt AS (
  SELECT series_id, tt AS med_t FROM (
    SELECT series_id, CAST(t AS DOUBLE) AS tt,
           row_number() OVER (PARTITION BY series_id ORDER BY tt) AS r,
           count(*) OVER (PARTITION BY series_id) AS n
    FROM src) WHERE r = CAST(floor((n + 1) / 2) AS BIGINT))
SELECT ms.series_id, ts_slope, med_y - ts_slope * med_t AS ts_intercept
FROM ms JOIN my ON ms.series_id = my.series_id
JOIN mt ON ms.series_id = mt.series_id
"""
