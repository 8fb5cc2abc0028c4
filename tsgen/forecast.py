"""Forecasting operators (north-star TS-engine extension; the reference
generates and denoises series — an engine serving its users also needs
baseline forecasters).

- seasonal_naive: ŷ(T+h) = y(T+h−m) — pure window/join SQL, oracle-checked.
- ses: simple exponential smoothing level forecast — recursive, so it runs
  batch-vectorized in mapInPandas (pandas-twin tested).
- anomalies: decomposition-residual z-score flags — composition of
  decompose() and per-series stats.
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .decompose import decompose


def seasonal_naive(
    df: DataFrame, season: int, horizon: int, key: str = "series_id", value: str = "value"
) -> DataFrame:
    """Forecast the next `horizon` points as the last season's values.

    For h in 1..horizon: ŷ(T+h) = y(T + 1 + ((h−1) mod m) − m) where T is
    the last observed index. One groupBy + a broadcast-joined horizon range.
    """
    last = df.groupBy(key).agg(F.max("t").alias("_T"))
    hs = df.sparkSession.range(1, horizon + 1).select(F.col("id").alias("h"))
    want = (
        last.crossJoin(F.broadcast(hs))
        .withColumn("src_t", F.col("_T") + 1 + (F.col("h") - 1) % season - season)
        .withColumn("t", F.col("_T") + F.col("h"))
    )
    src = df.select(F.col(key), F.col("t").alias("src_t"), F.col(value).alias("forecast"))
    return want.join(src, [key, "src_t"]).select(key, "t", "h", "forecast")


def seasonal_naive_sql(inner: str, season: int, horizon: int) -> str:
    """Oracle twin over a subquery yielding (series_id, t, value)."""
    return f"""
WITH s AS ({inner}),
last AS (SELECT series_id, max(t) AS last_t FROM s GROUP BY series_id),
want AS (
  SELECT series_id, h, last_t + 1 + (h - 1) % {season} - {season} AS src_t,
         last_t + h AS t
  FROM last CROSS JOIN (SELECT range AS h FROM range(1, {horizon + 1})))
SELECT w.series_id, w.t, w.h, s.value AS forecast
FROM want w JOIN s ON w.series_id = s.series_id AND w.src_t = s.t
"""


def ses_forecast(
    df: DataFrame, alpha: float = 0.3, key: str = "series_id", value: str = "value"
) -> DataFrame:
    """Simple exponential smoothing: level_t = α·y_t + (1−α)·level_{t−1};
    the one-step-ahead forecast is the final level. Recursive → vectorized
    per Arrow batch of series in mapInPandas."""
    wide = (
        df.groupBy(key)
        .agg(F.array_sort(F.collect_list(F.struct("t", F.col(value).alias("v")))).alias("pts"))
        .select(key, F.col("pts.v").alias("vs"))
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out_keys, levels = [], []
            for k, vs in zip(pdf[key], pdf["vs"]):
                arr = np.asarray(vs, dtype=float)
                n = len(arr)
                # Closed form of the recursion level_t = α·y_t + (1−α)·level_{t−1}:
                #   level_{n−1} = (1−α)^(n−1)·y_0 + α·Σ_{t≥1} (1−α)^(n−1−t)·y_t
                # — one vectorized dot product per series, no per-point loop.
                w = alpha * np.power(1.0 - alpha, np.arange(n - 1, -1, -1, dtype=float))
                w[0] = (1.0 - alpha) ** (n - 1)
                out_keys.append(k)
                levels.append(float(w @ arr))
            yield pd.DataFrame({key: out_keys, "level": levels})

    return wide.mapInPandas(fn, f"{key} bigint, level double")


def anomalies(
    df: DataFrame, threshold: float = 3.0, key: str = "series_id", value: str = "value"
) -> DataFrame:
    """Decomposition-residual anomalies: flag points whose residual z-score
    exceeds `threshold` — trend/seasonality-aware outlier detection."""
    dec = decompose(df, value_col=value, key=key)
    stats = dec.groupBy(key).agg(
        F.avg("residual").alias("_mu"), F.stddev_samp("residual").alias("_sd")
    )
    return (
        dec.join(F.broadcast(stats), key)
        .withColumn("res_z", (F.col("residual") - F.col("_mu")) / F.col("_sd"))
        .filter(F.abs(F.col("res_z")) > threshold)
        .select(key, "t", value, "residual", "res_z")
    )
