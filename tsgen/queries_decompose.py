"""Queries for spectral + decomposition operators (SURVEY §2 G1-G7, D5).

FFT has no DuckDB equivalent → those entries are rows-only checks (driver
records the weaker gate) backed by property tests in tests/test_decompose.py
(Parseval, round-trip, k=all identity, exact-poly recovery).
trend_linear IS oracle-checked (closed-form aggregation in both engines).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import decompose, generators, metrics, oracle, spectral
from . import expr as E
from .queries import _REGISTRY, Query, round6

N_D, LEN_D = 12, 64


def _q_trend_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, N_D, LEN_D, "linear_sum")
    return round6(decompose.trend_linear(df), "intercept", "slope")


def _trend_linear_sql() -> str:
    gen = oracle.generate_sql(N_D, LEN_D, "linear_sum", rounded=False)
    return (
        f"WITH s AS ({gen}), g AS ("
        "SELECT series_id, count(*) AS n, sum(CAST(t AS DOUBLE)) AS st, "
        "sum(CAST(t AS DOUBLE) * t) AS stt, sum(value) AS sx, "
        "sum(CAST(t AS DOUBLE) * value) AS stx FROM s GROUP BY series_id) "
        "SELECT series_id, "
        f"{E.round6('((sx - (n * stx - st * sx) / (n * stt - st * st) * st) / n)')} AS intercept, "
        f"{E.round6('((n * stx - st * sx) / (n * stt - st * st) * n)')} AS slope "
        "FROM g"
    )


def _q_trend_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # closed-form degree-3 fit (Cramer, no UDF) evaluated per point — the
    # identical expression text runs in the DuckDB oracle, turning the last
    # G5 entry from rows-only to hash-checked. Equivalence of the closed
    # form to the normal-equation UDF solve (trend_poly) is unit-tested.
    df = generators.generate(spark, N_D, LEN_D, "linear_sum")
    coeffs = decompose.trend_cubic(df)
    out = (
        df.withColumn("cc", F.col("t").cast("double") / F.lit(float(LEN_D)))
        .join(coeffs, "series_id")
        .withColumn("trend", F.expr(decompose.CUBIC_EVAL))
        .select("series_id", "t", "trend")
    )
    return round6(out, "trend")


def _trend_poly3_sql() -> str:
    gen = oracle.generate_sql(N_D, LEN_D, "linear_sum", rounded=False)
    e = decompose.cubic_trend_sql_exprs()
    cc = f"CAST(t AS DOUBLE)/{LEN_D}"
    moments = ", ".join(
        f"sum({'*'.join(['cc'] * i)}) AS m{i}" for i in range(1, 7)
    )
    bs = ", ".join(
        f"sum({'*'.join(['cc'] * i + ['value']) if i else 'value'}) AS b{i}"
        for i in range(4)
    )
    return (
        f"WITH s AS (SELECT series_id, t, value, {cc} AS cc FROM ({gen})), "
        f"g AS (SELECT series_id, CAST(count(*) AS DOUBLE) AS m0, {moments}, {bs} "
        "FROM s GROUP BY series_id), "
        f"co AS (SELECT series_id, {e['c0']} AS c0, {e['c1']} AS c1, "
        f"{e['c2']} AS c2, {e['c3']} AS c3 FROM g) "
        f"SELECT s.series_id, s.t, {E.round6(decompose.CUBIC_EVAL)} AS trend "
        "FROM s JOIN co ON s.series_id = co.series_id"
    )


def _q_fft_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, 8, LEN_D, "mixed", noise=False, normalize=False)
    return round6(spectral.rfft(df), "re", "im", "magnitude")


def _q_fft_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # D5: ranking window + filter = top-k (torch.topk, diffusion_ts_model.py:279)
    df = generators.generate(spark, 8, LEN_D, "mixed", noise=False, normalize=False)
    spec = spectral.rfft(df)
    w = Window.partitionBy("series_id").orderBy(F.desc("magnitude"), F.asc("freq_idx"))
    out = (
        spec.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 4)
        .select("series_id", "freq_idx", "magnitude", "rank")
    )
    return round6(out, "magnitude")


def _q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, 8, LEN_D, "mixed", noise=False, normalize=False)
    return round6(decompose.extract_seasonality(df, 4), "seasonality")


def _q_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, N_D, LEN_D, "linear_sum")
    out = decompose.decompose(df)
    return round6(out, "value", "trend", "seasonality", "residual")


def _q_decompose_multichannel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dim>1 contract (utils/data_generators.py:40,51): each (series, channel)
    # decomposes independently on the composite key. Rows-only (FFT); the
    # per-channel additivity + channel-independence invariants are asserted
    # in tests/test_decompose.py.
    df = generators.generate_multichannel(spark, 6, LEN_D, 3, "mixed")
    out = decompose.decompose(df, key=["series_id", "channel"])
    return round6(out, "value", "trend", "seasonality", "residual")


def _q_loss_fourier(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        generators.base_grid(spark, 8, LEN_D)
        .withColumn("pred", F.expr(E.noisy_signal_expr("mixed", LEN_D)))
        .withColumn("target", F.expr(E.signal_expr("mixed", LEN_D)))
    )
    return round6(
        metrics.fourier_loss(df, "pred", "target", LEN_D), "time_loss", "freq_loss", "fourier_loss"
    )


def _q_loss_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        generators.base_grid(spark, 8, LEN_D)
        .withColumn("pred", F.expr(E.noisy_signal_expr("mixed", LEN_D)))
        .withColumn("target", F.expr(E.signal_expr("mixed", LEN_D)))
    )
    out = metrics.combined_loss(df, "pred", "target", LEN_D)
    return round6(out, "time_loss", "freq_loss", "fourier_loss", "combined_loss")


def _q_sample_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    # I1: reverse-diffusion sampling, decomposition denoiser, T=10
    from . import diffusion

    out = diffusion.sample(spark, 4, 32, timesteps=10, checkpoint_every=5)
    return round6(out.select("series_id", "t", "x"), "x")


def _q_sample_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    # I1 fused: whole T-step loop in one mapInPandas pass (equivalence to
    # the driver loop asserted in tests/test_diffusion.py)
    from . import diffusion

    out = diffusion.sample_fused(spark, 8, 64, timesteps=20)
    return round6(out.select("series_id", "t", "x"), "x")


_REGISTRY.update(
    {
        "trend_linear": Query("trend_linear", _q_trend_linear, _trend_linear_sql(), ("decompose",)),
        "trend_poly3": Query("trend_poly3", _q_trend_poly, _trend_poly3_sql(), ("decompose",)),
        "fft_spectrum": Query("fft_spectrum", _q_fft_spectrum, None, ("spectral",)),
        "fft_topk": Query("fft_topk", _q_fft_topk, None, ("spectral",)),
        "seasonality_topk": Query("seasonality_topk", _q_seasonality, None, ("decompose",)),
        "decompose_full": Query("decompose_full", _q_decompose, None, ("decompose",)),
        "decompose_multichannel": Query(
            "decompose_multichannel", _q_decompose_multichannel, None, ("decompose",)
        ),
        "loss_fourier": Query("loss_fourier", _q_loss_fourier, None, ("loss",)),
        "loss_combined": Query("loss_combined", _q_loss_combined, None, ("loss",)),
        "sample_loop": Query("sample_loop", _q_sample_loop, None, ("diffusion",)),
        "sample_fused": Query("sample_fused", _q_sample_fused, None, ("diffusion",)),
    }
)


def _q_trend_quadratic(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, N_D, LEN_D, "linear_sum")
    return round6(decompose.trend_quadratic(df), "c0", "c1", "c2")


def _trend_quadratic_sql() -> str:
    gen = oracle.generate_sql(N_D, LEN_D, "linear_sum", rounded=False)
    e = decompose.quad_trend_sql_exprs()
    return (
        f"WITH s AS ({gen}), g AS ("
        "SELECT series_id, CAST(count(*) AS DOUBLE) AS m0, "
        f"sum(CAST(t AS DOUBLE)/{LEN_D}) AS m1, "
        f"sum(pow(CAST(t AS DOUBLE)/{LEN_D}, 2)) AS m2, "
        f"sum(pow(CAST(t AS DOUBLE)/{LEN_D}, 3)) AS m3, "
        f"sum(pow(CAST(t AS DOUBLE)/{LEN_D}, 4)) AS m4, "
        "sum(value) AS b0, "
        f"sum(CAST(t AS DOUBLE)/{LEN_D} * value) AS b1, "
        f"sum(pow(CAST(t AS DOUBLE)/{LEN_D}, 2) * value) AS b2 "
        "FROM s GROUP BY series_id) "
        f"SELECT series_id, {E.round6(e['c0'])} AS c0, "
        f"{E.round6(e['c1'])} AS c1, {E.round6(e['c2'])} AS c2 FROM g"
    )


_REGISTRY["trend_quadratic"] = Query(
    "trend_quadratic", _q_trend_quadratic, _trend_quadratic_sql(), ("decompose",)
)
