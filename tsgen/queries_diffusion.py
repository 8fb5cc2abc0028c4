"""Oracle-checked queries for schedules, diffusion algebra, masking, losses
(SURVEY §2 B12-B19, C3, E1). Registered into tsgen.queries._REGISTRY."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import expr as E, diffusion, generators, masking, metrics, oracle
from .queries import _REGISTRY, Query, round6
from .schedules import duckdb_from_clause, schedule_oracle_sql, schedule_sql, schedule_table

T_Q = 50  # test-scale timesteps (config.json uses 500; SURVEY §7 keeps tests small)
N_Q, LEN_Q = 12, 64

SCHED_COLS = (
    "beta alpha alpha_cumprod alpha_cumprod_prev posterior_variance sqrt_ac sqrt_1m_ac"
).split()


def _sched_query(kind: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return round6(schedule_table(spark, 100, kind), *SCHED_COLS)

    return fn


def _gen_cte() -> str:
    """Normalized mixed-family series as an (unrounded) oracle subquery."""
    return oracle.generate_sql(N_Q, LEN_Q, "mixed", rounded=False)


def _sched_cte(timesteps: int = T_Q, kind: str = "cosine") -> str:
    return schedule_sql(timesteps, kind, duckdb_from_clause(timesteps))


def _qsample_sql() -> str:
    tstep = diffusion.draw_t_step(T_Q)
    noise = E.normal(E.pt_key(), diffusion.SALT_QNOISE)
    return (
        f"WITH s AS ({_gen_cte()}), sch AS ({_sched_cte()}), "
        f"b AS (SELECT series_id, t, value, {tstep} AS t_step, {noise} AS noise FROM s) "
        "SELECT b.series_id, b.t, b.t_step, "
        f"{E.round6('b.value')} AS value, {E.round6('b.noise')} AS noise, "
        f"{E.round6('(sch.sqrt_ac * b.value + sch.sqrt_1m_ac * b.noise)')} AS x_t "
        "FROM b JOIN sch ON b.t_step = sch.t_step"
    )


def _q_qsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, N_Q, LEN_Q, "mixed")
    sched = schedule_table(spark, T_Q, "cosine")
    out = diffusion.q_sample(df, sched, T_Q).select(
        "series_id", "t", "t_step", "value", "noise", "x_t"
    )
    return round6(out, "value", "noise", "x_t")


def _x0_sql() -> str:
    tstep = diffusion.draw_t_step(T_Q)
    noise = E.normal(E.pt_key(), diffusion.SALT_QNOISE)
    return (
        f"WITH s AS ({_gen_cte()}), sch AS ({_sched_cte()}), "
        f"b AS (SELECT series_id, t, value, {tstep} AS t_step, {noise} AS noise FROM s), "
        "j AS (SELECT b.*, sch.sqrt_ac, sch.sqrt_1m_ac, "
        "(sch.sqrt_ac * b.value + sch.sqrt_1m_ac * b.noise) AS x_t "
        "FROM b JOIN sch ON b.t_step = sch.t_step) "
        "SELECT series_id, t, "
        f"{E.round6('((x_t - sqrt_1m_ac * noise) / sqrt_ac)')} AS x0_pred FROM j"
    )


def _q_x0(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, N_Q, LEN_Q, "mixed")
    sched = schedule_table(spark, T_Q, "cosine")
    noisy = diffusion.q_sample(df, sched, T_Q)
    out = diffusion.predict_start_from_noise(noisy, sched).select("series_id", "t", "x0_pred")
    return round6(out, "x0_pred")


P_T = 10  # fixed timestep for the posterior-step query


def _posterior_sql() -> str:
    clean = E.signal_expr("mixed", LEN_Q)
    noisy = E.noisy_signal_expr("mixed", LEN_Q)
    pn = E.normal(E.pt_key(), diffusion.step_salt(diffusion.SALT_PNOISE, P_T))
    mean = (
        "(sqrt(alpha) * (1.0e0 - alpha_cumprod_prev) * x"
        " + sqrt(alpha_cumprod_prev) * (1.0e0 - alpha) * x0)"
        " / (1.0e0 - alpha_cumprod)"
    )
    return (
        f"WITH sch AS (SELECT * FROM ({_sched_cte()}) WHERE t_step = {P_T}), "
        f"b AS (SELECT series_id, t, {noisy} AS x, {clean} AS x0 FROM {oracle.grid_sql(N_Q, LEN_Q)}) "
        f"SELECT b.series_id, b.t, {E.round6(f'({mean} + sqrt(posterior_variance) * {pn})')} AS x_prev "
        "FROM b CROSS JOIN sch"
    )


def _q_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        generators.base_grid(spark, N_Q, LEN_Q)
        .withColumn("x", F.expr(E.noisy_signal_expr("mixed", LEN_Q)))
        .withColumn("x0_pred", F.expr(E.signal_expr("mixed", LEN_Q)))
    )
    sched = schedule_table(spark, T_Q, "cosine")
    out = diffusion.p_sample_step(df, sched, P_T, x_col="x", out_col="x_prev").select(
        "series_id", "t", "x_prev"
    )
    return round6(out, "x_prev")


def _q_mask_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, N_Q, LEN_Q, "mixed")
    out = masking.apply_mask(masking.forecast_mask(df, LEN_Q // 2))
    return round6(out.select("series_id", "t", "observed", "value", "masked_value"), "value", "masked_value")


def _q_mask_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = generators.generate(spark, N_Q, LEN_Q, "mixed")
    out = masking.apply_mask(masking.imputation_mask(df, 0.2))
    return round6(out.select("series_id", "t", "observed", "value", "masked_value"), "value", "masked_value")


def _mask_oracle(history_len=None, missing_frac=None) -> str:
    inner = masking.mask_sql(_gen_cte(), history_len, missing_frac)
    return (
        "SELECT series_id, t, observed, "
        f"{E.round6('value')} AS value, {E.round6('masked_value')} AS masked_value "
        f"FROM ({inner})"
    )


def _q_loss_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        generators.base_grid(spark, 24, 96)
        .withColumn("pred", F.expr(E.noisy_signal_expr("mixed", 96)))
        .withColumn("target", F.expr(E.signal_expr("mixed", 96)))
    )
    return round6(metrics.mse(df, "pred", "target"), "mse")


def _loss_mse_sql() -> str:
    inner = (
        f"SELECT {E.noisy_signal_expr('mixed', 96)} AS pred, "
        f"{E.signal_expr('mixed', 96)} AS target FROM {oracle.grid_sql(24, 96)}"
    )
    return f"SELECT {E.round6('avg(pow(pred - target, 2))')} AS mse FROM ({inner})"


_REGISTRY.update(
    {
        "sched_linear": Query(
            "sched_linear", _sched_query("linear"), schedule_oracle_sql(100, "linear"), ("schedule",)
        ),
        "sched_cosine": Query(
            "sched_cosine", _sched_query("cosine"), schedule_oracle_sql(100, "cosine"), ("schedule",)
        ),
        "qsample": Query("qsample", _q_qsample, _qsample_sql(), ("diffusion",)),
        "predict_x0": Query("predict_x0", _q_x0, _x0_sql(), ("diffusion",)),
        "posterior_step": Query("posterior_step", _q_posterior, _posterior_sql(), ("diffusion",)),
        "mask_forecast": Query(
            "mask_forecast", _q_mask_forecast, _mask_oracle(history_len=LEN_Q // 2), ("masking",)
        ),
        "mask_impute": Query(
            "mask_impute", _q_mask_impute, _mask_oracle(missing_frac=0.2), ("masking",)
        ),
        "loss_mse": Query("loss_mse", _q_loss_mse, _loss_mse_sql(), ("loss",)),
    }
)
