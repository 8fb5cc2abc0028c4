"""Forward / reverse Gaussian diffusion algebra over long-format series.

Re-expresses models/diffusion_ts_model.py:610-636 (q_sample, x0 inversion),
:695-734 (DDPM posterior step), :736-772 (sampling loop) as DataFrame ops.

Scale design:
- The schedule lookup (`extract`, diffusion_ts_model.py:70-74) is an
  equi-join of the (arbitrarily large) series table against the ≤1000-row
  schedule table → ALWAYS a broadcast hash join, no shuffle of the big side
  (we hint F.broadcast explicitly; verified BroadcastHashJoin in .explain).
- Noise is a pure function of (series_id, t, salt) so the sampling loop is
  reproducible regardless of partitioning/retries.
- The reverse loop (I1) is driver-sequential by nature (T data-dependent
  steps); lineage is cut with localCheckpoint every `checkpoint_every`
  iterations to keep plans bounded (SURVEY §4).
"""
from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import expr as E
from .schedules import schedule_table

SALT_TSTEP = 31
SALT_QNOISE = 41
SALT_PNOISE = 53
SALT_INIT = 67


def draw_t_step(timesteps: int, sid: str = "series_id") -> str:
    """Per-series uniform timestep ~ randint(0, T) (train_diffusion_ts.py:50)."""
    return f"CAST(floor({E.u01(sid, SALT_TSTEP)} * {timesteps}) AS BIGINT)"


def q_sample(
    df: DataFrame,
    schedule: DataFrame,
    timesteps: int,
    noise_salt: int = SALT_QNOISE,
) -> DataFrame:
    """Forward diffusion x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε (diffusion_ts_model.py:610-628).

    Adds columns: t_step (per-series draw), noise, x_t.
    """
    df = df.withColumn("t_step", F.expr(draw_t_step(timesteps))).withColumn(
        "noise", F.expr(E.normal(E.pt_key(), noise_salt))
    )
    sched = F.broadcast(schedule.select("t_step", "sqrt_ac", "sqrt_1m_ac"))
    return (
        df.join(sched, "t_step")
        .withColumn("x_t", F.col("sqrt_ac") * F.col("value") + F.col("sqrt_1m_ac") * F.col("noise"))
        .drop("sqrt_ac", "sqrt_1m_ac")
    )


def predict_start_from_noise(df: DataFrame, schedule: DataFrame) -> DataFrame:
    """x₀ = (x_t − √(1−ᾱ_t)·ε)/√ᾱ_t (diffusion_ts_model.py:630-636).

    Expects columns x_t, noise, t_step; adds x0_pred.
    """
    sched = F.broadcast(schedule.select("t_step", "sqrt_ac", "sqrt_1m_ac"))
    return (
        df.join(sched, "t_step")
        .withColumn("x0_pred", (F.col("x_t") - F.col("sqrt_1m_ac") * F.col("noise")) / F.col("sqrt_ac"))
        .drop("sqrt_ac", "sqrt_1m_ac")
    )


def p_sample_step(
    df: DataFrame,
    schedule: DataFrame,
    t: int,
    x_col: str = "x",
    x0_col: str = "x0_pred",
    out_col: str = "x",
    noise_salt: int = SALT_PNOISE,
) -> DataFrame:
    """One DDPM posterior step (diffusion_ts_model.py:695-734).

    t > 0:  mean = [√α_t(1−ᾱ_{t−1})·x + √ᾱ_{t−1}(1−α_t)·x̂₀]/(1−ᾱ_t);
            x_{t−1} = mean + √posterior_variance·ε
    t = 0:  x̂₀.
    Note: the reference's x̂₀ clamp is commented out (:717-718) — matched.
    """
    row = schedule.filter(F.col("t_step") == t).collect()[0]
    alpha_t, ac_t, ac_prev, post_var = (
        row.alpha,
        row.alpha_cumprod,
        row.alpha_cumprod_prev,
        row.posterior_variance,
    )
    if t == 0:
        return df.withColumn(out_col, F.col(x0_col))
    mean = (
        F.lit(alpha_t**0.5) * F.lit(1.0 - ac_prev) * F.col(x_col)
        + F.lit(ac_prev**0.5) * F.lit(1.0 - alpha_t) * F.col(x0_col)
    ) / F.lit(1.0 - ac_t)
    noise = F.expr(E.normal(E.pt_key(), noise_salt + t))
    return df.withColumn(out_col, mean + F.lit(post_var**0.5) * noise)


def sample(
    spark: SparkSession,
    n_series: int,
    seq_len: int,
    timesteps: int = 50,
    kind: str = "cosine",
    denoiser: Callable[[DataFrame, int], DataFrame] | None = None,
    checkpoint_every: int = 10,
) -> DataFrame:
    """Reverse-diffusion sampling loop (diffusion_ts_model.py:736-772).

    Starts from x ~ N(0,1) on the (series, t) grid and runs T sequential
    posterior steps. `denoiser(df, t)` must add/replace column `x0_pred`
    given current `x` (the reference uses the learned model here; the
    engine's deterministic default — trend+seasonality decomposition — is
    wired in decompose.decomposition_denoiser).
    """
    from .generators import base_grid

    if denoiser is None:
        from .decompose import decomposition_denoiser

        denoiser = decomposition_denoiser
    sched = schedule_table(spark, timesteps, kind).cache()
    sched.count()
    df = base_grid(spark, n_series, seq_len).withColumn(
        "x", F.expr(E.normal(E.pt_key(), SALT_INIT))
    )
    for i, t in enumerate(reversed(range(timesteps))):
        df = denoiser(df, t)
        df = p_sample_step(df, sched, t).drop("x0_pred")
        if (i + 1) % checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
    return df


def sample_conditional(
    spark: SparkSession,
    n_series: int,
    seq_len: int,
    timesteps: int = 10,
    history_len: int = 16,
    kind: str = "cosine",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Forecast-conditional sampling (mask path, diffusion_ts_model.py:482,
    493-500; README.md:247-279): observed positions (t < history_len) are
    re-imposed after every posterior step at their q_sample(t)-noised level,
    so generation is conditioned on the known history — the replace-based
    imputation sampler expressed over DataFrames.
    """
    from .generators import base_grid
    from .masking import forecast_mask

    from . import expr as _E

    sched = schedule_table(spark, timesteps, kind).cache()
    sched.count()
    known = base_grid(spark, n_series, seq_len).withColumn(
        "x_known", F.expr(_E.signal_expr("mixed", seq_len))
    )
    df = forecast_mask(known, history_len).withColumn(
        "x", F.expr(_E.normal(_E.pt_key(), SALT_INIT))
    )
    from .decompose import decomposition_denoiser

    for i, t in enumerate(reversed(range(timesteps))):
        dec = decomposition_denoiser(df.select("series_id", "t", "x"), t)
        df = df.drop("x").join(dec, ["series_id", "t"])
        df = p_sample_step(df, sched, t).drop("x0_pred")
        if t > 0:
            # re-impose observed history, noised to the current level
            row = sched.filter(F.col("t_step") == t - 1).collect()[0]
            noised_known = F.lit(row.sqrt_ac) * F.col("x_known") + F.lit(
                row.sqrt_1m_ac
            ) * F.expr(_E.normal(_E.pt_key(), SALT_QNOISE + t))
            df = df.withColumn("x", F.when(F.col("observed"), noised_known).otherwise(F.col("x")))
        else:
            df = df.withColumn("x", F.when(F.col("observed"), F.col("x_known")).otherwise(F.col("x")))
        if (i + 1) % checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
    return df
