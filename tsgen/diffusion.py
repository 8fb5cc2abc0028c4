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
# Per-step noise roles live in widely-separated bases, stepped by a stride
# larger than normal()'s internal u2 offset (+7919, tsgen/expr.py), so no
# (role, step) pair — including the hidden u2 stream — ever reuses an LCG
# stream. With small additive bases, QNOISE+t collided with PNOISE+(t-12)
# for every t and PNOISE+14 equaled INIT.
SALT_STRIDE = 1 << 14  # > 7919, so u2 shadows never land on another step
SALT_QNOISE = 1 << 24
SALT_PNOISE = 1 << 25
SALT_INIT = 1 << 26


def step_salt(base: int, t: int) -> int:
    """Salt for noise role `base` at loop step `t` (collision-free)."""
    return base + t * SALT_STRIDE


def draw_t_step(timesteps: int, sid: str = "series_id") -> str:
    """Per-series uniform timestep ~ randint(0, T) (train_diffusion_ts.py:50)."""
    return f"CAST(floor({E.u01(sid, SALT_TSTEP)} * {timesteps}) AS BIGINT)"


def q_sample(
    df: DataFrame,
    schedule: DataFrame,
    timesteps: int,
    noise_salt: int = SALT_QNOISE,
    channel: str | None = None,
) -> DataFrame:
    """Forward diffusion x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε (diffusion_ts_model.py:610-628).

    Adds columns: t_step (per-series draw), noise, x_t.

    For multivariate series pass `channel`: the timestep draw stays
    per-SAMPLE (one t for the whole (seq_len, dim) tensor, matching the
    reference's per-batch-element randint) while the noise key folds the
    channel in, so each channel gets an independent ε realization instead
    of dim copies of the same one.
    """
    if channel is None:
        noise_key = E.pt_key()
    else:
        from .generators import multichannel_key

        noise_key = E.pt_key(multichannel_key("series_id", channel))
    df = df.withColumn("t_step", F.expr(draw_t_step(timesteps))).withColumn(
        "noise", F.expr(E.normal(noise_key, noise_salt))
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
    noise = F.expr(E.normal(E.pt_key(), step_salt(noise_salt, t)))
    return df.withColumn(out_col, mean + F.lit(post_var**0.5) * noise)


def sample(
    spark: SparkSession,
    n_series: int,
    seq_len: int,
    timesteps: int = 50,
    kind: str = "cosine",
    denoiser: Callable[[DataFrame, int], DataFrame] | None = None,
    checkpoint_every: int = 10,
    return_intermediates: bool = False,
    n_intermediates: int = 5,
) -> DataFrame | tuple[DataFrame, list[tuple[int, DataFrame]]]:
    """Reverse-diffusion sampling loop (diffusion_ts_model.py:736-772).

    Starts from x ~ N(0,1) on the (series, t) grid and runs T sequential
    posterior steps. `denoiser(df, t)` must add/replace column `x0_pred`
    given current `x` (the reference uses the learned model here; the
    engine's deterministic default — trend+seasonality decomposition — is
    wired in decompose.decomposition_denoiser).

    With `return_intermediates` (the reference sample()'s flag, consumed by
    visualize_diffusion_process, utils/visualisation.py:62-95) also returns
    [(step_number, snapshot_df), ...] captured every max(1, T//n_intermediates)-th
    step — the SURVEY §2 F3 stride filter. Snapshots are localCheckpoint-pinned
    so capturing doesn't re-run the prefix of the loop per snapshot.
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
    stride = max(1, timesteps // n_intermediates)
    captures: list[tuple[int, DataFrame]] = []
    for i, t in enumerate(reversed(range(timesteps))):
        df = denoiser(df, t)
        df = p_sample_step(df, sched, t).drop("x0_pred")
        if (i + 1) % checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
        if return_intermediates and (i + 1) % stride == 0:
            df = df.localCheckpoint(eager=True)
            captures.append((i + 1, df))
    if return_intermediates:
        return df, captures
    return df


def _np_lcg3(key, salt: int):
    """Exact numpy replica of expr.lcg3 (int64-safe: all products < 2^62)."""
    h = (key * E.LCG_A + E.LCG_C + salt) % E.M31
    h = (h * h + E.LCG_A) % E.M31
    h = (h * E.LCG_A + E.LCG_C) % E.M31
    h = (h * h + E.LCG_C) % E.M31
    return h


def _np_normal(key, salt: int):
    import numpy as np

    u1 = _np_lcg3(key, salt) / E.M31
    u2 = _np_lcg3(key, salt + 7919) / E.M31
    return np.sqrt(-2.0 * np.log(1.0 - u1)) * np.cos(E.TWO_PI * u2)


def sample_fused(
    spark: SparkSession,
    n_series: int,
    seq_len: int,
    timesteps: int = 50,
    kind: str = "cosine",
    degree: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Reverse diffusion with the WHOLE T-step loop fused into one
    mapInPandas pass.

    Key insight: each series evolves independently (the denoiser and the
    posterior step are per-series; noise is a pure function of
    (series_id, t, step)), so the loop needs NO cross-series communication —
    the driver-loop form (`sample`) pays T shuffles purely for Spark's
    iteration mechanics. Fusing yields identical values (the numpy LCG is an
    exact integer replica of the SQL one; asserted in tests) with exactly
    ONE narrow pass: Range → mapInPandas. At T=500 (config.json:16) this is
    the difference between 500 scheduled jobs and one.
    """
    import numpy as np
    import pandas as pd

    from .decompose import DEFAULT_DEGREE, DEFAULT_TOP_K, _poly_design

    degree = DEFAULT_DEGREE if degree is None else degree
    top_k = DEFAULT_TOP_K if top_k is None else top_k
    sched = {
        r.t_step: r.asDict() for r in schedule_table(spark, timesteps, kind).collect()
    }
    A = _poly_design(seq_len, degree)
    proj = A @ np.linalg.pinv(A)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            sids = pdf["series_id"].to_numpy()
            m = len(sids)
            ts = np.arange(seq_len, dtype=np.int64)
            keys = (sids[:, None] * 131071 + ts[None, :]) % E.M31
            X = _np_normal(keys, SALT_INIT)
            for t in reversed(range(timesteps)):
                trend = X @ proj.T
                det = X - trend
                spec = np.fft.rfft(det, axis=1)
                mag = np.abs(spec)
                kk = min(top_k, spec.shape[1])
                idx = np.argpartition(-mag, kk - 1, axis=1)[:, :kk]
                mask = np.zeros_like(mag)
                np.put_along_axis(mask, idx, 1.0, axis=1)
                x0 = trend + np.fft.irfft(spec * mask, n=seq_len, axis=1)
                if t > 0:
                    row = sched[t]
                    mean = (
                        row["alpha"] ** 0.5 * (1.0 - row["alpha_cumprod_prev"]) * X
                        + row["alpha_cumprod_prev"] ** 0.5 * (1.0 - row["alpha"]) * x0
                    ) / (1.0 - row["alpha_cumprod"])
                    noise = _np_normal(keys, step_salt(SALT_PNOISE, t))
                    X = mean + row["posterior_variance"] ** 0.5 * noise
                else:
                    X = x0
            yield pd.DataFrame(
                {
                    "series_id": np.repeat(sids, seq_len),
                    "t": np.tile(ts, m),
                    "x": X.reshape(-1),
                }
            )

    grid = spark.range(n_series).withColumnRenamed("id", "series_id")
    return grid.mapInPandas(fn, "series_id bigint, t bigint, x double")


def _np_u01(key, salt: int):
    return _np_lcg3(key, salt) / E.M31


def _np_signal(family: str, sids, seq_len: int, lambda_decay: float = 0.5):
    """numpy replica of expr.signal_expr(family, seq_len) (libm-identical
    up to 1 ulp). sids: int64 array of series ids → (len(sids), seq_len)."""
    import numpy as np

    def u(salt, lo, hi):
        return (lo + (hi - lo) * _np_u01(sids, salt))[:, None]

    tv = (np.arange(seq_len) * (4.0 * E.PI / (seq_len - 1)))[None, :]
    f1, p1 = u(E.SALT_FREQ1, 2.0, 4.0), u(E.SALT_PHASE1, 0.0, E.TWO_PI)
    if family == "sine":
        return np.sin(f1 * tv + p1)
    if family == "cosine":
        return np.cos(f1 * tv + p1)
    if family == "mixed":
        f2, p2 = u(E.SALT_FREQ2, 2.0, 4.0), u(E.SALT_PHASE2, 0.0, E.TWO_PI)
        a1, a2 = u(E.SALT_AMP1, 0.3, 0.7), u(E.SALT_AMP2, 0.3, 0.7)
        return a1 * np.sin(f1 * tv + p1) + a2 * np.cos(f2 * tv + p2)
    if family == "exponential_decay":
        decay = np.exp(-lambda_decay * tv / (4.0 * E.PI))
        return decay * np.sin(f1 * tv + p1)
    raise ValueError(f"unknown family: {family}")


def _np_mixed_signal(sids, seq_len: int):
    return _np_signal("mixed", sids, seq_len)


def sample_conditional_fused(
    spark: SparkSession,
    n_series: int,
    seq_len: int,
    timesteps: int = 10,
    history_len: int = 16,
    kind: str = "cosine",
    degree: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Fused form of sample_conditional: the whole forecast-conditioned
    reverse-diffusion loop in one mapInPandas pass (same independence
    argument as sample_fused; equivalence tested)."""
    import numpy as np
    import pandas as pd

    from .decompose import DEFAULT_DEGREE, DEFAULT_TOP_K, _poly_design

    degree = DEFAULT_DEGREE if degree is None else degree
    top_k = DEFAULT_TOP_K if top_k is None else top_k
    sched = {
        r.t_step: r.asDict() for r in schedule_table(spark, timesteps, kind).collect()
    }
    A = _poly_design(seq_len, degree)
    proj = A @ np.linalg.pinv(A)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            sids = pdf["series_id"].to_numpy()
            m = len(sids)
            ts = np.arange(seq_len, dtype=np.int64)
            keys = (sids[:, None] * 131071 + ts[None, :]) % E.M31
            observed = ts[None, :] < history_len
            known = _np_mixed_signal(sids, seq_len)
            X = _np_normal(keys, SALT_INIT)
            for t in reversed(range(timesteps)):
                trend = X @ proj.T
                det = X - trend
                spec = np.fft.rfft(det, axis=1)
                mag = np.abs(spec)
                kk = min(top_k, spec.shape[1])
                idx = np.argpartition(-mag, kk - 1, axis=1)[:, :kk]
                mask = np.zeros_like(mag)
                np.put_along_axis(mask, idx, 1.0, axis=1)
                x0 = trend + np.fft.irfft(spec * mask, n=seq_len, axis=1)
                if t > 0:
                    row = sched[t]
                    mean = (
                        row["alpha"] ** 0.5 * (1.0 - row["alpha_cumprod_prev"]) * X
                        + row["alpha_cumprod_prev"] ** 0.5 * (1.0 - row["alpha"]) * x0
                    ) / (1.0 - row["alpha_cumprod"])
                    X = mean + row["posterior_variance"] ** 0.5 * _np_normal(
                        keys, step_salt(SALT_PNOISE, t)
                    )
                    prev = sched[t - 1]
                    noised_known = prev["sqrt_ac"] * known + prev["sqrt_1m_ac"] * _np_normal(
                        keys, step_salt(SALT_QNOISE, t)
                    )
                    X = np.where(observed, noised_known, X)
                else:
                    X = np.where(observed, known, x0)
            yield pd.DataFrame(
                {
                    "series_id": np.repeat(sids, seq_len),
                    "t": np.tile(ts, m),
                    "observed": np.tile(observed[0], m),
                    "x": X.reshape(-1),
                }
            )

    grid = spark.range(n_series).withColumnRenamed("id", "series_id")
    return grid.mapInPandas(fn, "series_id bigint, t bigint, observed boolean, x double")


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
            ) * F.expr(_E.normal(_E.pt_key(), step_salt(SALT_QNOISE, t)))
            df = df.withColumn("x", F.when(F.col("observed"), noised_known).otherwise(F.col("x")))
        else:
            df = df.withColumn("x", F.when(F.col("observed"), F.col("x_known")).otherwise(F.col("x")))
        if (i + 1) % checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
    return df


def sample_conditional_label(
    spark: SparkSession,
    n_series: int,
    seq_len: int,
    timesteps: int = 10,
    kind: str = "cosine",
    families: tuple[str, ...] = ("sine", "cosine", "mixed", "exponential_decay"),
    guidance: float = 1.0,
    degree: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Label-conditional reverse diffusion with classifier-free-guidance-style
    blending — the deterministic analog of the reference's class-conditioned
    sampling (ClassEmbedding diffusion_ts_model.py:152-198; y/force_uncond
    conditioning :512-521; conditional smoke test :872-915).

    Each series draws the SAME label as create_labeled_dataset (A2,
    SALT_LABEL), and at every step the x̂₀ estimate is the CFG blend

        x̂₀ = uncond + w·(cond − uncond)

    where `uncond` is the unconditional decomposition denoiser output,
    `cond` is the labeled family's clean signal (what the class-conditioned
    model predicts in the w→∞ limit), and w=`guidance` (0 → unconditional,
    1 → fully conditioned, >1 extrapolates as in CFG). Fused: the whole
    T-step loop runs in one mapInPandas pass (same per-series independence
    argument as sample_fused).

    → (series_id, label, t, x); with guidance=1 the t=0 replace makes the
    final x exactly the labeled family signal (property-tested).
    """
    import numpy as np
    import pandas as pd

    from .decompose import DEFAULT_DEGREE, DEFAULT_TOP_K, _poly_design

    degree = DEFAULT_DEGREE if degree is None else degree
    top_k = DEFAULT_TOP_K if top_k is None else top_k
    n_fam = len(families)
    sched = {
        r.t_step: r.asDict() for r in schedule_table(spark, timesteps, kind).collect()
    }
    A = _poly_design(seq_len, degree)
    proj = A @ np.linalg.pinv(A)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            sids = pdf["series_id"].to_numpy()
            m = len(sids)
            ts = np.arange(seq_len, dtype=np.int64)
            keys = (sids[:, None] * 131071 + ts[None, :]) % E.M31
            labels = np.floor(_np_u01(sids, E.SALT_LABEL) * n_fam).astype(np.int64)
            # per-label family dispatch: evaluate each family's signal for the
            # batch, select rows by label (n_fam small → negligible overhead)
            cond = np.zeros((m, seq_len))
            for li, fam in enumerate(families):
                sel = labels == li
                if sel.any():
                    cond[sel] = _np_signal(fam, sids[sel], seq_len)
            X = _np_normal(keys, SALT_INIT)
            for t in reversed(range(timesteps)):
                trend = X @ proj.T
                det = X - trend
                spec = np.fft.rfft(det, axis=1)
                mag = np.abs(spec)
                kk = min(top_k, spec.shape[1])
                idx = np.argpartition(-mag, kk - 1, axis=1)[:, :kk]
                mask = np.zeros_like(mag)
                np.put_along_axis(mask, idx, 1.0, axis=1)
                uncond = trend + np.fft.irfft(spec * mask, n=seq_len, axis=1)
                x0 = uncond + guidance * (cond - uncond)
                if t > 0:
                    row = sched[t]
                    mean = (
                        row["alpha"] ** 0.5 * (1.0 - row["alpha_cumprod_prev"]) * X
                        + row["alpha_cumprod_prev"] ** 0.5 * (1.0 - row["alpha"]) * x0
                    ) / (1.0 - row["alpha_cumprod"])
                    X = mean + row["posterior_variance"] ** 0.5 * _np_normal(
                        keys, step_salt(SALT_PNOISE, t)
                    )
                else:
                    X = x0
            yield pd.DataFrame(
                {
                    "series_id": np.repeat(sids, seq_len),
                    "label": np.repeat(labels, seq_len),
                    "t": np.tile(ts, m),
                    "x": X.reshape(-1),
                }
            )

    grid = spark.range(n_series).withColumnRenamed("id", "series_id")
    return grid.mapInPandas(fn, "series_id bigint, label bigint, t bigint, x double")
