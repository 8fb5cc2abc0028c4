"""Diffusion noise-schedule tables (reference models/diffusion_ts_model.py:77-89,591-608).

The whole schedule is ONE dialect-shared SQL text built from layered
subqueries; Spark executes it via spark.sql, the DuckDB oracle runs the same
text with only the leaf range() scan swapped. T ≤ O(1000) rows — at cluster
scale this table is always broadcast (see diffusion.py joins).

Columns (FIXTURES.md §4): t_step, beta, alpha, alpha_cumprod,
alpha_cumprod_prev, posterior_variance, sqrt_ac, sqrt_1m_ac.

Math notes:
- cumprod ᾱ_t = ∏ α_i  has no SQL builtin → exp(Σ ln α) running-sum window
  (valid: 0 < α < 1), SURVEY §2 C8.
- cosine schedule: β_t = 1 − ᾱ(t+1)/ᾱ(t); the ᾱ(0) normalization at
  diffusion_ts_model.py:86 cancels in the ratio, so β has a closed form and
  needs no self-join/window.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import expr as E

BETA_START = 1e-4
BETA_END = 0.02
COSINE_S = 0.008


def beta_expr(kind: str, timesteps: int, t: str = "t_step") -> str:
    """β as a SQL double expr over t_step ∈ [0, T)."""
    if kind == "linear":
        # torch.linspace(beta_start, beta_end, T) — diffusion_ts_model.py:77-79
        step = (BETA_END - BETA_START) / (timesteps - 1)
        return f"({E.NUM(BETA_START)} + {E.NUM(step)} * ({t}))"
    if kind == "cosine":
        # diffusion_ts_model.py:82-89; f(x) = cos(((x/T)+s)/(1+s) * π/2)^2
        def f(x: str) -> str:
            return (
                f"pow(cos(((({x}) / {E.NUM(timesteps)}) + {E.NUM(COSINE_S)})"
                f" / {E.NUM(1 + COSINE_S)} * {E.NUM(E.PI * 0.5)}), 2)"
            )

        raw = f"(1.0e0 - {f(f'({t}) + 1.0e0')} / {f(f'CAST({t} AS DOUBLE)')})"
        # torch.clip(betas, 0.0001, 0.9999)
        return f"least(greatest({raw}, 1.0e-4), 9.999e-1)"
    raise ValueError(f"unknown beta schedule: {kind}")


def schedule_sql(timesteps: int, kind: str, from_clause: str) -> str:
    """Full schedule table SQL; `from_clause` must yield column t_step."""
    l1 = f"SELECT t_step, {beta_expr(kind, timesteps)} AS beta FROM {from_clause}"
    l2 = f"SELECT t_step, beta, (1.0e0 - beta) AS alpha FROM ({l1})"
    l3 = (
        "SELECT t_step, beta, alpha, "
        "exp(sum(ln(alpha)) OVER (ORDER BY t_step ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
        f" AS alpha_cumprod FROM ({l2})"
    )
    l4 = (
        "SELECT t_step, beta, alpha, alpha_cumprod, "
        "lag(alpha_cumprod, 1, 1.0e0) OVER (ORDER BY t_step) AS alpha_cumprod_prev"
        f" FROM ({l3})"
    )
    return (
        "SELECT t_step, beta, alpha, alpha_cumprod, alpha_cumprod_prev, "
        "beta * (1.0e0 - alpha_cumprod_prev) / (1.0e0 - alpha_cumprod) AS posterior_variance, "
        "sqrt(alpha_cumprod) AS sqrt_ac, "
        "sqrt(1.0e0 - alpha_cumprod) AS sqrt_1m_ac "
        f"FROM ({l4})"
    )


def spark_from_clause(timesteps: int) -> str:
    return f"(SELECT id AS t_step FROM range({timesteps}))"


def duckdb_from_clause(timesteps: int) -> str:
    return f"(SELECT range AS t_step FROM range({timesteps}))"


def schedule_table(spark: SparkSession, timesteps: int, kind: str = "cosine") -> DataFrame:
    """Materialize the schedule as a (cached) Spark DataFrame.

    The single-partition window over ≤1000 rows is intentional — this table
    is tiny and always broadcast at the consumer joins.
    """
    return spark.sql(schedule_sql(timesteps, kind, spark_from_clause(timesteps)))


def schedule_oracle_sql(timesteps: int, kind: str, rounded: bool = True) -> str:
    sql = schedule_sql(timesteps, kind, duckdb_from_clause(timesteps))
    if not rounded:
        return sql
    cols = [
        "beta",
        "alpha",
        "alpha_cumprod",
        "alpha_cumprod_prev",
        "posterior_variance",
        "sqrt_ac",
        "sqrt_1m_ac",
    ]
    sel = ", ".join(["t_step"] + [f"{E.round6(c)} AS {c}" for c in cols])
    return f"SELECT {sel} FROM ({sql})"
