"""Masks for forecasting / imputation (diffusion_ts_model.py:482,493-500;
README.md:247-279) — SURVEY §2 B19.

Long format: `observed BOOLEAN` column; mask application is a single
F.when projection (no shuffle).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import expr as E

SALT_IMPUTE = 71


def forecast_mask(df: DataFrame, history_len: int, t: str = "t") -> DataFrame:
    """observed = t < history_len (README.md:251-258: condition on past)."""
    return df.withColumn("observed", F.col(t) < F.lit(history_len))


def imputation_mask(df: DataFrame, missing_frac: float = 0.2) -> DataFrame:
    """Scattered missing positions, deterministic per (series_id, t)."""
    u = E.u01(E.pt_key(), SALT_IMPUTE)
    return df.withColumn("observed", F.expr(f"{u} >= {E.NUM(missing_frac)}"))


def apply_mask(
    df: DataFrame, value_col: str = "value", mask_value: float = 0.0, out_col: str = "masked_value"
) -> DataFrame:
    """torch.where(mask, x, mask_token) (diffusion_ts_model.py:493-500)."""
    return df.withColumn(
        out_col, F.when(F.col("observed"), F.col(value_col)).otherwise(F.lit(mask_value))
    )


def mask_sql(inner: str, history_len: int | None, missing_frac: float | None, mask_value: float = 0.0) -> str:
    """Oracle twin: forecast (history_len) or imputation (missing_frac)."""
    if history_len is not None:
        observed = f"(t < {history_len})"
    else:
        observed = f"({E.u01(E.pt_key(), SALT_IMPUTE)} >= {E.NUM(missing_frac)})"
    return (
        f"SELECT *, CASE WHEN observed THEN value ELSE {E.NUM(mask_value)} END AS masked_value"
        f" FROM (SELECT *, {observed} AS observed FROM ({inner}))"
    )
