"""Per-series z-normalization (reference utils/data_generators.py:103-104).

torch Tensor.std() is sample std (ddof=1) → stddev_samp, and the reference
adds 1e-8 to the denominator. Implemented as unbounded window aggregates
partitioned by series_id — in Spark this compiles to a single hash-partition
shuffle on series_id followed by a window; at cluster scale the series are
evenly hash-distributed (series_id is dense), so no skew.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

EPS = 1e-8


def znorm(df: DataFrame, value_col: str = "value", key: str = "series_id") -> DataFrame:
    w = Window.partitionBy(key)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    return df.withColumn(value_col, (F.col(value_col) - mean) / (std + F.lit(EPS)))


# SQL fragment for the DuckDB oracle (identical semantics)
def znorm_sql(inner: str, value_col: str = "value", key: str = "series_id") -> str:
    """Wrap a subquery `inner` (yielding at least key, t, value) with z-norm."""
    return (
        f"SELECT * REPLACE ((({value_col} - avg({value_col}) OVER w)"
        f" / (stddev_samp({value_col}) OVER w + {EPS:.17e})) AS {value_col})"
        f" FROM ({inner}) WINDOW w AS (PARTITION BY {key})"
    )
