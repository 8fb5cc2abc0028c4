"""FFT kernels — the one operator family Catalyst can't express natively
(SURVEY §2 G1-G3). Arrow-batched grouped-map pandas UDFs (applyInPandas),
never row-at-a-time Python.

Scale notes:
- One hash shuffle on series_id brings each series to one task; groups are
  seq_len-sized (≤ a few thousand doubles) so memory per group is trivial and
  the work distributes evenly (series_id is dense → no skew).
- Values are sorted by t INSIDE the UDF — never rely on input order after a
  shuffle.
- Composites (top-k filter → inverse FFT) run in the SAME UDF pass where
  possible (see decompose.py) so the whole spectral pipeline costs exactly
  one shuffle.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

RFFT_SCHEMA = "series_id bigint, freq_idx bigint, re double, im double, magnitude double"


def rfft(df: DataFrame, value_col: str = "value", key: str = "series_id", t_col: str = "t") -> DataFrame:
    """Real FFT per series (torch.fft.rfft, diffusion_ts_model.py:275,648).

    → (series_id, freq_idx, re, im, magnitude), seq_len//2+1 rows per series.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col)
        spec = np.fft.rfft(pdf[value_col].to_numpy())
        return pd.DataFrame(
            {
                "series_id": pdf[key].iloc[0],
                "freq_idx": np.arange(len(spec)),
                "re": spec.real,
                "im": spec.imag,
                "magnitude": np.abs(spec),
            }
        )

    return df.select(key, t_col, value_col).groupBy(key).applyInPandas(fn, RFFT_SCHEMA)


IRFFT_SCHEMA = "series_id bigint, t bigint, value double"


def irfft(freq_df: DataFrame, seq_len: int, key: str = "series_id") -> DataFrame:
    """Inverse real FFT (torch.fft.irfft, diffusion_ts_model.py:287).

    Input: (series_id, freq_idx, re, im) → (series_id, t, value).
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("freq_idx")
        spec = pdf["re"].to_numpy() + 1j * pdf["im"].to_numpy()
        x = np.fft.irfft(spec, n=seq_len)
        return pd.DataFrame({"series_id": pdf[key].iloc[0], "t": np.arange(seq_len), "value": x})

    return freq_df.groupBy(key).applyInPandas(fn, IRFFT_SCHEMA)


def topk_filter_mask(spec: np.ndarray, k: int) -> np.ndarray:
    """Zero all but the k largest-|amplitude| bins (diffusion_ts_model.py:277-286).

    torch.topk keeps the k largest; ties broken by index order is
    measure-zero for real signals.
    """
    k = min(k, len(spec))
    mask = np.zeros(len(spec))
    mask[np.argsort(-np.abs(spec), kind="stable")[:k]] = 1.0
    return mask
