"""Driver-side PNG sinks (SURVEY §2 A6 — utils/visualisation.py:32-150).

Not correctness-checked (matplotlib output); each function tails a bounded
sample to the driver (never a full collect) and renders. Gated behind an
import-try: the engine works headless without matplotlib."""
from __future__ import annotations

from pyspark.sql import DataFrame

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except Exception:  # pragma: no cover - matplotlib optional
    HAVE_MPL = False


def _require_mpl() -> None:
    if not HAVE_MPL:
        raise NotImplementedError("matplotlib not available in this environment")


def visualize_samples(df: DataFrame, path: str, n_series: int = 6) -> None:
    """Sample-series grid (visualisation.py:32-61)."""
    _require_mpl()
    pdf = df.filter(df.series_id < n_series).toPandas().sort_values(["series_id", "t"])
    fig, axes = plt.subplots(n_series, 1, figsize=(10, 2 * n_series), squeeze=False)
    for i, (sid, g) in enumerate(pdf.groupby("series_id")):
        axes[i][0].plot(g.t, g.value)
        axes[i][0].set_title(f"series {sid}")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def visualize_decomposition(dec: DataFrame, path: str, series_id: int = 0) -> None:
    """Trend/seasonality/residual panels (visualisation.py:97-150)."""
    _require_mpl()
    pdf = dec.filter(dec.series_id == series_id).toPandas().sort_values("t")
    fig, axes = plt.subplots(4, 1, figsize=(10, 10))
    for ax, col in zip(axes, ["value", "trend", "seasonality", "residual"]):
        ax.plot(pdf.t, pdf[col])
        ax.set_title(col)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
