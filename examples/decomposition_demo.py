"""Decomposition-only usage demo — the engine twin of the reference's
notebooks/tutorial.ipynb (model forward without diffusion, cells 4-7).

Run: python examples/decomposition_demo.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tsgen import decompose, generators
from tsgen.session import get_spark


def main() -> None:
    spark = get_spark("decomposition-demo")

    # 1. synthesize a small dataset (tutorial uses create_synthetic_dataset)
    df = generators.generate(spark, n_series=8, seq_len=256, family="linear_sum")

    # 2. decompose: trend (poly fit) + seasonality (top-k FFT) + residual
    dec = decompose.decompose(df, degree=3, top_k=4)

    # 3. inspect the energy split per series
    summary = dec.groupBy("series_id").agg(
        F.var_samp("trend").alias("var_trend"),
        F.var_samp("seasonality").alias("var_seas"),
        F.var_samp("residual").alias("var_resid"),
    )
    summary.orderBy("series_id").show()

    # 4. optional PNG sink (works when matplotlib is installed)
    try:
        from tsgen.viz import visualize_decomposition

        visualize_decomposition(dec, "/tmp/decomposition.png", series_id=0)
        print("wrote /tmp/decomposition.png")
    except NotImplementedError:
        print("matplotlib unavailable — skipped PNG sink")


if __name__ == "__main__":
    main()
