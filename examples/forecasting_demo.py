"""Forecasting/state-space tour — every forecaster in the engine run on the
same synthetic batch, with holdout error side by side:

    generate (trend+seasonal mixed family, last `H` points held out)
      -> seasonal-naive          (pure window)
      -> SES                     (closed-form weighted sum, mapInPandas)
      -> Holt linear             (time-step-vectorized kernel)
      -> Holt-Winters additive   (seasonal phase-matrix kernel)
      -> Theta method            (pure Catalyst — NO Python stage)
      -> Kalman filter + RTS smoother + one EM step (local-level model)

Run: python examples/forecasting_demo.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from tsgen import forecast, generators  # noqa: E402
from tsgen.session import get_spark  # noqa: E402

H, SEASON = 8, 8


def main() -> None:
    spark = get_spark("forecasting-demo")
    full = generators.generate(spark, 16, 64, "mixed")
    train = full.filter(F.col("t") < 64 - H)
    truth = full.filter(F.col("t") >= 64 - H).select(
        "series_id", "t", F.col("value").alias("actual")
    )

    def holdout_mae(fc, label):
        j = fc.join(truth, ["series_id", "t"])
        mae = j.agg(F.avg(F.abs(F.col("forecast") - F.col("actual")))).collect()[0][0]
        print(f"{label:<22s} holdout MAE = {mae:.4f}")

    holdout_mae(
        forecast.seasonal_naive(train, season=SEASON, horizon=H), "seasonal-naive"
    )
    ses = forecast.ses_forecast(train).select(
        "series_id", F.col("level").alias("_l")
    )
    # SES is flat: forecast every horizon step at the final level
    hs = spark.range(1, H + 1).select(F.col("id").alias("h"))
    ses_fc = ses.crossJoin(F.broadcast(hs)).select(
        "series_id", (F.lit(64 - H - 1) + F.col("h")).alias("t"), F.col("_l").alias("forecast")
    )
    holdout_mae(ses_fc, "SES (flat)")
    holt = forecast.holt_forecast(train, horizon=H)
    # holt emits one row per series at the final step: expand to horizons
    holt_fc = holt.select("series_id", "level", "trend").crossJoin(F.broadcast(hs)).select(
        "series_id",
        (F.lit(64 - H - 1) + F.col("h")).alias("t"),
        (F.col("level") + F.col("h") * F.col("trend")).alias("forecast"),
    )
    holdout_mae(holt_fc, "Holt linear")
    holdout_mae(
        forecast.holt_winters(train, season=SEASON, horizon=H).select(
            "series_id", "t", "forecast"
        ),
        "Holt-Winters additive",
    )
    theta = forecast.theta_forecast(train, horizon=H).select(
        "series_id", (F.lit(64 - H - 1) + F.col("h")).alias("t"), "forecast"
    )
    holdout_mae(theta, "Theta (pure Catalyst)")

    em = forecast.kalman_em(train).select("series_id", "q_hat", "r_hat")
    print("\nKalman EM (one step from q=0.01, r=0.5) — first 4 series:")
    for r in em.orderBy("series_id").limit(4).collect():
        print(f"  series {r.series_id}: q̂={r.q_hat:.4f}  r̂={r.r_hat:.4f}")


if __name__ == "__main__":
    main()
