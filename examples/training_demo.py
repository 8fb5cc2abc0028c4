"""End-to-end training-run demo — the engine twin of the reference's
`python test_training.py --config config.json` (test_training.py:49-198):
config → generate train/val → forward-diffuse → fit denoiser per epoch →
track best → checkpoint → sample → decompose. Every step is the
deterministic Spark analog; the learned transformer is replaced by the
closed-form linear denoiser (tsgen/train.py).

Run: python examples/training_demo.py
"""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tsgen import diffusion, io, runner, train
from tsgen.queries_training import _ep_exprs, EP_EPOCHS
from tsgen.schedules import schedule_table
from tsgen.session import get_spark

# the reference config.json schema, accepted unchanged (tsgen/runner.py)
CONFIG = {
    "function_type": "linear_sum",
    "n_train": 10000,
    "n_val": 1000,
    "seq_len": 512,
    "dim": 1,
    "timesteps": 500,
    "beta_schedule": "cosine",
    "loss_type": "combined",
    "top_k": 4,
    "poly_degree": 3,
    "lambda_decay": 1.0,
}


def main() -> None:
    spark = get_spark("training-demo")

    # 1-2. config → train/val datasets + schedule + decomposition + losses
    res = runner.run_config(spark, CONFIG, scale=0.02)  # 200 train series
    print(f"{CONFIG['loss_type']} loss:", round(res.losses.first().loss, 6))

    # 3. multi-epoch "training": per-epoch exact least-squares denoiser fit
    tstep, noise = _ep_exprs()
    epochs = spark.range(EP_EPOCHS).select(F.col("id").alias("epoch"))
    sched = schedule_table(spark, 50, CONFIG["beta_schedule"])
    noisy = (
        res.train.crossJoin(F.broadcast(epochs))
        .withColumn("t_step", F.expr(tstep))
        .withColumn("noise", F.expr(noise))
        .join(F.broadcast(sched.select("t_step", "sqrt_ac", "sqrt_1m_ac")), "t_step")
        .withColumn(
            "x_t",
            F.col("sqrt_ac") * F.col("value") + F.col("sqrt_1m_ac") * F.col("noise"),
        )
    )
    fits = train.fit_linear_denoiser(noisy, group=["epoch"]).orderBy("epoch")
    fits.show(truncate=False)
    best = fits.orderBy("train_mse").first()
    print(f"best epoch: {best.epoch} (train_mse {best.train_mse:.6f})")

    # 4. best-checkpoint sink (reference: torch.save at test_training.py:162-171)
    ckpt = tempfile.mkdtemp(prefix="tsgen_ckpt_")
    io.save_run(res.decomposition, ckpt, {**CONFIG, "best_epoch": int(best.epoch)})
    back, cfg = io.load_run(spark, ckpt)
    print(f"checkpoint round-trip: {back.count()} rows, best_epoch={cfg['best_epoch']}")

    # 5. sampling (reference: sample + visualize, test_trained_model.py)
    samples = diffusion.sample_fused(spark, 8, CONFIG["seq_len"], timesteps=100)
    stats = samples.agg(
        F.count("*").alias("points"), F.round(F.stddev_samp("x"), 3).alias("std")
    ).first()
    print(f"sampled {stats.points} points (std {stats.std})")


if __name__ == "__main__":
    main()
