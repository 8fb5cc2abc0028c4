"""User-callable decay (SURVEY §2.J scalar-UDF surface) + edge cases."""
import numpy as np

from tsgen import decompose, generators


def test_custom_decay_callable_matches_closed_form(spark):
    # user callable identical to the default 1/(1+0.5 t) must reproduce
    # generate(family='custom_decay') exactly
    want = (
        generators.generate(spark, 4, 32, "custom_decay", noise=False, normalize=False)
        .toPandas()
        .sort_values(["series_id", "t"])
    )
    got = (
        generators.generate_custom_decay(
            spark, 4, 32, decay_fn=lambda t: 1.0 / (1.0 + 0.5 * t), noise=False, normalize=False
        )
        .toPandas()
        .sort_values(["series_id", "t"])
    )
    assert np.allclose(got.value.to_numpy(), want.value.to_numpy(), atol=1e-12)


def test_custom_decay_arbitrary_callable(spark):
    # gaussian decay — not expressible by any built-in family
    pdf = generators.generate_custom_decay(
        spark, 2, 16, decay_fn=lambda t: np.exp(-(t**2) / 10.0), noise=False, normalize=False
    ).toPandas()
    assert len(pdf) == 32 and np.isfinite(pdf.value).all()


def test_decompose_short_series(spark):
    # series shorter than the polynomial degree + FFT bins must not crash
    df = generators.generate(spark, 3, 4, "sine", noise=False, normalize=False)
    out = decompose.decompose(df, degree=3, top_k=4).toPandas()
    assert len(out) == 12
    err = (out.value - out.trend - out.seasonality - out.residual).abs().max()
    assert err < 1e-10


def test_generate_single_point_series(spark):
    # seq_len=1: znorm divides by (0 std + eps); value finite
    df = generators.generate(spark, 3, 2, "sine")
    pdf = df.toPandas()
    assert np.isfinite(pdf.value).all()
