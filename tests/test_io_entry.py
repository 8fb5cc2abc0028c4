"""Persistence round-trip (SURVEY §2 A5) and flagship entry smoke."""
import tempfile

from tsgen import generators, io


def test_save_load_roundtrip(spark):
    df = generators.generate(spark, 8, 32, "mixed")
    with tempfile.TemporaryDirectory() as d:
        io.save_run(df, f"{d}/run", {"family": "mixed", "n": 8, "seq_len": 32})
        back, cfg = io.load_run(spark, f"{d}/run")
        assert cfg == {"family": "mixed", "n": 8, "seq_len": 32}
        a = df.toPandas().sort_values(["series_id", "t"]).reset_index(drop=True)
        b = back.toPandas().sort_values(["series_id", "t"]).reset_index(drop=True)
        assert (a.value - b.value).abs().max() < 1e-15


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"source", "series_key", "trend_frac", "seas_frac", "resid_frac"} <= cols
    # variance fractions sum to ~1 only if components were uncorrelated;
    # at minimum each is finite and non-negative
    for r in rows:
        assert r.trend_frac >= 0 and r.seas_frac >= 0 and r.resid_frac >= 0
