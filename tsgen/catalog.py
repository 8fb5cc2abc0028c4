"""SQL surface: register the testdata tables and engine-generated series as
temp views so the whole engine is usable from `spark.sql(...)` — the
declarative front door Catalyst optimizes end-to-end."""
from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Views over the driver's parquet tables (+ nanos-safe events)."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    from .queries_analytics import _events

    _events(spark, sf_dir).createOrReplaceTempView("events")


def register_generated(
    spark: SparkSession,
    name: str,
    n_series: int,
    seq_len: int,
    family: str = "sine",
    **kw,
) -> None:
    """A generated series table as a view: spark.sql(f"SELECT ... FROM {name}")."""
    from .generators import generate

    generate(spark, n_series, seq_len, family, **kw).createOrReplaceTempView(name)
