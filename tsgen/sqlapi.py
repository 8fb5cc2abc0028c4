"""Raw-SQL surface: register the warehouse tables as temp views so users
can drive the whole engine with `spark.sql(...)` instead of the DataFrame
API. Catalyst compiles both to the same plans — the point of building on
Spark SQL is that the ANSI-SQL front door comes for free (predicate
pushdown, column pruning, AQE all apply identically).

`sql()` is the one-call entry: register + query.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Expose every parquet table as a temp view named like the file.
    `events` gets the same nanos→micros normalization the DataFrame path
    applies (queries_analytics._events), so SQL and DataFrame users see
    identical timestamps."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    from .queries_analytics import _events

    _events(spark, sf_dir).createOrReplaceTempView("events")


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(query)
