"""Dataset persistence (SURVEY §2 A5 — the reference's checkpoint save/load,
test_training.py:162-171 / test_trained_model.py:50-65, re-expressed as
parquet round-trips of the series/component tables).

Scale notes: writes are partitioned by a bucketing key when provided so
downstream per-series operators (decompose, FFT) read co-located data and
joins on series_id can skip the shuffle (bucket pruning)."""
from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events `ts` column to session-zoned TIMESTAMP across
    Spark versions. events.parquet stores TIMESTAMP(NANOS):
    - with spark.sql.legacy.parquet.nanosAsLong honored (<= Spark 4.0) the
      column arrives as BIGINT nanos -> integer-divide to micros (a double
      division would lose precision at 1e18);
    - Spark 4.1 reads parquet nanos natively as TIMESTAMP_NTZ (truncated to
      micros, legacy conf ignored) -> cast re-zones it (session tz is UTC);
    - already TIMESTAMP -> unchanged.
    Schema-driven, not value-driven, so the choice is deterministic."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def fanout_scan(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table and, when the file layout cannot yield enough
    input splits (the test corpus is one row group per table, i.e. ONE
    split), round-robin repartition to default parallelism — opt guide
    §2.5's "one huge unsplittable file → repartition immediately after the
    read". Otherwise the whole narrow phase of a query (explodes,
    shingling, per-row HOF math) runs on a single core. On a real
    multi-file / large dataset the gate never fires, so nothing is tuned
    to local mode. Results are unaffected: round-robin repartition is
    deterministic (sortBeforeRepartition) and no consumer of this helper
    derives values from physical layout.

    The gate is decided from cheap file stats (few files AND small total
    bytes), NOT from df.rdd.getNumPartitions(): converting to an RDD
    compiles the physical plan on the driver, which measurably taxed every
    query build (~0.2-0.5 s × 3 bench reps). The stat walks nested part
    dirs too (ADVICE r13: a partitioned local dataset must not silently
    skip the gate), and the per-path verdict is memoized so repeat builds
    of the same query skip the filesystem walk."""
    df = spark.read.parquet(path)
    cpus = spark.sparkContext.defaultParallelism
    decision = _FANOUT_DECISIONS.get((path, cpus))
    if decision is None:
        try:
            import glob
            import os

            files = (
                [path]
                if os.path.isfile(path)
                else glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            )
            total = sum(os.path.getsize(f) for f in files)
            decision = bool(files) and len(files) <= cpus and total <= 256 * 1024 * 1024
        except OSError:
            decision = False  # non-local storage: real deployments have real splits
        _FANOUT_DECISIONS[(path, cpus)] = decision
    if decision:
        df = df.repartition(cpus)
    return df


_FANOUT_DECISIONS: dict[tuple[str, int], bool] = {}


def save_series(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def load_series(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "series_id",
    n_buckets: int = 32,
    sort_col: str | None = "t",
) -> None:
    """Persist bucketed (and optionally sorted) by key — the layout that
    makes every subsequent join/groupBy on `bucket_col` shuffle-free
    (SortMergeJoin without Exchange). At 100 TB this is how the series
    tables should live: bucket count ≈ cluster cores, sorted within bucket
    by t so per-series windows need no re-sort."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dropped in-memory-catalog table leaves its files behind; a stale
    # location blocks re-creation with LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = Path(warehouse.removeprefix("file:")) / table
    if loc.exists():
        shutil.rmtree(loc)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(bucket_col, sort_col)
    w.saveAsTable(table)


def save_run(
    df: DataFrame,
    path: str,
    config: dict,
) -> None:
    """Checkpoint = data + the config that produced it (the reference stores
    {model_state, config}; our deterministic analog stores the generated
    table + generation parameters as table properties via a sidecar)."""
    import json

    save_series(df, f"{path}/data")
    spark = df.sparkSession
    spark.createDataFrame([(json.dumps(config),)], "config string").coalesce(1).write.mode(
        "overwrite"
    ).json(f"{path}/config")


def load_run(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    import json

    df = load_series(spark, f"{path}/data")
    cfg_row = spark.read.json(f"{path}/config").collect()[0]
    return df, json.loads(cfg_row.config)


# --- generic source/sink formats (engine extension) ------------------------
_FMT_OPTS = {
    "csv": {"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
    "json": {"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
    "parquet": {},
}


def save_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Write in any Spark batch format (parquet/csv/json/orc). Text formats
    are for interchange only — at scale parquet/orc keep column pruning,
    predicate pushdown, and compression that csv/json lose."""
    df.write.mode("overwrite").options(**{**_FMT_OPTS.get(fmt, {}), **options}).format(
        fmt
    ).save(path)


def load_table(spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options):
    """Read any Spark batch format. Pass an explicit schema for csv/json —
    schema inference costs an extra full scan and can mistype columns."""
    r = spark.read.options(**{**_FMT_OPTS.get(fmt, {}), **options})
    if schema is not None:
        r = r.schema(schema)
    elif fmt == "csv":
        r = r.option("inferSchema", "true")
    return r.format(fmt).load(path)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
) -> None:
    """MERGE-style upsert into a parquet dataset: union the update batch
    with the base, keep the newest row per key (largest `order_col`), and
    atomically swap the result in (write to a sibling temp dir, then
    rename). This is the portable emulation of MERGE INTO for plain
    parquet; on a real deployment the same latest_by_key plan runs behind
    a table format's transaction log instead of a directory swap.

    Scale shape: ONE window shuffle on the merge keys over base ∪ updates;
    nothing is collected. The rewrite cost is the whole dataset — the known
    plain-parquet limitation (a table format turns that into file-level
    replacement, same plan otherwise)."""
    import uuid

    from pyspark.sql import Window, functions as F

    base = spark.read.parquet(path)
    merged = base.unionByName(updates)
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    latest.write.mode("overwrite").parquet(tmp)
    dst = Path(path)
    shutil.rmtree(dst)
    Path(tmp).rename(dst)


def compact_parquet(
    spark: SparkSession, path: str, target_files: int | None = None
) -> int:
    """Small-file compaction: rewrite a parquet dataset into `target_files`
    files (default: sized by `spark.sql.files.maxPartitionBytes`-ish row
    estimate — here simply the current parallelism). The streaming
    foreachBatch sink and incremental upserts both accrete small files;
    scan cost at 100 TB is dominated by file-open overhead unless a
    compaction job runs. Atomic swap like upsert_parquet. Returns the new
    file count."""
    import uuid

    df = spark.read.parquet(path)
    n = target_files or max(1, df.rdd.getNumPartitions() // 4)
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    # coalesce (no shuffle) is correct for merging small files; repartition
    # would add an Exchange for nothing
    df.coalesce(n).write.mode("overwrite").parquet(tmp)
    dst = Path(path)
    shutil.rmtree(dst)
    Path(tmp).rename(dst)
    return len([p for p in Path(path).glob("*.parquet")])


def merge_agg_state(
    state: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental aggregation-state maintenance: combine a persisted
    (key, cnt, total) state table with a new batch's partial state WITHOUT
    rescanning history — the sum/count algebra every incremental
    materialized view relies on (avg = total/cnt stays derivable).
    One union + one partial-agged groupBy on the keys."""
    from pyspark.sql import functions as F

    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
    )


def agg_state(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Build the mergeable (cnt, total) state for a batch."""
    from pyspark.sql import functions as F

    return df.groupBy(*keys).agg(
        F.count(value).alias("cnt"), F.sum(value).alias("total")
    )

