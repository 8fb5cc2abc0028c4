"""Window / ordered analytics over real event streams (SURVEY §2 D/E/F
extensions — operators the reference lacks but the north star mandates).

Scale notes:
- Every operator here shuffles exactly once, on its partition key
  (user_id / group key); frames are bounded so state per key is O(frame).
- The as-of join is the union-window formulation: ONE shuffle on
  (key, time) replaces the naive range cross-join — this is the form that
  survives 100 TB (no broadcast of the right side needed, no skew beyond
  the key's own distribution).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_stats(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    window_rows: int,
) -> DataFrame:
    """Rolling mean/min/max over the previous `window_rows` rows per key —
    the DataFrame-native moving-average smoother (SURVEY §2.D extension)."""
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(-(window_rows - 1), 0)
    return (
        df.withColumn("roll_avg", F.avg(value).over(w))
        .withColumn("roll_min", F.min(value).over(w))
        .withColumn("roll_max", F.max(value).over(w))
    )


def lag_delta(df: DataFrame, key: str, order: list[str], value: str) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn("delta", F.col(value) - F.lag(value, 1).over(w))


def sessionize(df: DataFrame, key: str, ts: str, gap_minutes: int) -> DataFrame:
    """Gap-based sessionization: new session when ts - lag(ts) > gap.

    lag + cumulative sum over one (key, ts) shuffle; the batch twin of
    F.session_window (streaming.py)."""
    w = Window.partitionBy(key).orderBy(ts, "event_id")
    gap_s = gap_minutes * 60
    new_sess = (
        F.when(
            F.unix_timestamp(ts) - F.unix_timestamp(F.lag(ts, 1).over(w)) > gap_s, 1
        )
        .otherwise(0)
    )
    first = F.when(F.lag(ts, 1).over(w).isNull(), 1).otherwise(0)
    return df.withColumn(
        "session_id", F.sum(new_sess + first).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right.ts <= left.ts for the same key.

    Spark-native formulation: tag both sides, union, one window over
    (key, ts, side) with last(value, ignorenulls=True). Right side must be
    unique per (key, ts) (pre-dedup with latest_by_key if needed).
    Equal timestamps: the right row IS visible to the left row (side=0
    sorts first) — matches DuckDB ASOF JOIN (>=) semantics.
    """
    lcols = left.columns
    l = left.select(*lcols).withColumn("_side", F.lit(1)).withColumn("_rv", F.lit(None).cast("double"))
    r = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"), F.col(right_value).cast("double").alias("_rv")
    )
    for c in lcols:
        if c not in (key, ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(*[c for c in l.columns]))
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn(out_col, F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_side", "_rv")
    )


def latest_by_key(df: DataFrame, keys: list[str], order: list) -> DataFrame:
    """Exact dedup keeping the latest row per key (ranking window form —
    the 'keep newest' variant of dropDuplicates)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def tumbling(df: DataFrame, ts: str, unit: str, groups: list[str], value: str) -> DataFrame:
    """Tumbling-window aggregate via date_trunc (batch twin of F.window)."""
    return (
        df.groupBy(F.date_trunc(unit, F.col(ts)).alias("bucket"), *groups)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value).alias("sum_value"),
            F.avg(value).alias("avg_value"),
        )
    )


def topk_per_group(df: DataFrame, group: list[str], order: list, k: int) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    step_seconds: int,
) -> DataFrame:
    """Resample each key's irregular series onto a regular `step_seconds`
    grid with linear interpolation between surrounding observations.

    Spark-native: per-key min/max anchor the grid (sequence + explode);
    observed points are unioned in; two ordered windows fill the previous/
    next known (ts, value) pairs; interpolation is a closed-form projection.
    One shuffle on (key, time). Grid edges before the first / after the
    last observation carry the nearest known value.
    """
    span = df.groupBy(key).agg(
        F.min(F.unix_timestamp(ts)).alias("_lo"), F.max(F.unix_timestamp(ts)).alias("_hi")
    )
    grid = span.select(
        key,
        F.explode(
            F.sequence(
                (F.ceil(F.col("_lo") / step_seconds) * step_seconds).cast("bigint"),
                F.col("_hi").cast("bigint"),
                F.lit(step_seconds).cast("bigint"),
            )
        ).alias("grid_s"),
    ).withColumn("_obs_v", F.lit(None).cast("double"))
    obs = df.select(
        F.col(key),
        F.unix_timestamp(ts).alias("grid_s"),
        F.col(value).cast("double").alias("_obs_v"),
    )
    u = grid.unionByName(obs).withColumn("_is_grid", F.col("_obs_v").isNull())
    wp = Window.partitionBy(key).orderBy("grid_s", "_is_grid").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy(key).orderBy(F.desc("grid_s"), F.desc("_is_grid")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev_v = F.last("_obs_v", ignorenulls=True).over(wp)
    prev_t = F.last(F.when(F.col("_obs_v").isNotNull(), F.col("grid_s")), ignorenulls=True).over(wp)
    next_v = F.last("_obs_v", ignorenulls=True).over(wn)
    next_t = F.last(F.when(F.col("_obs_v").isNotNull(), F.col("grid_s")), ignorenulls=True).over(wn)
    interp = F.when(next_t == prev_t, prev_v).otherwise(
        prev_v + (next_v - prev_v) * (F.col("grid_s") - prev_t) / (next_t - prev_t)
    )
    filled = (
        u.withColumn("_pv", prev_v)
        .withColumn("_pt", prev_t)
        .withColumn("_nv", next_v)
        .withColumn("_nt", next_t)
        .filter(F.col("_is_grid"))
        .withColumn(
            "value_interp",
            F.when(F.col("_pv").isNull(), F.col("_nv"))
            .when(F.col("_nv").isNull(), F.col("_pv"))
            .otherwise(
                F.when(F.col("_nt") == F.col("_pt"), F.col("_pv")).otherwise(
                    F.col("_pv")
                    + (F.col("_nv") - F.col("_pv"))
                    * (F.col("grid_s") - F.col("_pt"))
                    / (F.col("_nt") - F.col("_pt"))
                )
            ),
        )
    )
    return filled.select(key, "grid_s", "value_interp")


def zscore_outliers(df: DataFrame, group: str, value: str, threshold: float = 3.0) -> DataFrame:
    """Per-group z-score outlier flags (|x − μ|/σ > threshold)."""
    stats = df.groupBy(group).agg(
        F.avg(value).alias("_mu"), F.stddev_samp(value).alias("_sd")
    )
    return (
        df.join(F.broadcast(stats), group)
        .withColumn("zscore", (F.col(value) - F.col("_mu")) / F.col("_sd"))
        .filter(F.abs(F.col("zscore")) > threshold)
        .drop("_mu", "_sd")
    )


def bucketed_range_join(
    left: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket_unit: str = "hour",
) -> DataFrame:
    """Range join (l.ts BETWEEN i.start AND i.end) as an EQUI-join.

    Each interval is exploded into the `bucket_unit` buckets it overlaps;
    both sides then join on the bucket key (hash shuffle, no nested-loop),
    with the exact range predicate applied as a residual filter. This is
    the formulation that survives when neither side is broadcastable —
    cost O(|left| + Σ interval_spans) instead of O(|left|·|intervals|).
    Intervals must be end-exclusive.
    """
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket_unit, F.col(start)),
                F.date_trunc(bucket_unit, F.col(end) - F.expr("INTERVAL 1 MICROSECOND")),
                F.expr(f"INTERVAL 1 {bucket_unit}"),
            )
        ),
    )
    l = left.withColumn("_bucket", F.date_trunc(bucket_unit, F.col(ts)))
    return l.join(iv, "_bucket").where(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    ).drop("_bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe inner equi-join: the (large, skewed) left side gets a salt
    from its partition id; the (smaller) right side is replicated once per
    salt. A hot key's rows then spread over n_salts reducers. AQE's skew
    join covers most cases adaptively; this is the explicit form for when
    statistics are missing or the skew is extreme."""
    salted_l = left.withColumn("_salt", F.spark_partition_id() % n_salts)
    salts = left.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    salted_r = right.crossJoin(F.broadcast(salts))
    return salted_l.join(salted_r, [key, "_salt"]).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys (the 100 TB skew escape hatch).

    Phase 1 groups by (key, salt) — a hot key's rows spread across n_salts
    reducers; phase 2 merges the tiny per-salt partials. `aggs` maps
    column -> 'sum' | 'count' | 'min' | 'max' (algebraic aggs that compose).
    AQE's skew handling covers joins; this covers aggregations whose single
    hot key would otherwise bottleneck one reducer.
    """
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    phase1_aggs, phase2_aggs = [], []
    for col, kind in aggs.items():
        if kind == "count":
            phase1_aggs.append(F.count("*").alias(f"_{col}"))
            phase2_aggs.append(F.sum(f"_{col}").alias(col))
        elif kind == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_{col}"))
            phase2_aggs.append(F.sum(f"_{col}").alias(col))
        elif kind == "min":
            phase1_aggs.append(F.min(col).alias(f"_{col}"))
            phase2_aggs.append(F.min(f"_{col}").alias(col))
        elif kind == "max":
            phase1_aggs.append(F.max(col).alias(f"_{col}"))
            phase2_aggs.append(F.max(f"_{col}").alias(col))
        else:
            raise ValueError(f"non-composable agg: {kind}")
    p1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    return p1.groupBy(*keys).agg(*phase2_aggs)


def rolling_median(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    window_rows: int,
) -> DataFrame:
    """Exact rolling median (and p90) over the previous `window_rows` rows —
    the robust twin of rolling_stats (a mean is one outlier away from
    useless; SRE latency dashboards live on windowed p50/p90).

    Spark has no percentile over a window FRAME, so the frame is collected
    as an array (bounded: window_rows values), sorted, and indexed at the
    type-1 (lower) rank — exact, engine-portable integer indexing, same
    shuffle as any per-key window (one hash partition by key). Cost is
    O(w log w) per row at w = window_rows — fine for dashboard-scale
    windows (w ≤ a few hundred); for huge windows use dd_quantiles_by over
    tumbling buckets instead."""
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(-(window_rows - 1), 0)
    arr = F.array_sort(F.collect_list(F.col(value)).over(w))
    # explicit floor: Spark's float->int cast truncates, DuckDB's ROUNDS —
    # a bare CAST((n+1)/2 AS INT) silently picks different ranks per engine
    med = F.element_at(arr, F.floor((F.size(arr) + 1) / 2).cast("int"))
    p90 = F.element_at(arr, F.ceil(F.size(arr) * 0.9).cast("int"))
    return df.withColumn("roll_median", med).withColumn("roll_p90", p90)
