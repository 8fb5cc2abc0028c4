"""Driver-contract query registry.

Each entry: name -> (spark_fn, oracle_sql_or_None). `__spark_entry__.py`
exposes these as `queries()` / `oracle_sql()`. Column names are aliased
identically on both sides; float outputs are rounded to 6 dp on both sides
(see tsgen/expr.py docstring for why).
"""
from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import expr as E, generators, oracle
from .normalize import znorm


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle_sql: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn):
        _REGISTRY[name] = Query(name, fn, oracle_sql, tags)
        return fn

    return deco


# The driver's correctness gate hashes only the FIRST 50 entries of queries()
# in dict order. Rotate this list each round so every oracle-bearing query
# eventually gets a driver-green row on record (VERDICT r02 item 1). Names
# listed here are moved to the front of the registry in this order; everything
# else follows in registration order. Keep the 9 generator queries first as
# cheap cross-round canaries.
#
# Round-6 window: 3 canaries + 47 never-driver-checked oracle queries.
# Cumulative certified through r05: 181 unique (CORRECTNESS_r01..r05.json);
# every non-canary name below is from the 181 oracle-bearing never-certified
# set. Front-loaded: the four ADVICE-r05-fixed queries (ev_qini,
# ev_retention_fit, doc_heaps_law, forecast_combo — certify the fixes
# same-round), the round-5 ops registered after the r5 window froze, then
# the forecast family, ts diagnostics, and sketches.
# Driver-certification window: the driver checks the FIRST 50 registry
# entries each round; this tuple pins that order. Rotation plan to exhaust
# the never-certified backlog (148 after r6):
#   r7 (this window): 14 round-6 registrations + 20 TPC-H warehouse batch
#      + 9 streams + 4 skew/diagnostics.
#   r8: the text family (bpe_merge_step, doc_split, doc_entropy,
#      doc_keyphrases, doc_lm_score, doc_bigram_lm, doc_feature_hash,
#      doc_readability, repetition_stats, token_count_bpe, doc_zipf,
#      doc_ppl_holdout, doc_contamination, doc_woe, doc_pareto), the tsdb
#      family (ev_interpolate, ev_lttb, ts_period, ev_technical,
#      ev_gap_stats, ev_seasonal_profile, ts_welch_psd, ev_peak_detect,
#      ev_m4_downsample, ev_drawdown, ev_ewma_chart, ev_ewma_corr,
#      ts_isotonic, ts_segmentation, ts_haar_energy, ev_rate_anomaly,
#      ev_counter_rate, ts_lombscargle), and the analytics long tail
#      (ev_transition_entropy, ev_transitions, ev_user_paths, ev_cusum,
#      ev_streaks, ts_delta_stats, ev_wau, ev_outliers_mad, ev_apdex,
#      ev_ks_test, ev_chi_square, ev_benford, ts_spectral_entropy,
#      ev_winsorize).
#   r9: pipeline/scale (split_assign, ev_gbm_stumps, name_match_jw,
#      name_match_snm, ann_rrf, global_row_ids, stratified_sample,
#      weighted_sample), warehouse (ev_mview_merge, ev_merge_upsert,
#      ev_time_travel, li_zone_map, ev_retract_merge, ev_cdc_apply,
#      ev_scd2, ev_ffill, table_profile, key_skew_profile, zorder_cluster,
#      orders_checksum, snapshot_diff), product/experiment (ab_experiment,
#      user_survival, revenue_gini, ev_funnel_latency, ev_cohort_ltv,
#      ev_msprt_by_type, ev_power_analysis), decompose/forecast extras
#      (ts_prophet_forecast, trend_theilsen, ts_anomalies,
#      ts_robust_decompose, classical_decompose), events/tsdb leftovers
#      (ev_percentiles, ev_funnel, ev_retention, ev_funnel_stages,
#      ev_running_balance, ev_ohlc, ev_twap, ev_time_features,
#      ev_interval_union), similarity/sketch (embed_centroids, embed_drift,
#      dd_quantiles_by_type, ev_value_deciles, cms_join_size), plus
#      dq_checks, ev_k_anonymity, basket_rules, li_supplier_hhi,
#      train_denoiser_fourier — any spillover rolls into r10.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # Driver-round-13 window (exact rotate_window.py output). The r12 gate
    # kept cumulative certification complete (backlog 0), so the backlog
    # holds exactly TWO never-certified names — this round's baseline-JPEG
    # decode queries (pixel corpus + AC/coefficient corpus) — and the
    # remaining 44 slots are the stale-refresh pad, least-recently-
    # certified first (the r3-era streaming/analytics rows the r12 pad
    # displaced).
    # canaries (green r01–r12)
    "gen_sine", "series_stats", "sample_data_mixed",
    # never-certified: this round's JPEG / DoReMi / cross-codec /
    # streaming-JPEG / unigram-tokenizer queries
    "multimodal_decode_jpeg", "multimodal_decode_jpeg_ac", "mix_doremi",
    "media_cross_codec_dedup", "stream_jpeg_stats", "tok_unigram_em",
    # stale-refresh pad: oldest-certified rows
    "stream_join", "stream_ohlc", "stream_hll", "stream_scd2",
    "stream_dd_quantiles", "stream_cms_topk", "epoch_metrics", "gen_cosine",
    "gen_mixed", "gen_exponential_decay", "gen_linear_sum", "gen_custom_decay",
    "gen_labeled", "ev_cuped", "ts_its", "ev_ab_holm",
    "ev_msprt", "ev_srm", "ev_next_event_acc", "doc_lsh_recall",
    "doc_prefix_jaccard", "minhash_lsh_portable", "simhash_portable",
    "embed_map_at_k", "embed_pca_power", "ev_attribution_markov",
    "graph_modularity", "ts_prophet_lite", "sample_forecast",
    "sample_conditional_label", "forecast_garch", "ev_mutual_info",
    "ev_calibration", "part_entity_clusters", "ev_bootstrap_ci", "ts_sax",
    "ts_matrix_profile", "ts_changepoint", "ts_dtw", "rfm_segments",
    "orders_abc",
)


def registry() -> dict[str, Query]:
    _ensure_populated()
    ordered: dict[str, Query] = {}
    for name in _WINDOW_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def canon_types(df: DataFrame) -> DataFrame:
    """Normalize output types to the widths the DuckDB oracle produces:
    int8/16/32 → bigint, float32 → double. Spark's row_number()/size()/
    length() return int32 where DuckDB returns int64 — without this the
    driver's schema compare would flag every ranking/length column."""
    casts = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in ("tinyint", "smallint", "int"):
            casts.append(F.col(f.name).cast("bigint").alias(f.name))
        elif t == "float":
            casts.append(F.col(f.name).cast("double").alias(f.name))
        else:
            casts.append(F.col(f.name))
    return df.select(*casts)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        return lambda spark, sf_dir: canon_types(fn(spark, sf_dir))

    return {name: wrap(q.spark_fn) for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}


def roundn(df: DataFrame, dp: int, *cols: str) -> DataFrame:
    """Round named double columns to `dp` decimals and normalize -0.0 (match
    oracle). Use dp=4 (or fewer) for averages of large sums — fp association
    order differs between Spark and DuckDB, so 6dp can flip the last digit."""
    for c in cols:
        # +1e-9 tie-nudge: see tsgen.expr.round6
        df = df.withColumn(c, F.round(F.col(c) + F.lit(1e-9), dp) + F.lit(0.0))
    return df


def round6(df: DataFrame, *cols: str) -> DataFrame:
    """Round named double columns to 6dp and normalize -0.0 (match oracle)."""
    return roundn(df, 6, *cols)


# ---------------------------------------------------------------------------
# 2.A/2.B generators — one oracle-checked query per family (SURVEY §2 A1-A3,
# B1-B9)
# ---------------------------------------------------------------------------
GEN_N, GEN_LEN = 24, 96


def _register_generators() -> None:
    for fam in E.FAMILIES:
        def fn(spark: SparkSession, sf_dir: str, _fam=fam) -> DataFrame:
            df = generators.generate(spark, GEN_N, GEN_LEN, _fam)
            return round6(df, "value")

        _REGISTRY[f"gen_{fam}"] = Query(
            f"gen_{fam}", fn, oracle.generate_sql(GEN_N, GEN_LEN, fam), ("generator",)
        )

    def labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
        return round6(generators.generate_labeled(spark, GEN_N, GEN_LEN), "value")

    _REGISTRY["gen_labeled"] = Query(
        "gen_labeled", labeled, oracle.generate_labeled_sql(GEN_N, GEN_LEN), ("generator",)
    )

    def stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = generators.generate(spark, GEN_N, GEN_LEN, "mixed", normalize=False)
        out = df.groupBy("series_id").agg(
            F.avg("value").alias("mean_val"),
            F.stddev_samp("value").alias("std_val"),
            F.min("value").alias("min_val"),
            F.max("value").alias("max_val"),
        )
        return round6(out, "mean_val", "std_val", "min_val", "max_val")

    _REGISTRY["series_stats"] = Query(
        "series_stats", stats, oracle.series_stats_sql(GEN_N, GEN_LEN, "mixed"), ("agg",)
    )

    def sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = generators.sample_data(spark, 8, 64, "mixed")
        return round6(df, "signal", "noise", "value")

    _REGISTRY["sample_data_mixed"] = Query(
        "sample_data_mixed", sample, oracle.sample_data_sql(8, 64, "mixed"), ("generator",)
    )


_POPULATED = False


def _ensure_populated() -> None:
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    _register_generators()
    # later stages register themselves here
    from . import (  # noqa: F401
        queries_analytics,
        queries_causal,
        queries_decompose,
        queries_diffusion,
        queries_exactdup,
        queries_experiments,
        queries_forecast2,
        queries_misc,
        queries_ml2,
        queries_mlprep,
        queries_paths,
        queries_pipeline,
        queries_scale,
        queries_seasonal,
        queries_quality,
        queries_retail,
        queries_statemodels,
        queries_streaming,
        queries_tokenizer,
        queries_topics,
        queries_tpch,
        queries_training,
        queries_tsdb,
        queries_tsmining,
        queries_warehouse,
        queries_warehouse2,
    )


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship entry query — the engine's full pipeline over BOTH real and
    synthetic data:

    1. events.parquet → hourly per-event-type series (tumbling bucket agg)
    2. synthetic linear_sum series at the reference's default family
       (config.json:2) via the deterministic generator
    3. z-normalize → trend/seasonality/residual decomposition (poly fit +
       top-k FFT) → per-series variance split

    Returns one row per series: how much of its variance is trend vs
    seasonality vs residual.
    """
    from . import decompose
    from .queries_analytics import _events

    ev = _events(spark, sf_dir)
    hourly = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type")
        .agg(F.avg("value").alias("value"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    # Rank series ids on the distinct-key table (|event_types| rows), not the
    # full hourly table — an unpartitioned window over the data itself is a
    # single-reducer wall at scale.
    keys = hourly.select("event_type").distinct().withColumn(
        "series_id", F.dense_rank().over(Window.orderBy("event_type")).cast("bigint") - 1
    )
    ev_series = (
        hourly.withColumn("t", F.row_number().over(w).cast("bigint") - 1)
        .join(F.broadcast(keys), "event_type")
        .select("series_id", F.col("event_type").alias("series_key"), "t", "value")
    )
    syn = generators.generate(spark, 16, 128, "linear_sum", normalize=False).withColumn(
        "series_key", F.concat(F.lit("synthetic_"), F.col("series_id"))
    )

    def summarize(df: DataFrame, source: str) -> DataFrame:
        keys = df.select("series_id", "series_key").distinct()
        dec = decompose.decompose(znorm(df.select("series_id", "t", "value")))
        out = dec.groupBy("series_id").agg(
            F.count("*").alias("n_points"),
            F.var_samp("value").alias("total_var"),
            (F.var_samp("trend") / F.var_samp("value")).alias("trend_frac"),
            (F.var_samp("seasonality") / F.var_samp("value")).alias("seas_frac"),
            (F.var_samp("residual") / F.var_samp("value")).alias("resid_frac"),
        )
        return out.join(keys, "series_id").select(
            F.lit(source).alias("source"),
            "series_key",
            "n_points",
            "total_var",
            "trend_frac",
            "seas_frac",
            "resid_frac",
        )

    out = summarize(ev_series, "events").unionByName(summarize(syn, "synthetic"))
    return round6(
        out.orderBy("source", "series_key"),
        "total_var",
        "trend_frac",
        "seas_frac",
        "resid_frac",
    )
