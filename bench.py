"""Benchmark harness (driver contract: prints ONE JSON line).

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

1. reference-scale generator pipeline: 10,000 series x 512 points
   (= config.json:3,5 training workload), full signal->noise->znorm path
2. representative operators from every SURVEY 2 family at sf0.1

Each query is forced end-to-end with the noop sink (no driver collect,
no column pruning shortcut). Timings are wall-clock per query.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tsgen.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tsgen-bench")



    from tsgen import decompose, diffusion, generators
    from tsgen.queries import registry
    from tsgen.schedules import schedule_table

    timings: dict[str, float] = {}

    # untimed warmup: spin up executor threads + first codegen compile so the
    # first measured query doesn't absorb JVM startup
    force(generators.generate(spark, 64, 64, "sine"))
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    force(decompose.decompose(generators.generate(spark, 64, 64, "sine")))  # python workers

    # VERDICT r03 item 7 / r04 item 3: single-run timings made round-over-
    # round deltas unreadable (the phantom graph_communities "regression" in
    # r4 was r3 measurement variance). Rep each query REPS times, report min
    # — the steady-state number, robust to GC pauses and codegen compiles.
    REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def bench(name: str, fn) -> None:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # 1. reference-scale generation (10k x 512, linear_sum + znorm — the
    #    training-dataset build of test_training.py:81-95)
    bench("generate_10kx512", lambda: force(generators.generate(spark, 10_000, 512, "linear_sum")))

    # 2. forward diffusion at the same scale (schedule join + elementwise)
    sched = schedule_table(spark, 500, "cosine").cache()
    sched.count()
    bench(
        "qsample_10kx512",
        lambda: force(
            diffusion.q_sample(
                generators.generate(spark, 10_000, 512, "linear_sum"), sched, 500
            )
        ),
    )

    # 2b. reverse-diffusion sampling at the reference's exact cost shape
    #     (T=500 sequential denoise steps, config.json:16) — fused form
    bench(
        "sample_fused_1kx512_T500",
        lambda: force(diffusion.sample_fused(spark, 1_000, 512, timesteps=500)),
    )

    # 3. decomposition (pandas-UDF FFT path) at 2k x 512
    bench(
        "decompose_2kx512",
        lambda: force(decompose.decompose(generators.generate(spark, 2_000, 512, "mixed"))),
    )

    # 4. representative registry queries on the sf tables
    suite = [
        "ev_rolling",
        "ev_sessionize",
        "ev_asof",
        "ev_tumbling",
        "pricing_summary",
        "orders_rollup",
        "top_customers",
        "distinct_counts",
        "text_stats",
        "doc_fingerprint",
        "dedup_exact_docs",
        "ngram_jaccard",
        "minhash_lsh",
        "simhash_pairs",
        "dedup_clusters",
        "corpus_curation",
        "doc_contamination",
        "ev_cusum",
        "repetition_stats",
        "doc_lm_score",
        "doc_entropy",
        "doc_chunks",
        "pack_sequences",
        "cosine_topk",
        "embed_neardup",
        "ann_ivf",
        "ann_lsh",
        "embed_quantize",
        "train_denoiser",
        "ev_scd2",
        "dup_ngram_coverage",
        "semdedup",
        "graph_triangles",
        "zorder_cluster",
        "multimodal_features",
        # round-3 session families: mergeable sketches, scale idioms,
        # state-space kernels, robust windows
        "dd_quantiles_by_type",
        "bloom_prune",
        "global_row_ids",
        "ev_rolling_median",
        "weighted_sample",
        "kalman_em",
        # round-3 session families: graph communities, canonical-doc
        # selection, TS toolkit (SAX / matrix profile / DTW / changepoint)
        "graph_communities",
        "dedup_keep_best",
        "ts_sax",
        "ts_matrix_profile",
        "ts_dtw",
        "ts_changepoint",
        "ts_spectral_entropy",
        # round-3 continuation: portable-hash dedup twins, irregular-sampling
        # spectral estimation, keyphrases, k-means, BFS
        "minhash_lsh_portable",
        "simhash_portable",
        "ts_lombscargle",
        "doc_keyphrases",
        "embed_kmeans",
        "graph_bfs",
        "ts_welch_psd",
        "ts_segmentation",
        "ev_ks_test",
        # round-3 continuation batch 3/4: pruned changepoints, BOCPD,
        # diversity rerank, leakage audit, EWMA family, theta sketch,
        # robust decomposition, conformal bands
        "ts_pelt",
        "ts_bocpd",
        "embed_mmr",
        "split_leakage",
        "ev_ewma_corr",
        "ev_ewma_chart",
        "kmv_set_ops",
        "ts_robust_decompose",
        "forecast_conformal",
        "ev_psi_drift",
        "doc_feature_hash",
        "ev_time_travel",
        # round-3 continuation batch 5: distributed model fitting +
        # diagnostics, prefix-filtered exact similarity join, incremental
        # view maintenance, bipartite link prediction
        "ev_logreg",
        "ev_mutual_info",
        "ev_calibration",
        "doc_prefix_jaccard",
        "ev_mview_merge",
        "graph_adamic_adar",
        # round-3 continuation batch 6: Markov attribution, variance-reduced
        # experiment readout, one-pass bootstrap, seasonal-hybrid ESD, PPMI
        "ev_attribution_markov",
        "ev_cuped",
        "ev_bootstrap_ci",
        "ts_sesd",
        "token_ppmi",
        # round-3 continuation batch 7/8: causal/sequential readouts,
        # retraction merge
        "ts_its",
        "ev_ab_holm",
        "ev_msprt",
        "ev_srm",
        "ev_retract_merge",
        "embed_pca_power",
        # round-3 continuation batch 9-12: partition quality, NB baseline,
        # retrieval eval, sequence baseline, SSA power
        "graph_modularity",
        "doc_nb_classify",
        "embed_map_at_k",
        "ev_next_event_acc",
        "ts_ssa_power",
        "ev_poisson_glm",
        "part_entity_clusters",
        "ts_prophet_lite",
        # round-3 continuation final batches
        "ev_cohort_ltv",
        "ev_msprt_by_type",
        "graph_assortativity",
        "doc_ppl_holdout",
        "ev_power_analysis",
        "ts_prophet_forecast",
        "embed_cluster_purity",
        "ev_hazard_glm",
        "li_supplier_hhi",
        # round-4: matrix-profile motifs/discords, PLSA topics, BPE trainer,
        # BM25 retrieval, HMM decode, Yule-Walker AR(2)
        "ts_motifs",
        "ts_discords",
        "doc_topics",
        "bpe_train",
        "doc_bm25",
        "ts_hmm_viterbi",
        "forecast_ar2",
        # round-5: exact substring dedup (Lee et al. 2022), BM25 nDCG eval,
        # first-fit-decreasing packing
        "dedup_substr",
        "doc_bm25_ndcg",
        "pack_sequences_ffd",
        "embed_trunc_recall",
        "doc_lang_temperature",
        "ts_features",
        "graph_closeness",
        "dedup_substr_hash",
        "forecast_combo",
        "bpe_encode",
        "li_demand_classes",
        "doc_ccnet_buckets",
        "forecast_sba",
        "dedup_substr_cross",
        "ann_ivf_recall",
        "ev_qini",
        "li_abc_xyz",
        "ev_path_ngrams",
        "ev_markov_stationary",
        "ev_retention_fit",
        "li_safety_stock",
        "doc_heaps_law",
        # round-6: Gopher rules, seeded/directed centrality, point-process
        # burst models, tokenizer fertility, Shapley/BH experiment readouts,
        # embedding postprocess, LM retrieval, VAR(1), EOQ
        "doc_gopher_quality",
        "graph_ppr",
        "graph_hits",
        "ev_burst_kleinberg",
        "ev_hawkes_loglik",
        "tok_fertility",
        "ev_shapley_attr",
        "ev_bh_fdr",
        "embed_abtt",
        "doc_ql_dirichlet",
        "forecast_var1",
        "li_eoq",
        # round-6 snapshot additions, omitted from the r6 suite (ADVICE r06)
        "ev_competing_risks",
        "stream_hawkes",
        # round-7: ABTT retrieval eval, keep-first substring cut, PQ-ADC recall
        "embed_abtt_recall",
        "dedup_substr_keepfirst",
        "ann_pq_recall",
        "li_wagner_whitin",
        # round-8: real P6 PPM decode path (render -> parse -> stats)
        "multimodal_decode",
        # round-9: IVFADC composition, scalar-quantization recall, mined
        # hard negatives, the IVF probe frontier
        "ann_ivfpq_recall",
        "ann_int8_recall",
        "embed_hard_negatives",
        "ann_ivf_frontier",
        "ann_rerank_frontier",
        "pack_budget_frontier",
        "doc_filter_frontier",
        # round-10: dedup operating-point frontiers (threshold / banding /
        # SemDeDup epsilon — one pair evaluation, every operating point)
        "dedup_threshold_frontier",
        "minhash_band_frontier",
        "semdedup_eps_frontier",
        "curation_funnel",
        "dedup_incremental_lsh",
        "ivf_cell_profile",
        "ann_dims_frontier",
        "minhash_size_frontier",
        "ann_storage_frontier",
        # round-12: real codec-free media decoders (PNG/WAV/Y4M render ->
        # parse -> stats, narrow MapInPandas)
        "multimodal_decode_png",
        "multimodal_decode_wav",
        "multimodal_decode_y4m",
        # round-13: real baseline-JPEG codec (canonical Huffman + DCT) and
        # cross-codec content-addressed dedup (PNG + JPEG decode agree)
        "multimodal_decode_jpeg",
        "multimodal_decode_jpeg_ac",
        "media_cross_codec_dedup",
        "mix_doremi",
        "tok_unigram_em",
    ]
    reg = registry()
    for name in suite:
        q = reg[name]
        bench(name, lambda q=q: force(q.spark_fn(spark, sf_dir)))

    total = round(sum(timings.values()), 3)
    # round-over-round comparability: the suite GROWS as operators land, so
    # also report the subtotal over the original r01 query set
    r01 = {
        "generate_10kx512", "qsample_10kx512", "sample_fused_1kx512_T500",
        "decompose_2kx512", "ev_rolling", "ev_sessionize", "ev_asof",
        "ev_tumbling", "pricing_summary", "orders_rollup", "top_customers",
        "distinct_counts", "text_stats", "doc_fingerprint", "dedup_exact_docs",
        "ngram_jaccard", "minhash_lsh", "simhash_pairs", "cosine_topk",
        "embed_neardup", "ann_ivf", "multimodal_features",
    }
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    r01_total = round(sum(v for k, v in timings.items() if k in r01), 3)
    # The driver's tail capture truncates long lines from the HEAD, which in
    # r03 cut off the "metric"/"value" keys of the single ~107-query JSON line
    # (BENCH_r03.json parsed: null). Emit the full per-query map on its own
    # line for audit, then a SHORT final summary line (bounded size: top-5
    # slowest only) that truncation can never eat (VERDICT r03 item 1).
    detail = {"detail": "per_query", "queries": timings, "sf": sf}
    print(json.dumps(detail))
    # The driver's tail capture truncates the (long) detail line from the
    # HEAD, which cost round 10 most of its round-over-round per-query
    # comparison (BENCH_r09.json preserved only the last 67 lines). Persist
    # the full map to a repo file so mover analysis never depends on how
    # much of stdout survived; commit it with the round-state update.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh)
    except OSError:
        pass  # read-only checkout: stdout still carries the detail line
    # VERDICT r13 item 1: the top-5-only `queries` dict left the driver's
    # round-over-round comparator with n_common=1 and 46 phantom "drops".
    # Pack as many per-query timings as fit instead — slowest first, so the
    # dict is always a SUPERSET of the old top-5 (strictly additive; same
    # timings, same methodology). The line must stay under the driver's
    # capture window (it keeps only the last ~2000 chars of stdout and
    # parses the final line from that window — a full 179-entry line is
    # ~5 KB and would lose its head and parse as null, exactly the r03
    # failure this file's comments document), hence the 1700-char budget.
    LINE_BUDGET = 1700

    def _final_line(qmap: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "suite_total",
                "value": total,
                "unit": "sec",
                "queries": qmap,
                "r01_subset_total": r01_total,
                "n_queries": len(timings),
                "runs": REPS,
                "sf": sf,
            }
        )

    slowest: dict[str, float] = {}
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        trial = dict(slowest)
        trial[name] = sec
        if len(_final_line(trial)) > LINE_BUDGET and len(slowest) >= 5:
            break
        slowest = trial
    print(_final_line(slowest))


if __name__ == "__main__":
    main()
