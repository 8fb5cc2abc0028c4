"""Registry-wide physical-plan linter — mechanize the per-round scale audit.

Walks every registry query, builds its DataFrame at a small SF (plan
construction only; queries whose builders run driver-side iteration still
execute those inner jobs), and greps the executed-plan string for the
scale anti-patterns the round judges check by hand:

  ERROR  BatchEvalPython        row-at-a-time Python UDF in the plan — the
                                repo's rule is Arrow-only Python
                                (ArrowEvalPython / MapInPandas /
                                FlatMapGroupsInPandas are fine)
  WARN   CartesianProduct       unbounded all-pairs join
  INFO   BroadcastNestedLoopJoin  all-pairs against a BROADCAST side —
                                legitimate when the broadcast side is a
                                bounded query/truth set (recall evals,
                                ≤64-query baselines); every site should be
                                a known, documented one
  WARN   recompute>=4           the SAME base source (one parquet path, or
                                one Range signature) appears 4+ times in a
                                single executed plan — a diamond DAG is
                                re-evaluating its base per branch (the
                                pre-r10 robust_decompose re-scanned its
                                generator ~8x via groupBy+join-backs).
                                2-3 repeats are normal (self-joins,
                                two-pass aggregates); 4+ means the plan
                                re-reads the corpus per derived branch at
                                cluster scale and should be linearized
                                (window aggregates) or checkpointed.

Usage:
    python tools/plan_lint.py [sf_dir] [name-substring ...]

Exit code 1 iff any ERROR (BatchEvalPython) is found; WARN/INFO are
reported for human review (bounded-broadcast truth baselines are the
expected BroadcastNestedLoopJoin population — compare the census against
the list in NEXT.md when it grows).
"""
from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")


# Every BroadcastNestedLoopJoin site adjudicated through round 11 — each is
# an all-pairs join against a BOUNDED broadcast side (≤64-query truth sets,
# ≤16-row frontier dims, scalar totals), reviewed plan-by-plan in the round
# NEXT.md/VERDICT records. The standing alarm is "a new NON-adjudicated
# site", not the raw count: the tool prints the delta so a new site can't
# hide inside a stable-looking total. When a new site IS adjudicated
# (bounded dim, documented in NEXT.md), add it here in the same commit.
BNLJ_ADJUDICATED = frozenset("""
dedup_threshold_frontier minhash_band_frontier semdedup_eps_frontier
ivf_cell_profile ann_dims_frontier ann_storage_frontier doc_bm25
doc_ql_dirichlet doc_bm25_ndcg kmv_set_ops li_salted_join ev_benford ev_did
ev_cuped ts_its ev_msprt ev_next_event_acc ev_power_analysis ev_qte ev_qini
ev_shapley_attr loss_fourier loss_combined doc_heaps_law tfidf_top_terms
doc_lm_score doc_filter_frontier doc_bigram_lm token_ppmi dsir_scores
ann_lsh embed_trunc_recall cosine_topk embed_mmr ann_ivf_recall ann_ivf
embed_map_at_k embed_abtt_recall ann_pq_recall ann_ivfpq_recall
ann_rerank_frontier ann_int8_recall ann_ivf_frontier embed_hard_negatives
doc_lang_rebalance doc_lang_temperature embed_cluster_purity embed_kmeans
doc_source_kl ab_experiment graph_triangles ev_competing_risks user_survival
graph_modularity forecast_reconcile posenc forecast_seasonal_naive
forecast_theta ev_calibration doc_nb_classify
doc_ppl_holdout split_assign ev_gbm_stumps doc_woe ann_rrf
ev_transition_entropy ts_crosscorr ev_wau ev_bootstrap_ci ts_dtw
rfm_segments basket_rules li_abc_xyz li_eoq li_wagner_whitin ev_ewma_corr
ev_time_travel orders_abc ev_funnel_latency stream_dd_quantiles ev_ks_test
ev_chi_square stream_msprt idle_customers important_parts epoch_metrics
train_epochs ev_retention_fit key_skew_profile hll_cardinality hll_set_ops
dd_quantiles dd_quantiles_by_type ev_value_deciles cms_join_size
embed_pq graph_hits
""".split())
# r13 optimization-round additions, both ONE-ROW broadcast sides:
# - embed_pq: the PQ nearest-code assign folds the bounded codebook
#   (n_sub·n_cent rows) into a single-row array and broadcast-crossJoins it
#   onto the subvector table (replaces the old exchange+sort+row_number
#   assign — OPTIMIZATION_r13.md, ANN family).
# - graph_hits: the two final L2-norm scalars (1 row each) are
#   broadcast-crossJoined onto the score tables; they existed before but
#   were hidden behind the per-half-step localCheckpoint plan truncation
# r14 pruning: ev_logreg / ev_poisson_glm / ev_hazard_glm left the census —
# the fused IRLS pass pins each 1-row state table eagerly, so the
# beta-broadcast crossJoin no longer prints as a BNLJ in the lazy plan tail.
#   that the deferred-normalization rewrite removed.


def max_base_scan_count(plan: str) -> tuple[int, str]:
    """Max number of times one base source appears in the plan: parquet
    scans keyed by file path, Range scans keyed by their full signature.
    InMemoryTableScan/localCheckpoint reads are intentionally NOT counted —
    a checkpointed base is read, not recomputed."""
    counts: dict[str, int] = {}
    for m in re.finditer(r"file:[^\],]*\.parquet", plan):
        counts[m.group(0)] = counts.get(m.group(0), 0) + 1
    for m in re.finditer(r"Range \([^)]*\)", plan):
        counts[m.group(0)] = counts.get(m.group(0), 0) + 1
    if not counts:
        return 0, ""
    src_, n = max(counts.items(), key=lambda kv: kv[1])
    return n, src_.rsplit("/", 1)[-1]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    filters = args[1:]

    from tsgen.queries import registry
    from tsgen.session import get_spark

    spark = get_spark("plan-lint")
    reg = registry()
    names = [
        n for n in reg
        if not filters or any(f in n for f in filters)
    ]

    errors: list[str] = []
    warns: list[str] = []
    infos: list[str] = []
    recompute: list[str] = []
    broken: list[str] = []
    t0 = time.time()
    for i, name in enumerate(names, 1):
        try:
            df = reg[name].spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, keep linting
            broken.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        if "BatchEvalPython" in plan:
            errors.append(name)
        if "CartesianProduct" in plan:
            warns.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            infos.append(name)
        n_scan, src_key = max_base_scan_count(plan)
        if n_scan >= 4:
            recompute.append(f"{name}({src_key}x{n_scan})")
        if i % 50 == 0:
            print(f"... {i}/{len(names)} ({time.time() - t0:.0f}s)", file=sys.stderr)

    print(f"linted {len(names)} queries in {time.time() - t0:.0f}s")
    print(f"ERROR BatchEvalPython ({len(errors)}): {' '.join(errors) or '-'}")
    print(f"WARN  CartesianProduct ({len(warns)}): {' '.join(warns) or '-'}")
    print(f"INFO  BroadcastNestedLoopJoin ({len(infos)}): {' '.join(infos) or '-'}")
    new_bnlj = [n for n in infos if n not in BNLJ_ADJUDICATED]
    gone_bnlj = sorted(BNLJ_ADJUDICATED - set(infos)) if not filters else []
    print(f"WARN  BNLJ NEW vs adjudicated ({len(new_bnlj)}): "
          f"{' '.join(new_bnlj) or '-'}")
    if gone_bnlj:
        print(f"INFO  BNLJ adjudicated-but-absent ({len(gone_bnlj)}): "
              f"{' '.join(gone_bnlj)}  (plan improved or query renamed — "
              "prune the allowlist)")
    print(f"WARN  recompute>=4 ({len(recompute)}): {' '.join(recompute) or '-'}")
    if broken:
        print(f"BUILD-FAILED ({len(broken)}):")
        for b in broken:
            print(f"  {b}")
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
