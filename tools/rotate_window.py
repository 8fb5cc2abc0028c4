"""Emit the next driver-certification window (`_WINDOW_PRIORITY`) from the
recorded CORRECTNESS_r*.json results.

The driver certifies the FIRST 50 registry entries each round; the registry
orders them by `_WINDOW_PRIORITY` (tsgen/queries.py). This tool derives the
rotation mechanically so no family is orphaned and no certified query wastes
a slot:

    backlog = oracle-bearing registry queries with no green driver row yet,
    ordered by the documented family plan below (r8 then r9 families),
    then by registration order for anything new;
    window  = 3 canaries + first 47 of the backlog.

Usage:
    python tools/rotate_window.py            # print the tuple to paste
    python tools/rotate_window.py --names    # print bare names (for
                                             # `tools/check_oracle.py ... $(...)`)

After pasting into tsgen/queries.py, ALWAYS replay the window:
    python tools/check_oracle.py /root/testdata/sf0.01 --first=50
"""
from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

CANARIES = ["gen_sine", "series_stats", "sample_data_mixed"]

# Behavior-affecting code changes invalidate a query's existing driver
# certification: name -> first round whose certification is trustworthy
# again (i.e. the round AFTER the change landed). A green CORRECTNESS row
# from an EARLIER round no longer counts — the query re-enters the backlog
# until a window re-certifies the modified formulation (ADVICE r08: the r8
# round-before-rank commits 21f4168/fe4dceb rewrote both engine sides of
# these four, but their stale r4–r6 greens kept them out of the rotation).
INVALIDATED: dict[str, int] = {
    # Round numbers below are DRIVER rounds (the round whose CORRECTNESS
    # file first certifies the rewired formulation), not internal session
    # numbers — VERDICT r09 caught the earlier mismatch that discarded four
    # valid r9 certifications and made 26 names uncertifiable.
    #
    # Auditability (ADVICE r10): the mapping is trustworthy only if every
    # rewire landed strictly BEFORE the corresponding driver round's gate
    # ran. The gate runs once per round, on the session-final tree = the
    # PARENT of the driver's "round N: verdict/advice/correctness/bench"
    # commit (the commit that adds CORRECTNESS_r{N}.json). REWIRE_LANDED
    # below records the NEWEST rewire commit in each round group; audit()
    # asserts it is an ancestor of that gate tree, which covers every
    # older rewire in the group too. Run `python tools/rotate_window.py
    # --audit` to re-verify.
    "ann_ivf": 9,
    "ann_ivf_recall": 9,
    "embed_kmeans": 9,
    "embed_pq": 9,
    # rewired pre-r9; the r9 window certified the final formulations of
    # these four, so their r9 rows are trustworthy
    "embed_abtt_recall": 9,
    "li_wagner_whitin": 9,
    "doc_keyphrases": 9,
    "ev_gap_stats": 9,
    # rewired pre-r9 but NOT in the r9 window — first trustworthy cert is
    # a green r10 row.
    # range join rewritten as hour-aligned broadcast equi-join:
    "ev_interval_join": 10,
    # rank family rewritten scale-true (two-phase top-200 + rank
    # arithmetic on per-stratum totals instead of full-stratum windows):
    "ev_rank_funcs": 10,
    # tercile rank moved onto the stratified_rank scaffold:
    "doc_ccnet_buckets": 10,
    # Lloyd centroids pinned to the driver between rounds + contingency
    # localCheckpoint (same values, plan rewired — recompute census fix):
    "embed_cluster_purity": 10,
    # recompute-census campaign — bounded intermediates pinned
    # (localCheckpoint) or join-backs replaced with window aggregates;
    # values unchanged, engine plans rewired:
    "doc_lang_temperature": 10,
    "doc_lang_rebalance": 10,
    "ts_features": 10,
    "ev_shapley_attr": 10,
    "token_ppmi": 10,
    "ts_coint": 10,
    "doc_nb_classify": 10,
    "ev_logreg": 10,
    "ev_poisson_glm": 10,
    "ev_hazard_glm": 10,
    "forecast_reconcile": 10,
    "kmv_set_ops": 10,
    "doc_bm25": 10,
    "doc_bm25_ndcg": 10,
    "doc_ql_dirichlet": 10,
    "trend_poly3": 10,
    "trend_quadratic": 10,
    "ts_pacf": 10,
    "ts_ljung_box": 10,
    "ts_mann_kendall": 10,
    "stream_psi": 10,
    "doc_source_kl": 10,
}

# round -> newest rewire commit in that group (every other rewire in the
# group is an ancestor of it — `git log` confirms). Round 9's newest is
# 2dc46c4 (rake-keyphrases/source-KL pin, census-campaign tail; the four
# ann_ivf-family rewires are the much older r8 commits 21f4168/fe4dceb).
# Round 10's newest is 6eb3e81 (last recompute-census pin); the two later
# refactors that touched certified paths (_ivf_chain_sql factor-out,
# prefix_jaccard(sized=)) were verified byte/plan no-ops (NEXT r10), so
# they invalidate nothing.
# Full 40-char hashes: abbreviated 7-char forms could become ambiguous as
# history grows, making `git merge-base --is-ancestor` fail for a reason
# other than non-ancestry and audit() assert misleadingly (ADVICE r11).
REWIRE_LANDED: dict[int, str] = {
    9: "2dc46c4d8c1d361fd5e4f36fe5e8d1942e97ebfe",
    10: "6eb3e81c0cb09229f33e04e088a0da7269c14d52",
}


def audit() -> None:
    """Assert every INVALIDATED round's rewires predate that round's gate:
    REWIRE_LANDED[N] must be an ancestor of the parent of the commit that
    added CORRECTNESS_r{N}.json (the tree the driver's gate evaluated)."""
    import subprocess

    def run(*args: str) -> str:
        return subprocess.run(
            ["git", *args], capture_output=True, text=True, check=True
        ).stdout.strip()

    for rnd in sorted(set(INVALIDATED.values())):
        rewire = REWIRE_LANDED[rnd]
        artifact = f"CORRECTNESS_r{rnd:02d}.json"
        add_commit = run(
            "log", "--diff-filter=A", "--format=%H", "--", artifact
        ).splitlines()
        assert add_commit, f"no commit adds {artifact}"
        gate_tree = f"{add_commit[-1]}^"
        ok = subprocess.run(
            ["git", "merge-base", "--is-ancestor", rewire, gate_tree]
        ).returncode == 0
        assert ok, (
            f"round {rnd}: rewire {rewire} is NOT an ancestor of the gate "
            f"tree {gate_tree} — a pre-change green may have been accepted"
        )
        print(f"round {rnd}: rewire {rewire} predates gate tree {gate_tree} OK")

# Planned family order (mirrors the _WINDOW_PRIORITY comment block).
PLAN = [
    # round-7 snapshot additions (registered after the r7 window froze)
    "embed_abtt_recall", "dedup_substr_keepfirst", "ann_pq_recall",
    "li_wagner_whitin",
    # r8: text family
    "bpe_merge_step", "doc_split", "doc_entropy", "doc_keyphrases",
    "doc_lm_score", "doc_bigram_lm", "doc_feature_hash", "doc_readability",
    "repetition_stats", "token_count_bpe", "doc_zipf", "doc_ppl_holdout",
    "doc_contamination", "doc_woe", "doc_pareto",
    # r8: tsdb family
    "ev_interpolate", "ev_lttb", "ts_period", "ev_technical", "ev_gap_stats",
    "ev_seasonal_profile", "ts_welch_psd", "ev_peak_detect",
    "ev_m4_downsample", "ev_drawdown", "ev_ewma_chart", "ev_ewma_corr",
    "ts_isotonic", "ts_segmentation", "ts_haar_energy", "ev_rate_anomaly",
    "ev_counter_rate", "ts_lombscargle",
    # r8: analytics long tail
    "ev_transition_entropy", "ev_transitions", "ev_user_paths", "ev_cusum",
    "ev_streaks", "ts_delta_stats", "ev_wau", "ev_outliers_mad", "ev_apdex",
    "ev_ks_test", "ev_chi_square", "ev_benford", "ts_spectral_entropy",
    "ev_winsorize",
    # round-8 snapshot additions (registered after the r8 window froze)
    "multimodal_decode",
    # r8 round-before-rank rewrite invalidated these certs (ADVICE r08) —
    # re-certify the modified formulations first
    "ann_ivf", "ann_ivf_recall", "embed_kmeans", "embed_pq",
    # r9: pipeline/scale
    "split_assign", "ev_gbm_stumps", "name_match_jw", "name_match_snm",
    "ann_rrf", "global_row_ids", "stratified_sample", "weighted_sample",
    # r9: warehouse
    "ev_mview_merge", "ev_merge_upsert", "ev_time_travel", "li_zone_map",
    "ev_retract_merge", "ev_cdc_apply", "ev_scd2", "ev_ffill",
    "table_profile", "key_skew_profile", "zorder_cluster", "orders_checksum",
    "snapshot_diff",
    # r9: product/experiment
    "ab_experiment", "user_survival", "revenue_gini", "ev_funnel_latency",
    "ev_cohort_ltv", "ev_msprt_by_type", "ev_power_analysis",
    # r9: decompose/forecast extras
    "ts_prophet_forecast", "trend_theilsen", "ts_anomalies",
    "ts_robust_decompose", "classical_decompose",
    # r9: events/tsdb leftovers
    "ev_percentiles", "ev_funnel", "ev_retention", "ev_funnel_stages",
    "ev_running_balance", "ev_ohlc", "ev_twap", "ev_time_features",
    "ev_interval_union",
    # r9: similarity/sketch
    "embed_centroids", "embed_drift", "dd_quantiles_by_type",
    "ev_value_deciles", "cms_join_size",
    # r9: misc
    "dq_checks", "ev_k_anonymity", "basket_rules", "li_supplier_hhi",
    "train_denoiser_fourier",
]


def _is_green(v) -> bool:
    # A row is certified only if EVERY recorded check passed: rows_match
    # alone is not enough (CORRECTNESS_r01.json's ev_props_json had
    # rows_match=True, hash_match=False — a value divergence that must
    # stay in the rotation backlog until a window re-certifies it).
    return (
        isinstance(v, dict)
        and v.get("err") is None
        and v.get("rows_match") is True
        and v.get("schema_match") is not False
        and v.get("hash_match") is not False
    )


def certified_by_round() -> dict[str, int]:
    """name -> round of the LATEST recorded row, if that row is green.

    A query whose most recent CORRECTNESS row is red is treated as
    never-certified (it re-enters the backlog for re-certification),
    even if some earlier round recorded a green row — otherwise a
    regression would never be re-windowed (ADVICE r07).
    """
    latest: dict[str, tuple[int, bool]] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int("".join(ch for ch in f if ch.isdigit()) or 0)
        for k, v in json.load(open(f)).items():
            prev = latest.get(k, (0, False))
            if rnd >= prev[0]:
                latest[k] = (rnd, _is_green(v))
    return {
        k: rnd
        for k, (rnd, ok) in latest.items()
        if ok and rnd >= INVALIDATED.get(k, 0)
    }


def certified() -> set[str]:
    return set(certified_by_round())


def backlog() -> list[str]:
    from tsgen.queries import registry

    reg = registry()
    done = certified()
    todo = [n for n in reg if reg[n].oracle and n not in done and n not in CANARIES]
    rank = {n: i for i, n in enumerate(PLAN)}
    # stable sort: unplanned names keep registry (registration) order
    todo.sort(key=lambda n: rank.get(n, len(PLAN)))
    return todo


def build_window() -> list[str]:
    """3 canaries + first 47 of the backlog; when the backlog is shorter
    than 47, pad with the least-recently-certified oracle queries (oldest
    driver row first) so the window stays at 50 names — the
    tests/test_io_entry.py invariant — and stale certifications get
    refreshed."""
    todo = backlog()
    window = CANARIES + todo[:47]
    if len(window) < 50:
        from tsgen.queries import registry

        reg = registry()
        by_round = certified_by_round()
        stale = [
            n for n in reg
            if reg[n].oracle and n not in window
        ]
        stale.sort(key=lambda n: by_round.get(n, 0))
        window += stale[: 50 - len(window)]
    return window


def main() -> None:
    if "--audit" in sys.argv:
        audit()
        return
    todo = backlog()
    window = build_window()
    if "--names" in sys.argv:
        print(" ".join(window))
        return
    print(f"# never-certified backlog: {len(todo)} (window takes 47)")
    print("_WINDOW_PRIORITY: tuple[str, ...] = (")
    print("    # canaries")
    print("    " + ", ".join(repr(n) for n in CANARIES) + ",")
    body = window[3:]
    for i in range(0, len(body), 4):
        print("    " + ", ".join(repr(n) for n in body[i : i + 4]) + ",")
    print(")")
    leftover = todo[47:]
    print(f"# next-round leftover ({len(leftover)}): {' '.join(leftover)}")


if __name__ == "__main__":
    main()
