"""Cluster-side modeling tour — fit, screen, calibrate, and guard-rail
models WITHOUT leaving Spark, composed from this round's operators:

    events  -> IRLS logistic regression (purchase ~ standardized value)
            -> Poisson GLM (events/user-day ~ weekend): rate ratio
            -> mutual-information feature screen + calibration bins
            -> experiment guardrails: SRM check, CUPED readout,
               Holm-corrected multi-metric tests, mSPRT monitor,
               Poisson-bootstrap CI
    docs    -> naive-Bayes lang classifier (held-out confusion matrix)
    vectors -> top-3 PCA (power+deflation), retrieval mAP@k

Run: python examples/ml_demo.py [sf_dir]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsgen.queries import registry
from tsgen.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ml-demo")
    reg = registry()
    tour = [
        ("IRLS logistic regression (per-iteration path)", "ev_logreg"),
        ("Poisson GLM: weekend rate ratio", "ev_poisson_glm"),
        ("mutual-information feature screen", "ev_mutual_info"),
        ("calibration bins + Brier", "ev_calibration"),
        ("sample-ratio-mismatch guardrail", "ev_srm"),
        ("CUPED variance-reduced readout", "ev_cuped"),
        ("Holm-corrected multi-metric tests", "ev_ab_holm"),
        ("mSPRT always-valid monitor (last 5 days)", "ev_msprt"),
        ("Poisson-bootstrap CI for the mean", "ev_bootstrap_ci"),
        ("naive-Bayes lang confusion matrix", "doc_nb_classify"),
        ("top-3 PCA via power iteration", "embed_pca_power"),
        ("retrieval quality mAP@k", "embed_map_at_k"),
    ]
    for title, name in tour:
        print(f"\n=== {title} ({name}) ===")
        df = reg[name].spark_fn(spark, sf_dir)
        df.show(10, truncate=False)


if __name__ == "__main__":
    main()
