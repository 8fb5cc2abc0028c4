"""Tests for queries_causal (Granger, Benford) and the mlprep additions
(incremental dedup, RRF fusion)."""
import datetime

import numpy as np

from pyspark.sql import functions as F

from tsgen.queries_causal import benford, granger_pairs
from tsgen.queries_mlprep import ann_rrf, dedup_incremental


def _events_from_series(spark, series):
    """series: {type: [v0, v1, ...]} hourly values -> events rows (one event
    per hour per type, so hourly avg == the value)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for typ, vals in series.items():
        for h, v in enumerate(vals):
            eid += 1
            rows.append((eid, t0 + datetime.timedelta(hours=h), 1, typ, float(v), "{}"))
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_granger_matches_numpy_ols(spark):
    rng = np.random.default_rng(2)
    n = 120
    x = rng.normal(size=n).cumsum()
    # y strongly driven by lagged x -> x->y F-stat should dwarf y->x
    y = np.empty(n)
    y[0] = 0.0
    for t in range(1, n):
        y[t] = 0.3 * y[t - 1] + 0.9 * x[t - 1] + 0.05 * rng.normal()
    ev = _events_from_series(spark, {"x": x, "y": y})
    out = {(r.y_type, r.x_type): r for r in granger_pairs(ev).collect()}

    def ols_f(yv, xv):
        yt, yl, xl = yv[1:], yv[:-1], xv[:-1]
        X_u = np.column_stack([np.ones_like(yl), yl, xl])
        X_r = np.column_stack([np.ones_like(yl), yl])
        for X, name in [(X_u, "u"), (X_r, "r")]:
            beta = np.linalg.lstsq(X, yt, rcond=None)[0]
            rss = float(np.sum((yt - X @ beta) ** 2))
            if name == "u":
                rss_u, beta_u = rss, beta
            else:
                rss_r = rss
        return beta_u, (rss_r - rss_u) / (rss_u / (len(yt) - 3))

    beta_u, f_xy = ols_f(y, x)
    got = out[("y", "x")]
    assert got.n == n - 1
    assert abs(got.beta_ylag - beta_u[1]) < 1e-6
    assert abs(got.beta_xlag - beta_u[2]) < 1e-6
    assert abs(got.f_stat - f_xy) < max(1e-6, 1e-9 * abs(f_xy))
    assert out[("y", "x")].f_stat > 100 * max(out[("x", "y")].f_stat, 1.0)


def test_benford_digits_and_expectation(spark):
    # values engineered so first digits of floor(1000*v) are known
    vals = [0.001, 0.0019, 0.002, 0.0091, 0.1, 0.92, -0.3]  # digits 1,1,2,9,1,9,3
    t0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, t0, 1, "t", v, "{}") for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.digit: r for r in benford(ev).collect()}
    assert {d: out[d].n_obs for d in out} == {1: 3, 2: 1, 3: 1, 9: 2}
    n = 7
    exp1 = n * np.log10(2.0)
    assert abs(out[1].n_exp - exp1) < 1e-9
    assert abs(out[1].chi2_term - (3 - exp1) ** 2 / exp1) < 1e-9


def test_dedup_incremental_statuses(spark):
    docs = spark.createDataFrame(
        [
            (0, "shared", "en", "s", 6),   # corpus
            (2, "corponly", "en", "s", 8), # corpus
            (1, "shared", "en", "s", 6),   # batch: dup_corpus
            (3, "newtext", "en", "s", 7),  # batch: kept
            (5, "newtext", "en", "s", 7),  # batch: dup_within (3 is min)
            (7, "fresh", "de", "s", 5),    # batch: kept
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = dedup_incremental(
        docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)
    )
    got = {(r.lang, r.status): r.n_docs for r in out.collect()}
    assert got == {
        ("en", "dup_corpus"): 1,
        ("en", "kept"): 1,
        ("en", "dup_within"): 1,
        ("de", "kept"): 1,
    }


def test_ann_rrf_prefers_doubly_top_neighbor(spark):
    # neighbor 10 ranks first on both metrics -> top fused rank; ranks from
    # the two orderings must both appear in the output
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (10, [10.0, 0.0], 0),   # same direction as query, biggest norm
            (11, [0.5, 0.01], 0),
            (12, [0.0, 2.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = sorted(
        ann_rrf(emb, n_queries=1, k=3).collect(), key=lambda r: r.rank
    )
    assert out[0].neighbor_id == 10 and out[0].r_cos == 1 and out[0].r_dot == 1
    assert abs(out[0].rrf - 2.0 / 61.0) < 1e-12
    assert [r.rank for r in out] == [1, 2, 3]
