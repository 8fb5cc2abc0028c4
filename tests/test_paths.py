"""Sequence/path analytics + decontamination properties (queries_paths)."""
import datetime as dt

from pyspark.sql import Row, functions as F

from tsgen import queries_paths as qp


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                user_id=u,
                ts=dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m),
                event_type=t,
                value=float(v),
            )
            for i, (u, m, t, v) in enumerate(rows)
        ]
    )


def test_transition_probs_sum_to_one(spark):
    ev = _ev(
        spark,
        [(1, 0, "a", 1), (1, 1, "b", 2), (1, 2, "a", 3), (2, 0, "a", 1), (2, 1, "c", 2)],
    )
    out = qp.event_transitions(ev)
    sums = out.groupBy("prev_type").agg(F.sum("p").alias("s")).collect()
    assert all(abs(r.s - 1.0) < 1e-12 for r in sums)
    got = {(r.prev_type, r.next_type): r.n for r in out.collect()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("a", "c"): 1}


def test_user_paths_short_users_truncate(spark):
    ev = _ev(spark, [(1, 0, "a", 1), (1, 1, "b", 1), (1, 2, "c", 1), (1, 3, "d", 1), (2, 0, "x", 1)])
    got = {r.path: r.n_users for r in qp.user_paths(ev, k=3).collect()}
    # user 1 truncated to first 3; user 2 keeps its 1-event path
    assert got == {"a>b>c": 1, "x": 1}


def test_autocorr_perfect_alternation(spark):
    # strictly alternating +1/-1 has ACF(1) = -1, ACF(2) = +1
    ev = _ev(spark, [(1, m, "a", 1 if m % 2 == 0 else -1) for m in range(40)])
    row = qp.autocorr(ev, lags=(1, 2)).collect()[0]
    assert abs(row.acf1 + 1.0) < 1e-9
    assert abs(row.acf2 - 1.0) < 1e-9


def test_cusum_peaks_at_level_shift(spark):
    # 20 points at 0 then 20 at 10: |CUSUM| peaks exactly at the shift point
    ev = _ev(spark, [(1, m, "a", 0 if m < 20 else 10) for m in range(40)])
    row = qp.cusum(ev).collect()[0]
    shift_ts = int(dt.datetime(2024, 1, 1, 0, 19).timestamp())
    assert row.cp_ts == shift_ts  # last pre-shift point holds the max deviation
    assert abs(row.max_abs_s - 100.0) < 1e-6  # 20 * |0 - 5|


def test_contamination_planted_overlap(spark):
    # doc 97*2 is benchmark; doc 5 copies its text -> ratio 1; doc 7 disjoint -> 0
    docs = spark.createDataFrame(
        [
            Row(doc_id=194, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=5, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=7, text="entirely different words with zero shingle overlap here"),
        ]
    )
    got = {r.doc_id: (r.n_hit, round(r.ratio, 6)) for r in qp.contamination(docs).collect()}
    assert set(got) == {5, 7}
    assert got[5][0] == got[5][0] and got[5][1] == 1.0
    assert got[7] == (0, 0.0)


def test_doc_entropy_bounds(spark):
    from tsgen import text

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d"),      # uniform: H = ln(4), norm 1
            Row(doc_id=2, text="x x x x"),      # single type: H = 0
        ]
    )
    import math

    got = {r.doc_id: r for r in text.doc_entropy(docs).collect()}
    assert abs(got[1].entropy - math.log(4)) < 1e-12
    assert abs(got[1].norm_entropy - 1.0) < 1e-12
    assert got[2].entropy == 0.0 and got[2].norm_entropy == 0.0


def test_crosscorr_detects_shifted_copy(spark):
    # series b is a's values one hour later -> xcorr peaks (=1) at lag +1
    rows = []
    vals = [1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0]
    for h, v in enumerate(vals):
        rows.append((h, "a", v))
        rows.append((h + 1, "b", v))
    ev = spark.createDataFrame(
        [
            Row(
                event_id=i,
                user_id=1,
                ts=dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(hours=h),
                event_type=t,
                value=v,
            )
            for i, (h, t, v) in enumerate(rows)
        ]
    )
    got = {(r.type_a, r.type_b, r.lag): r.xcorr for r in qp.crosscorr(ev).collect()}
    assert abs(got[("a", "b", 1)] - 1.0) < 1e-9
    assert got[("a", "b", 0)] < 0.99


def test_mix_sample_rates_and_determinism(spark):
    from tsgen import mixing

    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 == 0 else "zh", n_chars=100) for i in range(2000)]
    )
    s1 = mixing.mix_sample(docs, {"en": 0.3, "zh": 1.0}).filter("keep")
    s2 = mixing.mix_sample(docs, {"en": 0.3, "zh": 1.0}).filter("keep")
    # deterministic: identical sample both runs
    assert s1.select("doc_id").subtract(s2.select("doc_id")).count() == 0
    got = {r.lang: r.c for r in s1.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert got["zh"] == 1000            # rate 1.0 keeps everything
    assert 200 < got["en"] < 400        # rate 0.3 of 1000, u01 tolerance


def test_streaks_gaps_and_islands(spark):
    # user 1 active days 1,2,3, 7,8, 20 -> streaks 3,2,1; longest 3
    ev = _ev(spark, [(1, d * 24 * 60, "a", 1) for d in [1, 2, 3, 7, 8, 20]])
    row = qp.streaks(ev).collect()[0]
    assert (row.n_active_days, row.longest_streak, row.n_streaks) == (6, 3, 3)


def test_delta_stats_regular_grid(spark):
    # perfectly regular 1-minute grid: sd_dt = 0, all delta-of-deltas zero
    ev = _ev(spark, [(1, m, "a", float(m)) for m in range(30)])
    row = qp.delta_stats(ev).collect()[0]
    assert row.avg_dt == 60.0 and row.sd_dt == 0.0
    assert row.dod_zero_frac == 1.0
    assert row.avg_abs_dv == 1.0  # value increments by exactly 1


def test_outliers_mad_robust_to_extreme_point(spark):
    # 40 values near 0 plus one huge spike: MAD threshold stays tight and
    # flags exactly the spike (a mean/stddev z-score would be dragged)
    vals = [float(i % 5) for i in range(40)] + [1000.0]
    ev = _ev(spark, [(1, m, "a", v) for m, v in enumerate(vals)])
    row = qp.outliers_mad(ev).collect()[0]
    assert row.n == 41
    assert row.n_outliers == 1
    assert row.med == 2.0


def test_pca_variance_matches_numpy(spark):
    import numpy as np
    from tsgen import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = similarity.pca_variance(emb, k=4).toPandas()
    X = np.stack(emb.toPandas().embedding.to_numpy()).astype(np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(C)[::-1]
    for c in range(4):
        assert abs(got.eigenvalue[c] - evals[c]) < 1e-5
    assert abs(got.var_share.sum() - got.cum_share[3]) < 1e-9
    assert 0 < got.cum_share[3] <= 1.0


def test_gram_sufficient_stats_matches_numpy(spark):
    # the shared covariance kernel (r9: feeds pca_variance, top_eigen,
    # pca_power, ABTT) must reproduce exact n / column sums / X'X
    import numpy as np
    from tsgen import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n, s, G = similarity._gram_sufficient_stats(emb)
    X = np.stack(emb.toPandas().embedding.to_numpy()).astype(np.float64)
    assert n == len(X)
    assert np.allclose(s, X.sum(axis=0), rtol=0, atol=1e-9)
    assert np.allclose(G, X.T @ X, rtol=1e-12, atol=1e-8)
    assert np.allclose(G, G.T, rtol=0, atol=0)  # exactly symmetric by construction
    # and the ddof=1 wrapper matches numpy's sample covariance
    n2, mu, C = similarity._cov_ddof1(emb)
    assert n2 == n
    assert np.allclose(mu, X.mean(axis=0), rtol=0, atol=1e-12)
    assert np.allclose(C, np.cov(X, rowvar=False, bias=False), rtol=1e-10, atol=1e-10)


def test_wau_window_semantics(spark):
    # one user active on days 0 and 10; another on day 0 only.
    # day 0: dau=2, wau=2. day 10: dau=1, wau=1 (day-0 activity expired).
    ev = _ev(
        spark,
        [(1, 0, "a", 1), (2, 0, "a", 1), (1, 10 * 24 * 60, "a", 1)],
    )
    got = {r.day_s // 86400 - 19723: r for r in qp.wau(ev).collect()}
    d0 = min(got)
    assert got[d0].dau == 2 and got[d0].wau == 2
    d10 = max(got)
    assert got[d10].dau == 1 and got[d10].wau == 1
    assert abs(got[d0].stickiness - 1.0) < 1e-12


def test_lm_score_flags_unusual_tokens(spark):
    import math
    from tsgen import text

    # corpus dominated by 'the'; doc 3 is all rare tokens -> higher score
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the the the the"),
            Row(doc_id=2, text="the the the the"),
            Row(doc_id=3, text="zyx qwv jkl mno"),
        ]
    )
    got = {r.doc_id: r.lm_score for r in text.lm_score(docs).collect()}
    # p(the) = 8/12; p(rare) = 1/12 each
    assert abs(got[1] - (-math.log(8 / 12))) < 1e-12
    assert abs(got[3] - (-math.log(1 / 12))) < 1e-12
    assert got[3] > got[1]


def test_dq_checks_detect_violations(spark, tmp_path):
    # plant one FK violation and one null: checks must count them
    import shutil

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf"
    d.mkdir()
    for t in ["orders", "customer", "lineitem", "events", "region", "nation",
              "supplier", "part", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    # rewrite orders with one bogus custkey
    orders = spark.read.parquet(f"{src}/orders.parquet").toPandas()
    orders.loc[0, "o_custkey"] = 10**9
    import pandas as pd  # noqa: F401
    (d / "orders.parquet").unlink()
    spark.createDataFrame(orders).coalesce(1).write.parquet(str(d / "orders_tmp"))
    import glob, os
    part = glob.glob(str(d / "orders_tmp" / "*.parquet"))[0]
    os.rename(part, d / "orders.parquet")

    from tsgen.queries_quality import dq_checks

    got = {r.check_name: r for r in dq_checks(spark, str(d)).collect()}
    assert got["orders_custkey_fk"].n_violations == 1
    assert not got["orders_custkey_fk"].passed
    assert got["orders_pk_unique"].passed
