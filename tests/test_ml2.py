"""Tests for queries_ml2: IRLS against a numpy reference, MI scalar
reference, calibration invariants."""
import math

import numpy as np

from pyspark.sql import functions as F

from tsgen.queries_ml2 import calibration, logreg_irls, mutual_info


def _xy_df(spark, xs, ys):
    return spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    )


def test_logreg_matches_numpy_irls(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=400)
    true_b0, true_b1 = -0.5, 1.2
    p = 1.0 / (1.0 + np.exp(-(true_b0 + true_b1 * x)))
    y = (rng.uniform(size=400) < p).astype(float)

    got = {
        r.iter: r for r in logreg_irls(_xy_df(spark, x, y), iters=4).collect()
    }

    # numpy replica with the same rounding schedule
    def r4(v):
        return math.floor(abs(v) * 1e4 + 0.5) / 1e4 * (1 if v >= 0 else -1)

    b0 = b1 = 0.0
    for it in range(1, 5):
        pz = 1.0 / (1.0 + np.exp(-(b0 + b1 * x)))
        w = pz * (1 - pz)
        s00, s01, s11 = w.sum(), (w * x).sum(), (w * x * x).sum()
        g0, g1 = (y - pz).sum(), ((y - pz) * x).sum()
        s00, s01, s11, g0, g1 = (r4(v + 1e-9) for v in (s00, s01, s11, g0, g1))
        det = s00 * s11 - s01 * s01
        b0 = round(b0 + (s11 * g0 - s01 * g1) / det + 1e-15, 12)
        b1 = round(b1 + (s00 * g1 - s01 * g0) / det + 1e-15, 12)
        assert abs(got[it].beta0 - b0) < 1e-5, (it, got[it].beta0, b0)
        assert abs(got[it].beta1 - b1) < 1e-5, (it, got[it].beta1, b1)
    # converged near the truth (coarse: n=400)
    assert abs(b1 - true_b1) < 0.5
    # log-likelihood is monotone nondecreasing across Newton iterations here
    lls = [got[i].avg_loglik for i in range(1, 5)]
    assert all(lls[i + 1] >= lls[i] - 1e-9 for i in range(3))


def test_mutual_info_scalar_reference(spark):
    # independent feature -> MI 0; deterministic feature -> MI = H(Y)
    rows = []
    for i in range(200):
        et = "purchase" if i % 2 == 0 else "view"
        # value in [0,50) iff purchase -> f_vbin fully determines y
        rows.append((i, "2024-01-01 00:00:00", i, et, 10.0 if et == "purchase" else 60.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.feature: r.mi_nats for r in mutual_info(df).collect()}
    h_y = math.log(2)  # balanced binary label
    assert abs(out["f_vbin"] - h_y) < 1e-6
    # all events at the same hour: feature is constant -> MI 0
    assert abs(out["f_hod"]) < 1e-9


def test_calibration_bins_and_brier(spark):
    xs = np.linspace(-4, 4, 500)
    ys = (xs > 0).astype(float)
    out = calibration(_xy_df(spark, xs, ys)).collect()
    assert sum(r.n for r in out) == 500
    assert all(0 <= r.bin <= 9 for r in out)
    for r in out:
        # mean_pred sits inside its bin's score range
        assert r.bin / 10 - 1e-6 <= r.mean_pred <= (r.bin + 1) / 10 + 1e-6
        assert 0.0 <= r.brier <= 1.0
    # monotone score => frac_pos nondecreasing with bin
    fr = [r.frac_pos for r in sorted(out, key=lambda r: r.bin)]
    assert all(fr[i + 1] >= fr[i] - 1e-9 for i in range(len(fr) - 1))


def test_nb_classify_separable_vocab(spark):
    import random

    from tsgen.queries_ml2 import nb_classify

    # two classes with disjoint vocabularies -> held-out accuracy ~100%
    rng = random.Random(2)
    rows = []
    for i in range(200):
        lang = "en" if i % 2 == 0 else "de"
        vocab = ["cat", "dog", "bird"] if lang == "en" else ["katze", "hund", "vogel"]
        text = " ".join(rng.choice(vocab) for _ in range(20))
        rows.append((i, text, lang, "s", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    cm = {(r.actual, r.predicted): r.n_docs for r in nb_classify(df).collect()}
    correct = sum(n for (a, p), n in cm.items() if a == p)
    total = sum(cm.values())
    assert total > 20  # held-out set is non-trivial
    assert correct == total  # disjoint vocab: perfect separation


def test_modularity_two_cliques(spark):
    from tsgen.queries_experiments import label_propagation, modularity

    # two disjoint triangles: LPA labels them separately; exact Q known:
    # m=6, each community m_c=3, d_c=6 -> Q = 2*(3/6 - (6/12)^2) = 0.5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "doc_a long, doc_b long",
    )
    r = modularity(edges, label_propagation(edges)).collect()[0]
    assert r.n_edges == 6
    assert r.n_communities == 2
    assert abs(r.modularity - 0.5) < 1e-9


def test_session_new_ops_plan_shapes(spark):
    """Plan assertions for the batch 5-12 scale claims."""
    sf = "/root/testdata/sf0.001"
    from tsgen.queries import registry

    reg = registry()

    def plan(name):
        return (
            reg[name]
            .spark_fn(spark, sf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    # prefix join: candidate generation is an equi-join on the shingle —
    # never a cartesian product
    p = plan("doc_prefix_jaccard")
    assert "CartesianProduct" not in p
    # Adamic-Adar / PPMI: top-k is an ordered limit, not a global sort
    assert "TakeOrderedAndProject" in plan("graph_adamic_adar")
    assert "TakeOrderedAndProject" in plan("token_ppmi")
    # bootstrap: the replica axis is broadcast (range crossJoin), the
    # data side is never shuffled before the per-replica partial agg
    assert "Broadcast" in plan("ev_bootstrap_ci")
    # CUPED: theta is broadcast back onto the per-user table
    assert "Broadcast" in plan("ev_cuped")
    # retraction: the affected-group list joins broadcast
    assert "BroadcastHashJoin" in plan("ev_retract_merge")


def test_poisson_glm_recovers_planted_rate_ratio(spark):
    import math
    import random

    from tsgen.queries_ml2 import poisson_glm

    rng = random.Random(8)
    rows = []
    eid = 0
    # weekday rate 2/day, weekend rate 6/day -> weekend_ratio ~ 3
    import datetime as dt

    for u in range(60):
        for d in range(1, 29):
            wd = dt.date(2024, 1, d).weekday()  # Mon=0 .. Sun=6
            lam = 6 if wd >= 5 else 2
            n = max(1, int(lam + rng.uniform(-1, 1)))
            for _ in range(n):
                rows.append((eid, f"2024-01-{d:02d} 10:00:00", u, "view", 1.0, "{}"))
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.iter: r for r in poisson_glm(ev).collect()}
    last = out[max(out)]
    # planted means: weekday E[int(U(1,3))] = 1.5, weekend E[int(U(5,7))] = 5.5
    assert abs(last.weekend_ratio - 5.5 / 1.5) < 0.25
    assert abs(math.exp(last.beta0) - 1.5) < 0.2  # weekday base rate
    # log-likelihood core nondecreasing over Newton iterations
    lls = [out[i].avg_ll_core for i in sorted(out)]
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:]))


def test_assortativity_star_vs_clique(spark):
    from tsgen.queries_experiments import assortativity

    # star graph: hub degree 4, leaves degree 1 -> strongly disassortative
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "doc_a long, doc_b long"
    )
    r = assortativity(star).collect()[0]
    assert r.n_edges == 4
    assert r.assortativity < -0.99  # all edges hub-leaf: r = -1
    # path of 4 nodes: known r = -0.5
    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    r2 = assortativity(path).collect()[0]
    assert abs(r2.assortativity - (-0.5)) < 1e-6


def test_bigram_perplexity_predictable_vs_random(spark):
    import random

    from tsgen.queries_ml2 import bigram_perplexity

    rng = random.Random(23)
    rows = []
    # lang "en": fully deterministic cycle -> tiny held-out perplexity;
    # lang "de": i.i.d. random tokens -> perplexity near uniform (~vocab)
    cyc = ["a", "b", "c", "d"]
    vocab = [f"w{i}" for i in range(30)]
    for i in range(120):
        if i % 2 == 0:
            text = " ".join(cyc[(i + j) % 4] for j in range(40))
            rows.append((i, text, "en", "s", len(text)))
        else:
            text = " ".join(rng.choice(vocab) for _ in range(40))
            rows.append((i, text, "de", "s", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.lang: r for r in bigram_perplexity(df).collect()}
    assert out["en"].perplexity < 3.0      # near-deterministic transitions
    assert out["de"].perplexity > 15.0     # near-uniform over the vocab
    assert out["en"].n_docs > 5 and out["de"].n_docs > 5


def test_hazard_glm_detects_rising_hazard(spark):
    import math
    import random

    from tsgen.queries_ml2 import _hazard_base, logreg_irls

    # synthetic survival: hazard rises with time -> beta1 > 0 recovered.
    # Build the at-risk table directly: users convert at day d with
    # p(d) = sigmoid(-3 + 4*(d/30)).
    rng = random.Random(41)
    rows = []
    for u in range(400):
        fp = None
        for d in range(30):
            if rng.random() < 1 / (1 + math.exp(-(-3 + 4 * d / 30))):
                fp = d
                break
        last = fp if fp is not None else 29
        for d in range(last + 1):
            rows.append((d / 30.0, 1.0 if fp == d else 0.0))
    base = spark.createDataFrame(rows, "x double, y double")
    out = {r.iter: r for r in logreg_irls(base).collect()}
    last_it = out[max(out)]
    assert abs(last_it.beta0 - (-3.0)) < 0.6
    assert abs(last_it.beta1 - 4.0) < 1.2
    # and the sf-table base builder produces a well-formed at-risk table
    hb = _hazard_base(spark, "/root/testdata/sf0.001")
    agg = hb.agg(F.sum("y").alias("s"), F.count("*").alias("n")).collect()[0]
    assert 0 < agg.s < agg.n  # some conversions, some censoring
