"""Tests: CUPED adjustment properties; Poisson-bootstrap CI invariants."""
import random

from pyspark.sql import functions as F

from tsgen.queries_causal import ab_holm, cuped_readout, its_readout
from tsgen.queries_scale import bootstrap_mean


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_cuped_mean_invariance_and_variance_reduction(spark):
    # per-user level that persists pre -> post: CUPED should strip it
    rng = random.Random(3)
    rows = []
    eid = 0
    for u in range(80):
        level = rng.uniform(0, 100)  # user effect, correlated across periods
        for d in range(1, 11):  # pre period
            rows.append((eid, f"2024-01-{d:02d} 12:00:00", u, "view",
                         level + rng.uniform(-5, 5), "{}"))
            eid += 1
        for d in range(16, 26):  # post period
            rows.append((eid, f"2024-01-{d:02d} 12:00:00", u, "view",
                         level + rng.uniform(-5, 5), "{}"))
            eid += 1
    out = cuped_readout(_events_df(spark, rows)).collect()
    assert len(out) == 2
    # POOLED mean is invariant (E[X - mean(X)] = 0 over all users); per-arm
    # means legitimately shift by -theta*(arm pre-mean - global pre-mean)
    n = sum(r.n_users for r in out)
    pooled_y = sum(r.mean_y * r.n_users for r in out) / n
    pooled_adj = sum(r.mean_y_adj * r.n_users for r in out) / n
    assert abs(pooled_y - pooled_adj) < 0.5
    for r in out:
        # strong pre/post correlation -> big variance reduction
        assert r.var_reduction > 0.8
        assert r.var_y_adj < r.var_y
        assert 0.5 < r.theta < 1.5  # slope of a persistent level is ~1


def test_bootstrap_ci_invariants(spark):
    rng = random.Random(9)
    rows = [
        (i, "2024-01-01 00:00:00", i % 10, "view", rng.uniform(0, 100), "{}")
        for i in range(2000)
    ]
    ev = _events_df(spark, rows)
    r = bootstrap_mean(ev).collect()[0]
    assert r.n_reps == 100
    assert r.ci_lo <= r.boot_mean <= r.ci_hi
    assert r.ci_lo <= r.mean_value <= r.ci_hi  # CI covers the point estimate
    assert r.boot_se > 0
    # width is a few SEs, not degenerate and not huge
    assert 2 * r.boot_se < (r.ci_hi - r.ci_lo) < 8 * r.boot_se
    # deterministic replay: identical on a second run
    r2 = bootstrap_mean(ev).collect()[0]
    assert (r.boot_mean, r.ci_lo, r.ci_hi) == (r2.boot_mean, r2.ci_lo, r2.ci_hi)


def test_its_recovers_planted_level_and_slope_change(spark):
    # pre: y = 100 + 2t (t=0..18); post: y = 160 + 5(t-19) at t=19..29
    # -> slope change 3, level at t0: pre predicts 100+2*19=138, post 160
    rows = []
    eid = 0
    for t in range(30):
        n = 100 + 2 * t if t < 19 else 160 + 5 * (t - 19)
        for _ in range(n):
            rows.append((eid, f"2024-01-{t + 1:02d} 06:00:00", eid % 5, "view", 1.0, "{}"))
            eid += 1
    ev = _events_df(spark, rows)
    r = its_readout(ev).collect()[0]
    assert r.n_pre == 19 and r.n_post == 11
    assert abs(r.slope_pre - 2.0) < 1e-6
    assert abs(r.slope_post - 5.0) < 1e-6
    assert abs(r.slope_change - 3.0) < 1e-6
    assert abs(r.level_change - (160 - 138)) < 1e-6


def test_ab_holm_null_and_planted_effect(spark):
    import random

    rng = random.Random(21)
    rows = []
    eid = 0
    for et in ["view", "click", "signup"]:
        for _ in range(3000):
            u = rng.randrange(1000)
            v = rng.uniform(0, 100)
            # plant a big arm effect on 'click' only
            if et == "click" and u % 2 == 1:
                v += 40
            rows.append((eid, "2024-01-05 10:00:00", u, et, v, "{}"))
            eid += 1
    out = {r.event_type: r for r in ab_holm(_events_df(spark, rows)).collect()}
    assert out["click"].significant == 1
    assert out["click"].p_holm < 0.001
    # null metrics: adjusted p respects the step-down ordering and is >= raw
    for et in ["view", "signup"]:
        assert out[et].p_holm >= out[et].p_value - 1e-9
    # monotone: adjusted p nondecreasing in raw-p order
    ps = sorted(out.values(), key=lambda r: r.p_value)
    for a, b in zip(ps, ps[1:]):
        assert b.p_holm >= a.p_holm - 1e-9


def test_msprt_always_valid_p_properties(spark):
    import random

    from tsgen.queries_causal import msprt_monitor

    rng = random.Random(13)
    rows = []
    eid = 0
    for day in range(1, 21):
        for _ in range(400):
            u = rng.randrange(500)
            v = rng.uniform(0, 10)
            if u % 2 == 1:
                v += 3.0  # planted persistent arm effect
            rows.append((eid, f"2024-01-{day:02d} 09:00:00", u, "view", v, "{}"))
            eid += 1
    out = sorted(msprt_monitor(_events_df(spark, rows)).collect(), key=lambda r: r.day)
    # always-valid p is nonincreasing by construction
    for a, b in zip(out, out[1:]):
        assert b.p_always_valid <= a.p_always_valid + 1e-9
    # a real persistent effect eventually drives the monitor to rejection
    assert out[-1].p_always_valid < 0.05
    assert out[-1].theta > 2.0
    # under the null the monitor stays calm
    null_rows = [
        (i, f"2024-01-{1 + i % 20:02d} 09:00:00", i % 500, "view",
         rng.uniform(0, 10), "{}")
        for i in range(8000)
    ]
    null_out = msprt_monitor(_events_df(spark, null_rows)).collect()
    assert min(r.p_always_valid for r in null_out) > 0.05


def test_srm_detects_planted_imbalance(spark):
    from tsgen.queries_causal import srm_check

    rows = []
    eid = 0
    # balanced stratum
    for i in range(2000):
        rows.append((eid, "2024-01-02 10:00:00", i, "view", 1.0, "{}"))
        eid += 1
    # imbalanced stratum: 70/30 via biased user ids
    for i in range(2000):
        u = 2 * i if i < 1400 else 2 * i + 1  # 1400 even, 600 odd
        rows.append((eid, "2024-01-02 11:00:00", u, "click", 1.0, "{}"))
        eid += 1
    out = {r.event_type: r for r in srm_check(_events_df(spark, rows)).collect()}
    assert out["view"].srm_alert == 0
    assert out["click"].srm_alert == 1
    assert out["click"].chi2 > 100  # (1400-1000)^2/1000 * 2 = 320
    assert out["__all__"].n_a + out["__all__"].n_b == 4000


def test_next_event_eval_learns_planted_transitions(spark):
    from tsgen.queries_causal import next_event_eval

    # deterministic chains: view -> click -> purchase, repeated across
    # the cutoff; the learned model should predict perfectly on test
    rows = []
    eid = 0
    for u in range(40):
        for d in range(1, 29):  # spans the 2024-01-20 cutoff
            for h, et in [(10, "view"), (11, "click"), (12, "purchase")]:
                rows.append((eid, f"2024-01-{d:02d} {h}:00:00", u, et, 1.0, "{}"))
                eid += 1
    out = {r.cur: r for r in next_event_eval(_events_df(spark, rows)).collect()}
    assert out["view"].predicted == "click" and out["view"].acc_model == 1.0
    assert out["click"].predicted == "purchase" and out["click"].acc_model == 1.0
    # conditioning beats the global baseline on at least one type
    assert any(r.acc_model > r.acc_base for r in out.values())


def test_bootstrap_weights_follow_poisson1(spark):
    """The portable-LCG CASE ladder must actually produce Poisson(1)
    frequencies — pins the inverse-CDF thresholds against regression."""
    import math

    from tsgen import expr as E
    from tsgen.queries_scale import BOOT_SALT, _pois_w

    n = 20000
    df = spark.range(n).selectExpr(
        f"CAST({_pois_w(E.u01(f'(id % {E.M31})', BOOT_SALT))} AS INT) AS w"
    )
    freq = {r.w: r.c for r in df.groupBy("w").agg(F.count("*").alias("c")).collect()}
    for k in range(4):
        expected = math.exp(-1) / math.factorial(k)
        got = freq.get(k, 0) / n
        assert abs(got - expected) < 0.01, (k, got, expected)
    # mean of Poisson(1) is 1
    mean_w = sum(k * c for k, c in freq.items()) / n
    assert abs(mean_w - 1.0) < 0.02


def test_msprt_by_type_isolates_the_affected_stratum(spark):
    import random

    from tsgen.queries_causal import msprt_by_type

    rng = random.Random(17)
    rows = []
    eid = 0
    for day in range(1, 21):
        for et in ["view", "click"]:
            for _ in range(300):
                u = rng.randrange(400)
                v = rng.uniform(0, 10)
                if et == "click" and u % 2 == 1:
                    v += 3.0  # effect planted in ONE stratum only
                rows.append((eid, f"2024-01-{day:02d} 09:00:00", u, et, v, "{}"))
                eid += 1
    out = msprt_by_type(_events_df(spark, rows)).collect()
    last = {r.event_type: r for r in out if r.day == max(x.day for x in out)}
    assert last["click"].p_always_valid < 0.05   # detected
    assert last["view"].p_always_valid > 0.05    # untouched stratum stays calm


def test_power_analysis_closed_form(spark):
    import math

    from tsgen.queries_causal import Z_ALPHA_2, Z_BETA, power_analysis

    rng = random.Random(29)
    rows = [
        (i, "2024-01-01 00:00:00" if i == 0 else "2024-01-11 00:00:00",
         i % 7, "view", rng.gauss(50, 10), "{}")
        for i in range(5000)
    ]
    ev = _events_df(spark, rows)
    out = {r.mde: r for r in power_analysis(ev).collect()}
    s2 = out[1.0].s2
    assert abs(s2 - 100.0) < 10.0  # planted variance
    for mde, r in out.items():
        want = math.ceil(2 * s2 * (Z_ALPHA_2 + Z_BETA) ** 2 / mde**2)
        assert r.n_per_arm == want
    # quadratic scaling: halving the MDE quadruples the sample size
    assert out[0.5].n_per_arm > 3.9 * out[1.0].n_per_arm
    assert all(r.days_needed > 0 for r in out.values())


def test_qte_sees_tail_only_effect(spark):
    import random

    from tsgen.queries_causal import qte_readout

    rng = random.Random(43)
    rows = []
    eid = 0
    for _ in range(8000):
        u = rng.randrange(1000)
        v = rng.uniform(1, 100)
        # treatment boosts ONLY the top decile of draws
        if u % 2 == 1 and v > 90:
            v *= 2.0
        rows.append((eid, "2024-01-03 09:00:00", u, "view", v, "{}"))
        eid += 1
    out = {round(r.q, 2): r for r in qte_readout(_events_df(spark, rows)).collect()}
    # median barely moves; the q90 effect is large
    assert abs(out[0.5].qte) < out[0.9].qte / 3
    assert out[0.9].qte > 30.0
    # sketch relative-error sanity on the control side
    assert abs(out[0.5].q_control - 50.0) < 5.0


def test_novelty_effect_decay_detected(spark):
    import random

    from tsgen.queries_causal import novelty_effect

    import datetime as dt

    rng = random.Random(47)
    rows = []
    eid = 0
    epoch = dt.date(1970, 1, 1)

    def op_week(day):  # the operator's epoch-aligned calendar week
        return (dt.date(2024, 1, day) - epoch).days // 7

    w0 = op_week(1)
    for u in range(300):
        for d in range(1, 29):
            v = rng.uniform(40, 60)
            age_w = op_week(d) - w0
            if u % 2 == 1:
                v += max(0.0, 10.0 - 5.0 * age_w)  # effect decays with age
            rows.append((eid, f"2024-01-{d:02d} 09:00:00", u, "view", v, "{}"))
            eid += 1
    out = {r.age_w: r for r in novelty_effect(_events_df(spark, rows)).collect()}
    assert out[0].effect > 8.0      # fresh users: big lift
    assert out[1].effect > 3.0
    assert abs(out[2].effect) < 2.0 # effect gone by week 2 -> novelty
    assert out[0].effect > out[1].effect > out[2].effect - 1e-9


def test_qini_empty_arm_deciles_yield_null(spark):
    # ADVICE r05: a decile with zero treated (or zero control) users must
    # yield NULL uplift/qini, not an ANSI DIVIDE_BY_ZERO crash. All-odd
    # user_ids -> every user is treated -> n_ctrl = cum_nc = 0 everywhere,
    # so uplift AND qini (which divides by cum_nc) are both NULL.
    from tsgen.queries_causal import qini_curve

    rows = []
    eid = 0
    for u in range(1, 161, 2):  # odd ids only: arm = u % 2 = 1 for all
        for k in range((u - 1) // 2 % 20 + 1):
            rows.append((eid, "2024-01-05 10:00:00", u, "view", 1.0, "{}"))
            eid += 1
        if u % 6 == 0:
            rows.append((eid, "2024-01-06 10:00:00", u, "purchase", 5.0, "{}"))
            eid += 1
    out = qini_curve(_events_df(spark, rows)).collect()
    assert len(out) == 10
    for r in out:
        assert r.n_ctrl == 0
        assert r.uplift is None and r.qini is None
