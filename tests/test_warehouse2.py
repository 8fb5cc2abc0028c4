"""Tests for queries_warehouse2: MERGE-upsert invariants and skyline
correctness vs a brute-force dominance check."""
import datetime

import numpy as np

from pyspark.sql import functions as F

from tsgen.queries_warehouse2 import _profile, _sweep, doc_pareto, merge_upsert


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_merge_upsert_equals_full_recompute(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(1, 8):
        for i in range(u):
            eid += 1
            rows.append(
                (eid, t0 + datetime.timedelta(hours=eid), u, f"t{eid % 3}", float(eid), "{}")
            )
    ev = _ev(spark, rows)
    cut = t0 + datetime.timedelta(hours=14)
    merged = merge_upsert(
        _profile(ev.filter(F.col("ts") < cut)), _profile(ev.filter(F.col("ts") >= cut))
    )
    direct = _profile(ev)
    m = {r.user_id: r for r in merged.collect()}
    d = {r.user_id: r for r in direct.collect()}
    assert set(m) == set(d)
    for u in d:
        assert m[u].n_events == d[u].n_events, u
        assert abs(m[u].sum_value - d[u].sum_value) < 1e-9, u
        assert m[u].last_ts_s == d[u].last_ts_s, u
        assert m[u].last_type == d[u].last_type, u
    # action classification: users entirely after the cutoff insert,
    # entirely before keep, spanning update
    actions = {r.user_id: r.action for r in merged.collect()}
    first_last = {u: (min(r[0] for r in rows if r[2] == u), max(r[0] for r in rows if r[2] == u)) for u in d}
    for u, (lo, hi) in first_last.items():
        lo_ts = t0 + datetime.timedelta(hours=lo)
        hi_ts = t0 + datetime.timedelta(hours=hi)
        want = (
            "insert" if lo_ts >= cut else ("keep" if hi_ts < cut else "update")
        )
        assert actions[u] == want, u


def test_skyline_matches_bruteforce(spark):
    rng = np.random.default_rng(3)
    vocab = rng.integers(1, 50, size=200)
    ntok = vocab + rng.integers(0, 40, size=200)  # vocab <= tokens
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(
                    [f"w{j}" for j in range(int(v))]
                    + ["pad" for _ in range(int(n - v))]
                ),
            )
            for i, (v, n) in enumerate(zip(vocab, ntok))
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in doc_pareto(docs).collect()}
    # brute force dominance over the (vocab, n_tokens) points
    # note: "pad" itself is a distinct token, so vocab is v+1 unless n==v
    pts = {}
    for i, (v, n) in enumerate(zip(vocab, ntok)):
        pts[i] = (int(v) + (1 if n > v else 0), int(n))
    def dominated(p):
        pv, pn = pts[p]
        return any(
            (qv >= pv and qn <= pn and (qv > pv or qn < pn))
            for q, (qv, qn) in pts.items()
            if q != p
        )
    want = {p for p in pts if not dominated(p)}
    assert got == want


def test_sweep_handles_ties():
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4, 5],
         "vocab":    [5, 5, 4, 6, 6],
         "n_tokens": [10, 10, 10, 12, 12]}
    )
    out = set(_sweep(pdf)["doc_id"])
    # docs 1,2 tie at the (10-token, vocab 5) frontier point -> both stay;
    # doc 3 dominated within-group; docs 4,5 add vocab 6 at 12 tokens
    assert out == {1, 2, 4, 5}


def test_ewma_corr_sign_and_recency(spark):
    # y = 2x → corr +1; z = -x → corr -1; and the estimator is RECENCY
    # weighted: a pair that anti-moved early but co-moves late scores
    # strongly positive under lambda^(T-t)
    from tsgen.queries_warehouse2 import ewma_corr

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    rng = np.random.RandomState(3)
    xs = rng.randn(200)
    for i, x in enumerate(xs):
        ts = t0 + datetime.timedelta(hours=i)
        flip = -1.0 if i < 100 else 1.0  # "w" anti-moves early, co-moves late
        for et, v in (("a", x), ("b", 2.0 * x), ("c", -x), ("w", flip * x)):
            eid += 1
            rows.append((eid, ts, 1, et, float(v), "{}"))
    out = {(r.type_a, r.type_b): r for r in ewma_corr(_ev(spark, rows)).collect()}
    assert abs(out[("a", "b")].ew_corr - 1.0) < 1e-9
    assert abs(out[("a", "c")].ew_corr - (-1.0)) < 1e-9
    assert out[("a", "w")].ew_corr > 0.9  # recent regime dominates
    assert all(r.n_buckets == 200 for r in out.values())


def test_time_travel_reconstructs_point_in_time_state(spark):
    # user 1: a@t0h, b@t10h, c@t20h — probing between changes returns the
    # then-current attribute; probing before the first change returns nothing
    from tsgen.queries_warehouse2 import time_travel

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0 + datetime.timedelta(hours=10), 1, "b", 1.0, "{}"),
        (3, t0 + datetime.timedelta(hours=20), 1, "c", 1.0, "{}"),
    ]
    base = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp())
    probes = (base - 3600, base + 5 * 3600, base + 15 * 3600, base + 100 * 3600)
    out = {r.asof_s: r for r in time_travel(_ev(spark, rows), probes).collect()}
    assert probes[0] not in out                      # before any state
    assert out[probes[1]].event_type == "a" and out[probes[1]].version == 1
    assert out[probes[2]].event_type == "b" and out[probes[2]].version == 2
    assert out[probes[3]].event_type == "c" and out[probes[3]].version == 3


def test_psi_flags_planted_shift_only(spark):
    # type "stable": same N(0,1)-ish values both halves → PSI ~ 0
    # type "shifted": mean jumps by 3 after the cutoff → PSI >> 0.2
    from tsgen.queries_warehouse2 import psi_drift

    rng = np.random.RandomState(5)
    t0 = datetime.datetime(2024, 1, 10)
    t1 = datetime.datetime(2024, 1, 20)
    rows, eid = [], 0
    for base_t, shift in ((t0, 0.0), (t1, 3.0)):
        for i in range(800):
            eid += 1
            ts = base_t + datetime.timedelta(minutes=i)
            rows.append((eid, ts, 1, "stable", float(rng.randn()), "{}"))
            eid += 1
            rows.append((eid, ts, 1, "shifted", float(rng.randn() + shift), "{}"))
    out = {r.event_type: r for r in psi_drift(_ev(spark, rows), cutoff="2024-01-16 00:00:00").collect()}
    assert out["stable"].psi < 0.1 and not out["stable"].drifted
    assert out["shifted"].psi > 0.5 and out["shifted"].drifted
    assert out["stable"].n_ref == 800 and out["stable"].n_cur == 800
