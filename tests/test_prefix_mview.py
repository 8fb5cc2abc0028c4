"""Tests: prefix-filtered similarity join exactness vs brute force;
incremental materialized-view merge == full recompute."""
import itertools
import random

from pyspark.sql import functions as F

from tsgen.dedup import prefix_jaccard
from tsgen.queries_warehouse2 import mview_merge


def _shingle_set(text, k=3):
    toks = text.split(" ")
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_prefix_jaccard_equals_bruteforce(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(60):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 30)))))
    # planted near-dups: copy with a small edit
    for j, (i, t) in enumerate(docs[:6]):
        toks = t.split(" ")
        toks[len(toks) // 2] = "edited"
        docs.append((100 + j, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.jac)
        for r in prefix_jaccard(df, threshold=0.5).collect()
    }

    sets = {i: _shingle_set(t) for i, t in docs}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= 0.5:
            want[(a, b)] = inter
    # EXACTNESS: prefix filtering loses nothing and adds nothing
    assert set(got) == set(want)
    for k, n in want.items():
        assert got[k][0] == n
    # the planted near-dups are found
    assert all((i, 100 + j) in got for j, (i, _) in enumerate(docs[:6]) if i != 100 + j)


def test_mview_merge_equals_full_recompute(spark):
    rng = random.Random(5)
    rows = [
        (
            i,
            f"2024-01-{rng.randint(1, 28):02d} {rng.randint(0, 23):02d}:00:00",
            i % 7,
            rng.choice(["view", "purchase"]),
            round(rng.uniform(0, 100), 2),
            "{}",
        )
        for i in range(500)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))

    merged = {
        (r.event_type, r.day): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in mview_merge(ev, cutoff="2024-01-15 00:00:00").collect()
    }
    direct = {
        (r.event_type, r.day): (r.n, round(r.s, 4), r.mn, r.mx)
        for r in ev.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for k, (n, s, mn, mx) in direct.items():
        gn, gs, gmn, gmx = merged[k]
        assert gn == n and gmn == mn and gmx == mx
        assert abs(gs - s) < 1e-3


def test_adamic_adar_scalar_reference(spark):
    import math

    from tsgen.queries_experiments import adamic_adar

    # users 0,5,10,15 in the sample (mod 5); 3 shared "days" via event_type
    rows = []
    eid = 0
    for day in ["01", "02", "03"]:
        for u in [0, 5, 10]:  # item (view, day) has degree 3
            rows.append((eid, f"2024-01-{day} 10:00:00", u, "view", 1.0, "{}"))
            eid += 1
    rows.append((eid, "2024-01-01 11:00:00", 15, "click", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r.u, r.v): (r.n_shared, r.aa_score) for r in adamic_adar(ev).collect()}
    want = round(3.0 / math.log(3.0) + 1e-9, 6)  # 3 shared items, each deg 3
    assert out[(0, 5)] == (3, want)
    assert out[(0, 10)] == (3, want)
    assert out[(5, 10)] == (3, want)
    # user 15's lone click item has degree 1 -> no pairs involving 15
    assert all(15 not in k for k in out)


def test_markov_attribution_scalar_reference(spark):
    from tsgen.queries_experiments import markov_attribution

    # A: view->purchase, B: view->(null), C: click->purchase
    # chain: start->{view 2/3, click 1/3}; view->{conv .5, null .5}; click->conv 1
    # p0 = 2/3; removing view or click each leaves p = 1/3 -> effects .5/.5
    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (1, "2024-01-01 11:00:00", 1, "purchase", 1.0, "{}"),
        (2, "2024-01-02 10:00:00", 2, "view", 1.0, "{}"),
        (3, "2024-01-03 10:00:00", 3, "click", 1.0, "{}"),
        (4, "2024-01-03 11:00:00", 3, "purchase", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.channel: r for r in markov_attribution(ev).collect()}
    assert abs(out["view"].p_conv - 2 / 3) < 1e-6
    assert abs(out["view"].removal_effect - 0.5) < 1e-6
    assert abs(out["click"].removal_effect - 0.5) < 1e-6
    assert abs(out["view"].credit - 0.5) < 1e-6
    assert out["error"].removal_effect == 0.0 and out["signup"].removal_effect == 0.0
    assert abs(out["click"].p_conv_removed - 1 / 3) < 1e-6


def test_salted_join_and_agg_match_plain(spark):
    from tsgen.analytics import salted_agg, salted_join

    left = spark.range(0, 2000).select(
        (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("x")
    )
    right = spark.createDataFrame(
        [(i, f"g{i}") for i in range(7)], "k long, grp string"
    )
    plain = {
        (r.grp,): (r.n, r.s)
        for r in left.join(right, "k")
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("x").alias("s"))
        .collect()
    }
    salted = {
        (r.grp,): (r.n, r.s)
        for r in salted_join(left, right, "k")
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("x").alias("s"))
        .collect()
    }
    assert salted == plain
    agg = {
        r.k: (r.s, r.n)
        for r in salted_agg(left, ["k"], {"x": "sum", "n": "count"})
        .withColumnRenamed("x", "s")
        .collect()
    }
    plain_agg = {
        r.k: (r.s, r.n)
        for r in left.groupBy("k")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert agg == plain_agg


def test_retract_merge_equals_filtered_recompute(spark):
    import random

    from tsgen.queries_warehouse2 import retract_merge

    rng = random.Random(31)
    rows = [
        (
            i,
            f"2024-01-{rng.randint(1, 10):02d} 08:00:00",
            rng.randrange(300),
            rng.choice(["view", "purchase"]),
            round(rng.uniform(0, 100), 2),
            "{}",
        )
        for i in range(3000)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))

    merged = {
        (r.event_type, r.day): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in retract_merge(ev, erase_mod=7).collect()
    }
    direct = {
        (r.event_type, r.day): (r.n, round(r.s + 1e-9, 4), r.mn, r.mx)
        for r in ev.filter(F.col("user_id") % 7 != 0)
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for k, (n, s, mn, mx) in direct.items():
        gn, gs, gmn, gmx = merged[k]
        assert gn == n and gmn == mn and gmx == mx  # min/max repaired exactly
        assert abs(gs - s) < 1e-3


def test_cohort_ltv_triangle_scalar(spark):
    from tsgen.queries_warehouse2 import cohort_ltv

    # cohort A (user 1, first week): buys 10 in week 0, 20 in week 1
    # cohort B (user 2, second week): buys 5 in its week 0
    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),      # first-seen wk W
        (1, "2024-01-02 10:00:00", 1, "purchase", 10.0, "{}"),
        (2, "2024-01-09 10:00:00", 1, "purchase", 20.0, "{}"),  # age 1
        (3, "2024-01-10 10:00:00", 2, "purchase", 5.0, "{}"),   # cohort W+1
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r.cohort_w, r.age_w): r for r in cohort_ltv(ev).collect()}
    weeks = sorted({c for c, _ in out})
    w0 = weeks[0]
    assert out[(w0, 0)].cum_rev == 10.0
    assert out[(w0, 1)].cum_rev == 30.0            # cumulative along age
    assert out[(w0, 1)].ltv_per_user == 30.0       # one user in the cohort
    assert out[(weeks[1], 0)].cum_rev == 5.0
