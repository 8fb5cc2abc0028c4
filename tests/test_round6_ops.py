"""Round-6 operators: Gopher quality rules, personalized PageRank,
Kleinberg burst detection — planted-structure property tests."""
from pyspark.sql import functions as F

from tsgen.queries_experiments import personalized_pagerank
from tsgen.queries_statemodels import burst_detect
from tsgen.text import gopher_quality


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_discriminate(spark):
    good = " ".join(
        ["the quick brown fox jumps over lazy dogs and cats with vigor"] * 5
    )  # whole-SENTENCE repetition: every n-gram count is spread across the
    # 12 distinct grams of the sentence, so the top-n-gram caps do NOT trip
    # (catching this is Gopher's duplicate-line rule, which needs newlines
    # and is documented as omitted on this corpus)
    # a genuinely varied 60-word doc with >= 2 Gopher stopwords
    varied = "the " + " ".join(f"w{i}xx" for i in range(57)) + " of end"
    short = "the tiny of doc"  # < 50 words
    repet = " ".join(["spam ham"] * 30)  # top 2-gram fraction huge
    nostop = " ".join(f"tok{i}" for i in range(60))  # no Gopher stopwords
    out = {
        r.doc_id: r
        for r in gopher_quality(
            _docs_df(
                spark,
                [(1, varied), (2, short), (3, repet), (4, nostop), (5, good)],
            )
        ).collect()
    }
    assert out[1].pass_gopher  # healthy doc passes all rules
    assert not out[2].pass_gopher and out[2].n_words < 50
    assert not out[3].pass_gopher and out[3].top2_frac > 0.2
    assert not out[4].pass_gopher and out[4].stop_hits < 2
    # the repeated-sentence doc passes the implemented subset: counts are
    # spread over 12 distinct grams (5/59 each), far below every cap
    assert out[5].n_words >= 50 and out[5].pass_gopher
    assert out[5].top2_frac < 0.1 and out[5].top4_frac < 0.1


def test_ppr_mass_concentrates_on_seeds(spark):
    # path graph 1-2-3-4-5-6 plus a far clique 10-11-12; seed = {1}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (10, 12), (11, 12)],
        "doc_a long, doc_b long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r for r in personalized_pagerank(edges, seeds).collect()}
    assert out[1].is_seed == 1 and sum(r.is_seed for r in out.values()) == 1
    # mass decays with distance from the seed along the path
    assert out[1].ppr > out[2].ppr > out[3].ppr > out[4].ppr
    # the disconnected clique gets NO teleport and NO flow -> zero mass
    for far in (10, 11, 12):
        assert out[far].ppr == 0.0
    # total mass stays ~1 on the seed's component (no dangling nodes)
    assert abs(sum(r.ppr for r in out.values()) - 1.0) < 1e-6


def _events_df(spark, ts_list):
    rows = [(i, ts, 1, "view", 1.0, "{}") for i, ts in enumerate(ts_list)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_burst_detect_finds_planted_burst(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # regular 600 s cadence, then a 20-event burst at 5 s spacing, then regular
    ts = [base + dt.timedelta(seconds=600 * i) for i in range(30)]
    burst_start = ts[-1] + dt.timedelta(seconds=600)
    ts += [burst_start + dt.timedelta(seconds=5 * i) for i in range(20)]
    ts += [ts[-1] + dt.timedelta(seconds=600 * (i + 1)) for i in range(30)]
    out = burst_detect(_events_df(spark, [t.isoformat(sep=" ") for t in ts])).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_gaps == 79
    assert r.n_bursts >= 1  # the planted burst is entered at least once
    # burst dwell is the fast stretch, far below the total span
    assert 0 < r.burst_seconds < 600


def test_burst_detect_uniform_has_no_bursts(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(seconds=300 * i) for i in range(60)]
    r = burst_detect(_events_df(spark, [t.isoformat(sep=" ") for t in ts])).collect()[0]
    assert r.n_bursts == 0
    assert r.burst_seconds == 0.0
