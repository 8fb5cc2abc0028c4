"""Tests for queries_mlprep: JW kernel parity vs DuckDB, split properties,
WOE scalar reference."""
import math
import random

import duckdb

from pyspark.sql import functions as F

from tsgen.queries_mlprep import doc_woe, jaro_winkler, name_match_jw


def test_jaro_winkler_parity_with_duckdb():
    rng = random.Random(17)
    alphabet = "abcdefg "
    con = duckdb.connect()
    cases = [("", ""), ("a", ""), ("abc", "abc"), ("martha", "marhta"),
             ("dixon", "dicksonx"), ("crate", "trace")]
    for _ in range(500):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        cases.append((a, b))
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        got = jaro_winkler(a, b)
        assert abs(got - want) < 1e-12, (a, b, got, want)


def test_name_match_blocking_and_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "azure steel plate"),
            (2, "azure steel plates"),   # near-dup of 1, same block
            (3, "azure copper wire"),    # same block, dissimilar
            (4, "bronze steel plate"),   # different block: never paired w/ 1
        ],
        "p_partkey long, p_name string",
    )
    out = {(r.key_a, r.key_b): r.jw for r in name_match_jw(df, threshold=0.9).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.9
    assert (1, 3) not in out
    assert all(4 not in k for k in out)


def test_doc_woe_scalar_reference(spark):
    # 2 bins, hand-computable: bin0 has 3 pos / 1 neg, bin1 has 1 pos / 3 neg
    rows = [(i, "t", "en" if i < 3 else "de", "s", 10) for i in range(4)]
    rows += [(i + 4, "t", "en" if i < 1 else "de", "s", 110) for i in range(4)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.bin: r for r in doc_woe(docs, bin_w=100, bin_max=5).collect()}
    pos_tot, neg_tot = 4, 4
    for bin_, (np_, nn) in {0: (3, 1), 1: (1, 3)}.items():
        pr = (np_ + 0.5) / (pos_tot + 0.5)
        nr = (nn + 0.5) / (neg_tot + 0.5)
        woe = math.log(pr / nr)
        assert out[bin_].n_pos == np_ and out[bin_].n_neg == nn
        assert abs(out[bin_].woe - woe) < 1e-12
        assert abs(out[bin_].iv_term - (pr - nr) * woe) < 1e-12


def test_split_leakage_flags_cross_split_neardups(spark):
    # the sf0.001 corpus has planted near-dups; at least one pair must
    # straddle a split boundary and the report must aggregate only
    # cross-split pairs with ordered split names
    import tsgen.queries_mlprep as M

    out = M._q_split_leakage(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert r.split_a < r.split_b  # least/greatest canonical order
        assert r.n_leaky_pairs > 0
        assert 0.0 <= r.avg_jaccard <= r.max_jaccard <= 1.0


def test_split_assign_fractions(spark, tmp_path):
    # deterministic: same ids -> same splits on rerun; fractions near 80/10/10
    import tsgen.queries_mlprep as M

    n = 5000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(10).alias("n_chars"),
    )
    assigned = docs.selectExpr("doc_id", f"{M._split_expr()} AS split")
    counts = {r.split: r.c for r in assigned.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.01
    assert abs(counts["test"] / n - 0.1) < 0.01
    again = {r.doc_id: r.split for r in assigned.collect()}
    twice = {r.doc_id: r.split for r in assigned.collect()}
    assert again == twice


def test_gbm_stumps_finds_planted_split_and_reduces_rmse(spark):
    # y = 5 for hours >= 12, else 0 (tiny noise): round 1 must split f_hod
    # at threshold 11 with leaves near 0/5, and RMSE must fall each round
    import datetime

    import numpy as np

    from tsgen.queries_mlprep import gbm_stumps

    rng = np.random.RandomState(31)
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(2000):
        ts = t0 + datetime.timedelta(hours=i % 24, minutes=(i * 7) % 60, days=i // 24)
        hod = int(ts.timestamp() // 3600) % 24
        y = (5.0 if hod >= 12 else 0.0) + 0.01 * rng.randn()
        rows.append((i, ts, i % 50, "e", float(y), "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    model = sorted(gbm_stumps(ev).collect(), key=lambda r: r.round)
    assert len(model) == 3
    r1 = model[0]
    assert r1.feature == "f_hod" and r1.threshold == 11
    assert abs(r1.left_val - (-2.5)) < 0.1 and abs(r1.right_val - 2.5) < 0.1
    rmses = [r.rmse_after for r in model]
    assert rmses[0] > rmses[1] > rmses[2]
    # lr=0.5 twice on the same split ≈ full correction → tiny final RMSE
    assert rmses[2] < 0.7


def test_entity_clusters_transitive_closure(spark):
    from tsgen.dedup import connected_components

    # a~b and b~c (transitive, a!~c directly): one entity of size 3
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    lab = {r.node: r.label for r in connected_components(pairs).collect()}
    assert lab[1] == lab[2] == lab[3] == 1  # min key is the golden record
    assert lab[10] == lab[11] == 10


def test_snm_finds_adjacent_near_dups(spark):
    from tsgen.queries_mlprep import name_match_snm

    rows = [
        (1, "azure steel plate"),
        (2, "azure steel plates"),   # sorts adjacent to 1 -> matched
        (3, "azure aaaa zzz"),       # same block, dissimilar -> scored, rejected
        (4, "bronze widget"),        # different block -> never paired with 1
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    out = {(r.key_a, r.key_b): r.jw for r in name_match_snm(df).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.88
    assert (1, 3) not in out and (2, 3) not in out
    assert all(4 not in k for k in out)
