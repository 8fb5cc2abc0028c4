"""Two-phase global-order machinery (VERDICT r03 items 3+4): ntile_exact /
cumsum_exact must (a) match the naive global-window result exactly and
(b) never put a data-sized window on a single reducer."""
from pyspark.sql import Window, functions as F

from tsgen.queries_scale import cumsum_exact, ntile_exact

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ntile_exact_matches_sql_ntile(spark):
    # n=10, k=4 -> remainder tiles (3,3,2,2); ties broken by key
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 3, 3, 8, 1, 9, 2, 7, 4, 6])],
        "k int, v double",
    )
    naive = df.withColumn(
        "t", F.ntile(4).over(Window.orderBy(F.col("v").desc(), F.col("k").asc()))
    )
    ours = ntile_exact(df, 4, [F.col("v").desc(), F.col("k").asc()], "t")
    assert _rows(ours) == _rows(naive)


def test_ntile_exact_n_below_k(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double")
    naive = df.withColumn("t", F.ntile(4).over(Window.orderBy("v", "k")))
    ours = ntile_exact(df, 4, [F.col("v").asc(), F.col("k").asc()], "t")
    assert _rows(ours) == _rows(naive)


def test_cumsum_exact_matches_running_sum(spark):
    df = spark.createDataFrame(
        [(i, float((i * 7) % 13)) for i in range(57)], "k int, v double"
    )
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = df.withColumn("c", F.sum("v").over(w))
    ours = cumsum_exact(df, "v", [F.col("v").desc(), F.col("k").asc()], "c")
    assert _rows(ours) == _rows(naive)


def _assert_no_global_data_window(plan: str):
    """Every Window node must either be _pid-partitioned (data-sized local
    rank / running sum) or be the bounded offsets prefix-sum over the
    one-row-per-partition counts table (sum(_n))."""
    assert "ntile(" not in plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert "sum(_n#" in line or "windowspecdefinition(_pid#" in line, line


def test_rfm_and_abc_plans_have_no_single_reducer_window(spark):
    from tsgen.queries import registry

    reg = registry()
    for name in ("rfm_segments", "orders_abc"):
        plan = (
            reg[name]
            .spark_fn(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        _assert_no_global_data_window(plan)


def test_results_invariant_to_shuffle_partition_count(spark):
    # spark.sql.shuffle.partitions is the conf a cluster operator retunes
    # first; results must not depend on it. Representative set: a window
    # family (ev_rank_funcs), a multi-join frontier (dedup_threshold), a
    # streaming twin replay (stream_psi has its own session handling — use
    # batch psi drift instead), a groupBy rollup, and the incremental-LSH
    # production shape. Runtime conf flip + AQE exercise genuinely
    # different physical partitionings on the same data.
    from tsgen.queries import registry

    reg = registry()
    names = [
        "ev_rank_funcs",
        "dedup_threshold_frontier",
        "ev_psi_drift",
        "orders_rollup",
        "dedup_incremental_lsh",
    ]
    sf = "/root/testdata/sf0.001"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    # the session default is the host CPU count (tsgen/session.py), so the
    # alternate count must be picked dynamically — a hardcoded "7" on a
    # 7-CPU host would compare a run against itself (ADVICE r11)
    alt = "7" if before != "7" else "13"
    try:
        results = {}
        for n_shuffle in (alt, before):
            spark.conf.set("spark.sql.shuffle.partitions", n_shuffle)
            for name in names:
                rows = sorted(
                    (tuple(r) for r in reg[name].spark_fn(spark, sf).collect()),
                    key=repr,  # null-safe ordering; equality compare is exact
                )
                results[(name, n_shuffle)] = rows
        for name in names:
            assert results[(name, alt)] == results[(name, before)], (
                f"{name} changed under shuffle.partitions={alt}"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
