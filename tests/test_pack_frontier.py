"""pack_budget_frontier property tests (oracle gate certifies values)."""
from __future__ import annotations


def test_pack_frontier_consistent_with_ffd_at_default_budget(spark):
    # At budget 256 the frontier must reproduce pack_sequences_ffd exactly:
    # same global bin count, same wasted padding (sum of max(256 - load, 0)),
    # same overflow count — both run the identical FFD kernel.
    from pyspark.sql import functions as F

    from tsgen.text import PACK_BUDGET, pack_budget_frontier, pack_sequences_ffd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r.budget: r for r in pack_budget_frontier(docs).collect()}
    assert sorted(rows) == [128, 256, 512, 1024]

    ffd = pack_sequences_ffd(docs).collect()
    assert rows[PACK_BUDGET].n_bins == len(ffd)
    assert rows[PACK_BUDGET].n_overflow == sum(
        1 for r in ffd if r.n_tokens_packed > PACK_BUDGET
    )
    wasted = sum(max(PACK_BUDGET - r.n_tokens_packed, 0) for r in ffd)
    assert abs(
        rows[PACK_BUDGET].waste_frac - wasted / (len(ffd) * float(PACK_BUDGET))
    ) < 1e-5

    # overflow bins are singleton docs longer than the budget, so their
    # count can only shrink as the budget grows
    over = [rows[m].n_overflow for m in sorted(rows)]
    assert all(a >= b for a, b in zip(over, over[1:]))


def test_filter_frontier_counts_and_monotone_mean(spark):
    # drop_pct=0 must cover the whole corpus; retained doc counts follow
    # the exact integer cutoff; dropping the worst (highest-score) docs
    # can only lower the mean score of the survivors.
    from pyspark.sql import functions as F

    from tsgen.queries_pipeline import _q_filter_frontier

    sf = "/root/testdata/sf0.001"
    rows = {r.drop_pct: r for r in _q_filter_frontier(spark, sf).collect()}
    assert sorted(rows) == [0, 10, 25, 50]

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n = docs.count()
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0].t
    assert rows[0].docs_retained == n
    assert rows[0].tokens_retained == total_tokens
    for p in (10, 25, 50):
        assert rows[p].docs_retained == n - (p * n) // 100
    means = [rows[p].mean_lm_score for p in sorted(rows)]
    assert all(a >= b for a, b in zip(means, means[1:]))


def test_r9_frontiers_partition_invariant(spark):
    # Companion to test_frontiers_partition_invariant (r10 family): the r9
    # operating-point frontiers must also be layout-independent — FFD bins
    # are packed per (lang, source) shard in deterministic doc_id order,
    # and the ANN frontiers rank over portable integer hashes with
    # round-before-rank ties, so repartitioning the input cannot move a
    # single row.
    from tsgen.similarity import ivf_probe_frontier, rerank_frontier
    from tsgen.text import pack_budget_frontier

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for fn, src, parts in (
        (pack_budget_frontier, docs, 7),
        (ivf_probe_frontier, emb, 11),
        (rerank_frontier, emb, 13),
    ):
        a = rows(fn(src))
        b = rows(fn(src.repartition(parts)))
        assert a == b, f"{fn.__name__} changed under repartition({parts})"
