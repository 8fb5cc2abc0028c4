"""Classical state-space decoding and AR forecasting on generated series.

ts_hmm_viterbi: Viterbi max-probability decode + forward-algorithm
log-likelihood for a fixed 3-state HMM (Rabiner, Proc. IEEE 1989,
eqs. 32-35 and 19-21) over per-series discretized observations. Both
recursions are LEFT FOLDS over the observation sequence, expressed as
pure Catalyst `aggregate` higher-order functions (no UDF, no Python in
the hot path) — the per-element state is the K-vector of log-scores, so
the fold is O(T·K²) per series with zero shuffle beyond the one
collect_list groupBy. The DuckDB oracle replays the identical fold with
`list_reduce(list_prepend(init, ev), …)` (acc and element are both
DOUBLE[] so the reduce type-checks); each step rounds the K-vector to
9dp in BOTH engines so exp/ln ulp noise cannot compound (the IRLS
rounding discipline). Discretization happens on 6dp-rounded values —
the precision at which the two engines' generated series are identical
— so bucket boundaries can never flip between engines.

forecast_ar2: Yule–Walker AR(2) fit (Box & Jenkins, ch. 3: the
closed-form solve of the order-2 Toeplitz system) + recursive h-step
forecast. Autocovariances are two lag-window products per series (one
window, one agg); the six forecast steps are unrolled scalar
expressions over the per-series coefficient row. Scale shape: per-series
windows only — never a global window; the model state is three numbers
per series.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import expr as E, generators, oracle
from .queries import _REGISTRY, Query, round6, roundn

HMM_N, HMM_LEN = 8, 64
HMM_CUT_LO, HMM_CUT_HI = -0.4, 0.4
# transition, emission, and start distributions (rows sum to 1)
HMM_A = ((0.8, 0.15, 0.05), (0.1, 0.8, 0.1), (0.05, 0.15, 0.8))
HMM_B = ((0.7, 0.2, 0.1), (0.2, 0.6, 0.2), (0.1, 0.2, 0.7))
HMM_PI = (1 / 3, 1 / 3, 1 / 3)
_K = 3

AR_N, AR_LEN, AR_H = 8, 256, 6


def _r9(x: str) -> str:
    return f"(round(({x}) + 1.0e-12, 9) + 0.0e0)"


def _hmm_exprs(spark_dialect: bool):
    """Build the shared fold lambdas; only indexing (0- vs 1-based) and the
    array constructor differ between the Spark and DuckDB dialects."""
    la = [[E.NUM(math.log(HMM_A[i][j])) for j in range(_K)] for i in range(_K)]
    lb = [[E.NUM(math.log(HMM_B[j][s])) for s in range(_K)] for j in range(_K)]
    lpi = [E.NUM(math.log(p)) for p in HMM_PI]
    if spark_dialect:
        arr = lambda xs: "array(" + ", ".join(xs) + ")"  # noqa: E731
        ix = lambda v, k: f"{v}[{k}]"  # noqa: E731  (0-based)
    else:
        arr = lambda xs: "[" + ", ".join(xs) + "]"  # noqa: E731
        ix = lambda v, k: f"{v}[{k + 1}]"  # noqa: E731  (1-based)

    init = arr(lpi)
    # emission log-vector for observed symbol o: e[j] = log B[j][o]
    ev = (
        "CASE WHEN o = 0 THEN " + arr([lb[j][0] for j in range(_K)])
        + " WHEN o = 1 THEN " + arr([lb[j][1] for j in range(_K)])
        + " ELSE " + arr([lb[j][2] for j in range(_K)]) + " END"
    )

    def step(j: int, combine: str) -> str:
        terms = [f"({ix('acc', i)} + {la[i][j]})" for i in range(_K)]
        if combine == "max":
            inner = f"greatest({', '.join(terms)})"
        else:  # logsumexp, explicit left-to-right addition in both engines
            inner = "ln(" + " + ".join(f"exp({t})" for t in terms) + ")"
        return _r9(f"{inner} + {ix('e', j)}")

    vit_merge = arr([step(j, "max") for j in range(_K)])
    fwd_merge = arr([step(j, "lse") for j in range(_K)])
    lse_final = "ln(" + " + ".join(f"exp({ix('fwd', j)})" for j in range(_K)) + ")"
    return init, ev, vit_merge, fwd_merge, lse_final


def hmm_decode(df: DataFrame) -> DataFrame:
    """→ (series_id, viterbi_ll, end_state, forward_ll) per series."""
    init, ev, vit_merge, fwd_merge, lse_final = _hmm_exprs(spark_dialect=True)
    lo, hi = E.NUM(HMM_CUT_LO), E.NUM(HMM_CUT_HI)
    wide = (
        roundn(df, 6, "value")
        .groupBy("series_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("t", F.col("value").alias("v")))
            ).alias("p")
        )
        .select("series_id", F.col("p.v").alias("vs"))
        .withColumn(
            "obs",
            F.expr(
                f"transform(vs, v -> CASE WHEN v < {lo} THEN 0 "
                f"WHEN v < {hi} THEN 1 ELSE 2 END)"
            ),
        )
        .withColumn("evs", F.expr(f"transform(obs, o -> {ev})"))
    )
    folded = wide.select(
        "series_id",
        F.expr(f"aggregate(evs, {init}, (acc, e) -> {vit_merge})").alias("vit"),
        F.expr(f"aggregate(evs, {init}, (acc, e) -> {fwd_merge})").alias("fwd"),
    )
    out = folded.select(
        "series_id",
        F.expr("array_max(vit)").alias("viterbi_ll"),
        F.expr("array_position(vit, array_max(vit))").alias("end_state"),
        F.expr(lse_final).alias("forward_ll"),
    ).orderBy("series_id")
    return round6(out, "viterbi_ll", "forward_ll")


def _q_hmm_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hmm_decode(generators.generate(spark, HMM_N, HMM_LEN, "mixed"))


def _hmm_sql() -> str:
    init, ev, vit_merge, fwd_merge, lse_final = _hmm_exprs(spark_dialect=False)
    lo, hi = E.NUM(HMM_CUT_LO), E.NUM(HMM_CUT_HI)
    gen = oracle.generate_sql(HMM_N, HMM_LEN, "mixed", rounded=True)
    return f"""
WITH src AS MATERIALIZED ({gen}),
w AS (SELECT series_id, list(value ORDER BY t) AS vs FROM src GROUP BY series_id),
o AS (SELECT series_id,
             list_transform(vs, v -> CASE WHEN v < {lo} THEN 0
                                          WHEN v < {hi} THEN 1 ELSE 2 END) AS obs
      FROM w),
em AS (SELECT series_id, list_transform(obs, o -> {ev}) AS evs FROM o),
f AS (SELECT series_id,
             list_reduce(list_prepend({init}, evs), (acc, e) -> {vit_merge}) AS vit,
             list_reduce(list_prepend({init}, evs), (acc, e) -> {fwd_merge}) AS fwd
      FROM em)
SELECT series_id,
       {E.round6('list_max(vit)')} AS viterbi_ll,
       CAST(list_position(vit, list_max(vit)) AS BIGINT) AS end_state,
       {E.round6(lse_final)} AS forward_ll
FROM f ORDER BY series_id
"""


def ar2_forecast(df: DataFrame, h: int = AR_H) -> DataFrame:
    """Yule–Walker AR(2) per series + recursive h-step forecast.
    → (series_id, h, yhat)."""
    from pyspark.sql import Window

    x = roundn(df, 6, "value")
    w = Window.partitionBy("series_id").orderBy("t")
    lagged = (
        x.withColumn("x1", F.lead("value", 1).over(w))
        .withColumn("x2", F.lead("value", 2).over(w))
    )
    stats = lagged.groupBy("series_id").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mu"),
        F.sum(F.col("value") * F.col("value")).alias("sxx"),
        F.sum(F.col("value") * F.col("x1")).alias("sx1"),
        F.sum(F.col("value") * F.col("x2")).alias("sx2"),
        F.sum("value").alias("sx"),
        F.sum("x1").alias("s1"),
        F.sum(F.when(F.col("x1").isNotNull(), F.col("value"))).alias("sa1"),
        F.sum("x2").alias("s2"),
        F.sum(F.when(F.col("x2").isNotNull(), F.col("value"))).alias("sa2"),
        F.count("x1").alias("n1"),
        F.count("x2").alias("n2"),
        F.max_by("value", "t").alias("l1"),
    )
    # centered autocovariances c_k = Σ(x_t-μ)(x_{t+k}-μ)/n over valid t
    c = stats.select(
        "series_id",
        "mu",
        "l1",
        F.expr(_r9("(sxx - 2 * mu * sx + n * mu * mu) / n")).alias("c0"),
        F.expr(_r9("(sx1 - mu * s1 - mu * sa1 + n1 * mu * mu) / n")).alias("c1"),
        F.expr(_r9("(sx2 - mu * s2 - mu * sa2 + n2 * mu * mu) / n")).alias("c2"),
    )
    # second-to-last value for the recursion seed
    last2 = (
        lagged.filter(F.col("x1").isNotNull() & F.col("x2").isNull())
        .select("series_id", F.col("value").alias("l2x"))
    )
    r = (
        c.join(last2, "series_id")
        .withColumn("r1", F.expr(_r9("c1 / c0")))
        .withColumn("r2", F.expr(_r9("c2 / c0")))
        .withColumn("phi1", F.expr(_r9("r1 * (1 - r2) / (1 - r1 * r1)")))
        .withColumn("phi2", F.expr(_r9("(r2 - r1 * r1) / (1 - r1 * r1)")))
        .withColumn("y1", F.expr(_r9("l1 - mu")))
        .withColumn("y2", F.expr(_r9("l2x - mu")))
    )
    prev2, prev1 = "y2", "y1"
    for step in range(1, h + 1):
        r = r.withColumn(
            f"f{step}", F.expr(_r9(f"phi1 * {prev1} + phi2 * {prev2}"))
        )
        prev2, prev1 = prev1, f"f{step}"
    stack = ", ".join(f"{i}L, f{i} + mu" for i in range(1, h + 1))
    out = r.select(
        "series_id", F.expr(f"stack({h}, {stack}) AS (h, yhat)")
    ).orderBy("series_id", "h")
    return round6(out, "yhat")


def _q_forecast_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ar2_forecast(generators.generate(spark, AR_N, AR_LEN, "mixed"))


def _ar2_sql(h: int = AR_H) -> str:
    gen = oracle.generate_sql(AR_N, AR_LEN, "mixed", rounded=True)
    fsteps, prev2, prev1 = [], "y2", "y1"
    for step in range(1, h + 1):
        fsteps.append(
            f"h{step} AS (SELECT *, {_r9(f'phi1 * {prev1} + phi2 * {prev2}')} "
            f"AS f{step} FROM h{step - 1})"
        )
        prev2, prev1 = prev1, f"f{step}"
    cases = " ".join(f"WHEN {i} THEN f{i}" for i in range(1, h + 1))
    chain = ",\n".join(fsteps)
    return f"""
WITH src AS MATERIALIZED ({gen}),
lg AS (SELECT series_id, t, value,
              lead(value, 1) OVER (PARTITION BY series_id ORDER BY t) AS x1,
              lead(value, 2) OVER (PARTITION BY series_id ORDER BY t) AS x2
       FROM src),
st AS (SELECT series_id, count(*) AS n, avg(value) AS mu,
              sum(value * value) AS sxx,
              sum(value * x1) AS sx1, sum(value * x2) AS sx2,
              sum(value) AS sx,
              sum(x1) AS s1, sum(CASE WHEN x1 IS NOT NULL THEN value END) AS sa1,
              sum(x2) AS s2, sum(CASE WHEN x2 IS NOT NULL THEN value END) AS sa2,
              count(x1) AS n1, count(x2) AS n2,
              max_by(value, t) AS l1
       FROM lg GROUP BY series_id),
l2 AS (SELECT series_id, value AS l2x FROM lg
       WHERE x1 IS NOT NULL AND x2 IS NULL),
cv AS (SELECT st.series_id, mu, l1, l2x,
              {_r9('(sxx - 2 * mu * sx + n * mu * mu) / n')} AS c0,
              {_r9('(sx1 - mu * s1 - mu * sa1 + n1 * mu * mu) / n')} AS c1,
              {_r9('(sx2 - mu * s2 - mu * sa2 + n2 * mu * mu) / n')} AS c2
       FROM st JOIN l2 USING (series_id)),
rr AS (SELECT *, {_r9('c1 / c0')} AS r1, {_r9('c2 / c0')} AS r2 FROM cv),
h0 AS (SELECT *, {_r9('r1 * (1 - r2) / (1 - r1 * r1)')} AS phi1,
              {_r9('(r2 - r1 * r1) / (1 - r1 * r1)')} AS phi2,
              {_r9('l1 - mu')} AS y1, {_r9('l2x - mu')} AS y2
       FROM rr),
{chain}
SELECT series_id, hs.h, {E.round6(f'(CASE hs.h {cases} END) + mu')} AS yhat
FROM h{h} CROSS JOIN (SELECT unnest(range(1, {h + 1})) AS h) hs
ORDER BY series_id, hs.h
"""


_REGISTRY.update(
    {
        "ts_hmm_viterbi": Query(
            "ts_hmm_viterbi", _q_hmm_viterbi, _hmm_sql(), ("tsdb", "iterative")
        ),
        "forecast_ar2": Query(
            "forecast_ar2", _q_forecast_ar2, _ar2_sql(), ("forecast",)
        ),
    }
)
