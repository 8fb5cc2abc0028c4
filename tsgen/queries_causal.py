"""Statistical diagnostics over event streams (north-star analytics
extension):

- ts_granger: pairwise Granger-causality F-test between hourly event-type
  series — does type X's previous hour help predict type Y's current hour
  beyond Y's own history? Restricted model y_t ~ y_{t-1} vs unrestricted
  y_t ~ y_{t-1} + x_{t-1}, both with intercept (fitted equivalently on
  centered moments via covariance identities — one aggregation, no
  two-pass demeaning), F = (RSS_r - RSS_u) / (RSS_u / (n - 3)).
- ev_benford: Benford's-law first-digit test on event values — the
  data-quality / fraud screen. First digits are extracted via integer
  string rendering (engine-portable; no log10 boundary risk), expected
  frequencies are log10(1 + 1/d), and each digit row carries its
  chi-square contribution.

Scale notes (100 TB):
- ts_granger: raw events collapse FIRST to the (hour x type) aggregate
  (one partial-agged shuffle); the lag alignment is an equi-join on the
  tiny hourly table and the OLS solve is one groupBy over ordered type
  pairs — never touches raw scale.
- ev_benford: pure projection + 9-row partial-agged groupBy; the digit
  extraction is integer/string arithmetic, pushdown-friendly.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries import _REGISTRY, Query, roundn
from .queries_analytics import _events

BENFORD_SCALE = 1000


# --- Granger causality -----------------------------------------------------
def granger_pairs(ev: DataFrame) -> DataFrame:
    """All ordered event-type pairs (x -> y): hourly avg series, one-hour
    lag alignment by bucket arithmetic, OLS via centered second moments
    (covariance identities), F-statistic for H0 "x does not Granger-cause
    y"."""
    hourly = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("b_s"),
        "event_type",
    ).agg(F.avg("value").alias("v"))
    y = hourly.select(
        F.col("event_type").alias("y_type"), "b_s", F.col("v").alias("yv")
    )
    yl = hourly.select(
        F.col("event_type").alias("y_type"),
        (F.col("b_s") + 3600).alias("b_s"),
        F.col("v").alias("ylv"),
    )
    xl = hourly.select(
        F.col("event_type").alias("x_type"),
        (F.col("b_s") + 3600).alias("b_s"),
        F.col("v").alias("xlv"),
    )
    reg = (
        y.join(yl, ["y_type", "b_s"])
        .join(xl, "b_s")
        .filter(F.col("x_type") != F.col("y_type"))
    )
    n = F.count("*")
    agg = reg.groupBy("y_type", "x_type").agg(
        n.alias("n"),
        F.sum("yv").alias("sy"),
        F.sum("ylv").alias("s1"),
        F.sum("xlv").alias("s2"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
        F.sum(F.col("yv") * F.col("ylv")).alias("sy1"),
        F.sum(F.col("yv") * F.col("xlv")).alias("sy2"),
        F.sum(F.col("ylv") * F.col("ylv")).alias("s11"),
        F.sum(F.col("xlv") * F.col("xlv")).alias("s22"),
        F.sum(F.col("ylv") * F.col("xlv")).alias("s12"),
    )
    nn = F.col("n").cast("double")
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / nn
    cy1 = F.col("sy1") - F.col("sy") * F.col("s1") / nn
    cy2 = F.col("sy2") - F.col("sy") * F.col("s2") / nn
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / nn
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / nn
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / nn
    det = c11 * c22 - c12 * c12
    b_u = (cy1 * c22 - cy2 * c12) / det
    c_u = (c11 * cy2 - c12 * cy1) / det
    rss_u = cyy - b_u * cy1 - c_u * cy2
    rss_r = cyy - (cy1 / c11) * cy1
    fstat = (rss_r - rss_u) / (rss_u / (nn - 3.0))
    return agg.select(
        "y_type",
        "x_type",
        "n",
        b_u.alias("beta_ylag"),
        c_u.alias("beta_xlag"),
        fstat.alias("f_stat"),
    )


def _q_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundn(
        granger_pairs(_events(spark, sf_dir)), 4, "beta_ylag", "beta_xlag", "f_stat"
    )


_GRANGER_SQL = """
WITH hourly AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS b_s,
         event_type, avg(value) AS v
  FROM events GROUP BY 1, 2),
reg AS (
  SELECT y.event_type AS y_type, x.event_type AS x_type,
         y.v AS yv, yl.v AS ylv, x.v AS xlv
  FROM hourly y
  JOIN hourly yl ON yl.event_type = y.event_type AND yl.b_s = y.b_s - 3600
  JOIN hourly x ON x.b_s = y.b_s - 3600 AND x.event_type <> y.event_type),
agg AS (
  SELECT y_type, x_type, count(*) AS n,
         sum(yv) AS sy, sum(ylv) AS s1, sum(xlv) AS s2,
         sum(yv * yv) AS syy, sum(yv * ylv) AS sy1, sum(yv * xlv) AS sy2,
         sum(ylv * ylv) AS s11, sum(xlv * xlv) AS s22,
         sum(ylv * xlv) AS s12
  FROM reg GROUP BY y_type, x_type),
m AS (
  SELECT y_type, x_type, n,
         syy - sy * sy / CAST(n AS DOUBLE) AS cyy,
         sy1 - sy * s1 / CAST(n AS DOUBLE) AS cy1,
         sy2 - sy * s2 / CAST(n AS DOUBLE) AS cy2,
         s11 - s1 * s1 / CAST(n AS DOUBLE) AS c11,
         s22 - s2 * s2 / CAST(n AS DOUBLE) AS c22,
         s12 - s1 * s2 / CAST(n AS DOUBLE) AS c12
  FROM agg),
fit AS (
  SELECT y_type, x_type, n, cyy, cy1, cy2, c11,
         (cy1 * c22 - cy2 * c12) / (c11 * c22 - c12 * c12) AS b_u,
         (c11 * cy2 - c12 * cy1) / (c11 * c22 - c12 * c12) AS c_u
  FROM m)
SELECT y_type, x_type, n,
  (round(b_u + 1.0e-9, 4) + 0.0e0) AS beta_ylag,
  (round(c_u + 1.0e-9, 4) + 0.0e0) AS beta_xlag,
  (round(((cyy - (cy1 / c11) * cy1) - (cyy - b_u * cy1 - c_u * cy2))
         / ((cyy - b_u * cy1 - c_u * cy2) / (CAST(n AS DOUBLE) - 3.0e0))
         + 1.0e-9, 4) + 0.0e0) AS f_stat
FROM fit
"""


# --- Benford first-digit test ---------------------------------------------
def benford(ev: DataFrame, scale: int = BENFORD_SCALE) -> DataFrame:
    """First-digit distribution of |value| (scaled to an integer so digit
    extraction is exact string arithmetic on both engines) vs the Benford
    expectation log10(1 + 1/d), with per-digit chi-square contributions."""
    i = F.abs(F.floor(F.col("value") * scale)).cast("bigint")
    d = ev.select(i.alias("i")).filter(F.col("i") > 0)
    digit = F.substring(F.col("i").cast("string"), 1, 1).cast("bigint")
    obs = d.groupBy(digit.alias("digit")).agg(F.count("*").alias("n_obs"))
    tot = d.agg(F.count("*").alias("n_tot"))
    out = obs.crossJoin(F.broadcast(tot))
    expected = F.col("n_tot") * (
        F.log(1.0 + 1.0 / F.col("digit").cast("double")) / F.log(F.lit(10.0))
    )
    chi = (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected
    return out.select(
        "digit",
        "n_obs",
        expected.alias("n_exp"),
        chi.alias("chi2_term"),
    )


def _q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundn(benford(_events(spark, sf_dir)), 4, "n_exp", "chi2_term")


_BENFORD_SQL = f"""
WITH d AS (
  SELECT CAST(abs(floor(value * {BENFORD_SCALE})) AS BIGINT) AS i
  FROM events
  WHERE CAST(abs(floor(value * {BENFORD_SCALE})) AS BIGINT) > 0),
obs AS (
  SELECT CAST(substr(CAST(i AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         count(*) AS n_obs
  FROM d GROUP BY 1),
tot AS (SELECT count(*) AS n_tot FROM d)
SELECT digit, n_obs,
  (round(n_tot * (ln(1.0e0 + 1.0e0 / CAST(digit AS DOUBLE)) / ln(1.0e1))
         + 1.0e-9, 4) + 0.0e0) AS n_exp,
  (round((n_obs - n_tot * (ln(1.0e0 + 1.0e0 / CAST(digit AS DOUBLE)) / ln(1.0e1)))
         * (n_obs - n_tot * (ln(1.0e0 + 1.0e0 / CAST(digit AS DOUBLE)) / ln(1.0e1)))
         / (n_tot * (ln(1.0e0 + 1.0e0 / CAST(digit AS DOUBLE)) / ln(1.0e1)))
         + 1.0e-9, 4) + 0.0e0) AS chi2_term
FROM obs CROSS JOIN tot
"""


# --- difference-in-differences -----------------------------------------------
def did_readout(ev: DataFrame) -> DataFrame:
    """Difference-in-differences estimator over the event stream: treatment
    assignment is the deterministic hash split (ab_experiment's LCG),
    pre/post periods split at the observed time midpoint (INTEGER
    microsecond midpoint — epoch micros exceed 2^53, so a float midpoint
    would misclassify boundary rows differently per engine). DiD = (T_post − T_pre) −
    (C_post − C_pre) on mean value, with the standard 4-cell SE
    sqrt(Σ var_g/n_g) and t-statistic. Two aggregations: the 2-row span
    agg broadcast back, then one partial-agged 4-cell groupBy."""
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    )
    e = ev.crossJoin(F.broadcast(span)).select(
        (((F.col("user_id") * 2654435761) % 2147483647) % 2).alias("treated"),
        (F.unix_micros("ts") >= F.expr("(lo + hi) DIV 2")).cast("int").alias("post"),
        "value",
    )
    cells = e.groupBy("treated", "post").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )

    def cell(t, p, col):
        return F.max(F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col)))

    out = cells.agg(
        cell(1, 0, "m").alias("t_pre"),
        cell(1, 1, "m").alias("t_post"),
        cell(0, 0, "m").alias("c_pre"),
        cell(0, 1, "m").alias("c_post"),
        F.sum(F.col("v") / F.col("n")).alias("_var_sum"),
        F.sum("n").alias("n_obs"),
    )
    did = (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))
    return out.select(
        "n_obs", "t_pre", "t_post", "c_pre", "c_post",
        did.alias("did"),
        (did / F.sqrt(F.col("_var_sum"))).alias("t_stat"),
    )


def _q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundn(
        did_readout(_events(spark, sf_dir)), 4,
        "t_pre", "t_post", "c_pre", "c_post", "did", "t_stat",
    )


_DID_SQL = """
WITH span AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
e AS (
  SELECT ((user_id * 2654435761) % 2147483647) % 2 AS treated,
         CAST(epoch_us(ts) >= (span.lo + span.hi) // 2 AS INT) AS post,
         value
  FROM events CROSS JOIN span),
cells AS (
  SELECT treated, post, count(*) AS n, avg(value) AS m, var_samp(value) AS v
  FROM e GROUP BY treated, post),
agg AS (
  SELECT max(CASE WHEN treated = 1 AND post = 0 THEN m END) AS t_pre,
         max(CASE WHEN treated = 1 AND post = 1 THEN m END) AS t_post,
         max(CASE WHEN treated = 0 AND post = 0 THEN m END) AS c_pre,
         max(CASE WHEN treated = 0 AND post = 1 THEN m END) AS c_post,
         sum(v / n) AS var_sum,
         CAST(sum(n) AS BIGINT) AS n_obs
  FROM cells)
SELECT n_obs,
       (round((t_pre) + 1.0e-9,4)+0.0e0) AS t_pre,
       (round((t_post) + 1.0e-9,4)+0.0e0) AS t_post,
       (round((c_pre) + 1.0e-9,4)+0.0e0) AS c_pre,
       (round((c_post) + 1.0e-9,4)+0.0e0) AS c_post,
       (round(((t_post - t_pre) - (c_post - c_pre)) + 1.0e-9,4)+0.0e0) AS did,
       (round((((t_post - t_pre) - (c_post - c_pre)) / sqrt(var_sum)) + 1.0e-9,4)+0.0e0) AS t_stat
FROM agg
"""


_REGISTRY.update(
    {
        "ts_granger": Query("ts_granger", _q_granger, _GRANGER_SQL, ("analytics",)),
        "ev_benford": Query("ev_benford", _q_benford, _BENFORD_SQL, ("analytics",)),
        "ev_did": Query("ev_did", _q_did, _DID_SQL, ("analytics",)),
    }
)


# --- CUPED variance reduction ----------------------------------------------
CUPED_CUT = "2024-01-15 00:00:00"


def cuped_readout(ev: DataFrame, cutoff: str = CUPED_CUT) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13):
    each user's post-period metric Y is adjusted by their PRE-period
    metric X — Y' = Y - theta*(X - mean(X)) with theta = cov(X,Y)/var(X)
    — which strips the between-user variance the experiment can never
    randomize away. Emits per-arm means/variances before and after
    adjustment plus the realized variance-reduction fraction; the means
    are unchanged by construction (E[X] cancels), which the oracle
    certifies along with the numbers.

    Scale shape: one groupBy(user) to per-user (X, Y); theta is ONE
    4-number aggregate over that table, rounded to 6dp and broadcast back
    (the rounded-recursion-input rule — both engines adjust with the
    identical theta double); per-arm stats are one more partial-agged
    groupBy. Nothing data-sized crosses the wire."""
    cut = F.lit(cutoff).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias("x"),
        F.sum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)).alias("y"),
    )
    mom = per_user.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
    ).select(
        (
            F.round(
                (F.col("mxy") - F.col("mx") * F.col("my"))
                / (F.col("mxx") - F.col("mx") * F.col("mx"))
                + F.lit(1e-9),
                6,
            )
            + F.lit(0.0)
        ).alias("theta"),
        (F.round(F.col("mx") + F.lit(1e-9), 6) + F.lit(0.0)).alias("m_pre"),
    )
    adj = per_user.crossJoin(F.broadcast(mom)).withColumn(
        "y_adj", F.col("y") - F.col("theta") * (F.col("x") - F.col("m_pre"))
    )
    out = (
        adj.withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.avg("y").alias("mean_y"),
            F.avg("y_adj").alias("mean_y_adj"),
            (F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias("var_y"),
            (
                F.avg(F.col("y_adj") * F.col("y_adj"))
                - F.avg("y_adj") * F.avg("y_adj")
            ).alias("var_y_adj"),
            F.first("theta").alias("theta"),
        )
        .withColumn(
            "var_reduction", F.lit(1.0) - F.col("var_y_adj") / F.col("var_y")
        )
    )
    out = roundn(out, 4, "mean_y", "mean_y_adj")
    out = roundn(out, 2, "var_y", "var_y_adj")
    return roundn(out, 6, "var_reduction")


def _q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cuped_readout(_events(spark, sf_dir))


def _cuped_sql(cutoff: str = CUPED_CUT) -> str:
    return f"""
WITH per_user AS MATERIALIZED (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '{cutoff}' THEN value ELSE 0.0e0 END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '{cutoff}' THEN value ELSE 0.0e0 END) AS y
  FROM events GROUP BY user_id),
mom AS (
  SELECT (round((avg(x * y) - avg(x) * avg(y))
                / (avg(x * x) - avg(x) * avg(x)) + 1.0e-9, 6) + 0.0e0) AS theta,
         (round(avg(x) + 1.0e-9, 6) + 0.0e0) AS m_pre
  FROM per_user),
adj AS (
  SELECT user_id % 2 AS arm, y,
         y - theta * (x - m_pre) AS y_adj, theta
  FROM per_user CROSS JOIN mom)
SELECT arm, count(*) AS n_users,
       (round(avg(y) + 1.0e-9, 4) + 0.0e0) AS mean_y,
       (round(avg(y_adj) + 1.0e-9, 4) + 0.0e0) AS mean_y_adj,
       (round(avg(y * y) - avg(y) * avg(y) + 1.0e-9, 2) + 0.0e0) AS var_y,
       (round(avg(y_adj * y_adj) - avg(y_adj) * avg(y_adj) + 1.0e-9, 2) + 0.0e0)
         AS var_y_adj,
       any_value(theta) AS theta,
       (round(1.0e0 - (avg(y_adj * y_adj) - avg(y_adj) * avg(y_adj))
                    / (avg(y * y) - avg(y) * avg(y)) + 1.0e-9, 6) + 0.0e0)
         AS var_reduction
FROM adj GROUP BY arm
"""


_REGISTRY.update(
    {
        "ev_cuped": Query("ev_cuped", _q_cuped, _cuped_sql(), ("causal",)),
    }
)
