"""Deterministic corpus mixing / stratified sampling (LLM-pipeline mandate:
domain & language reweighting for a pretraining mixture).

A target mixture is expressed as a per-class keep-rate; membership is the
same engine-portable u01(doc_id) predicate as ev_sample — reproducible,
pushdown-friendly, and exactly mirrored in the DuckDB oracle. The summary
reports planned vs achieved mixture per class.

Scale notes: the keep decision is a pure per-row projection (no shuffle);
the summary is one partial-agg'd groupBy on the class key. At 100 TB the
sampled WRITE is the only data-sized cost — the decision itself is free.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import expr as E

MIX_SALT = 4241
# Downsample the dominant language, keep the tail — a DoReMi-flavoured
# static reweighting (per-class constants, not learned).
LANG_RATES = {"en": 0.4, "de": 0.9, "es": 0.9, "fr": 0.9, "zh": 1.0}


def _rate_case(key_col: str, rates: dict[str, float], default: float) -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {E.NUM(v)}" for k, v in sorted(rates.items())
    )
    return f"(CASE {key_col} {whens} ELSE {E.NUM(default)} END)"


def mix_sample(
    df: DataFrame,
    rates: dict[str, float] | None = None,
    key_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: int = MIX_SALT,
) -> DataFrame:
    """Adds a deterministic `keep` flag: u01(id) < rate(class)."""
    rates = LANG_RATES if rates is None else rates
    pred = f"({E.u01(id_col, salt)} < {_rate_case(key_col, rates, default_rate)})"
    return df.withColumn("keep", F.expr(pred))


def mixture_summary(
    df: DataFrame,
    rates: dict[str, float] | None = None,
    key_col: str = "lang",
    token_col: str = "n_chars",
) -> DataFrame:
    """Planned vs achieved mixture per class: doc keep-rate and the share
    of the KEPT corpus (by docs and by `token_col` weight) each class ends
    up with."""
    from pyspark.sql import Window

    rates = LANG_RATES if rates is None else rates
    s = mix_sample(df, rates, key_col)
    g = s.groupBy(key_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col(token_col)).otherwise(0)).alias("kept_chars"),
    )
    # totals over the tiny per-class table (|classes| rows) — the
    # unpartitioned window is safe here
    w = Window.partitionBy()
    return g.select(
        key_col,
        "n_docs",
        "n_kept",
        (F.col("n_kept") / F.col("n_docs")).alias("keep_rate"),
        (F.col("n_kept") / F.sum("n_kept").over(w)).alias("doc_share"),
        (F.col("kept_chars") / F.sum("kept_chars").over(w)).alias("char_share"),
    )


def mixture_summary_sql(
    rates: dict[str, float] | None = None,
    key_col: str = "lang",
    token_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: int = MIX_SALT,
    default_rate: float = 1.0,
) -> str:
    rates = LANG_RATES if rates is None else rates
    pred = f"({E.u01(id_col, salt)} < {_rate_case(key_col, rates, default_rate)})"
    return f"""
WITH s AS (SELECT *, {pred} AS keep FROM documents),
g AS (
  SELECT {key_col}, count(*) AS n_docs,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN keep THEN {token_col} ELSE 0 END) AS BIGINT) AS kept_chars
  FROM s GROUP BY {key_col})
SELECT {key_col}, n_docs, n_kept,
       (round((CAST(n_kept AS DOUBLE) / n_docs) + 1.0e-9,6)+0.0e0) AS keep_rate,
       (round((CAST(n_kept AS DOUBLE) / sum(n_kept) OVER ()) + 1.0e-9,6)+0.0e0) AS doc_share,
       (round((CAST(kept_chars AS DOUBLE) / sum(kept_chars) OVER ()) + 1.0e-9,6)+0.0e0) AS char_share
FROM g
"""


# --- language rebalancing (downsample to uniform) ----------------------------
REBAL_SALT = 61357


def lang_rebalance(docs: DataFrame) -> DataFrame:
    """Downsample the corpus to a uniform language mixture: every language
    keeps (expected) n_min docs — keep_prob_l = n_min / n_l, membership
    decided by the portable per-doc LCG so the realized sample is
    reproducible across runs, engines, and cluster sizes (the property
    rand() sampling lacks). Emits per language: before/after counts and
    shares plus the keep probability — the rebalancing audit row.

    Scale shape: one count groupBy; the keep-prob table (n_langs rows)
    broadcasts back onto a pure projection filter; one more count
    groupBy for the realized side."""
    from . import expr as E
    from .queries import round6

    # n_langs-row table read by four scalar branches: pin it, or each
    # branch re-runs the corpus count scan (plan-lint recompute census)
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs")).localCheckpoint(eager=False)
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    tot = counts.agg(F.sum("n_docs").alias("n_tot"))
    probs = (
        counts.crossJoin(F.broadcast(n_min))
        .withColumn(
            "keep_prob", F.col("n_min").cast("double") / F.col("n_docs")
        )
        .select("lang", "n_docs", "keep_prob")
    )
    kept = (
        docs.join(F.broadcast(probs.select("lang", "keep_prob")), "lang")
        .filter(F.expr(E.u01("doc_id", REBAL_SALT)) < F.col("keep_prob"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
        .localCheckpoint(eager=False)  # n_langs rows, read twice (kt + join)
    )
    kt = kept.agg(F.sum("n_kept").alias("k_tot"))
    out = (
        probs.join(kept, "lang", "left")
        .withColumn("n_kept", F.coalesce(F.col("n_kept"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(kt))
        .select(
            "lang",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("n_tot")).alias("share_before"),
            "keep_prob",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("k_tot")).alias("share_after"),
        )
    )
    return round6(out, "share_before", "keep_prob", "share_after")


def lang_rebalance_sql() -> str:
    from . import expr as E

    u = E.u01("doc_id", REBAL_SALT)
    return f"""
WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
nmin AS (SELECT min(n_docs) AS n_min FROM counts),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_tot FROM counts),
probs AS (
  SELECT lang, n_docs, CAST(n_min AS DOUBLE) / n_docs AS keep_prob
  FROM counts CROSS JOIN nmin),
kept AS (
  SELECT d.lang, count(*) AS n_kept
  FROM documents d JOIN probs p ON p.lang = d.lang
  WHERE {u} < p.keep_prob
  GROUP BY d.lang),
kt AS (SELECT CAST(sum(n_kept) AS BIGINT) AS k_tot FROM kept)
SELECT p.lang, p.n_docs,
       (round(CAST(p.n_docs AS DOUBLE) / tot.n_tot + 1.0e-9, 6) + 0.0e0)
         AS share_before,
       (round(p.keep_prob + 1.0e-9, 6) + 0.0e0) AS keep_prob,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       (round(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / kt.k_tot + 1.0e-9, 6) + 0.0e0)
         AS share_after
FROM probs p LEFT JOIN kept k ON k.lang = p.lang
CROSS JOIN tot CROSS JOIN kt
"""


# --- temperature-based language mixing (downsample-only realization) ---------
TEMP_ALPHA = 0.3
TEMP_SALT = 90749


def lang_temperature_mix(docs: DataFrame, alpha: float = TEMP_ALPHA) -> DataFrame:
    """Temperature sampling over languages (Conneau & Lample, NeurIPS 2019
    §3.1; the mixture rule behind XLM/mT5 multilingual pretraining):
    target share q_l ∝ p_l^alpha with alpha<1, upweighting low-resource
    languages relative to their corpus share p_l. Realized by DOWNSAMPLING
    only (no replication): keep_prob_l = c·q_l/p_l with c = min_l p_l/q_l,
    so the most-upweighted language keeps everything and every other
    language keeps the exact ratio that lands the corpus on the
    temperature mixture. Membership is decided by the portable per-doc
    LCG (as lang_rebalance), so the realized sample is reproducible
    across runs, engines, and cluster sizes.

    keep_prob is rounded to 9dp (+1e-12 nudge) BEFORE the u01 comparison
    in both engines — pow() may differ by 1 ulp between libm and
    java.lang.Math, and the filter boundary must be the same number on
    both sides. Scale shape: two count groupBys and a broadcast of the
    n_langs-row prob table onto a projection filter — no corpus shuffle.
    → (lang, n_docs, share_before, target_share, keep_prob, n_kept,
    share_after)."""
    from . import expr as E
    from .queries import round6

    # n_langs-row table fanned out to the p/w/q/ratio/c scalar chain: pin
    # it, or every crossJoin branch re-runs the corpus count scan (the
    # recompute census measured 26 documents scans in this one plan)
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs")).localCheckpoint(eager=False)
    tot = counts.agg(F.sum("n_docs").alias("n_tot"))
    t = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("p", F.col("n_docs").cast("double") / F.col("n_tot"))
        .withColumn("w", F.pow(F.col("p"), F.lit(float(alpha))))
    )
    z = t.agg(F.sum("w").alias("z"))
    t = (
        t.crossJoin(F.broadcast(z))
        .withColumn("q", F.col("w") / F.col("z"))
        .withColumn("ratio", F.col("q") / F.col("p"))
    )
    c = t.agg(F.min(F.lit(1.0) / F.col("ratio")).alias("c"))
    probs = t.crossJoin(F.broadcast(c)).withColumn(
        "keep_prob", F.round(F.col("c") * F.col("ratio") + F.lit(1e-12), 9)
    )
    kept = (
        docs.join(F.broadcast(probs.select("lang", "keep_prob")), "lang")
        .filter(F.expr(E.u01("doc_id", TEMP_SALT)) < F.col("keep_prob"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
        .localCheckpoint(eager=False)  # n_langs rows, read twice (kt + join)
    )
    kt = kept.agg(F.sum("n_kept").alias("k_tot"))
    out = (
        probs.join(kept, "lang", "left")
        .withColumn("n_kept", F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint"))
        .crossJoin(F.broadcast(kt))
        .select(
            "lang",
            "n_docs",
            F.col("p").alias("share_before"),
            F.col("q").alias("target_share"),
            "keep_prob",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("k_tot")).alias("share_after"),
        )
    )
    return round6(
        out, "share_before", "target_share", "keep_prob", "share_after"
    ).orderBy("lang")


def lang_temperature_sql(alpha: float = TEMP_ALPHA) -> str:
    from . import expr as E

    u = E.u01("doc_id", TEMP_SALT)
    a = E.NUM(alpha)
    return f"""
WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_tot FROM counts),
t AS (
  SELECT lang, n_docs,
         CAST(n_docs AS DOUBLE) / tot.n_tot AS p,
         pow(CAST(n_docs AS DOUBLE) / tot.n_tot, {a}) AS w
  FROM counts CROSS JOIN tot),
z AS (SELECT sum(w) AS z FROM t),
t2 AS (SELECT lang, n_docs, p, (w / z.z) AS q, (w / z.z) / p AS ratio
       FROM t CROSS JOIN z),
c AS (SELECT min(1.0e0 / ratio) AS c FROM t2),
probs AS (
  SELECT lang, n_docs, p, q,
         round(c.c * ratio + 1.0e-12, 9) AS keep_prob
  FROM t2 CROSS JOIN c),
kept AS (
  SELECT d.lang, count(*) AS n_kept
  FROM documents d JOIN probs pr ON pr.lang = d.lang
  WHERE {u} < pr.keep_prob
  GROUP BY d.lang),
kt AS (SELECT CAST(sum(n_kept) AS BIGINT) AS k_tot FROM kept)
SELECT pr.lang, pr.n_docs,
       (round(pr.p + 1.0e-9, 6) + 0.0e0) AS share_before,
       (round(pr.q + 1.0e-9, 6) + 0.0e0) AS target_share,
       (round(pr.keep_prob + 1.0e-9, 6) + 0.0e0) AS keep_prob,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       (round(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / kt.k_tot + 1.0e-9, 6) + 0.0e0)
         AS share_after
FROM probs pr LEFT JOIN kept k ON k.lang = pr.lang
CROSS JOIN kt ORDER BY pr.lang
"""


DOREMI_ETA, DOREMI_ITERS, DOREMI_SMOOTH = 0.5, 5, 0.1


def doremi_weights(
    docs: DataFrame,
    eta: float = DOREMI_ETA,
    iters: int = DOREMI_ITERS,
    smooth: float = DOREMI_SMOOTH,
) -> DataFrame:
    """DoReMi-lite domain reweighting (Xie et al., NeurIPS 2023 "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    Group-DRO multiplicative weights over per-domain excess losses with
    uniform smoothing, returning the TRAJECTORY AVERAGE of the weight
    iterates (the paper's output rule). This closed-form variant uses a
    static per-domain proxy excess loss — mean chars per token, a
    deterministic compressibility stand-in for the proxy-model excess
    loss (in production that signal comes from a model scoring pass and
    plugs into the same iteration) — so the whole run is reproducible
    and oracle-checkable.

    alpha^0 = domain token share (the reference weights); each step does
    alpha <- (1-c) * normalize(alpha * exp(eta * excess)) + c/k.

    Scale shape: ONE corpus groupBy(source) computing exact-integer
    (tokens, chars) partials; the T-step iteration is chained projections
    + single-partition window sums on the k-domain table (k rows, never
    the corpus). No joins, no collect, no Python UDFs.
    → (source, n_docs, toks, share_ref, excess, weight_doremi)."""
    from pyspark.sql import Window

    from .queries import round6

    w_all = Window.partitionBy()
    toks_expr = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + F.lit(1)
    )
    t = (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(toks_expr).alias("toks"),
            F.sum(F.length("text")).alias("chars"),
        )
        .withColumn(
            "share_ref", F.col("toks").cast("double") / F.sum("toks").over(w_all)
        )
        .withColumn("excess", F.col("chars").cast("double") / F.col("toks"))
        .withColumn("k", F.count("*").over(w_all))
        .withColumn("alpha", F.col("share_ref"))
        .withColumn("acc", F.lit(0.0))
    )
    for _ in range(iters):
        t = (
            t.withColumn(
                "raw", F.col("alpha") * F.exp(F.lit(float(eta)) * F.col("excess"))
            )
            .withColumn(
                "alpha",
                F.lit(1.0 - smooth) * (F.col("raw") / F.sum("raw").over(w_all))
                + F.lit(float(smooth)) / F.col("k"),
            )
            .withColumn("acc", F.col("acc") + F.col("alpha"))
        )
    out = t.select(
        "source",
        "n_docs",
        "toks",
        "share_ref",
        "excess",
        (F.col("acc") / F.lit(float(iters))).alias("weight_doremi"),
    )
    return round6(out, "share_ref", "excess", "weight_doremi").orderBy("source")


def doremi_sql(
    eta: float = DOREMI_ETA,
    iters: int = DOREMI_ITERS,
    smooth: float = DOREMI_SMOOTH,
) -> str:
    """DuckDB oracle twin of doremi_weights: the fixed iteration count is
    UNROLLED into a CTE chain (itN), each step one window-normalized
    multiplicative update — double arithmetic end-to-end (E-notation
    literals), same 6dp protocol as the Spark side."""
    e, om, sm = E.NUM(eta), E.NUM(1.0 - smooth), E.NUM(smooth)
    parts = [
        """
WITH s AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS toks,
         CAST(sum(length(text)) AS BIGINT) AS chars
  FROM documents GROUP BY source),
it0 AS (
  SELECT source, n_docs, toks,
         CAST(toks AS DOUBLE) / (SUM(toks) OVER ()) AS share_ref,
         CAST(chars AS DOUBLE) / toks AS excess,
         COUNT(*) OVER () AS k,
         CAST(toks AS DOUBLE) / (SUM(toks) OVER ()) AS alpha,
         0.0e0 AS acc
  FROM s)"""
    ]
    prev = "it0"
    for t in range(1, iters + 1):
        parts.append(
            f""",
u{t} AS (
  SELECT source, n_docs, toks, share_ref, excess, k, acc,
         alpha * exp({e} * excess) AS raw
  FROM {prev}),
it{t} AS (
  SELECT source, n_docs, toks, share_ref, excess, k,
         acc + {om} * raw / (SUM(raw) OVER ()) + {sm} / k AS acc,
         {om} * raw / (SUM(raw) OVER ()) + {sm} / k AS alpha
  FROM u{t})"""
        )
        prev = f"it{t}"
    parts.append(
        f"""
SELECT source, n_docs, toks,
       (round(share_ref + 1.0e-9, 6) + 0.0e0) AS share_ref,
       (round(excess + 1.0e-9, 6) + 0.0e0) AS excess,
       (round(acc / {E.NUM(float(iters))} + 1.0e-9, 6) + 0.0e0) AS weight_doremi
FROM {prev} ORDER BY source"""
    )
    return "".join(parts)
