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
