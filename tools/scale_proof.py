"""Empirical scale spot-proof for the two priciest frontier plans.

Claim under test (PLANS.md): for `minhash_band_frontier` and
`dedup_substr_hash` the dominant cost is verification LINEAR in the
candidate set — so a corpus k times larger with k times the candidate
pairs should run ~k times longer (± AQE/fixed-overhead noise), NOT k^2.

Method: time both queries at sf0.1, then again on a synthetic k-times
corpus built as a union of k DISJOINT-content copies — copy j Caesar-
shifts every ASCII letter by j, which preserves each copy's internal
duplicate/shingle structure exactly (lengths, repeats, near-dup pairs)
while making cross-copy shingles disjoint, so the candidate set scales
by exactly k and cross-copy candidate pairs are zero. A same-text union
would instead make every cross-copy pair a duplicate (k^2 candidates)
and prove nothing about linearity.

Usage:
    python tools/scale_proof.py [k] [reps]     # defaults k=4, reps=2

Prints one JSON line with base/scaled timings and the ratio per query;
paste the ratios into PLANS.md.
"""
from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tsgen.session import get_spark  # noqa: E402

QUERIES = ["minhash_band_frontier", "dedup_substr_hash", "multimodal_decode_jpeg"]


def _shift(s: str, j: int) -> str:
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    return s.translate(
        str.maketrans(
            lo + up, lo[j:] + lo[:j] + up[j:] + up[:j]
        )
    )


def build_scaled(spark, sf_dir: str, out_dir: str, k: int) -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    cols = docs.columns
    parts = []
    shift = F.udf(_shift, "string")  # one-off corpus build, not a hot path
    for j in range(k):
        d = docs.withColumn("doc_id", (F.col("doc_id") + F.lit(j * n)).cast("long"))
        if j:
            d = d.withColumn("text", shift("text", F.lit(j)))
        parts.append(d.select(cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def time_query(spark, name: str, sf_dir: str, reps: int) -> float:
    from tsgen.queries import registry

    q = registry()[name]
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    if not 1 <= k <= 26:
        # Caesar shift wraps at 26: copy j=26 would be content-identical to
        # copy 0, reintroducing the quadratic cross-copy candidates this
        # tool exists to avoid (ADVICE r12)
        raise SystemExit(f"k={k} out of range: need 1 <= k <= 26 (Caesar wrap)")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/tsgen_scale_proof_{k}x"
    spark = get_spark("tsgen-scale-proof")
    build_scaled(spark, sf_dir, out_dir, k)
    # scaled dir only holds documents; both target queries read only it
    result: dict = {"k": k, "reps": reps, "sf_dir": sf_dir, "queries": {}}
    for name in QUERIES:
        base = time_query(spark, name, sf_dir, reps)
        scaled = time_query(spark, name, out_dir, reps)
        result["queries"][name] = {
            "base_s": base,
            "scaled_s": scaled,
            "ratio": round(scaled / base, 2),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
