"""Isolated per-query measurement for the optimization rounds.

Runs the named registry queries with the noop sink (guide §1.4), min-of-N
reps (default 3), one Spark session, jobs labeled per query (guide §1.5).
Optionally dumps `.explain("formatted")` per query to a directory.

Usage:
    python tools/opt_bench.py q1 [q2 ...] [--sf=/root/testdata/sf0.1]
        [--reps=3] [--explain-dir=plans/r13] [--suffix=before]

Prints one JSON line {name: seconds_min, ...} at the end.
"""
from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    sf_dir = opts.get("sf", "/root/testdata/sf0.1")
    reps = int(opts.get("reps", "3"))
    explain_dir = opts.get("explain-dir")
    suffix = opts.get("suffix", "before")

    from tsgen.queries import registry
    from tsgen.session import get_spark

    reg = registry()
    unknown = [n for n in names if n not in reg]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("opt-bench")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: executor threads + codegen + python workers (bench.py idiom)
    from tsgen import decompose, generators

    force(generators.generate(spark, 64, 64, "sine"))
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    force(decompose.decompose(generators.generate(spark, 64, 64, "sine")))

    timings: dict[str, float] = {}
    for name in names:
        q = reg[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = q.spark_fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        best = float("inf")
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"opt-bench: {name}")
            t0 = time.time()
            force(q.spark_fn(spark, sf_dir))
            best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"## {name}: {timings[name]}s", flush=True)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
