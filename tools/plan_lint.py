"""Registry-wide physical-plan linter — mechanize the per-round scale audit.

Walks every registry query, builds its DataFrame at a small SF (plan
construction only; queries whose builders run driver-side iteration still
execute those inner jobs), and greps the executed-plan string for the
scale anti-patterns the round judges check by hand:

  ERROR  BatchEvalPython        row-at-a-time Python UDF in the plan — the
                                repo's rule is Arrow-only Python
                                (ArrowEvalPython / MapInPandas /
                                FlatMapGroupsInPandas are fine)
  WARN   CartesianProduct       unbounded all-pairs join
  INFO   BroadcastNestedLoopJoin  all-pairs against a BROADCAST side —
                                legitimate when the broadcast side is a
                                bounded query/truth set (recall evals,
                                ≤64-query baselines); every site should be
                                a known, documented one
  WARN   recompute>=4           the SAME base source (one parquet path, or
                                one Range signature) appears 4+ times in a
                                single executed plan — a diamond DAG is
                                re-evaluating its base per branch (the
                                pre-r10 robust_decompose re-scanned its
                                generator ~8x via groupBy+join-backs).
                                2-3 repeats are normal (self-joins,
                                two-pass aggregates); 4+ means the plan
                                re-reads the corpus per derived branch at
                                cluster scale and should be linearized
                                (window aggregates) or checkpointed.

Usage:
    python tools/plan_lint.py [sf_dir] [name-substring ...]

Exit code 1 iff any ERROR (BatchEvalPython) is found; WARN/INFO are
reported for human review (bounded-broadcast truth baselines are the
expected BroadcastNestedLoopJoin population — compare the census against
the list in NEXT.md when it grows).
"""
from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")


def max_base_scan_count(plan: str) -> tuple[int, str]:
    """Max number of times one base source appears in the plan: parquet
    scans keyed by file path, Range scans keyed by their full signature.
    InMemoryTableScan/localCheckpoint reads are intentionally NOT counted —
    a checkpointed base is read, not recomputed."""
    counts: dict[str, int] = {}
    for m in re.finditer(r"file:[^\],]*\.parquet", plan):
        counts[m.group(0)] = counts.get(m.group(0), 0) + 1
    for m in re.finditer(r"Range \([^)]*\)", plan):
        counts[m.group(0)] = counts.get(m.group(0), 0) + 1
    if not counts:
        return 0, ""
    src_, n = max(counts.items(), key=lambda kv: kv[1])
    return n, src_.rsplit("/", 1)[-1]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    filters = args[1:]

    from tsgen.queries import registry
    from tsgen.session import get_spark

    spark = get_spark("plan-lint")
    reg = registry()
    names = [
        n for n in reg
        if not filters or any(f in n for f in filters)
    ]

    errors: list[str] = []
    warns: list[str] = []
    infos: list[str] = []
    recompute: list[str] = []
    broken: list[str] = []
    t0 = time.time()
    for i, name in enumerate(names, 1):
        try:
            df = reg[name].spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, keep linting
            broken.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        if "BatchEvalPython" in plan:
            errors.append(name)
        if "CartesianProduct" in plan:
            warns.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            infos.append(name)
        n_scan, src_key = max_base_scan_count(plan)
        if n_scan >= 4:
            recompute.append(f"{name}({src_key}x{n_scan})")
        if i % 50 == 0:
            print(f"... {i}/{len(names)} ({time.time() - t0:.0f}s)", file=sys.stderr)

    print(f"linted {len(names)} queries in {time.time() - t0:.0f}s")
    print(f"ERROR BatchEvalPython ({len(errors)}): {' '.join(errors) or '-'}")
    print(f"WARN  CartesianProduct ({len(warns)}): {' '.join(warns) or '-'}")
    print(f"INFO  BroadcastNestedLoopJoin ({len(infos)}): {' '.join(infos) or '-'}")
    print(f"WARN  recompute>=4 ({len(recompute)}): {' '.join(recompute) or '-'}")
    if broken:
        print(f"BUILD-FAILED ({len(broken)}):")
        for b in broken:
            print(f"  {b}")
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
