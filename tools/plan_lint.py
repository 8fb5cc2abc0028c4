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

Usage:
    python tools/plan_lint.py [sf_dir] [name-substring ...]

Exit code 1 iff any ERROR (BatchEvalPython) is found; WARN/INFO are
reported for human review (bounded-broadcast truth baselines are the
expected BroadcastNestedLoopJoin population — compare the census against
the list in NEXT.md when it grows).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


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
        if i % 50 == 0:
            print(f"... {i}/{len(names)} ({time.time() - t0:.0f}s)", file=sys.stderr)

    print(f"linted {len(names)} queries in {time.time() - t0:.0f}s")
    print(f"ERROR BatchEvalPython ({len(errors)}): {' '.join(errors) or '-'}")
    print(f"WARN  CartesianProduct ({len(warns)}): {' '.join(warns) or '-'}")
    print(f"INFO  BroadcastNestedLoopJoin ({len(infos)}): {' '.join(infos) or '-'}")
    if broken:
        print(f"BUILD-FAILED ({len(broken)}):")
        for b in broken:
            print(f"  {b}")
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
