"""Regenerate the registry-count claims in README.md / COVERAGE.md from the
registry itself (VERDICT r04 item 1: hand-maintained counts drift; the
meta-test `test_doc_counts_match_registry` enforces equality, this script
restores it after any registry change).

Usage: python tools/sync_counts.py
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from tsgen.queries import registry  # noqa: E402


def main() -> None:
    r = registry()
    total = len(r)
    oracled = sum(1 for q in r.values() if q.oracle)
    rows_only = total - oracled

    readme = open("README.md").read()
    readme2 = re.sub(
        r"\(\d+ queries: \d+ DuckDB-oracle-(\s*)checked, \d+ rows-only",
        rf"({total} queries: {oracled} DuckDB-oracle-\1checked, {rows_only} rows-only",
        readme,
    )
    if readme2 != readme:
        open("README.md", "w").write(readme2)
        print("README.md updated")

    cov = open("COVERAGE.md").read()
    cov2 = re.sub(
        r"\d+ registry queries — \d+ oracle-checked, \d+(\s*)rows-only",
        rf"{total} registry queries — {oracled} oracle-checked, {rows_only}\1rows-only",
        cov,
    )
    if cov2 != cov:
        open("COVERAGE.md", "w").write(cov2)
        print("COVERAGE.md updated")

    print(f"registry: {total} total, {oracled} oracle-checked, {rows_only} rows-only")


if __name__ == "__main__":
    main()
