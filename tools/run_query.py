"""Run or explain any registry query by name.

Usage:
    python tools/run_query.py <name> [sf_dir] [--explain] [--oracle]

    --explain   print the formatted physical plan instead of rows
    --oracle    also run the DuckDB oracle side-by-side
    (no name)   list all registered queries with tags
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}

    from tsgen.queries import registry

    reg = registry()
    if not args:
        for name, q in sorted(reg.items()):
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:32s} [{kind}] {','.join(q.tags)}")
        print(f"\n{len(reg)} queries")
        return

    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in reg:
        sys.exit(f"unknown query {name!r}; run with no args to list")

    from tsgen.session import get_spark

    spark = get_spark("run-query")
    df = reg[name].spark_fn(spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
        return
    df.show(20, truncate=False)
    print(f"rows: {df.count()}")

    if "--oracle" in flags and reg[name].oracle:
        import duckdb

        con = duckdb.connect()
        for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        print("-- oracle --")
        print(con.execute(reg[name].oracle).df().head(20).to_string())


if __name__ == "__main__":
    main()
