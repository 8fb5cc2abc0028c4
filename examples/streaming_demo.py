"""Structured-Streaming tour — the stateful operators run over a REAL
multi-micro-batch replay (4 time-ordered chunks, one per trigger), so
state visibly carries across batch boundaries:

    events ->(replay, 4 chunks)-> tumbling hourly counts
                                -> streaming SCD2 dimension build
                                -> streaming DDSketch value quantiles
                                -> stateful EWMA per user (last emit)

Run: python examples/streaming_demo.py [sf_dir]
"""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from tsgen import sketches, streaming  # noqa: E402
from tsgen.session import get_spark  # noqa: E402

N_CHUNKS = 4


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-demo")
    tmp = tempfile.mkdtemp(prefix="stream_demo_")

    def replay():
        return streaming.replay_chunked(spark, sf_dir, N_CHUNKS, f"{tmp}/chunks")

    tumb = streaming.run_to_completion(streaming.tumbling_counts(replay()))
    print(f"tumbling hourly windows: {tumb.count()} rows; busiest:")
    tumb.orderBy(F.desc("n_events")).show(3, truncate=False)

    scd2 = streaming.run_to_completion(streaming.scd2_stateful(replay()), mode="update")
    print(f"SCD2 closed intervals emitted: {scd2.count()}")
    scd2.orderBy(F.desc("version")).show(3, truncate=False)

    buckets = streaming.run_to_completion(streaming.dd_bucket_stream(replay(), "value"))
    q = sketches.dd_probe_buckets(buckets).select(
        "q", sketches.dd_estimate_col().alias("est")
    )
    print("DDSketch value quantiles from merged micro-batch state:")
    q.orderBy("q").show(truncate=False)

    ewma = streaming.run_to_completion(streaming.ewma_stateful(replay()), mode="update")
    final = ewma.orderBy(F.desc("n_events")).limit(3)
    print("per-user EWMA (state carried across all 4 chunks), top users:")
    final.show(truncate=False)


if __name__ == "__main__":
    main()
