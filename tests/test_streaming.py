"""Streaming twins must agree with their batch counterparts on replay."""
from pyspark.sql import functions as F

from tsgen import analytics, streaming

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_equals_batch(spark):
    s = streaming.events_stream(spark, SF)
    got = streaming.run_to_completion(streaming.tumbling_counts(s)).toPandas()

    from tsgen.queries_analytics import _events

    ev = _events(spark, SF)
    want = (
        analytics.tumbling(ev, "ts", "hour", ["event_type"], "value")
        .select(
            F.unix_timestamp("bucket").alias("bucket_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .toPandas()
    )
    key = ["bucket_s", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got[key + ["n_events"]].equals(want[key + ["n_events"]])
    assert (got.sum_value - want.sum_value).abs().max() < 1e-9


def test_stream_session_counts_match_batch_sessionize(spark):
    s = streaming.events_stream(spark, SF)
    got = streaming.run_to_completion(streaming.session_counts(s)).toPandas()

    from tsgen.queries_analytics import _events

    ev = _events(spark, SF)
    sess = analytics.sessionize(ev, "user_id", "ts", 30)
    want = sess.groupBy("user_id", "session_id").count().toPandas()
    assert len(got) == len(want)  # same number of sessions
    assert got.n_events.sum() == want["count"].sum()
