"""Streaming slice: bounded (availableNow) runs must agree with the batch
equivalents — the engine's check that event-time semantics are identical
across the batch/streaming boundary."""

from __future__ import annotations

import pandas as pd

from plan_spark.catalog import table
from plan_spark.queries.analytics import sessionize, time_bucket_agg
from plan_spark.streaming.windows import (
    run_available_now,
    session_counts_stream,
    tumbling_counts_stream,
    user_totals_stateful,
)
from tests.conftest import SF_DIR, canon


def test_tumbling_stream_matches_batch(spark):
    got = canon(
        run_available_now(
            tumbling_counts_stream(spark, SF_DIR), "t_tumbling"
        ).toPandas()
    )
    want = canon(
        time_bucket_agg(spark, SF_DIR)
        .select("bucket_start", "event_type", "n")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want)


def test_session_stream_matches_batch(spark):
    got = canon(
        run_available_now(
            session_counts_stream(spark, SF_DIR), "t_sessions"
        ).toPandas()
    )
    want = canon(
        sessionize(spark, SF_DIR)
        .select("user_id", "session_start", "n_events")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want)


def test_stateful_user_totals(spark):
    got = user_totals_stateful(spark, SF_DIR)
    ev = table(spark, SF_DIR, "events")
    import pyspark.sql.functions as F

    want = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    got2 = got[["user_id", "n_events"]].sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got2.astype({"user_id": "int64", "n_events": "int64"}),
        want.astype({"user_id": "int64", "n_events": "int64"}),
    )
