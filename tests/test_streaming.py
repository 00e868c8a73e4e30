"""Batch/stream unification: streaming windowed aggs == batch results."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE
from tracy_matdb_spark.queries import load_all
from tracy_matdb_spark.streaming import windows as S

REGISTRY = load_all()


def _norm(pdf: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    return pdf.sort_values(keys).reset_index(drop=True)


def test_streaming_tumbling_matches_batch(spark):
    ev = S.read_events_stream(spark, SF_SMOKE)
    got = S.run_to_completion(S.tumbling_agg(ev), "t_tumbling").toPandas()
    want = REGISTRY["events_tumbling_1h"].fn(spark, SF_SMOKE).toPandas()
    keys = ["window_start_s", "event_type"]
    pd.testing.assert_frame_equal(_norm(got, keys), _norm(want, keys), check_dtype=False)


def test_streaming_sliding_matches_batch(spark):
    ev = S.read_events_stream(spark, SF_SMOKE)
    got = S.run_to_completion(S.sliding_agg(ev), "t_sliding").toPandas()
    want = (
        REGISTRY["events_sliding_1h_30m"]
        .fn(spark, SF_SMOKE)
        .toPandas()[["window_start_s", "event_type", "n_events"]]
    )
    keys = ["window_start_s", "event_type"]
    pd.testing.assert_frame_equal(_norm(got, keys), _norm(want, keys), check_dtype=False)


def test_streaming_session_matches_batch(spark):
    ev = S.read_events_stream(spark, SF_SMOKE)
    got = S.run_to_completion(S.session_agg(ev), "t_session").toPandas()
    want = (
        REGISTRY["events_session_10m"]
        .fn(spark, SF_SMOKE)
        .toPandas()[["user_id", "session_start_s", "session_end_s", "n_events"]]
    )
    # session_window's end is last-event + gap; the batch query reports the
    # last event itself
    want["session_end_s"] = want["session_end_s"] + 600
    keys = ["user_id", "session_start_s"]
    pd.testing.assert_frame_equal(
        _norm(got[["user_id", "session_start_s", "session_end_s", "n_events"]], keys),
        _norm(want, keys),
        check_dtype=False,
    )
