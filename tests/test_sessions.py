"""Gap-based sessionization (operators/sessions.py)."""

from datetime import datetime

import pytest

from splink_spark.operators.sessions import session_stats, sessionize


def _ts(minute, second=0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user 1: events at 0, 10, 45, 50 min -> gap 35min splits
        (0, _ts(0), 1, 1.0),
        (1, _ts(10), 1, 2.0),
        (2, _ts(45), 1, 4.0),
        (3, _ts(50), 1, 8.0),
        # user 2: single event
        (4, _ts(5), 2, 16.0),
        # exact-gap edge: 30min00s gap is NOT a new session (> not >=)
        (5, _ts(100), 3, 1.0),
        (6, _ts(130), 3, 1.0),
        (7, _ts(160, 1), 3, 1.0),  # 30min01s -> new session
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    s = sessionize(ev, gap_minutes=30.0)
    got = {
        r["event_id"]: r["session_idx"] for r in s.collect()
    }
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 1, 5: 1, 6: 1, 7: 2}

    stats = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(s).collect()
    }
    assert stats[(1, 1)]["n_events"] == 2
    assert stats[(1, 1)]["duration_us"] == 10 * 60 * 1_000_000
    assert stats[(1, 2)]["sum_value"] == pytest.approx(12.0)
    assert stats[(2, 1)]["duration_us"] == 0
