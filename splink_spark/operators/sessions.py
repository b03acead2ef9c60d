"""Gap-based event sessionization + per-session aggregation.

Not a reference operator — splink is batch record linkage — but a core
large-scale training-data-pipeline op (SURVEY §2.3 window-function
category; the `events` fixture table exists for exactly this): group a
user's event stream into sessions separated by inactivity gaps, then
aggregate per session.

Spark-first plan: ONE shuffle on the user key; the session boundary is
a lag-compare and the session index a running sum over the same window
spec, so both window functions share a single sort within each
partition. Time arithmetic stays in integer microseconds
(``unix_micros`` / DuckDB ``epoch_us``) — no float timestamps on any
comparison surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tie_break: str | None = "event_id",
) -> DataFrame:
    """Append ``session_idx`` (1-based per user): a new session starts
    at the first event and whenever the gap to the previous event
    exceeds ``gap_minutes``."""
    order = [F.col(ts_col)] + (
        [F.col(tie_break)] if tie_break else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn("session_idx", F.sum(new_session).over(w))


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session aggregates: event count, span in integer
    microseconds, and (optionally) the value sum."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    ]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return sessions.groupBy(user_col, "session_idx").agg(*aggs)
