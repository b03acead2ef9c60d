"""Streaming incremental linkage: micro-batch scoring of new records
against a static base (availableNow trigger, checkpointed)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from splink_spark.functions.comparators import (
    else_level,
    exact_match_level,
    null_level,
)
from splink_spark.model import BlockingRule, Comparison, Settings
from splink_spark.plans.linker import Linker
from splink_spark.streaming.incremental import stream_matches_to_new_records


def _settings() -> Settings:
    return Settings(
        probability_two_random_records_match=0.01,
        blocking_rules=[BlockingRule("l.source = r.source")],
        comparisons=[
            Comparison(
                "lang",
                input_columns=["lang"],
                levels=[
                    null_level("lang"),
                    exact_match_level("lang", m=0.9, u=0.2),
                    else_level(m=0.1, u=0.8),
                ],
            ),
            Comparison(
                "n_chars",
                input_columns=["n_chars"],
                levels=[
                    null_level("n_chars"),
                    exact_match_level("n_chars", m=0.8, u=0.01),
                    else_level(m=0.2, u=0.99),
                ],
            ),
        ],
    )


def test_stream_scores_new_records(spark, docs, tmp_path_factory):
    base_dir = str(tmp_path_factory.mktemp("stream"))
    new_dir = os.path.join(base_dir, "incoming")
    out_dir = os.path.join(base_dir, "edges")
    ckpt_dir = os.path.join(base_dir, "ckpt")
    os.makedirs(new_dir)

    # "new" records: copies of every 20th doc, shifted ids
    new_records = docs.filter(F.col("unique_id") % 20 == 0).withColumn(
        "unique_id", F.col("unique_id") + F.lit(500000)
    )
    new_records.coalesce(1).write.mode("overwrite").parquet(new_dir)

    linker = Linker(docs, _settings())
    stream = spark.readStream.schema(docs.schema).parquet(new_dir)
    q = stream_matches_to_new_records(
        linker,
        stream,
        output_path=out_dir,
        checkpoint_path=ckpt_dir,
        threshold_match_probability=0.5,
        trigger_once=True,
    )
    q.awaitTermination(120)

    edges = spark.read.parquet(out_dir)
    assert edges.count() > 0
    # every retained edge links a base record to a streamed record
    assert edges.filter("unique_id_r < 500000").count() == 0
    # exact copies must link back to their originals
    linked = {
        (r["unique_id_l"], r["unique_id_r"])
        for r in edges.select("unique_id_l", "unique_id_r").collect()
    }
    assert any(l + 500000 == r for l, r in linked)


def test_stream_exact_dedup_emits_first_seen_only(spark, tmp_path_factory):
    from splink_spark.streaming.incremental import stream_exact_dedup

    base = tmp_path_factory.mktemp("sdedup")
    src = os.path.join(str(base), "in")
    out = os.path.join(str(base), "out")
    ckpt = os.path.join(str(base), "ckpt")

    rows = [
        (1, "alpha beta gamma", "2026-01-01 00:00:00"),
        (2, "alpha beta gamma", "2026-01-01 00:00:30"),  # dup within wm
        (3, "delta epsilon", "2026-01-01 00:01:00"),
        (4, "Alpha, beta GAMMA!", "2026-01-01 00:02:00"),  # dup (normalized)
    ]
    (
        spark.createDataFrame(rows, "unique_id long, text string, ts string")
        .withColumn("warc_ts", F.to_timestamp("ts"))
        .drop("ts")
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = stream_exact_dedup(stream, out, ckpt, watermark="5 minutes")
    q.awaitTermination(300)

    got = spark.read.parquet(out).collect()
    fps = [r["fingerprint"] for r in got]
    assert len(fps) == 2  # one survivor per distinct normalized content
    assert len(set(fps)) == 2
    ids = {r["unique_id"] for r in got}
    # one survivor from the {1,2,4} content group, plus doc 3
    assert 3 in ids
    assert len(ids & {1, 2, 4}) == 1


def test_stream_windowed_counts_with_watermark(spark, tmp_path_factory):
    """Two file-source micro-batches; append mode emits a window only
    after the watermark passes its end, and a too-late event is
    dropped."""
    import time
    from datetime import datetime

    from splink_spark.streaming.incremental import (
        stream_windowed_event_counts,
    )

    root = tmp_path_factory.mktemp("winstream")
    src = root / "src"
    out = root / "out"
    ck = root / "ck"
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(src / name)
        )

    t = lambda m, s=0: datetime(2024, 1, 1, m // 60, m % 60, s)
    # batch 1: two windows' worth of clicks + a view
    write_batch("b1", [
        (0, t(0), "click"), (1, t(1), "click"), (2, t(3), "view"),
        (3, t(7), "click"),
        # advance the max timestamp so the watermark (10m) passes the
        # [0,5) and [5,10) windows
        (4, t(30), "view"),
    ])
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string"
    ).option("maxFilesPerTrigger", "1").parquet(str(src / "*"))
    q = stream_windowed_event_counts(
        stream, str(out), str(ck), trigger_once=True
    )
    q.awaitTermination(120)

    # batch 2: a LATE click for the long-closed [0,5) window + another
    # fresh event far ahead to advance the watermark again
    write_batch("b2", [
        (5, t(2), "click"),        # late: watermark is already 0:20
        (6, t(60), "view"),
    ])
    q = stream_windowed_event_counts(
        stream, str(out), str(ck), trigger_once=True
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"].minute, r["event_type"]): r["n_events"]
        for r in spark.read.parquet(str(out)).collect()
    }
    # [0,5): 2 clicks + 1 view from batch 1; the late click (event 5)
    # must NOT appear (window emitted before it arrived)
    assert got[(0, "click")] == 2
    assert got[(0, "view")] == 1
    assert got[(5, "click")] == 1
    assert (30, "view") in got  # emitted once batch 2 advanced the mark


def test_stream_sessionize_matches_batch(spark, tmp_path_factory):
    """session_window streaming mirror: per-session aggregates from
    the stream equal the batch sessionize + session_stats on the same
    events (consistency gate from VERDICT r4 task 8), and a session
    is emitted only after the watermark passes its close."""
    import time
    from datetime import datetime

    from splink_spark.operators.sessions import (
        session_stats,
        sessionize,
    )
    from splink_spark.streaming.incremental import stream_sessionize

    root = tmp_path_factory.mktemp("sessstream")
    src = root / "src"
    out = root / "out"
    ck = root / "ck"
    src.mkdir()

    t = lambda m, s=0: datetime(2024, 1, 1, m // 60, m % 60, s)
    rows = [
        # user A: two sessions split by a >30m gap
        (1, "a", t(0), 1.0),
        (2, "a", t(10), 2.0),
        (3, "a", t(20), 3.0),
        (4, "a", t(70), 4.0),   # gap 50m -> new session
        (5, "a", t(80), 5.0),
        # user B: one session
        (6, "b", t(5), 10.0),
        (7, "b", t(25), 20.0),
        # sentinel far ahead: advances the watermark past every
        # session close so append mode emits them all
        (8, "z", t(600), 0.0),
    ]
    schema = "event_id long, user_id string, ts timestamp, value double"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = stream_sessionize(
        stream, str(out), str(ck), gap_minutes=30.0,
        watermark_delay="30 minutes", trigger_once=True,
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"]): (
            r["n_events"], r["duration_us"], r["sum_value"]
        )
        for r in spark.read.parquet(str(out)).collect()
    }
    # batch reference on the same rows (sentinel included — it forms
    # its own session, emitted or not depending on the watermark; all
    # NON-sentinel sessions must be present and equal)
    batch = spark.createDataFrame(rows, schema)
    ref = {
        (r["user_id"], r["min_ts"]): (
            r["n_events"], r["duration_us"], r["sum_value"]
        )
        for r in session_stats(
            sessionize(batch, gap_minutes=30.0), value_col="value"
        )
        .join(
            sessionize(batch, gap_minutes=30.0)
            .groupBy("user_id", "session_idx")
            .agg(F.min("ts").alias("min_ts")),
            ["user_id", "session_idx"],
        )
        .collect()
        if r["user_id"] != "z"
    }
    assert len(ref) == 3
    for key, want in ref.items():
        assert got[key] == want, (key, got.get(key), want)
    # the sentinel's own session closes only when a LATER watermark
    # passes it — it must not have been emitted in this batch
    assert ("z", t(600)) not in got


def test_stream_incremental_clusters_match_batch(
    spark, tmp_path_factory
):
    """Edges arriving across micro-batch files fold into the same
    cluster assignment a single batch CC over all edges produces."""
    import glob
    import os

    from splink_spark.operators.cluster import connected_components
    from splink_spark.streaming.incremental import (
        latest_cluster_assignments,
        stream_incremental_clusters,
    )

    tmp = tmp_path_factory.mktemp("inc_clusters")
    src_dir = tmp / "edges"
    src_dir.mkdir()
    batches = [
        [(1, 2), (3, 4)],
        [(2, 3), (10, 11)],     # bridges {1,2} and {3,4}
        [(11, 12), (5, 5)],     # grows a cluster + self-loop singleton
    ]
    for i, b in enumerate(batches):
        spark.createDataFrame(
            b, "unique_id_l long, unique_id_r long"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(src_dir / f"b{i}")
        )
    stream = spark.readStream.schema(
        "unique_id_l long, unique_id_r long"
    ).option("maxFilesPerTrigger", "1").parquet(str(src_dir / "*"))
    q = stream_incremental_clusters(
        stream,
        state_path=str(tmp / "state"),
        checkpoint_path=str(tmp / "ckpt"),
    )
    q.awaitTermination(120)
    cur = latest_cluster_assignments(spark, str(tmp / "state"))
    got = {r["unique_id"]: r["cluster_id"] for r in cur.collect()}
    full = spark.createDataFrame(
        [e for b in batches for e in b],
        "unique_id_l long, unique_id_r long",
    )
    exp = {
        r["unique_id"]: r["cluster_id"]
        for r in connected_components(full).collect()
    }
    assert got == exp
    # versioned snapshots exist (one per non-empty micro-batch)
    assert glob.glob(os.path.join(str(tmp / "state"), "v=*"))
