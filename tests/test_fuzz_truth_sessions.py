"""Cross-engine fuzz for the two surfaces that broke outside the
predict-path fuzz: truth-space confusion tables and gap
sessionization (VERDICT r3 task 8).

Each seed generates a random instance, runs the Spark operator and a
DuckDB SQL replay with the SAME shape as the driver oracles (BIGINT
casts on every count surface), and compares cell-for-cell through
Arrow — the normalization the driver itself uses, so a HUGEINT /
decimal128 regression fails HERE before it fails in the driver.

reference: splink/accuracy.py::truth_space_table (truth family);
sessionization has no splink counterpart (SURVEY §2.3 pipeline op).
"""

from __future__ import annotations

import decimal

import duckdb
import numpy as np
import pandas as pd
import pytest

from splink_spark.operators.accuracy import truth_space_table
from splink_spark.operators.sessions import session_stats, sessionize

N_SEEDS = 12


def _arrow_cells(tbl):
    """pyarrow table -> {col: [cells]} with a decimal tripwire."""
    out = {}
    for name, col in zip(tbl.schema.names, tbl.columns):
        cells = col.to_pylist()
        assert not any(
            isinstance(v, decimal.Decimal) for v in cells
        ), f"column {name} surfaced Decimal cells (un-cast HUGEINT sum)"
        out[name] = cells
    return out


def _sorted_rows(cols: dict[str, list]):
    names = sorted(cols)
    return sorted(zip(*[cols[n] for n in names])), names


def _assert_frames_equal(spark_df, duck_tbl, ctx: str):
    got = {
        f.name: [r[f.name] for r in spark_df.collect()]
        for f in spark_df.schema.fields
    }
    want = _arrow_cells(duck_tbl)
    assert sorted(got) == sorted(want), (
        f"{ctx}: columns {sorted(got)} vs {sorted(want)}"
    )
    grows, names = _sorted_rows(got)
    wrows, _ = _sorted_rows(want)
    assert len(grows) == len(wrows), (
        f"{ctx}: {len(grows)} vs {len(wrows)} rows"
    )
    for gr, wr in zip(grows, wrows):
        assert gr == wr, f"{ctx}: row {dict(zip(names, gr))} vs " \
                         f"{dict(zip(names, wr))}"


# ---------------------------------------------------------------------------
# truth space
# ---------------------------------------------------------------------------

TRUTH_SQL = """
    WITH joined AS (
        SELECT coalesce(p.match_weight, '-infinity'::DOUBLE) AS mw,
               l.is_match
        FROM labels l LEFT JOIN preds p
          USING (unique_id_l, unique_id_r)),
    totals AS (
        SELECT CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END)
                    AS BIGINT) AS P,
               CAST(sum(CASE WHEN is_match THEN 0 ELSE 1 END)
                    AS BIGINT) AS N
        FROM joined),
    per AS (
        SELECT mw,
               sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS pos_here,
               sum(CASE WHEN is_match THEN 0 ELSE 1 END) AS neg_here
        FROM joined GROUP BY mw),
    cum AS (
        SELECT mw,
               CAST(sum(pos_here) OVER (ORDER BY mw DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS tp,
               CAST(sum(neg_here) OVER (ORDER BY mw DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS fp
        FROM per),
    pr AS (
        SELECT mw, tp, fp,
               (SELECT P FROM totals) - tp AS fn,
               (SELECT N FROM totals) - fp AS tn,
               CASE WHEN tp + fp > 0 THEN tp / (tp + fp) ELSE 1.0 END
                   AS precision,
               CASE WHEN (SELECT P FROM totals) > 0
                    THEN tp / (SELECT P FROM totals)
                    ELSE 1.0 END AS recall
        FROM pr_src)
    SELECT CASE WHEN mw = '-infinity'::DOUBLE THEN NULL
                ELSE CAST(round(mw * 1e9) AS BIGINT)
           END AS threshold_weight_e9,
           tp, fp, fn, tn,
           CAST(round(precision * 1e9) AS BIGINT) AS precision_e9,
           CAST(round(recall * 1e9) AS BIGINT) AS recall_e9,
           CAST(round(CASE WHEN precision + recall > 0
                           THEN 2 * precision * recall
                                / (precision + recall)
                           ELSE 0.0 END * 1e9) AS BIGINT) AS f1_e9
    FROM pr
""".replace("pr_src", "cum")


def test_fuzz_truth_space(spark):
    con = duckdb.connect()
    for seed in range(N_SEEDS):
        rng = np.random.default_rng(7000 + seed)
        n_ids = int(rng.integers(8, 30))
        # random labelled pairs (ordered, unique)
        pairs = {
            (int(a), int(b)) if a < b else (int(b), int(a))
            for a, b in rng.integers(0, n_ids, size=(40, 2))
            if a != b
        }
        pairs = sorted(pairs)
        labels = pd.DataFrame(
            {
                "unique_id_l": [p[0] for p in pairs],
                "unique_id_r": [p[1] for p in pairs],
                "is_match": rng.random(len(pairs)) < 0.4,
            }
        )
        # predictions cover a random subset; weights from a SMALL
        # discrete pool so ties across pairs are common (the window
        # frame semantics only differ when ties exist)
        pool = rng.normal(0, 4, size=3).round(2)
        scored = rng.random(len(pairs)) < 0.7
        preds = labels[scored][["unique_id_l", "unique_id_r"]].copy()
        preds["match_weight"] = rng.choice(pool, size=len(preds))
        preds["match_probability"] = 0.5  # unused by the surface

        spark_ts = truth_space_table(
            spark.createDataFrame(preds)
            if len(preds)
            else spark.createDataFrame(
                [], "unique_id_l long, unique_id_r long, "
                    "match_weight double, match_probability double"
            ),
            spark.createDataFrame(labels),
            as_scaled_ints=True,
        )
        con.register("labels", labels)
        con.register("preds", preds)
        want = con.execute(TRUTH_SQL).arrow()
        _assert_frames_equal(spark_ts, want, f"truth seed {seed}")
        con.unregister("labels")
        con.unregister("preds")


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

SESSIONS_SQL = """
    WITH base AS (
        SELECT user_id, event_id, value,
               epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_us
        FROM events_fz),
    s AS (
        SELECT *, CAST(sum(CASE WHEN prev_us IS NULL
                           OR us - prev_us > {gap_us}
                      THEN 1 ELSE 0 END) OVER (
                PARTITION BY user_id ORDER BY us, event_id
            ) AS BIGINT) AS session_idx
        FROM base)
    SELECT user_id, session_idx,
           count(*) AS n_events,
           max(us) - min(us) AS duration_us,
           CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2
    FROM s GROUP BY user_id, session_idx
"""


def test_fuzz_sessionization(spark):
    con = duckdb.connect()
    for seed in range(N_SEEDS):
        rng = np.random.default_rng(8000 + seed)
        gap_minutes = float(rng.choice([5.0, 30.0, 90.0]))
        gap_us = int(gap_minutes * 60 * 1_000_000)
        rows = []
        eid = 0
        for user in range(int(rng.integers(2, 6))):
            t = int(rng.integers(0, 10**6))
            for _ in range(int(rng.integers(1, 25))):
                # gaps clustered around the threshold, including
                # EXACTLY the threshold (boundary: > not >=) and ties
                # (gap 0 -> same ts, tie-broken by event_id)
                gap = int(
                    rng.choice(
                        [0, 1, gap_us - 1, gap_us, gap_us + 1,
                         int(rng.integers(0, 3 * gap_us))]
                    )
                )
                t += gap
                rows.append(
                    (user, eid, np.datetime64(t, "us"),
                     round(float(rng.uniform(-5, 5)), 2))
                )
                eid += 1
        pdf = pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts", "value"]
        )
        events = spark.createDataFrame(pdf)
        got = session_stats(
            sessionize(events, gap_minutes=gap_minutes)
        ).select(
            "user_id",
            "session_idx",
            "n_events",
            "duration_us",
            F_round_e2("sum_value"),
        )
        con.register("events_fz", pdf)
        want = con.execute(
            SESSIONS_SQL.format(gap_us=gap_us)
        ).arrow()
        _assert_frames_equal(got, want, f"sessions seed {seed}")
        con.unregister("events_fz")


def F_round_e2(col):
    from pyspark.sql import functions as F

    return F.round(F.col(col) * 100).cast("long").alias("sum_value_e2")
