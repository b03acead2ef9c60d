"""Resumable stage manager: checkpoint, resume, invalidation, lineage
(north-rule: every stage resumes from its last parquet checkpoint)."""

from __future__ import annotations

import os

import pytest

from splink_spark.functions.comparators import (
    else_level,
    exact_match_level,
    null_level,
)
from splink_spark.model import BlockingRule, Comparison, Settings
from splink_spark.plans.linker import Linker
from splink_spark.plans.stages import (
    StageManager,
    content_hash,
    input_fingerprint,
    staged_predict,
)


def _settings(prior: float = 0.01) -> Settings:
    return Settings(
        unique_id_column_name="unique_id",
        probability_two_random_records_match=prior,
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
            )
        ],
    )


def test_stage_resume_and_invalidation(spark, docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stages"))

    mgr = StageManager(spark, base)
    preds = staged_predict(Linker(docs, _settings()), mgr, 0.5)
    n_cold = preds.count()
    assert not any(s["resumed"] for s in mgr.summary())

    mgr2 = StageManager(spark, base)
    preds2 = staged_predict(Linker(docs, _settings()), mgr2, 0.5)
    assert preds2.count() == n_cold
    assert all(s["resumed"] for s in mgr2.summary())

    # model change -> different content key -> rebuild
    mgr3 = StageManager(spark, base)
    staged_predict(Linker(docs, _settings(prior=0.2)), mgr3, 0.5).count()
    assert not any(s["resumed"] for s in mgr3.summary())


def test_half_written_checkpoint_rebuilds(spark, docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stages"))
    mgr = StageManager(spark, base)
    staged_predict(Linker(docs, _settings()), mgr, 0.5).count()

    model_key = content_hash(
        _settings().to_json(), input_fingerprint({"__input__": docs})
    )
    pred_key = content_hash(model_key, "0.5")
    os.remove(os.path.join(base, f"predictions_{pred_key}.metrics.json"))

    mgr2 = StageManager(spark, base)
    staged_predict(Linker(docs, _settings()), mgr2, 0.5).count()
    by_name = {s["stage"]: s for s in mgr2.summary()}
    assert by_name["predictions"]["resumed"] is False
    assert by_name["concat_with_tf"]["resumed"] is True


def test_lineage_partition_counts(spark, docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stages"))
    mgr = StageManager(spark, base)
    staged_predict(Linker(docs, _settings()), mgr, 0.5).count()
    model_key = content_hash(
        _settings().to_json(), input_fingerprint({"__input__": docs})
    )
    lineage = mgr.lineage("blocked_pairs", model_key)
    total = sum(r["rows"] for r in lineage.collect())
    blocked = [s for s in mgr.summary() if s["stage"] == "blocked_pairs"][0]
    assert total == blocked["rows"]


def test_changed_input_invalidates_checkpoint(spark, docs, tmp_path_factory):
    """Same model over different input data must NOT resume the stale
    checkpoint (the content key includes the input fingerprint)."""
    base = str(tmp_path_factory.mktemp("stages"))
    mgr = StageManager(spark, base)
    staged_predict(Linker(docs, _settings()), mgr, 0.5).count()
    full_pairs = [s for s in mgr.summary() if s["stage"] == "blocked_pairs"][0]

    smaller = docs.filter("unique_id % 2 = 0")
    mgr2 = StageManager(spark, base)
    staged_predict(Linker(smaller, _settings()), mgr2, 0.5).count()
    assert not any(s["resumed"] for s in mgr2.summary())
    half_pairs = [s for s in mgr2.summary() if s["stage"] == "blocked_pairs"][0]
    assert half_pairs["rows"] < full_pairs["rows"]


def test_submit_pipeline_resumes_from_checkpoint(tmp_path):
    """tools/submit_pipeline.py --checkpoint-dir: second run must
    resume both stages from parquet, producing identical outputs."""
    import json
    import subprocess
    import sys

    out1, out2 = tmp_path / "o1", tmp_path / "o2"
    ck = tmp_path / "ck"

    def run(out):
        proc = subprocess.run(
            [
                sys.executable, "/root/repo/tools/submit_pipeline.py",
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", str(out),
                "--checkpoint-dir", str(ck),
            ],
            capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ][-1]
        return json.loads(line)

    first = run(out1)
    assert [s["resumed"] for s in first["stages"]] == [False, False]
    second = run(out2)
    assert [s["resumed"] for s in second["stages"]] == [True, True]
    assert second["n_clusters"] == first["n_clusters"]
    assert [s["rows"] for s in second["stages"]] == [
        s["rows"] for s in first["stages"]
    ]


def test_staged_predict_iceberg_lite_checkpoints(spark, docs, tmp_path):
    """Same resume semantics with Iceberg-table checkpoints: the
    second run reads every stage back from its iceberg-lite snapshot
    (resumed=True throughout) and results match the parquet path."""
    base = str(tmp_path / "stages_iceberg")
    mgr = StageManager(spark, base, fmt="iceberg_lite")
    preds = staged_predict(Linker(docs, _settings()), mgr, 0.5)
    n1 = preds.count()
    assert not any(r.resumed for r in mgr.results)
    # every stage directory is a real iceberg table (metadata json)
    import os as _os

    stage_dirs = [
        d for d in _os.listdir(base)
        if _os.path.isdir(_os.path.join(base, d, "metadata"))
    ]
    assert len(stage_dirs) == len(mgr.results)

    mgr2 = StageManager(spark, base, fmt="iceberg_lite")
    preds2 = staged_predict(Linker(docs, _settings()), mgr2, 0.5)
    assert preds2.count() == n1
    assert all(r.resumed for r in mgr2.results)

    mgr3 = StageManager(spark, str(tmp_path / "stages_parquet"))
    n_pq = staged_predict(Linker(docs, _settings()), mgr3, 0.5).count()
    assert n_pq == n1
