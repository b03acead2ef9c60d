"""Resumable stage manager with per-partition lineage and stage metrics.

North-rule requirement: every pipeline stage resumes from its last
parquet checkpoint and emits lineage + metrics (pairs generated, pairs
scored, edges retained).

Mirrors (but redesigns) the reference's intermediate-table cache
(reference: splink/linker.py _intermediate_table_cache /
splink/cache_dict_with_logging.py::CacheDictWithLogging — physical
names suffixed with a SQL hash): a stage is keyed by
``name + content_key``; the content key must capture everything the
stage output depends on (model JSON, rule list, input fingerprint).
If the checkpoint exists, the stage is **not recomputed** —
``spark.read.parquet`` replaces the whole upstream plan.

Per-partition lineage: at write time each row is stamped with its
``spark_partition_id()``; the lineage table (one row per partition:
row count) and a stage-metrics JSON are written next to the data.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLUMN = "__lineage_partition"


def content_hash(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()[:16]


def input_fingerprint(inputs: dict[str, DataFrame]) -> str:
    """Fingerprint of the pipeline's input data, part of every stage's
    content key: re-running the same model over CHANGED input must never
    resume a stale checkpoint.

    Uses the normalized logical plan (expression ids stripped — they
    vary per session) plus source file paths + size + mtime (cheap, no
    job) when the frame is file-backed; falls back to schema + row count
    otherwise. Over-invalidation (recompute) is safe; silent stale
    resume is not, so any plan difference — an extra filter over the
    same files included — changes the key.
    """
    import re as _re

    parts: list[str] = []
    for name in sorted(inputs):
        df = inputs[name]
        parts.append(name)
        parts.append(df.schema.simpleString())
        try:
            plan = df._jdf.queryExecution().analyzed().toString()
            parts.append(_re.sub(r"#\d+", "#", plan))
        except Exception:
            pass
        try:
            files = sorted(df.inputFiles())
        except Exception:
            files = []
        if files:
            for f in files:
                p = f
                for prefix in ("file://", "file:"):
                    if p.startswith(prefix):
                        p = p[len(prefix):]
                        break
                try:
                    st = os.stat(p)
                    parts.append(f"{f}|{st.st_size}|{int(st.st_mtime)}")
                except OSError:
                    parts.append(f)
        else:
            parts.append(f"rows={df.count()}")
    return content_hash(*parts)


@dataclass
class StageResult:
    name: str
    path: str
    resumed: bool
    row_count: int
    wall_seconds: float
    metrics: dict = field(default_factory=dict)


class StageManager:
    """Named, content-addressed checkpoints for pipeline stages.

    ``fmt="parquet"`` (default) checkpoints each stage as a parquet
    directory; ``fmt="iceberg_lite"`` commits each stage as an
    Iceberg v2 table snapshot (sources/iceberg_lite.py) — same
    resume/lineage semantics, but the checkpoint carries table
    metadata, so downstream consumers can time-travel and the north
    rule's "resumes from its last Iceberg/parquet checkpoint" holds
    for both storage formats."""

    def __init__(
        self, spark: SparkSession, base_dir: str, fmt: str = "parquet"
    ) -> None:
        if fmt not in ("parquet", "iceberg_lite"):
            raise ValueError(f"unknown checkpoint format {fmt!r}")
        self.spark = spark
        self.base_dir = base_dir
        self.fmt = fmt
        os.makedirs(base_dir, exist_ok=True)
        self.results: list[StageResult] = []

    def _paths(self, name: str, key: str) -> tuple[str, str, str]:
        stem = os.path.join(self.base_dir, f"{name}_{key}")
        data = (
            stem + ".parquet" if self.fmt == "parquet" else stem
        )
        return data, stem + ".lineage.parquet", stem + ".metrics.json"

    def _write_data(self, df: DataFrame, path: str) -> None:
        if self.fmt == "iceberg_lite":
            from splink_spark.sources.iceberg_lite import write_iceberg

            write_iceberg(df, path)
        else:
            df.write.mode("overwrite").parquet(path)

    def _read_data(self, path: str) -> DataFrame:
        if self.fmt == "iceberg_lite":
            from splink_spark.sources.iceberg_lite import read_iceberg

            return read_iceberg(self.spark, path)
        return self.spark.read.parquet(path)

    def stage(
        self,
        name: str,
        content_key: str,
        build: Callable[[], DataFrame],
        extra_metrics: dict | None = None,
    ) -> DataFrame:
        """Run (or resume) a stage. Returns the stage DataFrame, always
        backed by the parquet checkpoint (lineage truncated)."""
        data_path, lineage_path, metrics_path = self._paths(name, content_key)
        t0 = time.time()
        if os.path.exists(metrics_path):
            df = self._read_data(data_path)
            with open(metrics_path) as f:
                saved = json.load(f)
            self.results.append(
                StageResult(
                    name=name,
                    path=data_path,
                    resumed=True,
                    row_count=saved["row_count"],
                    wall_seconds=time.time() - t0,
                    metrics=saved.get("metrics", {}),
                )
            )
            return df.drop(LINEAGE_COLUMN)

        df = build().withColumn(LINEAGE_COLUMN, F.spark_partition_id())
        self._write_data(df, data_path)
        persisted = self._read_data(data_path)
        lineage = persisted.groupBy(LINEAGE_COLUMN).agg(
            F.count(F.lit(1)).alias("rows")
        )
        lineage.write.mode("overwrite").parquet(lineage_path)
        row_count = persisted.count()
        metrics = {
            "row_count": row_count,
            "partitions": lineage.count(),
            "metrics": extra_metrics or {},
            "wall_seconds": time.time() - t0,
        }
        # atomic-ish: metrics file written LAST marks the stage complete,
        # so a crash mid-write never yields a half-checkpoint that resumes
        with open(metrics_path + ".tmp", "w") as f:
            json.dump(metrics, f)
        os.replace(metrics_path + ".tmp", metrics_path)
        self.results.append(
            StageResult(
                name=name,
                path=data_path,
                resumed=False,
                row_count=row_count,
                wall_seconds=time.time() - t0,
                metrics=extra_metrics or {},
            )
        )
        return persisted.drop(LINEAGE_COLUMN)

    def lineage(self, name: str, content_key: str) -> DataFrame:
        _, lineage_path, _ = self._paths(name, content_key)
        return self.spark.read.parquet(lineage_path)

    def summary(self) -> list[dict]:
        return [
            {
                "stage": r.name,
                "resumed": r.resumed,
                "rows": r.row_count,
                "seconds": round(r.wall_seconds, 3),
                **r.metrics,
            }
            for r in self.results
        ]


def staged_predict(
    linker,
    manager: StageManager,
    threshold_match_probability: float = 0.5,
) -> DataFrame:
    """The scoring pipeline with resumable checkpoints at the
    reference's materialisation points: concat_with_tf, blocked pairs,
    predictions (SURVEY.md §3.1). Stage keys combine the model JSON with
    the input-data fingerprint so changed inputs can never resume a
    stale checkpoint."""
    model_key = content_hash(
        linker.settings.to_json(), input_fingerprint(linker.inputs)
    )

    concat = manager.stage(
        "concat_with_tf", model_key, lambda: linker.concat_with_tf()
    )
    linker._concat_with_tf = concat  # downstream stages read the checkpoint

    pairs = manager.stage(
        "blocked_pairs",
        model_key,
        lambda: linker.blocked_pairs(),
        extra_metrics={"stage_kind": "pairs_generated"},
    )

    from splink_spark.operators.predict import predict_from_comparison_vectors
    from splink_spark.operators.vectors import compute_comparison_vectors

    preds = manager.stage(
        "predictions",
        content_hash(model_key, str(threshold_match_probability)),
        lambda: predict_from_comparison_vectors(
            compute_comparison_vectors(pairs, linker.settings),
            linker.settings,
            threshold_match_probability=threshold_match_probability,
        ),
        extra_metrics={"stage_kind": "pairs_scored"},
    )
    return preds
