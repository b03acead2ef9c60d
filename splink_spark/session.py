"""SparkSession factory with scale-oriented defaults.

Tuned for local[N] testing but with the settings that matter on a real
multi-executor cluster: AQE (runtime re-plan, skew-join splitting,
partition coalescing), Arrow for the pandas-UDF comparator path, and
shuffle partitions sized to parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "splink_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 2x cores: enough granularity for AQE coalescing without tiny tasks.
        shuffle_partitions = 2 * cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # shuffled hash join beats sort-merge when a per-partition build
        # side fits (guide §3.1); AQE can also demote SMJ to SHJ at
        # runtime below the local-map threshold. Join RESULTS are
        # strategy-independent; both knobs hold on a real cluster.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "128m",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # 8g default, deliberately NOT oversized: an idle-host A/B
        # (r6) showed 24g buys nothing over 8g here, and
        # BENCH/run_scaling.py documents a measured 20-27x GC/page-
        # fault pathology with a 48g heap on this host class. The
        # cached working set is ~1-2 GB; override via SPARK_DRIVER_MEM
        # when a workload genuinely needs more.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
