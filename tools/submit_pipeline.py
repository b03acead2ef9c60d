"""spark-submit entry point for the full linkage pipeline.

North-rule deployment shape: on a real cluster this runs as

    zip -r splink_spark.zip splink_spark
    spark-submit --py-files splink_spark.zip \
        tools/submit_pipeline.py \
        --input /data/pages --output /data/clusters \
        --format parquet --threshold 0.5

(local sanity run:  python tools/submit_pipeline.py \
    --input $SPARK_GRAFT_SF_DIR/documents.parquet --output /tmp/out)

The script gets its session from the cluster (spark-submit provides
master/executors); it only sets job-level SQL conf. Input/output go
through sources.registry.TableRegistry so an Iceberg catalog slots in
with --format iceberg --input <catalog.ns.table>.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python tools/submit_pipeline.py` runs (no --py-files zip on
# the path): make the repo root importable
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="pages table: parquet path or iceberg table name")
    p.add_argument("--output", required=True,
                   help="clusters output: parquet path or iceberg table")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "iceberg"])
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--checkpoint-dir", default=None,
                   help="resumable stage checkpoints (plans/stages.py)")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("splink_spark_pipeline").getOrCreate()
    # job-level conf only — cluster sizing comes from spark-submit
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    from splink_spark.operators.accuracy import (  # noqa: F401 (optional)
        pairwise_f1_from_clusters,
    )
    from splink_spark.operators.blocking import block_using_rules
    from splink_spark.operators.cluster import connected_components
    from splink_spark.operators.predict import (
        predict_from_comparison_vectors,
    )
    from splink_spark.operators.vectors import compute_comparison_vectors
    from splink_spark.operators.webtext import (
        prepare_pages,
        web_dedupe_settings,
    )

    t0 = time.time()
    if args.format == "iceberg":
        pages = spark.read.table(args.input)
    else:
        pages = spark.read.parquet(args.input)
    if "unique_id" not in pages.columns:
        if "url" in pages.columns:
            # deterministic surrogate id from the url (stable across runs)
            pages = pages.withColumn("unique_id", F.xxhash64("url"))
        elif "doc_id" in pages.columns:
            pages = pages.withColumn("unique_id", F.col("doc_id"))
        else:
            raise SystemExit(
                "input needs a unique_id, url, or doc_id column"
            )
    if "url" not in pages.columns:
        # text-only corpus (e.g. the documents fixture): a synthetic
        # per-source url keeps the domain blocking key meaningful
        pages = pages.withColumn(
            "url",
            F.concat(
                F.lit("local://"),
                F.coalesce(
                    F.col("source") if "source" in pages.columns
                    else F.lit(None),
                    F.lit("corpus"),
                ),
                F.lit("/"),
                F.col("unique_id").cast("string"),
            ),
        )

    settings = web_dedupe_settings()
    prepared = prepare_pages(pages).persist()
    n_pages = prepared.count()

    def build_scored() -> "DataFrame":
        pairs = block_using_rules(
            prepared,
            settings.blocking_rules,
            uid="unique_id",
            retain_columns=["text_tokens", "bk_title", "bk_domain"],
        )
        return predict_from_comparison_vectors(
            compute_comparison_vectors(pairs, settings), settings
        ).select(
            "unique_id_l",
            "unique_id_r",
            "match_weight",
            "match_probability",
        )

    stage_summary: list[dict] = []
    if args.checkpoint_dir:
        # resumable path (north rule): scored pairs and cluster
        # assignments checkpoint under content keys derived from the
        # model + input fingerprint; a rerun with an existing
        # checkpoint reads parquet instead of recomputing, and each
        # stage leaves per-partition lineage + metrics alongside
        from splink_spark.plans.stages import (
            StageManager,
            content_hash,
            input_fingerprint,
        )

        mgr = StageManager(spark, args.checkpoint_dir)
        key = content_hash(
            settings.to_json(), input_fingerprint({"pages": pages})
        )
        scored = mgr.stage("scored_pairs", key, build_scored)
        edges = scored.filter(
            F.col("match_probability") >= args.threshold
        ).select("unique_id_l", "unique_id_r")
        comps = mgr.stage(
            "clusters",
            content_hash(key, str(args.threshold)),
            lambda: connected_components(edges),
            extra_metrics={"threshold": args.threshold},
        )
        stage_summary = mgr.summary()
    else:
        scored = build_scored()
        edges = scored.filter(
            F.col("match_probability") >= args.threshold
        ).select("unique_id_l", "unique_id_r")
        comps = connected_components(edges)

    clusters = pages.join(comps, "unique_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("unique_id"))
    )

    if args.format == "iceberg":
        clusters.writeTo(args.output).createOrReplace()
    else:
        clusters.write.mode("overwrite").parquet(args.output)

    n_clusters = clusters.select("cluster_id").distinct().count()
    print(json.dumps({
        "n_pages": n_pages,
        "n_clusters": n_clusters,
        "threshold": args.threshold,
        "wall_sec": round(time.time() - t0, 2),
        "stages": stage_summary,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
