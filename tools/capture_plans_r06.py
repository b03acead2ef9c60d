"""Capture .explain('formatted') for the r06-touched queries into
plans/r06/<name>_{before,after}.txt (arg: before|after)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from splink_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r06"


def main(tag: str) -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name=f"plans_{tag}", cores=8)
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from splink_spark.fixtures.webpages import distributed_corpus
    from splink_spark.operators.blocking import block_using_rules
    from splink_spark.operators.cluster import (
        _canonical_edges,
        _large_star,
        _small_star,
    )
    from splink_spark.operators.predict import (
        predict_from_comparison_vectors,
    )
    from splink_spark.operators.vectors import compute_comparison_vectors
    from splink_spark.operators.webtext import (
        prepare_pages,
        web_dedupe_settings,
    )

    dfs = {}

    # bench pipeline shapes (small entity count; plan shape is identical)
    pages, labels = distributed_corpus(
        spark, n_entities=500, seed=42, partitions=8
    )
    settings = web_dedupe_settings()
    prepared = prepare_pages(pages)
    dfs["generate_corpus_labels"] = labels
    dfs["derive_keys"] = prepared
    pairs = block_using_rules(
        prepared,
        settings.blocking_rules,
        uid="unique_id",
        retain_columns=["text_tokens", "bk_title", "bk_domain"],
    )
    dfs["block_and_score"] = predict_from_comparison_vectors(
        compute_comparison_vectors(pairs, settings), settings
    ).select(
        "unique_id_l", "unique_id_r", "match_weight", "match_probability"
    )
    samp = prepared.select(
        "unique_id", "text_tokens", "bk_title", "bk_domain"
    )
    rand_pairs = (
        samp.alias("l")
        .join(samp.alias("r"), F.expr("l.unique_id < r.unique_id"))
        .select(
            F.col("l.unique_id").alias("unique_id_l"),
            F.col("r.unique_id").alias("unique_id_r"),
            F.col("l.text_tokens").alias("text_tokens_l"),
            F.col("r.text_tokens").alias("text_tokens_r"),
            F.col("l.bk_title").alias("bk_title_l"),
            F.col("r.bk_title").alias("bk_title_r"),
            F.col("l.bk_domain").alias("bk_domain_l"),
            F.col("r.bk_domain").alias("bk_domain_r"),
        )
    )
    dfs["score_sampled"] = predict_from_comparison_vectors(
        compute_comparison_vectors(rand_pairs, settings), settings
    )
    e = _canonical_edges(
        labels.filter(F.col("is_match")), "unique_id_l", "unique_id_r"
    )
    dfs["cluster_superstep"] = _small_star(_large_star(e))

    # entry queries (driver fixtures)
    qs = entrymod.queries()
    for name in (
        "o7_match_weights",
        "dedup_minhash",
        "dedup_ngram_jaccard",
        "sim_topk_bruteforce",
        "text_quality",
        "text_repeated_spans",
        "text_boilerplate",
        "curate_pack_shards",
    ):
        dfs[name] = qs[name](spark, SF_DIR)

    for name, df in dfs.items():
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
        print("wrote", path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "before")
