"""Stage-isolation profiler for the r06 optimization round (guide §1).

NOT the driver bench (bench.py is frozen); this file exists to answer
"where does the wall time actually go" per stage, with job labels and
noop-style drains, and to capture .explain("formatted") into plans/r06/.

Usage:
  python bench_extra.py corpus      # generate_corpus decomposition
  python bench_extra.py scoring     # block_and_score / score_sampled split
  python bench_extra.py cluster     # CC superstep decomposition
  python bench_extra.py entry      # the four timed entry queries
  python bench_extra.py scale      # minhash/spans/pack/ivf decomposition
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from splink_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timed(label, fn, spark):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = fn()
    sec = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label}: {sec}s -> {out}")
    return sec, out


def noop(df):
    df.write.format("noop").mode("overwrite").save()
    return "noop"


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "corpus"
    spark = get_spark(app_name=f"bench_extra_{mode}", cores=CORES)
    from pyspark.sql import functions as F

    from splink_spark.fixtures.webpages import distributed_corpus

    n_entities = 20_000

    if mode == "corpus":
        pages, labels = distributed_corpus(
            spark, n_entities=n_entities, seed=42, partitions=CORES * 2
        )
        pages = pages.persist()
        labels = labels.persist()
        timed("pages.count (gen pass 1)", lambda: pages.count(), spark)
        timed("labels.count", lambda: labels.count(), spark)
        pages.unpersist(); labels.unpersist()
        # raw single gen pass cost for reference
        pages2, _ = distributed_corpus(
            spark, n_entities=n_entities, seed=43, partitions=CORES * 2
        )
        timed("raw gen pass (noop)", lambda: noop(pages2), spark)

    elif mode == "scoring":
        from splink_spark.operators.blocking import block_using_rules
        from splink_spark.operators.predict import (
            predict_from_comparison_vectors,
        )
        from splink_spark.operators.vectors import compute_comparison_vectors
        from splink_spark.operators.webtext import (
            prepare_pages,
            web_dedupe_settings,
        )

        pages, _ = distributed_corpus(
            spark, n_entities=n_entities, seed=42, partitions=CORES * 2
        )
        pages = pages.persist()
        pages.count()
        settings = web_dedupe_settings()
        prepared = prepare_pages(pages).persist()
        timed("derive_keys (prepare_pages)", lambda: prepared.count(), spark)

        def pairs_df():
            return block_using_rules(
                prepared,
                settings.blocking_rules,
                uid="unique_id",
                retain_columns=["text_tokens", "bk_title", "bk_domain"],
            )

        def scored_df():
            return predict_from_comparison_vectors(
                compute_comparison_vectors(pairs_df(), settings), settings
            ).select(
                "unique_id_l", "unique_id_r", "match_weight",
                "match_probability",
            )

        def drain(df):
            return df.agg(
                F.count(F.lit(1)).alias("n"), F.sum("match_weight")
            ).collect()[0]["n"]

        def drain_ids(df):
            # join-only isolation: aggregate over ids so scoring prunes
            return df.agg(
                F.count(F.lit(1)).alias("n"), F.sum("unique_id_l")
            ).collect()[0]["n"]

        # warm-up
        timed("block_and_score WARMUP", lambda: drain(scored_df()), spark)
        for i in range(3):
            timed(f"join only (ids agg) r{i}",
                  lambda: drain_ids(pairs_df()), spark)
        for i in range(3):
            timed(f"block_and_score r{i}", lambda: drain(scored_df()), spark)

        # sampled leg
        import math
        target_pairs = 10_000_000
        n_pages = pages.count()
        frac = min(1.0, math.sqrt(2.0 * target_pairs) / max(n_pages, 1))
        keep = int(frac * 1_000_000)
        samp = prepared.filter(
            F.pmod(F.xxhash64(F.col("unique_id"), F.lit(7)), F.lit(1_000_000))
            < keep
        ).select(
            "unique_id", "text_tokens", "bk_title", "bk_domain"
        ).localCheckpoint()
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
        scored_sample = predict_from_comparison_vectors(
            compute_comparison_vectors(rand_pairs, settings), settings
        )
        timed("sampled cross-join only (count)",
              lambda: rand_pairs.count(), spark)
        for i in range(3):
            timed(f"score_sampled r{i}", lambda: drain(scored_sample), spark)
        # gamma-only (no predict) to split vectors vs predict cost
        vec_only = compute_comparison_vectors(rand_pairs, settings)
        timed("vectors only (agg gammas)",
              lambda: vec_only.agg(F.sum("gamma_text"), F.sum("gamma_title"),
                                   F.sum("gamma_domain")).collect(), spark)

    elif mode == "cluster":
        from splink_spark.operators.cluster import (
            _canonical_edges, _large_star, _signature, _small_star,
            connected_components,
        )

        pages, labels = distributed_corpus(
            spark, n_entities=n_entities, seed=42, partitions=CORES * 2
        )
        pages = pages.persist(); labels = labels.persist()
        pages.count(); labels.count()
        edges = labels.filter(F.col("is_match")).select(
            "unique_id_l", "unique_id_r"
        )
        t0 = time.time()
        e = _canonical_edges(edges, "unique_id_l", "unique_id_r"
                             ).localCheckpoint(eager=True)
        print(f"  canonical+checkpoint: {round(time.time()-t0,3)}s")
        sig = _signature(e)
        rounds = 0
        for _ in range(50):
            t0 = time.time()
            e = _small_star(_large_star(e)).localCheckpoint(eager=False)
            new_sig = _signature(e)
            rounds += 1
            print(f"  superstep {rounds}: {round(time.time()-t0,3)}s "
                  f"n={new_sig[0]}")
            if new_sig == sig:
                break
            sig = new_sig
        timed("full connected_components", lambda: connected_components(
            labels.filter(F.col("is_match")).select(
                "unique_id_l", "unique_id_r")).count(), spark)

    elif mode == "entry":
        import __spark_entry__ as entrymod
        qs = entrymod.queries()
        for qname in ("o7_match_weights", "dedup_minhash",
                      "sim_topk_bruteforce", "text_quality"):
            for i in range(2):
                timed(f"{qname} r{i}",
                      lambda: qs[qname](spark, SF_DIR).count(), spark)

    elif mode == "scale":
        from splink_spark.operators.dedup import (
            minhash_lsh_candidates, minhash_near_duplicates,
        )
        from splink_spark.operators.curation import pack_token_shards
        from splink_spark.operators.textprep import repeated_spans

        ents = int(os.environ.get("SCALE_ENTS", "50000"))
        pages_l, labels_l = distributed_corpus(
            spark, n_entities=ents, seed=42, partitions=CORES * 2
        )
        pages_l = pages_l.select("unique_id", "text").persist()
        n = pages_l.count()
        print(f"  n_pages={n}")
        timed("minhash candidates only", lambda: minhash_lsh_candidates(
            pages_l, id_col="unique_id", num_bands=4, shingle_k=3
        ).count(), spark)
        for i in range(2):
            timed(f"minhash full r{i}", lambda: minhash_near_duplicates(
                pages_l, id_col="unique_id", num_bands=4, shingle_k=3,
                jaccard_threshold=0.5,
            ).count(), spark)
        for i in range(2):
            timed(f"spans r{i}", lambda: repeated_spans(
                pages_l, id_col="unique_id", k=10, min_docs=2
            ).count(), spark)
        for i in range(2):
            timed(f"pack r{i}", lambda: pack_token_shards(
                pages_l, budget_tokens=100_000, id_col="unique_id"
            ).count(), spark)

    print("done")


if __name__ == "__main__":
    main()
