"""Benchmark: the flagship web-dedupe pipeline + headline operators.

Prints exactly ONE JSON line:
  {"metric": "scored_pairs_per_sec", "value": N, "unit": "pairs/sec",
   "queries": {...per-stage seconds...}, "sf": 0.1, ...}

Input scale: the deterministic web-page corpus is derived from the sf
of $SPARK_GRAFT_SF_DIR (sf0.1 -> 20k entities ≈ 50k pages); operator
queries run on the driver parquet fixtures in that dir. Parallelism:
local[$SPARK_GRAFT_CPUS] (default 32). Same seed at any parallelism —
used by BENCH/run_scaling.py for the N-vs-4N-cores protocol.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from splink_spark.session import get_spark  # noqa: E402


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_from_dir(sf_dir)
    n_entities = max(200, int(200_000 * sf))

    spark = get_spark(app_name="splink_spark_bench", cores=cores)

    from pyspark.sql import functions as F

    from splink_spark.fixtures.webpages import distributed_corpus
    from splink_spark.operators.accuracy import pairwise_f1_from_clusters
    from splink_spark.operators.cluster import connected_components
    from splink_spark.operators.predict import predict_from_comparison_vectors
    from splink_spark.operators.vectors import compute_comparison_vectors
    from splink_spark.operators.blocking import block_using_rules
    from splink_spark.operators.webtext import (
        prepare_pages,
        web_dedupe_settings,
    )
    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    t_total0 = time.time()

    # -- corpus generation (EXECUTOR-side, deterministic: per-entity
    #    rng, bit-identical to the driver path at any partitioning) ----
    t0 = time.time()
    pages, labels = distributed_corpus(
        spark, n_entities=n_entities, seed=42, partitions=cores * 2
    )
    pages = pages.persist()
    labels = labels.persist()
    n_pages = pages.count()
    labels.count()
    timings["generate_corpus"] = time.time() - t0

    settings = web_dedupe_settings()

    # -- stage 1: key derivation (persisted: join sides must not
    #    re-derive minhash/title keys) --------------------------------
    t0 = time.time()
    prepared = prepare_pages(pages).persist()
    prepared.count()
    timings["derive_keys"] = time.time() - t0

    # -- stage 2+3: blocking + scoring FUSED in one codegen pass.
    #    Never materialize the raw pair table: caching array-typed pair
    #    rows costs far more to (de)serialize than recomputing the join
    #    inside the pipeline. Persist only the narrow scored output.
    #
    #    WARMED MEDIAN-OF-K timing (default 3, env
    #    SPARK_GRAFT_SCORING_RUNS; one untimed warm-up precedes):
    #    the two scoring stages are the headline quotient's
    #    denominator, and a single-shot sample on this shared host
    #    moves severalfold with co-tenant load (r4: 311k pairs/s under
    #    ~50% steal vs 556k idle, identical code). Same statistics-not-
    #    duels protocol as BENCH/run_scaling.py. Each timed run
    #    recomputes the full unpersisted DAG and is drained with an
    #    agg over match_weight — a bare count() would let Catalyst
    #    prune the scoring projection and time only the join.
    scoring_runs = max(1, int(os.environ.get("SPARK_GRAFT_SCORING_RUNS", "3")))

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2]

    def _scored_dag():
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

    #    WARM-UP (r4 verdict task 1): the first execution of each scored
    #    DAG pays one-time codegen/JIT + OS page-cache costs (r4 measured
    #    27.0 -> 20.2 -> 11.2 s back-to-back on identical plans), so a
    #    median that includes it measures warm-up, not the engine. One
    #    UNTIMED warm-up run precedes the K timed runs; its wall is
    #    reported separately as *_cold_sec so the cold path stays visible
    #    without polluting the round-over-round headline.
    def _drain(df) -> tuple[float, int]:
        t0 = time.time()
        agg = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("match_weight").alias("s")
        ).collect()[0]
        return round(time.time() - t0, 3), int(agg["n"])

    bs_cold_sec, n_pairs = _drain(_scored_dag())
    bs_runs: list[float] = []
    for _ in range(scoring_runs):
        sec, n_pairs = _drain(_scored_dag())
        bs_runs.append(sec)
    timings["block_and_score"] = _median(bs_runs)

    # untimed: materialize the narrow scored output once for the
    # downstream cluster/F1 stages (persist forces full-row caching,
    # so scoring is not pruned here either)
    scored = _scored_dag().persist()
    scored.count()
    preds = scored.filter(F.col("match_probability") >= 0.5)
    n_scored_kept = preds.count()

    # -- stage 3b: u-estimation-style sampled-pair scoring load.
    #    SAME workload and SAME metric as BENCH/run_scaling.py /
    #    BENCH/BASELINE.md: the headline quotient is
    #    (blocked + sampled pairs) / (block_and_score + score_sampled).
    t0 = time.time()
    import math

    target_pairs = int(os.environ.get("SAMPLE_PAIRS", "10000000"))
    frac = min(1.0, math.sqrt(2.0 * target_pairs) / max(n_pages, 1))
    buckets = 1_000_000
    keep = int(frac * buckets)
    # eager checkpoint: the cross join must read the tiny materialized
    # sample, not re-walk the full prepare_pages lineage per task
    samp = prepared.filter(
        F.pmod(F.xxhash64(F.col("unique_id"), F.lit(7)), F.lit(buckets))
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
    sample_setup_sec = round(time.time() - t0, 3)
    scored_sample = predict_from_comparison_vectors(
        compute_comparison_vectors(rand_pairs, settings), settings
    )
    # aggregate over match_weight, NOT count(): a bare count would let
    # Catalyst prune the scoring projection and measure only the join.
    # Median-of-K like block_and_score (one untimed warm-up first); the
    # checkpointed sample is shared across runs, so each timed run
    # exercises the cross-join + scoring.
    ss_cold_sec, n_sampled = _drain(scored_sample)
    ss_runs: list[float] = []
    for _ in range(scoring_runs):
        sec, n_sampled = _drain(scored_sample)
        ss_runs.append(sec)
    timings["score_sampled"] = _median(ss_runs) + sample_setup_sec

    # -- stage 4: cluster ------------------------------------------------
    t0 = time.time()
    edges = preds.select("unique_id_l", "unique_id_r")
    comps = connected_components(edges)
    # assignment = every page id -> cluster id. Persist the NARROW
    # (id, cluster_id) pairs only: dragging the html payload through
    # the join and into the cache serializes ~1KB/row for columns no
    # downstream consumer (F1 is id-only) reads
    clusters = (
        pages.select("unique_id")
        .join(comps, "unique_id", "left")
        .withColumn(
            "cluster_id", F.coalesce("cluster_id", F.col("unique_id"))
        )
    ).persist()
    clusters.count()
    timings["cluster"] = time.time() - t0

    # -- quality gate -----------------------------------------------------
    t0 = time.time()
    f1 = pairwise_f1_from_clusters(clusters, labels)
    timings["evaluate_f1"] = time.time() - t0

    # -- headline operator queries on the driver fixtures ----------------
    for qname in (
        "o7_match_weights",
        "dedup_minhash",
        "sim_topk_bruteforce",
        "text_quality",
    ):
        t0 = time.time()
        entrymod.queries()[qname](spark, sf_dir).count()
        timings[qname] = time.time() - t0

    # -- scale-check leg: the SAME operators at 10x the corpus ----------
    # (VERDICT r2 task 2: prove the plan shapes with a measured 10x
    # datapoint, not just sf0.1 arguments). Three representative
    # operators — MinHash+LSH near-dup (band-join candidate volume),
    # connected components (superstep count), IVF ANN (centroid-join)
    # — run at 1x and 10x; growth_ratio / data_ratio ~ 1 means the
    # stage scales near-linearly. Skippable via SPARK_GRAFT_SCALE_CHECK=0.
    scale_check: dict = {}
    if os.environ.get("SPARK_GRAFT_SCALE_CHECK", "1") != "0":
        from splink_spark.operators.dedup import minhash_near_duplicates
        from splink_spark.operators.similarity import ivf_topk

        emb_expr = (
            "transform(sequence(1, 16), d -> "
            "cast(pmod(xxhash64(unique_id, d), 2001) as double)/1000.0"
            " - 1.0)"
        )
        # fixed leg sizes (env-overridable): the RATIO is the evidence;
        # pinning the absolute size keeps the per-round bench wall
        # bounded and round-over-round comparable. The 500k-page
        # datapoint is recorded separately in BENCH/BASELINE.md.
        base_ents = int(os.environ.get("SPARK_GRAFT_SCALE_X1", "5000"))
        legs: dict[str, dict] = {}
        for leg_name, ents in (
            ("x1", base_ents),
            ("x10", base_ents * 10),
        ):
            leg: dict = {}
            t0 = time.time()
            pages_l, labels_l = distributed_corpus(
                spark,
                n_entities=ents,
                seed=42,
                partitions=cores * 2,
            )
            pages_l = pages_l.select("unique_id", "text").persist()
            n_pg = pages_l.count()
            edges_l = (
                labels_l.filter(F.col("is_match"))
                .select("unique_id_l", "unique_id_r")
                .persist()
            )
            edges_l.count()
            leg["n_pages"] = n_pg
            leg["generate_sec"] = round(time.time() - t0, 3)

            t0 = time.time()
            leg["minhash_pairs"] = minhash_near_duplicates(
                pages_l.select("unique_id", "text"),
                id_col="unique_id",
                num_bands=4,
                shingle_k=3,
                jaccard_threshold=0.5,
            ).count()
            leg["minhash_sec"] = round(time.time() - t0, 3)

            t0 = time.time()
            leg["cc_rows"] = connected_components(edges_l).count()
            leg["cc_sec"] = round(time.time() - t0, 3)

            t0 = time.time()
            emb = pages_l.selectExpr(
                "unique_id AS vec_id", f"{emb_expr} AS embedding"
            )
            leg["ivf_rows"] = ivf_topk(
                emb,
                emb.filter(F.col("vec_id") < 200),
                k=10,
                n_centroids=64,
                nprobe=4,
                iters=1,
                broadcast_queries=True,
            ).count()
            leg["ivf_sec"] = round(time.time() - t0, 3)

            # r5 curation ops: shard packing (two-phase prefix sum —
            # must stay ~flat-per-row) and repeated-span detection
            # (positional k-gram census — must stay ~linear)
            from splink_spark.operators.curation import pack_token_shards
            from splink_spark.operators.textprep import repeated_spans

            t0 = time.time()
            leg["pack_rows"] = pack_token_shards(
                pages_l, budget_tokens=100_000, id_col="unique_id"
            ).count()
            leg["pack_sec"] = round(time.time() - t0, 3)

            t0 = time.time()
            leg["spans_rows"] = repeated_spans(
                pages_l, id_col="unique_id", k=10, min_docs=2
            ).count()
            leg["spans_sec"] = round(time.time() - t0, 3)
            legs[leg_name] = leg
            pages_l.unpersist()
            edges_l.unpersist()

        data_ratio = legs["x10"]["n_pages"] / max(legs["x1"]["n_pages"], 1)
        growth = {
            stage: round(
                (legs["x10"][f"{stage}_sec"] / max(legs["x1"][f"{stage}_sec"], 1e-9))
                / data_ratio,
                3,
            )
            for stage in ("minhash", "cc", "ivf", "pack", "spans")
        }
        scale_check = {
            "legs": legs,
            "data_ratio": round(data_ratio, 2),
            # wall-growth normalised by data growth; ~<=1 == near-linear
            "wall_growth_over_data_growth": growth,
            "candidate_growth_over_data_growth": round(
                (
                    legs["x10"]["minhash_pairs"]
                    / max(legs["x1"]["minhash_pairs"], 1)
                )
                / data_ratio,
                3,
            ),
        }

    total = time.time() - t_total0
    pipeline_secs = (
        timings["derive_keys"]
        + timings["block_and_score"]
        + timings["score_sampled"]
        + timings["cluster"]
    )
    # scoring throughput — the ONE formula shared with
    # BENCH/run_scaling.py and BENCH/BASELINE.md:
    # (blocked + sampled pairs) / (fused block+score + sampled-score wall)
    scoring_sec = timings["block_and_score"] + timings["score_sampled"]
    scored_pairs_per_sec = (n_pairs + n_sampled) / max(scoring_sec, 1e-9)

    print(
        json.dumps(
            {
                "metric": "scored_pairs_per_sec",
                "value": round(scored_pairs_per_sec, 1),
                "unit": "pairs/sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "cores": cores,
                "n_pages": n_pages,
                "pairs_generated": n_pairs,
                "pairs_sampled": n_sampled,
                "pairs_scored_total": n_pairs + n_sampled,
                "scoring_sec": round(scoring_sec, 3),
                "scoring_runs": scoring_runs,
                "block_and_score_runs_sec": bs_runs,
                "score_sampled_runs_sec": ss_runs,
                "block_and_score_cold_sec": bs_cold_sec,
                "score_sampled_cold_sec": ss_cold_sec,
                "sample_setup_sec": sample_setup_sec,
                "pairs_kept": n_scored_kept,
                "pipeline_sec": round(pipeline_secs, 3),
                "total_sec": round(total, 3),
                "f1": round(f1["f1"], 5),
                "scale_check": scale_check,
            }
        )
    )


if __name__ == "__main__":
    main()
