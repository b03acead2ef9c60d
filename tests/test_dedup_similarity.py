"""Dedup + similarity operators: planted-duplicate recovery, LSH
candidate soundness, top-k correctness vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splink_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from splink_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    signed_projection_buckets,
)


@pytest.fixture(scope="module")
def planted(spark, docs):
    """documents + exact copies of every 10th doc, + one near-copy."""
    copies = docs.filter(F.col("unique_id") % 10 == 0).withColumn(
        "unique_id", F.col("unique_id") + F.lit(100000)
    )
    near = (
        docs.filter(F.col("unique_id") == 1)
        .withColumn("unique_id", F.lit(200001))
        # drop the first 2 tokens: high-but-not-1.0 jaccard
        .withColumn(
            "text", F.expr("substring(text, instr(text, ' ') + 1)")
        )
    )
    return docs.unionByName(copies).unionByName(near).localCheckpoint()


def test_exact_duplicates_finds_planted_copies(planted):
    out = exact_duplicates(planted, id_col="unique_id")
    rows = out.collect()
    # every copy pairs with its source: 50 groups of size 2
    assert all(r["group_size"] == 2 for r in rows)
    ids = {r["unique_id"] for r in rows}
    assert all(
        (u in ids and u + 100000 in ids)
        for u in range(0, 500, 10)
    )
    # canonical is the min id
    assert all(r["canonical_id"] % 10 == 0 for r in rows)


def test_minhash_finds_exact_and_near_duplicates(planted):
    out = minhash_near_duplicates(
        planted, id_col="unique_id", num_bands=8, jaccard_threshold=0.5
    )
    pairs = {(r["unique_id_l"], r["unique_id_r"]) for r in out.collect()}
    expected_exact = {(u, u + 100000) for u in range(0, 500, 10)}
    missing = expected_exact - pairs
    assert not missing, f"missing exact dupes: {sorted(missing)[:5]}"
    assert (1, 200001) in pairs  # the near-copy


def test_minhash_candidates_no_duplicate_pairs(planted):
    cands = minhash_lsh_candidates(planted, id_col="unique_id", num_bands=4)
    total = cands.count()
    distinct = cands.select("unique_id_l", "unique_id_r").distinct().count()
    assert total == distinct


def test_simhash_finds_exact_duplicates(planted):
    out = simhash_near_duplicates(planted, id_col="unique_id", max_hamming=3)
    pairs = {(r["unique_id_l"], r["unique_id_r"]) for r in out.collect()}
    expected = {(u, u + 100000) for u in range(0, 500, 10)}
    assert expected <= pairs
    assert all(r["hamming"] <= 3 for r in out.collect())


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_force_topk_is_correct(emb):
    """rank-1 neighbour must have the max cosine (checked directly)."""
    queries = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(emb, queries, k=3)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    for q in (0, 1, 2):
        ranked = sorted(
            (r for r in rows if r["query_id"] == q), key=lambda r: r["rank"]
        )
        assert len(ranked) == 3
        cosines = [r["cosine"] for r in ranked]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["vec_id"] != q for r in ranked)


def test_lsh_topk_recall_vs_brute_force(emb):
    """LSH-bucketed top-1 must agree with brute force for most queries
    (recall >= 0.5 at 4 planes on random data; exactness not expected)."""
    exact = {
        r["query_id"]: r["vec_id"]
        for r in brute_force_topk(emb, emb, k=1).collect()
    }
    approx = {
        r["query_id"]: r["vec_id"]
        for r in lsh_topk(emb, dim=64, k=1, n_planes=4).collect()
    }
    hits = sum(1 for q, v in exact.items() if approx.get(q) == v)
    assert hits / len(exact) >= 0.5, f"recall {hits}/{len(exact)}"


def test_lsh_buckets_partition_all_rows(emb):
    b = signed_projection_buckets(emb, dim=64, n_planes=4)
    assert b.filter(F.col("lsh_bucket").isNull()).count() == 0
    n_buckets = b.select("lsh_bucket").distinct().count()
    assert 1 < n_buckets <= 16


def test_ivf_topk_recall_vs_brute_force(emb):
    """IVF with nprobe=16 of 32 centroids must recover >=80% of the
    true top-1 neighbours (deterministic centroids -> stable recall)."""
    from splink_spark.operators.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id") < 30)
    truth = {
        r["query_id"]: r["vec_id"]
        for r in brute_force_topk(emb, queries, k=1).collect()
    }
    approx = {
        r["query_id"]: r["vec_id"]
        for r in ivf_topk(
            emb, queries, k=1, n_centroids=32, nprobe=16, iters=2
        ).collect()
    }
    hits = sum(1 for q, v in truth.items() if approx.get(q) == v)
    assert hits / len(truth) >= 0.8, (hits, len(truth))


def test_ivf_exhaustive_probe_matches_brute_force(emb):
    """nprobe = n_centroids degenerates to exact search: top-1 must
    EQUAL brute force for every query."""
    from splink_spark.operators.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id") < 10)
    truth = {
        r["query_id"]: r["vec_id"]
        for r in brute_force_topk(emb, queries, k=1).collect()
    }
    full = {
        r["query_id"]: r["vec_id"]
        for r in ivf_topk(
            emb, queries, k=1, n_centroids=16, nprobe=16, iters=1
        ).collect()
    }
    assert full == truth


def test_ivf_centroids_deterministic(emb):
    from splink_spark.operators.similarity import train_ivf_centroids

    c1 = train_ivf_centroids(emb, n_centroids=8, iters=1)
    c2 = train_ivf_centroids(emb, n_centroids=8, iters=1)
    import numpy as np

    assert np.array_equal(c1, c2)


def test_shingle_jaccard_short_docs_no_ansi_error(spark):
    """Docs shorter than the shingle size fall back to one whole-doc
    shingle (word_shingles), so disjoint short docs score 0.0 and the
    division can never hit ANSI DIVIDE_BY_ZERO (try_divide guards the
    impossible-by-construction 0/0 anyway)."""
    from splink_spark.operators.dedup import shingle_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "hi"), (2, "yo"), (3, "a much longer document with words"),
         (4, "a much longer document with words")],
        "unique_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (3, 4)], "unique_id_l long, unique_id_r long"
    )
    rows = {
        r["unique_id_l"]: r["jaccard"]
        for r in shingle_jaccard_pairs(
            df, cands, id_col="unique_id", k=3
        ).collect()
    }
    assert rows[1] == 0.0  # ["hi"] vs ["yo"]: disjoint fallback shingles
    assert rows[3] == 1.0
