"""Curation operators: deterministic stratified sampling, token-budget
shard packing (distributed prefix sum vs a single global window), and
bloom-filter incremental dedup (no false negatives, bounded FPs)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from splink_spark.functions.text import doc_fingerprint, token_count
from splink_spark.operators.curation import (
    bloom_incremental_new,
    pack_token_shards,
    stratified_sample,
)


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

def test_stratified_sample_quota_and_determinism(spark, docs):
    out = stratified_sample(
        docs, "source", 10, id_col="unique_id", seed=7
    )
    sizes = {
        r["source"]: r["n"]
        for r in out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for src, n in totals.items():
        assert sizes[src] == min(10, n)
    # determinism: same ids at different shuffle partitioning
    a = sorted(r["unique_id"] for r in out.collect())
    b = sorted(
        r["unique_id"]
        for r in stratified_sample(
            docs.repartition(3), "source", 10, id_col="unique_id", seed=7
        ).collect()
    )
    assert a == b
    # a different seed picks a different sample
    c = sorted(
        r["unique_id"]
        for r in stratified_sample(
            docs, "source", 10, id_col="unique_id", seed=8
        ).collect()
    )
    assert a != c


def test_stratified_sample_prefilter_exactness(spark, docs):
    plain = stratified_sample(docs, "lang", 10, id_col="unique_id", seed=3)
    fast = stratified_sample(
        docs,
        "lang",
        10,
        id_col="unique_id",
        seed=3,
        prefilter_oversample=6.0,
    )
    key = lambda rows: sorted(  # noqa: E731
        (r["unique_id"], r["sample_rank"]) for r in rows
    )
    assert key(plain.collect()) == key(fast.collect())


def test_stratified_sample_prefilter_tiny_oversample_still_exact(
    spark, docs
):
    """Oversample so small the shortfall fallback MUST fire for some
    stratum — output must still equal the plain path."""
    plain = stratified_sample(docs, "lang", 40, id_col="unique_id", seed=1)
    fast = stratified_sample(
        docs,
        "lang",
        40,
        id_col="unique_id",
        seed=1,
        prefilter_oversample=1.001,
    )
    assert sorted(r["unique_id"] for r in plain.collect()) == sorted(
        r["unique_id"] for r in fast.collect()
    )


# ---------------------------------------------------------------------------
# pack_token_shards
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def packed(spark, docs):
    return pack_token_shards(
        docs, budget_tokens=2000, id_col="unique_id"
    ).localCheckpoint()


def test_pack_matches_single_global_window(spark, docs, packed):
    """The distributed two-phase prefix sum must equal the naive
    single-partition global window bit for bit."""
    base = docs.select(
        "unique_id",
        F.coalesce(token_count("text"), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        F.md5(F.col("unique_id").cast("string")).alias("k"),
    )
    w = (
        Window.orderBy("k", "unique_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = base.select(
        "unique_id",
        "n_tokens",
        F.row_number().over(Window.orderBy("k", "unique_id")).alias(
            "pack_pos"
        ),
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(2000)
        )
        .cast("long")
        .alias("shard_id"),
    )
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b


def test_pack_shard_budget_properties(packed):
    """Every shard except the last holds >= budget tokens only via its
    final doc (greedy close): the exclusive prefix of each shard's
    first doc is a budget multiple boundary crossing."""
    rows = sorted(packed.collect(), key=lambda r: r["pack_pos"])
    # pack_pos is a 1..n permutation
    assert [r["pack_pos"] for r in rows] == list(range(1, len(rows) + 1))
    # shard ids are non-decreasing in pack order and start at 0
    sids = [r["shard_id"] for r in rows]
    assert sids[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(sids, sids[1:])), (
        "shards must be consecutive in pack order"
    )
    # every non-final shard's token total lands in [budget - max_doc,
    # budget + max_doc] around the boundary: exact greedy semantics —
    # shard changes exactly when the exclusive prefix crosses a
    # multiple of the budget
    cum = 0
    for r in rows:
        assert r["shard_id"] == cum // 2000
        cum += r["n_tokens"]


def test_pack_determinism_across_partitioning(spark, docs, packed):
    again = pack_token_shards(
        docs.repartition(7), budget_tokens=2000, id_col="unique_id"
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, packed.collect())
    )


# ---------------------------------------------------------------------------
# bloom_incremental_new
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_bounded_fp(spark, docs):
    base = docs.filter(F.col("unique_id") % 3 != 0)
    # incoming: genuinely-new docs + exact copies of 40 base docs
    copies = (
        base.filter(F.col("unique_id") % 9 == 1)
        .limit(40)
        .withColumn("unique_id", F.col("unique_id") + F.lit(500000))
    )
    incoming = docs.filter(F.col("unique_id") % 3 == 0).unionByName(copies)
    out = bloom_incremental_new(
        base, incoming, id_col="unique_id", k=4, prefix_hex=3
    ).localCheckpoint()

    # every true duplicate MUST be flagged maybe_duplicate (hits == k)
    dup_ids = {r["unique_id"] for r in copies.select("unique_id").collect()}
    flagged = {
        r["unique_id"]
        for r in out.filter("maybe_duplicate").collect()
    }
    assert dup_ids <= flagged, "bloom false negative — impossible"

    # false positives exist but are bounded: with n_base fingerprints
    # in m = 4096 positions and k = 4, FP rate = (1-e^{-kn/m})^4;
    # assert the measured rate is under 4x the analytic bound
    import math

    n_base = base.count()
    m = 16**3
    fp_rate = (1 - math.exp(-4 * n_base / m)) ** 4
    new_ids_total = incoming.count() - len(dup_ids)
    false_pos = len(flagged - dup_ids)
    assert false_pos <= max(10, 4 * fp_rate * new_ids_total)

    # hits column is consistent with the flag
    for r in out.collect():
        assert r["maybe_duplicate"] == (r["hits"] == 4)


def test_bloom_null_text_is_definitely_new(spark, docs):
    base = docs.limit(50)
    incoming = docs.limit(3).withColumn("text", F.lit(None).cast("string"))
    out = bloom_incremental_new(base, incoming, id_col="unique_id")
    rows = out.collect()
    assert len(rows) == 3
    assert all(not r["maybe_duplicate"] for r in rows)


def test_bloom_exact_screen_composes_with_anti_join(spark, docs):
    """The intended scale composition: bloom screen -> exact anti-join
    only on the maybe-dup survivors == plain exact anti-join."""
    base = docs.filter(F.col("unique_id") % 2 == 0)
    incoming = docs.filter(F.col("unique_id") % 5 == 0)
    screened = bloom_incremental_new(base, incoming, id_col="unique_id")
    base_fp = base.select(doc_fingerprint("text").alias("fingerprint"))
    survivors_checked = (
        screened.filter("maybe_duplicate")
        .join(base_fp.distinct(), "fingerprint", "left_anti")
        .select("unique_id")
    )
    definitely_new = screened.filter("NOT maybe_duplicate").select(
        "unique_id"
    )
    got = sorted(
        r["unique_id"]
        for r in definitely_new.unionByName(survivors_checked).collect()
    )
    want = sorted(
        r["unique_id"]
        for r in incoming.withColumn(
            "fingerprint", doc_fingerprint("text")
        )
        .join(base_fp.distinct(), "fingerprint", "left_anti")
        .select("unique_id")
        .collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# curate_corpus (one-call composition)
# ---------------------------------------------------------------------------

def test_curate_corpus_end_to_end(spark, docs):
    from splink_spark.functions.text import doc_fingerprint as fp_fn
    from splink_spark.operators.curation import curate_corpus

    # plant exact copies so the exact-dedup stage has work
    copies = docs.filter(F.col("unique_id") % 25 == 0).withColumn(
        "unique_id", F.col("unique_id") + F.lit(700000)
    )
    corpus = docs.unionByName(copies)
    out, report = curate_corpus(
        corpus,
        id_col="unique_id",
        strata_col="lang",
        n_per_stratum=30,
        budget_tokens=4000,
        jaccard_threshold=0.6,
    )
    rows = out.localCheckpoint()
    # stage ordering and monotone shrinkage
    assert report["input"] == corpus.count()
    assert (
        report["input"]
        >= report["after_quality"]
        >= report["after_exact_dedup"]
        >= report["after_near_dedup"]
        >= report["after_quota"]
        >= report["output"]
    )
    # exact dedup really removed the planted copies
    assert report["after_exact_dedup"] <= report["after_quality"] - 19
    # no two output docs share a fingerprint
    n_fp = rows.select(fp_fn("text")).distinct().count()
    assert n_fp == report["output"]
    # quota respected per stratum
    per = rows.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] <= 30 for r in per)
    # every row has a shard assignment and shards start at 0
    assert rows.filter(F.col("shard_id").isNull()).count() == 0
    assert rows.agg(F.min("shard_id")).collect()[0][0] == 0
    assert report["shards"] >= 1


def test_weighted_mix_quotas(spark, docs):
    from splink_spark.operators.curation import weighted_mix

    out = weighted_mix(
        docs,
        "lang",
        {"en": 0.6, "es": 0.3, "fr": 0.1},
        total_rows=100,
        id_col="unique_id",
        seed=5,
    ).localCheckpoint()
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # en:60 of 193, es:30 of 80, fr:10 of 82; de/zh excluded
    assert per == {"en": 60, "es": 30, "fr": 10}
    # deterministic across partitioning
    again = weighted_mix(
        docs.repartition(5),
        "lang",
        {"en": 0.6, "es": 0.3, "fr": 0.1},
        total_rows=100,
        id_col="unique_id",
        seed=5,
    )
    assert sorted(r["unique_id"] for r in again.collect()) == sorted(
        r["unique_id"] for r in out.collect()
    )


def test_staged_curate_corpus_resumes(spark, docs, tmp_path):
    from splink_spark.operators.curation import staged_curate_corpus
    from splink_spark.plans.stages import StageManager

    kwargs = dict(
        id_col="unique_id",
        strata_col="lang",
        n_per_stratum=25,
        budget_tokens=4000,
    )
    m1 = StageManager(spark, str(tmp_path / "stages"))
    out1 = staged_curate_corpus(docs, m1, **kwargs)
    rows1 = sorted(r["unique_id"] for r in out1.collect())
    assert all(not s.resumed for s in m1.results)
    assert [s.name for s in m1.results] == [
        "curate_quality",
        "curate_exact_dedup",
        "curate_near_dedup",
        "curate_quota",
        "curate_shards",
    ]
    # fresh manager, same dir: every stage resumes from checkpoint,
    # output identical
    m2 = StageManager(spark, str(tmp_path / "stages"))
    out2 = staged_curate_corpus(docs, m2, **kwargs)
    assert all(s.resumed for s in m2.results)
    assert sorted(r["unique_id"] for r in out2.collect()) == rows1
    # a changed recipe parameter invalidates (no stale resume)
    m3 = StageManager(spark, str(tmp_path / "stages"))
    staged_curate_corpus(docs, m3, id_col="unique_id",
                         strata_col="lang", n_per_stratum=24,
                         budget_tokens=4000)
    assert all(not s.resumed for s in m3.results)
    # lineage table exists for a built stage
    lin = m1.lineage("curate_quality", m1.results[0].path.split("_")[-1]
                     .replace(".parquet", ""))
    assert lin.count() >= 1


def test_stratified_prefilter_keeps_null_strata(spark, docs):
    """NULL strata must survive the prefilter scale path identically to
    the plain path (regression: equi-join census silently dropped
    them)."""
    nulled = docs.withColumn(
        "lang",
        F.when(F.col("unique_id") % 7 == 0, None).otherwise(F.col("lang")),
    )
    plain = stratified_sample(nulled, "lang", 12, id_col="unique_id", seed=2)
    fast = stratified_sample(
        nulled, "lang", 12, id_col="unique_id", seed=2,
        prefilter_oversample=4.0,
    )
    key = lambda df: sorted(  # noqa: E731
        (r["unique_id"], r["lang"], r["sample_rank"]) for r in df.collect()
    )
    got_plain, got_fast = key(plain), key(fast)
    assert got_plain == got_fast
    # and the NULL stratum is actually represented
    assert any(lang is None for _, lang, _ in got_plain)


def test_export_token_shards_iceberg_partition_pruning(spark, docs, tmp_path):
    from splink_spark.operators.curation import (
        export_token_shards,
        pack_token_shards,
    )
    from splink_spark.sources.iceberg_lite import read_iceberg, scan_files

    loc = str(tmp_path / "shards_table")
    rep = export_token_shards(
        docs, loc, budget_tokens=5000, id_col="unique_id"
    )
    assert rep["n_docs"] == docs.count()
    assert rep["n_shards"] >= 2

    # full read matches the packing
    full = read_iceberg(spark, loc)
    assert full.count() == rep["n_docs"]
    want = {
        (r["unique_id"], r["shard_id"])
        for r in pack_token_shards(
            docs, 5000, id_col="unique_id"
        ).collect()
    }
    got = {
        (r["unique_id"], r["shard_id"]) for r in full.collect()
    }
    assert got == want

    # shard-pruned read: exactly one partition's rows, and the scan
    # planner proves pruning (files_selected < files_total)
    one = read_iceberg(spark, loc, where={"shard_id": "0"})
    n0 = sum(1 for _, s in want if s == 0)
    assert one.count() == n0
    _files, stats = scan_files(loc, where={"shard_id": "0"})
    assert stats["files_selected"] < stats["files_total"]
    assert stats["rows_selected"] == n0
