"""Plan + value contracts for bucketed persistence (plans/bucketing.py).

The point of bucketing is a NEGATIVE plan property — no Exchange — so
these audits assert on the physical plan, then sanity-check values
against the unbucketed equivalent.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from splink_spark.model import BlockingRule
from splink_spark.operators.blocking import block_using_rules
from splink_spark.plans.bucketing import (
    bucket_spec,
    read_bucketed,
    save_bucketed,
)

from tests.test_plans import plan_str


@pytest.fixture(scope="module")
def bucketed_docs(spark, docs):
    spark.sql("DROP TABLE IF EXISTS docs_by_lang")
    save_bucketed(
        docs, "docs_by_lang", ["lang"], 8, sort_cols=["lang", "unique_id"]
    )
    yield read_bucketed(spark, "docs_by_lang")
    spark.sql("DROP TABLE IF EXISTS docs_by_lang")


def test_bucket_spec_roundtrip(spark, bucketed_docs):
    n, cols = bucket_spec(spark, "docs_by_lang")
    assert n == 8 and cols == ["lang"]


def test_read_bucketed_rejects_unbucketed(spark, docs):
    spark.sql("DROP TABLE IF EXISTS docs_plain")
    docs.write.mode("overwrite").saveAsTable("docs_plain")
    try:
        with pytest.raises(ValueError, match="not bucketed"):
            read_bucketed(spark, "docs_plain")
    finally:
        spark.sql("DROP TABLE IF EXISTS docs_plain")


def test_bucketed_join_has_no_exchange(spark, bucketed_docs):
    """bucketed ⋈ bucketed on the bucket key must not shuffle either
    side — the nightly-batch contract that makes the one-time bucketing
    write pay for itself."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = bucketed_docs.select("unique_id", "lang")
        b = bucketed_docs.select(
            F.col("unique_id").alias("rid"), F.col("lang")
        )
        joined = a.join(b, "lang")
        p = plan_str(joined, mode="simple")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in p, p
    assert "Exchange" not in p, p


def test_bucketed_blocking_self_join_no_exchange(spark, bucketed_docs, docs):
    """The blocking operator itself, fed the bucketed table, generates
    candidate pairs with ZERO Exchange — and the exact same pairs the
    unbucketed path produces."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = block_using_rules(
            bucketed_docs, [BlockingRule("l.lang = r.lang")]
        )
        p = plan_str(pairs, mode="simple")
        got = pairs.select("unique_id_l", "unique_id_r")
        want = block_using_rules(
            docs, [BlockingRule("l.lang = r.lang")]
        ).select("unique_id_l", "unique_id_r")
        assert "Exchange" not in p, p
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_skips_shuffle(spark, bucketed_docs):
    """groupBy on the bucket key aggregates in place: no Exchange in the
    plan (EM re-training's per-key aggregations over a bucketed concat
    table skip the shuffle entirely)."""
    agg = bucketed_docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.avg("n_chars").alias("mean_chars")
    )
    p = plan_str(agg, mode="simple")
    assert "Exchange" not in p, p
    assert "HashAggregate" in p, p
