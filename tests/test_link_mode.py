"""link_only mode: two source tables, composite-id pair ordering
(SURVEY.md §7.4 — ordering uses the concatenated
(source_dataset, unique_id) string, as in the reference's
splink/unique_id_concat.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splink_spark.fixtures.persons import persons_dataframe
from splink_spark.functions.comparators import (
    else_level,
    exact_match_level,
    null_level,
)
from splink_spark.model import BlockingRule, Comparison, Settings
from splink_spark.plans.linker import Linker


def _settings() -> Settings:
    return Settings(
        link_type="link_only",
        probability_two_random_records_match=1e-3,
        blocking_rules=[BlockingRule("l.surname = r.surname")],
        comparisons=[
            Comparison(
                "email",
                input_columns=["email"],
                levels=[
                    null_level("email"),
                    exact_match_level("email", m=0.9, u=0.001),
                    else_level(m=0.1, u=0.999),
                ],
            ),
            Comparison(
                "dob",
                input_columns=["dob"],
                levels=[
                    null_level("dob"),
                    exact_match_level("dob", m=0.8, u=0.01),
                    else_level(m=0.2, u=0.99),
                ],
            ),
        ],
    )


def test_link_two_datasets(spark):
    persons = persons_dataframe(spark, n_entities=120, seed=21).persist()
    # two overlapping "datasets": even uids vs odd uids of the same
    # entities — cross-source matches exist, within-source don't count
    a = persons.filter(F.col("unique_id") % 2 == 0).drop("cluster")
    b = persons.filter(F.col("unique_id") % 2 == 1).drop("cluster")
    linker = Linker({"dsA": a, "dsB": b}, _settings())
    preds = linker.predict(threshold_match_probability=0.5).persist()

    rows = preds.collect()
    assert rows, "expected cross-dataset matches"
    # link_only emits source tags for both sides
    cols = set(preds.columns)
    assert {"source_dataset_l", "source_dataset_r"} <= cols

    # composite-id ordering: each unordered pair appears exactly once
    n = preds.count()
    nd = preds.select(
        F.least(
            F.concat_ws("-__-", "source_dataset_l", "unique_id_l"),
            F.concat_ws("-__-", "source_dataset_r", "unique_id_r"),
        ).alias("k1"),
        F.greatest(
            F.concat_ws("-__-", "source_dataset_l", "unique_id_l"),
            F.concat_ws("-__-", "source_dataset_r", "unique_id_r"),
        ).alias("k2"),
    ).distinct().count()
    assert n == nd

    # ordering semantics: left composite < right composite, always
    bad = preds.filter(
        F.concat_ws("-__-", "source_dataset_l", "unique_id_l")
        >= F.concat_ws("-__-", "source_dataset_r", "unique_id_r")
    ).count()
    assert bad == 0

    # link_only NEVER emits within-source pairs
    # (reference: splink/blocking.py::block_using_rules_sql)
    same_source = preds.filter(
        "source_dataset_l = source_dataset_r"
    ).count()
    assert same_source == 0

    # true cross-source matches recovered: same entity split across
    # datasets shares email+dob for uncorrupted copies
    truth = (
        persons.alias("x")
        .join(
            persons.alias("y"),
            F.expr(
                "x.cluster = y.cluster AND x.unique_id % 2 = 0 "
                "AND y.unique_id % 2 = 1 AND x.email = y.email "
                "AND x.surname = y.surname"
            ),
        )
        .count()
    )
    if truth:
        matched = preds.filter("match_probability > 0.9").count()
        assert matched > 0


def test_link_and_dedupe_keeps_within_source_pairs(spark):
    """link_and_dedupe scores BOTH cross- and within-source pairs;
    link_only drops the within-source ones — the two modes must differ
    on the same input."""
    persons = persons_dataframe(spark, n_entities=120, seed=21).persist()
    a = persons.filter(F.col("unique_id") % 2 == 0).drop("cluster")
    b = persons.filter(F.col("unique_id") % 2 == 1).drop("cluster")

    s_both = _settings()
    s_both.link_type = "link_and_dedupe"
    both = Linker({"dsA": a, "dsB": b}, s_both).blocked_pairs().persist()
    within = both.filter("source_dataset_l = source_dataset_r").count()
    cross = both.filter("source_dataset_l <> source_dataset_r").count()
    assert within > 0 and cross > 0

    only = Linker({"dsA": a, "dsB": b}, _settings()).blocked_pairs()
    assert only.count() == cross


def test_find_matches_to_new_records_any_source_name(spark):
    """Regression: base-vs-new blocking must not depend on the lexical
    order of the base source name vs '__new__' (a base named 'persons'
    sorts after '__new__'; the old pair-ordering predicate dropped every
    pair)."""
    persons = persons_dataframe(spark, n_entities=80, seed=7).drop("cluster")
    s = _settings()
    s.link_type = "dedupe_only"
    linker = Linker({"persons": persons}, s)
    new = persons.filter(F.col("unique_id") < 5).withColumn(
        "unique_id", F.col("unique_id") + F.lit(10_000_000)
    )
    matches = linker.find_matches_to_new_records(new).persist()
    assert matches.count() > 0
    # every new record with a surname block in the base scores itself
    exact = matches.filter("email_l = email_r AND dob_l = dob_r").count()
    assert exact >= 1
