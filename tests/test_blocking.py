"""Blocking semantics: pair ordering, cross-rule dedup, salting parity,
census estimates (reference: tests/test_blocking.py analogue)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splink_spark.model import BlockingRule
from splink_spark.operators.blocking import (
    block_using_rules,
    estimate_comparisons_from_equi_keys,
    count_comparisons_from_blocking_rule,
    rule_has_equi_component,
)


def test_pair_ordering_and_no_self_pairs(docs):
    pairs = block_using_rules(docs, [BlockingRule("l.source = r.source")])
    assert pairs.filter("unique_id_l >= unique_id_r").count() == 0


def test_census_estimate_equals_exact_count(docs):
    rule = BlockingRule("l.source = r.source AND l.lang = r.lang")
    exact = count_comparisons_from_blocking_rule(docs, rule)
    est = estimate_comparisons_from_equi_keys(docs, ["source", "lang"])
    assert exact == est


def test_cross_rule_dedup_no_duplicate_pairs(docs):
    rules = [
        BlockingRule("l.source = r.source"),
        BlockingRule("l.lang = r.lang"),
    ]
    pairs = block_using_rules(docs, rules)
    total = pairs.count()
    distinct = pairs.select("unique_id_l", "unique_id_r").distinct().count()
    assert total == distinct


def test_union_of_rules_matches_or_semantics(docs):
    rules = [
        BlockingRule("l.source = r.source"),
        BlockingRule("l.lang = r.lang"),
    ]
    ours = block_using_rules(docs, rules)
    # oracle: single OR-rule join, distinct pairs
    oracle = (
        docs.alias("l")
        .join(
            docs.alias("r"),
            F.expr(
                "(l.source = r.source OR l.lang = r.lang) "
                "AND l.unique_id < r.unique_id"
            ),
        )
        .select(
            F.col("l.unique_id").alias("unique_id_l"),
            F.col("r.unique_id").alias("unique_id_r"),
        )
        .distinct()
    )
    assert ours.count() == oracle.count()


def test_match_key_provenance(docs):
    rules = [
        BlockingRule("l.source = r.source"),
        BlockingRule("l.lang = r.lang"),
    ]
    pairs = block_using_rules(docs, rules)
    keys = {r["match_key"] for r in pairs.select("match_key").distinct().collect()}
    assert keys == {0, 1}
    # every match_key=1 pair must NOT satisfy rule 0
    mk1 = block_using_rules(docs, rules).filter("match_key = 1")
    joined = (
        mk1.join(
            docs.select(
                F.col("unique_id").alias("unique_id_l"),
                F.col("source").alias("source_l2"),
            ),
            "unique_id_l",
        ).join(
            docs.select(
                F.col("unique_id").alias("unique_id_r"),
                F.col("source").alias("source_r2"),
            ),
            "unique_id_r",
        )
    )
    assert joined.filter("source_l2 = source_r2").count() == 0


def test_salted_rule_produces_identical_pairs(docs):
    plain = block_using_rules(docs, [BlockingRule("l.source = r.source")])
    salted = block_using_rules(
        docs, [BlockingRule("l.source = r.source", salting_partitions=4)]
    )
    a = {(r[0], r[1]) for r in plain.select("unique_id_l", "unique_id_r").collect()}
    b = {(r[0], r[1]) for r in salted.select("unique_id_l", "unique_id_r").collect()}
    assert a == b


def test_cartesian_guard():
    assert not rule_has_equi_component("abs(l.x - r.x) < 2")
    assert rule_has_equi_component("l.a = r.a AND abs(l.x - r.x) < 2")
    assert rule_has_equi_component("r.a = l.a")


def test_retained_columns_suffixed(docs):
    pairs = block_using_rules(
        docs, [BlockingRule("l.source = r.source")], retain_columns=["lang"]
    )
    assert {"lang_l", "lang_r"} <= set(pairs.columns)
