"""Full-example e2e on the person fixture — the analogue of the
reference's tests/test_full_example_*.py: estimate lambda from
deterministic rules, estimate u by random sampling, EM-train m under
two training blocking rules, predict, cluster, and require high
pairwise F1 vs the planted ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splink_spark.fixtures.persons import persons_dataframe
from splink_spark.functions.comparators import (
    columns_reversed_level,
    else_level,
    exact_match_level,
    levenshtein_level,
    null_level,
)
from splink_spark.model import BlockingRule, Comparison, Settings
from splink_spark.operators.accuracy import pairwise_f1_from_clusters
from splink_spark.plans.linker import Linker


def _person_settings() -> Settings:
    return Settings(
        probability_two_random_records_match=1e-3,
        blocking_rules=[
            BlockingRule("l.first_name = r.first_name"),
            BlockingRule("l.surname = r.surname"),
            BlockingRule("l.dob = r.dob"),
        ],
        comparisons=[
            Comparison(
                "name",
                input_columns=["first_name", "surname"],
                levels=[
                    null_level("first_name"),
                    exact_match_level("first_name"),
                    levenshtein_level("first_name", 2),
                    columns_reversed_level("first_name", "surname"),
                    else_level(),
                ],
            ),
            Comparison(
                "surname",
                input_columns=["surname"],
                levels=[
                    null_level("surname"),
                    exact_match_level("surname"),
                    levenshtein_level("surname", 2),
                    else_level(),
                ],
            ),
            Comparison(
                "dob",
                input_columns=["dob"],
                levels=[
                    null_level("dob"),
                    exact_match_level("dob"),
                    levenshtein_level("dob", 2),
                    else_level(),
                ],
            ),
            Comparison(
                "email",
                input_columns=["email"],
                levels=[
                    null_level("email"),
                    exact_match_level("email"),
                    levenshtein_level("email", 3),
                    else_level(),
                ],
            ),
        ],
    )


@pytest.fixture(scope="module")
def persons(spark):
    return persons_dataframe(spark, n_entities=250, seed=11).persist()


def _labels(persons):
    l = persons.select(
        F.col("unique_id").alias("unique_id_l"),
        F.col("cluster").alias("cluster_l"),
    )
    r = persons.select(
        F.col("unique_id").alias("unique_id_r"),
        F.col("cluster").alias("cluster_r"),
    )
    return (
        l.crossJoin(r)
        .filter("unique_id_l < unique_id_r")
        .select(
            "unique_id_l",
            "unique_id_r",
            (F.col("cluster_l") == F.col("cluster_r")).alias("is_match"),
        )
    )


def test_full_training_pipeline(persons, spark):
    settings = _person_settings()
    linker = Linker(persons.drop("cluster"), settings)

    lam = linker.estimate_probability_two_random_records_match(
        ["l.first_name = r.first_name AND l.surname = r.surname "
         "AND l.dob = r.dob"],
        recall=0.8,
    )
    assert 0 < lam < 0.1

    linker.estimate_u_using_random_sampling(max_pairs=200_000)
    for comp in settings.comparisons:
        for lv in comp.scored_levels:
            assert lv.u_probability is not None and 0 <= lv.u_probability <= 1

    r1 = linker.estimate_parameters_using_expectation_maximisation(
        "l.dob = r.dob", fix_u=True
    )
    r2 = linker.estimate_parameters_using_expectation_maximisation(
        "l.first_name = r.first_name AND l.surname = r.surname", fix_u=True
    )
    assert r1.iterations >= 1 and r2.iterations >= 1
    # trained m for exact email match should be materially above its else
    email = settings.comparison("email")
    m_exact = email.scored_levels[0].m_probability
    assert m_exact is not None and m_exact > 0.2

    preds = linker.predict(threshold_match_probability=0.2)
    clusters = linker.cluster_pairwise_predictions_at_threshold(preds, 0.8)
    m = pairwise_f1_from_clusters(clusters, _labels(persons))
    assert m["f1"] >= 0.8, m


def test_m_from_labels_matches_ground_truth_direction(persons):
    settings = _person_settings()
    linker = Linker(persons, settings)
    linker.estimate_m_from_label_column("cluster")
    email = settings.comparison("email")
    # exact email match must be far likelier among true matches than
    # fuzzy/else levels
    ms = [lv.m_probability for lv in email.scored_levels]
    assert ms[0] > ms[-1]


def test_m_from_pairwise_labels_linker_surface(persons):
    """Linker.estimate_m_from_pairwise_labels on true pairs agrees in
    direction with the label-column estimator (exact levels dominate)."""
    settings = _person_settings()
    linker = Linker(persons.drop("cluster"), settings)
    true_pairs = _labels(persons).filter("is_match").select(
        "unique_id_l", "unique_id_r"
    )
    linker.estimate_m_from_pairwise_labels(true_pairs)
    for name in ("email", "dob"):
        ms = [lv.m_probability for lv in settings.comparison(name).scored_levels]
        assert all(v is not None for v in ms)
        assert ms[0] > ms[-1]


def test_deterministic_link_pairs_and_clusters(persons):
    """deterministic_link declares every rule-generated pair a match
    (probability exactly 1.0, same pair set as blocked_pairs) and its
    output clusters through the standard join-back with high precision
    on strict rules."""
    settings = _person_settings()
    linker = Linker(persons.drop("cluster"), settings)
    strict = [
        "l.first_name = r.first_name AND l.surname = r.surname "
        "AND l.dob = r.dob"
    ]
    preds = linker.deterministic_link(strict)
    assert preds.filter("match_probability <> 1.0").count() == 0
    n_pairs = preds.count()
    assert n_pairs == linker.blocked_pairs(
        [BlockingRule(strict[0])]
    ).count() > 0

    clusters = linker.cluster_pairwise_predictions_at_threshold(preds, 0.99)
    # every deterministic pair must land in one cluster (transitivity)
    joined = (
        preds.select("unique_id_l", "unique_id_r")
        .join(
            clusters.select(
                F.col("unique_id").alias("unique_id_l"),
                F.col("cluster_id").alias("c_l"),
            ),
            "unique_id_l",
        )
        .join(
            clusters.select(
                F.col("unique_id").alias("unique_id_r"),
                F.col("cluster_id").alias("c_r"),
            ),
            "unique_id_r",
        )
    )
    assert joined.filter("c_l <> c_r").count() == 0
    # strict equality on three fields is precision-heavy vs the planted
    # truth: no cross-entity pair should be generated
    m = pairwise_f1_from_clusters(clusters, _labels(persons))
    assert m["precision"] >= 0.95, m
