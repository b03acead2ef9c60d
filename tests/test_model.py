"""Model semantics: gamma ordering, cascade first-match-wins, JSON io,
validation (SURVEY.md §7.4 parity checklist)."""

from __future__ import annotations

import math

import pytest

from splink_spark.functions.comparators import (
    else_level,
    exact_match_level,
    levenshtein_level,
    null_level,
)
from splink_spark.model import (
    NULL_GAMMA,
    BlockingRule,
    Comparison,
    ComparisonLevel,
    Settings,
)


def _comp():
    return Comparison(
        output_column_name="name",
        input_columns=["name"],
        levels=[
            null_level("name"),
            exact_match_level("name", m=0.8, u=0.01),
            levenshtein_level("name", 2, m=0.15, u=0.04),
            else_level(m=0.05, u=0.95),
        ],
    )


def test_gamma_assignment_descending():
    c = _comp()
    assert c.num_scored_levels == 3
    assert c.gamma_of(c.scored_levels[0]) == 2  # exact = top
    assert c.gamma_of(c.scored_levels[1]) == 1
    assert c.gamma_of(c.scored_levels[2]) == 0  # else
    assert c.gamma_of(c.null_level) == NULL_GAMMA
    assert c.level_for_gamma(2).label.startswith("exact")
    assert c.level_for_gamma(NULL_GAMMA).is_null_level


def test_first_match_wins_in_cascade(spark):
    c = _comp()
    df = spark.createDataFrame(
        [("ann", "ann"), ("ann", "anx"), ("ann", "zzz"), (None, "ann")],
        "name_l: string, name_r: string",
    )
    got = [r[0] for r in df.select(c.gamma_expr()).collect()]
    # exact pair must land at gamma 2, not also at the lev level
    assert got == [2, 1, 0, NULL_GAMMA]


def test_missing_else_level_rejected():
    with pytest.raises(ValueError, match="else"):
        Comparison(
            output_column_name="x",
            levels=[ComparisonLevel("only", "x_l = x_r")],
        )


def test_bayes_factor_and_null_weight():
    c = _comp()
    assert c.scored_levels[0].bayes_factor() == pytest.approx(80.0)
    assert c.null_level.bayes_factor() == 1.0


def test_settings_json_roundtrip():
    s = Settings(
        comparisons=[_comp()],
        blocking_rules=[BlockingRule("l.a = r.a", salting_partitions=4)],
        probability_two_random_records_match=0.01,
        link_type="link_only",
    )
    s2 = Settings.from_json(s.to_json())
    assert s2.to_dict() == s.to_dict()
    assert s2.blocking_rules[0].salting_partitions == 4
    assert s2.prior_match_weight == pytest.approx(math.log2(0.01 / 0.99))


def test_prior_validation():
    with pytest.raises(ValueError):
        Settings(
            comparisons=[_comp()], probability_two_random_records_match=0.0
        ).prior_match_weight


def test_linker_analysis_wrappers(spark, docs):
    """Linker-level analysis entry points (profile, missingness, census,
    cumulative, waterfall) — reference: splink/linker.py methods."""
    from splink_spark.functions.comparators import (
        else_level,
        exact_match_level,
        null_level,
    )
    from splink_spark.model import BlockingRule, Comparison, Settings
    from splink_spark.plans.linker import Linker

    settings = Settings(
        unique_id_column_name="unique_id",
        probability_two_random_records_match=0.01,
        blocking_rules=[
            BlockingRule("l.source = r.source"),
            BlockingRule("l.lang = r.lang"),
        ],
        comparisons=[
            Comparison(
                "lang",
                input_columns=["lang"],
                levels=[
                    null_level("lang"),
                    exact_match_level("lang", m=0.9, u=0.2),
                    else_level(m=0.1, u=0.8),
                ],
            )
        ],
    )
    lk = Linker(docs, settings)

    prof = lk.profile_columns(["lang"], top_k=3)
    assert prof["lang"].count() == 3

    miss = {r["column_name"]: r["null_share"]
            for r in lk.missingness_report(["lang", "text"]).collect()}
    assert set(miss) == {"lang", "text"}

    n = lk.count_num_comparisons_from_blocking_rule("l.source = r.source")
    assert n > 0

    cum = lk.cumulative_num_comparisons_from_blocking_rules().collect()
    assert len(cum) == 2
    assert cum[-1]["cumulative_rows"] >= cum[0]["row_count"]

    wf = lk.match_weight_breakdown()
    # rows = pairs * (1 prior + 1 comparison)
    assert wf.count() == lk.comparison_vectors().count() * 2
    assert {"comparison", "gamma_value", "log2_bayes_factor"} <= set(wf.columns)


def test_comparison_library_builders_run(spark, docs):
    from splink_spark.functions.comparators import (
        array_intersect_at_sizes,
        datediff_at_thresholds,
        jaccard_at_thresholds,
    )
    from splink_spark.model import BlockingRule, Settings
    from splink_spark.plans.linker import Linker

    settings = Settings(
        unique_id_column_name="unique_id",
        probability_two_random_records_match=0.01,
        blocking_rules=[BlockingRule("l.source = r.source")],
        comparisons=[jaccard_at_thresholds("text", [0.9, 0.5])],
    )
    # m/u unset -> default-filled by predict path? assign quickly:
    for comp in settings.comparisons:
        k = len(comp.scored_levels)
        for i, lv in enumerate(comp.scored_levels):
            lv.m_probability = max(0.9 - 0.4 * i, 0.05)
            lv.u_probability = min(0.05 + 0.3 * i, 0.95)
    preds = Linker(docs, settings).predict()
    assert preds.count() > 0
    assert "gamma_text" in preds.columns
