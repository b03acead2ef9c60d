"""Model-evaluation data extractors: unlinkables distribution,
prediction-errors tables, comparison-viewer pattern data.

reference: splink/unlinkables.py, splink/accuracy.py::
prediction_errors_from_labels_table,
splink/comparison_vector_distribution.py.
"""

import pytest
from pyspark.sql import functions as F

from splink_spark.functions.comparators import (
    else_level,
    exact_match_level,
    null_level,
)
from splink_spark.model import BlockingRule, Comparison, Settings
from splink_spark.operators.accuracy import (
    prediction_errors_from_labels,
    unlinkables_data,
)
from splink_spark.operators.vectors import comparison_viewer_data


def test_unlinkables_cumulative_distribution(spark):
    preds = spark.createDataFrame(
        [(1, 2, 5.0), (2, 3, 3.0)],
        "unique_id_l long, unique_id_r long, match_weight double",
    )
    records = spark.createDataFrame(
        [(i,) for i in range(1, 6)], "unique_id long"
    )
    out = {
        r["match_weight_rounded"]: r["cum_proportion"]
        for r in unlinkables_data(preds, records=records).collect()
    }
    # 4,5 never paired -> -inf bucket (2/5); 3 best=3.0; 1,2 best=5.0
    assert out[float("-inf")] == pytest.approx(0.4)
    assert out[3.0] == pytest.approx(0.6)
    assert out[5.0] == pytest.approx(1.0)


def test_prediction_errors_fp_fn(spark):
    preds = spark.createDataFrame(
        [(1, 2, 10.0, 0.99), (3, 4, -5.0, 0.03)],
        "unique_id_l long, unique_id_r long, match_weight double, "
        "match_probability double",
    )
    labels = spark.createDataFrame(
        [
            (1, 2, False),   # predicted match, labelled non-match: FP
            (3, 4, True),    # predicted non-match, labelled match: FN
            (5, 6, True),    # never scored -> predicted non-match: FN
            (7, 8, False),   # never scored, labelled non-match: correct
        ],
        "unique_id_l long, unique_id_r long, is_match boolean",
    )
    rows = {
        (r["unique_id_l"], r["unique_id_r"]): r
        for r in prediction_errors_from_labels(preds, labels).collect()
    }
    assert set(rows) == {(1, 2), (3, 4), (5, 6)}
    assert rows[(1, 2)]["predicted_match"] is True
    assert rows[(5, 6)]["match_weight"] is None

    fp_only = prediction_errors_from_labels(
        preds, labels, include_false_negatives=False
    ).collect()
    assert [(r["unique_id_l"], r["unique_id_r"]) for r in fp_only] == [
        (1, 2)
    ]
    with pytest.raises(ValueError):
        prediction_errors_from_labels(
            preds,
            labels,
            include_false_positives=False,
            include_false_negatives=False,
        )


def test_comparison_viewer_examples(spark):
    settings = Settings(
        comparisons=[
            Comparison(
                "v",
                input_columns=["v"],
                levels=[
                    null_level("v"),
                    exact_match_level("v", m=0.9, u=0.1),
                    else_level(m=0.1, u=0.9),
                ],
            )
        ],
        blocking_rules=[BlockingRule(rule="TRUE")],
    )
    vectors = spark.createDataFrame(
        [
            (1, 2, 1), (7, 9, 1), (3, 4, 1),   # pattern gamma=1
            (5, 6, 0),                          # pattern gamma=0
        ],
        "unique_id_l long, unique_id_r long, gamma_v int",
    )
    rows = {
        r["gamma_v"]: r
        for r in comparison_viewer_data(vectors, settings).collect()
    }
    assert rows[1]["pattern_count"] == 3
    assert (rows[1]["example_l_1"], rows[1]["example_r_1"]) == (1, 2)
    assert (rows[1]["example_l_2"], rows[1]["example_r_2"]) == (7, 9)
    assert rows[0]["pattern_count"] == 1
    assert (rows[0]["example_l_1"], rows[0]["example_r_1"]) == (5, 6)
    assert (rows[0]["example_l_2"], rows[0]["example_r_2"]) == (5, 6)
