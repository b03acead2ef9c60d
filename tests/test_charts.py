"""Chart spec emission (splink_spark/charts.py): every chart builds a
JSON-serializable Vega-Lite v5 dict from real operator output; the
cluster studio emits a self-contained HTML page embedding the graph."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from splink_spark import (
    BlockingRule,
    Comparison,
    ComparisonLevel,
    Settings,
)
from splink_spark.charts import (
    accuracy_chart,
    cluster_studio_html,
    comparison_viewer_chart,
    cumulative_comparisons_chart,
    m_u_parameters_chart,
    match_weights_chart,
    missingness_chart,
    parameter_estimate_comparisons_chart,
    precision_recall_chart,
    profile_columns_chart,
    roc_chart,
    save_chart,
    to_html,
    unlinkables_chart,
    waterfall_chart,
)

VL_SCHEMA = "https://vega.github.io/schema/vega-lite/v5.json"


def _settings() -> Settings:
    return Settings(
        comparisons=[
            Comparison(
                "lang",
                input_columns=["lang"],
                levels=[
                    ComparisonLevel(
                        "null",
                        "lang_l IS NULL OR lang_r IS NULL",
                        is_null_level=True,
                    ),
                    ComparisonLevel(
                        "exact",
                        "lang_l = lang_r",
                        m_probability=0.9,
                        u_probability=0.2,
                    ),
                    ComparisonLevel(
                        "else",
                        "TRUE",
                        m_probability=0.1,
                        u_probability=0.8,
                        is_else_level=True,
                    ),
                ],
            )
        ],
        blocking_rules=[BlockingRule(rule="l.source = r.source")],
        probability_two_random_records_match=0.01,
    )


def _check_spec(spec: dict, min_rows: int = 1) -> None:
    json.dumps(spec)  # serializable
    assert spec["$schema"] == VL_SCHEMA
    values = spec["data"]["values"]
    assert len(values) >= min_rows
    body = spec.get("spec", spec)
    assert "mark" in body and "encoding" in body


def test_parameter_charts_from_settings():
    s = _settings()
    mw = match_weights_chart(s)
    _check_spec(mw, min_rows=2)
    exact = next(v for v in mw["data"]["values"] if v["label"] == "exact")
    assert exact["log2_bayes_factor"] == pytest.approx(2.169925, abs=1e-5)
    mu = m_u_parameters_chart(s)
    _check_spec(mu, min_rows=4)  # 2 scored levels x m,u
    assert {v["parameter"] for v in mu["data"]["values"]} == {"m", "u"}


def test_match_weights_chart_tolerates_unestimated_params():
    s = _settings()
    s.comparisons[0].scored_levels[0].m_probability = None
    spec = match_weights_chart(s)
    row = next(
        v for v in spec["data"]["values"] if v["m_probability"] is None
    )
    assert row["log2_bayes_factor"] is None


def test_em_convergence_chart():
    history = [
        {"iteration": 0, "lam": 0.01, "m": [[0.1, 0.9]], "u": [[0.8, 0.2]]},
        {"iteration": 1, "lam": 0.02, "m": [[0.08, 0.92]], "u": [[0.81, 0.19]]},
    ]
    spec = parameter_estimate_comparisons_chart(history, _settings())
    _check_spec(spec, min_rows=10)
    series = {v["series"] for v in spec["data"]["values"]}
    assert "lambda" in series and "m:lang:g1" in series


def _pairs_and_vectors(spark, s):
    from splink_spark.operators.vectors import compute_comparison_vectors

    pairs = spark.createDataFrame(
        [(1, 2, "en", "en"), (3, 4, "en", "fr"), (5, 6, None, "en")],
        "unique_id_l long, unique_id_r long, lang_l string, lang_r string",
    )
    return compute_comparison_vectors(pairs, s)


def test_waterfall_chart_accumulates(spark):
    from splink_spark.operators.predict import match_weight_breakdown

    s = _settings()
    vectors = _pairs_and_vectors(spark, s)
    bd = match_weight_breakdown(vectors, s)
    one = bd.filter(F.col("unique_id_l") == 1)
    spec = waterfall_chart(one)
    _check_spec(spec, min_rows=3)  # prior + 1 comparison + total
    vals = spec["data"]["values"]
    assert vals[0]["comparison"] == "prior"
    # bars chain: each start == previous end; final bar spans the total
    for prev, cur in zip(vals, vals[1:-1]):
        assert cur["start"] == pytest.approx(prev["end"])
    assert vals[-1]["comparison"] == "final match weight"
    assert vals[-1]["end"] == pytest.approx(vals[-2]["end"])


def test_truth_space_charts_both_surfaces(spark):
    from splink_spark.operators.accuracy import truth_space_table

    preds = spark.createDataFrame(
        [(1, 2, 5.0), (3, 4, 1.0), (5, 6, -2.0)],
        "unique_id_l long, unique_id_r long, match_weight double",
    ).withColumn(
        "match_probability",
        F.pow(2.0, "match_weight") / (1 + F.pow(2.0, "match_weight")),
    )
    labels = spark.createDataFrame(
        [(1, 2, True), (3, 4, False), (5, 6, True)],
        "unique_id_l long, unique_id_r long, is_match boolean",
    )
    for scaled in (False, True):
        truth = truth_space_table(preds, labels, as_scaled_ints=scaled)
        for chart in (roc_chart, precision_recall_chart, accuracy_chart):
            spec = chart(truth)
            json.dumps(spec)
            assert len(spec["data"]["values"]) >= 3
    roc = roc_chart(truth_space_table(preds, labels))
    top = roc["data"]["values"][0]  # highest threshold first
    assert 0.0 <= top["tp_rate"] <= 1.0 and 0.0 <= top["fp_rate"] <= 1.0


def test_distribution_charts(spark):
    from splink_spark.operators.accuracy import unlinkables_data
    from splink_spark.operators.blocking import (
        cumulative_comparisons_from_blocking_rules,
    )
    from splink_spark.operators.profile import (
        missingness,
        profile_column_values,
    )
    from splink_spark.operators.vectors import comparison_viewer_data

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "unique_id")
    )
    s = _settings()

    _check_spec(missingness_chart(missingness(docs)), min_rows=3)
    _check_spec(
        profile_columns_chart(
            {"lang": profile_column_values(docs, "lang")}
        ),
        min_rows=1,
    )
    _check_spec(
        cumulative_comparisons_chart(
            cumulative_comparisons_from_blocking_rules(
                docs, s.blocking_rules
            )
        ),
        min_rows=1,
    )
    vectors = _pairs_and_vectors(spark, s)
    _check_spec(
        comparison_viewer_chart(comparison_viewer_data(vectors, s), s),
        min_rows=1,
    )
    preds = spark.createDataFrame(
        [(1, 2, 5.0), (3, 4, 1.0)],
        "unique_id_l long, unique_id_r long, match_weight double",
    )
    _check_spec(unlinkables_chart(unlinkables_data(preds)), min_rows=1)


def test_chart_row_cap():
    rows = [{"column_name": f"c{i}", "null_share": 0.0} for i in range(30000)]
    with pytest.raises(ValueError, match="exceeds"):
        missingness_chart(rows)


def test_to_html_and_save(tmp_path):
    spec = missingness_chart([{"column_name": "a", "null_share": 0.5}])
    html = to_html(spec)
    assert html.startswith("<!DOCTYPE html>") and "vegaEmbed" in html
    p = tmp_path / "chart.json"
    save_chart(spec, str(p))
    assert json.loads(p.read_text())["$schema"] == VL_SCHEMA
    ph = tmp_path / "chart.html"
    save_chart(spec, str(ph))
    assert "vegaEmbed" in ph.read_text()


def test_cluster_studio_html(spark):
    from splink_spark.operators.cluster import (
        cluster_metrics,
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2, 5.0), (2, 3, 4.0), (10, 11, 9.0)],
        "unique_id_l long, unique_id_r long, match_weight double",
    )
    clusters = connected_components(edges)
    metrics = cluster_metrics(edges, clusters)
    html = cluster_studio_html(clusters, edges, metrics)
    assert html.startswith("<!DOCTYPE html>")
    payload = json.loads(
        html.split("const DATA = ", 1)[1].split(";\n", 1)[0]
    )
    assert set(payload["clusters"]) == {"1", "10"}
    c1 = payload["clusters"]["1"]
    assert sorted(c1["nodes"]) == [1, 2, 3]
    assert len(c1["edges"]) == 2
    assert {e["w"] for e in c1["edges"]} == {5.0, 4.0}
    # largest-first ordering and metrics embedding
    assert c1["metrics"].get("n_nodes") == 3


def test_linker_chart_surface(spark):
    """End-to-end: every Linker chart method returns a valid spec (or
    HTML) on the sf0.001 documents table."""
    from splink_spark import Linker

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("doc_id", "unique_id")
    )
    linker = Linker(docs, _settings())
    for spec in (
        linker.match_weights_chart(),
        linker.m_u_parameters_chart(),
        linker.missingness_chart(["lang", "text"]),
        linker.comparison_viewer_chart(),
        linker.unlinkables_chart(),
    ):
        json.dumps(spec)
        assert spec["$schema"] == VL_SCHEMA
        assert len(spec["data"]["values"]) >= 1

    preds = linker.predict().filter(F.col("match_weight") > 0)
    clusters = linker.cluster_pairwise_predictions_at_threshold(
        preds, threshold_match_probability=0.5
    )
    html = linker.cluster_studio_html(preds, clusters, max_clusters=5)
    assert html.startswith("<!DOCTYPE html>") and "clusters" in html
