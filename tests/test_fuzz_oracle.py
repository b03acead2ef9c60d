"""Property fuzz: random small Settings run through BOTH engines.

For each seed, a random model (2-4 comparisons drawn from a pool of
exact / levenshtein / jaro-winkler / postcode-template / email-template
comparisons, random m/u probabilities and thresholds, random lambda)
is evaluated over a random persons fixture by the Spark pipeline
(block -> comparison vectors -> predict) and by the generated ANSI SQL
(gamma_sql + match_weight_sql) in DuckDB, and the per-pair gammas and
match weights must agree. This turns the fixed driver-oracle surface
into a family of models (reference: splink's parameterized
comparison_library tests, SURVEY.md §5).
"""

import duckdb
import numpy as np
import pytest

from splink_spark.fixtures.persons import generate_persons, persons_dataframe
from splink_spark.functions.comparators import (
    exact_match,
    jaro_winkler_at_thresholds,
    levenshtein_at_thresholds,
)
from splink_spark.functions.templates import (
    email_comparison,
    postcode_comparison,
)
from splink_spark.model import BlockingRule, Settings
from splink_spark.operators.blocking import block_using_rules
from splink_spark.operators.predict import (
    match_weight_sql,
    predict_from_comparison_vectors,
)
from splink_spark.operators.vectors import (
    compute_comparison_vectors,
    comparison_vector_sql_projection,
)

N_SEEDS = 20
N_ENTITIES = 60


def _values_sql(pdf) -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(int(v))

    rows = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")"
        for row in pdf.itertuples(index=False)
    )
    return (
        f"SELECT * FROM (VALUES {rows}) AS t({', '.join(pdf.columns)})"
    )


def _random_settings(rng: np.random.Generator) -> Settings:
    pool = [
        lambda: exact_match("dob"),
        lambda: exact_match("city"),
        lambda: levenshtein_at_thresholds(
            "surname", int(rng.integers(1, 4))
        ),
        lambda: jaro_winkler_at_thresholds(
            "first_name", float(rng.choice([0.85, 0.9, 0.95]))
        ),
        lambda: postcode_comparison(),
        lambda: email_comparison(
            jaro_winkler_threshold=float(rng.choice([0.85, 0.9]))
        ),
    ]
    idx = rng.choice(len(pool), size=int(rng.integers(2, 5)), replace=False)
    comps = [pool[i]() for i in idx]
    for comp in comps:
        for lv in comp.scored_levels:
            lv.m_probability = float(rng.uniform(0.02, 0.98))
            lv.u_probability = float(rng.uniform(0.02, 0.98))
            lv.tf_adjustment_column = None  # TF covered by o7_tf oracle
    return Settings(
        unique_id_column_name="unique_id",
        comparisons=comps,
        blocking_rules=[BlockingRule(rule="l.city = r.city")],
        probability_two_random_records_match=float(
            rng.uniform(0.001, 0.2)
        ),
    )


def test_random_settings_match_duckdb(spark):
    from splink_spark.functions.udfs import register_udfs

    register_udfs(spark)
    con = duckdb.connect()
    for seed in range(N_SEEDS):
        rng = np.random.default_rng(1000 + seed)
        settings = _random_settings(rng)
        fixture_seed = int(rng.integers(0, 10_000))
        pdf = generate_persons(
            n_entities=N_ENTITIES, seed=fixture_seed
        ).drop(columns=["cluster"])
        persons = persons_dataframe(
            spark, n_entities=N_ENTITIES, seed=fixture_seed
        ).drop("cluster")

        retain = sorted(
            {c for comp in settings.comparisons for c in comp.input_columns}
        )
        pairs = block_using_rules(
            persons,
            settings.blocking_rules,
            uid="unique_id",
            retain_columns=retain,
        )
        preds = predict_from_comparison_vectors(
            compute_comparison_vectors(pairs, settings), settings
        ).select(
            "unique_id_l",
            "unique_id_r",
            *settings.gamma_columns,
            "match_weight",
        )
        got = {
            (r["unique_id_l"], r["unique_id_r"]): r
            for r in preds.collect()
        }

        gammas = comparison_vector_sql_projection(settings)
        pair_cols = ", ".join(
            f"l.{c} AS {c}_l, r.{c} AS {c}_r" for c in retain
        )
        sql = f"""
            WITH persons AS ({_values_sql(pdf)}),
            pairs AS (
                SELECT l.unique_id AS unique_id_l,
                       r.unique_id AS unique_id_r, {pair_cols}
                FROM persons l JOIN persons r
                  ON (l.city = r.city) AND (l.unique_id < r.unique_id)),
            v AS (SELECT unique_id_l, unique_id_r, {', '.join(gammas)}
                  FROM pairs)
            SELECT unique_id_l, unique_id_r,
                   {', '.join(settings.gamma_columns)},
                   {match_weight_sql(settings)} AS match_weight
            FROM v
        """
        want_rows = con.execute(sql).fetchall()
        cols = [d[0] for d in con.description]
        assert len(want_rows) == len(got), (
            f"seed {seed}: row count {len(want_rows)} != {len(got)}"
        )
        for row in want_rows:
            d = dict(zip(cols, row))
            key = (d["unique_id_l"], d["unique_id_r"])
            g = got.get(key)
            assert g is not None, f"seed {seed}: missing pair {key}"
            for gc in settings.gamma_columns:
                assert g[gc] == d[gc], (
                    f"seed {seed} pair {key}: {gc} spark={g[gc]} "
                    f"duckdb={d[gc]}"
                )
            assert g["match_weight"] == pytest.approx(
                d["match_weight"], abs=1e-9
            ), f"seed {seed} pair {key} match_weight"
