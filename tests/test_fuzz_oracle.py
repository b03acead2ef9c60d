"""Property fuzz: random small Settings run through BOTH engines.

For each seed, a random model — 2-4 comparisons drawn from a pool of
exact / levenshtein / jaro-winkler / datediff / haversine /
postcode-template / email-template / forename+surname-template
comparisons, random m/u probabilities and thresholds, random lambda,
optional term-frequency adjustment on an exact comparison, optional
salted blocking — is evaluated over a random persons fixture by the
Spark pipeline (block -> comparison vectors -> predict) and by the
generated ANSI SQL (gamma_sql + match_weight_sql, including the TF
adjustment term) in DuckDB, and the per-pair gammas and match weights
must agree. This turns the fixed driver-oracle surface into a family
of models (reference: splink's parameterized comparison_library tests,
SURVEY.md §5). Salted runs prove salting never changes results: the
oracle is always the UNSALTED pair SQL.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from splink_spark.fixtures.persons import generate_persons, persons_dataframe
from splink_spark.functions.comparators import (
    datediff_at_thresholds,
    distance_in_km_level,
    else_level,
    exact_match,
    exact_match_level,
    jaro_winkler_at_thresholds,
    levenshtein_at_thresholds,
    null_level,
)
from splink_spark.functions.templates import (
    email_comparison,
    forename_surname_comparison,
    postcode_comparison,
)
from splink_spark.model import BlockingRule, Comparison, Settings
from splink_spark.operators.blocking import block_using_rules
from splink_spark.operators.predict import (
    match_weight_sql,
    predict_from_comparison_vectors,
)
from splink_spark.operators.tf import concat_with_tf, tf_column_name
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
        if isinstance(v, float):
            return repr(v)
        return str(int(v))

    rows = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")"
        for row in pdf.itertuples(index=False)
    )
    return (
        f"SELECT * FROM (VALUES {rows}) AS t({', '.join(pdf.columns)})"
    )


def _geo_comparison(km: float) -> Comparison:
    # distance_in_km_level's trig condition is valid in both engines
    return Comparison(
        "geo",
        input_columns=["lat", "lon"],
        levels=[
            null_level("lat"),
            distance_in_km_level("lat", "lon", km),
            else_level(),
        ],
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
        lambda: forename_surname_comparison(),
        lambda: datediff_at_thresholds(
            "dob",
            thresholds=sorted(
                rng.choice([30, 90, 365, 1825], size=2, replace=False)
                .tolist()
            ),
            cast_strings_to_date=True,
        ),
        lambda: _geo_comparison(float(rng.choice([50.0, 200.0, 500.0]))),
    ]
    idx = rng.choice(len(pool), size=int(rng.integers(2, 5)), replace=False)
    comps = [pool[i]() for i in idx]
    # drop output-name collisions (e.g. exact dob + datediff dob):
    # Settings rejects duplicates — colliding gamma columns resolve
    # differently per engine
    seen: set[str] = set()
    comps = [
        c for c in comps
        if not (c.output_column_name in seen or seen.add(c.output_column_name))
    ]
    tf_flag = bool(rng.random() < 0.5)
    for comp in comps:
        for lv in comp.scored_levels:
            lv.m_probability = float(rng.uniform(0.02, 0.98))
            lv.u_probability = float(rng.uniform(0.02, 0.98))
            lv.tf_adjustment_column = None
    if tf_flag:
        # TF-adjusted exact city comparison appended — the adjustment
        # term (log2(u/tf) * weight, clamped) must match cross-engine
        tf_comp = Comparison(
            "city_tf",
            input_columns=["city"],
            levels=[
                null_level("city"),
                exact_match_level(
                    "city",
                    m=float(rng.uniform(0.5, 0.95)),
                    u=float(rng.uniform(0.05, 0.4)),
                    tf_adjustment=True,
                    tf_minimum_u_value=float(rng.choice([0.0, 0.05])),
                ),
                else_level(
                    m=float(rng.uniform(0.02, 0.4)),
                    u=float(rng.uniform(0.5, 0.98)),
                ),
            ],
        )
        # rebuild gamma conditions to reference city_* pair columns
        comps = [c for c in comps if "city" not in c.input_columns]
        comps.append(tf_comp)
    salting = int(rng.choice([1, 1, 2, 4]))
    return Settings(
        unique_id_column_name="unique_id",
        comparisons=comps,
        blocking_rules=[
            BlockingRule(
                rule="l.city = r.city", salting_partitions=salting
            )
        ],
        probability_two_random_records_match=float(
            rng.uniform(0.001, 0.2)
        ),
    )


def _tf_columns(settings: Settings) -> list[str]:
    cols = []
    for comp in settings.comparisons:
        for lv in comp.scored_levels:
            c = lv.tf_adjustment_column
            if c and c not in cols:
                cols.append(c)
    return cols


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
        # deterministic synthetic coordinates for the haversine level
        pdf["lat"] = (pdf["unique_id"] * 7 % 140 - 70).astype(float)
        pdf["lon"] = (pdf["unique_id"] * 13 % 360 - 180).astype(float)
        persons = persons_dataframe(
            spark, n_entities=N_ENTITIES, seed=fixture_seed
        ).drop("cluster").withColumn(
            "lat", (F.col("unique_id") * 7 % 140 - 70).cast("double")
        ).withColumn(
            "lon", (F.col("unique_id") * 13 % 360 - 180).cast("double")
        )

        tf_cols = _tf_columns(settings)
        base = concat_with_tf(persons, tf_cols) if tf_cols else persons
        retain = sorted(
            {c for comp in settings.comparisons for c in comp.input_columns}
            | {tf_column_name(c) for c in tf_cols}
        )
        pairs = block_using_rules(
            base,
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
        tf_cte = ""
        src = "persons"
        if tf_cols:
            tf_joins = " ".join(
                f"LEFT JOIN (SELECT {c}, count(*) / (SELECT count(*) "
                f"FROM persons WHERE {c} IS NOT NULL) AS "
                f"{tf_column_name(c)} FROM persons WHERE {c} IS NOT "
                f"NULL GROUP BY {c}) t_{c} USING ({c})"
                for c in tf_cols
            )
            tf_cte = (
                ", persons_tf AS (SELECT p.*, "
                + ", ".join(
                    f"t_{c}.{tf_column_name(c)}" for c in tf_cols
                )
                + f" FROM persons p {tf_joins})"
            )
            src = "persons_tf"
        sql = f"""
            WITH persons AS ({_values_sql(pdf)}){tf_cte},
            pairs AS (
                SELECT l.unique_id AS unique_id_l,
                       r.unique_id AS unique_id_r, {pair_cols}
                FROM {src} l JOIN {src} r
                  ON (l.city = r.city) AND (l.unique_id < r.unique_id)),
            v AS (SELECT unique_id_l, unique_id_r,
                         {', '.join(f'{c}_l, {c}_r' for c in retain)},
                         {', '.join(gammas)}
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
