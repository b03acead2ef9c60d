"""Comparison template library (functions/templates.py).

reference: splink/comparison_template_library.py — level ordering and
first-match-wins semantics for the date / name / forename-surname /
postcode / email templates, verified on hand-built pairs with known
expected levels, plus an end-to-end vector pass on the persons fixture.
"""

import pytest
from pyspark.sql import functions as F

from splink_spark.fixtures.persons import persons_dataframe
from splink_spark.functions.templates import (
    date_comparison,
    email_comparison,
    forename_surname_comparison,
    name_comparison,
    postcode_comparison,
)
from splink_spark.model import Settings, BlockingRule
from splink_spark.operators.blocking import block_using_rules
from splink_spark.operators.vectors import compute_comparison_vectors


@pytest.fixture(scope="module", autouse=True)
def _udfs(spark):
    from splink_spark.functions.udfs import register_udfs

    register_udfs(spark)


def _gamma_for(spark, comp, pairs_rows, schema):
    df = spark.createDataFrame(pairs_rows, schema=schema)
    out = df.withColumn("g", comp.gamma_expr())
    return [r["g"] for r in out.orderBy("pair_id").collect()]


def test_date_comparison_levels(spark):
    comp = date_comparison(
        "dob", cast_strings_to_date=True, invalid_dates_as_null=True
    )
    # gamma order: else=0 rising to exact at the top
    rows = [
        (0, "1990-03-07", "1990-03-07"),   # exact
        (1, "1990-03-07", "1990-03-01"),   # DL 1 on text (also 6d diff)
        (2, "1990-03-07", "1990-07-03"),   # day/month swap: 118d band
        (3, "1990-03-07", "1991-01-01"),   # within 365d
        (4, "1990-03-07", "1999-12-31"),   # within 3650d
        (5, "1990-03-07", "2005-01-01"),   # else
        (6, "1990-03-07", "not-a-date"),   # invalid -> null level
        (7, None, "1990-03-07"),           # null
    ]
    g = _gamma_for(
        spark, comp, rows, "pair_id long, dob_l string, dob_r string"
    )
    n_levels = 6  # exact, DL, 3 datediff bands, else
    assert g[0] == n_levels - 1            # exact = highest gamma
    assert g[1] == n_levels - 2            # DL<=1
    assert g[2] == n_levels - 4            # 118d: not <=30, yes <=365
    assert g[3] == n_levels - 4
    assert g[4] == n_levels - 5
    assert g[5] == 0
    assert g[6] == -1 and g[7] == -1


def test_forename_surname_levels(spark):
    comp = forename_surname_comparison("first_name", "surname")
    rows = [
        (0, "john", "smith", "john", "smith"),    # exact both
        (1, "john", "smith", "smith", "john"),    # reversed
        (2, "jonh", "smith", "john", "smith"),    # jw both fuzzy
        (3, "mary", "smith", "john", "smith"),    # surname only
        (4, "john", "jones", "john", "smith"),    # forename only
        (5, "mary", "jones", "john", "smith"),    # else
        (6, None, "jones", "john", None),         # null both sides
    ]
    schema = (
        "pair_id long, first_name_l string, surname_l string, "
        "first_name_r string, surname_r string"
    )
    g = _gamma_for(spark, comp, rows, schema)
    assert g == [5, 4, 3, 2, 1, 0, -1]


def test_postcode_comparison_levels(spark):
    comp = postcode_comparison("postcode")
    rows = [
        (0, "SW1A 1AA", "SW1A 1AA"),  # exact
        (1, "SW1A 1AA", "SW1A 1ZZ"),  # same sector
        (2, "SW1A 1AA", "SW1A 9XX"),  # same district
        (3, "SW1A 1AA", "SW2 4QQ"),   # same area
        (4, "SW1A 1AA", "N1 7AB"),    # else
        (5, None, "N1 7AB"),          # null
    ]
    schema = "pair_id long, postcode_l string, postcode_r string"
    g = _gamma_for(spark, comp, rows, schema)
    assert g == [4, 3, 2, 1, 0, -1]


def test_email_comparison_levels(spark):
    comp = email_comparison("email")
    rows = [
        (0, "a.smith1@x.com", "a.smith1@x.com"),  # exact
        (1, "a.smith1@x.com", "a.smith1@y.org"),  # username exact
        (2, "a.smith1@x.com", "a.smiht1@y.org"),  # username fuzzy
        (3, "a.smith1@x.com", "b.jones9@x.com"),  # domain only
        (4, "a.smith1@x.com", "b.jones9@y.org"),  # else
        (5, None, "b.jones9@y.org"),              # null
    ]
    schema = "pair_id long, email_l string, email_r string"
    g = _gamma_for(spark, comp, rows, schema)
    assert g == [4, 3, 2, 1, 0, -1]


def test_name_comparison_phonetic_level(spark):
    comp = name_comparison("surname", phonetic_method="dmetaphone")
    rows = [
        (0, "smith", "smith"),    # exact
        (1, "smith", "smyth"),    # jw >= 0.95 wins over phonetic
        (2, "catherine", "kathryn"),  # phonetic (jw 0.75-ish)
        (3, "smith", "patel"),    # else
    ]
    schema = "pair_id long, surname_l string, surname_r string"
    g = _gamma_for(spark, comp, rows, schema)
    n = 5  # exact, jw.95, jw.88, dmetaphone, else
    assert g[0] == n - 1
    assert g[1] in (n - 2, n - 3)
    assert g[2] == 1              # dmetaphone level
    assert g[3] == 0


def test_templates_on_persons_fixture(spark):
    persons = persons_dataframe(spark, n_entities=80, seed=7)
    settings = Settings(
        comparisons=[
            forename_surname_comparison(),
            date_comparison("dob", cast_strings_to_date=True),
            postcode_comparison(),
            email_comparison(),
        ],
        blocking_rules=[BlockingRule(rule="l.city = r.city")],
    )
    pairs = block_using_rules(
        persons,
        settings.blocking_rules,
        uid="unique_id",
        retain_columns=[
            "first_name", "surname", "dob", "postcode", "email",
        ],
    )
    vectors = compute_comparison_vectors(pairs, settings)
    agg = vectors.agg(
        F.count("*").alias("n"),
        *[
            F.max(c.gamma_column).alias(c.gamma_column)
            for c in settings.comparisons
        ],
    ).collect()[0]
    assert agg["n"] > 0
    # every template reaches its top (exact) level somewhere in the data
    assert agg["gamma_first_name_surname"] == 5
    assert agg["gamma_dob"] == 5
    assert agg["gamma_postcode"] == 4
    assert agg["gamma_email"] == 4
    # corruption ops land in intermediate levels too
    dist = (
        vectors.groupBy("gamma_postcode").count().collect()
    )
    seen = {r["gamma_postcode"] for r in dist}
    # city-blocked pairs share the postcode area by construction, so
    # the else level never fires here; area level (1) stands in
    assert {1, 4} <= seen


def test_templates_json_roundtrip(spark):
    """Template-built Settings survive to_dict/from_dict byte-exactly
    (sql_condition overrides and tf fields included) and produce the
    same gammas after the round trip."""
    from splink_spark.model import Settings

    settings = Settings(
        comparisons=[
            forename_surname_comparison(),
            date_comparison("dob", cast_strings_to_date=True),
            postcode_comparison(),
            email_comparison(),
        ],
        blocking_rules=[BlockingRule(rule="l.city = r.city")],
    )
    d = settings.to_dict()
    back = Settings.from_dict(d)
    assert back.to_dict() == d
    rows = [(0, "SW1A 1AA", "SW1A 1ZZ")]
    comp = back.comparisons[2]  # postcode
    df = spark.createDataFrame(
        rows, "pair_id long, postcode_l string, postcode_r string"
    )
    assert df.withColumn("g", comp.gamma_expr()).collect()[0]["g"] == 3
