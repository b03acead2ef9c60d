"""Boilerplate n-gram detection + PII redaction: planted-template
recovery, explicit redaction vectors, and Spark↔DuckDB parity of the
shared RE2-subset patterns."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from splink_spark.operators.textprep import (
    PII_PATTERNS,
    boilerplate_ngrams,
    boilerplate_share,
    pii_counts,
    pii_counts_sql,
    redact_pii,
    redact_pii_sql,
)

TEMPLATE = (
    "homepage terms of service privacy policy contact us all rights reserved"
)


@pytest.fixture(scope="module")
def templated(spark, docs):
    """docs with a per-source template suffix: every doc in a source
    shares the suffix's internal 8-shingles."""
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit(" visit "), F.col("source"),
            F.lit(" " + TEMPLATE),
        ),
    ).localCheckpoint()


def test_boilerplate_ngrams_finds_planted_template(templated):
    out = boilerplate_ngrams(
        templated, id_col="unique_id", k=8, min_docs=5
    )
    rows = {r["shingle"]: r["doc_freq"] for r in out.collect()}
    # shingles fully inside the cross-source template appear in all
    # 500 docs
    all_doc_shingle = "terms of service privacy policy contact us all"
    assert rows.get(all_doc_shingle) == 500
    # shingles containing the source token appear in exactly that
    # source's 25 docs
    src_shingle = "visit src3 " + " ".join(TEMPLATE.split()[:6])
    assert rows.get(src_shingle) == 25
    # everything reported clears the threshold
    assert all(v >= 5 for v in rows.values())


def test_boilerplate_share_bounds_and_signal(templated, docs):
    out = boilerplate_share(
        templated, id_col="unique_id", k=8, min_docs=5
    ).collect()
    assert len(out) == docs.count()
    for r in out:
        assert 0 <= r["n_boilerplate"] <= r["n_shingles"]
        assert r["boilerplate_share"] == pytest.approx(
            r["n_boilerplate"] / max(r["n_shingles"], 1)
        )
    # every templated doc carries SOME boilerplate
    assert all(r["n_boilerplate"] > 0 for r in out)
    # but no doc is pure boilerplate (the organic text dominates)
    assert all(r["boilerplate_share"] < 1.0 for r in out)


REDACTION_VECTORS = [
    (
        "mail bob.smith+x@sub.example.co.uk now",
        "mail [EMAIL] now",
        {"n_email": 1, "n_ipv4": 0, "n_phone": 0},
    ),
    (
        "server 192.168.0.1 and 10.0.255.254 up",
        "server [IP] and [IP] up",
        {"n_email": 0, "n_ipv4": 2, "n_phone": 0},
    ),
    (
        "call +1 555 0123 456 or +44 20-7946-0958",
        "call [PHONE] or [PHONE]",
        {"n_email": 0, "n_ipv4": 0, "n_phone": 2},
    ),
    (
        "a@b.io at 8.8.8.8 dial +7 999 123 45 67 end",
        "[EMAIL] at [IP] dial [PHONE] end",
        {"n_email": 1, "n_ipv4": 1, "n_phone": 1},
    ),
    (
        "no pii here just words 42 and 3.14",
        "no pii here just words 42 and 3.14",
        {"n_email": 0, "n_ipv4": 0, "n_phone": 0},
    ),
]


def test_redact_pii_vectors(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(REDACTION_VECTORS)],
        ["i", "text"],
    )
    got = (
        df.select("i", redact_pii("text").alias("red"), *pii_counts("text").values())
        .orderBy("i")
        .collect()
    )
    for row, (_, want_red, want_counts) in zip(got, REDACTION_VECTORS):
        assert row["red"] == want_red
        for k, v in want_counts.items():
            assert row[k] == v, (k, row["red"])


def test_redact_pii_duckdb_parity(spark):
    """The SAME pattern strings produce the SAME redactions and counts
    in DuckDB's RE2 — the cross-engine contract the oracle relies on."""
    texts = [s for s, _, _ in REDACTION_VECTORS] + [
        "edge +12345678 and 1.2.3.4.5 and x@y.z",  # z TLD too short
        "a.b-c_d%e@f-g.h.ij plus 255.255.255.255",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], ["i", "text"])
    spark_rows = (
        df.select("i", redact_pii("text").alias("red"), *pii_counts("text").values())
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    counts = pii_counts_sql("text")
    duck = con.execute(
        f"SELECT i, {redact_pii_sql('text')} AS red, "
        f"{counts['n_email']} AS n_email, {counts['n_ipv4']} AS n_ipv4, "
        f"{counts['n_phone']} AS n_phone "
        f"FROM (SELECT unnest(range({len(texts)})) AS i, "
        f"unnest({texts!r}) AS text) ORDER BY i"
    ).fetchall()
    for srow, drow in zip(spark_rows, duck):
        assert srow["red"] == drow[1], (srow["red"], drow[1])
        assert (srow["n_email"], srow["n_ipv4"], srow["n_phone"]) == (
            drow[2], drow[3], drow[4],
        )


def test_pii_patterns_are_re2_safe():
    """Patterns must stay inside the RE2 subset: no lookaround, no
    backreferences — compile in RE2 via DuckDB."""
    con = duckdb.connect()
    for pat, _ in PII_PATTERNS.values():
        con.execute(
            f"SELECT regexp_matches('probe', '{pat.replace(chr(39), chr(39)*2)}')"
        )
