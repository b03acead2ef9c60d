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


# ---------------------------------------------------------------------------
# repeated_spans
# ---------------------------------------------------------------------------

def test_repeated_spans_finds_planted_shared_sentence(spark):
    from splink_spark.operators.textprep import repeated_spans

    shared = "the quick brown fox jumps over the lazy sleeping dog tonight"
    rows = [
        (1, "alpha beta " + shared + " gamma delta epsilon zeta"),
        (2, shared + " unrelated tail words here padding more"),
        (3, "prefix words first then " + shared),
        (4, "completely different text with no repeats at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = repeated_spans(df, k=10, min_docs=2).collect()
    spans = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in out}
    # shared sentence is 11 tokens -> two 10-gram positions, one span
    assert 4 not in spans
    # doc 1: shared at tokens 3..13
    assert spans[1] == (3, 13)
    # doc 2: shared at tokens 1..11
    assert spans[2] == (1, 11)
    # doc 3: shared at tokens 5..15
    assert spans[3] == (5, 15)
    for r in out:
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1


def test_repeated_spans_merges_overlapping_islands(spark):
    from splink_spark.operators.textprep import repeated_spans

    # doc 5/6 share the first 14 tokens AND tokens 20.. (two spans in
    # doc 5 separated by a unique gap longer than k)
    common_a = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"
    common_b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (5, common_a + " u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 " + common_b),
        (6, common_a + " x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 " + common_b),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, k=10, min_docs=2).collect()
    )
    # common_a: 14 tokens at 1..14; common_b: 12 tokens at 26..37
    assert out == [(5, 1, 14), (5, 26, 37), (6, 1, 14), (6, 26, 37)]


def test_repeated_spans_duckdb_parity(spark, docs):
    from splink_spark.operators.textprep import (
        repeated_spans,
        repeated_spans_sql,
    )

    planted = docs.unionByName(
        docs.filter(F.col("unique_id") % 10 == 0).withColumn(
            "unique_id", F.col("unique_id") + F.lit(100000)
        )
    ).select("unique_id", "text")
    got = sorted(
        map(tuple, repeated_spans(planted, id_col="unique_id", k=10).collect())
    )
    pdf = planted.toPandas()
    con = duckdb.connect()
    con.register("t0", pdf)
    want = sorted(
        con.execute(
            repeated_spans_sql("t0", id_col="unique_id", k=10)
        ).fetchall()
    )
    assert got == want


def test_repeated_spans_ignores_empty_docs(spark):
    from splink_spark.operators.textprep import repeated_spans

    rows = [
        (1, ""),
        (2, "   "),
        (3, None),
        (4, "ordinary words that repeat nowhere at all in this corpus"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # regression: empty/whitespace docs used to share a phantom ""
    # gram and emit fake (1, 10) spans
    assert repeated_spans(df, k=10, min_docs=2).count() == 0
