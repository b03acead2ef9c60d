"""Property fuzz for the curation operators: random corpora (random id
gaps, token counts incl. zeros/nulls, skewed strata) through BOTH
engines — Spark's distributed formulations vs DuckDB's plain-window
replays must agree bit for bit, at any parallelism, for any seed."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from splink_spark.operators.curation import (
    pack_token_shards,
    stratified_sample,
    weighted_mix,
)


def _random_corpus(rng: np.random.Generator, n: int) -> pd.DataFrame:
    ids = np.unique(rng.integers(0, n * 10, size=n))
    strata = rng.choice(
        ["a", "b", "c", "hot"], size=len(ids), p=[0.2, 0.15, 0.05, 0.6]
    )
    words = rng.integers(0, 40, size=len(ids))
    texts = [
        None if rng.random() < 0.05 else " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta"], size=w)
        )
        for w in words
    ]
    return pd.DataFrame({"doc_id": ids, "stratum": strata, "text": texts})


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_fuzz_pack_token_shards_vs_duckdb(spark, seed):
    rng = np.random.default_rng(seed)
    pdf = _random_corpus(rng, 400)
    df = spark.createDataFrame(pdf).repartition(int(rng.integers(2, 9)))
    budget = int(rng.integers(20, 200))
    got = sorted(
        map(
            tuple,
            pack_token_shards(
                df, budget_tokens=budget, id_col="doc_id"
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.register("t0", pdf)
    from splink_spark.functions.text import token_count_sql

    want = sorted(
        con.execute(
            f"WITH t AS (SELECT doc_id, "
            f"CAST(coalesce({token_count_sql('text')}, 0) AS BIGINT) "
            f"AS n_tokens, md5(CAST(doc_id AS VARCHAR)) AS k FROM t0) "
            f"SELECT doc_id, n_tokens, "
            f"CAST(ROW_NUMBER() OVER (ORDER BY k, doc_id) AS BIGINT), "
            f"CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY k, doc_id "
            f"ROWS UNBOUNDED PRECEDING) - n_tokens) / {budget}) AS BIGINT) "
            f"FROM t"
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", [7, 77])
def test_fuzz_stratified_sample_vs_duckdb(spark, seed):
    rng = np.random.default_rng(seed)
    pdf = _random_corpus(rng, 300)
    df = spark.createDataFrame(pdf).repartition(int(rng.integers(2, 9)))
    n = int(rng.integers(1, 30))
    over = float(rng.choice([2.0, 8.0]))
    got = sorted(
        (r["doc_id"], r["stratum"], r["sample_rank"])
        for r in stratified_sample(
            df,
            "stratum",
            n,
            id_col="doc_id",
            seed=seed,
            prefilter_oversample=over,
        ).collect()
    )
    con = duckdb.connect()
    con.register("t0", pdf)
    want = sorted(
        con.execute(
            f"SELECT doc_id, stratum, sample_rank FROM ("
            f"SELECT doc_id, stratum, ROW_NUMBER() OVER ("
            f"PARTITION BY stratum ORDER BY "
            f"md5(CAST(doc_id AS VARCHAR) || ':{seed}'), doc_id"
            f") AS sample_rank FROM t0) WHERE sample_rank <= {n}"
        ).fetchall()
    )
    assert got == want


def test_fuzz_weighted_mix_vs_duckdb(spark):
    rng = np.random.default_rng(99)
    pdf = _random_corpus(rng, 300)
    df = spark.createDataFrame(pdf)
    got = sorted(
        (r["doc_id"], r["stratum"])
        for r in weighted_mix(
            df,
            "stratum",
            {"a": 0.5, "hot": 0.25},
            total_rows=80,
            id_col="doc_id",
            seed=3,
        ).collect()
    )
    con = duckdb.connect()
    con.register("t0", pdf)
    want = sorted(
        con.execute(
            "SELECT doc_id, stratum FROM ("
            "SELECT doc_id, stratum, ROW_NUMBER() OVER ("
            "PARTITION BY stratum ORDER BY "
            "md5(CAST(doc_id AS VARCHAR) || ':3'), doc_id) AS rk FROM t0) t "
            "JOIN (VALUES ('a', 40), ('hot', 20)) q(s, quota) "
            "ON t.stratum = q.s WHERE rk <= quota"
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", [5, 55])
def test_fuzz_pii_redaction_vs_duckdb(spark, seed):
    """Random text with randomly embedded emails/ips/phones — Spark's
    java.util.regex and DuckDB's RE2 must redact and count identically
    (the RE2-subset contract under adversarial spacing/punctuation)."""
    from splink_spark.operators.textprep import (
        pii_counts,
        pii_counts_sql,
        redact_pii,
        redact_pii_sql,
    )

    rng = np.random.default_rng(seed)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "x9", "..", "-"]

    def rand_email():
        u = "".join(rng.choice(list("abcz09._%+-"), size=rng.integers(1, 8)))
        d = "".join(rng.choice(list("abcz09.-"), size=rng.integers(1, 6)))
        tld = "".join(rng.choice(list("abcz"), size=rng.integers(1, 4)))
        return f"{u}@{d}.{tld}"

    def rand_ip():
        return ".".join(str(rng.integers(0, 400)) for _ in range(4))

    def rand_phone():
        body = "".join(
            rng.choice(list("0123456789 -"), size=rng.integers(3, 14))
        )
        return f"+{rng.integers(0, 10)}{body}{rng.integers(0, 10)}"

    texts = []
    for _ in range(60):
        parts = list(rng.choice(words, size=rng.integers(0, 6)))
        for gen in (rand_email, rand_ip, rand_phone):
            if rng.random() < 0.7:
                parts.insert(int(rng.integers(0, len(parts) + 1)), gen())
        texts.append(" ".join(parts))

    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    got = (
        df.select(
            "i", redact_pii("text").alias("red"), *pii_counts("text").values()
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.register("t0", pdf)
    counts = pii_counts_sql("text")
    want = con.execute(
        f"SELECT i, {redact_pii_sql('text')} AS red, "
        f"{counts['n_email']}, {counts['n_ipv4']}, {counts['n_phone']} "
        f"FROM t0 ORDER BY i"
    ).fetchall()
    for srow, drow in zip(got, want):
        assert srow["red"] == drow[1], (srow["red"], drow[1])
        assert (srow["n_email"], srow["n_ipv4"], srow["n_phone"]) == (
            drow[2], drow[3], drow[4],
        )
