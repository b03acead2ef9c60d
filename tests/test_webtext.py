"""End-to-end web dedupe: byte-identity invariant and pairwise F1 >= 0.99
at the fixed blocking keys (BASELINE.json acceptance)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from splink_spark.fixtures.webpages import corpus_dataframes, generate_corpus
from splink_spark.functions.text import (
    minhash_band_sql,
    doc_fingerprint,
    doc_fingerprint_sql,
)
from splink_spark.operators.accuracy import pairwise_f1_from_clusters
from splink_spark.operators.webtext import (
    extract_text_from_html,
    extract_title_from_html,
    prepare_pages,
    web_dedupe_settings,
)
from splink_spark.plans.linker import Linker


@pytest.fixture(scope="module")
def corpus(spark):
    return corpus_dataframes(spark, n_entities=250, seed=42)


def test_text_extraction_byte_identical(corpus):
    pages, _ = corpus
    ext = pages.withColumn("ext", extract_text_from_html("html"))
    assert ext.filter("ext != text").count() == 0
    t = pages.withColumn("t2", extract_title_from_html("html"))
    assert t.filter("t2 != title").count() == 0


def test_end_to_end_f1(corpus):
    pages, labels = corpus
    prepared = prepare_pages(pages)
    linker = Linker(prepared, web_dedupe_settings())
    preds = linker.predict(threshold_match_probability=0.5)
    clusters = linker.cluster_pairwise_predictions_at_threshold(preds, 0.9)
    m = pairwise_f1_from_clusters(clusters, labels)
    assert m["f1"] >= 0.99, m


def test_minhash_band_matches_duckdb(spark):
    pages, _ = generate_corpus(n_entities=30, seed=5)
    sdf = spark.createDataFrame(pages[["unique_id", "text"]])
    from splink_spark.functions.text import word_shingles, minhash_band

    got = {
        r["unique_id"]: r["mh"]
        for r in sdf.select(
            "unique_id", minhash_band(word_shingles("text", 3), 0).alias("mh")
        ).collect()
    }
    con = duckdb.connect()
    con.register("pages", pages[["unique_id", "text"]])
    exp = {
        r[0]: r[1]
        for r in con.execute(
            f"select unique_id, {minhash_band_sql('text', 0, 3)} from pages"
        ).fetchall()
    }
    assert got == exp


def test_fingerprint_matches_duckdb(spark):
    pages, _ = generate_corpus(n_entities=20, seed=6)
    sdf = spark.createDataFrame(pages[["unique_id", "text"]])
    got = {
        r["unique_id"]: r["fp"]
        for r in sdf.select(
            "unique_id", doc_fingerprint("text").alias("fp")
        ).collect()
    }
    con = duckdb.connect()
    con.register("pages", pages[["unique_id", "text"]])
    exp = {
        r[0]: r[1]
        for r in con.execute(
            f"select unique_id, {doc_fingerprint_sql('text')} from pages"
        ).fetchall()
    }
    assert got == exp


def test_empty_token_arrays_score_without_ansi_error(spark):
    """Two empty-token documents (blank/whitespace text) must fall to
    the else level, not throw DIVIDE_BY_ZERO under ANSI mode."""
    from splink_spark.operators.vectors import compute_comparison_vectors
    from splink_spark.operators.webtext import web_dedupe_settings

    df = spark.createDataFrame(
        [
            (1, 2, [], [], "t", "t", "d", "d"),
            (3, 4, ["a"], [], "t", "t", "d", "d"),
            (5, 6, ["a", "b"], ["a", "b"], "t", "t", "d", "d"),
        ],
        "unique_id_l long, unique_id_r long, "
        "text_tokens_l array<string>, text_tokens_r array<string>, "
        "bk_title_l string, bk_title_r string, "
        "bk_domain_l string, bk_domain_r string",
    )
    rows = {
        r["unique_id_l"]: r
        for r in compute_comparison_vectors(
            df, web_dedupe_settings()
        ).collect()
    }
    assert rows[1]["jac_text"] is None  # empty vs empty: undefined
    assert rows[1]["gamma_text"] == 0  # else level
    assert rows[3]["jac_text"] == 0.0
    assert rows[5]["jac_text"] == 1.0
    assert rows[5]["gamma_text"] == 2  # top jaccard level


def test_distributed_corpus_equals_driver_corpus(spark):
    """mapInPandas generation is bit-identical to the driver loop, at
    ANY partition count (per-entity rng), and the distributed labels
    reproduce the pandas label set exactly."""
    from splink_spark.fixtures.webpages import (
        corpus_dataframes,
        distributed_corpus,
    )

    d_pages, d_labels = corpus_dataframes(spark, n_entities=40, seed=9)
    for parts in (2, 7):
        x_pages, x_labels = distributed_corpus(
            spark, n_entities=40, seed=9, partitions=parts
        )
        a = sorted(
            (r["unique_id"], r["url"], bytes(r["html"]), r["text"],
             r["lang"], r["title"], r["entity_id"], r["warc_ts"])
            for r in d_pages.collect()
        )
        b = sorted(
            (r["unique_id"], r["url"], bytes(r["html"]), r["text"],
             r["lang"], r["title"], r["entity_id"], r["warc_ts"])
            for r in x_pages.collect()
        )
        assert a == b
        la = sorted(map(tuple, d_labels.collect()))
        lb = sorted(map(tuple, x_labels.collect()))
        assert la == lb


def test_canonical_url_vectors_and_duckdb_parity(spark):
    import duckdb

    from splink_spark.operators.webtext import (
        canonical_url,
        canonical_url_sql,
    )

    vec = [
        "HTTP://Example.COM:80/Path/?utm_source=x&q=1#frag",
        "https://A.b:443/",
        "https://a.b/x/y/?utm_a=1&utm_b=2",
        "http://h/p1/p2/",
        "http://h/?gclid=abc",
        "http://h:8080/x?fbclid=z&keep=1",
        "ftp://Host/X",
        "http://h/p//",
        "https://site.io:443?x=1",
        "http://plain.example/doc",
    ]
    want = {
        vec[0]: "http://example.com/Path/?q=1",
        vec[1]: "https://a.b/",
        vec[2]: "https://a.b/x/y",
        vec[3]: "http://h/p1/p2",
        vec[4]: "http://h/",
        vec[5]: "http://h:8080/x?keep=1",
        vec[6]: "ftp://host/X",
        vec[7]: "http://h/p",
        vec[8]: "https://site.io?x=1",
        vec[9]: "http://plain.example/doc",
    }
    df = spark.createDataFrame([(u,) for u in vec], ["u"])
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonical_url("u").alias("c")).collect()
    }
    assert got == want
    duck = dict(
        duckdb.sql(
            f"SELECT u, {canonical_url_sql('u')} FROM "
            f"(SELECT unnest({vec!r}) AS u)"
        ).fetchall()
    )
    assert duck == want
