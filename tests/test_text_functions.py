"""Diacritic normalization parity + SimHash block-key scale census.

reference: splink/comparison_level_library.py (accent-normalisation
preprocessing convention); Manku et al. WWW'07 (simhash blocks).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from splink_spark.functions.text import (
    normalize_text,
    normalize_text_sql,
    strip_diacritics,
)
from splink_spark.operators.dedup import simhash_block_keys

ACCENTED = [
    "Crème BRÛLÉE — żółć, Ångström!",
    "ßtraße æon œuvre",
    "José Müller-Lüdenscheidt",
    "ŁÓDŹ piękna",  # uppercase accents must lower THEN transliterate
    "plain ascii stays put 123",
    "",
    None,
]


def test_normalize_text_spark_duckdb_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ACCENTED)], "i int, s string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_text("s").alias("n")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(ACCENTED):
        want = con.execute(
            f"SELECT {normalize_text_sql('?')}", [s]
        ).fetchone()[0]
        assert got[i] == want, (s, got[i], want)


def test_strip_diacritics_transliterates_not_deletes(spark):
    df = spark.createDataFrame([("żółć café",)], "s string")
    out = df.select(strip_diacritics(F.lower("s")).alias("t")).first()["t"]
    assert out == "zolc cafe"


def test_normalized_tokens_survive_for_accented_text(spark):
    # regression: round-1 normalize_text DELETED non-ascii chars, so
    # accented corpora lost most of their tokens
    df = spark.createDataFrame([("Ünïcode Wörter überall",)], "s string")
    out = df.select(normalize_text("s").alias("n")).first()["n"]
    assert out == "unicode worter uberall"


# ---------------------------------------------------------------------------
# SimHash block-triple scheme
# ---------------------------------------------------------------------------


def _flip_bits(v: int, bits: list[int]) -> int:
    for b in bits:
        v ^= 1 << b
    return v


def test_simhash_blocks_recall_exact_for_hamming_le_3(spark):
    """Pigeonhole guarantee: every pair within hamming<=3 shares at
    least one (combo, key) block-triple."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        base = rng.getrandbits(64)
        nflips = rng.randint(0, 3)
        bits = rng.sample(range(64), nflips)
        near = _flip_bits(base, bits)
        rows.append((2 * i, _signed(base)))
        rows.append((2 * i + 1, _signed(near)))
    fp = spark.createDataFrame(rows, "doc_id long, simhash long")
    keyed = simhash_block_keys(fp, "doc_id")
    hits = (
        keyed.alias("l")
        .join(
            keyed.alias("r"),
            F.expr(
                "l.combo = r.combo AND l.key = r.key "
                "AND l.doc_id + 1 = r.doc_id AND l.doc_id % 2 = 0"
            ),
        )
        .select(F.col("l.doc_id").alias("doc_id"))
        .distinct()
        .count()
    )
    assert hits == 200


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def test_simhash_candidate_volume_near_linear(spark):
    """Census: sum over (combo,key) buckets of C(size,2) is the join's
    candidate volume. With ~32-bit keys it must grow ~linearly in
    corpus size (the old 16-bit chunk scheme grew quadratically once
    buckets saturated)."""
    import random

    def volume(n: int) -> int:
        rng = random.Random(13)
        rows = [(i, _signed(rng.getrandbits(64))) for i in range(n)]
        fp = spark.createDataFrame(rows, "doc_id long, simhash long")
        keyed = simhash_block_keys(fp, "doc_id")
        census = keyed.groupBy("combo", "key").count()
        row = census.agg(
            F.sum(F.expr("count * (count - 1) / 2")).alias("vol")
        ).first()
        return int(row["vol"] or 0)

    v1 = volume(500)
    v10 = volume(5000)
    # random 64-bit fingerprints: essentially zero collisions at both
    # scales; allow a generous linear-plus-slack envelope
    assert v10 <= 15 * v1 + 50, (v1, v10)


# ---------------------------------------------------------------------------
# table registry / format layer
# ---------------------------------------------------------------------------


def test_registry_parquet_roundtrip(spark, tmp_path):
    from splink_spark.sources.registry import TableRegistry

    reg = TableRegistry(spark, str(tmp_path), fmt="parquet")
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    reg.write(df, "documents")
    back = reg.read("documents")
    assert back.count() == 10


def test_registry_iceberg_gated(spark, tmp_path):
    from splink_spark.sources.registry import TableRegistry, iceberg_available

    assert iceberg_available(spark) is False  # sandbox has no runtime jar
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        TableRegistry(spark, "cat.ns", fmt="iceberg")


def test_submit_pipeline_runs_locally(spark, tmp_path):
    import json
    import subprocess
    import sys

    docs = "/root/testdata/sf0.001/documents.parquet"
    inp = str(tmp_path / "pages.parquet")
    # shape the documents table into the north-rule page schema
    (
        spark.read.parquet(docs)
        .selectExpr(
            "concat('https://example.com/', cast(doc_id as string)) AS url",
            "text",
            "lang",
        )
        .limit(300)
        .write.mode("overwrite")
        .parquet(inp)
    )
    out = str(tmp_path / "clusters.parquet")
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools/submit_pipeline.py",
            "--input", inp, "--output", out,
        ],
        capture_output=True,
        text=True,
        timeout=900,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["n_pages"] == 300
    assert 0 < stats["n_clusters"] <= 300
    assert spark.read.parquet(out).columns  # readable output


def test_tokens_fast_split_matches_normalize_then_split(spark):
    """r6 optimization pin: tokens() is now ONE regex split
    (array_remove + empty-guard) instead of splitting normalize_text's
    output; the two formulations must agree on every input, including
    the empty/all-separator -> [""] and NULL -> NULL edge cases the
    downstream token_count/shingle short-row logic depends on."""
    from splink_spark.functions.text import tokens

    rows = [
        ("",),
        (None,),
        ("   ",),
        ("!!!",),
        ("a",),
        (" a-b,c ",),
        ("Héllo Wörld ß æ œ",),
        ("tab\tnewline\nmix",),
        ("ω symbols ✓ here",),
        ("a  b   c",),
        ("trailing punct...",),
        ("ŁÓDŹ piękna",),
    ]
    df = spark.createDataFrame(rows, "text string")
    old = F.split(normalize_text("text"), r"\s")
    bad = (
        df.select(tokens("text").alias("new"), old.alias("old"))
        .filter(~F.col("new").eqNullSafe(F.col("old")))
        .count()
    )
    assert bad == 0
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bad_docs = (
        docs.select(tokens("text").alias("new"), old.alias("old"))
        .filter(~F.col("new").eqNullSafe(F.col("old")))
        .count()
    )
    assert bad_docs == 0


def test_word_shingle_hashes_equality_matches_string_shingles(spark):
    """r6 optimization pin: word_shingle_hashes (token-hash-composed
    keys) must induce the same equality classes as the string shingles
    of word_shingles — same distinct count per doc and same cross-doc
    equality — on real fixture text."""
    from splink_spark.functions.text import word_shingle_hashes, word_shingles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    both = docs.select(
        F.array_distinct(word_shingles("text", 3)).alias("s"),
        F.array_distinct(word_shingle_hashes("text", 3, keep_empty=True)).alias("h"),
    )
    mismatch = both.filter(F.size("s") != F.size("h")).count()
    assert mismatch == 0
    # cross-doc: jaccard computed over strings == over hashes
    from splink_spark.operators.dedup import shingle_jaccard_pairs

    d = docs.limit(60)
    cands = (
        d.alias("l")
        .join(d.alias("r"), F.expr("l.doc_id < r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_id_l"),
            F.col("r.doc_id").alias("doc_id_r"),
        )
    )
    hashed_jac = shingle_jaccard_pairs(d, cands).select(
        "doc_id_l", "doc_id_r", "jaccard"
    )
    sh = d.select(
        F.col("doc_id"),
        F.array_distinct(word_shingles("text", 3)).alias("shingles"),
    )
    string_jac = (
        cands.join(
            sh.withColumnRenamed("doc_id", "doc_id_l").withColumnRenamed(
                "shingles", "sh_l"
            ),
            "doc_id_l",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_id_r").withColumnRenamed(
                "shingles", "sh_r"
            ),
            "doc_id_r",
        )
        .select(
            "doc_id_l",
            "doc_id_r",
            F.try_divide(
                F.size(F.array_intersect("sh_l", "sh_r")),
                F.size(F.array_union("sh_l", "sh_r")),
            ).alias("jaccard"),
        )
    )
    diff = (
        hashed_jac.join(string_jac, ["doc_id_l", "doc_id_r"])
        .filter(
            ~string_jac["jaccard"].eqNullSafe(hashed_jac["jaccard"])
        )
        .count()
    )
    assert diff == 0
