"""Text-preparation operators for training-data pipelines: boilerplate
n-gram detection and PII redaction.

Not in the reference (splink links entities); these are corpus-hygiene
passes a Common-Crawl-scale text pipeline runs before training —
first-class here per the north rule, like operators/curation.py.

Scale notes:
- boilerplate detection is explode → one partial+final hash aggregate
  on the shingle key → filter; the join-back for per-doc ratios is an
  equi-join on the shingle (AQE-handled; the hot "the of and" shingles
  are exactly the boilerplate being measured, and the aggregate has
  map-side combine so hot keys collapse before the shuffle);
- PII redaction is pure native regexp column work (JVM codegen, no
  Python); patterns are written in the RE2-compatible subset (no
  lookaround, ASCII classes) so the identical pattern runs in the
  DuckDB oracle and any RE2-based scrubber downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from splink_spark.functions.text import word_shingles, word_shingles_sql


# ---------------------------------------------------------------------------
# boilerplate n-grams
# ---------------------------------------------------------------------------

def boilerplate_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 5,
) -> DataFrame:
    """k-word shingles that appear in >= ``min_docs`` DISTINCT documents
    — the shared-template / navigation-chrome detector.

    Output: (shingle, doc_freq), doc_freq >= min_docs. One explode +
    one hash aggregate; per-doc shingles are array_distinct'ed first so
    a shingle repeated within one doc counts once.
    """
    ex = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_shingles(text_col, k))
        ).alias("shingle"),
    )
    return (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
    )


def boilerplate_share(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 5,
) -> DataFrame:
    """Per-document boilerplate measure: the share of the doc's DISTINCT
    k-shingles that are corpus boilerplate (doc_freq >= min_docs).

    Output: (id_col, n_shingles, n_boilerplate, boilerplate_share).
    Documents above a share threshold are template pages / chrome-heavy
    pages a curation pass drops or de-weights.

    Deliberate two-pass design: the shingle explode runs twice (once
    into the doc-frequency aggregate, once into the join-back). The
    one-pass alternative — a count window partitioned by shingle —
    buffers each shingle's whole partition in the window exec, and the
    hot shingles ARE the boilerplate (up to one row per document), so
    it OOMs exactly on the target workload. The aggregate's map-side
    combine collapses hot keys before the shuffle; recomputing the
    explode is a CPU cost, not a memory cliff. Callers who already
    persist the exploded frame can pass it through
    ``boilerplate_ngrams`` themselves.
    """
    from splink_spark.functions.text import word_shingle_hashes

    # The per-doc ratios only test shingle EQUALITY, so the census and
    # the join-back run on word_shingle_hashes longs, not the ~k-word
    # strings (boilerplate_ngrams keeps strings — its OUTPUT is the
    # shingle text). keep_empty=True preserves the historical ""
    # pseudo-shingle membership for empty docs.
    hashed = F.array_distinct(
        word_shingle_hashes(text_col, k, keep_empty=True)
    )
    boiler = (
        df.select(F.col(id_col), F.explode(hashed).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
        .select("shingle", F.lit(1).alias("__is_boiler"))
    )
    ex = df.select(
        F.col(id_col),
        F.explode(hashed).alias("shingle"),
    )
    per_doc = (
        ex.join(boiler, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.coalesce("__is_boiler", F.lit(0)))
            .cast("long")
            .alias("n_boilerplate"),
        )
    )
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_boilerplate",
        (
            F.col("n_boilerplate") / F.greatest(F.col("n_shingles"), F.lit(1))
        ).alias("boilerplate_share"),
    )


def boilerplate_ngrams_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 5,
) -> str:
    """DuckDB replay of boilerplate_ngrams (shared shingle builder)."""
    sh = word_shingles_sql(text_col, k)
    return (
        f"SELECT shingle, CAST(count(*) AS BIGINT) AS doc_freq FROM ("
        f"SELECT {id_col}, unnest(list_distinct({sh})) AS shingle "
        f"FROM {table}) GROUP BY shingle HAVING count(*) >= {min_docs}"
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2-compatible subset (no lookaround, ASCII classes): the SAME pattern
# string runs in Spark (java.util.regex), DuckDB (RE2), and any
# RE2-based downstream scrubber. Order matters and is fixed:
# email → ipv4 → phone (the email/ip patterns cannot overlap; phone
# runs last so it can't eat the digit runs inside an ip).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    "ipv4": (
        r"\b(\d{1,3}\.){3}\d{1,3}\b",
        "[IP]",
    ),
    "phone": (
        r"\+\d[\d -]{6,}\d",
        "[PHONE]",
    ),
}


def redact_pii(
    text: Column | str, kinds: tuple[str, ...] = ("email", "ipv4", "phone")
) -> Column:
    """Redacted copy of ``text``: every PII match replaced by its
    placeholder, applied in the fixed documented order."""
    c = F.col(text) if isinstance(text, str) else text
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(
    text: Column | str, kinds: tuple[str, ...] = ("email", "ipv4", "phone")
) -> dict[str, Column]:
    """Per-kind match counts (named ``n_<kind>``), computed in the same
    order as redaction so counts describe what redact_pii removed."""
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        out[f"n_{kind}"] = (
            F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{kind}")
        )
        c = F.regexp_replace(c, pat, repl)
    return out


def redact_pii_sql(expr: str, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> str:
    """DuckDB replay of redact_pii (RE2, global flag). Backslashes are
    LITERAL inside DuckDB single-quoted strings, so the pattern embeds
    verbatim — only quotes need escaping."""
    c = expr
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        pat_sql = pat.replace("'", "''")
        c = f"regexp_replace({c}, '{pat_sql}', '{repl}', 'g')"
    return c


def pii_counts_sql(
    expr: str, kinds: tuple[str, ...] = ("email", "ipv4", "phone")
) -> dict[str, str]:
    """DuckDB replay of pii_counts: count on the progressively-redacted
    text, mirroring the Spark order exactly."""
    c = expr
    out: dict[str, str] = {}
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        pat_sql = pat.replace("'", "''")
        out[f"n_{kind}"] = (
            f"CAST(len(regexp_extract_all({c}, '{pat_sql}')) AS BIGINT)"
        )
        c = f"regexp_replace({c}, '{pat_sql}', '{repl}', 'g')"
    return out


# ---------------------------------------------------------------------------
# repeated-span detection (exact-substring dedup, Lee et al. style)
# ---------------------------------------------------------------------------

def repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal token spans of each document whose every k-gram also
    appears in >= ``min_docs`` distinct documents — the span-level
    exact-substring duplication signal ("Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2022, re-expressed as
    relational passes instead of a suffix array).

    Output: (id_col, span_start, span_end, span_tokens) — 1-based
    token indices, spans maximal (overlapping/adjacent repeated
    k-grams merged).

    Scale shape: positions table is one row per token (linear),
    k-gram doc-frequency census is distinct + one hash aggregate,
    the repeated-gram join is an equi-join with NO fan-out (the
    census side is distinct grams), and island-merging windows
    partition by document — every shuffle is key-bounded, nothing
    approaches the n² pair space or a global sort.
    """
    from pyspark.sql import Window

    from splink_spark.functions.text import word_shingle_hashes

    # k-gram keys as 64-bit hashes (word_shingle_hashes): the census
    # distinct/aggregate and the hits join move 8-byte longs instead of
    # ~10-word gram strings, and the k-token concat string build
    # disappears from the explode — equality semantics identical up to
    # the documented xxhash64 collision odds. keep_empty=False bakes in
    # the historical `length(gram) > 0` phantom-gram filter (empty docs
    # emit no position), so positions are unchanged.
    sh = word_shingle_hashes(text_col, k, keep_empty=False)
    # lazy checkpoint: the positions table feeds TWO consumers (the
    # doc-frequency census and the hits join). Without a barrier each
    # consumer re-tokenizes and re-hashes the full corpus — one whole
    # extra linear pass at every scale.
    grams = df.select(
        F.col(id_col),
        F.posexplode(sh).alias("__pos0", "__gram"),
    ).select(
        id_col,
        (F.col("__pos0") + 1).alias("pos"),
        F.col("__gram").alias("gram"),
    ).localCheckpoint(eager=False)
    census = (
        grams.select(id_col, "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
        .select("gram")
    )
    hits = grams.join(census, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    lag = F.lag("pos").over(w)
    new_island = F.when(
        lag.isNull() | (F.col("pos") - lag > k), 1
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = hits.withColumn(
        "__island", F.sum(new_island).over(wc)
    )
    return (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
        )
    )


def repeated_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_docs: int = 2,
) -> str:
    """DuckDB replay of repeated_spans: shared shingle builder,
    positional unnest via a struct list, identical island merging."""
    sh = word_shingles_sql(text_col, k)
    return f"""
        WITH grams AS (
            SELECT {id_col}, u.pos, u.gram FROM (
                SELECT {id_col}, unnest(list_transform(
                    generate_series(1, len({sh})),
                    i -> {{'pos': i, 'gram': ({sh})[i]}}
                )) AS u
                FROM {table}
            ) WHERE length(u.gram) > 0
        ), census AS (
            SELECT gram FROM (
                SELECT DISTINCT {id_col}, gram FROM grams
            ) GROUP BY gram HAVING count(*) >= {min_docs}
        ), hits AS (
            SELECT g.{id_col}, g.pos FROM grams g JOIN census USING (gram)
        ), isl AS (
            SELECT {id_col}, pos,
                   SUM(CASE WHEN prev IS NULL OR pos - prev > {k}
                       THEN 1 ELSE 0 END)
                       OVER (PARTITION BY {id_col} ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS island
            FROM (
                SELECT {id_col}, pos,
                       lag(pos) OVER (PARTITION BY {id_col} ORDER BY pos)
                           AS prev
                FROM hits
            )
        )
        SELECT {id_col},
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + {k - 1} AS BIGINT) AS span_end,
               CAST(max(pos) + {k - 1} - min(pos) + 1 AS BIGINT)
                   AS span_tokens
        FROM isl GROUP BY {id_col}, island
    """
