"""Web-text layer: html→text extraction and blocking-key derivation.

The north rule's input is an Iceberg/parquet table of Common-Crawl-style
pages (url, warc_ts, html:binary, text:string, lang). This module:

- extracts text/title from the html wrapper **byte-identically** (the
  per-row invariant: where ``text`` is provided it must equal the
  extraction output exactly);
- derives the three fixed blocking keys BASELINE.json names:
  url-domain, normalized-title, shingled-text MinHash bands;
- assembles the Settings for the web dedupe model.

All key derivation is native column expressions (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from splink_spark.functions.minhash_udf import make_minhash_udf
from splink_spark.functions.text import normalized_title_key, url_domain
from splink_spark.model import BlockingRule, Comparison, ComparisonLevel, Settings
from splink_spark.functions.comparators import (
    else_level,
    exact_match_level,
    null_level,
)


def extract_text_from_html(html_col: Column | str) -> Column:
    """Decode utf-8 html and extract the <body> payload.

    The fixture contract (FIXTURES.md §3): html is the wrapper
    ``<html><title>..</title><body>..</body></html>``; the extraction
    must reproduce the stored ``text`` byte-identically. DOTALL so body
    text may span newlines.
    """
    decoded = F.decode(html_col if not isinstance(html_col, str) else F.col(html_col), "UTF-8")
    return F.regexp_extract(decoded, r"(?s)<body>(.*)</body>", 1)


def extract_title_from_html(html_col: Column | str) -> Column:
    decoded = F.decode(html_col if not isinstance(html_col, str) else F.col(html_col), "UTF-8")
    return F.regexp_extract(decoded, r"(?s)<title>(.*?)</title>", 1)


def with_blocking_keys(
    pages: DataFrame,
    text_col: str = "text",
    title_col: str = "title",
    url_col: str = "url",
    minhash_bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Narrow keyed table: unique_id + ``bk_domain``, ``bk_title``,
    ``bk_minhash_0..n``, ``text_tokens`` (distinct) — everything the
    linkage pipeline needs; payload columns stay behind (join back by
    id when needed; carrying html/text through blocking would bloat
    every shuffle).

    Cost discipline (this stage is the per-row hot path at ingest):
    - ONE regex scan of the text (split on non-alphanumeric runs) —
      NOT lower+2×regexp_replace+split, and with a materialization
      barrier so projection collapse can't re-inline the scan into
      every consumer (measured 3x re-evaluation without it);
    - MinHash bands via the vectorized pandas UDF over the stored
      token sequence (the native HOF expression is ~100x slower).

    Mirror domains (``mirror-site.com``) normalize to their base domain
    so recrawl/mirror duplicates land in the same block.
    """
    out = pages
    if title_col not in pages.columns:
        if "html" in pages.columns:
            out = out.withColumn(title_col, extract_title_from_html("html"))
        else:
            # no title and no html (text-only corpus): the leading text
            # slice is the best available title surrogate — still a
            # deterministic, low-cardinality-safe blocking key
            out = out.withColumn(
                title_col, F.substring(F.col(text_col), 1, 80)
            )
    dom = url_domain(url_col)
    tok_seq = F.array_remove(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), ""
    )
    step1 = out.select(
        "unique_id",
        F.regexp_replace(dom, r"^mirror-", "").alias("bk_domain"),
        normalized_title_key(title_col).alias("bk_title"),
        tok_seq.alias("__tok_seq"),
    ).localCheckpoint(eager=False)

    sig = make_minhash_udf(minhash_bands, shingle_k)(F.col("__tok_seq"))
    keyed = step1.select(
        "unique_id",
        "bk_domain",
        "bk_title",
        # token SET as xxhash64 values, not strings: the scoring
        # cascade only needs intersect/union SIZES, and 8-byte long
        # comparisons beat variable-length string comparisons inside
        # array_intersect while shrinking every pair-shuffle row
        # (measured 2.2x on the 2M-sampled-pair scoring workload;
        # collision probability ~ (|tokens| choose 2) * 2^-64 per doc)
        F.array_distinct(
            F.transform("__tok_seq", lambda t: F.xxhash64(t))
        ).alias("text_tokens"),
        sig.alias("__mh_sig"),
    )
    keyed = keyed.select(
        "unique_id",
        "bk_domain",
        "bk_title",
        "text_tokens",
        *[
            F.element_at("__mh_sig", b + 1).alias(f"bk_minhash_{b}")
            for b in range(minhash_bands)
        ],
    )
    return keyed


def web_dedupe_settings(
    minhash_bands: int = 4,
    prior: float = 1e-4,
) -> Settings:
    """The flagship web dedupe model over derived keys.

    Blocking: same (base) domain AND same normalized title, OR any
    matching MinHash band (near-dup text). Comparisons: token Jaccard on
    text at two thresholds, exact normalized title, same domain.
    """
    def tok_jaccard(threshold: float, m: float, u: float) -> ComparisonLevel:
        # jaccard over the PRECOMPUTED __jac_text derived pair column
        # (see derived_pair_expressions below): one array_intersect per
        # PAIR, not one intersect+union per LEVEL — the arrays are
        # distinct-element, so |∪| = |l| + |r| - |∩| and the whole
        # jaccard needs a single traversal. Measured ~4x faster gamma
        # stage at 10M pairs vs the intersect+union-per-level form.
        return ComparisonLevel(
            label=f"token jaccard >= {threshold}",
            condition=f"jac_text >= {threshold}",
            m_probability=m,
            u_probability=u,
        )

    derived = {
        "__i_text": "size(array_intersect(text_tokens_l, text_tokens_r))",
        # try_divide: two EMPTY token arrays make the union size 0
        # (ANSI mode throws DIVIDE_BY_ZERO on plain /); NULL jaccard
        # falls through the threshold levels to the else level, which
        # is the right call for empty-vs-empty documents
        "jac_text": (
            "try_divide(__i_text, size(text_tokens_l) "
            "+ size(text_tokens_r) - __i_text)"
        ),
    }

    comparisons = [
        Comparison(
            output_column_name="text",
            input_columns=["text_tokens"],
            levels=[
                null_level("text_tokens"),
                tok_jaccard(0.9, m=0.90, u=1e-4),
                tok_jaccard(0.6, m=0.08, u=1e-3),
                else_level(m=0.02, u=0.9989),
            ],
        ),
        Comparison(
            output_column_name="title",
            input_columns=["bk_title"],
            levels=[
                null_level("bk_title"),
                exact_match_level("bk_title", m=0.85, u=1e-3),
                else_level(m=0.15, u=0.999),
            ],
        ),
        Comparison(
            output_column_name="domain",
            input_columns=["bk_domain"],
            levels=[
                null_level("bk_domain"),
                exact_match_level("bk_domain", m=0.95, u=0.02),
                else_level(m=0.05, u=0.98),
            ],
        ),
    ]
    rules = [
        BlockingRule(rule="l.bk_domain = r.bk_domain AND l.bk_title = r.bk_title"),
    ]
    for b in range(minhash_bands):
        rules.append(
            BlockingRule(rule=f"l.bk_minhash_{b} = r.bk_minhash_{b}")
        )
    return Settings(
        comparisons=comparisons,
        blocking_rules=rules,
        probability_two_random_records_match=prior,
        derived_pair_expressions=derived,
    )


def prepare_pages(pages: DataFrame, minhash_bands: int = 4) -> DataFrame:
    """Full preparation: derive the narrow keyed table (blocking keys +
    token arrays). The comparison levels consume ``text_tokens``; page
    payloads (html/text/...) join back by unique_id when needed."""
    return with_blocking_keys(pages, minhash_bands=minhash_bands)


# ---------------------------------------------------------------------------
# URL canonicalization (dedup key for near-identical URLs)
# ---------------------------------------------------------------------------
#
# Deterministic, documented normal form (native regexp columns, shared
# RE2-compatible patterns; replacement backreference SYNTAX differs by
# engine — $1 in java.util.regex, \1 in RE2 — so the SQL mirror swaps
# only the replacement strings, never the patterns):
#   1. strip the #fragment
#   2. lowercase scheme://host[:port] (the authority prefix only —
#      paths stay case-sensitive per RFC 3986)
#   3. drop default ports :80 (http) / :443 (https)
#   4. remove utm_*/gclid/fbclid tracking params, tidying separators
#   5. drop an empty trailing '?' and a trailing '/' on non-root paths

_URL_PREFIX_PAT = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
_TRACKING_PAT = r"(utm_[a-z]+|gclid|fbclid)=[^&#]*"


def canonical_url(col: Column | str) -> Column:
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, r"#.*$", "")
    prefix = F.regexp_extract(u, _URL_PREFIX_PAT, 0)
    # substring after the authority prefix (1-based)
    rest = u.substr(F.length(prefix) + 1, F.length(u))
    u = F.concat(F.lower(prefix), rest)
    # default ports — RE2-safe (no lookahead): capture the tail and
    # put it back ($2 is empty when the port ends the url)
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80($|[/?#].*)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443($|[/?#].*)", "$1$2")
    # tracking params: kill the pair, then tidy separators
    u = F.regexp_replace(u, _TRACKING_PAT, "")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    # trailing slash run on a non-root path
    u = F.regexp_replace(u, r"(://[^/?#]+/.*?)/+$", "$1")
    return u


def canonical_url_sql(expr: str) -> str:
    """DuckDB replay: identical patterns, RE2 replacement syntax
    (\\1 instead of $1), 'g' flag where the Spark side replaces
    globally (Spark regexp_replace is always global)."""
    u = expr
    u = f"regexp_replace({u}, '#.*$', '', 'g')"
    p = f"coalesce(regexp_extract({u}, '{_URL_PREFIX_PAT}', 0), '')"
    u = (
        f"(lower({p}) || substr({u}, length({p}) + 1))"
    )
    u = (
        f"regexp_replace({u}, '^(http://[^/?#:]*):80($|[/?#].*)', "
        f"'\\1\\2')"
    )
    u = (
        f"regexp_replace({u}, '^(https://[^/?#:]*):443($|[/?#].*)', "
        f"'\\1\\2')"
    )
    u = f"regexp_replace({u}, '{_TRACKING_PAT}', '', 'g')"
    u = f"regexp_replace({u}, '&&+', '&', 'g')"
    u = f"regexp_replace({u}, '\\?&', '?', 'g')"
    u = f"regexp_replace({u}, '[?&]+$', '', 'g')"
    u = f"regexp_replace({u}, '(://[^/?#]+/.*?)/+$', '\\1', 'g')"
    return u
