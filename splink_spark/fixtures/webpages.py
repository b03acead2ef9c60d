"""Deterministic Common-Crawl-style web-page corpus with planted
near-duplicate clusters (FIXTURES.md §3; BASELINE.json input_hint).

Schema: url:string, warc_ts:timestamp, html:binary, text:string,
lang:string — plus unique_id and a ground-truth entity_id (label; never
a model input). A labels table gives pairwise ground truth.

Planted structure:
- entities get 1..max_copies pages (recrawls/mirrors);
- url variants: query strings, mirror domains (exercises the url-domain
  blocking key);
- text corruption: token dropout/insertion (exercises shingle-MinHash);
- title jitter: case/punctuation (exercises the normalized-title key);
- domain popularity is Zipf-skewed (hot-key skew exercise).

``html`` is the deterministic wrapper
``<html><title>{t}</title><body>{text}</body></html>`` utf-8 encoded;
the byte-identity invariant is that extracting text from html
reproduces the ``text`` column exactly.

Randomness is PER ENTITY: ``default_rng([seed, entity_id])`` — so the
corpus is identical whether generated on the driver
(:func:`generate_corpus`) or fanned out over executors
(:func:`distributed_corpus`), at any partitioning. unique_id is
``entity_id * max_copies + copy`` (gaps where an entity has fewer
copies), which keeps ids stable without a global counter.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOCAB = [
    # small english-ish vocabulary; enough distinct words that random
    # 40-120-token docs rarely collide on 3-shingles
    w + s
    for w in (
        "data spark table query scan merge sort join filter group index "
        "page web crawl text token shingle hash block match cluster score "
        "model train probability weight edge graph node link record field "
        "value store batch stream row column engine plan stage task core "
        "memory disk network partition shuffle broadcast skew salt key "
        "domain title body anchor href image video audio frame sample "
        "signal noise alpha beta gamma delta epsilon theta lambda sigma"
    ).split()
    for s in ("", "s", "er", "ing")
]

_TLDS = ["com", "org", "net", "io", "dev"]

_PAGE_COLS = [
    "unique_id",
    "url",
    "warc_ts",
    "html",
    "text",
    "lang",
    "title",
    "entity_id",
    "base_domain",
]


def _corpus_env(n_domains: int):
    vocab = np.array(_VOCAB)
    ranks = np.arange(1, n_domains + 1)
    dom_p = (1.0 / ranks) / (1.0 / ranks).sum()
    domains = np.array(
        [f"site{i}.{_TLDS[i % len(_TLDS)]}" for i in range(n_domains)]
    )
    langs = np.array(["en", "en", "en", "es", "fr", "de"])
    base_ts = datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp()
    return vocab, domains, dom_p, langs, base_ts


def _entity_rows(
    e: int,
    seed: int,
    max_copies: int,
    dropout: float,
    env,
) -> list[tuple]:
    """All page rows for one entity, from its OWN rng stream — the unit
    of determinism both generation paths share."""
    vocab, domains, dom_p, langs, base_ts = env
    rng = np.random.default_rng([seed, e])
    n_tok = int(rng.integers(40, 120))
    base_tokens = vocab[rng.integers(0, len(vocab), n_tok)]
    title_tokens = vocab[
        rng.integers(0, len(vocab), int(rng.integers(3, 7)))
    ]
    base_title = " ".join(title_tokens).title()
    domain = domains[rng.choice(len(domains), p=dom_p)]
    lang = str(langs[rng.integers(0, len(langs))])
    path = "/".join(vocab[rng.integers(0, len(vocab), 2)])
    n_copies = int(rng.integers(1, max_copies + 1))
    rows = []
    for c in range(n_copies):
        toks = base_tokens
        title = base_title
        page_domain = domain
        url = f"https://{domain}/{path}"
        if c > 0:
            # token dropout + insertion (near-dup, not exact)
            keep = rng.random(len(toks)) > dropout
            toks = toks[keep]
            n_ins = int(rng.integers(0, 3))
            if n_ins:
                ins_pos = rng.integers(0, max(len(toks), 1), n_ins)
                toks = np.insert(
                    toks, ins_pos, vocab[rng.integers(0, len(vocab), n_ins)]
                )
            # title jitter: case + punctuation
            jitter = int(rng.integers(0, 3))
            if jitter == 1:
                title = base_title.upper()
            elif jitter == 2:
                title = base_title.lower().replace(" ", " - ", 1)
            # url variant: query string or mirror domain
            variant = int(rng.integers(0, 3))
            if variant == 0:
                url = f"https://{domain}/{path}?ref={c}"
            elif variant == 1:
                page_domain = "mirror-" + domain
                url = f"https://{page_domain}/{path}"
            else:
                url = f"https://{domain}/{path}#s{c}"
        text = " ".join(toks.tolist())
        html = (
            f"<html><title>{title}</title><body>{text}</body></html>"
        ).encode("utf-8")
        ts = datetime.fromtimestamp(
            base_ts + float(rng.integers(0, 180 * 86400)), tz=timezone.utc
        )
        rows.append(
            (
                e * max_copies + c,
                url,
                ts,
                html,
                text,
                lang,
                title,
                e,
                str(domain),
            )
        )
    return rows


def generate_corpus(
    n_entities: int = 200,
    seed: int = 42,
    max_copies: int = 4,
    n_domains: int = 40,
    dropout: float = 0.04,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Driver-side path: returns (pages_df, labels_df) as pandas frames.

    pages: unique_id, url, warc_ts, html(bytes), text, lang, title,
           entity_id
    labels: unique_id_l, unique_id_r, is_match — all positive pairs plus
            same-domain negative pairs (ground truth at the fixed
            blocking keys).
    """
    env = _corpus_env(n_domains)
    rows: list[tuple] = []
    for e in range(n_entities):
        rows.extend(_entity_rows(e, seed, max_copies, dropout, env))
    pages = pd.DataFrame(rows, columns=_PAGE_COLS)

    # labels: all positive pairs + same-base-domain negatives. Negatives
    # are consecutive same-domain pages (k=1..3 ahead), NOT the full
    # same-domain self-join — with Zipf-skewed domains the hot domain
    # alone would make that quadratic (~10^8 pairs at bench scale).
    pos = pages.merge(pages, on="entity_id", suffixes=("_l", "_r"))
    pos = pos[pos.unique_id_l < pos.unique_id_r][
        ["unique_id_l", "unique_id_r"]
    ].assign(is_match=True)
    by_dom = pages.sort_values(["base_domain", "unique_id"])
    negs = []
    for k in (1, 2, 3):
        shifted = by_dom.groupby("base_domain")[["unique_id", "entity_id"]].shift(-k)
        mask = shifted.entity_id.notna() & (
            shifted.entity_id != by_dom.entity_id
        )
        negs.append(
            pd.DataFrame(
                {
                    "unique_id_l": by_dom.unique_id[mask],
                    "unique_id_r": shifted.unique_id[mask].astype("int64"),
                }
            )
        )
    neg = pd.concat(negs, ignore_index=True)
    neg[["unique_id_l", "unique_id_r"]] = pd.DataFrame(
        {
            "unique_id_l": neg.min(axis=1),
            "unique_id_r": neg.max(axis=1),
        }
    )
    neg = neg.drop_duplicates().assign(is_match=False)
    # positives win on collision (same pair can appear via both paths)
    neg = neg.merge(
        pos[["unique_id_l", "unique_id_r"]],
        on=["unique_id_l", "unique_id_r"],
        how="left",
        indicator=True,
    )
    neg = neg[neg._merge == "left_only"][
        ["unique_id_l", "unique_id_r", "is_match"]
    ]
    labels = pd.concat([pos, neg], ignore_index=True)
    return pages.drop(columns=["base_domain"]), labels


_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("unique_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("entity_id", T.LongType(), False),
    ]
)

_PAGES_SCHEMA_WITH_DOMAIN = T.StructType(
    _PAGES_SCHEMA.fields
    + [T.StructField("base_domain", T.StringType(), False)]
)

_LABELS_SCHEMA = T.StructType(
    [
        T.StructField("unique_id_l", T.LongType(), False),
        T.StructField("unique_id_r", T.LongType(), False),
        T.StructField("is_match", T.BooleanType(), False),
    ]
)


def corpus_dataframes(
    spark: SparkSession, n_entities: int = 200, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Driver-generated corpus as Spark DataFrames (small scales)."""
    pages, labels = generate_corpus(n_entities=n_entities, seed=seed)
    return (
        spark.createDataFrame(pages, schema=_PAGES_SCHEMA),
        spark.createDataFrame(labels, schema=_LABELS_SCHEMA),
    )


def distributed_corpus(
    spark: SparkSession,
    n_entities: int = 200,
    seed: int = 42,
    max_copies: int = 4,
    n_domains: int = 40,
    dropout: float = 0.04,
    partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Executor-side path: the SAME corpus as :func:`generate_corpus`
    (per-entity rng makes the two paths bit-identical), generated in
    parallel via mapInPandas over the entity range — the driver never
    materialises a single page. This is the scale path: at sf1+ the
    driver-side loop becomes the bottleneck (and at real scale would
    not fit at all).

    Labels are likewise built distributed: positives via an equi
    self-join on entity_id, negatives via one window pass per domain
    (three leads in a single projection), anti-joined against
    positives.
    """
    parts = partitions or max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches):
        env = _corpus_env(n_domains)
        for pdf in batches:
            rows: list[tuple] = []
            for e in pdf["id"]:
                rows.extend(
                    _entity_rows(int(e), seed, max_copies, dropout, env)
                )
            out = pd.DataFrame(rows, columns=_PAGE_COLS)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
            yield out

    pages_b = spark.range(0, n_entities, 1, parts).mapInPandas(
        gen, _PAGES_SCHEMA_WITH_DOMAIN
    )

    # The returned pages frame (base_domain dropped) is what callers
    # persist; deriving the label inputs from THAT frame (re-deriving
    # base_domain from the url host, stripping the mirror- prefix —
    # byte-identical to the generator's base_domain) lets the label
    # subtree hit the caller's cache instead of re-running the Python
    # generator. The narrow ids frame is additionally persisted (persist,
    # not a lazy checkpoint: the label plan's broadcast subqueries run
    # concurrently, and block-level cache locking is the only barrier
    # that stops two of them racing to materialize it twice): without
    # any barrier the label plan embeds the MapInPandas generator once
    # per join/window consumer (measured 5 generator executions for one
    # labels.count()); with it the generator runs at most once here.
    pages_ret = pages_b.drop("base_domain")

    ids = pages_ret.select(
        "unique_id",
        "entity_id",
        F.regexp_replace(
            F.parse_url(F.col("url"), F.lit("HOST")), r"^mirror-", ""
        ).alias("base_domain"),
    ).persist()
    pos = (
        ids.alias("l")
        .join(
            ids.alias("r"),
            F.expr("l.entity_id = r.entity_id AND l.unique_id < r.unique_id"),
        )
        .select(
            F.col("l.unique_id").alias("unique_id_l"),
            F.col("r.unique_id").alias("unique_id_r"),
            F.lit(True).alias("is_match"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("base_domain").orderBy("unique_id")
    leads = ids.select(
        "unique_id",
        "entity_id",
        *[
            F.lead("unique_id", k).over(w).alias(f"nid{k}")
            for k in (1, 2, 3)
        ],
        *[
            F.lead("entity_id", k).over(w).alias(f"neid{k}")
            for k in (1, 2, 3)
        ],
    )
    stacked = leads.selectExpr(
        "unique_id",
        "entity_id",
        "stack(3, nid1, neid1, nid2, neid2, nid3, neid3) AS (nid, neid)",
    )
    # No distinct / anti-join needed (they were plan-wave no-ops the
    # pandas driver path pays only once at small scale): the window is
    # ordered by unique_id, so every lead is strictly greater than the
    # current id (least/greatest never reorder) and each unordered pair
    # is produced by exactly one (row, k) — pairs are unique by
    # construction; and negatives require neid != entity_id while every
    # positive is a same-entity pair, so the two sets are disjoint.
    neg = (
        stacked.filter("nid IS NOT NULL AND neid != entity_id")
        .select(
            F.least("unique_id", "nid").alias("unique_id_l"),
            F.greatest("unique_id", "nid").alias("unique_id_r"),
        )
        .withColumn("is_match", F.lit(False))
    )
    labels = pos.unionByName(neg)
    return pages_ret, labels
