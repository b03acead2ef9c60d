"""Training-data curation operators: deterministic stratified sampling,
token-budget shard packing, and bloom-filter incremental dedup.

Not in the reference (splink links *entities*; these curate *documents*),
but first-class for the 100-TB training-data pipeline this engine serves
(BASELINE.json north rule: Common-Crawl-style web pages). All three are
deterministic at ANY parallelism — ordering and membership derive from
md5 over row content, never from partition layout — so results are
bit-identical between local[2], local[32], and a 1000-executor cluster,
and every one replays exactly in ANSI SQL for the cross-engine oracle.

Scale notes:
- stratified_sample is the classic top-N-per-key: one shuffle on the
  stratum key, a bounded per-stratum sort. For quotas far below stratum
  size, ``prefilter_oversample`` first drops rows by a per-stratum hash
  cutoff computed from a census (tiny agg, broadcast back), so the
  window sorts ~oversample*n rows per stratum instead of the whole
  stratum — with an exact shortfall fallback, the output is identical
  to the plain path.
- pack_token_shards needs a GLOBAL prefix sum, which a naive
  ``Window.orderBy(...)`` computes on ONE partition (a scale killer).
  Instead: the md5 order key's leading hex digits split the keyspace
  into uniform ORDERED buckets (a prefix of the sort key), local
  windows run per bucket in parallel, and a 256-row bucket-totals
  aggregate (broadcast) supplies each bucket's global offset — the
  textbook two-phase distributed scan.
- bloom_incremental_new never builds a driver-side bitset: the bloom
  filter IS a distinct-positions DataFrame (at most 16^prefix_hex
  rows, broadcastable at any corpus size), and membership is k
  broadcast-join probes per incoming row. "definitely new" (< k hits)
  has NO false negatives; "maybe duplicate" carries the standard bloom
  false-positive rate (1 - e^{-kn/m})^k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from splink_spark.functions.text import doc_fingerprint, token_count


def _sample_key(id_col: str, seed: int) -> F.Column:
    """Deterministic per-row order key: md5 of "<id>:<seed>". Identical
    in DuckDB (``md5(CAST(id AS VARCHAR) || ':<seed>')``)."""
    return F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 0,
    prefilter_oversample: float | None = None,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by deterministic md5 order — a reproducible
    domain-quota / language-quota sampler for corpus curation.

    Output: all input columns plus ``sample_rank`` (1-based position in
    the stratum's md5 order). Deterministic at any parallelism: the
    order key depends only on (id, seed).

    ``prefilter_oversample`` (e.g. 8.0) enables the scale path: a
    per-stratum census computes a hash-prefix cutoff keeping
    ~oversample*n rows per stratum before the exact top-N window. Any
    stratum whose prefilter survivors fall short of its quota (possible
    only by extreme hash luck) reverts to its full row set, so the
    result is ALWAYS identical to the plain path.
    """
    key = _sample_key(id_col, seed).alias("__skey")
    rows = df.select("*", key)
    if prefilter_oversample is not None:
        # NULL strata bypass the prefilter unpruned: the census joins
        # are equi-joins (NULL never matches), but the final window
        # keeps a NULL partition — routing them around keeps the two
        # paths identical instead of silently dropping NULL-stratum
        # rows on the scale path
        null_rows = rows.filter(F.col(strata_col).isNull())
        rows = rows.filter(F.col(strata_col).isNotNull())
        # census: stratum sizes (one small agg, broadcast back)
        sizes = rows.groupBy(strata_col).agg(
            F.count(F.lit(1)).alias("__stratum_n")
        )
        # keep-fraction per stratum on the first 8 hex chars of the key
        # (uniform in [0, 16^8)); cutoff is exact integer arithmetic
        frac = F.least(
            F.lit(1.0),
            F.lit(float(prefilter_oversample) * n_per_stratum)
            / F.col("__stratum_n"),
        )
        cutoff = F.ceil(frac * F.lit(float(16**8))).cast("long")
        pref = (
            rows.join(F.broadcast(sizes), strata_col)
            .withColumn(
                "__kint",
                F.conv(F.substring("__skey", 1, 8), 16, 10).cast("long"),
            )
            .withColumn("__cut", cutoff)
        )
        survivors = pref.filter(F.col("__kint") < F.col("__cut"))
        # shortfall fallback: strata where the prefilter kept fewer
        # than min(n, stratum_n) rows are re-included whole. Derived
        # from the FULL census left-joined with survivor counts (kept
        # coalesced to 0): a stratum whose survivors are zero has no
        # group in the survivor aggregate at all, and deriving `short`
        # from survivors alone would silently drop it — the exact
        # worst case the safety net exists for.
        kept = survivors.groupBy(strata_col).agg(
            F.count(F.lit(1)).alias("__kept")
        )
        short = (
            sizes.join(kept, strata_col, "left")
            .withColumn("__kept", F.coalesce("__kept", F.lit(0)))
            .filter(
                F.col("__kept")
                < F.least(F.lit(n_per_stratum), F.col("__stratum_n"))
            )
            .select(strata_col)
        )
        rows = (
            survivors.join(
                F.broadcast(short), strata_col, "left_anti"
            )
            .unionByName(
                pref.join(F.broadcast(short), strata_col, "left_semi")
            )
            .drop("__stratum_n", "__kint", "__cut")
            .unionByName(null_rows)
        )
    w = Window.partitionBy(strata_col).orderBy("__skey", id_col)
    return (
        rows.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .drop("__skey")
    )


def pack_token_shards(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    bucket_hex: int = 2,
) -> DataFrame:
    """Assign every document to a training shard of ~``budget_tokens``
    tokens: documents are laid out in deterministic md5 order and a
    shard closes when the running token total crosses a budget
    multiple (``shard_id = floor(exclusive_prefix_sum / budget)``) —
    the standard greedy packing for fixed-token training shards.

    Output: (id_col, n_tokens, pack_pos, shard_id). ``pack_pos`` is the
    1-based global position in the packing order.

    Distributed prefix sum — no single-partition global window: the
    first ``bucket_hex`` hex digits of the md5 order key define
    16^bucket_hex ORDERED buckets (a prefix of the sort key, so
    bucket order == global order); per-bucket windows run in parallel
    and each bucket's token/row offset comes from a 16^bucket_hex-row
    totals aggregate joined back via broadcast.
    """
    n_tok = (
        F.col(tokens_col)
        if tokens_col is not None
        else token_count(text_col)
    )
    okey = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col),
        F.coalesce(n_tok, F.lit(0)).cast("long").alias("n_tokens"),
        okey.alias("__okey"),
        F.conv(F.substring(okey, 1, bucket_hex), 16, 10)
        .cast("int")
        .alias("__bucket"),
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy("__okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("__lcum", F.sum("n_tokens").over(w)).withColumn(
        "__lpos",
        F.row_number().over(
            Window.partitionBy("__bucket").orderBy("__okey", id_col)
        ),
    )
    totals = base.groupBy("__bucket").agg(
        F.sum("n_tokens").alias("__btok"),
        F.count(F.lit(1)).alias("__brows"),
    )
    wo = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive prefix over the tiny (<=16^bucket_hex row) totals frame
    offsets = totals.select(
        "__bucket",
        (F.sum("__btok").over(wo) - F.col("__btok")).alias("__tok_off"),
        (F.sum("__brows").over(wo) - F.col("__brows")).alias("__row_off"),
    )
    out = local.join(F.broadcast(offsets), "__bucket")
    gcum = F.col("__tok_off") + F.col("__lcum")
    return out.select(
        id_col,
        "n_tokens",
        (F.col("__row_off") + F.col("__lpos")).alias("pack_pos"),
        F.floor((gcum - F.col("n_tokens")) / F.lit(budget_tokens))
        .cast("long")
        .alias("shard_id"),
    )


def bloom_positions(
    fingerprint: F.Column, k: int = 4, prefix_hex: int = 3
) -> F.Column:
    """The k bloom positions of a fingerprint, as an array of hex-string
    buckets (m = 16^prefix_hex positions). Position i is the first
    ``prefix_hex`` chars of md5("<fp>:<i>") — string buckets, so the
    identical expression runs in DuckDB with no hex→int conversion."""
    return F.array(
        *[
            F.substring(
                F.md5(F.concat(fingerprint, F.lit(f":{i}"))),
                1,
                prefix_hex,
            )
            for i in range(1, k + 1)
        ]
    )


def bloom_incremental_new(
    base: DataFrame,
    incoming: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    prefix_hex: int = 3,
) -> DataFrame:
    """Incremental-ingest dedup screen at corpus scale: build a bloom
    filter over ``base``'s document fingerprints AS A DATAFRAME (the
    distinct position set, at most 16^prefix_hex rows — broadcastable
    no matter how large ``base`` is), then probe each ``incoming``
    document's k positions against it.

    Output per incoming row: (id_col, fingerprint, hits,
    maybe_duplicate). ``maybe_duplicate = (hits == k)``; rows with
    hits < k are DEFINITELY new (a true duplicate's fingerprint set
    all k of its positions in base — no false negatives). The
    maybe-duplicate survivors are the only rows that need the exact
    (shuffle) fingerprint anti-join, which at steady state is a tiny
    fraction of the batch: FP rate ≈ (1 - e^{-k·n/m})^k.

    Unlike ``find_matches_to_new_records`` (O17, broadcast the NEW
    side), this screens when the new batch is huge and the base's
    exact key set cannot broadcast — the bloom position set always
    can.
    """
    fp = doc_fingerprint(text_col)
    base_pos = (
        base.select(
            F.explode(bloom_positions(fp, k, prefix_hex)).alias("__pos")
        )
        .distinct()
        .withColumn("__present", F.lit(1))
    )
    probes = incoming.select(
        F.col(id_col),
        fp.alias("fingerprint"),
    ).select(
        id_col,
        "fingerprint",
        F.explode(
            bloom_positions(F.col("fingerprint"), k, prefix_hex)
        ).alias("__pos"),
    )
    hits = (
        probes.join(F.broadcast(base_pos), "__pos", "left")
        .groupBy(id_col, "fingerprint")
        .agg(F.sum(F.coalesce("__present", F.lit(0))).alias("hits"))
    )
    return hits.select(
        id_col,
        "fingerprint",
        F.col("hits").cast("long").alias("hits"),
        (F.col("hits") == k).alias("maybe_duplicate"),
    )


def _quality_gate(
    df: DataFrame,
    text_col: str,
    min_tokens: int,
    max_punct_ratio: float,
) -> DataFrame:
    from splink_spark.functions.text import quality_features

    feats = quality_features(text_col)
    return (
        df.withColumn("__ntok", feats["n_tokens"])
        .withColumn("__punct", feats["punct_ratio"])
        .filter(
            (F.col("__ntok") >= min_tokens)
            & (F.col("__punct") <= max_punct_ratio)
        )
        .drop("__ntok", "__punct")
    )


def _drop_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_bands: int,
    jaccard_threshold: float,
) -> DataFrame:
    """Keep one representative (the CC min-id label) per near-dup
    cluster; rows not in any near-dup pair pass through untouched."""
    from splink_spark.operators.cluster import connected_components
    from splink_spark.operators.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(
        df,
        id_col=id_col,
        text_col=text_col,
        num_bands=num_bands,
        jaccard_threshold=jaccard_threshold,
    ).select(
        F.col(f"{id_col}_l").alias("unique_id_l"),
        F.col(f"{id_col}_r").alias("unique_id_r"),
    )
    clusters = connected_components(pairs)
    drop = clusters.filter(
        F.col("unique_id") != F.col("cluster_id")
    ).select(F.col("unique_id").alias(id_col))
    return df.join(drop, id_col, "left_anti")


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str | None = None,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.5,
    jaccard_threshold: float = 0.7,
    num_bands: int = 8,
    n_per_stratum: int | None = None,
    budget_tokens: int | None = None,
    seed: int = 0,
) -> tuple[DataFrame, dict[str, int]]:
    """One-call corpus curation: quality gate → exact dedup → near-dup
    clustering (keep one representative per cluster) → optional
    per-stratum quota → optional token-budget shard packing.

    Returns (curated DataFrame, per-stage row counts). The DataFrame
    keeps all input columns plus ``shard_id`` when ``budget_tokens``
    is set. Each stage is the scale-shaped operator documented in its
    own module: no stage ever materialises an n² pair space or a
    single-partition global sort.

    This is a composition, not new machinery — it exists so a pipeline
    user gets the canonical ordering right (dedup BEFORE quotas, quotas
    BEFORE packing) without wiring five operators by hand.
    """
    from splink_spark.operators.dedup import distinct_by_fingerprint

    report: dict[str, int] = {"input": df.count()}

    # 1. quality gate — native column math, pure map stage
    gated = _quality_gate(df, text_col, min_tokens, max_punct_ratio)
    report["after_quality"] = gated.count()

    # 2. exact dedup — one hash aggregate on the md5 fingerprint
    exact = distinct_by_fingerprint(gated, id_col=id_col, text_col=text_col)
    report["after_exact_dedup"] = exact.count()

    # 3. near-dup: LSH candidates -> verified pairs -> CC -> keep the
    #    cluster representative (min id, matching CC's label invariant)
    near = _drop_near_duplicates(
        exact, id_col, text_col, num_bands, jaccard_threshold
    )
    report["after_near_dedup"] = near.count()

    out = near
    # 4. optional per-stratum quota (deterministic md5 order)
    if strata_col is not None and n_per_stratum is not None:
        out = stratified_sample(
            out, strata_col, n_per_stratum, id_col=id_col, seed=seed
        ).drop("sample_rank")
        report["after_quota"] = out.count()

    # 5. optional shard packing (two-phase distributed prefix sum)
    if budget_tokens is not None:
        shards = pack_token_shards(
            out, budget_tokens, id_col=id_col, text_col=text_col
        ).select(id_col, "shard_id")
        out = out.join(shards, id_col)
        report["shards"] = (
            out.agg(F.max("shard_id")).collect()[0][0] or 0
        ) + 1

    report["output"] = out.count()
    return out, report


def weighted_mix(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    total_rows: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic corpus mixing: draw ``floor(weight * total_rows)``
    rows from each stratum (fewer if the stratum is smaller) in md5
    order — the "70% web / 20% code / 10% reference" recipe step of a
    training-data pipeline, reproducible at any parallelism.

    Output: all input columns plus ``sample_rank``. Strata absent from
    ``weights`` contribute nothing. Same shuffle geometry as
    stratified_sample (one shuffle on the stratum key, bounded
    per-stratum sort); the quota table is a broadcast of len(weights)
    rows.
    """
    spark = df.sparkSession
    quotas = spark.createDataFrame(
        [(k, int(w * total_rows)) for k, w in weights.items()],
        [strata_col, "__quota"],
    )
    key = _sample_key(id_col, seed).alias("__skey")
    w = Window.partitionBy(strata_col).orderBy("__skey", id_col)
    return (
        df.select("*", key)
        .join(F.broadcast(quotas), strata_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= F.col("__quota"))
        .drop("__skey", "__quota")
    )


def staged_curate_corpus(
    df: DataFrame,
    manager,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str | None = None,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.5,
    jaccard_threshold: float = 0.7,
    num_bands: int = 8,
    n_per_stratum: int | None = None,
    budget_tokens: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """curate_corpus with resumable parquet checkpoints: every stage
    runs through a ``plans.stages.StageManager`` (north rule: any stage
    resumes from its last checkpoint, with per-partition lineage and
    row metrics). Stage keys combine the input-data fingerprint with
    every parameter, so changed input or a changed recipe can never
    resume a stale checkpoint — and each downstream stage reads its
    upstream's CHECKPOINT, not the live plan, so a resumed run skips
    all completed work.
    """
    from splink_spark.operators.dedup import distinct_by_fingerprint
    from splink_spark.plans.stages import content_hash, input_fingerprint

    params = "|".join(
        str(x)
        for x in (
            id_col, text_col, strata_col, min_tokens, max_punct_ratio,
            jaccard_threshold, num_bands, n_per_stratum, budget_tokens,
            seed,
        )
    )
    key = content_hash(input_fingerprint({"corpus": df}), params)

    gated = manager.stage(
        "curate_quality",
        key,
        lambda: _quality_gate(df, text_col, min_tokens, max_punct_ratio),
        extra_metrics={"stage_kind": "quality_gate"},
    )
    exact = manager.stage(
        "curate_exact_dedup",
        key,
        lambda: distinct_by_fingerprint(
            gated, id_col=id_col, text_col=text_col
        ),
        extra_metrics={"stage_kind": "exact_dedup"},
    )
    out = manager.stage(
        "curate_near_dedup",
        key,
        lambda: _drop_near_duplicates(
            exact, id_col, text_col, num_bands, jaccard_threshold
        ),
        extra_metrics={"stage_kind": "near_dedup"},
    )
    if strata_col is not None and n_per_stratum is not None:
        quota_in = out
        out = manager.stage(
            "curate_quota",
            key,
            lambda: stratified_sample(
                quota_in, strata_col, n_per_stratum, id_col=id_col,
                seed=seed,
            ).drop("sample_rank"),
            extra_metrics={"stage_kind": "stratified_quota"},
        )
    if budget_tokens is not None:
        pack_in = out
        out = manager.stage(
            "curate_shards",
            key,
            lambda: pack_in.join(
                pack_token_shards(
                    pack_in, budget_tokens, id_col=id_col,
                    text_col=text_col,
                ).select(id_col, "shard_id"),
                id_col,
            ),
            extra_metrics={"stage_kind": "shard_packing"},
        )
    return out


def export_token_shards(
    df: DataFrame,
    location: str,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "create",
) -> dict[str, int]:
    """Pack the corpus into token-budget shards and write it as an
    iceberg-lite table PARTITIONED BY shard_id — each training shard is
    a physical partition, so a trainer pulling shard k reads exactly
    one partition's files (manifest-level pruning, no scan of the
    rest), and the commit is a snapshot: re-exports append or overwrite
    per iceberg semantics, and previous exports stay time-travelable.

    Returns {"snapshot_id", "n_docs", "n_shards"}.
    """
    from splink_spark.sources.iceberg_lite import write_iceberg

    packed = df.join(
        pack_token_shards(
            df, budget_tokens, id_col=id_col, text_col=text_col
        ).select(id_col, "n_tokens", "shard_id"),
        id_col,
    )
    snap = write_iceberg(
        packed, location, partition_by=["shard_id"], mode=mode
    )
    agg = packed.agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("shard_id") + 1).alias("s"),
    ).collect()[0]
    return {
        "snapshot_id": snap,
        "n_docs": int(agg["n"]),
        "n_shards": int(agg["s"] or 0),
    }
