"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (splink dedupes *entities*; these dedupe
*documents*), but first-class here: exact (hash groupBy), MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Scale notes:
- exact dedup is one partial+final hash aggregate on a 32-byte key —
  the cheapest possible full-corpus pass;
- MinHash LSH never materialises the n² pair space: candidates come
  from equi-joins on (band, band-minhash) keys, the same shuffle
  geometry as blocking (O4); verification runs only on candidates;
- banding theory: with b bands of r-shingle min-hashes, a pair with
  Jaccard s collides in >=1 band with p = 1-(1-s^r)^b — choose b for
  the target threshold;
- SimHash buckets by Manku-style block triples: 6 blocks of the
  64-bit fingerprint, C(6,3)=20 packed ~32-bit keys; any pair within
  hamming distance 3 agrees exactly on >=1 triple (pigeonhole), and
  per-bucket sizes stay near-constant out to 10^9+ docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from splink_spark.functions.text import (
    doc_fingerprint,
    hamming64,
    minhash_band,
    word_shingles,
)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (after normalization) documents.

    Output: (doc_id, fingerprint, canonical_id, group_size) for rows in
    groups of size >= 2; canonical = min id per group.
    """
    fp = df.select(
        F.col(id_col), doc_fingerprint(text_col).alias("fingerprint")
    )
    groups = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        fp.join(groups, "fingerprint")
        .filter(F.col("group_size") >= 2)
        .select(id_col, "fingerprint", "canonical_id", "group_size")
    )


def distinct_by_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one representative (min id) per fingerprint — the dedup sink."""
    fp = df.withColumn("fingerprint", doc_fingerprint(text_col))
    w_min = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return fp.join(w_min, ["fingerprint", id_col]).drop("fingerprint")


# ---------------------------------------------------------------------------
# n-gram (shingle) Jaccard on candidate pairs
# ---------------------------------------------------------------------------

def _jaccard_on_shingle_sets(
    candidates: DataFrame, sh: DataFrame, id_col: str
) -> DataFrame:
    """Jaccard for candidate id pairs given a (id, shingles) table of
    DISTINCT-element shingle keys. |union| is derived from the sizes
    (|l| + |r| - |intersect|) so each pair pays ONE set traversal, not
    an intersect AND a union (same integers, same double, half the set
    work — the trick webtext's scoring cascade already uses)."""
    inter = F.size(F.array_intersect("sh_l", "sh_r"))
    return (
        candidates.join(
            sh.withColumnRenamed(id_col, f"{id_col}_l").withColumnRenamed(
                "shingles", "sh_l"
            ),
            f"{id_col}_l",
        )
        .join(
            sh.withColumnRenamed(id_col, f"{id_col}_r").withColumnRenamed(
                "shingles", "sh_r"
            ),
            f"{id_col}_r",
        )
        .withColumn("__i", inter)
        .withColumn(
            # try_divide: docs shorter than k tokens have EMPTY shingle
            # sets; 0/0 must yield NULL (matches DuckDB's division
            # semantics), not an ANSI DIVIDE_BY_ZERO
            "jaccard",
            F.try_divide(
                F.col("__i"),
                F.size(F.col("sh_l")) + F.size(F.col("sh_r")) - F.col("__i"),
            ),
        )
        .drop("sh_l", "sh_r", "__i")
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate (l, r) id pairs.

    The shingle sets are stored as 64-bit hashes
    (functions/text.py::word_shingle_hashes, keep_empty so the
    empty-doc pseudo-shingle keeps its historical "" membership): the
    joins and the per-pair set intersection work on 8-byte longs
    instead of ~10k-char strings — same Jaccard values up to the
    documented xxhash64 collision odds."""
    from splink_spark.functions.text import word_shingle_hashes

    # materialize: joins would otherwise re-evaluate the shingle
    # expression on both sides (Catalyst collapses projections, so a
    # plain select is no barrier)
    sh = df.select(
        F.col(id_col),
        F.array_distinct(
            word_shingle_hashes(text_col, k, keep_empty=True)
        ).alias("shingles"),
    ).localCheckpoint(eager=False)
    return _jaccard_on_shingle_sets(candidates, sh, id_col)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _minhash_keyed(
    sh_frame: DataFrame,
    id_col: str,
    num_bands: int,
    with_hashed: bool = False,
) -> DataFrame:
    """Band-key table (id, mh_0..num_bands-1[, __hashed]) computed in
    ONE projection over a (id, __sh) distinct-shingle frame, with ONE
    lazy checkpoint of the NARROW result.

    The former 3-step chain (shingle checkpoint -> digest checkpoint ->
    key checkpoint) materialized the full shingle strings AND their md5
    hex arrays (~2 x 30 bytes x every shingle of the corpus) just to
    hand 4 tiny band mins downstream. Here the shingle array is
    let-bound (single-element transform), each 4-band group's digest
    array is let-bound inside it (md5 runs exactly once per shingle per
    group — identical digests, identical band keys byte-for-byte), and
    only (id, band mins[, xxhash64'd shingles for Jaccard verify]) is
    ever stored. The fields are flattened AFTER the checkpoint so field
    extraction cannot re-inline the build expression."""
    from splink_spark.functions.text import _band_group_suffix

    n_groups = (num_bands + 3) // 4

    def group_struct(sh, g):
        def h(s):
            return F.md5(
                s if g == 0 else F.concat(s, F.lit(f"#g{g}"))
            )

        bands = [b for b in range(num_bands) if b // 4 == g]

        def band_min(d, start):
            return F.array_min(
                F.transform(d, lambda x: F.substring(x, start, 8))
            )

        def mins(d):
            return F.struct(
                *[
                    band_min(d, _band_group_suffix(b)[1]).alias(f"mh_{b}")
                    for b in bands
                ]
            )

        return F.element_at(
            F.transform(F.array(F.transform(sh, h)), mins), 1
        )

    def build(sh):
        parts = [
            group_struct(sh, g).alias(f"g{g}") for g in range(n_groups)
        ]
        if with_hashed:
            parts.append(
                F.transform(sh, lambda s: F.xxhash64(s)).alias("h")
            )
        return F.struct(*parts)

    raw = sh_frame.select(
        F.col(id_col),
        F.element_at(
            F.transform(F.array(F.col("__sh")), build), 1
        ).alias("__k"),
    ).localCheckpoint(eager=False)
    cols = [F.col(id_col)] + [
        F.col(f"__k.g{b // 4}.mh_{b}").alias(f"mh_{b}")
        for b in range(num_bands)
    ]
    if with_hashed:
        cols.append(F.col("__k.h").alias("__hashed"))
    return raw.select(*cols)


def _band_join_candidates(
    keyed: DataFrame, id_col: str, num_bands: int
) -> DataFrame:
    """Union of per-band self-equi-joins over a band-key table, deduped
    across bands with the NOT-previous-bands predicate."""
    outputs = []
    for b in range(num_bands):
        conds = [
            f"l.mh_{b} = r.mh_{b}",
            f"l.{id_col} < r.{id_col}",
        ]
        for prev in range(b):
            conds.append(f"NOT (l.mh_{prev} = r.mh_{prev})")
        j = keyed.alias("l").join(
            keyed.alias("r"), F.expr(" AND ".join(conds))
        )
        outputs.append(
            j.select(
                F.col(f"l.{id_col}").alias(f"{id_col}_l"),
                F.col(f"r.{id_col}").alias(f"{id_col}_r"),
                F.lit(b).alias("band"),
            )
        )
    out = outputs[0]
    for o in outputs[1:]:
        out = out.unionByName(o)
    return out


def _distinct_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(text_col, shingle_k)).alias("__sh"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bands: int = 8,
    shingle_k: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: ids sharing any MinHash band value.

    Implemented as a union of per-band self-equi-joins (same plan shape
    as blocking rules), deduped across bands with the NOT-previous-bands
    predicate — pairs are emitted once, no global distinct. The band
    keys come from :func:`_minhash_keyed` — one pass over the corpus,
    one narrow checkpoint shared by every join side.

    ``shingles_df``: optional precomputed (id_col, __sh) distinct
    string-shingle frame to use instead of deriving shingles from
    ``text_col``.
    """
    sh = (
        shingles_df
        if shingles_df is not None
        else _distinct_shingles(df, id_col, text_col, shingle_k)
    )
    keyed = _minhash_keyed(sh, id_col, num_bands)
    return _band_join_candidates(keyed, id_col, num_bands)


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard >= threshold.

    ONE pass over the corpus feeds BOTH stages: :func:`_minhash_keyed`
    (with_hashed) computes the md5 band keys AND the xxhash64 shingle
    sets for the verify Jaccard in the same projection, so the corpus
    is tokenized and shingled exactly once and only narrow columns are
    ever materialized."""
    keyed = _minhash_keyed(
        _distinct_shingles(df, id_col, text_col, shingle_k),
        id_col,
        num_bands,
        with_hashed=True,
    )
    cands = _band_join_candidates(keyed, id_col, num_bands).select(
        f"{id_col}_l", f"{id_col}_r"
    )
    hashed = keyed.select(
        F.col(id_col), F.col("__hashed").alias("shingles")
    )
    scored = _jaccard_on_shingle_sets(cands, hashed, id_col)
    return scored.filter(F.col("jaccard") >= jaccard_threshold)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dups by SimHash hamming distance <= max_hamming (<=3).

    Bucketing (Manku et al., WWW'07 block-permutation scheme): split
    the 64-bit fingerprint into 6 blocks (11/11/11/11/10/10 bits).
    A pair within hamming distance 3 has its differing bits in at most
    3 blocks, so at least 3 blocks match exactly — and therefore at
    least one of the C(6,3)=20 block-triples matches on ALL three
    blocks. Each triple packs into a single ~32-bit key, so bucket
    cardinality is ~2^32 per triple: per-bucket row counts stay
    near-constant as the corpus grows to 10^9+ docs (the 4x16-bit
    chunk scheme this replaces capped out at 65,536 buckets and went
    quadratic within buckets at ~10^8 docs).

    Plan shape: explode each doc into 20 (combo, key) rows, ONE
    self-equi-join on (combo, key), distinct pairs, exact
    bit_count(xor) verify — one shuffle for the join regardless of
    the number of key tables, vs one join per table.

    Recall is exact by pigeonhole (not probabilistic) for
    max_hamming <= 3.
    """
    from splink_spark.functions.minhash_udf import make_simhash_udf

    toks = F.array_remove(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), ""
    )
    fp = df.select(
        F.col(id_col), make_simhash_udf(shingle_k)(toks).alias("simhash")
    ).localCheckpoint(eager=False)
    keyed = simhash_block_keys(fp, id_col)

    cands = (
        keyed.alias("l")
        .join(
            keyed.alias("r"),
            F.expr(
                f"l.combo = r.combo AND l.key = r.key "
                f"AND l.{id_col} < r.{id_col}"
            ),
        )
        .select(
            F.col(f"l.{id_col}").alias(f"{id_col}_l"),
            F.col(f"r.{id_col}").alias(f"{id_col}_r"),
            F.col("l.simhash").alias("simhash_l"),
            F.col("r.simhash").alias("simhash_r"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", hamming64(F.col("simhash_l"), F.col("simhash_r"))
        )
        .filter(F.col("hamming") <= max_hamming)
        .drop("simhash_l", "simhash_r")
    )


def simhash_block_keys(fp: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode (id, simhash) rows into 20 (combo, key) block-triple
    rows (see :func:`simhash_near_duplicates`). Exposed separately so
    the candidate-volume census (sum over buckets of C(size,2)) is
    testable: that census is the quantity that must stay near-linear
    in corpus size for the scheme to survive a 100x scale-up."""
    from itertools import combinations

    # 6 blocks covering all 64 bits; widths 11*4 + 10*2
    widths = [11, 11, 11, 11, 10, 10]
    offs = [sum(widths[:i]) for i in range(6)]
    blk = [
        F.shiftrightunsigned(F.col("simhash"), offs[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )
        for i in range(6)
    ]
    combos = list(combinations(range(6), 3))  # 20 triples
    key_structs = [
        F.struct(
            F.lit(ci).alias("combo"),
            (
                F.shiftleft(blk[a], 22)
                .bitwiseOR(F.shiftleft(blk[b], 11))
                .bitwiseOR(blk[c])
            ).alias("key"),
        )
        for ci, (a, b, c) in enumerate(combos)
    ]
    return fp.select(
        id_col,
        "simhash",
        F.explode(F.array(*key_structs)).alias("ck"),
    ).select(id_col, "simhash", "ck.combo", "ck.key")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_duplicates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_col: str | None = None,
) -> DataFrame:
    """Pairs with cosine similarity >= threshold.

    With ``bucket_col`` (e.g. an LSH sign-projection bucket or a label),
    the join is an equi-join on the bucket; otherwise a full self-join
    (quadratic — only for small/test corpora; at scale use
    :func:`splink_spark.operators.similarity.signed_projection_buckets`).
    """
    from splink_spark.operators.similarity import (
        cosine_from_parts,
        vec_norm,
    )

    cols = [F.col(id_col), F.col(vec_col)]
    if bucket_col:
        cols.append(F.col(bucket_col))
    # norm hoisted to the per-row projection: one norm per vector, not
    # one per pair (bit-identical value — same subexpression)
    v = emb.select(*cols, vec_norm(F.col(vec_col)).alias("__nrm"))
    cond = f"l.{id_col} < r.{id_col}"
    if bucket_col:
        cond = f"l.{bucket_col} = r.{bucket_col} AND {cond}"
    j = v.alias("l").join(v.alias("r"), F.expr(cond))
    return (
        j.select(
            F.col(f"l.{id_col}").alias(f"{id_col}_l"),
            F.col(f"r.{id_col}").alias(f"{id_col}_r"),
            cosine_from_parts(
                F.col(f"l.{vec_col}"),
                F.col(f"r.{vec_col}"),
                F.col("l.__nrm"),
                F.col("r.__nrm"),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
