"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operator (not in the reference): approximate
nearest neighbours for an embedding column.

- :func:`brute_force_topk` — exact cosine top-k. The query side is
  broadcast, so the corpus never shuffles; per-row top-k via a
  row_number window partitioned by query id. The baseline and the
  verifier for the approximate path.
- :func:`signed_projection_buckets` — sign-random-projection LSH:
  bucket = sign bits of dot(v, h_i) for deterministic hyperplanes
  h_i derived from a seed (xxhash-free, generated driver-side with
  numpy and shipped as literals). Bucketed self-join = the scale path.

All vector math is native column expressions (zip_with/aggregate) —
JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def norm(v: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        )

    return dot / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row.

    Output: (query_id, vec_id, cosine, rank). Queries are broadcast —
    at 100 TB corpus scale this is a map-only pass over the corpus
    followed by one k-bounded aggregation per query.
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        id_col,
        cosine_expr(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def signed_projection_buckets(
    emb: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Append a sign-random-projection LSH bucket id (0..2^n_planes-1).

    Hyperplanes are deterministic from the seed and inlined as array
    literals — the projection is pure column math, executed JVM-side.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col), h, lambda a, b: a.cast("double") * b
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return emb.withColumn(out_col, bucket)


def lsh_topk(
    emb: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 3,
    n_tables: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs top-k: cosine ranking within LSH buckets,
    OR-amplified over ``n_tables`` independent hash tables.

    Candidate recall for a pair at angle θ is 1 - (1 - (1-θ/π)^b)^L —
    a single table is useless on weakly-correlated data (measured ~15%
    top-1 recall at b=4, L=1 on random 64-dim vectors; ~90% at b=3,
    L=10). Each table is an equi-join on its bucket id — shuffle on
    bucket, never the n² pair space; candidates are unioned, deduped by
    (query, candidate), then ranked once.
    """
    keyed = emb
    bucket_cols = []
    for t in range(n_tables):
        col = f"lsh_b{t}"
        keyed = signed_projection_buckets(
            keyed, dim, n_planes, seed + 7919 * t, vec_col, out_col=col
        )
        bucket_cols.append(col)
    # materialize: the per-table joins must not re-derive all buckets
    keyed = keyed.select(id_col, vec_col, *bucket_cols).localCheckpoint(
        eager=False
    )

    cands = None
    for t, col in enumerate(bucket_cols):
        left = keyed.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            F.col(col),
        )
        right = keyed.select(id_col, vec_col, col)
        j = left.join(right, col).filter(F.col(id_col) != F.col("query_id"))
        c = j.select("query_id", id_col, "__qvec", vec_col)
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["query_id", id_col])

    scored = cands.select(
        "query_id",
        id_col,
        cosine_expr(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
