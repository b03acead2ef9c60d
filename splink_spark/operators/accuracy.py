"""O22 — accuracy / truth-space metrics.

reference: splink/accuracy.py::
truth_space_table_from_labels_with_predictions_sqls.

Spark-first: instead of the reference's per-threshold self-joins, sort
label-joined predictions by match_weight descending once and take
cumulative sums over a window — every distinct weight becomes a
threshold row with TP/FP/FN/TN, precision, recall, F1 (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_labels_to_predictions(
    predictions: DataFrame,
    labels: DataFrame,
    left: str = "unique_id_l",
    right: str = "unique_id_r",
) -> DataFrame:
    """Outer join on the (ordered) pair key: pairs the model never scored
    count as weight -inf (never predicted matches)."""
    return labels.join(
        predictions.select(left, right, "match_weight", "match_probability"),
        on=[left, right],
        how="left",
    ).withColumn(
        "match_weight", F.coalesce("match_weight", F.lit(float("-inf")))
    )


def truth_space_table(
    predictions: DataFrame,
    labels: DataFrame,
    left: str = "unique_id_l",
    right: str = "unique_id_r",
    as_scaled_ints: bool = False,
) -> DataFrame:
    """One row per distinct match_weight threshold with confusion counts.

    At threshold w: predicted positive = match_weight >= w.

    With ``as_scaled_ints=True`` the ratio columns are emitted as
    ``CAST(round(x * 1e9) AS BIGINT)`` (suffix ``_e9``) and the ``-inf``
    threshold sentinel (pairs the model never scored) becomes NULL, so
    the comparison surface carries no floats or infinities — hash-robust
    across engines by construction. The sentinel stays ``-inf``
    *internally* so window ordering and grouping remain purely numeric
    (NULL ordering conventions differ between engines).
    """
    joined = join_labels_to_predictions(predictions, labels, left, right)
    totals = joined.agg(
        F.sum(F.col("is_match").cast("long")).alias("P"),
        F.sum((~F.col("is_match")).cast("long")).alias("N"),
    ).collect()[0]
    P, N = int(totals["P"] or 0), int(totals["N"] or 0)

    w = Window.orderBy(F.desc("match_weight")).rangeBetween(
        Window.unboundedPreceding, 0
    )
    per_weight = (
        joined.groupBy("match_weight")
        .agg(
            F.sum(F.col("is_match").cast("long")).alias("pos_here"),
            F.sum((~F.col("is_match")).cast("long")).alias("neg_here"),
        )
    )
    out = (
        per_weight.withColumn("tp", F.sum("pos_here").over(w))
        .withColumn("fp", F.sum("neg_here").over(w))
        .withColumn("fn", F.lit(P) - F.col("tp"))
        .withColumn("tn", F.lit(N) - F.col("fp"))
        .withColumn(
            "precision",
            F.when(
                (F.col("tp") + F.col("fp")) > 0,
                F.col("tp") / (F.col("tp") + F.col("fp")),
            ).otherwise(F.lit(1.0)),
        )
        .withColumn(
            "recall",
            F.when(F.lit(P) > 0, F.col("tp") / F.lit(P)).otherwise(F.lit(1.0)),
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2
                * F.col("precision")
                * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
    )
    if as_scaled_ints:
        neg_inf = F.lit(float("-inf"))
        out = out.select(
            F.when(F.col("match_weight") == neg_inf, F.lit(None))
            .otherwise(F.round(F.col("match_weight") * 1e9))
            .cast("long")
            .alias("threshold_weight_e9"),
            "tp",
            "fp",
            "fn",
            "tn",
            F.round(F.col("precision") * 1e9).cast("long").alias(
                "precision_e9"
            ),
            F.round(F.col("recall") * 1e9).cast("long").alias("recall_e9"),
            F.round(F.col("f1") * 1e9).cast("long").alias("f1_e9"),
        ).orderBy(F.desc_nulls_last("threshold_weight_e9"))
    else:
        out = out.select(
            F.col("match_weight").alias("threshold_weight"),
            "tp",
            "fp",
            "fn",
            "tn",
            # ratio columns rounded to 9 digits: derived double ratios are
            # the one place engine-specific expression-ordering can differ
            # in the last ulp (same discipline as the cosine oracles)
            F.round("precision", 9).alias("precision"),
            F.round("recall", 9).alias("recall"),
            F.round("f1", 9).alias("f1"),
        ).orderBy(F.desc("threshold_weight"))
    return out


def unlinkables_data(
    predictions: DataFrame,
    records: DataFrame | None = None,
    uid: str = "unique_id",
    round_dp: int = 1,
) -> DataFrame:
    """Unlinkables chart DATA: for each record, its best (max) match
    weight over every scored pair it appears in; then, per rounded
    weight, the cumulative proportion of records whose best weight is
    <= that value — the share of records that would stay unlinked at
    any chosen threshold.

    reference: splink/unlinkables.py::unlinkables_data.

    Plan shape: union of two narrow projections -> one max-agg on uid
    -> tiny weight histogram -> cumulative window over #distinct
    rounded weights (hundreds of rows; single-partition window is
    fine). ``records`` (optional) supplies the denominator including
    records that never entered any pair (best weight -inf -> NULL
    bucket, reported as proportion at the lowest weight).
    """
    sides = predictions.select(
        F.col(f"{uid}_l").alias(uid), "match_weight"
    ).unionByName(
        predictions.select(F.col(f"{uid}_r").alias(uid), "match_weight")
    )
    best = sides.groupBy(uid).agg(F.max("match_weight").alias("best_mw"))
    if records is not None:
        best = records.select(uid).join(best, uid, "left")
    total = best.count()
    hist = (
        best.withColumn(
            "match_weight_rounded",
            F.round(F.coalesce("best_mw", F.lit(float("-inf"))), round_dp),
        )
        .groupBy("match_weight_rounded")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("match_weight_rounded").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        hist.withColumn("cum_n", F.sum("n").over(w))
        .select(
            "match_weight_rounded",
            (F.col("cum_n") / F.lit(total)).alias("cum_proportion"),
        )
        .orderBy("match_weight_rounded")
    )


def prediction_errors_from_labels(
    predictions: DataFrame,
    labels: DataFrame,
    threshold_match_probability: float = 0.5,
    left: str = "unique_id_l",
    right: str = "unique_id_r",
    include_false_positives: bool = True,
    include_false_negatives: bool = True,
) -> DataFrame:
    """Labelled pairs the model got wrong at a probability threshold:
    false positives (label non-match, predicted match) and false
    negatives (label match, predicted non-match; unscored labelled
    pairs count as predicted non-match).

    reference: splink/accuracy.py::prediction_errors_from_labels_table.
    """
    joined = labels.join(
        predictions.select(
            left, right, "match_weight", "match_probability"
        ),
        on=[left, right],
        how="left",
    ).withColumn(
        "predicted_match",
        F.coalesce("match_probability", F.lit(0.0))
        >= threshold_match_probability,
    )
    conds = []
    if include_false_positives:
        conds.append(F.col("predicted_match") & ~F.col("is_match"))
    if include_false_negatives:
        conds.append(~F.col("predicted_match") & F.col("is_match"))
    if not conds:
        raise ValueError(
            "at least one of include_false_positives / "
            "include_false_negatives must be set"
        )
    keep = conds[0]
    for c in conds[1:]:
        keep = keep | c
    return joined.filter(keep).select(
        left,
        right,
        "is_match",
        "predicted_match",
        "match_weight",
        "match_probability",
    )


def pairwise_f1_from_clusters(
    clusters: DataFrame,
    labels: DataFrame,
    uid: str = "unique_id",
    left: str = "unique_id_l",
    right: str = "unique_id_r",
) -> dict[str, float]:
    """Pairwise precision/recall/F1 of cluster assignments against a
    labeled pair table (the BASELINE.json acceptance metric)."""
    c = clusters.select(uid, "cluster_id")
    joined = (
        labels.join(
            c.withColumnRenamed(uid, left).withColumnRenamed(
                "cluster_id", "cluster_l"
            ),
            left,
        )
        .join(
            c.withColumnRenamed(uid, right).withColumnRenamed(
                "cluster_id", "cluster_r"
            ),
            right,
        )
        .withColumn("pred", F.col("cluster_l") == F.col("cluster_r"))
    )
    row = joined.agg(
        F.sum((F.col("pred") & F.col("is_match")).cast("long")).alias("tp"),
        F.sum((F.col("pred") & ~F.col("is_match")).cast("long")).alias("fp"),
        F.sum((~F.col("pred") & F.col("is_match")).cast("long")).alias("fn"),
    ).collect()[0]
    tp, fp, fn = (int(row[x] or 0) for x in ("tp", "fp", "fn"))
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
