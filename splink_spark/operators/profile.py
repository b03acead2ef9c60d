"""O21 — profiling / missingness.

reference: splink/profile_data.py::profile_columns;
splink/missingness.py::missingness_data.

Spark-first: value frequencies = groupBy().count() with a row_number
window for top-k; missingness = avg(is null) over all columns in ONE
pass (a single aggregate projection, not a scan per column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def missingness(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: null share. Single scan over the table."""
    cols = columns or df.columns
    aggs = [
        F.avg(F.col(c).isNull().cast("double")).alias(c) for c in cols
    ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (column_name, null_share)"
    )


def profile_column_values(
    df: DataFrame, col: str, top_k: int = 20
) -> DataFrame:
    """Top-k most frequent values with counts and share.

    Scale note: ``orderBy().limit(k)`` plans as TakeOrderedAndProject
    (per-partition top-k, merged on the driver) — no global single
    partition window, so a high-cardinality column (url, title) never
    funnels every distinct value through one task. The row_number
    window that assigns ranks runs over only the k surviving rows.
    """
    total = df.count()
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("value_count"))
    top = counts.orderBy(F.desc("value_count"), F.col(col)).limit(top_k)
    w = Window.orderBy(F.desc("value_count"), F.col(col))
    return (
        top.withColumn("rn", F.row_number().over(w))
        .withColumn("share", F.col("value_count") / F.lit(total))
        .select(
            F.col(col).cast("string").alias("value"),
            "value_count",
            "share",
            F.col("rn").alias("value_rank"),
        )
    )


def column_cardinalities(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Approx distinct counts per column in one pass
    (approx_count_distinct — profiling only, as in SURVEY.md §2.3)."""
    cols = columns or df.columns
    aggs = [F.approx_count_distinct(c).alias(c) for c in cols]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (column_name, approx_distinct)"
    )


def completeness_by_source(
    df: DataFrame,
    columns: list[str] | None = None,
    source_col: str = "source_dataset",
) -> DataFrame:
    """Per-source column completeness (non-null share) — the data
    behind splink's completeness chart for multi-source link jobs
    (reference: splink/missingness.py::completeness_data). One grouped
    aggregate: every column's non-null share per source dataset in a
    single scan, then unpivoted to (source, column_name,
    completeness).
    """
    cols = columns or [c for c in df.columns if c != source_col]
    aggs = [
        F.avg(F.col(c).isNotNull().cast("double")).alias(c) for c in cols
    ]
    wide = df.groupBy(source_col).agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    return wide.selectExpr(
        source_col,
        f"stack({len(cols)}, {stack_expr}) as (column_name, completeness)",
    )
