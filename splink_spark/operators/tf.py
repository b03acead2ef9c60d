"""O2/O3 — term-frequency tables and join-back.

reference: splink/term_frequencies.py::term_frequencies_sql,
compute_all_term_frequencies_sqls, join_tf_to_input_df_sql.

Spark-first: a TF table is ``groupBy(col).agg(count/total)`` — Catalyst
executes this as partial+final hash aggregate. Join-back broadcasts the
TF table: it is a per-distinct-value dictionary, tiny relative to the
input (bounded by the column's cardinality), so the join adds no shuffle
of the big side. At 100 TB the concat table never moves for TF join-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tf_column_name(col: str) -> str:
    """reference: splink/term_frequencies.py::colname_to_tf_tablename."""
    return f"tf_{col}"


def term_frequency_table(df: DataFrame, col: str) -> DataFrame:
    """relative frequency of each non-null value of ``col``.

    Total is the count of non-null values of the column (matching the
    probability interpretation used for TF adjustment: tf is
    P(value | a random non-null draw)).
    """
    nn = df.filter(F.col(col).isNotNull())
    total = nn.count()
    return nn.groupBy(col).agg(
        (F.count(F.lit(1)) / F.lit(total)).alias(tf_column_name(col))
    )


def join_term_frequencies(
    df: DataFrame, tf_tables: dict[str, DataFrame]
) -> DataFrame:
    """Left-join each TF table back onto the concat table (broadcast)."""
    out = df
    for col, tf_df in tf_tables.items():
        out = out.join(F.broadcast(tf_df), on=col, how="left")
    return out


def concat_with_tf(df: DataFrame, tf_columns: list[str]) -> DataFrame:
    """O1 output + all TF columns — the reference's
    ``__splink__df_concat_with_tf``."""
    tfs = {c: term_frequency_table(df, c) for c in tf_columns}
    return join_term_frequencies(df, tfs)
