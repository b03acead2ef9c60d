"""Arrow-vectorized pandas UDFs for the fuzzy comparators.

Replaces the reference's Scala UDF jar
(reference: splink/spark/linker.py register_udfs;
splink/files/spark_jars/scala-udf-similarity-*.jar). Batches cross the
JVM↔Python boundary as Arrow record batches
(spark.sql.execution.arrow.pyspark.enabled=true); inside each batch the
kernels are numpy-vectorized — no per-row Python (north rule).

Call :func:`register_udfs` once per SparkSession to make
``jaro_winkler(l, r)``, ``jaro_sim(l, r)`` and ``damerau_levenshtein``
usable inside comparison-level SQL conditions. (UDFs are constructed
lazily — pandas_udf needs an active session in Spark 4.)

NOTE: our damerau_levenshtein is the OSA (optimal string alignment)
variant. DuckDB's built-in is the unrestricted Damerau–Levenshtein and
can be 1 lower on strings needing edits inside a transposed pair — do
not use DuckDB's as an exact oracle for it (kernels.py has a pure-python
OSA oracle instead).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from splink_spark.functions.kernels import (
    damerau_levenshtein_batch,
    jaro_batch,
    jaro_winkler_batch,
)


def _to_list(s: pd.Series) -> list:
    return s.where(s.notna(), None).tolist()


def make_jaro_winkler_udf():
    @pandas_udf(DoubleType())
    def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(jaro_winkler_batch(_to_list(a), _to_list(b)))

    return jaro_winkler_udf


def make_jaro_udf():
    @pandas_udf(DoubleType())
    def jaro_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(jaro_batch(_to_list(a), _to_list(b)))

    return jaro_udf


def make_damerau_levenshtein_udf():
    @pandas_udf(DoubleType())
    def damerau_levenshtein_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        s = pd.Series(damerau_levenshtein_batch(_to_list(a), _to_list(b)))
        return s.where(s >= 0)  # -1 (either side null) -> NULL

    return damerau_levenshtein_udf


def make_double_metaphone_udf(alternate: bool = False):
    """Double-metaphone code (primary, or alternate when
    ``alternate=True``) — mirrors the reference jar's DoubleMetaphone /
    DoubleMetaphoneAlt pair. Per-string state machine inside an Arrow
    batch (see functions/metaphone.py for why it can't vectorize)."""
    from pyspark.sql.types import StringType

    from splink_spark.functions.metaphone import double_metaphone

    idx = 1 if alternate else 0

    @pandas_udf(StringType())
    def dmetaphone_udf(a: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if v is None else double_metaphone(v)[idx]
                for v in _to_list(a)
            ]
        )

    return dmetaphone_udf


def register_udfs(spark: SparkSession) -> None:
    """Register the fuzzy comparators for use in SQL expressions
    (comparison-level conditions reference them by name)."""
    spark.udf.register("jaro_winkler", make_jaro_winkler_udf())
    spark.udf.register("jaro_sim", make_jaro_udf())
    spark.udf.register("damerau_levenshtein", make_damerau_levenshtein_udf())
    spark.udf.register("dmetaphone", make_double_metaphone_udf(False))
    spark.udf.register("dmetaphone_alt", make_double_metaphone_udf(True))
