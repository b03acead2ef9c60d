"""Table registry: read the driver parquet fixtures by name.

The reference has no file-format layer (tables are registered into the
backend, reference: splink/linker.py::Linker.register_table); ours reads
parquet directly (Iceberg catalogs slot in by swapping the reader).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLES}
