"""splink_spark — a PySpark-native Fellegi–Sunter record-linkage engine.

A from-scratch implementation of the query/data-processing capabilities of
the splink record-linkage library (reference: debiatan/splink, a fork of
moj-analytical-services/splink), re-expressed Spark-first:

- blocking rules compile to salted, co-partitioned equi self-joins
  (reference: splink/blocking.py::block_using_rules_sql)
- comparison levels compile to ``F.when`` cascades producing gamma columns
  (reference: splink/comparison_vector_values.py)
- match weights are pure column arithmetic in log2 space
  (reference: splink/predict.py::predict_from_comparison_vectors_sqls)
- EM training aggregates a comparison-vector histogram distributed-side and
  iterates driver-side in numpy
  (reference: splink/expectation_maximisation.py)
- transitive clustering is large-star/small-star connected components with
  checkpointed supersteps
  (reference: splink/connected_components.py::solve_connected_components)

Everything here derives from public knowledge only: the public splink
repository layout/semantics, the Apache Spark public API, and published
papers (Fellegi & Sunter 1969; Kiveris et al. 2014).
"""

from splink_spark.model import (
    BlockingRule,
    Comparison,
    ComparisonLevel,
    Settings,
    block_on,
)
from splink_spark.plans.linker import Linker

__version__ = "0.1.0"

__all__ = [
    "BlockingRule",
    "Comparison",
    "ComparisonLevel",
    "Settings",
    "Linker",
    "block_on",
]
