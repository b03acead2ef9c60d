"""Scalar function library (SURVEY.md §2.2).

Native Column builders live in :mod:`splink_spark.functions.comparators`;
numpy kernels for comparators Spark lacks natively are in
:mod:`splink_spark.functions.kernels`, exposed as Arrow-vectorized pandas
UDFs in :mod:`splink_spark.functions.udfs`; web-text key generators and
text analysis in :mod:`splink_spark.functions.text`.
"""
