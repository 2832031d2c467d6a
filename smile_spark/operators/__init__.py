"""Operator modules — each reference capability (SURVEY.md §2.1) and
each north-star extension as composable DataFrame-returning functions.

Every public operator has the uniform signature
``op(spark: SparkSession, sf_dir: str, **params) -> DataFrame`` so the
driver contract (__spark_entry__.queries) can register them directly.
"""
