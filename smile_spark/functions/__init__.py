"""Scalar-function helpers shared by operators."""

from smile_spark.functions.numeric import dsum, davg

__all__ = ["dsum", "davg"]
