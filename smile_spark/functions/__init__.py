"""Scalar-function helpers shared by operators."""

from smile_spark.functions.numeric import dsum, davg
from smile_spark.functions.skew import salted_join

__all__ = ["dsum", "davg", "salted_join"]
