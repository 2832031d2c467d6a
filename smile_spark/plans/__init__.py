"""Physical-plan audit helpers."""

from smile_spark.plans.audit import (
    assert_broadcast_join,
    assert_partial_aggregation,
    assert_pushed_filters,
    assert_read_schema_only,
    formatted_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_partial_aggregation",
    "assert_pushed_filters",
    "assert_read_schema_only",
    "formatted_plan",
]
