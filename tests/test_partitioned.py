"""Date-partitioned writes must produce prunable layouts: a filter on
the partition column appears as PartitionFilters and the result
matches the unpartitioned computation."""

import os

from pyspark.sql import functions as F

from smile_spark.plans.audit import formatted_plan
from smile_spark.sources.partitioned import (
    read_partitioned,
    write_partitioned_by_date,
)
from smile_spark.tables import table


def test_partition_pruning(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    path = os.path.join(tmp_path, "events_by_date")
    write_partitioned_by_date(ev, path)

    back = read_partitioned(spark, path)
    one_day = back.filter(F.col("event_date") == "2024-01-05")

    plan = formatted_plan(one_day)
    assert "PartitionFilters" in plan
    assert "event_date" in plan

    expected = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == expected
    # the partition column must not be read from data files
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "event_date" not in line
