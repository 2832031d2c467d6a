"""Physical-plan audits — the ".explain() and iterate" loop as code.

At 100 TB the difference between a right plan and a wrong one is a
filter pushed into the parquet reader, a scan that prunes to two
columns, a dimension join that broadcasts instead of shuffling, and an
aggregate that combines map-side.  These helpers assert those
properties off ``df._jdf.queryExecution()`` so the test suite fails
the moment a code change regresses a plan — not when a bench run gets
slow.  (The reference's counterpart is humans hand-fusing loops,
SURVEY.md §4.1; ours is keeping Catalyst honest.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')``
    prints), as a string."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def assert_pushed_filters(df: DataFrame, *columns: str) -> None:
    """Assert the scan pushes a filter mentioning each column down to
    the parquet reader (visible as PushedFilters: [... col ...])."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            missing = [c for c in columns if c not in line]
            if not missing:
                return
    raise AssertionError(
        f"no PushedFilters line covering {columns}; plan:\n{plan}"
    )


def assert_read_schema_only(df: DataFrame, *columns: str) -> None:
    """Assert the parquet ReadSchema contains exactly ``columns`` —
    i.e. column pruning reached the scan."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema_part = line.split("ReadSchema:", 1)[1]
            present = {
                c for c in columns if f"{c}:" in schema_part
            }
            extra_cols = [
                tok.split(":")[0].strip()
                for tok in schema_part.split("<", 1)[-1].rstrip(">").split(",")
            ]
            if present == set(columns) and set(extra_cols) == set(columns):
                return
            raise AssertionError(
                f"ReadSchema not pruned to {sorted(columns)}: {schema_part}"
            )
    raise AssertionError(f"no ReadSchema in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    """Assert the plan contains a BroadcastHashJoin (small side is
    broadcast — no shuffle of the big side)."""
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan:
        raise AssertionError(f"no BroadcastHashJoin in plan:\n{plan}")


def assert_partial_aggregation(df: DataFrame) -> None:
    """Assert the aggregate splits into partial (map-side combine)
    and final stages — the property that bounds shuffle volume by
    #groups, not #rows."""
    plan = formatted_plan(df)
    n_hash_aggs = plan.count("HashAggregate")
    if n_hash_aggs < 2:
        raise AssertionError(
            f"expected partial+final HashAggregate, found {n_hash_aggs}:\n{plan}"
        )


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert no CartesianProduct / BroadcastNestedLoopJoin snuck in."""
    plan = formatted_plan(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise AssertionError(f"{bad} in plan:\n{plan}")


def executed_plan_descriptions(spark, thunk) -> list[str]:
    """Run ``thunk`` and return the physical-plan description of EVERY
    SQL execution it triggered — including jobs fired at DataFrame
    construction time (localCheckpoint, eager index builds, streaming
    microbatches), which a lazy ``formatted_plan`` on the returned
    frame can never see past (checkpoints truncate lineage).

    Reads the session's SQLAppStatusStore (the SQL tab's data source)
    through py4j; the listener bus is drained first so the store is
    current.  This is the audit surface for the iterative/eager
    queries the lazy plan sweep in tests/test_plans.py must skip.
    """
    jss = spark._jsparkSession
    store = jss.sharedState().statusStore()
    # Key executions by executionId, not list position: the store
    # evicts old entries once spark.sql.ui.retainedExecutions
    # (default 1000) is exceeded — reachable in a long shared-session
    # test run — and positional slicing would then attribute wrong
    # plans or miss executions entirely (ADVICE r10).
    before_lst = store.executionsList()
    max_before = -1
    for i in range(before_lst.size()):
        max_before = max(max_before, before_lst.apply(i).executionId())
    thunk()
    # the status store is fed asynchronously from the listener bus —
    # drain it so every execution the thunk triggered is visible
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    lst = store.executionsList()
    with_ids = []
    for i in range(lst.size()):
        e = lst.apply(i)
        if e.executionId() > max_before:
            with_ids.append((e.executionId(), e.physicalPlanDescription()))
    return [desc for _, desc in sorted(with_ids)]


def final_plan_section(desc: str) -> str:
    """The '== Final Plan ==' section of an executed-plan description
    (AQE re-plans at runtime; the initial plan's exchanges may be
    elided or coalesced away, so counting over the whole text would
    double-count).  Falls back to the full text for non-AQE plans."""
    if "== Final Plan ==" in desc:
        desc = desc.split("== Final Plan ==", 1)[1]
        desc = desc.split("== Initial Plan ==", 1)[0]
    return desc
