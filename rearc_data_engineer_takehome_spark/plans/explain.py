"""Physical-plan quality checks.

A plan that is correct but mis-shaped (fact-table shuffle for a dim
lookup, full sort for a top-k, unpruned scan) works at sf0.1 and dies at
100 TB. These helpers turn ``.explain("formatted")`` into assertions so
plan shape is TESTED, not eyeballed (tests/test_plans.py).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """Capture .explain('formatted') as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_broadcast_join(df: DataFrame) -> bool:
    """True if every join in the plan is broadcast — at least one
    broadcast join AND no SortMergeJoin/ShuffledHashJoin anywhere (a
    single fact-side shuffle join hiding behind a broadcast one is
    exactly the regression this check exists to catch)."""
    plan = formatted_plan(df)
    broadcast = "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    return broadcast and not ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan)


def has_shuffle_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def has_take_ordered(df: DataFrame) -> bool:
    """True if orderBy().limit(k) compiled to TakeOrderedAndProject
    (per-partition heaps) instead of a global Sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clause(s) of the scan nodes — empty string means
    nothing reached the data source."""
    plan = formatted_plan(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "PushedFilters" in line
    )


def read_schema(df: DataFrame) -> str:
    """The ReadSchema clause(s) — shows column pruning at the scan."""
    plan = formatted_plan(df)
    return "\n".join(
        line.strip() for line in plan.splitlines() if "ReadSchema" in line
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of distinct shuffle exchanges in the physical plan
    (excludes broadcast exchanges, which move only the small side).
    Counts the '(N) Exchange' node-detail headers so the tree rendering
    doesn't double-count."""
    import re

    plan = formatted_plan(df)
    return len(
        [
            m
            for m in re.findall(r"^\((\d+)\) (\w+)", plan, flags=re.MULTILINE)
            if m[1] == "Exchange"
        ]
    )


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    """True if the EXECUTED plan contains WholeStageCodegen spans. Under
    AQE, codegen is decided per stage at runtime, so the pre-execution
    formatted/codegen modes report nothing — this triggers execution
    (count) and inspects the final adaptive plan."""
    plan = formatted_plan(df)
    if "codegen id" in plan:
        return True
    if "AdaptiveSparkPlan" in plan:
        # collect() (not count(), which builds a new plan) finalizes THIS
        # DataFrame's QueryExecution so the adaptive plan is inspectable
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        # compact plan strings mark codegen'd operators with '*(N) '
        return "WholeStageCodegen" in executed or "*(" in executed
    return False
