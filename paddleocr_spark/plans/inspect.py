"""Plan-quality probes: make 100-TB-scale properties *testable*.

The reference has no optimizer (SURVEY.md §4); on Spark the plan IS the
performance contract, so tests assert it directly: filters reach the
parquet scan, projections prune columns, small dimensions broadcast,
aggregations have a partial (map-side) phase, and shuffle counts stay
at the designed minimum.
"""

from __future__ import annotations

import re

__all__ = [
    "formatted_plan", "scan_read_schema", "pushed_filters",
    "count_exchanges", "has_broadcast_join", "has_sort_merge_join",
    "has_partial_aggregate", "wholestage_codegen_spans",
]


def formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def scan_read_schema(df) -> list[str]:
    """Column lists of every parquet scan's ReadSchema."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        out.append([c.split(":")[0].strip()
                    for c in m.group(1).split(",") if c.strip()])
    return out


def pushed_filters(df) -> list[str]:
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def count_exchanges(df) -> int:
    """Shuffle exchanges in the physical plan (excludes broadcast
    exchanges, which move only the small side)."""
    plan = formatted_plan(df)
    # formatted mode: each node appears once in the tree as
    # "+- Exchange (7)" / ":- Exchange (3)" and once as a "(7) Exchange"
    # detail header; count the detail headers.
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.MULTILINE))


def has_broadcast_join(df) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_join(df) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def has_partial_aggregate(df) -> bool:
    plan = formatted_plan(df)
    return bool(re.search(r"HashAggregate.*partial", plan, re.IGNORECASE)) \
        or "partial_" in plan


def wholestage_codegen_spans(df) -> int:
    """Number of whole-stage-codegen subtrees (codegen explain mode)."""
    codegen = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("codegen"))
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", codegen)
    return int(m.group(1)) if m else 0
