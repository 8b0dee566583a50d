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


def _split_top_level(body: str, openers: str = "<([", closers: str = ">)]"
                     ) -> list[str]:
    """Split ``body`` on commas at bracket depth 0 only — nested
    ``array<struct<...>>`` / ``In(col, [a,b])`` stay whole."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch in openers:
            depth += 1
        elif ch in closers:
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return [p.strip() for p in parts if p.strip()]


def scan_read_schema(df) -> list[str]:
    """TOP-LEVEL column lists of every parquet scan's ReadSchema.

    Depth-aware: ``struct<a:bigint,spans:array<struct<k:string>>,z:int>``
    yields ``[a, spans, z]`` — nested field names never leak in and
    trailing columns after a nested type are kept (a naive
    first-``>`` regex returns ``[a, spans, k]`` and drops ``z``).
    Spark truncates long schema strings (no closing ``>``); the
    truncated tail is parsed as far as it goes and the possibly-cut
    final name is dropped rather than reported half-spelled.
    """
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<", plan):
        start = m.end()
        depth, i = 1, start
        truncated = False
        while i < len(plan):
            ch = plan[i]
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "\n":  # truncated by Spark's metadata cap
                truncated = True
                break
            i += 1
        else:
            truncated = True
        fields = _split_top_level(plan[start:i])
        if truncated and fields:
            fields = fields[:-1]  # last name may be cut mid-spelling
        out.append([f.split(":")[0].strip() for f in fields
                    if f.split(":")[0].strip()])
    return out


def pushed_filters(df) -> list[str]:
    """Pushed data-source filters, one string per filter. Depth-aware:
    ``In(name, [a,b,c])`` is ONE filter, not four fragments, and
    filters after it are not dropped at its inner ``]``."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[", plan):
        start = m.end()
        depth, end = 1, len(plan)
        for i in range(start, len(plan)):
            ch = plan[i]
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
                if depth == 0:
                    end = i
                    break
            elif ch == "\n":  # truncated line: no closing bracket
                end = i
                break
        out.extend(_split_top_level(plan[start:end]))
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
