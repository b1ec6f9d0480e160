"""Physical-plan inspection helpers (SURVEY.md §4).

The 100 TB posture is only real if the plans prove it: filters reach the
parquet scan, projections prune the read schema, small dims broadcast,
top-k runs as a group-limit, nothing silently degenerates to a cartesian
product. These helpers turn `explain()` output into assertable facts;
tests/test_plans.py pins them for the flagship queries so a regression in
plan shape fails CI even while results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (post-AQE initial plan; AQE may improve it
    further at runtime, never degrade these properties)."""
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode  # noqa: SLF001
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan (row-group pruning)."""
    plan = plan_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """The column sets actually read from parquet (one per scan)."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan_string(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan set of column names read from parquet."""
    return [
        {c.split(":")[0].strip() for c in s.split(",") if c.strip()}
        for s in read_schemas(df)
    ]


def has_operator(df: DataFrame, op: str) -> bool:
    """True if the physical plan contains the operator name (e.g.
    'BroadcastHashJoin', 'WindowGroupLimit', 'CartesianProduct')."""
    return op in plan_string(df)


def operator_counts(df: DataFrame, *ops: str) -> dict[str, int]:
    plan = plan_string(df)
    return {op: plan.count(op) for op in ops}


def global_windows(df: DataFrame) -> list[str]:
    """Window specs with an EMPTY partitionSpec — each one is a stage that
    funnels its whole input through a single task. Over a data-scaled
    relation that is the #1 100 TB anti-pattern (SURVEY.md §4); the
    two-phase helpers in operators/dprefix.py exist to avoid it.

    Detection: in windowspecdefinition(part..., order..., frame) the
    partition columns are bare refs; a spec whose FIRST argument is
    already a sort spec (`col ASC/DESC NULLS ...`) or the frame has no
    partitioning."""
    plan = plan_string(df, "simple")
    out: list[str] = []
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        first = m.group(1).split(",")[0].strip()
        if first.startswith("specifiedwindowframe") or re.search(
            r"\s(ASC|DESC)\s", first
        ):
            out.append(first)
    return out
