"""Action-count audit (r3 verdict stretch #9): how many Spark JOBS a
query builder triggers while constructing its DataFrame.

Most builders are fully lazy (0 jobs until the driver collects); a few
run eager actions by design — convergence reads, bounded-guard collects,
localCheckpoint pins, broadcast materializations. Those eager queries
are exactly where action-fan-out regressions live (the r3 bench caught
q_graph_bfs_3hop at 5 eager counts + per-level shuffles only AFTER the
round closed). `jobs_run` turns the job count into an assertable fact so
tests/test_plans.py can pin a per-query ceiling and pytest catches the
regression, not the next round's bench diff.

Mechanism: a scoped job group — every job submitted by the thunk (from
this thread) lands in a uuid-fresh group, and `statusTracker` reports the
group's job ids afterwards. No listener registration, no py4j callback
server; group-id scoping is the same facility the Spark UI uses.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable
from typing import Any, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")


def jobs_run(
    spark: SparkSession, thunk: Callable[[], T]
) -> tuple[T, int]:
    """Run `thunk` and return (result, number of Spark jobs it triggered).

    Counts only jobs submitted from the calling thread while the thunk
    runs (job-group scoping), so concurrent streams/other threads don't
    pollute the count. The group id is fresh per call — re-entrant and
    suite-safe."""
    sc = spark.sparkContext
    group = f"alsp-action-audit-{uuid.uuid4().hex[:12]}"
    # setJobGroup writes THREE thread-local properties; save and restore
    # all of them, or the audit's description/interrupt flag leak onto
    # whatever job the calling thread submits next (r5 ADVICE).
    props = (
        "spark.jobGroup.id",
        "spark.job.description",
        "spark.job.interruptOnCancel",
    )
    prev: dict[str, Any] = {p: sc.getLocalProperty(p) for p in props}
    sc.setJobGroup(group, "action-count audit", False)
    try:
        result = thunk()
    finally:
        # restore the caller's properties (None clears)
        for p in props:
            sc.setLocalProperty(p, prev[p])
    return result, len(sc.statusTracker().getJobIdsForGroup(group))
