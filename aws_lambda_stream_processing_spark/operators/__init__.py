"""Relational operator surface (SURVEY.md §2.A–2.G).

Import order IS registration order IS the order a budget-bound driver
sweep certifies queries in (registry.load_all docstring). Cheapest
families first, measured at sf0.01 under driver_sim: windows /
scalar aggs / projections / sorts / setops are ~0.1-0.7 s each; joins
and behavior ~0.5-2 s; sources pay sink round-trips (~2-4 s);
the graph family LAST here — its queries share a ~4 s edge-relation
build that would otherwise sit in the middle of the sample prefix.

Round-6 rotation (see registry.load_all): `windows` moved to the head
so the never-driver-certified §2.E family lands inside the driver's
~50-query sample prefix; the r1-r5-certified aggregate/filter block
shifts behind it.
"""

from aws_lambda_stream_processing_spark.operators import (  # noqa: F401
    windows,
    aggregates,
    relational,
    sorts,
    setops,
    joins,
    behavior,
    profiling,
    sqlfront,
    sketches,
    scale,
    sources,
    graphs,
)
