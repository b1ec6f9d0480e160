"""Relational operator surface (SURVEY.md §2.A–2.G).

Import order IS registration order IS the order a budget-bound driver
sweep certifies queries in (registry.load_all docstring). Cheapest
families first, measured at sf0.01 under driver_sim: scalar aggs /
projections / sorts / setops / windows are ~0.1-0.5 s each; joins and
behavior ~0.5-2 s; sources pay sink round-trips (~2-4 s);
the graph family LAST here — its queries share a ~4 s edge-relation
build that would otherwise sit in the middle of the sample prefix.
"""

from aws_lambda_stream_processing_spark.operators import (  # noqa: F401
    aggregates,
    relational,
    sorts,
    setops,
    windows,
    joins,
    behavior,
    profiling,
    sqlfront,
    sketches,
    scale,
    sources,
    graphs,
)
