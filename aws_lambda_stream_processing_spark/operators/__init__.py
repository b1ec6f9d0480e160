"""Relational operator surface (SURVEY.md §2.A–2.G).

Import order IS registration order IS the order a budget-bound driver
sweep certifies queries in (registry.load_all docstring). Cheapest
families first, measured at sf0.01 under driver_sim: windows /
scalar aggs / projections / sorts / setops are ~0.1-0.7 s each; joins
and behavior ~0.5-2 s; sources pay sink round-trips (~2-4 s);
the graph family LAST here — its queries share a ~4 s edge-relation
build that would otherwise sit in the middle of the sample prefix.

Round-8 rotation (see registry.load_all): the `udf` package (13
never-certified §2.K rungs) registers before this package; here
`modernsql` (8, never certified, all ≤1.3 s) moves to the head,
followed by `profiling` — its first 2 in file order were certified
in r7, the next ~27 never — so the driver's first-50 prefix is ~48
first-time IDs. The sqlfront/sketches block certified in r7 shifts
behind them. Rotation only permutes dict insertion order; every
query keeps its ID, oracle, and behavior.
"""

from aws_lambda_stream_processing_spark.operators import (  # noqa: F401
    modernsql,
    profiling,
    sqlfront,
    sketches,
    windows,
    aggregates,
    relational,
    sorts,
    setops,
    joins,
    behavior,
    scale,
    sources,
    graphs,
)
