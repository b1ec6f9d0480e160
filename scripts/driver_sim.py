"""Simulate the driver harness end-to-end against __spark_entry__.py.

Set ALSP_CORRECTNESS_OUT=/path.json to also write the per-query results
in the driver's CORRECTNESS_r{N}.json format (rows/schema/hash matches,
row counts, err) — the committed self-certification artifact.

Builds a *vanilla* SparkSession (no engine configs — the driver owns the
session, so the engine's per-query conf pinning must do the work), then:
  1. smoke: entry(spark) at sf0.001, rows > 0
  2. correctness: every queries()[name] at the given sf vs oracle_sql()[name]
     in DuckDB — row count + column set + order-insensitive value multiset.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "item"):
        return canon_value(v.item())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(
        tuple(canon_value(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E

    # Vanilla session — deliberately NOT the engine factory.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    smoke = E.entry(spark)
    n = smoke.count()
    print(f"SMOKE entry() rows={n} schema={[f.name for f in smoke.schema]}")
    assert n > 0

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    fail, weak_n = [], 0
    results: dict[str, dict] = {}

    def record(name, *, rows_match=False, schema_match=False,
               hash_match=False, spark_rows=None, oracle_rows=None,
               err=None):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:
            fail.append(name)
            record(name, err=f"spark error {type(ex).__name__}: {ex}"[:300])
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            weak_n += 1
            record(name, spark_rows=len(sdf), err="no_oracle")
            print(f"weak {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            fail.append(name)
            record(name, spark_rows=len(sdf),
                   err=f"duckdb error {ex}"[:300])
            print(f"FAIL {name}: duckdb error {ex}")
            continue
        sdf.columns = [c.lower() for c in sdf.columns]
        odf.columns = [c.lower() for c in odf.columns]
        if sorted(sdf.columns) != sorted(odf.columns):
            fail.append(name)
            record(name, spark_rows=len(sdf), oracle_rows=len(odf),
                   err="schema mismatch")
            print(f"FAIL {name}: cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            fail.append(name)
            record(name, schema_match=True, spark_rows=len(sdf),
                   oracle_rows=len(odf), err="rowcount mismatch")
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
            continue
        s, o = canon_frame(sdf), canon_frame(odf)
        bad = [(a, b) for a, b in zip(s, o) if a != b]
        if bad:
            fail.append(name)
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(sdf), oracle_rows=len(odf),
                   err=f"{len(bad)} value mismatches")
            print(f"FAIL {name}: {len(bad)} value mismatches; first:")
            print(f"  spark={bad[0][0]}\n  duck ={bad[0][1]}")
        else:
            record(name, rows_match=True, schema_match=True,
                   hash_match=True, spark_rows=len(sdf),
                   oracle_rows=len(odf))
            print(f"ok   {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")

    import json
    import os

    out = os.environ.get("ALSP_CORRECTNESS_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {len(results)} results to {out}")

    total = len(only) if only else len(qs)
    print(
        f"\n{total - len(fail)}/{total} ok ({weak_n} weak rows-only); "
        f"failures: {fail or 'none'}"
    )
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
