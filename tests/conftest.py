"""Shared test harness: one SparkSession, a DuckDB oracle connection, and a
comparator that mimics the driver's check (row count + schema + order-
insensitive value comparison) so parity bugs surface before driver rounds.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from aws_lambda_stream_processing_spark.registry import load_all
from aws_lambda_stream_processing_spark.session import get_spark
from aws_lambda_stream_processing_spark.tables import TABLES

SF_DIR = os.environ.get("ALSP_TEST_SF_DIR", "/root/testdata/sf0.001")

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("alsp-tests")
    yield spark


@pytest.fixture(scope="session")
def registry():
    return load_all()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canon_value(v):
    """Canonicalize one cell the way a value-hash would see it."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact bit pattern — parity must be bit-identical for floats
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return canon_value(v.item())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(canon_value(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def assert_parity(spark, duck, spec, sf_dir: str = SF_DIR):
    result = spec.fn(spark, sf_dir)
    # Driver-canonicalizer safety gate: the driver pandas-sorts EVERY
    # query's output (weak ones included) — an array/map/struct column
    # crashes it with `unhashable type` (round-1 q_agg_approx_percentile).
    # SURVEY §2 convention 4: complex values are string-serialized.
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in result.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{spec.name}: output column {f.name!r} has complex type "
            f"{f.dataType.simpleString()} — string-serialize it "
            "(SURVEY §2 convention 4); raw complex types crash the "
            "driver's pandas canonicalizer"
        )
    sdf = result.toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # weak: runs and yields a frame
        return
    odf = duck.execute(spec.oracle).df()
    assert sorted(map(str.lower, sdf.columns)) == sorted(
        map(str.lower, odf.columns)
    ), f"{spec.name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    odf.columns = [c.lower() for c in odf.columns]
    sdf.columns = [c.lower() for c in sdf.columns]
    assert len(sdf) == len(odf), (
        f"{spec.name}: row count {len(sdf)} (spark) vs {len(odf)} (duckdb)"
    )
    srows, orows = canon_frame(sdf), canon_frame(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)} row mismatches; first 3: "
        + "\n".join(f"spark={a}\n duck={b}" for _, a, b in mismatches[:3])
    )
