"""Table catalog: the ten driver-generated parquet tables (TESTDATA.md).

At 100 TB these would be date/key-partitioned parquet datasets (or Iceberg
tables); `spark.read.parquet` picks up partition pruning + predicate pushdown
+ column pruning automatically, so the loading surface is identical — only
the path layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Tiny dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier"}


# Session-scoped memo: re-creating a parquet DataFrame re-lists files and
# re-reads footers (~30-50 ms) on every one of a suite's table loads; the
# same DataFrame object is semantically identical. Keyed by the Spark
# applicationId — NOT id(spark): CPython recycles object ids, so a new
# session could otherwise be handed frames bound to a dead one. Entries
# from other applications are evicted on access (one live session at a
# time), which also frees any .cache()d frames. With ALSP_CACHE_TABLES=1
# the frame is additionally .cache()d — the SURVEY §6 bench posture
# (bench.py sets it; correctness/tests run uncached so plan gates keep
# seeing real parquet scans with pushdown).
_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    import os

    app_id = spark.sparkContext.applicationId
    stale = [k for k in _MEMO if k[0] != app_id]
    for k in stale:
        del _MEMO[k]
    key = (app_id, sf_dir, name)
    if key in _MEMO:
        return _MEMO[key]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS) read as raw nanos (nanosAsLong);
        # truncate to µs exactly like DuckDB 1.0 does on read. `div` is
        # integral floor-division for these positive epochs.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Defensive: if NTZ inference was active anyway (immutable conf), map
    # every TIMESTAMP_NTZ column to LTZ via zone-independent calendar
    # arithmetic against the NTZ epoch — equals the naive-as-UTC read.
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    for fld in df.schema.fields:
        if isinstance(fld.dataType, TimestampNTZType):
            df = df.withColumn(
                fld.name,
                F.expr(
                    "timestamp_micros(timestampdiff(MICROSECOND, "
                    f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {fld.name}))"
                ),
            )
    if os.environ.get("ALSP_CACHE_TABLES") == "1":
        # The driver's parquet fixtures are single-file, single-ROW-GROUP
        # tables, so a scan can never split them: every map-side stage
        # (JVM codegen AND mapInPandas/applyInPandas kernels) of every
        # query ran on ONE task until its first exchange (r12 audit:
        # getNumPartitions == 1 for 9 of the 10 cached tables at sf0.1).
        # Guide §2.5 "input skew — one huge unsplittable file →
        # repartition immediately after the read": spread the fact
        # tables across the session's actual parallelism ONCE, at cache
        # materialization (outside the bench clock; the suite warms the
        # cache before timing). Round-robin repartition is deterministic
        # here (sortBeforeRepartition on a deterministic single-file
        # scan), results are partitioning-invariant (full 537-query
        # oracle sweep re-run green on this change), and the width
        # derives from the session — nothing local-mode-specific. The
        # broadcast dims stay single-partition (they are a few KB).
        if name not in BROADCAST_TABLES:
            df = df.repartition(spark.sparkContext.defaultParallelism)
        df = df.cache()
    _MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def pin_width(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition to the session's shuffle width ahead of a stage whose
    per-row cost AQE cannot see.

    AQE's partition coalescing sizes post-shuffle partitions by BYTES
    (advisoryPartitionSizeInBytes / minPartitionSize) — correct for JVM
    relational stages, but blind to stages whose cost is per-row COMPUTE:
    Python kernels (applyInPandas / mapInPandas GEMM blocks) and
    O(|frame|) window re-aggregations. On calibration-sized inputs AQE
    folded those exchanges to ONE partition and serialized the stage
    (r12 audit: q_udf_grouped_map 5.2 s serial vs 1.7 s pinned;
    q_llm_jaccard_spectrum's n² popcount ran as one task). An explicit
    numPartitions repartition is exempt from AQE coalescing, and a
    downstream groupBy/cogroup/window on the same keys reuses the hash
    partitioning, so no second exchange appears (guide §2.4/§2.5). Width
    follows spark.sql.shuffle.partitions — cores locally, operator-sized
    on a cluster. With no keys the repartition is round-robin (for
    per-row kernels where placement is free).
    """
    from pyspark.sql import functions as F

    w = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(w, *[F.col(k) for k in keys])
