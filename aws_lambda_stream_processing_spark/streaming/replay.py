"""Stream-replay harness: run the `events` table as a Structured Streaming
source and materialize the result — the Lambda-handler execution model
(micro-batch over an ordered shard) mapped onto Spark (SURVEY.md §2.I, §3.3).

`availableNow` replays all existing files as bounded micro-batches with
checkpointing, exactly like an event-source mapping draining a shard; the
memory sink stands in for the DynamoDB/S3 sink and is swapped for
parquet/Kafka sinks in production (`foreachBatch` for arbitrary ones).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Explicit schema: streaming file sources cannot infer (and at 100 TB you
# pin schemas anyway). The 2026-08-13 testdata regen stores ts as NAIVE
# timestamp[us]; with inferTimestampNTZ disabled (session.RUNTIME_CONFS)
# Spark reads the stored micros verbatim as LTZ — identical to the batch
# loader (tables.load_table) and DuckDB's naive-as-UTC read. (The earlier
# TIMESTAMP(NANOS)-as-long era needed `ts BIGINT` + div-1000 here.)
EVENTS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)

# Stateful streaming operators create one StateStore instance per shuffle
# partition per operator; at this event volume 32 stores per micro-batch is
# pure overhead (measured 7.3 s → 2.5 s on the stream-stream join by
# dropping to 8; 8 → 4 is worth another ~0.5 s/query, 4 → 2 flat — round-2
# sweep). On a real cluster this is sized to cores × small factor.
_STREAM_SHUFFLE_PARTITIONS = "4"


def _scratch(prefix: str) -> str:
    """Streaming scratch dir (checkpoints, split inputs): tmpfs when the
    host has it — state-store commits are many tiny files and fsync-bound
    on disk (measured 30-40% of streaming query time at sf0.1). On a real
    cluster this is the RocksDB local dir + an object-store checkpoint."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def py_state_width(spark: SparkSession) -> str:
    """Shuffle width for PYTHON-stateful streams (applyInPandasWithState).

    The r2 width ladder that picked 4 measured JVM state-store rungs,
    where per-partition store instances dominate. A Python-stateful
    stage's cost is the per-key pandas handler instead, and width 4
    runs those kernels on 4 cores: r12 interleaved ladder on
    q_stream_custom_state at sf0.1 (min-of-3 noop) — 5.2 s @4,
    3.5 s @8, 2.7 s @16. Derived from the session (the driver benches
    at lower core counts too), capped where the store-instance
    overhead catches up."""
    return str(max(4, min(spark.sparkContext.defaultParallelism, 16)))


class _stream_shuffle_conf:
    """Scoped shuffle-partition override for the duration of a stream run."""

    def __init__(self, spark: SparkSession, width: str | None = None):
        self._spark = spark
        self._width = width or _STREAM_SHUFFLE_PARTITIONS

    def __enter__(self) -> None:
        self._saved = self._spark.conf.get("spark.sql.shuffle.partitions")
        self._spark.conf.set("spark.sql.shuffle.partitions", self._width)

    def __exit__(self, *exc) -> None:
        self._spark.conf.set("spark.sql.shuffle.partitions", self._saved)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as an unbounded DataFrame (file streaming source)."""
    # The file streaming source wants a directory; select just events.parquet
    # out of the sf dir with a glob filter.
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def run_to_memory(
    transformed: DataFrame,
    output_mode: str = "append",
    timeout_s: float = 120.0,
    checkpoint: str | None = None,
    shuffle_partitions: str | None = None,
) -> DataFrame:
    """Execute a streaming plan with trigger(availableNow) into a memory
    sink; block until drained; return the materialized result as a batch DF.

    Pass an explicit `checkpoint` to resume a previous run's offsets,
    watermark and operator state (restart semantics); the caller then owns
    its cleanup. Each run gets a fresh memory sink, so a resumed run's table
    contains only rows emitted by that run. `shuffle_partitions` overrides
    the default stream width (see py_state_width for the Python-stateful
    rungs' wider setting).
    """
    spark = transformed.sparkSession
    name = "mem_" + uuid.uuid4().hex[:12]
    own_ckpt = checkpoint is None
    ckpt = checkpoint or _scratch("alsp_ckpt_")
    with _stream_shuffle_conf(spark, shuffle_partitions):
        q = (
            transformed.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
            if own_ckpt:
                shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def run_foreach_batch(
    transformed: DataFrame,
    handler: Callable[[DataFrame, int], None],
    output_mode: str = "append",
    timeout_s: float = 120.0,
    checkpoint: str | None = None,
) -> None:
    """The Lambda-handler equivalent: `handler(batch_df, batch_id)` runs once
    per micro-batch with exactly-once semantics (batch_id-keyed idempotence
    replaces Kinesis checkpoint-after-success). Unlike the memory sink,
    foreachBatch supports checkpoint recovery — pass `checkpoint` to resume
    offsets/watermark/state across runs (caller owns its cleanup)."""
    own_ckpt = checkpoint is None
    ckpt = checkpoint or _scratch("alsp_ckpt_")
    with _stream_shuffle_conf(transformed.sparkSession):
        q = (
            transformed.writeStream.foreachBatch(handler)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
            if own_ckpt:
                shutil.rmtree(ckpt, ignore_errors=True)


def split_events_dir(
    spark: SparkSession,
    sf_dir: str,
    predicates: list[str],
) -> str:
    """Write `events` into one parquet file per predicate, with file mtimes
    in list order, so availableNow + maxFilesPerTrigger=1 replays them as
    ordered micro-batches (late-data / watermark testing — SURVEY §7.2).
    See split_table_dir for the mechanics."""
    return split_table_dir(spark, sf_dir, "events", predicates)


def split_table_dir(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    predicates: list[str],
) -> str:
    """Write `table` into one parquet file per predicate, with file mtimes
    in list order, so availableNow + maxFilesPerTrigger=1 replays them as
    ordered micro-batches. Predicates may OVERLAP — that replays the
    overlapping rows twice, the at-least-once redelivery a Kinesis
    consumer must tolerate (q_stream_llm_curation uses this).

    Returns the directory. Caller owns cleanup.

    The Spark write jobs run ONCE per (application, sf_dir, table,
    predicates) into a memoized master dir; every call hands back a fresh
    tmpfs COPY of those files (~ms), so callers keep delete-ownership
    while a multi-query sweep pays the split cost once, not per streaming
    query.
    """
    from aws_lambda_stream_processing_spark.tables import load_table

    key = (
        spark.sparkContext.applicationId, sf_dir, table, tuple(predicates)
    )
    stale = [k for k in _SPLIT_MEMO if k[0] != key[0]]
    for k in stale:
        shutil.rmtree(_SPLIT_MEMO.pop(k), ignore_errors=True)
    master = _SPLIT_MEMO.get(key)
    if master is None or not os.path.isdir(master):
        master = _scratch("alsp_stream_master_")
        events = load_table(spark, sf_dir, table)
        for i, pred in enumerate(predicates):
            part_dir = os.path.join(master, f"_stage_{i}")
            events.where(F.expr(pred)).coalesce(1).write.mode(
                "overwrite"
            ).parquet(part_dir)
            src = next(
                f for f in os.listdir(part_dir)
                if f.endswith(".parquet") and not f.startswith("_")
            )
            shutil.move(
                os.path.join(part_dir, src),
                os.path.join(master, f"batch_{i:03d}.parquet"),
            )
            shutil.rmtree(part_dir, ignore_errors=True)
        _SPLIT_MEMO[key] = master
    out = _scratch("alsp_stream_in_")
    now = time.time()
    for i in range(len(predicates)):
        name = f"batch_{i:03d}.parquet"
        dst = os.path.join(out, name)
        shutil.copy(os.path.join(master, name), dst)
        # FileStreamSource orders by modification time (oldest first).
        os.utime(dst, (now + i * 10, now + i * 10))
    return out


# (app_id, sf_dir, table, predicates) -> master split dir; see
# split_table_dir. tmpfs outlives the process, so masters are reaped at
# interpreter exit — the round-1 ADVICE tempdir-leak class, closed
# preemptively.
_SPLIT_MEMO: dict[tuple[str, str, str, tuple[str, ...]], str] = {}


def _reap_split_masters() -> None:
    for d in _SPLIT_MEMO.values():
        shutil.rmtree(d, ignore_errors=True)
    _SPLIT_MEMO.clear()


import atexit  # noqa: E402  (registration belongs next to the memo)

atexit.register(_reap_split_masters)
