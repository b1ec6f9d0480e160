#!/usr/bin/env python
"""Round-13 streaming profiler: run streaming rungs and capture the
engine's own StreamingQueryProgress (durationMs breakdown + state
operator metrics) per micro-batch, plus wall time per rung.

Wraps replay.run_to_memory / run_foreach_batch so every started query's
recentProgress is recorded before the harness drops it.

Usage: python scripts/profile_stream_r13.py q_name [q_name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["ALSP_CACHE_TABLES"] = "1"

    from aws_lambda_stream_processing_spark.registry import load_all
    from aws_lambda_stream_processing_spark.session import get_spark
    from aws_lambda_stream_processing_spark.streaming import replay
    from aws_lambda_stream_processing_spark.tables import TABLES, load_table

    progress_log: list[dict] = []

    def _capture(q):
        for p in q.recentProgress:
            d = p if isinstance(p, dict) else json.loads(p.json)
            progress_log.append(
                {
                    "batchId": d.get("batchId"),
                    "numInputRows": d.get("numInputRows"),
                    "durationMs": d.get("durationMs"),
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName",
                                "commitTimeMs",
                                "numRowsTotal",
                                "numRowsUpdated",
                                "numStateStoreInstances",
                            )
                        }
                        for so in (d.get("stateOperators") or [])
                    ],
                }
            )

    orig_mem, orig_feb = replay.run_to_memory, replay.run_foreach_batch

    def run_to_memory(transformed, output_mode="append", timeout_s=120.0,
                      checkpoint=None, shuffle_partitions=None):
        spark = transformed.sparkSession
        import uuid as _uuid

        import shutil as _shutil
        name = "mem_" + _uuid.uuid4().hex[:12]
        own = checkpoint is None
        ckpt = checkpoint or replay._scratch("alsp_ckpt_")
        with replay._stream_shuffle_conf(spark, shuffle_partitions):
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
                _capture(q)
                if q.isActive:
                    q.stop()
                if own:
                    _shutil.rmtree(ckpt, ignore_errors=True)
        return spark.table(name)

    def run_foreach_batch(transformed, handler, output_mode="append",
                          timeout_s=120.0, checkpoint=None):
        import shutil as _shutil
        own = checkpoint is None
        ckpt = checkpoint or replay._scratch("alsp_ckpt_")
        with replay._stream_shuffle_conf(transformed.sparkSession):
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
                _capture(q)
                if q.isActive:
                    q.stop()
                if own:
                    _shutil.rmtree(ckpt, ignore_errors=True)

    replay.run_to_memory = run_to_memory
    replay.run_foreach_batch = run_foreach_batch
    # re-point queries.py's imported names too
    from aws_lambda_stream_processing_spark.streaming import (
        queries as squeries,
    )
    for mod in (squeries,):
        if hasattr(mod, "run_to_memory"):
            mod.run_to_memory = run_to_memory
        if hasattr(mod, "run_foreach_batch"):
            mod.run_foreach_batch = run_foreach_batch

    registry = load_all()
    spark = get_spark("alsp-stream-profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    for name in names:
        for rep in range(2):
            progress_log.clear()
            spark.sparkContext.setJobDescription(f"sprofile:{name}")
            t0 = time.perf_counter()
            try:
                registry[name].fn(spark, sf_dir).toPandas()
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({name: f"error: {exc}"}), flush=True)
                break
            wall = round(time.perf_counter() - t0, 3)
            print(
                json.dumps(
                    {
                        "q": name,
                        "rep": rep,
                        "wall_s": wall,
                        "n_batches": len(progress_log),
                        "progress": progress_log,
                    }
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
