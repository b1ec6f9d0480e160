#!/usr/bin/env python
"""Round-13 optimization profiler (guide §1: measure first).

For each named query (or the top-N from a committed bench artifact):
  * build the DataFrame (plan-construction wall time),
  * execute it into the built-in `noop` sink (computation without the
    collect/Arrow transfer — guide §1.4),
  * `toPandas()` (the bench's timed action, for comparability),
  * optionally dump `.explain("formatted")` to plans/r13/<name>_<tag>.txt.

Usage:
  python scripts/profile_r13.py [--plans TAG] [--repeat K] q_name [q_name ...]
  python scripts/profile_r13.py --top 30            # top-30 from newest BENCH_local
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def top_from_bench(n: int) -> list[str]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import glob
    import re

    cands = []
    for p in glob.glob(os.path.join(here, "BENCH_local_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if m:
            cands.append((int(m.group(1)), p))
    cands.sort()
    obj = None
    for ln in open(cands[-1][1]).read().splitlines():
        try:
            o = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if "queries" in o:
            obj = o
    qs = obj["queries"]
    return [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:n]]


def main() -> int:
    argv = sys.argv[1:]
    plans_tag = None
    repeat = 1
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--plans":
            plans_tag = argv[i + 1]
            i += 2
        elif a == "--repeat":
            repeat = int(argv[i + 1])
            i += 2
        elif a == "--top":
            names += top_from_bench(int(argv[i + 1]))
            i += 2
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["ALSP_CACHE_TABLES"] = "1"

    from aws_lambda_stream_processing_spark.registry import load_all
    from aws_lambda_stream_processing_spark.session import get_spark
    from aws_lambda_stream_processing_spark.tables import TABLES, load_table

    registry = load_all()
    spark = get_spark("alsp-profile-r13")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        spec = registry[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        rec: dict[str, list | str] = {"build_s": [], "noop_s": [], "pandas_s": []}
        for _ in range(repeat):
            t0 = time.perf_counter()
            try:
                df = spec.fn(spark, sf_dir)
            except Exception as exc:  # noqa: BLE001
                rec["error"] = f"build: {exc}"
                break
            t1 = time.perf_counter()
            rec["build_s"].append(round(t1 - t0, 3))
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                rec["error"] = f"noop: {exc}"
            t2 = time.perf_counter()
            rec["noop_s"].append(round(t2 - t1, 3))
            # fresh build for the pandas leg so caches/local checkpoints
            # created during build are in the same state as the bench
            try:
                df2 = spec.fn(spark, sf_dir)
                df2.toPandas()
            except Exception as exc:  # noqa: BLE001
                rec["error"] = f"pandas: {exc}"
            rec["pandas_s"].append(round(time.perf_counter() - t2, 3))
        if plans_tag and "error" not in rec:
            try:
                df = spec.fn(spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:  # noqa: BLE001
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                txt = buf.getvalue()
            with open(
                os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
            ) as fh:
                fh.write(txt)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    spark.sparkContext.setJobDescription(None)
    print("TOTALS " + json.dumps(
        {
            k: round(sum(min(v) for v in
                         (out[n][k] for n in out if k in out[n] and out[n][k])
                         ), 2)
            for k in ("build_s", "noop_s", "pandas_s")
        }
    ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
