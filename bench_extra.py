"""Extra benchmarks / plan capture (guide §1.4-1.5) — NOT the graded
bench.  Times individual queries with the noop sink and dumps
``explain("formatted")`` per query to plans/<tag>/.

Usage:
  python bench_extra.py time  <repeats> <query> [query ...]
  python bench_extra.py plan  <tag> <query> [query ...]   # plans/<tag>/<q>.txt

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from chomper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _run(fn, spark, mode, out_path=None):
    qtmp = tempfile.mkdtemp(prefix="bx_")
    prev_tmp = tempfile.tempdir
    tempfile.tempdir = qtmp
    try:
        if mode == "plan":
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(out_path, "w") as fh:
                fh.write(plan)
            return 0.0
        # same timed region as bench.py: query construction (which for
        # sink queries runs the replay) + noop write of the result
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    finally:
        tempfile.tempdir = prev_tmp
        shutil.rmtree(qtmp, ignore_errors=True)


def main() -> None:
    mode = sys.argv[1]
    if mode == "time":
        repeats = int(sys.argv[2])
        names = sys.argv[3:]
    else:
        tag = sys.argv[2]
        names = sys.argv[3:]
        os.makedirs(os.path.join("plans", tag), exist_ok=True)
    spark = get_spark("bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qs = entry_mod.queries()
    # small warmup so codegen/classloading does not pollute timings
    for t in ("events", "documents", "embeddings", "orders"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if mode == "plan":
            spark.sparkContext.setJobDescription(f"plan:{name}")
            _run(fn, spark, "plan", os.path.join("plans", tag, f"{name}.txt"))
            print(f"wrote plans/{tag}/{name}.txt", flush=True)
            continue
        out[name] = []
        for r in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}#{r}")
            out[name].append(round(_run(fn, spark, "time"), 3))
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
