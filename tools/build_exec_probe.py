"""Split each headline query's bench cost into driver-side DataFrame
CONSTRUCTION time vs noop-sink EXECUTION time (warmed, best-of-2 each).

The bench times `qs[name](spark, sf_dir).write...save()` — one number
covering py4j plan construction, analysis/optimization, and execution.
A query whose construction dominates is optimized with guide §7.3
(plan/driver-time) moves, not shuffle work; this probe says which is
which.

Usage: python tools/build_exec_probe.py [query ...]   (default: all
HEADLINE) — env contract as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from etl_staging_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench

    only = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark = get_spark("build-exec-probe")
    qs = entrymod.queries()
    names = only or list(bench.HEADLINE)
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # warm both shapes (bench.py's protocol)
    for name in names:
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    out = {}
    for name in names:
        build = exec_ = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            build = min(build, t1 - t0)
            exec_ = min(exec_, t2 - t1)
        spark.catalog.clearCache()
        out[name] = {"build": round(build, 3), "exec": round(exec_, 3)}
    for name, d in sorted(out.items(), key=lambda kv: -(kv[1]["build"] + kv[1]["exec"])):
        print(f"{d['build']+d['exec']:7.2f}  build={d['build']:6.2f}  exec={d['exec']:6.2f}  {name}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
