"""Per-query microbench replicating bench.py's exact methodology
(sf0.001 JIT warmup pass, untimed pass at the target sf, best-of-3
with cache clears) for a NAMED subset — the A/B harness for this
round's optimization work, so a candidate change is judged under the
same protocol the driver's bench uses.

Usage: python tools/microbench.py query [query ...]
       SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: microbench.py query [query ...]", file=sys.stderr)
        return 2

    from etl_staging_spark.session import get_spark
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark = get_spark("microbench")
    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    for name in names:
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    out = {}
    for name in names:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.catalog.clearCache()
        out[name] = round(best, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
