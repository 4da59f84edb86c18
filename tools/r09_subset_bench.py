"""Focused in-session subset bench (r9 opt continuation): times the
named registry queries with bench.py's methodology (one session,
sf0.001 warm-up of each query, then N timed full materializations,
min reported) — the before/after instrument for targeted A/Bs where
the full 218-query bench would drown the signal in session noise.

Usage: python tools/r09_subset_bench.py q1 [q2 ...] [--runs N]
Prints one JSON line: {"queries": {name: min_sec}, "runs": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vega_spark import registry  # noqa: E402
from vega_spark.session import get_session  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    runs = 3
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("r09-subset-bench", cpus=int(cpus))
    out, allruns = {}, {}
    for name in args:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"bench:{name}:{i}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
        out[name] = min(times)
        allruns[name] = times
        print(json.dumps({name: {"min": min(times), "runs": times}}),
              flush=True)
    print(json.dumps({"queries": out, "total_min": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
