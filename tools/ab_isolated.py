"""Dedicated serialized per-query A/B (VERDICT r7 #1): the committed
2x gate compares bench-run timings against BASELINE.md rows, but a
bench reading is taken inside a 214-query mega-session — plan-cache
churn, JVM heap aging, and host stalls all ride along. When a query
breaches the gate with NO code change, the adjudication protocol is:

1. isolate it — FRESH session, sf0.001 warm-up, one sf0.1 warm run,
   then N timed runs (min + all readings reported);
2. compare the isolated min against the committed baseline row: under
   the gate -> the breach was measurement-layer (session aging /
   contention), recorded as adjudicated with these readings;
   still over -> a real regression, bisect the query.

One query at a time, one timed job at a time (serialize-performance-
measurements doctrine). Prints one JSON line per query.

Usage: python tools/ab_isolated.py q1 [q2 ...] [--runs N] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = 3
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from vega_spark import registry
    from vega_spark.session import get_session

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")),
                            "sf0.001")
    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        # fresh session per query: stop any live one first so the
        # isolated reading carries no prior-session JVM state
        from pyspark.sql import SparkSession
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = get_session(f"ab-{name}")
        spark.range(1000).count()
        if os.path.isdir(warm_dir):
            fn(spark, warm_dir).count()
        fn(spark, sf_dir).count()          # sf0.1 warm (JIT + AQE shape)
        readings = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            readings.append(round(time.perf_counter() - t0, 3))
        op = registry.OPERATOR_ONLY.get(name)
        op_readings = []
        if op is not None:
            op(spark, sf_dir).count()
            for _ in range(runs):
                t0 = time.perf_counter()
                op(spark, sf_dir).count()
                op_readings.append(round(time.perf_counter() - t0, 3))
        row = {"min": min(readings), "runs": readings}
        if op_readings:
            row["operator_only"] = {"min": min(op_readings),
                                    "runs": op_readings}
        out[name] = row
        print(json.dumps({name: row}))
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
