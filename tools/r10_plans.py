"""Dump `.explain("formatted")` for named registry queries into
plans/r10/<query>_<tag>.txt (the r9 optimization-round evidence files:
`_before` captured at the pre-optimization HEAD, `_after` at the
committed state).

Usage: python tools/r10_plans.py <tag> q1 [q2 ...]
       python tools/r10_plans.py before dedup_simhash_collapsed
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from vega_spark import registry  # noqa: E402
from vega_spark.session import get_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(_REPO, "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("r10-plans")
    for name in names:
        fn = registry.QUERIES.get(name) or registry.OPERATOR_ONLY.get(name)
        if fn is None:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        df = fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
