"""Guard: no oracle may hand the driver a DuckDB-widened column.

DuckDB widens integer aggregates (SUM(BIGINT) -> HUGEINT); the
driver's Arrow-mediated value hash then sees decimal128/float64 where
Spark has int64, and numerically identical results hash differently —
the root cause of every round-2 hash_match:false row.  registry pins
the columns recorded in vega_spark/oracle_casts.py back to BIGINT;
this test replans every oracle (types are data-independent) so a new
or edited oracle that reintroduces a widened type, or a stale
generated file, fails CI instead of failing the driver.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from vega_spark import registry
from vega_spark.tables import TABLE_NAMES

from tools.gen_oracle_casts import WIDENED, detect

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"'{os.path.join(SF_DIR, t)}.parquet'")
    return c


def test_no_widened_types_in_pinned_oracles(con):
    offenders = {}
    for name, sql in registry.ORACLES.items():
        rel = con.sql(sql)
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if any(k in str(t).upper() for k in WIDENED)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"{len(offenders)} oracles expose widened DuckDB types "
        f"(run tools/gen_oracle_casts.py): {offenders}")


def test_generated_cast_file_is_current():
    from vega_spark.oracle_casts import WIDENED_COLS
    assert detect(SF_DIR) == WIDENED_COLS, (
        "vega_spark/oracle_casts.py is stale — "
        "run tools/gen_oracle_casts.py")


def test_checker_fails_widened_and_cross_family_types():
    from tools.check_oracle import type_problems
    # widened duckdb type must fail even when families agree
    assert type_problems({"n": "bigint"}, {"n": "HUGEINT"})
    # int column vs double column must fail (dtype check, VERDICT r2 #7)
    assert type_problems({"x": "bigint"}, {"x": "DOUBLE"})
    # integer width differences are driver-tolerated
    assert not type_problems({"rk": "int"}, {"rk": "BIGINT"})
    assert not type_problems({"v": "double"}, {"v": "DOUBLE"})
