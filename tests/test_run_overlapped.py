"""run_overlapped (r9 opt, guide §2.6): independent driver thunks —
typically eager localCheckpoints of independent contract legs — run
concurrently from a thread pool. The contract under test: results in
argument order, exceptions propagate after all threads finish, and
Spark actions submitted from the pool produce the same frames as the
serial form (the multi-leg queries rely on exactly this)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vega_spark.session import run_overlapped


def test_results_in_argument_order():
    import time

    def slow():
        time.sleep(0.2)
        return "slow"

    assert run_overlapped(slow, lambda: "fast", lambda: 3) == \
        ("slow", "fast", 3)


def test_single_thunk_runs_inline():
    assert run_overlapped(lambda: 42) == (42,)


def test_exception_propagates_after_all_threads():
    seen = []

    def ok():
        seen.append("ok")
        return 1

    def boom():
        raise ValueError("leg failed")

    with pytest.raises(ValueError, match="leg failed"):
        run_overlapped(boom, ok)
    # the healthy leg still ran to completion (no half-started leak)
    assert seen == ["ok"]


def test_spark_actions_from_threads_match_serial(spark):
    df = spark.range(0, 1000).withColumn(
        "k", (F.col("id") % 7).cast("int"))
    evens = df.filter(F.col("id") % 2 == 0)
    odds = df.filter(F.col("id") % 2 == 1)

    e_ser = evens.localCheckpoint(eager=True)
    o_ser = odds.localCheckpoint(eager=True)
    e_par, o_par = run_overlapped(
        lambda: evens.localCheckpoint(eager=True),
        lambda: odds.localCheckpoint(eager=True))

    assert e_par.count() == e_ser.count() == 500
    assert o_par.count() == o_ser.count() == 500
    assert (e_par.exceptAll(e_ser).count() == 0
            and e_ser.exceptAll(e_par).count() == 0)
    assert (o_par.exceptAll(o_ser).count() == 0
            and o_ser.exceptAll(o_par).count() == 0)
