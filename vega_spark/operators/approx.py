"""Approximate / partial actions (SURVEY.md §2.9).

Reference parity: the reference runs a job with a TIMEOUT and merges
whatever task results arrived, extrapolating the rest:
- count_approx           reference src/rdd/rdd.rs:1018-1056 +
  src/partial/count_evaluator.rs:1-67 (Poisson extrapolation)
- count_by_value_approx  reference src/rdd/rdd.rs:461-499 +
  src/partial/grouped_count_evaluator.rs:1-61
- BoundedDouble          reference src/partial/bounded_double.rs:1-38
- generic evaluator      reference src/context.rs:508-524 →
  ``partial_aggregate`` below: the evaluator/timeout framework all
  the concrete actions (and ``mean_approx``) instantiate.

Implementation: PySpark can run a job over a *subset* of partitions
(``SparkContext.runJob(rdd, f, partitions)``); we submit per-partition
count jobs in chunks until the deadline, then extrapolate
``total ≈ seen / parts_done * parts_total`` with a normal-approx
confidence interval (the reference's CI math is itself stubbed —
count_evaluator.rs:49-60 FIXME — so we pin the mean semantics and
provide a real interval).

Idiomatic additions (the practical Spark answers to "approximate"):
approx_count_distinct (HyperLogLog++) and percentile_approx
(KLL/GK sketch) — both single-pass, mergeable, 100 TB-safe.
"""

from __future__ import annotations

import math
import time
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class BoundedDouble:
    """(mean, confidence, low, high) — reference bounded_double.rs:1-38."""
    mean: float
    confidence: float
    low: float
    high: float

    def is_exact(self) -> bool:
        return self.low == self.high == self.mean


def _z(confidence: float) -> float:
    # two-sided normal quantile via inverse erf (no scipy dependency)
    # Beasley-Springer-Moro-ish rational approximation is overkill here;
    # use the classic Acklam-lite via math.erf inversion by bisection.
    lo, hi = 0.0, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2
        if math.erf(mid / math.sqrt(2)) < confidence:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def partial_aggregate(rdd, partition_fn, merge_fn, init, evaluator,
                      timeout_ms: float, chunk: int = 4):
    """The GENERIC deadline-bounded partial action — reference
    ``run_approximate_job(func, rdd, evaluator, timeout)``
    (context.rs:508-524 + approximate_action_listener.rs): submit
    per-partition jobs incrementally (``chunk`` partitions per
    ``SparkContext.runJob``), fold each partition's ``partition_fn``
    result into an accumulator with ``merge_fn``, stop at the
    deadline (always completing at least one chunk), and hand
    ``evaluator(acc, n_done, n_total)`` the partials to extrapolate.
    count/sum/count-by-value below are thin instantiations; any
    user evaluator slots in the same way.

    Scale note: each runJob chunk is a real distributed job over only
    those partitions — the driver never pulls rows, only the per-
    partition partials (the same contract as the reference's
    evaluator merge).

    Deadline granularity: the timeout is checked BETWEEN chunks, so
    the effective deadline is coarse — it can overshoot by up to one
    chunk's wall time (job-submission overhead included), which on a
    busy cluster may be seconds. This matches the reference's
    listener semantics (results keep arriving until the timer fires);
    size ``chunk`` down if tighter deadline adherence matters."""
    sc = rdd.context
    n_parts = rdd.getNumPartitions()
    deadline = time.monotonic() + timeout_ms / 1000.0
    done = 0
    acc = init
    while done < n_parts:
        if done > 0 and time.monotonic() >= deadline:
            break
        parts = list(range(done, min(done + chunk, n_parts)))
        for p in sc.runJob(rdd, lambda it: [partition_fn(it)], parts):
            acc = merge_fn(acc, p)
        done += len(parts)
    return evaluator(acc, done, n_parts)


def count_approx(df: DataFrame, timeout_ms: float,
                 confidence: float = 0.95,
                 chunk: int = 4) -> BoundedDouble:
    """Count with a deadline: exact if all partitions finish in time,
    extrapolated otherwise (reference semantics: rdd.rs:1018-1056).
    Empty input → (0, 0, 0, inf) like count_evaluator.rs:41-47."""
    def count_iter(it):
        n = 0
        for _ in it:
            n += 1
        return n

    def evaluate(seen, done, n_parts):
        if done == n_parts:
            return BoundedDouble(float(seen), 1.0, float(seen), float(seen))
        if done == 0 or seen == 0:
            return BoundedDouble(0.0, 0.0, 0.0, float("inf"))
        mean = seen / done * n_parts
        # Poisson-ish CI on the extrapolated total
        var = seen * (n_parts / done) * (n_parts / done - 1.0)
        sd = math.sqrt(max(var, 0.0))
        z = _z(confidence)
        return BoundedDouble(mean, confidence, mean - z * sd, mean + z * sd)

    return partial_aggregate(df.rdd, count_iter, lambda a, p: a + p, 0,
                             evaluate, timeout_ms, chunk)


class ApproxKeyOverflow(RuntimeError):
    """count_by_value_approx saw more distinct keys than ``max_keys``.

    The driver-side merge map is the reference's own design
    (grouped_count_evaluator.rs keeps an OLAMap of every key on the
    driver) — faithful, but an unbounded driver dict OOMs at
    100 TB on a high-cardinality column. The cap turns that silent
    failure mode into an explicit signal; the message points at the
    distributed alternatives."""


def count_by_value_approx(df: DataFrame, cols: Sequence[str],
                          timeout_ms: float, confidence: float = 0.95,
                          chunk: int = 4,
                          max_keys: int = 100_000) -> dict[tuple, BoundedDouble]:
    """Grouped count with a deadline (grouped_count_evaluator.rs:1-61):
    per-partition HashMap counts merged on the driver, extrapolated
    by the fraction of partitions seen.

    ``max_keys`` bounds the driver-side merge map (the reference keeps
    an unbounded OLAMap — fine for its test scale, an OOM at 100 TB
    on a high-cardinality column). Exceeding it raises
    :class:`ApproxKeyOverflow`; for unbounded cardinality use the
    distributed ``count_by_value`` (a DataFrame, never on the driver)
    or the CMS heavy-hitters sketch (``sketches.cms_build`` /
    ``cms_topk``), which is O(width x depth) regardless of keys."""
    def count_map(it):
        m: dict[tuple, int] = {}
        for row in it:
            k = tuple(row)
            m[k] = m.get(k, 0) + 1
        return m

    def merge(acc: dict[tuple, int], m: dict[tuple, int]):
        for k, v in m.items():
            acc[k] = acc.get(k, 0) + v
        if len(acc) > max_keys:
            raise ApproxKeyOverflow(
                f"count_by_value_approx: merged map exceeded {max_keys} "
                "distinct keys; use count_by_value (distributed) or "
                "sketches.cms_build heavy-hitters instead, or raise "
                "max_keys.")
        return acc

    def evaluate(merged, done, n_parts):
        scale = n_parts / done if done else 0.0
        exact = done == n_parts
        z = _z(confidence)
        out: dict[tuple, BoundedDouble] = {}
        for k, v in merged.items():
            if exact:
                out[k] = BoundedDouble(float(v), 1.0, float(v), float(v))
            else:
                mean = v * scale
                sd = math.sqrt(max(v * scale * (scale - 1.0), 0.0))
                out[k] = BoundedDouble(mean, confidence,
                                       mean - z * sd, mean + z * sd)
        return out

    return partial_aggregate(df.select(*cols).rdd, count_map, merge, {},
                             evaluate, timeout_ms, chunk)


def approx_count_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct estimate — single pass, mergeable
    sketch, the idiomatic 100 TB replacement for exact countDistinct."""
    return df.agg(F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct"))


def percentile_approx(df: DataFrame, col: str,
                      percentiles: Sequence[float],
                      accuracy: int = 10000) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch)."""
    return df.agg(
        F.percentile_approx(col, list(percentiles), accuracy).alias("percentiles"))


def sum_approx(df: DataFrame, col: str, timeout_ms: float,
               confidence: float = 0.95, chunk: int = 4) -> BoundedDouble:
    """Deadline-bounded sum, same partial mechanism as count_approx."""
    def sum_iter(it):
        s = 0.0
        for row in it:
            v = row[0]
            if v is not None:
                s += v
        return s

    def evaluate(seen, done, n_parts):
        if done == n_parts:
            return BoundedDouble(seen, 1.0, seen, seen)
        if done == 0:
            return BoundedDouble(0.0, 0.0, float("-inf"), float("inf"))
        mean = seen / done * n_parts
        spread = abs(mean - seen)  # coarse bound; no row variance kept
        return BoundedDouble(mean, confidence, mean - spread, mean + spread)

    return partial_aggregate(df.select(col).rdd, sum_iter,
                             lambda a, p: a + p, 0.0,
                             evaluate, timeout_ms, chunk)


def mean_approx(df: DataFrame, col: str, timeout_ms: float,
                confidence: float = 0.95, chunk: int = 4) -> BoundedDouble:
    """Deadline-bounded mean — a NEW action written purely against
    the generic framework (the extensibility the reference's
    evaluator trait promises): partials are (sum, count) pairs, the
    evaluator divides. A partial mean needs no extrapolation — the
    seen rows' mean IS the estimate; only the interval widens."""
    def sum_count(it):
        s, n = 0.0, 0
        for row in it:
            v = row[0]
            if v is not None:
                s += v
                n += 1
        return (s, n)

    def evaluate(acc, done, n_parts):
        s, n = acc
        if n == 0:
            return BoundedDouble(0.0, 0.0, float("-inf"), float("inf"))
        mean = s / n
        if done == n_parts:
            return BoundedDouble(mean, 1.0, mean, mean)
        frac_unseen = 1.0 - done / n_parts
        spread = abs(mean) * frac_unseen  # coarse, like sum_approx
        return BoundedDouble(mean, confidence, mean - spread, mean + spread)

    return partial_aggregate(df.select(col).rdd, sum_count,
                             lambda a, p: (a[0] + p[0], a[1] + p[1]),
                             (0.0, 0), evaluate, timeout_ms, chunk)
