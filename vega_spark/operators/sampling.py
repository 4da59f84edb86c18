"""Sampling / randomness (SURVEY.md §2.8).

Reference parity:
- sample(w, fraction)      reference src/rdd/rdd.rs:674-702,
  partitionwise_sampled_rdd.rs:14-134 — Bernoulli (w/o replacement)
  or Poisson (with), gap-sampling below fraction 0.4. Spark's
  df.sample uses the identical samplers (they share ancestry).
- take_sample(w, num, seed) reference src/rdd/rdd.rs:704-783 —
  count → oversampling fraction from Poisson/binomial bounds →
  sample → retry → shuffle → take. Reimplemented here with the same
  oversampling math (utils/random.rs:299-358).
- random_split(weights)     reference src/rdd/rdd.rs:622-672 —
  disjoint Bernoulli cells, same seed per partition: df.randomSplit
  is the same construction.

Cross-engine RNGs differ (reference: PCG64; Spark: XORShift), so
parity is *property-based*: exact sizes where the reference
guarantees them, disjointness/proportions for splits, determinism
under a fixed seed within this engine (FIXTURES.md F9).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def sample(df: DataFrame, with_replacement: bool, fraction: float,
           seed: int | None = None) -> DataFrame:
    return df.sample(withReplacement=with_replacement, fraction=fraction, seed=seed)


def random_split(df: DataFrame, weights: Sequence[float],
                 seed: int | None = None) -> list[DataFrame]:
    return df.randomSplit(list(weights), seed=seed)


def _compute_fraction_for_sample_size(sample_size: int, total: int,
                                      with_replacement: bool) -> float:
    """The reference's oversampling bound (utils/random.rs:299-358):
    Poisson upper bound with replacement, binomial (delta=1e-4)
    without — guarantees >= sample_size rows w.h.p. in one pass."""
    if with_replacement:
        frac = sample_size / total
        num_std = 9 if sample_size < 12 else 5
        return frac + num_std * math.sqrt(frac / total)
    delta = 1e-4
    gamma = -math.log(delta) / total
    frac = min(1.0, max(1e-10, (sample_size / total) + gamma +
                        math.sqrt(gamma * gamma + 2 * gamma * (sample_size / total))))
    return frac


def take_sample(df: DataFrame, with_replacement: bool, num: int,
                seed: int | None = None) -> list[Row]:
    """Exact-size sample to the driver, one distributed pass + retries
    (reference caps retries at 100, rdd.rs:758-775)."""
    if num == 0:
        return []
    total = df.count()
    if total == 0:
        return []
    if not with_replacement and num >= total:
        return df.collect()
    fraction = _compute_fraction_for_sample_size(num, total, with_replacement)
    rows = df.sample(withReplacement=with_replacement, fraction=fraction,
                     seed=seed).take(num * 2)
    tries = 0
    while len(rows) < num and tries < 100:
        tries += 1
        s = None if seed is None else seed + tries
        rows = df.sample(withReplacement=with_replacement, fraction=fraction,
                         seed=s).take(num * 2)
    return rows[:num]


def sample_stratified(df: DataFrame, col: str, fractions: dict,
                      seed: int | None = None) -> DataFrame:
    """Stratified sampling without replacement (per-key fraction) —
    reference gap (its samplers are global-fraction only,
    src/utils/random.rs:36-297); Spark's sampleBy is the per-stratum
    Bernoulli form, one narrow pass, no shuffle."""
    return df.sampleBy(col, fractions, seed=seed)


def sample_deterministic_per_key(df: DataFrame, key_cols,
                                 k: int, id_col: str) -> DataFrame:
    """Exactly-k-per-key deterministic sample: for each key group keep
    the k rows with the smallest md5(id) — a pseudo-random but fully
    reproducible pick (same rows on every run, every engine, no RNG
    state). The standard way a training pipeline caps per-domain /
    per-source document counts while keeping the selection auditable.

    Plan shape: row_number over (key, hash order) then rank <= k —
    Spark 4 rewrites that into WindowGroupLimit, a per-map-task
    partial top-k heap BEFORE the exchange, so the shuffle carries at
    most k rows per key per input partition, never the group. Skewed
    keys (one domain = half the corpus) therefore cost map-side heap
    work, not a hot reducer."""
    from pyspark.sql import Window

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = Window.partitionBy(*keys).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn"))


def hash_split(df: DataFrame, id_col: str,
               splits: Sequence[tuple[str, float]] = (
                   ("train", 0.8), ("val", 0.1), ("test", 0.1)),
               ) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first byte
    of md5(id), thresholds on the 256-grid of the cumulative split
    fractions. Unlike ``randomSplit`` this is stable across runs,
    engines, partitionings and cluster sizes — the reproducibility
    contract a training pipeline needs (re-running at 100 TB must not
    migrate docs between train and test).

    Fully narrow (one expression per row, no shuffle); the hex-string
    comparison keeps it engine-portable (lowercase hex compares
    lexicographically = numerically)."""
    b = F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 2)
    cum = 0.0
    expr = None
    for name, frac in splits[:-1]:
        cum += frac
        t = int(round(cum * 256))
        # t >= 256 would format as 3 hex chars ('100'), breaking the
        # 2-char lexicographic compare ('ff' < '100' is False) and
        # silently dumping the whole hash range into later splits —
        # every bucket is < 256, so the condition is simply "always".
        cond = F.lit(True) if t >= 256 else b < F.lit(format(t, "02x"))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(splits[-1][0]) if expr is None
            else expr.otherwise(splits[-1][0]))
    return df.withColumn("split", expr)


def temperature_resample(df: DataFrame, group_col: str, id_col: str,
                         total: int, alpha: float = 0.5) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-LLM
    sampling scheme): group g gets a quota ∝ n_g^alpha (alpha<1
    upweights rare groups), filled with the deterministically-ordered
    (md5) first quota_g rows of the group.

    quota_g = min(n_g, floor(total * n_g^alpha / Σ n^alpha) + 1) —
    the +1 floor form keeps the boundary arithmetic identical across
    engines.

    Plan: per-group counts are a tiny aggregate → quota table
    broadcasts back; the pick is the WindowGroupLimit rank filter
    (map-side top-k heaps), so a dominant group never concentrates on
    one reducer. Two constant-size exchanges + one narrow scan pass
    at any SF."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(
        F.sum(F.pow(F.col("__n"), alpha)).alias("__z"))
    quota = (counts.crossJoin(F.broadcast(tot))
             .select(group_col,
                     F.least(
                         F.col("__n"),
                         (F.floor(F.lit(total) * F.pow(F.col("__n"), alpha)
                                  / F.col("__z")) + 1).cast("bigint"),
                     ).alias("__quota")))
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .join(F.broadcast(quota), group_col)
            .filter(F.col("__rn") <= F.col("__quota"))
            .drop("__rn", "__quota"))


def stratified_sample_deterministic(df: DataFrame, strata_col: str,
                                    fractions: dict[str, float],
                                    id_col: str,
                                    default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum Bernoulli sampling by hash fraction instead of a
    seeded RNG: keep a row iff md5-fraction(id) < fraction[stratum].
    Same contract as `sample_stratified` (Spark's sampleBy) but fully
    deterministic and engine-replayable — reruns, retries, and any
    other engine select the IDENTICAL rows, which is what lineage
    reproducibility at 100 TB actually requires (a seeded sampleBy
    re-draws per partition split). Narrow expression, no shuffle;
    strata missing from ``fractions`` get ``default_fraction``."""
    h = (F.conv(F.substring(
        F.md5(F.col(id_col).cast("string").cast("binary")), 1, 12),
        16, 10).cast("double") / F.lit(float(16 ** 12)))
    expr = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        expr = F.when(F.col(strata_col) == k, F.lit(float(v))) \
                .otherwise(expr)
    return df.filter(h < expr)


def weighted_sample_ares(df: DataFrame, weight_col: str, id_col: str,
                         n: int, round_dp: int = 6) -> DataFrame:
    """Weighted sampling without replacement, A-Res scheme (Efraimidis
    & Spirakis 2006): each row draws a deterministic md5-based
    uniform u ∈ (0,1) and the top ``n`` rows by key u^(1/w) form the
    sample — inclusion probability proportional to weight, one pass,
    fully replayable on any engine (no RNG state). The curation use:
    importance-weighted corpus subsampling where reruns must pick the
    identical rows.

    Plan: the key is a narrow expression; selection is a bounded
    TakeOrdered head (per-partition heaps + driver merge) — no global
    sort, no shuffle of the table. Weights must be > 0 (rows with
    w <= 0 are dropped, matching 'never sampled')."""
    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                            1, 12), 16, 10).cast("double") + 1.0) \
        / float(1 << 48)
    key = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    return (df.filter(F.col(weight_col) > 0)
            .select(F.col(id_col).alias("id"),
                    F.col(weight_col).alias("weight"),
                    F.round(key, round_dp).alias("sort_key"),
                    key.alias("__k"))
            .orderBy(F.desc("__k"), F.asc("id")).limit(n)
            .drop("__k"))


def weighted_sample_ares_by(df: DataFrame, stratum_col: str,
                            weight_col: str, id_col: str, n: int,
                            round_dp: int = 6) -> DataFrame:
    """Stratified A-Res: ``n`` weighted samples WITHOUT replacement
    per stratum (same deterministic md5-uniform keys as
    :func:`weighted_sample_ares`), selected with a window PARTITIONED
    by the stratum — a per-key bounded heap, no global sort, one
    keyed exchange. The per-language / per-source quota sampler for
    corpus mixing where reruns must be bit-identical."""
    from pyspark.sql.window import Window

    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                            1, 12), 16, 10).cast("double") + 1.0) \
        / float(1 << 48)
    key = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    w = Window.partitionBy("stratum").orderBy(F.desc("__k"), F.asc("id"))
    return (df.filter(F.col(weight_col) > 0)
            .select(F.col(stratum_col).alias("stratum"),
                    F.col(id_col).alias("id"),
                    F.col(weight_col).alias("weight"),
                    key.alias("__k"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= n)
            .select("stratum", "id", "weight",
                    F.round("__k", round_dp).alias("sort_key"), "rk"))
