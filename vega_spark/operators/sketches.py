"""Mergeable sketches — the scale-first answer to distinct counting.

The reference's approximate layer (src/partial/*, SURVEY.md §2.9) is
deadline-based: run the exact job, stop at the timeout. That shape
can't pre-aggregate. Mergeable sketches invert it: build a tiny
fixed-size summary per fine-grained group ONCE, then answer any
coarser rollup by merging summaries — no rescan of the 100 TB base
table. This is the Datasketches HLL family that ships in Spark 3.5+
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), all
JVM-side, codegen-friendly, shuffle payload = one ~2^lgK-byte binary
per group.

At 100 TB: daily per-key sketches land in a small parquet rollup
table; weekly/monthly/all-time distincts are merges of that rollup —
seconds, not a rescan. Error is ~1.04/sqrt(2^lgConfigK) (default
lgK=12 → ~1.6%); below the sparse-mode threshold the sketch stores
the coupon set itself, so small-cardinality estimates are EXACT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_partial(df: DataFrame, keys: Sequence[str], value_col: str,
                lg_config_k: int = 12,
                sketch_col: str = "hll_sketch") -> DataFrame:
    """Per-group HLL sketch of ``value_col``'s distinct values.
    One shuffle on ``keys``; the output is the durable rollup row:
    (keys..., sketch binary). Write it partitioned by the finest
    time grain and every coarser question becomes a merge."""
    return (df.groupBy(*keys)
            .agg(F.hll_sketch_agg(value_col, lg_config_k)
                 .alias(sketch_col)))


def hll_merge(partials: DataFrame, keys: Sequence[str],
              sketch_col: str = "hll_sketch",
              out_col: str = "approx_distinct") -> DataFrame:
    """Roll partial sketches up to coarser ``keys`` (possibly []):
    union-merge the binaries, then estimate. Input rows = |fine
    groups|, not |base rows| — this never touches the base table."""
    grouped = (partials.groupBy(*keys) if keys
               else partials.groupBy())
    return grouped.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(sketch_col)).alias(out_col))


def hll_distinct(df: DataFrame, keys: Sequence[str], value_col: str,
                 lg_config_k: int = 12,
                 out_col: str = "approx_distinct") -> Column | DataFrame:
    """One-shot grouped approx distinct via a single sketch pass
    (partial+final agg, one shuffle) — same answer as
    hll_merge(hll_partial(...)) by the merge property."""
    return (df.groupBy(*keys)
            .agg(F.hll_sketch_estimate(
                F.hll_sketch_agg(value_col, lg_config_k)).alias(out_col)))


# --- count-min sketch (mergeable frequency summary) ------------------------

def cms_build(df: DataFrame, value_col: str,
              depth: int = 4, width: int = 2048) -> DataFrame:
    """Count-min sketch of a column's value frequencies as a tiny
    relational table (row, bucket, cnt) — ≤ depth*width rows no
    matter the input size. bucket_i(v) = xxhash64(i, v) mod width
    (JVM-side, codegen'd; the row index seeds the hash family).

    One scan with a ×depth narrow fan-out, then one partial-agg
    shuffle whose cardinality is the sketch size — constant at any
    SF. Mergeable by construction: sketches of two datasets add
    counter-wise (``cms_merge``), so per-day sketches roll up to any
    window without rescanning the base table."""
    probes = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(F.xxhash64(F.lit(i), F.col(value_col)),
                        F.lit(width)).cast("int").alias("bucket"))
        for i in range(depth)])
    return (df.select(F.explode(probes).alias("rb"))
            .groupBy(F.col("rb.row").alias("row"),
                     F.col("rb.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the same (depth, width):
    counter-wise sum."""
    from functools import reduce

    u = reduce(DataFrame.unionAll, sketches)
    return u.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, queries: DataFrame, value_col: str,
                 depth: int = 4, width: int = 2048) -> DataFrame:
    """Point-frequency estimates for every value in ``queries``:
    min over the sketch rows (the classic CMS upper-bound estimate —
    never under-counts, over-counts by collision mass only).

    Probe side explodes to depth rows per query value and joins the
    sketch on (row, bucket); the sketch side is ≤ depth*width rows —
    always broadcastable, so lookups are a narrow map-side join."""
    probes = queries.select(
        F.col(value_col),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     F.pmod(F.xxhash64(F.lit(i), F.col(value_col)),
                            F.lit(width)).cast("int").alias("bucket"))
            for i in range(depth)])).alias("rb"))
    return (probes.join(F.broadcast(sketch),
                        (probes["rb.row"] == sketch["row"])
                        & (probes["rb.bucket"] == sketch["bucket"]),
                        "left")
            .select(value_col, F.coalesce("cnt", F.lit(0)).alias("cnt"))
            .groupBy(value_col).agg(F.min("cnt").alias("est_count")))


# --- KMV / bottom-k sketch (mergeable distinct + set-relation estimates) ---

def _kmv_hash(c: Column) -> Column:
    """Uniform hash fraction in (0, 1]: first 12 hex chars of md5 of
    the string form, as an integer over 16^12. md5-of-string is the
    repo's cross-engine deterministic hash (any engine reproduces it),
    and 16^12 < 2^53 so the double is exact."""
    h = F.md5(c.cast("string").cast("binary"))
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("double")
            / F.lit(float(16 ** 12)))


def kmv_sketch(df: DataFrame, col: Column | str, k: int = 256) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) sketch of a column's distinct
    values: the ``k`` smallest distinct hash fractions, as a ≤k-row
    DataFrame (h double). The third mergeable-sketch family next to
    HLL (distinct counts) and CMS (frequencies) — KMV additionally
    answers SET relations (Jaccard / intersection size) between
    corpora, which HLL alone cannot.

    Scale shape: a per-partition bottom-k prune first (dense_rank over
    a ``spark_partition_id`` window — partitioned, never global), so
    the exchange carries ≤ partitions×k hashes regardless of base
    cardinality; then the global bottom-k is a dedup +
    TakeOrderedAndProject over that bounded set. The global bottom-k
    distinct hashes are a subset of the union of local bottom-k's, so
    the prune is lossless."""
    from pyspark.sql.window import Window

    c = F.col(col) if isinstance(col, str) else col
    local = df.select(_kmv_hash(c).alias("h"),
                      F.spark_partition_id().alias("__pid"))
    w = Window.partitionBy("__pid").orderBy("h")
    pruned = (local.withColumn("__rk", F.dense_rank().over(w))
              .filter(F.col("__rk") <= k).select("h"))
    return pruned.distinct().orderBy("h").limit(k)


def kmv_merge(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Sketch of the UNION of the sketched sets: bottom-k of the
    merged hash sets. Exactly equals ``kmv_sketch`` of the unioned
    base data (the bottom-k of a union is contained in the union of
    bottom-k's) — the merge property that makes per-shard /
    per-day sketches roll up without rescanning."""
    from functools import reduce

    u = reduce(DataFrame.unionAll, sketches)
    return u.distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 256,
                 out_col: str = "ndv_est") -> DataFrame:
    """1-row distinct-count estimate: exact row count while the
    sketch is not full (the hash set IS the value set then), else the
    classic (k-1)/h_k estimator (h_k = largest retained fraction)."""
    return (sketch.agg(F.count("h").alias("__n"), F.max("h").alias("__hk"))
            .select(F.when(F.col("__n") < k, F.col("__n").cast("double"))
                    .otherwise(F.lit(float(k - 1)) / F.col("__hk"))
                    .alias(out_col)))


def kmv_set_relations(a: DataFrame, b: DataFrame,
                      k: int = 256) -> DataFrame:
    """Distinct-count, Jaccard, and intersection-size estimates for
    two KMV sketches, as one 1-row DataFrame (ndv_a_est, ndv_b_est,
    ndv_union_est, jaccard_est, intersection_est).

    Method (Beyer et al., "On Synopses for Distinct-Value Estimation
    Under Multiset Operations", SIGMOD'07): build the union sketch
    K = bottom-k(A ∪ B); Jaccard ≈ |K ∩ A ∩ B| / |K| (the union
    bottom-k is a uniform sample of A ∪ B); intersection ≈ J × |A∪B|.
    Every frame here is ≤ k rows, so the joins/aggregates are
    broadcast-trivial at any base-data scale. Each input sketch is
    materialized once (localCheckpoint of ≤ k rows) — it is consumed
    by three consumers below, and without the cut each would re-scan
    the base table the sketch was built from."""
    a = a.localCheckpoint(eager=True)
    b = b.localCheckpoint(eager=True)
    u = kmv_merge(a, b, k=k).localCheckpoint(eager=True)
    both = (u.join(a.select("h"), "h", "semi")
             .join(b.select("h"), "h", "semi"))
    stats = (kmv_estimate(a, k, "ndv_a_est")
             .crossJoin(kmv_estimate(b, k, "ndv_b_est"))
             .crossJoin(kmv_estimate(u, k, "ndv_union_est"))
             .crossJoin(u.agg(F.count("h").alias("__nu")))
             .crossJoin(both.agg(F.count("h").alias("__nb"))))
    jac = F.when(F.col("__nu") > 0,
                 F.col("__nb") / F.col("__nu")).otherwise(F.lit(0.0))
    return stats.select(
        F.round("ndv_a_est", 4).alias("ndv_a_est"),
        F.round("ndv_b_est", 4).alias("ndv_b_est"),
        F.round("ndv_union_est", 4).alias("ndv_union_est"),
        F.round(jac, 4).alias("jaccard_est"),
        F.round(jac * F.col("ndv_union_est"), 4).alias("intersection_est"))


def bloom_build(df: DataFrame, col: Column | str,
                m_bits: int = 1 << 17, k: int = 3) -> DataFrame:
    """Distributed Bloom filter build in pure Column expressions
    (Spark's `bloom_filter_agg` is internal-only, so the bit array is
    assembled with public primitives): each value sets ``k`` xxhash64
    positions in an ``m_bits`` bitmap; per-word masks combine with a
    ``bit_or`` partial+final aggregate (64-bit words, map-side
    combined), and the ≤ m/64-row word table collapses into ONE dense
    array<long> row via a map lookup — constant-size output no matter
    the input SF.

    Returns a 1-row DataFrame (bf array<long>, m_bits, k) meant to be
    broadcast-joined by `bloom_probe`. No false negatives; FP rate
    ≈ (1-e^{-kn/m})^k — size m for the corpus you gate."""
    c = F.col(col) if isinstance(col, str) else col
    n_words = m_bits // 64
    pos = [F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits)) for i in range(k)]
    bits = df.select(F.explode(F.array(*[
        F.struct((p / 64).cast("int").alias("w"),
                 F.pmod(p, F.lit(64)).cast("int").alias("b"))
        for p in pos])).alias("x"))
    words = (bits.select("x.w",
                         F.expr("shiftleft(CAST(1 AS BIGINT), x.b)").alias("m"))
             .groupBy("w").agg(F.bit_or("m").alias("m")))
    return (words.agg(F.map_from_entries(
                F.collect_list(F.struct("w", "m"))).alias("wm"))
            .select(F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(F.element_at("wm", i), F.lit(0)))
                .alias("bf"),
                F.lit(m_bits).alias("m_bits"), F.lit(k).alias("k")))


def bloom_probe(df: DataFrame, bloom: DataFrame, col: Column | str,
                k: int = 3, m_bits: int = 1 << 17,
                out_col: str = "bloom_hit") -> DataFrame:
    """Membership probe against a `bloom_build` result: the 1-row
    filter broadcast-cross-joins onto the probe side (a few KB to
    every task), and the k bit tests are pure integer expressions —
    the classic runtime-filter shape that turns an anti-join against
    a 100 TB corpus into a narrow scan + tiny verification join."""
    c = F.col(col) if isinstance(col, str) else col
    j = df.crossJoin(F.broadcast(bloom.select("bf")))
    tmp = []
    for i in range(k):
        p = F.pmod(F.xxhash64(c, F.lit(i)), F.lit(m_bits))
        j = (j.withColumn(f"__bw{i}",
                          F.element_at("bf", (p / 64).cast("int") + 1))
             .withColumn(f"__bb{i}", F.pmod(p, F.lit(64)).cast("int")))
        tmp += [f"__bw{i}", f"__bb{i}"]
    hit = None
    for i in range(k):
        t = F.expr(f"(__bw{i} & shiftleft(CAST(1 AS BIGINT), __bb{i})) != 0")
        hit = t if hit is None else (hit & t)
    return j.withColumn(out_col, hit).drop("bf", *tmp)


def kmv_sketch_by(df: DataFrame, keys: Sequence[str],
                  col: Column | str, k: int = 256) -> DataFrame:
    """Per-group KMV sketch: for every ``keys`` group, the k smallest
    distinct hash fractions — rows (keys..., h). The grouped rollup
    row for incremental pipelines: write one per (group, batch) and
    any coarser distinct/set question is a merge (`kmv_merge_by`),
    never a rescan. Exchanges: one dedup on (keys, h), one rank
    window partitioned by the group — both keyed, never global."""
    from pyspark.sql.window import Window

    c = F.col(col) if isinstance(col, str) else col
    d = (df.select(*keys, _kmv_hash(c).alias("h"))
         .dropDuplicates([*keys, "h"]))
    w = Window.partitionBy(*keys).orderBy("h")
    return (d.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def kmv_merge_by(partials: DataFrame, keys: Sequence[str],
                 k: int = 256) -> DataFrame:
    """Merge per-group sketch partials (e.g. one per micro-batch /
    day) into the group's union sketch: distinct hashes, bottom-k per
    group. Input cardinality = sketch rows, not base rows."""
    from pyspark.sql.window import Window

    d = partials.select(*keys, "h").dropDuplicates([*keys, "h"])
    w = Window.partitionBy(*keys).orderBy("h")
    return (d.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k).drop("__rk"))


def kmv_estimate_by(sketch: DataFrame, keys: Sequence[str],
                    k: int = 256,
                    out_col: str = "ndv_est") -> DataFrame:
    """Per-group distinct estimate: exact count while the group's
    sketch is not full, else (k-1)/h_k."""
    return (sketch.groupBy(*keys)
            .agg(F.count("h").alias("__n"), F.max("h").alias("__hk"))
            .select(*keys,
                    F.when(F.col("__n") < k, F.col("__n").cast("double"))
                    .otherwise(F.lit(float(k - 1)) / F.col("__hk"))
                    .alias(out_col)))


# --- bitmap rollup: EXACT mergeable distinct for integer ids ---------------

def bitmap_partial(df: DataFrame, keys: Sequence[str],
                   id_col: str,
                   bitmap_col: str = "id_bitmap") -> DataFrame:
    """Per-group roaring-style bitmap of an integer id column
    (Spark's bitmap_* functions: ids bucket into 32k-bit chunks, the
    aggregate ORs positions). The EXACT counterpart to the HLL/KMV
    rollups: same write-once / merge-forever pattern, zero error —
    the right tool when ids are dense integers (user ids, doc ids)
    and exactness is required (billing, dedup audits). Sketch size
    scales with id-range density rather than being constant; for
    sparse 64-bit ids prefer HLL/KMV.

    Output: (keys..., bucket, bitmap binary) — one row per 32k-id
    bucket per group."""
    b = (df.select(*keys,
                   F.bitmap_bucket_number(F.col(id_col)).alias("bucket"),
                   F.bitmap_bit_position(F.col(id_col)).alias("pos")))
    return (b.groupBy(*keys, "bucket")
            .agg(F.bitmap_construct_agg("pos").alias(bitmap_col)))


def bitmap_merge_count(partials: DataFrame, keys: Sequence[str],
                       bitmap_col: str = "id_bitmap",
                       out_col: str = "n_distinct") -> DataFrame:
    """Merge bitmap partials (possibly from many batches/days) up to
    ``keys`` and count: OR within (keys, bucket), popcount, sum over
    buckets. Exact at any merge depth; input rows = partial rows."""
    ored = (partials.groupBy(*keys, "bucket")
            .agg(F.bitmap_or_agg(bitmap_col).alias("__bm")))
    return (ored.groupBy(*keys)
            .agg(F.sum(F.bitmap_count("__bm")).alias(out_col)))
