"""Similarity search over embedding columns (array<float>).

Two tiers:
- cosine_topk_bruteforce — exact top-k for a (small) query set:
  broadcast the queries, one narrow pass over the corpus computing
  dot products JVM-side (zip_with + aggregate), then per-query top-k
  (TakeOrderedAndProject shape — no global sort).
- lsh_ann_topk — sign-random-projection LSH: corpus and queries are
  bucketed by the sign pattern of dot products with fixed random
  hyperplanes; candidates = same-bucket rows (multi-probe: hamming-1
  neighbors optional); exact rerank on candidates only.

Scale notes: brute force is O(|corpus| x |queries|) — fine when
queries are a broadcastable constant, impossible corpus-vs-corpus.
The LSH path's candidate generation is one equi-join on the bucket
key; recall/cost is tuned by (num_planes, probes). At 100 TB the
corpus side stays partitioned and is never collected or re-shuffled
beyond the single bucket-key exchange.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, JVM-side."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(corpus: DataFrame, queries: DataFrame,
                           k: int = 10,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k of ``corpus`` rows per ``queries`` row.

    queries must be small (it is broadcast). Ties broken by corpus id
    so the result set is deterministic."""
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
    ))
    scored = corpus.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col), F.col("__qvec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk"))


def _random_planes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign pattern of <vec, plane_i> packed into a BIGINT bucket key."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(vec, plane) > 0,
                           F.shiftleft(F.lit(1).cast("long"), i))
                    .otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, dim: int,
                 k: int = 10, num_planes: int = 12, probes: int = 1,
                 num_tables: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "query_id", seed: int = 42) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH buckets + exact rerank.

    Recall knobs, in order of effect:
    - num_tables: independent hash tables (corpus stored x T — the
      classic memory-for-recall trade; candidates are the union).
    - probes: per table, also search buckets at hamming distance 1
      from the query's bucket (flipping the lowest `probes-1` bits) —
      recall without re-hashing the corpus.

    The candidate join is a single equi-join on (table, bucket); at
    100 TB the corpus side is hashed once per table and never
    re-shuffled beyond that."""
    tables = [_random_planes(dim, num_planes, seed + 1000 * t)
              for t in range(num_tables)]

    def bucket_structs(vec: Column, probe: bool) -> Column:
        entries = []
        for t, planes in enumerate(tables):
            base = _bucket_expr(vec, planes)
            buckets = [base] if not probe else [base] + [
                base.bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))
                for i in range(max(0, probes - 1))]
            entries += [F.struct(F.lit(t).alias("table"), b.alias("bucket"))
                        for b in buckets]
        return F.array(*entries)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"),
        F.explode(bucket_structs(F.col(vec_col), probe=False)).alias("tb"),
    ).select("neighbor_id", "__cvec", "tb.table", "tb.bucket")
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec"),
        F.explode(bucket_structs(F.col(vec_col), probe=True)).alias("tb"),
    ).select("query_id", "__qvec", "tb.table", "tb.bucket"))
    cand = (c.join(q, ["table", "bucket"])
            .select("query_id", "neighbor_id",
                    cosine(F.col("__cvec"), F.col("__qvec")).alias("cos"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.first("cos").alias("cos")))  # dedup across tables/probes
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    return (cand.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk"))


def embedding_near_dup_pairs(df: DataFrame, dim: int,
                             threshold: float = 0.95,
                             num_planes: int = 14,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b): LSH-bucket the
    corpus against itself, exact-cosine verify within buckets. The
    corpus-vs-corpus analogue of lsh_ann_topk — candidate join is on
    the bucket key, never all-pairs."""
    planes = _random_planes(dim, num_planes, seed)
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                  _bucket_expr(F.col(vec_col), planes).alias("bucket"))
    lhs = b.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    rhs = b.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (lhs.join(rhs, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
            .distinct())


def exact_cosine_threshold_count(df: DataFrame, other: DataFrame,
                                 threshold: float,
                                 vec_col: str = "embedding") -> int:
    """Diagnostic exact count of pairs above threshold (small inputs
    only — used by tests to measure LSH recall)."""
    a = df.select(F.col(vec_col).alias("va"))
    bb = other.select(F.col(vec_col).alias("vb"))
    return (a.crossJoin(bb)
            .filter(cosine(F.col("va"), F.col("vb")) >= threshold)
            .count())
