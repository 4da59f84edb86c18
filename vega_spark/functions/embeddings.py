"""Embedding-column analytics beyond similarity search: per-label
centroids and centroid-distance quality signals.

These feed the IVF index (functions/similarity.ivf_*) and the
standard "drop far-from-centroid outliers" curation pass. All
array math is expression-only (F.aggregate / F.transform /
posexplode) — JVM-side, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_centroids(df: DataFrame, vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Mean vector per label, tidy long output (label, idx, mean).

    Plan: posexplode each vector (narrow ×dim fan-out) then ONE
    partial-aggregated shuffle keyed (label, idx) — cardinality
    n_labels × dim regardless of row count; sums are exact integer
    adds of float64 in any order-independent way? No — float sums are
    order-dependent, so the oracle compares at fixed precision. At
    100 TB this is the only scalable shape: a collect_list-then-
    average would materialize whole groups."""
    e = df.select(F.col(label_col).alias("label"),
                  F.posexplode(
                      F.transform(F.col(vec_col),
                                  lambda x: x.cast("double")))
                  .alias("idx", "x"))
    return (e.groupBy("label", "idx")
            .agg(F.sum("x").alias("sum_x"),
                 F.count(F.lit(1)).alias("n"))
            .select("label", "idx",
                    (F.col("sum_x") / F.col("n")).alias("mean")))


def centroid_distance(df: DataFrame, centroids: DataFrame,
                      vec_col: str = "embedding",
                      label_col: str = "label",
                      id_col: str = "vec_id") -> DataFrame:
    """Euclidean distance of each vector to ITS label's centroid —
    the outlier score for curation (drop the far tail before
    training). Centroids arrive in the long form label_centroids
    emits; they are re-assembled to arrays and broadcast (n_labels ×
    dim doubles — tiny), so the scoring pass is narrow: no shuffle
    touches the big table."""
    cent = (centroids.groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("idx", "mean")))
                 .alias("__pairs"))
            .select("label",
                    F.transform("__pairs", lambda s: s["mean"])
                    .alias("__cent")))
    joined = df.select(id_col, F.col(label_col).alias("label"),
                       F.col(vec_col).alias("__v")) \
        .join(F.broadcast(cent), "label")
    dist2 = F.aggregate(
        F.zip_with(F.col("__v"),
                   F.col("__cent"),
                   lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    return joined.select(id_col, "label", F.sqrt(dist2).alias("dist"))
