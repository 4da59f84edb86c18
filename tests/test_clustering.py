"""k-means (functions/clustering.py): narrow assignment, tiny update
shuffle, driver-iterated centroids."""

from __future__ import annotations

from pyspark.sql import functions as F

from vega_spark.functions import clustering as C


def blobs(spark):
    """3 well-separated 4-d blobs, 30 points each, ids interleaved so
    lowest-id init picks points from different blobs eventually."""
    pts = []
    centers = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 0.0, 0.0],
               [0.0, 0.0, 10.0, 10.0]]
    i = 0
    for j in range(30):
        for b, c in enumerate(centers):
            jit = ((j * 7 + b * 3) % 10) / 20.0   # deterministic jitter
            pts.append((i, [x + jit for x in c], b))
            i += 1
    return spark.createDataFrame(
        pts, "vec_id long, embedding array<double>, true_blob int")


def test_kmeans_recovers_separated_blobs(spark):
    df = blobs(spark).repartition(4).cache()
    assigned, cents = C.kmeans(df, "embedding", k=3, max_iter=15)
    # every true blob maps to exactly one k-means cluster
    m = (assigned.groupBy("true_blob")
         .agg(F.count_distinct("cluster").alias("k"),
              F.count(F.lit(1)).alias("n")).collect())
    assert all(r.k == 1 and r.n == 30 for r in m)
    # and the mapping is a bijection (3 distinct clusters used)
    assert assigned.select("cluster").distinct().count() == 3
    df.unpersist()


def test_assign_clusters_is_narrow(spark, sf_dir):
    # the assignment stage must not shuffle or join — pure expressions
    from vega_spark.plans import inspect as I
    df = blobs(spark)
    q = C.assign_clusters(df, "embedding",
                          [[0.0] * 4, [10.0, 10.0, 0.0, 0.0]])
    txt = I.plan_text(q)
    assert "Exchange" not in txt, txt
    assert "Join" not in txt, txt


def test_kmeans_deterministic(spark):
    df = blobs(spark).cache()
    _, c1 = C.kmeans(df, "embedding", k=3, max_iter=5)
    _, c2 = C.kmeans(df, "embedding", k=3, max_iter=5)
    assert c1 == c2               # lowest-id init, no RNG anywhere
    df.unpersist()


def test_empty_cluster_keeps_centroid(spark):
    # k=3 but only 2 distinct points: one cluster never gets members;
    # its centroid must survive (no NaN / index error)
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [9.0, 9.0])],
        "vec_id long, embedding array<double>")
    assigned, cents = C.kmeans(df, "embedding", k=3, max_iter=3)
    assert len(cents) == 3
    assert assigned.count() == 3
