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


def test_silhouette_separated_vs_overlapping(spark):
    import numpy as np

    rng = np.random.default_rng(9)

    def blobs(sep):
        pts = []
        for c in range(3):
            center = np.zeros(8)
            center[c] = sep
            # interleave ids so the lowest-id init spans all blobs
            for i in range(40):
                pts.append((c + 3 * i,
                            [float(v) for v in
                             center + rng.normal(0, 0.3, 8)]))
        return spark.createDataFrame(
            pts, "vec_id long, embedding array<float>")

    far = blobs(10.0).cache()
    near = blobs(0.8).cache()
    a_far, c_far = C.kmeans(far, "embedding", k=3, max_iter=10)
    a_near, c_near = C.kmeans(near, "embedding", k=3, max_iter=10)
    s_far = C.silhouette_simplified(a_far, "embedding", c_far).collect()
    s_near = C.silhouette_simplified(a_near, "embedding", c_near).collect()
    mf = sum(r.mean_silhouette * r.n for r in s_far) / 120
    mn = sum(r.mean_silhouette * r.n for r in s_near) / 120
    # well-separated blobs ≈ 1; overlapping far lower
    assert mf > 0.85
    assert mn < mf - 0.2
    for r in s_far + s_near:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert r.mean_dist_own >= 0.0


def test_silhouette_matches_numpy_reference(spark):
    import numpy as np

    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [10.0, 0.0]),
            (3, [11.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[0.5, 0.0], [10.5, 0.0]]
    assigned = C.assign_clusters(df, "embedding", cents)
    got = {r.cluster: r for r in
           C.silhouette_simplified(assigned, "embedding", cents).collect()}
    # every point: a = 0.5, b = 10 ± 0.5 → s = (b-a)/b
    exp0 = np.mean([(10.5 - 0.5) / 10.5, (9.5 - 0.5) / 9.5])
    assert abs(got[0].mean_silhouette - round(exp0, 6)) < 1e-9
    assert got[0].n == 2 and got[1].n == 2


def test_kmeans_invariant_across_repartitionings(spark):
    """r10 (VERDICT r9 #2): centroid floats are reduction-order-
    dependent at the ulp level, but the DECLARED outputs — cluster
    assignments and sizes — must not move with the physical
    partitioning of the input."""
    base = blobs(spark)
    ref = None
    for nparts in (1, 3, 8):
        assigned, cents = C.kmeans(base.repartition(nparts),
                                   "embedding", k=3, max_iter=15)
        got = sorted((r.vec_id, r.cluster) for r in assigned.collect())
        if ref is None:
            ref = got
        else:
            assert got == ref, f"assignments moved at nparts={nparts}"
