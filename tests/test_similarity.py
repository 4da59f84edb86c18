"""Similarity search: brute-force correctness vs numpy, LSH-ANN
recall, embedding near-dup detection."""

from __future__ import annotations

import math
import random

import numpy as np
from pyspark.sql import functions as F

from vega_spark.functions import similarity as S


def vectors(spark, n=100, dim=16, seed=3):
    rnd = random.Random(seed)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_bruteforce_matches_numpy(spark):
    rows, df = vectors(spark)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = S.cosine_topk_bruteforce(df, queries, k=5).collect()

    mat = np.array([r[1] for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    for qid in (0, 1):
        cos = mat @ mat[qid] / (norms * norms[qid])
        expect = sorted(range(len(cos)), key=lambda i: (-cos[i], i))[:5]
        mine = [r.neighbor_id for r in sorted(
            (x for x in got if x.query_id == qid), key=lambda r: r.rk)]
        assert mine == expect


def test_lsh_ann_recall(spark):
    rows, df = vectors(spark, n=200)
    queries = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.neighbor_id) for r in
             S.cosine_topk_bruteforce(df, queries, k=3).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              S.lsh_ann_topk(df, queries, dim=16, k=3, num_planes=8,
                             probes=4, num_tables=6).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"ANN recall too low: {recall}"
    # self-match must always be found (hash collision with itself)
    assert all((q, q) in approx for q in range(10))


def test_embedding_near_dup_finds_planted(spark):
    rows, df = vectors(spark, n=50)
    # plant a near-exact duplicate of vector 0
    dup = [(1000, [v * 1.0001 for v in rows[0][1]])]
    df2 = df.union(spark.createDataFrame(dup, "vec_id long, embedding array<double>"))
    pairs = S.embedding_near_dup_pairs(df2, dim=16, threshold=0.99,
                                       num_planes=6)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1000) in got


def test_cosine_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a array<double>, b array<double>")
    got = [r.c for r in df.select(
        S.cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert math.isclose(got[0], 0.0, abs_tol=1e-12)
    assert math.isclose(got[1], 1.0, rel_tol=1e-12)


def test_ivf_ann_recall(spark):
    rows, df = vectors(spark, n=200)
    queries = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.neighbor_id) for r in
             S.cosine_topk_bruteforce(df, queries, k=3).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              S.ivf_ann_topk(df, queries, dim=16, k=3,
                             n_cells=8, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # a query always lands in (and probes) its own cell
    assert all((q, q) in approx for q in range(10))


def test_ivf_centroids_deterministic(spark):
    _, df = vectors(spark, n=100)
    a = S.train_ivf_centroids(df, dim=16, n_cells=4, iters=2)
    b = S.train_ivf_centroids(df, dim=16, n_cells=4, iters=2)
    assert a == b and len(a) == 4 and all(len(c) == 16 for c in a)


def test_l2_normalize_unit_norm_and_zero_guard(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, v array<double>")
    out = {r.vec_id: r.n for r in df.select(
        "vec_id", S.l2_normalize(F.col("v")).alias("n")).collect()}
    assert out[1] == [0.6, 0.8]
    assert out[2] == [0.0, 0.0]   # zero vector passes through


def test_quantize_int8_roundtrip(spark):
    vals = [0.5, -1.0, 0.25, 0.0]
    df = spark.createDataFrame([(1, vals)], "vec_id long, v array<double>")
    r = df.select(S.quantize_int8(F.col("v")).alias("s")).first().s
    assert r.scale == 1.0 / 127.0
    assert max(abs(q) for q in r.q) == 127
    # dequantization error bounded by scale/2
    for orig, q in zip(vals, r.q):
        assert abs(q * r.scale - orig) <= r.scale / 2 + 1e-12


def test_arrow_kernel_matches_jvm_kernel(spark, sf_dir):
    from pyspark.sql import functions as F

    from vega_spark.functions.similarity import (
        cosine_topk_arrow,
        cosine_topk_bruteforce,
    )
    from vega_spark.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    a = sorted(map(tuple, cosine_topk_arrow(emb, q, k=7).collect()))
    b = sorted(map(tuple, cosine_topk_bruteforce(emb, q, k=7).collect()))
    assert a == b


def test_pq_encode_shape_and_determinism(spark):
    rows, df = vectors(spark, n=120, dim=16)
    cbs = S.train_pq_codebooks(df, dim=16, m=4, nbits=4, iters=2,
                               n_train=120)
    assert len(cbs) == 4 and all(len(cb) <= 16 for cb in cbs)
    assert all(len(cw) == 4 for cb in cbs for cw in cb)
    enc = S.pq_encode(df, cbs)
    got = {r.vec_id: list(r.pq_code) for r in enc.collect()}
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c)
               for c in got.values())
    # re-train + re-encode reproduces codes exactly (no RNG anywhere)
    cbs2 = S.train_pq_codebooks(df, dim=16, m=4, nbits=4, iters=2,
                                n_train=120)
    assert cbs == cbs2
    got2 = {r.vec_id: list(r.pq_code)
            for r in S.pq_encode(df, cbs2).collect()}
    assert got == got2


def test_pq_adc_recall_with_rerank(spark):
    rows, df = vectors(spark, n=300, dim=16)
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    cbs = S.train_pq_codebooks(df, dim=16, m=4, nbits=5, iters=3,
                               n_train=300)
    enc = S.pq_encode(df, cbs)
    got = S.pq_adc_topk(enc, queries, cbs, k=10, refine=6)
    exact = S.cosine_topk_bruteforce(df, queries, k=10)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(g & e) / len(e)
    assert recall >= 0.7, recall
    # the reported cos of overlapping pairs is the EXACT cosine
    ge = {(r.query_id, r.neighbor_id): r.cos for r in got.collect()}
    ee = {(r.query_id, r.neighbor_id): r.cos for r in exact.collect()}
    for key in g & e:
        assert abs(ge[key] - ee[key]) < 1e-9


def test_ivfpq_recall_exact_cos_and_full_probe(spark):
    # r9: the FAISS IVFPQ composition. (1) probing EVERY cell with a
    # generous rerank pool must reach high recall (the residual codes
    # only shape the ADC candidate ranking; the exact rerank fixes
    # the rest); (2) reported cos of overlapping pairs is the EXACT
    # cosine; (3) full determinism across re-runs (hashed init, no
    # RNG anywhere in the pipeline).
    rows, df = vectors(spark, n=300, dim=16)
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = S.ivfpq_ann_topk(df, queries, dim=16, k=8, n_cells=8,
                           n_probe=8, m=4, nbits=5, iters_pq=3,
                           n_train=300, refine=15)
    exact = S.cosine_topk_bruteforce(df, queries, k=8)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(g & e) / len(e)
    assert recall >= 0.8, recall
    ge = {(r.query_id, r.neighbor_id): r.cos for r in got.collect()}
    ee = {(r.query_id, r.neighbor_id): r.cos for r in exact.collect()}
    for key in g & e:
        assert abs(ge[key] - ee[key]) < 1e-9
    got2 = {(r.query_id, r.neighbor_id, r.rk)
            for r in S.ivfpq_ann_topk(
                df, queries, dim=16, k=8, n_cells=8, n_probe=8, m=4,
                nbits=5, iters_pq=3, n_train=300, refine=15).collect()}
    assert got2 == {(r.query_id, r.neighbor_id, r.rk)
                    for r in got.collect()}


def test_truncation_recall_full_dim_is_perfect(spark, sf_dir):
    # truncating to the FULL dimension must reproduce the baseline
    # exactly (recall 1.0); shorter prefixes are monotonically <= 1
    from vega_spark.functions.similarity import truncation_recall
    from vega_spark.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    out = {r.dim: r.recall_at_k
           for r in truncation_recall(emb, dims=(16, 64), k=3,
                                      n_queries=5).collect()}
    assert out[64] == 1.0
    assert 0.0 <= out[16] <= 1.0


def test_sparse_cosine_pairs_identical_docs_top(spark):
    # two identical docs (shared rare terms) must be the top pair
    # with cosine 1.0; the df guard drops the ubiquitous term
    from vega_spark.functions.search import sparse_cosine_pairs
    rows = [(1, "zeta omega kappa"), (2, "zeta omega kappa"),
            (3, "unrelated words here"), (4, "more unrelated stuff")]
    # every doc shares 'common' -> df=4 > ceil(0.5*4)=2 -> dropped
    rows = [(i, t + " common") for i, t in rows]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sparse_cosine_pairs(df, "text", max_df_frac=0.5, top=3).collect()
    assert (got[0].d1, got[0].d2, got[0].cos) == (1, 2, 1.0)
    # no pair can exceed 1
    assert all(r.cos <= 1.0 for r in got)


def test_sparse_cosine_band_df_inactive_is_exact(spark):
    # r8 (VERDICT r7 #4): band_df must be a NO-OP whenever no
    # surviving term's df exceeds it — the registry ships band_df=512
    # against test-SF cuts <= 500, so bit-identical output there is
    # the contract
    from vega_spark.functions.search import sparse_cosine_pairs
    rows = [(i, f"alpha beta u{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = sparse_cosine_pairs(df, "text", max_df_frac=1.0,
                                top=50).collect()
    banded = sparse_cosine_pairs(df, "text", max_df_frac=1.0,
                                 band_df=100, top=50).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, banded))


def test_sparse_cosine_band_df_md5_subbucket_deterministic(spark):
    # Active band: a df>band_df term's postings are hash-partitioned
    # into ceil(df/band_df) sub-buckets via md5_32('t:doc') and pair
    # only within a sub-bucket — replay the assignment with hashlib
    # and pin the surviving pair set exactly (the oracle's
    # ('0x'||substr(md5(..),1,8))::BIGINT replays the same residue)
    import hashlib
    import math
    from itertools import combinations

    from vega_spark.functions.search import sparse_cosine_pairs
    rows = [(i, f"zz u{i}") for i in range(10)] \
        + [(i, f"yy u{i}") for i in (10, 11)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_sub = math.ceil(10 / 3)            # df=10, band_df=3 -> 4
    sub = {d: int(hashlib.md5(f"zz:{d}".encode())
                  .hexdigest()[:8], 16) % n_sub for d in range(10)}
    want = {(i, j) for i, j in combinations(range(10), 2)
            if sub[i] == sub[j]} | {(10, 11)}  # yy: df=2 <= 3, exact
    assert want != {tuple(p) for p in combinations(range(10), 2)} | \
        {(10, 11)}                      # the rule actually prunes
    got = {(r.d1, r.d2) for r in sparse_cosine_pairs(
        df, "text", max_df_frac=1.0, band_df=3, top=100).collect()}
    assert got == want


def test_sparse_cosine_term_guard_report(spark):
    # guard observability (r5 verdict #4): the report must account
    # for every distinct term as surviving XOR capped against the
    # effective cut min(ceil(frac*n), max_df), and a corpus whose
    # terms ALL exceed the cut must show surviving_terms=0 — the
    # visible explanation for a bounded-but-empty pair output.
    from vega_spark.functions.search import sparse_cosine_term_guard
    rows = [(1, "zeta omega kappa common"), (2, "zeta omega kappa common"),
            (3, "unrelated words here common"),
            (4, "more unrelated stuff common")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = sparse_cosine_term_guard(df, "text", max_df_frac=0.5,
                                 max_df=1000).first()
    assert r.n_docs == 4 and r.effective_cut == 2
    assert r.total_terms == r.surviving_terms + r.capped_terms
    assert r.capped_terms == 1  # only 'common' (df=4) exceeds the cut
    # every-term-capped corpus: 4 identical docs, cut = 1
    same = spark.createDataFrame([(i, "aaa bbb") for i in range(4)],
                                 "doc_id long, text string")
    r2 = sparse_cosine_term_guard(same, "text", max_df_frac=0.25,
                                  max_df=1000).first()
    assert r2.surviving_terms == 0 and r2.capped_terms == r2.total_terms


def test_jl_projection_preserves_distances(spark):
    import numpy as np

    from vega_spark.functions.similarity import jl_project, jl_sign_matrix

    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 64)).astype("float32")
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = jl_project(df, "embedding", in_dim=64, out_dim=16)
    got = {r.vec_id: np.array(r.proj) for r in out.collect()}
    # matches the literal matrix product (up to the 6dp rounding)
    R = np.array(jl_sign_matrix(64, 16))
    exp = (X.astype("float64") @ R.T) / 4.0
    for i in range(len(X)):
        assert np.allclose(got[i], exp[i], atol=1e-6)
    # JL property: squared distances preserved in expectation —
    # check the mean ratio over pairs is near 1 (loose, seeded)
    ratios = []
    for a in range(0, 30, 3):
        for b in range(1, 40, 7):
            if a == b:
                continue
            d0 = float(((X[a] - X[b]) ** 2).sum())
            d1 = float(((got[a] - got[b]) ** 2).sum())
            ratios.append(d1 / d0)
    m = float(np.mean(ratios))
    assert 0.6 < m < 1.4
    # deterministic across seeds only when the seed matches
    assert jl_sign_matrix(8, 2, "a") != jl_sign_matrix(8, 2, "b")
    assert jl_sign_matrix(8, 2, "a") == jl_sign_matrix(8, 2, "a")


def test_cosine_topk_exclude_self_and_raw_cos(spark):
    """ADVICE r3 (embedding_near_dup): with >= 3 identical vectors,
    a self-including window can evict a true neighbor; exclude_self
    must rank only real neighbors, and round_dp=None must return the
    raw cosine (no 6-dp coarsening before threshold filters)."""
    v = [1.0, 2.0, 3.0]
    other = [-3.0, 1.0, 0.5]
    df = spark.createDataFrame(
        [(0, v), (1, v), (2, v), (3, other)],
        "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding")

    got = {(r.neighbor_id, r.rk): r.cos
           for r in S.cosine_topk_bruteforce(
               df, q, k=2, exclude_self=True, round_dp=None).collect()}
    # self (id 0) excluded; both identical mates fill the top-2
    assert set(got) == {(1, 1), (2, 2)}
    assert all(abs(c - 1.0) < 1e-12 for c in got.values())


def test_buckets_udf_null_and_ragged_vectors(spark):
    # r4 ADVICE: null / wrong-length embeddings must degrade to a NULL
    # bucket array (row skipped by posexplode), not crash np.vstack in
    # the Arrow worker.
    rows, df = vectors(spark, n=30)
    bad = spark.createDataFrame(
        [(900, None), (901, [1.0, 2.0]), (902, [])],
        "vec_id long, embedding array<double>")
    mixed = df.union(bad)
    tables = [S._random_planes(16, 6, seed=7)]
    out = mixed.select(
        "vec_id", S._buckets_udf(tables)(F.col("embedding")).alias("b"))
    got = {r.vec_id: r.b for r in out.collect()}
    assert got[900] is None and got[901] is None and got[902] is None
    assert all(got[i] is not None and len(got[i]) == 1 for i in range(30))
    # end-to-end: lsh_ann_topk over the mixed corpus runs and never
    # reports a bad row as a neighbor
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    res = S.lsh_ann_topk(mixed, queries, dim=16, k=3, num_planes=6,
                         num_tables=2).collect()
    assert res and all(r.neighbor_id < 900 for r in res)


def test_buckets_udf_matches_sequential_fold(spark):
    # Pins the numpy-kernel vs Column-expression equivalence the old
    # form guaranteed by construction: bucket bits from the batched
    # matmul must equal the sign of a SEQUENTIAL left-fold dot product
    # (the F.aggregate evaluation order) on a seeded corpus. Sign
    # flips are possible only at |dot| ~ ulp; this test documents that
    # they do not occur on realistic gaussian data, so recall
    # contracts built on either path see identical buckets.
    rows, df = vectors(spark, n=200, dim=16, seed=11)
    tables = [S._random_planes(16, 8, seed=5), S._random_planes(16, 8, seed=6)]
    got = {r.vec_id: r.b for r in df.select(
        "vec_id", S._buckets_udf(tables)(F.col("embedding")).alias("b"))
        .collect()}
    for vid, vec in rows:
        expect = []
        for planes in tables:
            b = 0
            for i, plane in enumerate(planes):
                acc = 0.0
                for x, p in zip(vec, plane):   # left fold, expression order
                    acc = acc + x * p
                if acc > 0:
                    b |= 1 << i
            expect.append(b)
        assert got[vid] == expect, f"bucket mismatch for vec {vid}"


def test_embedding_near_dup_hot_bucket_cap(spark):
    # 40 identical vectors: one bucket holds all 40 ids. With
    # max_bucket=5 only pairs among the first 5 ids survive; the
    # library default is exhaustive (max_bucket=None — r5 ADVICE: no
    # silent truncation in library calls; the registry entry points
    # opt into 1000; same guard semantics as simhash_near_pairs).
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = S.embedding_near_dup_pairs(df, dim=4, threshold=0.99,
                                        num_planes=4, max_bucket=5)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(a, b) for a in range(5) for b in range(a + 1, 5)}
    full = S.embedding_near_dup_pairs(df, dim=4, threshold=0.99,
                                      num_planes=4, max_bucket=None)
    dflt = S.embedding_near_dup_pairs(df, dim=4, threshold=0.99,
                                      num_planes=4)
    assert full.count() == 40 * 39 // 2 == dflt.count()


def test_embedding_near_dup_adaptive_planes(spark):
    # num_planes=None auto-sizes from a count: identical vectors all
    # land in one bucket whatever the plane count, so every pair
    # survives; the knob pick (ceil(log2(n/32)) clamped to [4, 24])
    # must still yield the full pair set on a bounded corpus.
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    auto = S.embedding_near_dup_pairs(df, dim=4, threshold=0.99)
    assert auto.count() == 40 * 39 // 2
