"""Ranked retrieval (BM25 / RRF / metrics) and sequential-pattern
units: hand-computed scores on tiny corpora, partitioning
invariance, and plan shape (TakeOrderedAndProject head for the
single-query path)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vega_spark.functions.retrieval import (
    bm25_search,
    bm25_search_batch,
    rarest_query_terms,
    retrieval_metrics,
    rrf_fuse,
)
from vega_spark.functions.seqmine import sequential_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_bm25_micro(tf, dl, n_docs, total_len, df,
                         k1=1.2, b=0.75):
    idf_q = round(math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                  * 1_000_000)
    ratio = (float(dl) * float(n_docs)) / float(total_len)
    s = (float(idf_q) * (float(tf) * (k1 + 1.0))) \
        / (float(tf) + k1 * ((1.0 - b) + b * ratio))
    return int(round(s))


def test_bm25_single_query_hand_score(spark):
    # corpus: "cat" appears in docs 0 (tf=2, dl=3) and 1 (tf=1, dl=4)
    docs = _docs(spark, [
        (0, "cat cat dog"),
        (1, "cat fish fish fish"),
        (2, "dog dog bird"),
    ])
    out = bm25_search(docs, ["cat"], top=10).collect()
    # only the two docs containing 'cat' are candidates
    assert [r["doc_id"] for r in out] == [0, 1]
    total_len = 3 + 4 + 3
    exp0 = _expected_bm25_micro(tf=2, dl=3, n_docs=3,
                                total_len=total_len, df=2)
    exp1 = _expected_bm25_micro(tf=1, dl=4, n_docs=3,
                                total_len=total_len, df=2)
    got = {r["doc_id"]: r["score_micro"] for r in out}
    assert got == {0: exp0, 1: exp1}
    assert [r["rk"] for r in out] == [1, 2]


def test_bm25_multi_term_sums_and_ties(spark):
    docs = _docs(spark, [
        (0, "a b"),
        (1, "a b"),
        (2, "c c"),
    ])
    out = bm25_search(docs, ["a", "b"], top=2).collect()
    # identical docs: identical scores, tie broken by doc_id
    assert [r["doc_id"] for r in out] == [0, 1]
    assert out[0]["score_micro"] == out[1]["score_micro"]


def test_bm25_single_head_is_take_ordered(spark):
    docs = _docs(spark, [(i, f"term{i % 3} filler") for i in range(20)])
    scored = bm25_search(docs, ["term0"], top=5)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_batch_partition_invariance(spark):
    docs = _docs(spark, [
        (i, " ".join(f"w{(i + j) % 7}" for j in range(1 + i % 5)))
        for i in range(30)
    ])
    qt = spark.createDataFrame(
        [(0, "w0"), (0, "w1"), (1, "w2"), (1, "w3")],
        "query_id long, term string")
    a = bm25_search_batch(docs, qt, top=5).collect()
    b = bm25_search_batch(docs.repartition(7), qt, top=5).collect()
    key = lambda r: (r["query_id"], r["rk"])  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_rarest_terms_picks_lowest_df(spark):
    docs = _docs(spark, [
        (0, "rare common common2"),
        (1, "common common2"),
        (2, "common common2"),
        (3, "common"),
    ])
    qt = rarest_query_terms(docs, docs.filter(F.col("doc_id") == 0),
                            n_terms=2, query_id_col="doc_id").collect()
    # df: rare=1, common2=3, common=4 → the two rarest for doc 0
    assert sorted(r["term"] for r in qt) == ["common2", "rare"]


def test_rrf_fuse_hand_values(spark):
    lex = spark.createDataFrame([(0, 10, 1), (0, 11, 2)],
                                "query_id long, doc_id long, rk int")
    vec = spark.createDataFrame([(0, 11, 1), (0, 12, 2)],
                                "query_id long, doc_id long, rk int")
    out = {r["doc_id"]: (r["rrf_nano"], r["rk"])
           for r in rrf_fuse([lex, vec], k0=60, top=10).collect()}
    c1 = round(1e9 / 61.0)
    c2 = round(1e9 / 62.0)
    # doc 11 in both lists wins; 10 and 12 tie on score → id order
    assert out[11] == (c2 + c1, 1)
    assert out[10] == (c1, 2)
    assert out[12] == (c2, 3)


def test_retrieval_metrics_perfect_system(spark):
    rows = [(0, d, r) for r, d in enumerate([5, 7, 9], start=1)]
    truth = spark.createDataFrame(rows, "query_id long, doc_id long, rk int")
    out = retrieval_metrics(truth, truth, k=3).collect()[0]
    assert out["n_hits"] == 3
    assert out["rr_ppm"] == 1_000_000
    assert out["ndcg_ppm"] == 1_000_000
    assert out["dcg_micro"] == out["idcg_micro"]


def test_retrieval_metrics_miss_and_shift(spark):
    truth = spark.createDataFrame([(0, 5, 1), (0, 7, 2)],
                                  "query_id long, doc_id long, rk int")
    system = spark.createDataFrame([(0, 8, 1), (0, 5, 2)],
                                   "query_id long, doc_id long, rk int")
    out = retrieval_metrics(truth, system, k=2).collect()[0]
    # only doc 5 overlaps, found at system rank 2
    assert out["n_hits"] == 1
    assert out["rr_ppm"] == 500_000
    dcg = round((2 + 1 - 1) * 1e6 / math.log2(2 + 1.0))
    idcg = (round(2 * 1e6 / math.log2(2.0))
            + round(1 * 1e6 / math.log2(3.0)))
    assert out["dcg_micro"] == dcg
    assert out["idcg_micro"] == idcg
    assert out["ndcg_ppm"] == round(dcg * 1e6 / idcg)


def test_sequential_pairs_gap_and_truncation(spark):
    ev = spark.createDataFrame(
        [  # user 1: a .. b .. c   user 2: a c   user 3: b a
            (1, 1, 10, "a"), (2, 1, 20, "x"), (3, 1, 30, "b"),
            (4, 1, 40, "c"),
            (5, 2, 10, "a"), (6, 2, 20, "c"),
            (7, 3, 10, "b"), (8, 3, 20, "a"),
        ],
        "event_id long, user_id long, ts long, event_type string")
    out = {(r["a"], r["b"]): (r["support"], r["prefix_support"],
                              r["conf_ppm"])
           for r in sequential_pairs(ev, max_len=30,
                                     min_support=1).collect()}
    # gapped: a→c holds for users 1 and 2; order-aware: b→a only u3
    assert out[("a", "c")] == (2, 3, round(2e6 / 3))
    assert out[("a", "b")] == (1, 3, round(1e6 / 3))
    assert out[("b", "a")] == (1, 2, 500_000)
    assert ("c", "a") not in out
    # truncation to the first event removes every pair
    assert sequential_pairs(ev, max_len=1, min_support=1).count() == 0


def test_sequential_pairs_user_counted_once(spark):
    # repeated a..b within one user still counts support 1
    ev = spark.createDataFrame(
        [(1, 1, 10, "a"), (2, 1, 20, "b"),
         (3, 1, 30, "a"), (4, 1, 40, "b")],
        "event_id long, user_id long, ts long, event_type string")
    out = {(r["a"], r["b"]): r["support"]
           for r in sequential_pairs(ev, min_support=1).collect()}
    assert out[("a", "b")] == 1
    assert out[("b", "a")] == 1  # a@30 after b@20


def test_maxsim_matches_python_reference(spark):
    import hashlib

    from vega_spark.functions.retrieval import maxsim_search

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta beta"), (3, "zeta")],
        "doc_id long, text string")
    qterms = ["beta", "omega"]

    def vec(t):
        return [(int(hashlib.md5(f"{t}|{j}".encode()).hexdigest()[:4],
                     16) % 17) - 8 for j in range(4)]

    def score(toks):
        s = 0
        for q in qterms:
            qv = vec(q)
            s += max(sum(a * b for a, b in zip(vec(t), qv))
                     for t in set(toks))
        return s

    want = {1: score("alpha beta gamma".split()),
            2: score("delta beta".split()),
            3: score("zeta".split())}
    got = {r.doc_id: r.score
           for r in maxsim_search(docs, qterms, dim=4, top=10).collect()}
    assert got == want


def test_maxsim_ranks_covering_doc_first(spark):
    from vega_spark.functions.retrieval import maxsim_search
    # doc 1 contains BOTH query terms verbatim -> each term's max dot
    # is its self-similarity (the vector norm, maximal), so doc 1
    # must outrank docs containing only one term
    docs = spark.createDataFrame(
        [(1, "foo bar"), (2, "foo baz qux"), (3, "nothing here")],
        "doc_id long, text string")
    rows = maxsim_search(docs, ["foo", "bar"], top=3).collect()
    assert rows[0].doc_id == 1 and rows[0].rk == 1


def test_mmr_prefers_diverse_over_redundant(spark):
    from vega_spark.functions.retrieval import mmr_rerank
    # docs 1 and 2 are near-identical high-rel hits; doc 3 is a
    # lower-rel but DIFFERENT hit. With k=2 MMR must pick 1 then 3,
    # skipping the redundant 2 (plain BM25 order would be 1, 2).
    docs = spark.createDataFrame(
        [(1, "query query query alpha beta gamma"),
         (2, "query query query alpha beta delta"),
         (3, "query epsilon zeta eta theta iota kappa")],
        "doc_id long, text string")
    rows = sorted(mmr_rerank(docs, ["query"], top_n=3, k=2).collect())
    picked = [r.doc_id for r in sorted(rows, key=lambda r: r.rk)]
    assert picked[0] in (1, 2)      # highest-rel first
    assert picked[1] == 3           # then the diverse doc


def test_mmr_first_pick_is_top_rel(spark):
    from vega_spark.functions.retrieval import mmr_rerank
    docs = spark.createDataFrame(
        [(i, "term " * (10 - i) + "filler" + str(i)) for i in range(1, 5)],
        "doc_id long, text string")
    rows = {r.rk: r.doc_id for r in mmr_rerank(docs, ["term"],
                                               top_n=4, k=3).collect()}
    assert rows[1] == 1  # most 'term'-dense doc wins step 1
