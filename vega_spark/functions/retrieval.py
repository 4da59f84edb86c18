"""Ranked retrieval: BM25 over an inverted index, hybrid
lexical+vector result fusion (Reciprocal Rank Fusion), and
retrieval-quality metrics (recall@k / MRR / nDCG@k) — the query-side
counterpart of the corpus ops in `functions.search` (postings) and
`functions.similarity` (ANN). Together they are the standard modern
retrieval stack: BM25 candidates + embedding candidates → RRF fuse →
evaluate against an exact-truth ranking.

Reference scope: rajasekarv/vega has no retrieval layer — its text
surface is the word-count/flat_map family (reference
examples/file_read.rs:13-29, src/rdd/rdd.rs:400-520); this module is
part of the north-star training-pipeline tier (BASELINE.json), built
purely from the public BM25 (Robertson/Sparck Jones; the Lucene
`(k1+1)` variant) and RRF (Cormack et al., SIGIR'09) formulas.

Determinism contract (cross-engine oracle-replayable floats):
- idf is integerized once per term — ``round(ln(...) * 1e6)`` — so
  libm `ln` ulp differences between engines vanish at the round.
- every remaining per-item score is produced by ONE fixed-shape
  IEEE-double expression over INTEGER sufficient statistics
  (tf, df, dl, N, L, rank), then integerized to micro units;
  aggregation happens on exact int64 micros, never on raw doubles,
  so the result is independent of partitioning and addition order.

Scale shape:
- BM25: postings join on the (few) query terms only — partition
  pruning if the index is stored partitioned/bucketed by term; the
  per-query candidate aggregate is one keyed shuffle; the head is
  TakeOrderedAndProject (single query) or a per-query-partitioned
  window (batched queries). Document-frequency banding (`max_df`,
  same guard as search.sparse_cosine_pairs) keeps stop terms from
  re-materializing the corpus per query.
- RRF: unions bounded (≤ top-k per system) ranking lists, one keyed
  sum, one per-query-partitioned bounded window. Never touches the
  corpus.
- metrics: joins of two ≤k-per-query lists; everything downstream of
  the rankings is O(queries × k).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vega_spark.functions.search import build_inverted_index
from vega_spark.functions.text import tokens

IDF_SCALE = 1_000_000  # idf integerization (micro units)
RRF_SCALE = 1_000_000_000  # 1/(k0+rank) integerization (nano units)


def _bm25_term_score_micro(tf: Column, dl: Column, idf_q: Column,
                           n_docs: Column, total_len: Column,
                           k1: float, b: float) -> Column:
    """One BM25 term contribution in exact micro units (BIGINT).

    The double expression has a FIXED shape mirrored verbatim by the
    SQL oracles: ratio = (dl·N)/L; s = (idf_q · (tf·(k1+1))) /
    (tf + k1·((1-b) + b·ratio)); round(s) — idf_q already carries the
    1e6 scale, so rounding to an integer lands in micro units."""
    ratio = (dl.cast("double") * n_docs.cast("double")) \
        / total_len.cast("double")
    num = tf.cast("double") * F.lit(k1 + 1.0)
    den = tf.cast("double") + F.lit(k1) * (F.lit(1.0 - b)
                                           + F.lit(b) * ratio)
    return F.round((idf_q.cast("double") * num) / den, 0).cast("long")


def bm25_stats(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               max_df: int | None = None) -> tuple[DataFrame, DataFrame]:
    """(postings, doclen) sufficient statistics for BM25.

    postings: (term, doc_id, tf, df_, idf_q, n_docs, total_len) —
    df/idf and the corpus scalars are joined onto the postings once
    at build time (broadcast: the df table is |vocab|-sized, the
    scalars 1-row), so query time touches nothing but the queried
    terms' postings. idf_q = round(ln((N-df+0.5)/(df+0.5)+1)·1e6)
    (the Lucene-variant BM25+1 idf, always ≥ 0)."""
    post = build_inverted_index(docs, text_col=text_col, id_col=id_col,
                                max_df=max_df)
    dl = (docs.select(F.col(id_col).alias("doc_id"),
                      F.size(tokens(F.col(text_col))).alias("dl")))
    scalars = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("dl").alias("total_len"))
    dfreq = (post.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))
             .crossJoin(F.broadcast(scalars))
             .withColumn(
                 "idf_q",
                 F.round(F.log(
                     (F.col("n_docs").cast("double") - F.col("df_")
                      + F.lit(0.5)) / (F.col("df_") + F.lit(0.5))
                     + F.lit(1.0)) * F.lit(float(IDF_SCALE)), 0)
                 .cast("long")))
    return (post.join(F.broadcast(dfreq), "term")
            .join(F.broadcast(dl), "doc_id")), dl


def bm25_search(docs: DataFrame, terms: Sequence[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75,
                top: int = 10,
                max_df: int | None = None) -> DataFrame:
    """Single-query BM25 top-k: (doc_id, score_micro, rk).

    Plan: postings filtered to the query terms (pruned scan), one
    groupBy(doc) exact micro-sum, TakeOrderedAndProject head, then a
    WINDOW-FREE rank over the ≤`top`-row head: the global limit lands
    in one partition, so after an in-partition sort
    monotonically_increasing_id IS the 0-based position (same bounded
    pattern as text.build_vocab — no global WindowExec anywhere)."""
    want = sorted({t.lower() for t in terms})
    post, _ = bm25_stats(docs, text_col=text_col, id_col=id_col,
                         max_df=max_df)
    hits = post.filter(F.col("term").isin(want))
    scored = (hits.select(
        "doc_id",
        _bm25_term_score_micro(F.col("tf"), F.col("dl"), F.col("idf_q"),
                               F.col("n_docs"), F.col("total_len"),
                               k1, b).alias("s_micro"))
        .groupBy("doc_id")
        .agg(F.sum("s_micro").alias("score_micro")))
    head = scored.orderBy(F.col("score_micro").desc(),
                          F.col("doc_id").asc()).limit(top)
    return (head.coalesce(1)
            .sortWithinPartitions(F.col("score_micro").desc(),
                                  F.col("doc_id").asc())
            .withColumn("rk", (F.monotonically_increasing_id() + 1)
                        .cast("int")))


def rarest_query_terms(docs: DataFrame, query_docs: DataFrame,
                       n_terms: int = 4,
                       text_col: str = "text", id_col: str = "doc_id",
                       query_id_col: str = "query_id") -> DataFrame:
    """Per query doc, its ``n_terms`` lowest-document-frequency terms
    (tie: term asc) — the standard cheap keyword extractor for
    doc-as-query retrieval. Output (query_id, term).

    The df table is corpus-vocab-sized (broadcast); the rank window
    is partitioned per query and bounded by the query doc's distinct
    term count."""
    post = (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(tokens(F.col(text_col))).alias("term"))
            .groupBy("term").agg(F.count_distinct("doc_id").alias("df_")))
    qterms = (query_docs.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term")))
    w = Window.partitionBy("query_id").orderBy(F.col("df_").asc(),
                                               F.col("term").asc())
    return (qterms.join(F.broadcast(post), "term")
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n_terms)
            .select("query_id", "term"))


def bm25_search_batch(docs: DataFrame, query_terms: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      k1: float = 1.2, b: float = 0.75,
                      top: int = 10,
                      max_df: int | None = None) -> DataFrame:
    """Batched BM25: ``query_terms`` is (query_id, term); returns
    (query_id, doc_id, score_micro, rk ≤ top) per query.

    One postings⋈query-terms equi-join on term (query side is small —
    broadcast), one (query, doc) exact micro-sum, one per-query
    bounded rank window. Per-query cost is the queried terms'
    posting length — banding (`max_df`) is the stop-term guard."""
    post, _ = bm25_stats(docs, text_col=text_col, id_col=id_col,
                         max_df=max_df)
    hits = post.join(F.broadcast(query_terms.select("query_id", "term")),
                     "term")
    scored = (hits.select(
        "query_id", "doc_id",
        _bm25_term_score_micro(F.col("tf"), F.col("dl"), F.col("idf_q"),
                               F.col("n_docs"), F.col("total_len"),
                               k1, b).alias("s_micro"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s_micro").alias("score_micro")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top))


def rrf_fuse(rankings: Sequence[DataFrame], k0: int = 60,
             top: int = 10,
             query_id_col: str = "query_id",
             doc_id_col: str = "doc_id",
             rank_col: str = "rk") -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al.): fused(d) =
    Σ_systems round(1e9 / (k0 + rank_s(d))) — integerized per
    contribution so the sum is exact and order-free. Returns
    (query_id, doc_id, rrf_nano, rk ≤ top).

    Inputs are bounded per-query ranking lists; the union + keyed sum
    + per-query bounded window never touch the corpus."""
    parts = []
    for r in rankings:
        parts.append(r.select(
            F.col(query_id_col).alias("query_id"),
            F.col(doc_id_col).alias("doc_id"),
            F.round(F.lit(float(RRF_SCALE))
                    / (F.lit(k0).cast("double")
                       + F.col(rank_col).cast("double")), 0)
            .cast("long").alias("c")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("rrf_nano"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_nano").desc(), F.col("doc_id").asc())
    return (fused.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top))


def retrieval_metrics(truth: DataFrame, system: DataFrame,
                      k: int = 10) -> DataFrame:
    """Per-query recall@k / MRR / nDCG@k of ``system`` against
    ``truth`` (both (query_id, doc_id/neighbor_id…, rk ≤ k) lists;
    column names must be query_id, doc_id, rk).

    Graded relevance of a doc = (k+1 − truth_rank) (integer gains);
    per-item discounted gain is integerized to micros —
    round(gain·1e6 / log2(rank+1)) — so DCG/IDCG sums are exact
    int64 and the output is all-integer:
    (query_id, n_hits, rr_ppm, dcg_micro, idcg_micro, ndcg_ppm).

    rr_ppm = round(1e6 / system-rank of the truth top-1 doc) (0 when
    missed). Everything is O(queries × k): one equi-join of two
    bounded lists + one keyed aggregate."""
    t = truth.select("query_id", "doc_id",
                     F.col("rk").alias("trk")).filter(F.col("trk") <= k)
    s = system.select("query_id", "doc_id",
                      F.col("rk").alias("srk")).filter(F.col("srk") <= k)
    gain = (F.lit(k + 1) - F.col("trk")).cast("double")
    disc_sys = F.round(gain * F.lit(1e6)
                       / F.log2(F.col("srk").cast("double") + F.lit(1.0)),
                       0).cast("long")
    disc_ideal = F.round(gain * F.lit(1e6)
                         / F.log2(F.col("trk").cast("double") + F.lit(1.0)),
                         0).cast("long")
    ideal = t.groupBy("query_id").agg(
        F.sum(disc_ideal).alias("idcg_micro"))
    hits = (t.join(s, ["query_id", "doc_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"),
                 F.sum(disc_sys).alias("dcg_micro"),
                 F.max(F.when(F.col("trk") == 1,
                              F.round(F.lit(1e6)
                                      / F.col("srk").cast("double"), 0)
                              .cast("long"))).alias("rr_raw")))
    return (ideal.join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.coalesce("rr_raw", F.lit(0)).alias("rr_ppm"),
                    F.coalesce("dcg_micro", F.lit(0)).alias("dcg_micro"),
                    "idcg_micro",
                    F.round(F.coalesce("dcg_micro", F.lit(0))
                            .cast("double") * F.lit(1e6)
                            / F.col("idcg_micro").cast("double"), 0)
                    .cast("long").alias("ndcg_ppm")))


def _tokvec_component(tok: Column, j: int) -> Column:
    """Deterministic j-th embedding component of a token: md5-derived
    int in [-8, 8] — the hash-random projection both engines can
    replay exactly (the stand-in for a learned token encoder; swap in
    a model's token embeddings and the plan below is unchanged)."""
    h = F.conv(F.substring(
        F.md5(F.concat(tok, F.lit(f"|{j}"))), 1, 4), 16, 10)
    return (h.cast("long") % 17) - 8


def maxsim_search(docs: DataFrame, query_terms: Sequence[str],
                  dim: int = 4, top: int = 10,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Late-interaction retrieval (ColBERT MaxSim, Khattab & Zaharia
    SIGIR'20 — public formula): score(q, d) = Σ_{t∈q} max_{t'∈d}
    <vec(t), vec(t')>, computed over token-level embeddings instead
    of one pooled vector, so multi-aspect queries match documents
    that cover each aspect with DIFFERENT passages.

    Token embeddings here are deterministic md5-derived integer
    vectors (exact int64 dot products — engine-replayable); a real
    deployment substitutes model embeddings and keeps the plan.

    Scale shape: the corpus side explodes to DISTINCT (doc, token)
    rows — linear in corpus vocabulary-per-doc, narrow. The query
    side is |q| CONSTANT vectors folded into per-token dot
    expressions at plan-build time (no join, no broadcast — the
    query embeddings are literals in codegen). One keyed aggregate
    per doc (max per query term + sum — a single groupBy), then a
    TakeOrderedAndProject head. No all-pairs stage anywhere."""
    import hashlib as _hl

    from vega_spark.functions.text import tokens

    def qvec(term: str) -> list[int]:
        out = []
        for j in range(dim):
            h = int(_hl.md5(f"{term}|{j}".encode()).hexdigest()[:4], 16)
            out.append((h % 17) - 8)
        return out

    dt = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(F.array_distinct(
                          tokens(text_col))).alias("t")))
    comps = [ _tokvec_component(F.col("t"), j) for j in range(dim) ]
    dots = []
    for qi, term in enumerate(query_terms):
        qv = qvec(term)
        dots.append(sum((comps[j] * qv[j] for j in range(dim)),
                        F.lit(0).cast("long")).alias(f"__dot{qi}"))
    scored = dt.select("doc_id", *dots)
    agg = scored.groupBy("doc_id").agg(
        sum((F.max(f"__dot{qi}") for qi in range(len(query_terms))),
            F.lit(0).cast("long")).alias("score"))
    head = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(top)
    # window-free post-limit rank (bm25_search pattern): the global
    # limit lands in one partition, so after an in-partition sort
    # monotonically_increasing_id IS the 0-based position — no
    # unpartitioned WindowExec anywhere
    return (head.coalesce(1)
            .sortWithinPartitions(F.desc("score"), F.asc("doc_id"))
            .withColumn("rk", (F.monotonically_increasing_id() + 1)
                        .cast("int")))


def mmr_rerank(docs: DataFrame, terms: Sequence[str],
               top_n: int = 20, k: int = 5,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98, λ=1/2 scaled out): greedily pick ``k`` results from the
    BM25 top-``top_n`` maximizing  rel(d) − max_{s∈S} sim(d, s),
    so near-duplicate hits don't crowd the head. rel is the exact
    BM25 micro score; sim is token-overlap Jaccard in micro units
    via ONE fixed-shape floor(1e6·|∩|/|∪|) per pair — every quantity
    an integer both engines replay.

    Scale shape: candidate generation is the bounded BM25 head; the
    pairwise sim matrix is computed DISTRIBUTED via a token equi-join
    restricted to the ≤ top_n candidates (≤ top_n² bounded pairs,
    never corpus-wide); the greedy selection itself touches only
    (top_n rel rows + top_n² sim rows) in a single cogrouped-pandas
    task — bounded by construction, like a TakeOrdered head."""
    import pandas as pd

    head = bm25_search(docs, terms, text_col=text_col, id_col=id_col,
                       top=top_n).select("doc_id",
                                         F.col("score_micro").alias("rel"))
    # materialize the ≤ top_n-row head ONCE (a driver-side head like
    # take_ordered): it feeds three plan branches (size, inter, and
    # the cogroup), and leaving it lazy would recompute the whole
    # BM25 pipeline per branch (measured 4x the runtime)
    spark = docs.sparkSession
    cand = spark.createDataFrame(head.collect(), "doc_id long, rel long")
    toks = F.array_distinct(F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""))
    tok = docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(toks).alias("t"))
    ctok = tok.join(F.broadcast(cand.select("doc_id")), "doc_id")
    sz = ctok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (ctok.select(F.col("doc_id").alias("da"), "t")
             .join(ctok.select(F.col("doc_id").alias("db"), "t"), "t")
             .filter(F.col("da") != F.col("db"))
             .groupBy("da", "db").agg(F.count(F.lit(1)).alias("i")))
    sim = (inter
           .join(sz.select(F.col("doc_id").alias("da"),
                           F.col("n").alias("na")), "da")
           .join(sz.select(F.col("doc_id").alias("db"),
                           F.col("n").alias("nb")), "db")
           .select("da", "db",
                   F.floor(F.lit(1000000.0) * F.col("i")
                           / (F.col("na") + F.col("nb") - F.col("i")))
                   .cast("long").alias("s")))

    kk = k

    def greedy(cand_pdf: pd.DataFrame, sim_pdf: pd.DataFrame) -> pd.DataFrame:
        rel = dict(zip(cand_pdf["doc_id"], cand_pdf["rel"]))
        smap = {(int(da), int(db)): int(s)
                for da, db, s in zip(sim_pdf.get("da", []),
                                     sim_pdf.get("db", []),
                                     sim_pdf.get("s", []))}
        selected: list[int] = []
        rows = []
        for step in range(1, min(kk, len(rel)) + 1):
            best = None
            for d in sorted(rel):
                if d in selected:
                    continue
                pen = max((smap.get((d, s2), 0) for s2 in selected),
                          default=0)
                mmr = int(rel[d]) - pen
                key = (-mmr, d)
                if best is None or key < best[0]:
                    best = (key, d)
            selected.append(best[1])
            rows.append((step, best[1], int(rel[best[1]])))
        return pd.DataFrame(rows, columns=["rk", "doc_id", "rel"])

    return (cand.withColumn("__g", F.lit(1)).groupBy("__g")
            .cogroup(sim.withColumn("__g", F.lit(1)).groupBy("__g"))
            .applyInPandas(greedy, "rk int, doc_id long, rel long"))
