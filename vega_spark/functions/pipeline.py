"""End-to-end training-data pipeline: the composition the north-star
extensions exist for — quality-score, filter, dedup, language/token
stats over a documents table.

Pipeline shape at 100 TB:
1. feature pass — pure Column expressions (functions/text.py), narrow,
   fused into the scan by whole-stage codegen; zero shuffles.
2. quality gate — plain filter, pushed as far down as the expressions
   allow; drops rows before anything shuffles.
3. exact dedup — the ONE shuffle, and it carries only
   (sha256 digest, doc_id, the kept columns); content never shuffles
   twice. Near-dup stages (MinHash/SimHash, functions/dedup.py) chain
   after this the same way: each adds exactly one keyed shuffle.
4. per-language accounting — partial+final aggregate.

Every stage is a DataFrame -> DataFrame function, so the pipeline
composes with the streaming layer (the feature pass and quality gate
run unchanged on a readStream frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vega_spark.functions import text as T
from vega_spark.functions.dedup import content_digest


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_quality: float = 0.7) -> DataFrame:
    """Quality-filtered, exactly-deduped corpus with text features.
    Keeps the lowest-id representative per distinct content.

    Scale shape: the text is tokenized ONCE into a shared array
    column and every feature derives from it (the naive composition
    re-splits the text ~8x — an 8x decode cost AND a far larger
    codegen unit). The 256-bit digest is computed in the same narrow
    pass, and the dedup shuffle carries ONLY (digest, id, 3 feature
    columns) — document content never enters an exchange."""
    toks = T.tokens(text_col)
    staged = docs.select(
        F.col(id_col),
        content_digest(text_col).alias("__digest"),
        T.punct_ratio(text_col).alias("__punct"),
        toks.alias("__toks"),
        F.array_distinct(toks).alias("__toks_d"))
    feats = staged.select(
        F.col(id_col), F.col("__digest"),
        F.size("__toks").alias("n_tokens"),
        T.language_id_from_tokens(F.col("__toks_d")).alias("lang_pred"),
        F.round(T.quality_score_parts(
            F.size("__toks"), F.col("__punct"),
            T.stopword_ratio_from_tokens(F.col("__toks"))), 2).alias("quality"))
    kept = feats.filter(F.col("quality") >= min_quality)
    w = Window.partitionBy("__digest").orderBy(F.col(id_col))
    return (kept.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk", "__digest"))


def corpus_stats(clean: DataFrame) -> DataFrame:
    """Per-language accounting of the cleaned corpus."""
    return (clean.groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.round(F.avg("quality"), 4).alias("avg_quality")))


def curriculum_deciles(docs: DataFrame, order_col: str = "n_chars",
                       part_col: str = "lang", id_col: str = "doc_id",
                       n_buckets: int = 10) -> DataFrame:
    """Length-curriculum bucketing: NTILE deciles of ``order_col``
    within each ``part_col`` stratum (ties broken by id — fully
    deterministic, so the same doc lands in the same decile on every
    engine). Downstream training readers consume buckets in order
    (curriculum) or sample uniformly across them (length balance).

    One hash exchange + per-stratum sort; NTILE is a single window
    pass. At 100 TB prefer percentile-bucket boundaries via
    approx-quantiles if strata exceed a reducer — the NTILE form is
    exact and fine while each stratum sorts in memory."""
    from pyspark.sql import Window

    w = Window.partitionBy(part_col).orderBy(
        F.col(order_col).asc(), F.col(id_col).asc())
    return docs.withColumn("bucket", F.ntile(n_buckets).over(w))


def pack_sequences(docs: DataFrame, budget_tokens: int,
                   part_col: str = "lang", id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Streaming sequence packing: assign documents to fixed
    token-budget training bins. Docs are taken in deterministic
    (md5 of id) order within each stratum and a doc starts a new bin
    whenever the running total before it crosses the next budget
    boundary: bin = floor(exclusive-cumsum(tokens) / budget).

    This is the single-pass "streaming first-fit" packer (bins can
    overflow by at most one doc — the standard trade accepted by
    sequence-packing dataloaders); an exact bin-packer is NP-hard
    and needs global state. One hash exchange + per-stratum sort —
    the same window scan at any SF.
    """
    from pyspark.sql import Window

    from vega_spark.functions.text import token_count

    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = (Window.partitionBy(part_col).orderBy(h.asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    toks = docs.withColumn("n_tokens", token_count(text_col))
    return (toks
            .withColumn("cum_before",
                        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
            .withColumn("bin",
                        F.floor(F.col("cum_before") / budget_tokens)
                        .cast("int"))
            .drop("cum_before"))


def dsir_importance_weights(docs: DataFrame, is_target,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            n_buckets: int = 4096,
                            round_dp: int = 6) -> DataFrame:
    """DSIR-style importance weighting (Xie et al., arXiv:2302.03169
    — Data Selection for Language Models via Importance Resampling):
    score every raw document by the mean log-likelihood ratio of its
    hashed-unigram buckets under a target-domain unigram model vs the
    raw-pool model (add-one smoothing). ``selected`` marks docs whose
    weight is positive — more target-like than pool-like — the
    threshold rule that needs no global sort.

    ``is_target`` is a Column predicate naming the target-domain rows
    (they are scored too, for audit, but the typical use filters to
    the raw side afterwards).

    Scale design, per the paper: unigrams are HASHED into
    ``n_buckets`` buckets (md5-based so any engine can replay it), so
    the model frame is bounded at n_buckets rows regardless of corpus
    vocabulary — it broadcasts at any corpus size. Plan: one narrow
    tokenize/explode pass → one keyed aggregate to (doc, bucket)
    counts → bucket models are two aggregates over that frame →
    broadcast joined back → one per-doc rollup. The document text
    crosses exactly one shuffle (the doc-bucket aggregate)."""
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        is_target.alias("__t"),
                        F.explode(F.filter(
                            F.split(F.lower(F.col(text_col)), r"\s+"),
                            lambda x: x != "")).alias("w")))
    b = (F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("long")
         % n_buckets).alias("bucket")
    dw = (toks.select("doc_id", "__t", b)
          .groupBy("doc_id", "__t", "bucket")
          .agg(F.count(F.lit(1)).alias("c")))
    models = (dw.groupBy("bucket")
              .agg(F.sum(F.when(F.col("__t"), F.col("c"))
                         .otherwise(0)).alias("ct"),
                   F.sum(F.when(~F.col("__t"), F.col("c"))
                         .otherwise(0)).alias("cr")))
    totals = models.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    llr = (models.crossJoin(F.broadcast(totals))
           .select("bucket",
                   F.log(((F.col("ct") + 1.0)
                          / (F.col("tt") + F.lit(float(n_buckets))))
                         / ((F.col("cr") + 1.0)
                            / (F.col("tr") + F.lit(float(n_buckets)))))
                   .alias("llr")))
    scored = (dw.join(F.broadcast(llr), "bucket")
              .groupBy("doc_id")
              .agg(F.sum("c").alias("n_tokens"),
                   (F.sum(F.col("c") * F.col("llr"))
                    / F.sum("c")).alias("__w")))
    return scored.select(
        "doc_id", "n_tokens",
        F.round("__w", round_dp).alias("llr_weight"),
        (F.col("__w") > 0).alias("selected"))


def sample_negatives(docs, id_col: str = "doc_id", k: int = 4,
                     seed: str = "neg"):
    """Deterministic NEGATIVE SAMPLING for contrastive training
    pairs: each document becomes an anchor paired with ``k``
    pseudo-random other documents — negative_i(anchor) is the doc at
    corpus position md5(seed:anchor:i) mod n (bumped by one when it
    lands on the anchor itself), under the doc_id total order.

    The md5 draw makes the pairing a pure function of (corpus, seed):
    reruns, other engines, and the SQL oracle all derive the same
    pairs — no RNG state, no sampled-once-then-frozen artifact to
    ship. Scale shape: one scalable zip_with_index (range exchange,
    no global window), one k-way narrow explode, one equi-join on
    the uniform index (no skew). Output: (anchor id, slot, negative
    id)."""
    from pyspark.sql import functions as F

    from vega_spark.operators.joins import zip_with_index

    idx = zip_with_index(docs.select(id_col), [id_col], "__idx")
    n = idx.count()
    anchors = (idx.select(F.col(id_col).alias("anchor"),
                          F.col("__idx").alias("__own"))
               .withColumn("slot", F.explode(
                   F.array(*[F.lit(i) for i in range(k)]))))
    draw = (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(seed),
                          F.col("anchor").cast("string"),
                          F.col("slot").cast("string"))), 1, 12),
        16, 10).cast("long") % n)
    pos = F.when(draw == F.col("__own"),
                 (draw + 1) % n).otherwise(draw)
    want = anchors.select("anchor", "slot", pos.alias("__want"))
    neg = idx.select(F.col("__idx").alias("__want"),
                     F.col(id_col).alias("negative"))
    return (want.join(neg, "__want")
            .select("anchor", "slot", "negative"))
