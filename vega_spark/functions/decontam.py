"""Benchmark decontamination: flag training documents that share
word n-grams with a (small) evaluation/benchmark set.

Standard LLM-pipeline step (the reference has no text layer at all —
SURVEY.md §2.10 — this is a north-star extension): before training,
any document containing a long-enough n-gram that also appears in an
eval benchmark is flagged/dropped so the benchmark stays held out.

Scale design (100 TB corpus, ~MB-scale eval set):
- The eval n-gram set is tiny (benchmarks are thousands of rows) →
  ``F.broadcast`` it; the contamination check is then a broadcast
  semi/inner join — the corpus side never shuffles on n-grams.
- The corpus side explodes to one row per n-gram but only AFTER
  column pruning to (id, text); the final per-doc rollup is the one
  exchange, keyed by doc id (well-distributed).
- All tokenization is Column expressions (JVM codegen), no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vega_spark.functions.text import tokens


def word_ngrams(col: Column | str, n: int) -> Column:
    """Array of space-joined word n-grams (lowercased, whitespace
    tokens). Documents shorter than ``n`` tokens yield an empty
    array."""
    toks = tokens(col)
    # NB: F.sequence(1, 0) yields a DESCENDING [1, 0], not [] — guard
    # short documents explicitly.
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def eval_ngram_set(eval_docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct n-grams of the benchmark set, one column ``ngram``.
    Small by construction — callers broadcast it."""
    return (
        eval_docs.select(F.explode(word_ngrams(text_col, n)).alias("ngram"))
        .distinct()
    )


def contamination_report(train: DataFrame, eval_docs: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 5, threshold: int = 1) -> DataFrame:
    """Per-train-doc contamination report:
    (id, n_ngrams, n_matched, contaminated).

    ``n_matched`` counts DISTINCT matching n-grams (a doc repeating
    one leaked n-gram k times still counts 1); ``contaminated`` is
    ``n_matched >= threshold``. Docs with fewer than ``n`` tokens
    have 0 n-grams and are never contaminated.

    Plan shape: corpus scan → explode → broadcast-hash inner join
    against the distinct eval n-grams → single groupBy(id) exchange,
    then a left join back onto the (id, n_ngrams) base keyed by id
    (the hit side is usually tiny — contaminated docs are rare — and
    AQE turns it into a broadcast at runtime; we don't force it since
    at 100 TB "rare" is not "guaranteed small").
    """
    grams = train.select(F.col(id_col),
                         word_ngrams(text_col, n).alias("grams"))
    base = grams.select(id_col, F.size("grams").alias("n_ngrams"))
    hits = (
        grams.select(id_col, F.explode_outer(
            F.array_distinct("grams")).alias("ngram"))
        .join(F.broadcast(eval_ngram_set(eval_docs, text_col, n)), "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col, "n_ngrams",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            (F.coalesce("n_matched", F.lit(0)) >= threshold
             ).alias("contaminated"),
        )
    )
