"""Inverted-index term search: materialize a (term, doc) posting
table once, answer AND/OR term queries with keyed aggregates over
the postings — the full-text-search primitive behind corpus
exploration and rule-based filtering (find every doc mentioning all
of X, Y).

Scale shape: the index build is one explode + dedup-by-(term, doc)
pass with an optional document-frequency band (``max_df`` drops stop
terms — a term in every document would re-materialize the corpus per
query; same guard as dedup's stop-shingles and fuzzy's gram cap). A
query touches only its terms' postings (partition pruning if the
index is written partitioned/bucketed by term), and matching is a
count-distinct-terms-per-doc aggregate — no joins against the corpus
until the final id→document lookup the caller chooses to do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vega_spark.functions.text import tokens


def build_inverted_index(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         min_df: int = 1,
                         max_df: int | None = None) -> DataFrame:
    """Posting table (term, doc_id, tf) with document-frequency
    banding. tf (in-doc occurrences) rides along for ranked
    retrieval; the (term, doc_id) pair is distinct."""
    t = (docs.select(F.col(id_col).alias("doc_id"),
                     F.explode(tokens(F.col(text_col))).alias("term"))
         .groupBy("term", "doc_id")
         .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = (t.groupBy("term")
             .agg(F.count(F.lit(1)).alias("df_")))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df_") <= max_df)
    dfreq = dfreq.filter(F.col("df_") >= min_df)
    return t.join(dfreq.select("term"), "term")


def search_terms(index: DataFrame, terms: Sequence[str],
                 mode: str = "and") -> DataFrame:
    """Docs matching the query terms: ``mode='and'`` requires every
    term, ``'or'`` any. Returns (doc_id, n_matched, total_tf) ranked
    columns; the terms filter prunes the postings before anything
    aggregates."""
    want = [t.lower() for t in terms]
    hits = index.filter(F.col("term").isin(want))
    matched = (hits.groupBy("doc_id")
               .agg(F.count_distinct("term").alias("n_matched"),
                    F.sum("tf").alias("total_tf")))
    if mode == "and":
        return matched.filter(F.col("n_matched") == len(set(want)))
    return matched
