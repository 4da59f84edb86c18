"""Python UDTF surface (Spark 4 table functions).

The reference's only 1→N row surface is a serialized `flat_map`
closure (SURVEY.md §2.10, flatmapper_rdd.rs); the idiomatic Spark
ladder is (1) built-in `explode` over a Column expression — always
preferred, stays in codegen — then (2) a Python UDTF when the
expansion logic is genuinely imperative. This module carries one of
each shape so the API surface is covered and tested; hot paths in
this repo use explode (see functions/text.chunk_tokens).

Scale note: a UDTF runs in the Python worker (Arrow-batched in/out,
but per-row Python in the middle) — fine for control-plane-sized
expansions, wrong for per-token hot loops. Keep the heavy variants
declarative.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="idx int, sentence string, n_words int")
class SplitSentences:
    """doc text → one row per sentence (split on ./!/? + whitespace),
    with its position and word count. Empty/whitespace-only segments
    are dropped."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, seg in enumerate(s for s in _SENT_SPLIT.split(text)
                                if s.strip()):
            yield i, seg, len(seg.split())


def sentences_table(spark, docs, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Lateral-join ``SplitSentences`` against every document:
    SELECT id, s.* FROM docs, LATERAL SplitSentences(text) s."""
    from pyspark.sql import functions as F

    spark.udtf.register("vega_split_sentences", SplitSentences)
    docs.select(id_col, text_col).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        f"SELECT {id_col}, s.idx, s.sentence, s.n_words "
        f"FROM __udtf_docs, LATERAL vega_split_sentences({text_col}) s")
