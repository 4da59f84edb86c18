"""Byte-pair-encoding tokenizer: corpus-trained merges + distributed
encode — the real token-counting surface of an LLM data pipeline
(text.tokens counts whitespace words; this counts subword tokens the
way the training run will).

Scale split, the part that matters at 100 TB:
- TRAINING never iterates over the corpus. One keyed shuffle builds
  the (word, count) table — cardinality = corpus vocabulary, with
  map-side partial counts — and a bounded TakeOrdered head (the
  ``max_words`` most frequent words carry essentially all pair mass
  under Zipf) moves to the driver. The merge loop then runs on that
  bounded table only: cost is O(num_merges x max_words), independent
  of corpus size. This is how production tokenizers are actually
  trained (HuggingFace tokenizers trains from a word-count table the
  same way).
- ENCODING is a narrow Arrow-batched pass: the merge ranks broadcast
  inside the UDF closure, each word is encoded once and memoized
  (Zipf makes the cache hit rate ~99%), and nothing shuffles.

Deterministic end to end: greedy highest-count merge with
lexicographically-smallest tie-break, no RNG — retraining reproduces
the merge list bit-for-bit (unit-tested).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vega_spark.functions.text import tokens

_EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text",
                max_words: int = 20_000) -> list[tuple[str, int]]:
    """(word, count) for the ``max_words`` most frequent words —
    one partial+final keyed aggregate and a TakeOrderedAndProject
    head (count desc, word asc): bounded driver transfer at any SF."""
    rows = (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("w")).limit(max_words)
            .collect())
    return [(r["w"], r["n"]) for r in rows]


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 200,
              max_words: int = 20_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus word-count
    table (Sennrich et al. 2016 alg.): repeatedly merge the
    highest-total-count adjacent symbol pair (ties to the
    lexicographically smallest pair). Words carry an end-of-word
    marker so merges never cross word boundaries."""
    freqs: dict[tuple[str, ...], int] = {}
    for w, n in word_counts(df, text_col, max_words):
        freqs[tuple(w) + (_EOW,)] = freqs.get(tuple(w) + (_EOW,), 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, n in freqs.items():
            for pair in zip(word, word[1:]):
                pair_counts[pair] = pair_counts.get(pair, 0) + n
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_freqs: dict[tuple[str, ...], int] = {}
        for word, n in freqs.items():
            out, i = [], 0
            while i < len(word):
                if (i + 1 < len(word)
                        and (word[i], word[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_freqs[key] = new_freqs.get(key, 0) + n
        freqs = new_freqs
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """token -> id: single characters and the end-of-word marker
    (sorted, from the merge alphabet) first, then each merge's output
    in merge order — the standard BPE id layout."""
    chars = sorted({c for a, b in merges for c in (a, b)
                    if len(c) == 1} | {_EOW})
    vocab = {t: i for i, t in enumerate(chars)}
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def _encode_word(w: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(w) + [_EOW]
    while len(symbols) > 1:
        pairs = list(zip(symbols, symbols[1:]))
        best = min(pairs, key=lambda p: ranks.get(p, 1 << 30))
        if best not in ranks:
            break
        merged, out, i = best[0] + best[1], [], 0
        while i < len(symbols):
            if (i + 1 < len(symbols)
                    and (symbols[i], symbols[i + 1]) == best):
                out.append(merged)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Subword-tokenize ``text_col`` with trained merges: narrow
    Arrow-batched pass, per-word memoization inside the worker (the
    cache persists across rows of a batch; Zipf makes most lookups
    hits). Words are lowercased + whitespace-split exactly like the
    training tokenizer (`text.tokens`). Output is array<string> of
    subword tokens; join with
    `bpe_vocab` ids via `bpe_encode_ids` when integer ids are what
    the packing stage wants."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def run(t: str) -> list[str]:
            out: list[str] = []
            for w in (t or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return texts.map(run)

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_encode_ids(df: DataFrame, merges: list[tuple[str, str]],
                   text_col: str = "text",
                   out_col: str = "token_ids",
                   oov_id: int = -1) -> DataFrame:
    """`bpe_encode` + id mapping in one pass (ids from `bpe_vocab`;
    characters unseen at train time get ``oov_id``)."""
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = bpe_vocab(merges)

    @F.pandas_udf("array<int>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[int]] = {}

        def run(t: str) -> list[int]:
            out: list[int] = []
            for w in (t or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = [vocab.get(s, oov_id)
                           for s in _encode_word(w, ranks)]
                    cache[w] = got
                out.extend(got)
            return out

        return texts.map(run)

    return df.withColumn(out_col, enc(F.col(text_col)))
