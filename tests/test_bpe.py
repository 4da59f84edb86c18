"""BPE tokenizer: merge learning, determinism, encode roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from vega_spark.functions import bpe as B


def corpus(spark):
    rows = [(1, "low low low low low"),
            (2, "lower lower newest newest newest newest newest newest"),
            (3, "widest widest widest")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_train_first_merges_hand_checked(spark):
    # Sennrich's classic example shape: 'es' then 'est' dominate.
    merges = B.bpe_train(corpus(spark), num_merges=4)
    # e+s appears in newest(6) + widest(3) = 9 — the top pair
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    # retrain reproduces the list exactly (determinism)
    assert merges == B.bpe_train(corpus(spark), num_merges=4)


def test_bpe_encode_roundtrip_and_cache_semantics(spark):
    df = corpus(spark)
    merges = B.bpe_train(df, num_merges=30)
    enc = B.bpe_encode(df, merges)
    for r in enc.collect():
        # concatenated subwords reproduce the normalized words
        joined = "".join(r.bpe_tokens).replace("</w>", " ").strip()
        assert joined == " ".join(r.text.lower().split())
    # with enough merges frequent words collapse to one token
    one = {r.doc_id: r.bpe_tokens for r in enc.collect()}
    assert "low</w>" in one[1]


def test_bpe_encode_ids_vocab_and_oov(spark):
    df = corpus(spark)
    merges = B.bpe_train(df, num_merges=10)
    vocab = B.bpe_vocab(merges)
    assert len(set(vocab.values())) == len(vocab)      # ids unique
    ids = B.bpe_encode_ids(df, merges).first().token_ids
    assert all(i >= 0 for i in ids)                    # no OOV in-corpus
    # unseen characters map to oov_id
    oov = spark.createDataFrame([(9, "zzzq")], "doc_id long, text string")
    got = B.bpe_encode_ids(oov, merges, oov_id=-1).first().token_ids
    assert -1 in got


def test_bpe_word_counts_bounded_head(spark):
    wc = B.word_counts(corpus(spark), max_words=2)
    assert wc == [("newest", 6), ("low", 5)]
