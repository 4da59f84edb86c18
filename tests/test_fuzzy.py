"""Fuzzy matching: q-gram blocking + edit-distance verify."""

from __future__ import annotations

from vega_spark.operators import fuzzy as Z


def test_fuzzy_self_pairs_known_distances(spark):
    rows = [(1, "red widget"), (2, "red widgets"), (3, "red wadget"),
            (4, "blue bolt"), (5, "red widget")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b): r.dist
           for r in Z.fuzzy_self_pairs(df, "name", "id",
                                       max_dist=2).collect()}
    # identical pair (1,5) excluded by min_dist=1; insert + substitute in
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1
    assert got[(2, 3)] == 2
    assert (2, 5) in got and (3, 5) in got
    assert not any(4 in k for k in got)      # 'blue bolt' matches nothing


def test_fuzzy_join_two_tables_and_case_folding(spark):
    left = spark.createDataFrame([(1, "ACME Corp")], "id long, name string")
    right = spark.createDataFrame(
        [(10, "acme corp"), (11, "acme corp."), (12, "emca corp")],
        "id long, name string")
    got = {(r.id_l, r.id_r): r.dist
           for r in Z.fuzzy_join(left, right, "name", "name",
                                 "id", "id", max_dist=1).collect()}
    assert got[(1, 10)] == 0 and got[(1, 11)] == 1
    assert (1, 12) not in got                 # distance 2 > max


def test_stop_gram_cap_prunes_universal_grams(spark):
    # every name shares 'xxx'; with the cap at 2 the shared gram is
    # dropped and only the discriminative tails block together
    rows = [(i, f"xxx{i % 2}") for i in range(6)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = Z.fuzzy_self_pairs(df, "name", "id", max_dist=1,
                             max_gram_freq=2).collect()
    assert got == []          # 'xxx*' grams all exceed the cap: no candidates
    loose = Z.fuzzy_self_pairs(df, "name", "id", max_dist=1,
                               max_gram_freq=100).collect()
    assert len(loose) > 0     # with a permissive cap the pairs appear
