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


def test_banded_mode_inactive_is_bit_identical(spark):
    # band_gram_df larger than every gram df: the sub column is all
    # zeros, so the banded plan must return EXACTLY the exact mode's
    # pairs (same inactive-rule contract as sparse_cosine's band_df)
    rows = [(1, "red widget"), (2, "red widgets"), (3, "red wadget"),
            (4, "blue bolt"), (5, "red widget")]
    df = spark.createDataFrame(rows, "id long, name string")
    exact = {(r.id_a, r.id_b, r.dist) for r in
             Z.fuzzy_self_pairs(df, "name", "id", max_dist=2).collect()}
    banded = {(r.id_a, r.id_b, r.dist) for r in
              Z.fuzzy_self_pairs(df, "name", "id", max_dist=2,
                                 band_gram_df=100).collect()}
    assert banded == exact


def test_banded_recall(spark):
    # r9 (VERDICT r8 #4): the banded escape hatch trades the q-gram
    # lemma's exact recall for a per-gram pair budget — recall must
    # be MEASURED, and on a name population whose pairs share many
    # grams it must stay high. 200 names in 100 edit-distance-1
    # pairs over a deliberately saturated gram space (shared stem):
    # band_gram_df=4 splits the hot stem grams into many sub-buckets.
    rows = []
    for i in range(100):
        stem = f"acme{i:03d}supply"
        rows.append((2 * i, stem + "a"))
        rows.append((2 * i + 1, stem + "b"))   # dist 1 from partner
    df = spark.createDataFrame(rows, "id long, name string")
    exact = {(r.id_a, r.id_b) for r in
             Z.fuzzy_self_pairs(df, "name", "id", max_dist=1,
                                max_gram_freq=1000).collect()}
    banded = {(r.id_a, r.id_b) for r in
              Z.fuzzy_self_pairs(df, "name", "id", max_dist=1,
                                 max_gram_freq=1000,
                                 band_gram_df=4).collect()}
    assert banded <= exact            # never invents pairs
    truth = {(2 * i, 2 * i + 1) for i in range(100)}
    assert truth <= exact             # exact mode keeps the lemma
    recall = len(banded & truth) / len(truth)
    # each true pair shares ~12 grams; even with every gram banded
    # into ~25 sub-buckets the miss probability per pair is
    # (1 - 1/n_sub)^m — recall stays well above this floor
    assert recall >= 0.9, f"banded recall {recall}"


def test_resolve_entities_survivorship(spark):
    rows = [
        (1, "acme corp", 10, 5.0),
        (2, "acme corp.", 20, 9.0),     # links to 1 (dist 1)
        (3, "acme corpse", 20, 1.0),    # links to 2 (dist 2): one entity
        (9, "zzz unrelated", 30, 7.0),  # singleton
    ]
    df = spark.createDataFrame(rows, "id long, name string, nat int, bal double")
    out = {r.entity: r for r in Z.resolve_entities(
        df, "id", "name", vote_cols=["nat"], max_cols=["bal"],
        max_gram_freq=100).collect()}
    assert set(out) == {1, 9}
    e = out[1]
    assert e.n_members == 3
    assert e.canonical_name == "acme corp"       # smallest member id
    assert e.voted_nat == 20                     # 20 outvotes 10 (2 vs 1)
    assert e.max_bal == 9.0
    s = out[9]
    assert (s.n_members, s.canonical_name, s.voted_nat) == \
        (1, "zzz unrelated", 30)


def test_retention_and_paths_shapes(spark):
    from pyspark.sql import functions as F
    from vega_spark.functions.analytics import (retention_cohorts,
                                                top_event_paths)
    day = 86_400_000_000_000
    rows = [(1, "view", 0 * day, 1), (1, "click", 0 * day + 5, 2),
            (1, "view", 2 * day, 3),
            (2, "view", 1 * day, 4)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long")
    ret = {(r.cohort, r.offset): r.n_active for r in retention_cohorts(
        ev, bucket_expr=lambda c: F.expr(f"ts div {day}")).collect()}
    assert ret == {(0, 0): 1, (0, 2): 1, (1, 0): 1}
    paths = {r.path: r.n for r in
             top_event_paths(ev, path_len=2, top_n=5).collect()}
    assert paths == {"view>click": 1, "click>view": 1}
