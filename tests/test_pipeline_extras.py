"""Tests for round-1 widening: decontamination, SCD2, rolling time
windows, hopping windows, and the data-quality expectations audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from vega_spark.functions.analytics import rolling_time_sum, scd2_from_events
from vega_spark.functions.decontam import contamination_report, word_ngrams
from vega_spark.operators.stats import expectations_audit


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b c",), ("one two three four five six",)],
                               "text string")
    out = df.select(F.size(word_ngrams("text", 5)).alias("n")).collect()
    assert sorted(r["n"] for r in out) == [0, 2]


def test_contamination_report_flags_overlap(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "totally unrelated words nothing shared here at all"),
         (3, "tiny")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "quick brown fox jumps over a fence")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            contamination_report(train, ev, "text", "doc_id", n=5).collect()}
    # train doc 1 shares the 5-gram "quick brown fox jumps over"
    assert rows[1]["contaminated"] and rows[1]["n_matched"] == 1
    assert not rows[2]["contaminated"] and rows[2]["n_matched"] == 0
    assert rows[3]["n_ngrams"] == 0 and not rows[3]["contaminated"]


def test_contamination_distinct_matches_counted_once(spark):
    # the leaked 5-gram appears twice in the train doc -> still 1
    train = spark.createDataFrame(
        [(1, "a b c d e x a b c d e")], "doc_id long, text string")
    ev = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    r = contamination_report(train, ev, "text", "doc_id", n=5).first()
    assert r["n_matched"] == 1 and r["n_ngrams"] == 7


def test_scd2_runs_and_validity_chain(spark):
    ev = spark.createDataFrame(
        [(1, 100, "a", 10), (2, 200, "a", 10), (3, 300, "b", 10),
         (4, 400, "a", 10), (5, 150, "x", 20)],
        "event_id long, ts long, event_type string, user_id long")
    out = scd2_from_events(ev).orderBy("user_id", "valid_from").collect()
    u10 = [r for r in out if r["user_id"] == 10]
    assert [(r["state"], r["valid_from"], r["valid_to"]) for r in u10] == [
        ("a", 100, 300), ("b", 300, 400), ("a", 400, None)]
    assert [r["is_current"] for r in u10] == [False, False, True]
    u20 = [r for r in out if r["user_id"] == 20]
    assert len(u20) == 1 and u20[0]["is_current"]


def test_rolling_time_sum_trailing_interval(spark):
    # key 1: events at t=0, 50, 120 with window 100us -> windows:
    # {0}, {0,50}, {50,120}? no: [20,120] excludes 0, includes 50,120
    ev = spark.createDataFrame(
        [(1, 0, 1.0), (1, 50, 2.0), (1, 120, 4.0), (2, 0, 8.0)],
        "k long, t long, value double")
    out = rolling_time_sum(ev, "k", F.col("t"), "value", 100)
    got = {(r["k"], r["t"]): (r["rolling"], r["n_in_window"])
           for r in out.collect()}
    assert got[(1, 0)] == (1.0, 1)
    assert got[(1, 50)] == (3.0, 2)
    assert got[(1, 120)] == (6.0, 2)
    assert got[(2, 0)] == (8.0, 1)


def test_rolling_time_sum_peer_rows_included(spark):
    ev = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 2.0), (1, 11, 4.0)],
        "k long, t long, value double")
    out = rolling_time_sum(ev, "k", F.col("t"), "value", 0).collect()
    # equal timestamps are peers: both t=10 rows see sum=3
    by_val = {r["value"]: r["rolling"] for r in out}
    assert by_val[1.0] == 3.0 and by_val[2.0] == 3.0 and by_val[4.0] == 4.0


def test_expectations_audit_counts(spark):
    df = spark.createDataFrame(
        [(1, None), (5, "x"), (200, "y")], "v long, s string")
    out = {r["check_name"]: r for r in expectations_audit(df, [
        ("v_small", F.col("v") < 100),
        ("s_not_null", F.col("s").isNotNull()),
        ("v_positive", F.col("v") > 0),
    ]).collect()}
    assert out["v_small"]["n_violations"] == 1
    assert not out["v_small"]["passed"]
    assert out["s_not_null"]["n_violations"] == 1
    assert out["v_positive"]["n_violations"] == 0
    assert out["v_positive"]["passed"]
    assert out["v_small"]["n_rows"] == 3


def test_hopping_window_three_per_event(spark, sf_dir):
    from vega_spark.registry import QUERIES
    n_events = QUERIES["count_rows"]  # noqa: F841 (registry warm)
    ev_n = (QUERIES["hopping_window_counts"](spark, sf_dir)
            .agg(F.sum("n")).first()[0])
    import duckdb
    true_n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    assert ev_n == 3 * true_n


def test_hash_split_deterministic_and_partition_invariant(spark):
    from vega_spark.operators.sampling import hash_split
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"]
         for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.repartition(7), "doc_id").collect()}
    assert a == b
    from collections import Counter
    frac = Counter(a.values())
    assert 0.7 < frac["train"] / 500 < 0.9
    assert frac["train"] + frac["val"] + frac["test"] == 500


def test_hash_split_two_way(spark):
    from vega_spark.operators.sampling import hash_split
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", [("a", 0.5), ("b", 0.5)])
    assert set(r["split"] for r in out.collect()) == {"a", "b"}


def test_temperature_resample_quota_shape(spark):
    from vega_spark.operators.sampling import temperature_resample
    rows = ([(i, "big") for i in range(400)]
            + [(i + 1000, "small") for i in range(25)])
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = temperature_resample(df, "grp", "doc_id", total=100, alpha=0.5)
    n = {r["grp"]: r["n"] for r in
         out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    # alpha=0.5: quotas ∝ sqrt(n) -> big gets 80, small 20-ish; the
    # rare group is upweighted vs its 6% share
    assert n["small"] / (n["small"] + n["big"]) > 0.15
    assert n["small"] <= 25
    # deterministic: rerun identical
    out2 = temperature_resample(df, "grp", "doc_id", total=100, alpha=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in out2.collect())


def test_keyness_flags_group_specific_term(spark):
    from vega_spark.functions.analytics import keyness_terms
    docs = spark.createDataFrame(
        [(1, "alpha alpha alpha shared shared", "g1"),
         (2, "alpha alpha alpha shared", "g1"),
         (3, "beta beta beta shared shared", "g2"),
         (4, "beta beta beta shared", "g2")],
        "doc_id long, text string, grp string")
    out = keyness_terms(docs, "text", "grp", top=1, min_count=3).collect()
    top = {r["grp"]: r["term"] for r in out}
    assert top == {"g1": "alpha", "g2": "beta"}


def test_curriculum_deciles_ordered_ranges(spark):
    from vega_spark.functions.pipeline import curriculum_deciles
    rows = [(i, "en", i * 10) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = curriculum_deciles(df, "n_chars", "lang", "doc_id", 4).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["n_chars"])
    assert sorted(by_bucket) == [1, 2, 3, 4]
    assert all(len(v) == 10 for v in by_bucket.values())
    assert max(by_bucket[1]) < min(by_bucket[2])
    assert max(by_bucket[3]) < min(by_bucket[4])


def test_udtf_sentences_shape(spark):
    from vega_spark.functions.udtfs import sentences_table
    docs = spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, "no punctuation here"),
         (3, None)],
        "doc_id long, text string")
    out = sentences_table(spark, docs, "text", "doc_id").collect()
    d1 = sorted([r for r in out if r["doc_id"] == 1], key=lambda r: r["idx"])
    assert [r["sentence"] for r in d1] == \
        ["Hello world.", "How are you?", "Fine!"]
    assert [r["n_words"] for r in d1] == [2, 3, 1]
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["idx"] == 0
    assert not [r for r in out if r["doc_id"] == 3]


def test_pack_sequences_budget_boundaries(spark):
    from vega_spark.functions.pipeline import pack_sequences
    # 4 docs of 3 tokens each, budget 6 -> bins of 2 docs (cum_before
    # 0,3 -> bin 0; 6,9 -> bin 1) in md5 order
    docs = spark.createDataFrame(
        [(i, "en", "a b c") for i in range(4)],
        "doc_id long, lang string, text string")
    out = pack_sequences(docs, 6, "lang", "doc_id", "text").collect()
    bins = sorted(r["bin"] for r in out)
    assert bins == [0, 0, 1, 1]
    assert all(r["n_tokens"] == 3 for r in out)


def test_pack_sequences_deterministic(spark):
    from vega_spark.functions.pipeline import pack_sequences
    docs = spark.createDataFrame(
        [(i, "en", "w " * (i % 7 + 1)) for i in range(50)],
        "doc_id long, lang string, text string")
    a = {r["doc_id"]: r["bin"]
         for r in pack_sequences(docs, 16).collect()}
    b = {r["doc_id"]: r["bin"]
         for r in pack_sequences(docs.repartition(5), 16).collect()}
    assert a == b


def test_pagerank_star_graph(spark):
    from vega_spark.functions.graph import pagerank
    # star: hub 0 connected to 1..4; symmetric degrees: hub=4, leaf=1
    edges = spark.createDataFrame([(0, i) for i in range(1, 5)],
                                  "a long, b long")
    out = {r["node"]: r["rank"]
           for r in pagerank(edges, "a", "b", iters=2).collect()}
    # after any iteration all leaves are equal, hub > leaf
    leaves = [out[i] for i in range(1, 5)]
    assert all(abs(v - leaves[0]) < 1e-12 for v in leaves)
    assert out[0] > leaves[0]
    # ranks sum to n on a regular-ish symmetric graph within damping
    assert abs(sum(out.values()) - 5) < 1.0


def test_pagerank_two_cliques_symmetric(spark):
    from vega_spark.functions.graph import pagerank
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 20), (20, 30), (10, 30)]
    edges = spark.createDataFrame(tri1 + tri2, "a long, b long")
    out = {r["node"]: r["rank"]
           for r in pagerank(edges, "a", "b", iters=3).collect()}
    # regular graph: every node rank exactly 1.0 at every iteration
    assert all(abs(v - 1.0) < 1e-12 for v in out.values())


def test_bloom_no_false_negatives_and_probe_shape(spark):
    from vega_spark.operators.sketches import bloom_build, bloom_probe
    corpus = spark.range(0, 2000).select(
        F.col("id").cast("string").alias("s"))
    bf = bloom_build(corpus, "s", m_bits=1 << 15, k=3)
    row = bf.first()
    assert len(row["bf"]) == (1 << 15) // 64
    probe = spark.range(1990, 2050).select(
        F.col("id").cast("string").alias("s"))
    hits = {r["s"]: r["bloom_hit"]
            for r in bloom_probe(probe, bf, "s", k=3,
                                 m_bits=1 << 15).collect()}
    # every member hits (no false negatives)
    assert all(hits[str(i)] for i in range(1990, 2000))
    # FP rate at n=2000/m=32768/k=3 is ~0.5%; 50 probes ≈ 0 or 1 FP
    assert sum(hits[str(i)] for i in range(2000, 2050)) <= 5


def test_bloom_dedup_equals_plain_anti_join(spark, sf_dir):
    from vega_spark.registry import QUERIES
    bloom = QUERIES["dedup_incremental_bloom"](spark, sf_dir)
    import duckdb
    oracle_n = duckdb.sql(f"""
        WITH corpus AS (SELECT * FROM '{sf_dir}/documents.parquet'
                        WHERE doc_id % 5 <> 0),
        batch AS (SELECT * FROM '{sf_dir}/documents.parquet'
                  WHERE doc_id % 5 = 0)
        SELECT COUNT(DISTINCT text) FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
    """).fetchone()[0]
    assert bloom.count() == oracle_n


def test_hash_split_threshold_rounding_to_256(spark):
    # ADVICE r01: a non-final cumulative fraction rounding to 256 used
    # to format as 3-hex '100', breaking the 2-char lexicographic
    # compare ('ff' < '100' is False) and dumping ~94% of the hash
    # range into the last split. On the 256-grid, 0.999 rounds to the
    # whole range, so EVERY row must land in 'a'.
    from vega_spark.operators.sampling import hash_split
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", [("a", 0.999), ("b", 0.001)])
    assert {r["split"] for r in out.collect()} == {"a"}


def test_sample_negatives_deterministic_and_anchor_free(spark):
    from vega_spark.functions.pipeline import sample_negatives

    docs = spark.createDataFrame([(i,) for i in range(50)],
                                 "doc_id long")
    out1 = sorted((r.anchor, r.slot, r.negative) for r in
                  sample_negatives(docs, k=3).collect())
    out2 = sorted((r.anchor, r.slot, r.negative) for r in
                  sample_negatives(docs.repartition(7), k=3).collect())
    # pure function of (corpus, seed): partitioning-invariant
    assert out1 == out2
    assert len(out1) == 50 * 3
    # never its own negative; negatives drawn from the corpus
    for a, _, n in out1:
        assert n != a and 0 <= n < 50
    # different seed → different pairing
    out3 = sorted((r.anchor, r.slot, r.negative) for r in
                  sample_negatives(docs, k=3, seed="other").collect())
    assert out3 != out1


def test_pagerank_fixed_point_matches_float_path(spark):
    from vega_spark.functions.graph import pagerank
    # star + path mix so degrees (and ranks) genuinely differ
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(4, 5), (5, 6)],
        "a long, b long")
    fl = {r["node"]: r["rank"]
          for r in pagerank(edges, "a", "b", iters=3).collect()}
    fx = {r["node"]: r["microrank"]
          for r in pagerank(edges, "a", "b", iters=3,
                            fixed_point=True).collect()}
    assert set(fl) == set(fx)
    for n in fl:
        # 1e-9 fixed-point truncation per superstep; 3 supersteps with
        # damping/deg amplification stay far under 1e-6 absolute
        assert abs(fx[n] / 1e9 - fl[n]) < 1e-6, (n, fx[n], fl[n])
    # fixed-point output must be exact integers (bigint column)
    assert all(isinstance(v, int) for v in fx.values())


def test_stl_micro_matches_float_components(spark):
    import datetime

    from vega_spark.functions.analytics import stl_lite_hourly
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(72):             # 3 days, daily seasonality
        n = 3 + (2 if (h % 24) in (9, 10) else 0) + (h // 24)
        for _ in range(n):
            rows.append(("click", base + datetime.timedelta(hours=h,
                                                            minutes=eid % 60)))
            eid += 1
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    fl = {r["xh"]: r for r in stl_lite_hourly(df).collect()}
    fx = {r["xh"]: r for r in stl_lite_hourly(df, micro=True).collect()}
    assert set(fl) == set(fx)
    for xh, r in fx.items():
        f = fl[xh]
        assert r["y"] == f["y"]
        # micro components are 1e-6 fixed-point versions of the float
        # path (trend DIV-truncated, so within 1 micro-unit + rounding)
        assert abs(r["trend_micro"] / 1e6 - f["trend"]) < 2e-6
        assert abs(r["seasonal_micro"] / 1e6 - f["seasonal"]) < 2e-6
        assert abs(r["residual_micro"] / 1e6 - f["residual"]) < 4e-6
        assert isinstance(r["trend_micro"], int)
