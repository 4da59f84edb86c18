"""Fuzzy (approximate-string) matching: q-gram blocked candidate
generation + edit-distance verification — the record-linkage /
entity-resolution primitive (matching supplier names, product
titles, user handles across datasets).

Scale shape, the only one that survives 100 TB: NEVER all-pairs.
Candidates come from an inverted-index equi-join on shared q-grams
(linear in rows x grams-per-string), hot grams are dropped by a
document-frequency cap exactly like stop-shingles in
`dedup.ngram_jaccard_pairs`, a cheap length-difference prefilter
runs before the O(len^2) edit distance, and `levenshtein` itself is
a JVM builtin (codegen'd, no Python).

Recall contract (q-gram lemma): strings within edit distance k share
at least max(len) - q + 1 - k*q q-grams, so blocking is LOSSLESS for
len >= q*(k+1); shorter strings may be missed — lower q for
short-key domains.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qgrams(col: Column | str, q: int = 3) -> Column:
    """Distinct character q-grams of the lower-cased string (strings
    shorter than q contribute their whole self as one gram)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(c)
    n = F.greatest(F.length(s) - (q - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n),
                    lambda i: F.substring(s, i, q)))


def gram_guard_report(df: DataFrame, name_col: str, q: int = 3,
                      max_gram_freq: int = 1000) -> DataFrame:
    """Observability companion for the q-gram frequency cap (same
    doctrine as search.sparse_cosine_term_guard): one row of
    (n_rows, total_grams, surviving_grams, capped_grams). A name
    population homogeneous enough that EVERY gram exceeds the cap
    yields zero candidates — bounded but silently empty unless this
    says so (the 10x replica corpus does exactly that to supplier
    names). One gram-keyed shuffle, nothing quadratic."""
    g = (df.select(F.explode(qgrams(F.col(name_col), q)).alias("gram"))
         .groupBy("gram").agg(F.count(F.lit(1)).alias("df_")))
    n_rows = df.agg(F.count(F.lit(1)).alias("n"))
    return (g.crossJoin(F.broadcast(n_rows))
            .agg(F.max("n").alias("n_rows"),
                 F.count(F.lit(1)).alias("total_grams"),
                 F.sum((F.col("df_") <= max_gram_freq).cast("long"))
                 .alias("surviving_grams"),
                 F.sum((F.col("df_") > max_gram_freq).cast("long"))
                 .alias("capped_grams")))


def fuzzy_self_pairs(df: DataFrame, name_col: str,
                     id_col: str, max_dist: int = 2,
                     min_dist: int = 1, q: int = 3,
                     max_gram_freq: int = 1000,
                     band_gram_df: int | None = None) -> DataFrame:
    """Pairs (id_a < id_b) whose names are within edit distance
    [min_dist, max_dist]. min_dist=1 excludes identical strings
    (exact dedup's job). ``max_gram_freq`` drops grams shared by more
    rows than that — a gram in everything ('the') generates quadratic
    candidates and zero signal.

    ``band_gram_df`` (r9, VERDICT r8 #4 — the scale-safe escape
    hatch): a PER-GRAM PAIR BUDGET ∝ df, mirroring
    search.sparse_cosine_pairs' sub-bucket rule. A gram with
    df > band_gram_df has its postings hash-partitioned into
    ``ceil(df / band_gram_df)`` sub-buckets (md5_32("gram:id") %
    n_sub — deterministic, engine-replayable) and candidates form
    within (gram, sub-bucket) only, so per-gram fan-out falls from
    C(df, 2) to ~df·band_gram_df/2 and total candidate work is
    linear in postings. THIS TRADES THE EXACT-RECALL GUARANTEE:
    the q-gram lemma's "shares >= 1 gram" becomes "shares >= 1 gram
    where both postings co-bucket" — a true pair sharing m banded
    grams (each split into n_i sub-buckets) is missed with
    probability ~Π(1 - 1/n_i), so pairs whose ONLY shared grams are
    hot can drop. Near-dup strings share many grams (lemma:
    >= max(len) - q + 1 - k·q), most of them under the band on
    natural name populations, so measured recall stays high (pinned
    in tests vs the exact mode). Default ``None`` = exact mode —
    the budget is opt-in for corpora whose gram space saturates
    (fixed-alphabet keys at 100 TB)."""
    base = df.select(F.col(id_col).alias("id"),
                     F.lower(F.col(name_col)).alias("s"))
    g = base.select("id", "s", F.explode(qgrams(F.col("s"), q)).alias("gram"))
    freq = (g.groupBy("gram").agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_gram_freq))
    g = g.join(freq, "gram")
    if band_gram_df is not None:
        # identical expression to search.sparse_cosine_pairs (and to
        # the DuckDB '0x'||substr(md5(..),1,8) replay), so a
        # registry oracle can re-run the assignment bit for bit
        h32 = F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.col("gram"), F.col("id").cast("string"))), 1, 8),
            16, 10).cast("long")
        n_sub = F.ceil(F.col("df_") / F.lit(band_gram_df)).cast("long")
        g = g.withColumn(
            "sub", F.when(F.col("df_") <= band_gram_df, F.lit(0))
            .otherwise(h32 % n_sub))
    else:
        g = g.withColumn("sub", F.lit(0))
    a = g.select("gram", "sub", F.col("id").alias("id_a"),
                 F.col("s").alias("s_a"))
    b = g.select("gram", "sub", F.col("id").alias("id_b"),
                 F.col("s").alias("s_b"))
    cand = (a.join(b, ["gram", "sub"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "s_a", "s_b").distinct())
    verified = (cand
                .filter(F.abs(F.length("s_a") - F.length("s_b")) <= max_dist)
                .withColumn("dist", F.levenshtein("s_a", "s_b"))
                .filter((F.col("dist") >= min_dist)
                        & (F.col("dist") <= max_dist)))
    return verified.select("id_a", "id_b",
                           F.col("s_a").alias("name_a"),
                           F.col("s_b").alias("name_b"), "dist")


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_name: str, right_name: str,
               left_id: str, right_id: str,
               max_dist: int = 2, q: int = 3,
               max_gram_freq: int = 1000) -> DataFrame:
    """Two-table fuzzy equi-candidates + verify: every (left, right)
    pair within ``max_dist`` edits. Same blocked shape as
    `fuzzy_self_pairs`; the gram-frequency cap is computed on the
    UNION of both sides so a gram hot on either side is dropped."""
    lb = left.select(F.col(left_id).alias("id_l"),
                     F.lower(F.col(left_name)).alias("s_l"))
    rb = right.select(F.col(right_id).alias("id_r"),
                      F.lower(F.col(right_name)).alias("s_r"))
    gl = lb.select("id_l", "s_l",
                   F.explode(qgrams(F.col("s_l"), q)).alias("gram"))
    gr = rb.select("id_r", "s_r",
                   F.explode(qgrams(F.col("s_r"), q)).alias("gram"))
    freq = (gl.select("gram").unionAll(gr.select("gram"))
            .groupBy("gram").agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_gram_freq).select("gram"))
    cand = (gl.join(freq, "gram").join(gr.join(freq, "gram"), "gram")
            .select("id_l", "id_r", "s_l", "s_r").distinct())
    return (cand
            .filter(F.abs(F.length("s_l") - F.length("s_r")) <= max_dist)
            .withColumn("dist", F.levenshtein("s_l", "s_r"))
            .filter(F.col("dist") <= max_dist)
            .select("id_l", "id_r",
                    F.col("s_l").alias("name_l"),
                    F.col("s_r").alias("name_r"), "dist"))


def resolve_entities(df: DataFrame, id_col: str, name_col: str,
                     vote_cols: Sequence[str] = (),
                     max_cols: Sequence[str] = (),
                     max_dist: int = 2, q: int = 3,
                     max_gram_freq: int = 1000) -> DataFrame:
    """Entity resolution end-to-end: fuzzy-match names
    (`fuzzy_self_pairs`), group transitively-linked records
    (`dedup.connected_components`), and emit ONE canonical record per
    entity with survivorship rules — the full record-linkage pipeline
    as one call.

    Survivorship (all deterministic): entity id = smallest member id;
    canonical name = the name of that smallest-id member;
    ``vote_cols`` take the most frequent member value (ties to the
    smallest); ``max_cols`` take the member maximum. Singletons (no
    fuzzy match) resolve to themselves.

    Plan: the blocked fuzzy join, the iterative min-label CC (shallow
    graphs — name-dup clusters), then per-entity keyed aggregates;
    the vote adds one (entity, value) count + per-entity rank window
    per voted column."""
    from pyspark.sql.window import Window

    from vega_spark.functions.dedup import connected_components

    pairs = fuzzy_self_pairs(df, name_col, id_col, max_dist=max_dist,
                             min_dist=1, q=q,
                             max_gram_freq=max_gram_freq)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")),
        src="a", dst="b")
    lab = (df.join(comp.withColumnRenamed("doc_id", id_col), id_col,
                   "left")
           .withColumn("__entity",
                       F.coalesce("component", F.col(id_col)))
           .drop("component"))
    base = lab.groupBy("__entity").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min_by(F.col(name_col), F.col(id_col)).alias("canonical_name"),
        *[F.max(c).alias(f"max_{c}") for c in max_cols])
    out = base
    for c in vote_cols:
        votes = (lab.groupBy("__entity", c)
                 .agg(F.count(F.lit(1)).alias("__c")))
        w = Window.partitionBy("__entity").orderBy(F.desc("__c"),
                                                   F.asc(c))
        pick = (votes.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select("__entity", F.col(c).alias(f"voted_{c}")))
        out = out.join(pick, "__entity")
    return out.withColumnRenamed("__entity", "entity")
