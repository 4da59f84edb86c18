"""Event-sequence and data-quality analytics over the star schema —
the audit/insight queries a pipeline team runs beside the corpus jobs.
Capability superset: the reference's only analytics surface is the RDD
algebra (no windows, no conditional aggregates — SURVEY.md §2.11).

Scale notes: every operator here is one-or-two keyed shuffles with
partial aggregation; nothing collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(events: DataFrame, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  stages: tuple[str, str, str] = ("view", "click", "purchase"),
                  ) -> DataFrame:
    """Ordered three-stage funnel: users who did stage1, then stage2
    AFTER their first stage1, then stage3 after that stage2.

    One hash exchange on user total: the three conditional MINs are
    chained unordered windows over the same partitioning, and the
    per-user collapse reuses it. Returns one row: counts per funnel
    depth."""
    from pyspark.sql.window import Window
    s1, s2, s3 = stages
    e = events.select(F.col(user_col).alias("u"),
                      F.col(type_col).alias("t"), F.col(ts_col).alias("ts"))
    w = Window.partitionBy("u")
    # chained unordered windows over the SAME partitioning: one hash
    # exchange on user, every later stage is narrow (the groupBy("u")
    # below also reuses that partitioning — no further shuffle).
    staged = (e
              .withColumn("t1", F.min(F.when(F.col("t") == s1,
                                             F.col("ts"))).over(w))
              .withColumn("t2", F.min(F.when((F.col("t") == s2) &
                                             (F.col("ts") > F.col("t1")),
                                             F.col("ts"))).over(w))
              .withColumn("t3", F.min(F.when((F.col("t") == s3) &
                                             (F.col("ts") > F.col("t2")),
                                             F.col("ts"))).over(w)))
    per_user = staged.groupBy("u").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"),
        F.first("t3").alias("t3"))
    return per_user.agg(
        F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0)).alias("n_stage1"),
        F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0)).alias("n_stage2"),
        F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0)).alias("n_stage3"))


def fk_orphans(pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
               ) -> DataFrame:
    """Referential-integrity audit: for each (name, child, fk, parent,
    pk), count child rows whose fk has no matching parent pk.

    Each check is a LEFT ANTI join on the key — the parent side is
    projected to its key column only; small parents broadcast
    automatically. Results union into one (relation, n_orphans) frame
    (a handful of rows, safe to materialize anywhere)."""
    outs = []
    for name, child, fk, parent, pk in pairs:
        orphans = child.select(F.col(fk).alias("__k")).join(
            parent.select(F.col(pk).alias("__k")), "__k", "left_anti")
        outs.append(orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
                    .select(F.lit(name).alias("relation"), "n_orphans"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def user_event_gaps(events: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts", id_col: str = "event_id",
                    ts_div: int = 1) -> DataFrame:
    """Per-user inter-event-gap profile via the secondary-sort
    pattern: groups shuffle once on the user key and each group is
    ordered and scanned inside its Arrow batch (applyInPandas) — the
    grouped-map analog of repartitionAndSortWithinPartitions, with
    pure integer math so results are exact on any engine.

    ``ts_col`` is an integer epoch column; ``ts_div`` optionally
    coarsens it first by INTEGER division (e.g. 1000 for ns→µs —
    float division would lose precision on 1e18-scale epochs).
    Output: (user_id, n_events, n_gaps, sum_gap, max_gap) in the
    coarsened unit. Single-event users report 0 gaps with NULL max.
    Per-group state is O(group); a user's history must fit in a
    worker — the same bound every sessionizer accepts. Column pruning
    keeps the exchange at 3 narrow columns regardless of the events
    schema."""
    import pandas as pd

    schema = (f"{user_col} long, n_events long, n_gaps long, "
              "sum_gap long, max_gap long")

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        d = pdf[ts_col].diff().dropna()
        return pd.DataFrame({
            user_col: [pdf[user_col].iloc[0]],
            "n_events": [len(pdf)],
            "n_gaps": [len(d)],
            "sum_gap": [int(d.sum()) if len(d) else 0],
            "max_gap": [int(d.max()) if len(d) else None],
        })

    ts = (F.expr(f"{ts_col} div {ts_div}") if ts_div != 1
          else F.col(ts_col))
    return (events.select(user_col, ts.alias(ts_col), id_col)
            .groupBy(user_col).applyInPandas(gaps, schema))


def cooccurrence_pairs(df: DataFrame, basket_col: str, item_col: str,
                       min_count: int = 2,
                       max_basket: int = 200) -> DataFrame:
    """Frequent co-occurrence pairs (market-basket 2-itemsets): for
    every unordered pair of distinct items sharing a basket, the
    number of baskets containing both. The curation use: tokens /
    tags / parts that always travel together flag templated or
    machine-generated content.

    Plan: one shuffle groups items per basket (distinct, sorted,
    capped at ``max_basket`` — the skew guard: a degenerate basket of
    10^5 items would fan out 10^10 pairs); pair fan-out happens
    NARROWLY inside each group row via a nested array comprehension
    (i<j keeps pairs unordered-unique); the final count is a second
    keyed shuffle with map-side combine, cardinality = distinct
    pairs. No self-join: the classic join-on-basket formulation
    shuffles the big table twice and explodes skewed baskets across
    reducers; this shape contains the quadratic term inside one row."""
    return _pairs_from_items(_basket_items(df, basket_col, item_col),
                             min_count, max_basket)


def _basket_items(df: DataFrame, basket_col: str,
                  item_col: str) -> DataFrame:
    """Distinct items per basket — ``(b, items_all sorted array)`` —
    in ONE scan + ONE exchange of the fact table. Shared by every
    basket-derived aggregate in this module (pairs, item supports,
    basket total) so consumers that need several of them don't each
    re-scan the input (r9 opt round, guide §2.4). NULL items are
    dropped by ``collect_set``; see the equivalence notes at the
    consumers."""
    return (df.select(F.col(basket_col).alias("b"),
                      F.col(item_col).alias("i"))
            .groupBy("b")
            .agg(F.array_sort(F.collect_set("i")).alias("items_all")))


def _pairs_from_items(grouped: DataFrame, min_count: int,
                      max_basket: int) -> DataFrame:
    """Pair fan-out + count over a ``_basket_items`` frame (the body
    of :func:`cooccurrence_pairs`, split so callers holding the
    grouped frame reuse it)."""
    items = grouped.select(
        F.slice(F.col("items_all"), 1, max_basket).alias("items"))
    pairs = items.select(F.explode(
        F.flatten(F.transform(
            F.col("items"),
            lambda x, ix: F.transform(
                F.slice(F.col("items"), ix + 2,
                        F.greatest(F.size("items") - ix - 1, F.lit(0))),
                lambda y: F.struct(x.alias("a"), y.alias("b_")))))
    ).alias("p"))
    return (pairs.groupBy(F.col("p.a").alias("item_a"),
                          F.col("p.b_").alias("item_b"))
            .agg(F.count(F.lit(1)).alias("n_baskets"))
            .filter(F.col("n_baskets") >= min_count))


def scd2_from_events(events: DataFrame, key_col: str = "user_id",
                     attr_col: str = "event_type", ts_col: str = "ts",
                     id_col: str = "event_id") -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse an event
    stream into effective-dated attribute ranges per key — one row
    per (key, attribute run), with ``valid_from``/``valid_to`` and
    ``is_current`` on the last run. The CDC/warehouse primitive the
    reference (RDD algebra only, no windows — SURVEY.md §2.11)
    cannot express.

    Semantics: events ordered by (ts, id) per key; a new version
    starts whenever the attribute differs from the previous event's.
    ``valid_to`` is the next version's start (NULL on the open run).

    Plan: ONE hash exchange on the key — lag-compare, filter to
    change points, lead — all three windows share the same
    partitioning so Catalyst plans a single Exchange + one sort. At
    100 TB this scales as a single keyed sort; no driver state.
    """
    from pyspark.sql.window import Window
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    changed = (
        events.select(key_col, attr_col, ts_col, id_col)
        .withColumn("prev", F.lag(attr_col).over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col(attr_col)))
    )
    return (
        changed
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .select(
            F.col(key_col), F.col(attr_col).alias("state"),
            F.col(ts_col).alias("valid_from"), "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def rolling_time_sum(events: DataFrame, key_col: str, ts_us_col,
                     value_col: str, preceding_us: int,
                     out_col: str = "rolling") -> DataFrame:
    """Per-key rolling aggregate over a trailing TIME interval
    (RANGE window): for each event, the sum/count of ``value_col``
    over this key's events in ``[t - preceding_us, t]`` microseconds
    — inclusive both ends, peer rows (equal timestamps) all included,
    exactly the ANSI RANGE-frame semantics DuckDB replays.

    One hash exchange + per-key sort; the range frame is evaluated
    with a sliding two-pointer over the sorted run (Spark's window
    exec), so cost is O(n log n) per key regardless of interval
    width. ``ts_us_col`` is a Column expression yielding BIGINT
    microseconds (integer RANGE bounds dodge every float/interval
    pitfall at any SF)."""
    from pyspark.sql.window import Window
    e = events.withColumn("_ts_us", ts_us_col)
    w = (Window.partitionBy(key_col).orderBy("_ts_us")
         .rangeBetween(-preceding_us, 0))
    return (e.withColumn(out_col, F.sum(value_col).over(w))
            .withColumn("n_in_window", F.count(F.lit(1)).over(w)))


def keyness_terms(docs: DataFrame, text_col: str, group_col: str,
                  top: int = 5, min_count: int = 3) -> DataFrame:
    """Distinctive vocabulary per group (log-odds keyness with
    Haldane 0.5 smoothing): for each group, the terms whose frequency
    in the group most exceeds their frequency in the rest of the
    corpus — the standard corpus-linguistics signal for templated or
    domain-specific content.

    keyness(t, g) = ln((k_g+.5)/(n_g-k_g+.5)) - ln((k_o+.5)/(n_o-k_o+.5))
    with k = term count, n = total tokens, o = corpus minus g.

    Plan: a (group, term) count shuffle with map-side combine, then a
    term-keyed join against the per-term corpus totals (both sides
    are the distinct-term space, not the corpus); per-group totals
    broadcast; final per-group top-k is a WindowGroupLimit rank
    (map-side heaps). Nothing shuffles at corpus-row cardinality."""
    from pyspark.sql import Window

    from vega_spark.functions.text import tokens

    tf = (docs.select(F.col(group_col).alias("grp"),
                      F.explode(tokens(text_col)).alias("term"))
          .groupBy("grp", "term")
          .agg(F.count(F.lit(1)).alias("k_g")))
    grp_tot = tf.groupBy("grp").agg(F.sum("k_g").alias("n_g"))
    corpus = tf.groupBy("term").agg(F.sum("k_g").alias("k_all"))
    all_tot = grp_tot.agg(F.sum("n_g").alias("n_all"))
    scored = (tf.join(F.broadcast(grp_tot), "grp")
              .join(corpus, "term")
              .crossJoin(F.broadcast(all_tot))
              .filter(F.col("k_g") >= min_count)
              .withColumn("k_o", F.col("k_all") - F.col("k_g"))
              .withColumn("n_o", F.col("n_all") - F.col("n_g"))
              .withColumn("keyness", F.round(
                  F.log((F.col("k_g") + 0.5)
                        / (F.col("n_g") - F.col("k_g") + 0.5))
                  - F.log((F.col("k_o") + 0.5)
                          / (F.col("n_o") - F.col("k_o") + 0.5)), 6)))
    w = Window.partitionBy("grp").orderBy(F.desc("keyness"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top)
            .select(F.col("grp").alias(group_col), "term", "k_g",
                    "keyness", "rank"))


def drift_psi(df: DataFrame, group_col: str, value_col: str,
              period_col, lo: float, hi: float, n_bins: int = 10,
              eps: float = 1e-6) -> DataFrame:
    """Population Stability Index between two periods, per group:
    PSI = Σ_bins (p_b - q_b) · ln(p_b / q_b) over a fixed equal-width
    binning of ``value_col`` in [lo, hi] (out-of-range clamps to the
    edge bins, so both periods share the exact same support).
    ``period_col`` must be a Column yielding 'base' / 'compare'.
    The standard drift alarm: PSI < 0.1 stable, 0.1-0.25 moderate,
    > 0.25 population shift.

    One partial+final count shuffle at (group, period, bin)
    cardinality — constant-size regardless of SF — then the pivot and
    PSI fold happen on that tiny frame. ``eps`` smoothing keeps empty
    bins finite (same constant on both engines)."""
    w = (hi - lo) / n_bins
    c = F.col(value_col)
    bucket = F.least(
        F.greatest(F.floor((c - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(n_bins - 1)).cast("int")
    counts = (df.select(F.col(group_col).alias("grp"),
                        period_col.alias("period"), bucket.alias("bin"))
              .groupBy("grp", "period", "bin")
              .agg(F.count(F.lit(1)).alias("n")))
    tot = counts.groupBy("grp", "period").agg(F.sum("n").alias("tot"))
    frac = (counts.join(tot, ["grp", "period"])
            .select("grp", "period", "bin",
                    (F.col("n") / F.col("tot")).alias("f")))
    p = frac.filter(F.col("period") == "base") \
        .select("grp", "bin", F.col("f").alias("p"))
    q = frac.filter(F.col("period") == "compare") \
        .select("grp", "bin", F.col("f").alias("q"))
    j = (p.join(q, ["grp", "bin"], "full_outer")
         .select("grp",
                 F.coalesce("p", F.lit(0.0)).alias("p"),
                 F.coalesce("q", F.lit(0.0)).alias("q")))
    term = ((F.col("p") - F.col("q"))
            * F.log((F.col("p") + eps) / (F.col("q") + eps)))
    return (j.groupBy("grp")
            .agg(F.round(F.sum(term), 6).alias("psi"))
            .select(F.col("grp").alias(group_col), "psi"))


def ewma_by_key(df: DataFrame, key_col: str, order_cols: Sequence[str],
                value_col: str, alpha: float = 0.3,
                window_rows: int = 8,
                out_col: str = "ewma") -> DataFrame:
    """Exponentially-weighted moving average per key over a bounded
    trailing ROW frame: ewma = fold over the last ``window_rows``
    values (oldest first) of acc*(1-a) + x*a, seeded with the oldest
    frame value — the recursive EWMA restarted per frame. The bound
    is the scale decision: an UNBOUNDED recursive EWMA is inherently
    sequential per key (no parallel prefix under Spark SQL), while a
    bounded frame keeps this a single hash exchange + per-key sorted
    window, and (1-a)^window_rows of forgotten history is negligible
    for any practical a.

    Deterministic fold order (collect_list over the ordered frame),
    so any engine replays it term for term and reproduces the DOUBLE
    BIT-FOR-BIT (the registry oracle does, via DuckDB's ordered
    window list + list_reduce) — which is why the output is NOT
    rounded: identical bits need no rounding forgiveness, while
    ROUND itself is the one step engines disagree on (Spark rounds
    the shortest decimal repr HALF_UP, DuckDB multiplies by 10^d in
    float — a value like ...6575 at the boundary flips)."""
    from pyspark.sql.window import Window

    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(window_rows - 1), Window.currentRow))
    hist = F.collect_list(F.col(value_col).cast("double")).over(w)
    folded = F.aggregate(
        F.slice(hist, 2, F.greatest(F.size(hist) - 1, F.lit(0))),
        F.element_at(hist, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha))
    return df.withColumn(out_col, folded)


def attribution_touch(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id",
                      touch_types: Sequence[str] = ("view", "click"),
                      conversion_type: str = "purchase") -> DataFrame:
    """Conversion attribution: for every conversion event, the
    FIRST-touch and LAST-touch marketing events strictly before it in
    the user's history. One row per conversion with
    (first/last)_touch_(type, ts, id); conversions with no prior
    touch keep NULLs (direct conversions).

    Plan: ONE hash exchange on the user key — both touches are
    windows over the same (user, time-ordered) partitioning: the
    first touch is an unbounded-preceding min, the last touch an
    unbounded-preceding-to-previous-row last(ignorenulls), each
    carrying a (ts, id, type) struct so the chosen row is atomic
    (same pattern as the as-of join's struct carry)."""
    from pyspark.sql.window import Window

    e = events.select(F.col(user_col).alias("u"),
                      F.col(type_col).alias("t"),
                      F.col(ts_col).alias("ts"),
                      F.col(id_col).alias("id"))
    touch = F.when(F.col("t").isin(*touch_types),
                   F.struct(F.col("ts"), F.col("id"), F.col("t")))
    ordered = Window.partitionBy("u").orderBy("ts", "id")
    prev = ordered.rowsBetween(Window.unboundedPreceding, -1)
    tagged = (e.withColumn("__first",
                           F.min(touch).over(prev))
              .withColumn("__last",
                          F.last(touch, ignorenulls=True).over(prev)))
    conv = tagged.filter(F.col("t") == conversion_type)
    return conv.select(
        F.col("u").alias(user_col),
        F.col("id").alias("conversion_id"),
        F.col("ts").alias("conversion_ts"),
        F.col("__first.t").alias("first_touch_type"),
        F.col("__first.ts").alias("first_touch_ts"),
        F.col("__last.t").alias("last_touch_type"),
        F.col("__last.ts").alias("last_touch_ts"))


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      bucket_expr=None) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-active
    period, counted in every later period they return — the
    (cohort, period_offset, n_active) long-form table behind every
    retention chart.

    Plan: one aggregate finds each user's cohort (min period), one
    distinct pass lists (user, period) activity, and the broadcast-
    joinable user→cohort frame tags it — two keyed shuffles total,
    both on the user id. ``bucket_expr`` maps the timestamp column to
    an integer period (default: epoch-day)."""
    if bucket_expr is None:
        bucket_expr = lambda c: F.floor(c / F.lit(86_400_000_000_000))  # noqa: E731

    e = events.select(F.col(user_col).alias("u"),
                      bucket_expr(F.col(ts_col)).cast("long").alias("p"))
    cohort = e.groupBy("u").agg(F.min("p").alias("cohort"))
    active = e.distinct()
    tagged = active.join(cohort, "u")
    return (tagged.groupBy("cohort",
                           (F.col("p") - F.col("cohort")).alias("offset"))
            .agg(F.count_distinct("u").alias("n_active")))


def top_event_paths(events: DataFrame, user_col: str = "user_id",
                    type_col: str = "event_type", ts_col: str = "ts",
                    id_col: str = "event_id",
                    path_len: int = 3, top_n: int = 20) -> DataFrame:
    """Most common event-type paths: per user, the time-ordered event
    sequence slides into ``path_len``-grams, counted corpus-wide —
    'what do users do next' analysis.

    One hash exchange on the user builds the ordered per-user array
    (collect_list over a sorted window, taken at the last row so
    each user contributes once); the n-gram fan-out is a narrow
    in-row transform; the count is a keyed aggregate on the path
    string; top-n is a bounded TakeOrdered head."""
    from pyspark.sql.window import Window

    w = (Window.partitionBy("u").orderBy("ts", "id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    seq = (events.select(F.col(user_col).alias("u"),
                         F.col(type_col).alias("t"),
                         F.col(ts_col).alias("ts"),
                         F.col(id_col).alias("id"))
           .withColumn("__seq", F.collect_list("t").over(w))
           .withColumn("__rn", F.row_number().over(
               Window.partitionBy("u").orderBy("ts", "id")))
           .filter(F.col("__rn") == 1)
           .select("u", "__seq"))
    n = F.size("__seq")
    n_paths = n - (path_len - 1)
    # sequence(1, 0) DESCENDS in Spark — users with fewer events than
    # path_len must yield an empty array, not indexes [1, 0]
    arr = F.when(n_paths > 0, F.transform(
        F.sequence(F.lit(1), n_paths),
        lambda i: F.array_join(F.slice("__seq", i, path_len), ">"))) \
        .otherwise(F.array().cast("array<string>"))
    grams = seq.select(F.explode(arr).alias("path"))
    return (grams.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("path")).limit(top_n))


def robust_stats(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-group (median, MAD) frame — group-cardinality rows, the
    broadcastable baseline for :func:`robust_anomalies` and for
    streaming scoring (compute once on the batch table, stream-static
    join it against live events)."""
    k = F.col(key_col)
    med = (df.groupBy(k.alias("__k"))
           .agg(F.expr(f"percentile({value_col}, 0.5)").alias("__med")))
    j = df.join(F.broadcast(med), k == F.col("__k")).drop("__k")
    return (j.groupBy(k.alias(key_col))
            .agg(F.first("__med").alias("med"),
                 F.expr(f"percentile(abs({value_col} - __med), 0.5)")
                 .alias("mad")))


def robust_anomalies(df: DataFrame, key_col: str, value_col: str,
                     id_cols: list[str], z_thresh: float = 3.5,
                     round_dp: int = 3) -> DataFrame:
    """Robust per-group outlier detection: flag rows whose value is
    more than ``z_thresh`` robust z-scores (0.6745·|x−med|/MAD —
    Iglewicz-Hoaglin) from the group median. Median/MAD, not
    mean/stddev, so a burst of bad rows can't drag the baseline
    toward itself — the standard data-quality screen before training
    ingestion.

    Plan: two keyed aggregates build the per-group (median, MAD)
    frame — group-cardinality rows, broadcast-joined back onto the
    data (AQE picks broadcast while it fits); the fact table is
    scanned twice but never shuffled on a non-key, and the exact
    ``percentile`` aggregate is a per-group sort of that group only
    (keyed exchange, no global order). Output is only the flagged
    rows — result stays tiny even at 100 TB input."""
    v, k = F.col(value_col), F.col(key_col)
    med = (df.groupBy(k.alias("__k"))
           .agg(F.expr(f"percentile({value_col}, 0.5)").alias("__med")))
    j = df.join(F.broadcast(med), k == F.col("__k")).drop("__k")
    mad = (j.groupBy(k.alias("__k"))
           .agg(F.expr(f"percentile(abs({value_col} - __med), 0.5)")
                .alias("__mad")))
    out = (j.join(F.broadcast(mad), k == F.col("__k")).drop("__k")
           .withColumn("robust_z",
                       F.when(F.col("__mad") > 0,
                              F.round(0.6745 * (v - F.col("__med"))
                                      / F.col("__mad"), round_dp))))
    return (out.filter(F.abs(F.col("robust_z")) > z_thresh)
            .select(*id_cols, key_col, value_col, "robust_z"))


def hourly_spikes(events: DataFrame, type_col: str = "event_type",
                  ts_col: str = "ts", round_dp: int = 3) -> DataFrame:
    """Time-series spike scores: per (event type, hour) the activity
    count and its z-score against that type's own hourly mean/stddev
    — the trending/burst-detection primitive (a monitoring table, or
    a 'suddenly-popular n-gram' screen at corpus scale).

    Plan: one keyed aggregate to the hourly grid (cardinality
    types×hours — already tiny relative to events), one per-type
    mean/stddev rollup over that grid, broadcast-joined back. The
    event table is touched exactly once."""
    hourly = (events.groupBy(F.col(type_col).alias("event_type"),
                             F.date_trunc("hour", F.col(ts_col))
                             .alias("hour"))
              .agg(F.count(F.lit(1)).alias("n")))
    stats = (hourly.groupBy(F.col("event_type").alias("__t"))
             .agg(F.avg("n").alias("__mu"),
                  F.stddev_samp(F.col("n").cast("double"))
                  .alias("__sd")))
    return (hourly.join(F.broadcast(stats),
                        F.col("event_type") == F.col("__t"))
            .select("event_type", "hour", "n",
                    F.when(F.col("__sd") > 0,
                           F.round((F.col("n") - F.col("__mu"))
                                   / F.col("__sd"), round_dp))
                    .alias("spike_z")))


def association_rules(df: DataFrame, basket_col: str, item_col: str,
                      min_count: int = 2, max_basket: int = 200,
                      round_dp: int = 6) -> DataFrame:
    """Market-basket association rules over frequent 2-itemsets:
    for every directed rule a→b with ≥ ``min_count`` shared baskets,
    support = P(a,b), confidence = P(b|a), lift = P(a,b)/(P(a)P(b)).
    The classic curation screen for always-co-occurring boilerplate.

    Plan (r9 opt round, guide §2.4 — one scan, one basket exchange):
    the grouped ``_basket_items`` frame feeds the pair fan-out, the
    item supports (explode of the uncapped per-basket item set — the
    same distinct (b, i) multiset the old ``df.distinct()`` pass
    re-derived with a second scan + exchange) and the basket total
    (count of groups == count of distinct baskets). Equivalence note:
    ``collect_set`` drops NULL items, so ``item_n`` loses any NULL
    row the old distinct-based frame carried — but NULL never matches
    the ante/cons equi-joins below, so the OUTPUT is row-identical.
    Both small frames join back as broadcast sides; the big table is
    never shuffled beyond the basket grouping, and both rule
    directions fan out narrowly from one pass over the pair frame
    (was a 2-branch union re-reading it)."""
    grouped = _basket_items(df, basket_col, item_col)
    pairs = _pairs_from_items(grouped, min_count, max_basket)
    item_n = (grouped.select(F.explode("items_all").alias("item"))
              .groupBy("item").agg(F.count(F.lit(1)).alias("n_item")))
    # this branch intentionally keeps its own subtree: Catalyst
    # prunes the collect_set out of a bare count-of-groups (count of
    # a non-nullable column rewrites to count(1) too), so its basket
    # exchange can never match the shared one — but the pruned shape
    # is a ONE-column (basket key) scan + distinct-count, far cheaper
    # than forcing reuse via an eager checkpoint of the corpus-sized
    # grouped frame (verified on the executed sf0.1 plan: the pairs
    # and item_n branches share one full scan via ReusedExchange,
    # this branch is the only other scan and reads just ``b``).
    total = grouped.agg(F.count(F.lit(1)).alias("__N"))
    # both directions: (a→b) and (b→a) share the same pair count
    directed = (pairs.select(F.explode(F.array(
        F.struct(F.col("item_a").alias("ante"),
                 F.col("item_b").alias("cons"),
                 F.col("n_baskets").alias("n_baskets")),
        F.struct(F.col("item_b").alias("ante"),
                 F.col("item_a").alias("cons"),
                 F.col("n_baskets").alias("n_baskets"))))
        .alias("__d"))
        .select("__d.ante", "__d.cons", "__d.n_baskets"))
    out = (directed
           .join(F.broadcast(item_n.withColumnRenamed("item", "ante")
                             .withColumnRenamed("n_item", "n_ante")),
                 "ante")
           .join(F.broadcast(item_n.withColumnRenamed("item", "cons")
                             .withColumnRenamed("n_item", "n_cons")),
                 "cons")
           .crossJoin(F.broadcast(total)))
    nb = F.col("n_baskets").cast("double")
    return out.select(
        "ante", "cons", "n_baskets",
        F.round(nb / F.col("__N"), round_dp).alias("support"),
        F.round(nb / F.col("n_ante"), round_dp).alias("confidence"),
        F.round(nb * F.col("__N")
                / (F.col("n_ante").cast("double") * F.col("n_cons")),
                round_dp).alias("lift"))


def item_item_neighbors(df: DataFrame, basket_col: str, item_col: str,
                        k: int = 3, min_count: int = 2,
                        max_basket: int = 200,
                        round_dp: int = 6) -> DataFrame:
    """Item-item collaborative filtering: top-``k`` nearest neighbors
    per item by co-occurrence cosine n_ab/√(n_a·n_b) — the
    'users who took a also took b' recommender table, and at corpus
    scale a related-documents index.

    Plan: reuses the narrow pair fan-out; the per-item top-k is a
    window PARTITIONED by the item (per-key heap, no global sort).
    Ties break on the neighbor id so the result is deterministic.
    r9 opt round (guide §2.4): item supports come from the SAME
    grouped basket frame as the pairs (one scan + one exchange of
    the fact table — the old ``df.distinct()`` support pass was a
    second scan; NULL items dropped by ``collect_set`` never match
    the item/neighbor equi-joins, so output is row-identical), and
    both pair directions fan out narrowly from one pass over the
    pair frame (was a 2-branch union re-reading it)."""
    from pyspark.sql.window import Window

    grouped = _basket_items(df, basket_col, item_col)
    pairs = _pairs_from_items(grouped, min_count, max_basket)
    item_n = (grouped.select(F.explode("items_all").alias("item"))
              .groupBy("item").agg(F.count(F.lit(1)).alias("n_item")))
    directed = (pairs.select(F.explode(F.array(
        F.struct(F.col("item_a").alias("item"),
                 F.col("item_b").alias("neighbor"),
                 F.col("n_baskets").alias("n_baskets")),
        F.struct(F.col("item_b").alias("item"),
                 F.col("item_a").alias("neighbor"),
                 F.col("n_baskets").alias("n_baskets"))))
        .alias("__d"))
        .select("__d.item", "__d.neighbor", "__d.n_baskets"))
    scored = (directed
              .join(F.broadcast(item_n), "item")
              .join(F.broadcast(item_n
                                .withColumnRenamed("item", "neighbor")
                                .withColumnRenamed("n_item", "n_nb")),
                    "neighbor")
              .withColumn("cosine",
                          F.col("n_baskets")
                          / F.sqrt(F.col("n_item").cast("double")
                                   * F.col("n_nb"))))
    w = Window.partitionBy("item").orderBy(F.desc("cosine"),
                                           F.asc("neighbor"))
    return (scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .select("item", "neighbor", "n_baskets",
                    F.round("cosine", round_dp).alias("cosine"),
                    F.col("__rk").alias("rank")))


def seasonal_naive_backtest(events: DataFrame,
                            type_col: str = "event_type",
                            ts_col: str = "ts",
                            season_hours: int = 24,
                            round_dp: int = 4) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hour's activity
    count with the count one season (default 24 h) earlier and score
    MAE per event type over hours where both sides exist — the
    sanity baseline every fancier forecaster must beat.

    Plan: one keyed aggregate to the hourly grid, then a self-join of
    that (already tiny) grid shifted by the season, then a per-type
    rollup — the raw event table is aggregated before anything
    quadratic-ish happens."""
    hourly = (events.groupBy(F.col(type_col).alias("event_type"),
                             F.date_trunc("hour", F.col(ts_col))
                             .alias("hour"))
              .agg(F.count(F.lit(1)).alias("n")))
    pred = hourly.select(
        "event_type",
        (F.col("hour") + F.expr(f"INTERVAL {season_hours} HOURS"))
        .alias("hour"),
        F.col("n").alias("pred"))
    joined = hourly.join(pred, ["event_type", "hour"])
    return (joined.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_hours"),
                 F.round(F.avg(F.abs(F.col("n") - F.col("pred"))
                               .cast("double")), round_dp).alias("mae")))


def hourly_trend(events: DataFrame, type_col: str = "event_type",
                 ts_col: str = "ts", round_dp: int = 6) -> DataFrame:
    """Per-key linear activity trend: closed-form OLS of hourly event
    counts against the hour index — slope in events/hour², the
    is-this-growing signal behind every monitoring dashboard.

    Determinism at any scale: the hour index is RECENTERED to each
    key's first active hour, so every OLS sum (Σx, Σx², Σxy) is an
    exact small integer — no int64 overflow at decade-long spans, no
    float summation-order noise, and any engine replays it bit-for-
    bit (the one division happens last). Plan: one pass to the hourly
    grid, a per-key min broadcast back, one per-key aggregate.
    ``slope`` is NULL for keys with a single active hour."""
    hourly = (events.groupBy(F.col(type_col).alias("event_type"),
                             (F.unix_timestamp(F.col(ts_col))
                              .cast("long") / 3600).cast("long")
                             .alias("xh"))
              .agg(F.count(F.lit(1)).alias("y")))
    x0 = hourly.groupBy(F.col("event_type").alias("__t")) \
        .agg(F.min("xh").alias("x0"))
    c = (hourly.join(F.broadcast(x0),
                     F.col("event_type") == F.col("__t"))
         .select("event_type", (F.col("xh") - F.col("x0")).alias("x"),
                 "y"))
    s = (c.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("x") * F.col("y")).alias("sxy")))
    num = s["n"] * s["sxy"] - s["sx"] * s["sy"]
    den = s["n"] * s["sxx"] - s["sx"] * s["sx"]
    slope = F.when(den != 0,
                   num.cast("double") / den.cast("double"))
    return s.select(
        "event_type", F.col("n").alias("n_hours"),
        F.round(slope, round_dp).alias("slope"),
        F.round((F.col("sy").cast("double") - slope
                 * F.col("sx").cast("double")) / F.col("n"), round_dp)
        .alias("intercept"))


def category_diversity(df: DataFrame, group_col: str, cat_col: str,
                       round_dp: int = 6) -> DataFrame:
    """Diversity report per group: category count, Shannon entropy
    (nats) and Simpson index (1 − Σp²) of the category distribution —
    the corpus-composition numbers (how language-diverse is each
    source?) every data card quotes.

    Plan: one pass to (group, category) counts; both indices fold on
    that tiny frame from exact integer counts (one division + one log
    per category — engine-replayable). Two keyed aggregates total."""
    cells = (df.groupBy(F.col(group_col).alias("grp"),
                        F.col(cat_col).alias("cat"))
             .agg(F.count(F.lit(1)).alias("c")))
    tot = cells.groupBy(F.col("grp").alias("__g")) \
        .agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (cells.join(F.broadcast(tot), F.col("grp") == F.col("__g"))
            .groupBy(F.col("grp").alias(group_col))
            .agg(F.first("n").alias("n"),
                 F.count(F.lit(1)).alias("n_cats"),
                 F.round(-F.sum(p * F.log(p)), round_dp)
                 .alias("shannon_nats"),
                 F.round(1.0 - F.sum(p * p), round_dp)
                 .alias("simpson")))


def holt_linear_forecast(events: DataFrame, type_col: str = "event_type",
                         ts_col: str = "ts", value_col: str = "value",
                         alpha: float = 0.5, beta: float = 0.25,
                         horizon: int = 3,
                         round_dp: int = 6) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) of each
    key's hourly value series, with an h-step-ahead forecast — the
    seasonal-naive backtest's trend-aware sibling for capacity
    planning dashboards.

    The recursion l' = α·x + (1−α)(l+b), b' = β(l'−l) + (1−β)b is
    inherently sequential PER KEY, so it runs as a deterministic fold
    over the key's ORDERED hourly grid (bounded: hours, not rows) —
    never over raw events. Hourly sums are exact integer cents, the
    smoothing constants are binary-exact (.5/.25 by default), and the
    fold order is fixed, so every engine performs the identical IEEE
    op sequence and reproduces level/trend bit-for-bit. Keys with a
    single active hour are dropped (no trend seed). Plan: one pass to
    the hourly grid (keyed exchange) → per-key sorted-list fold on
    the grid frame."""
    hourly = (events.groupBy(F.col(type_col).alias("event_type"),
                             (F.unix_timestamp(F.col(ts_col))
                              .cast("long") / 3600).cast("long")
                              .alias("xh"))
              .agg(F.sum(F.round(F.col(value_col) * 100, 0)
                         .cast("long")).alias("y")))
    series = (hourly.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n_hours"),
                   F.transform(
                       F.sort_array(F.collect_list(F.struct("xh", "y"))),
                       lambda s: s["y"]).alias("xs"))
              .filter(F.col("n_hours") >= 2))
    a, b1 = float(alpha), float(beta)
    # seed at the SECOND point: l=x₁, b=x₁−x₀ — the init that makes
    # Holt exact on a perfectly linear series (pinned by unit test)
    init = F.struct(
        F.element_at(F.col("xs"), 2).cast("double").alias("l"),
        (F.element_at(F.col("xs"), 2)
         - F.element_at(F.col("xs"), 1)).cast("double").alias("b"))

    def step(acc, x):
        l_new = F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (F.lit(b1) * (l_new - acc["l"])
             + F.lit(1.0 - b1) * acc["b"]).alias("b"))

    folded = F.aggregate(
        F.slice(F.col("xs"), 3,
                F.greatest(F.size(F.col("xs")) - 2, F.lit(0))),
        init, step)
    return (series.select("event_type", "n_hours",
                          folded["l"].alias("__l"),
                          folded["b"].alias("__b"))
            .select("event_type", "n_hours",
                    F.round(F.col("__l") / 100.0, round_dp)
                    .alias("level"),
                    F.round(F.col("__b") / 100.0, round_dp)
                    .alias("trend"),
                    F.round((F.col("__l")
                             + F.lit(float(horizon)) * F.col("__b"))
                            / 100.0, round_dp).alias("forecast_h3"))
            .orderBy("event_type"))


def markov_transitions(events: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts", type_col: str = "event_type",
                       id_col: str = "event_id",
                       round_dp: int = 6) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next event type | current) with exact pair counts —
    the model behind next-action prediction, funnel leak analysis and
    session simulation. Deterministic sequencing: events are ordered
    per user by (ts, id) — the id tiebreak makes the lead() pairing
    reproducible under timestamp collisions on any engine.

    Plan: ONE per-user window pass (hash exchange on user — the same
    partitioning every sessionization op uses) to form (cur, next)
    pairs, then a keyed count onto the bounded |types|² matrix; the
    probability normalization folds on that tiny frame."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (events
             .withColumn("__next", F.lead(type_col).over(w))
             .filter(F.col("__next").isNotNull())
             .groupBy(F.col(type_col).alias("cur"),
                      F.col("__next").alias("next"))
             .agg(F.count(F.lit(1)).alias("n")))
    tot = pairs.groupBy(F.col("cur").alias("__c")) \
        .agg(F.sum("n").alias("tot"))
    return (pairs.join(F.broadcast(tot), F.col("cur") == F.col("__c"))
            .select("cur", "next", "n",
                    F.round(F.col("n").cast("double") / F.col("tot"),
                            round_dp).alias("p"))
            .orderBy("cur", "next"))


def hourly_autocorrelation(events: DataFrame,
                           type_col: str = "event_type",
                           ts_col: str = "ts",
                           lags: Sequence[int] = (1, 2, 3),
                           round_dp: int = 6) -> DataFrame:
    """Autocorrelation of each key's hourly event-count series at the
    given lags — the is-there-a-cycle screen (r₂₄ ≈ daily
    seasonality) that decides whether the seasonal-naive or trend
    forecaster applies to a stream.

    r_k = Σ(y_t−ȳ)(y_{t+k}−ȳ) / Σ(y_t−ȳ)², expanded so every
    data-sized sum is an EXACT integer (Σy, Σy², and per-lag pair
    sums Σy_t·y_{t+k}, Σ'y_t, Σ'y_{t+k}); ȳ enters only in the final
    constant-count float combination, so any engine replays the value
    bit-for-bit. Missing hours are absent (not zero-filled): a pair
    exists only when both hours were active.

    Plan: one pass to the hourly grid; the lag pairing is ONE
    equi-join of the grid with itself shifted (lag exploded on the
    probe side — |lags|× a bounded frame, not the raw data); per-key
    totals broadcast back. Keys×lags output rows."""
    hourly = (events.groupBy(F.col(type_col).alias("event_type"),
                             (F.unix_timestamp(F.col(ts_col))
                              .cast("long") / 3600).cast("long")
                             .alias("xh"))
              .agg(F.count(F.lit(1)).alias("y")))
    tot = (hourly.groupBy(F.col("event_type").alias("__t"))
           .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy"),
                F.sum(F.col("y") * F.col("y")).alias("syy")))
    probe = hourly.select(
        F.col("event_type").alias("__t2"), F.col("xh").alias("xh2"),
        F.col("y").alias("yk"),
        F.explode(F.array(*[F.lit(int(k)) for k in lags])).alias("k"))
    pairs = (hourly.join(
        probe, (F.col("event_type") == F.col("__t2"))
        & (F.col("xh") + F.col("k") == F.col("xh2")))
        .groupBy("event_type", "k")
        .agg(F.count(F.lit(1)).alias("m"),
             F.sum(F.col("y") * F.col("yk")).alias("sxy"),
             F.sum("y").alias("sa"), F.sum("yk").alias("sb")))
    ybar = F.col("sy").cast("double") / F.col("n")
    num = (F.col("sxy").cast("double") - ybar * F.col("sa")
           - ybar * F.col("sb") + F.col("m") * ybar * ybar)
    den = F.col("syy").cast("double") - F.col("n") * ybar * ybar
    return (pairs.join(F.broadcast(tot), F.col("event_type") == F.col("__t"))
            .select("event_type", F.col("k").alias("lag"),
                    F.col("m").alias("n_pairs"),
                    F.round(F.when(den != 0.0, num / den), round_dp)
                    .alias("acf"))
            .orderBy("event_type", "lag"))


def cusum_changepoint(events: DataFrame, type_col: str = "event_type",
                      ts_col: str = "ts",
                      round_dp: int = 6) -> DataFrame:
    """CUSUM mean-shift screen per key: the standardized maximum
    |cumulative deviation| of the hourly count series, and the hour
    where it peaks — the classic did-the-level-change detector for
    ingest monitoring (large statistic ⇒ a sustained shift, and the
    argmax hour is the change point).

    Determinism: cum_i = Σ_{t≤i}y_t − i·ȳ is computed as the exact
    integer n·run_i − i·Σy (scaled by n), so the argmax — including
    ties, broken toward the earliest hour — is integer-exact on any
    engine; the final statistic max|cum|/(σ̂√n) does its few float ops
    last. Plan: one pass to the hourly grid, a per-key ORDERED window
    on that bounded grid (partitioned by key — hours per key, not
    rows), per-key totals broadcast, one arg-max aggregate."""
    from pyspark.sql.window import Window

    hourly = (events.groupBy(F.col(type_col).alias("event_type"),
                             (F.unix_timestamp(F.col(ts_col))
                              .cast("long") / 3600).cast("long")
                             .alias("xh"))
              .agg(F.count(F.lit(1)).alias("y")))
    tot = (hourly.groupBy(F.col("event_type").alias("__t"))
           .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy"),
                F.sum(F.col("y") * F.col("y")).alias("syy")))
    w = Window.partitionBy("event_type").orderBy("xh")
    run = (hourly
           .withColumn("run", F.sum("y").over(w))
           .withColumn("i", F.row_number().over(w)))
    j = run.join(F.broadcast(tot), F.col("event_type") == F.col("__t"))
    scaled = j.select(
        "event_type", "xh", "n", "sy", "syy",
        (F.col("n") * F.col("run") - F.col("i") * F.col("sy"))
        .alias("cum_n"))
    best = (scaled
            .groupBy("event_type")
            .agg(F.first("n").alias("n_hours"),
                 F.first("sy").alias("sy"), F.first("syy").alias("syy"),
                 F.max(F.struct(F.abs(F.col("cum_n")).alias("a"),
                                (-F.col("xh")).alias("negh"))).alias("b")))
    ybar = F.col("sy").cast("double") / F.col("n_hours")
    var = (F.col("syy").cast("double")
           - F.col("n_hours") * ybar * ybar) / F.col("n_hours")
    stat = (F.col("b")["a"].cast("double") / F.col("n_hours")
            / (F.sqrt(var) * F.sqrt(F.col("n_hours").cast("double"))))
    return (best.filter(var > 0)
            .select("event_type", "n_hours",
                    (-F.col("b")["negh"]).alias("cp_hour"),
                    F.round(stat, round_dp).alias("cusum_stat"))
            .orderBy("event_type"))


def kaplan_meier(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type",
                 convert_type: str = "purchase",
                 unit_seconds: int = 3600,
                 round_dp: int = 6) -> DataFrame:
    """Kaplan–Meier time-to-conversion curve: each user is observed
    from their first event until their first ``convert_type`` event
    (an observed conversion) or the end of the data (right-censored,
    no conversion yet). S(t) steps down by (1 − d/n) at every
    conversion duration — the survival estimate that, unlike a naive
    conversion-rate-by-bucket, stays unbiased when the observation
    window cuts users off mid-journey.

    Plan: one pass to per-user (first event, first conversion) via
    conditional MINs; the duration table is BOUNDED by the time span
    in ``unit_seconds`` units, so the inherently-ordered risk-set
    recursion runs as a deterministic in-memory fold (sorted array +
    ``F.aggregate``) over that tiny frame — no global window, no
    driver collect. The product is a fixed-order float chain both
    engines replay to 6 dp (oracle uses exp-Σln with an explicit
    zero-factor guard). Output: one row per conversion duration with
    the at-risk count, conversion count and survival."""
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    u = (events.groupBy(F.col(user_col).alias("u"))
         .agg(F.min(sec).alias("t0"),
              F.min(F.when(F.col(type_col) == convert_type, sec))
              .alias("tc")))
    gmax = events.agg(F.max(sec).alias("gmax"))
    lab = (u.crossJoin(F.broadcast(gmax))
           .select(((F.coalesce(F.col("tc"), F.col("gmax"))
                     - F.col("t0")) / unit_seconds).cast("long")
                   .alias("dur"),
                   F.when(F.col("tc").isNotNull(), 1)
                   .otherwise(0).alias("obs")))
    t = (lab.groupBy("dur")
         .agg(F.sum("obs").alias("d"),
              F.sum(F.lit(1) - F.col("obs")).alias("c")))
    packed = t.agg(
        F.sum(F.col("d") + F.col("c")).alias("n0"),
        F.sort_array(F.collect_list(F.struct("dur", "d", "c")))
        .alias("arr"))
    # ordered fold over the bounded curve: carry (at-risk, survival,
    # rows-so-far); each step multiplies in this duration's factor
    # BEFORE removing its deaths+censored from the risk set
    init = F.struct(
        F.col("n0").alias("risk"), F.lit(1.0).alias("s"),
        F.array().cast(
            "array<struct<dur:bigint,n_risk:bigint,d:bigint,s:double>>")
        .alias("out"))

    def step(acc, x):
        s_new = acc["s"] * ((acc["risk"] - x["d"]).cast("double")
                            / acc["risk"].cast("double"))
        row = F.struct(x["dur"].alias("dur"), acc["risk"].alias("n_risk"),
                       x["d"].alias("d"), s_new.alias("s"))
        return F.struct(
            (acc["risk"] - x["d"] - x["c"]).alias("risk"),
            s_new.alias("s"),
            F.concat(acc["out"], F.array(row)).alias("out"))

    folded = packed.select(
        F.explode(F.aggregate(F.col("arr"), init, step)["out"])
        .alias("r"))
    return (folded
            .select(F.col("r.dur").alias("dur_units"),
                    F.col("r.n_risk").alias("n_risk"),
                    F.col("r.d").alias("n_converted"),
                    F.round(F.col("r.s"), round_dp).alias("survival"))
            .filter(F.col("n_converted") > 0)
            .orderBy("dur_units"))


def user_growth(events: DataFrame, user_col: str = "user_id",
                ts_col: str = "ts") -> DataFrame:
    """Daily user growth: new users (first ever appearance) and the
    running cumulative total per day — the north-star growth chart.
    Plan: one keyed MIN per user (the only data-sized shuffle), one
    count onto the bounded day frame; the cumulative sum is the same
    bounded in-memory fold Kaplan-Meier uses (sorted array +
    ``F.aggregate``) — no global window, exact integers end to
    end."""
    day = (F.unix_timestamp(F.col(ts_col)).cast("long") / 86400) \
        .cast("long")
    first = (events.groupBy(F.col(user_col).alias("u"))
             .agg(F.min(day).alias("d0")))
    daily = first.groupBy(F.col("d0").alias("day")) \
        .agg(F.count(F.lit(1)).alias("new_users"))
    packed = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "new_users")))
        .alias("arr"))
    init = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.array().cast(
            "array<struct<day:bigint,new_users:bigint,cum:bigint>>")
        .alias("out"))

    def step(acc, x):
        c = acc["cum"] + x["new_users"]
        row = F.struct(x["day"].alias("day"),
                       x["new_users"].alias("new_users"),
                       c.alias("cum"))
        return F.struct(c.alias("cum"),
                        F.concat(acc["out"], F.array(row)).alias("out"))

    folded = packed.select(
        F.explode(F.aggregate(F.col("arr"), init, step)["out"])
        .alias("r"))
    return (folded.select(F.col("r.day").alias("day"),
                          F.col("r.new_users").alias("new_users"),
                          F.col("r.cum").alias("cum_users"))
            .orderBy("day"))


def temporal_join_scd2(facts: DataFrame, dim: DataFrame, key: str,
                       fact_ts_col: str, valid_from_col: str = "valid_from",
                       valid_to_col: str = "valid_to",
                       how: str = "left") -> DataFrame:
    """Temporal (point-in-time) join: attach to each fact row the
    dimension version whose validity interval contains the fact
    timestamp — the SCD2 consumer every warehouse query 'as of
    transaction time' needs. Open-ended current versions
    (``valid_to`` NULL) match everything from ``valid_from`` on.

    Plan: a keyed EQUI-join on the entity key (one shuffle, AQE/
    broadcast eligible) with the interval predicate as a join filter
    — correct because SCD2 versions per key are non-overlapping, so
    at most one version matches and fan-out is bounded by versions
    per entity, never |facts|x|dim|. The degenerate interval-only
    join (no entity key) is the range-join problem — use
    operators/joins.range_join's bucketing instead."""
    d = dim.select(F.col(key).alias("__k"),
                   F.col(valid_from_col).alias("__vf"),
                   F.col(valid_to_col).alias("__vt"),
                   *[c for c in dim.columns
                     if c not in (key, valid_from_col, valid_to_col)])
    cond = ((facts[key] == d["__k"])
            & (d["__vf"] <= facts[fact_ts_col])
            & (d["__vt"].isNull()
               | (facts[fact_ts_col] < d["__vt"])))
    return facts.join(d, cond, how).drop("__k", "__vf", "__vt")


def rfm_segments(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 r_days: tuple[int, int, int] = (2, 7, 14),
                 f_n: tuple[int, int, int] = (100, 300, 500),
                 m_cents: tuple[int, int, int] = (500_000, 1_500_000,
                                                  3_000_000),
                 ) -> DataFrame:
    """RFM segmentation: score every user 1-4 on Recency (days since
    last event), Frequency (event count) and Monetary (total value,
    exact cents) against FIXED thresholds, then count users per
    (r, f, m) cell — the marketing-standard customer grid. Fixed
    thresholds (not per-batch quantiles) keep segments comparable
    across runs and the computation deterministic on any engine.

    Plan: one keyed aggregate per user (the only data-sized shuffle),
    max-day broadcast back, scores are pure integer comparisons, and
    the final rollup lands on the ≤64-cell grid."""
    day = (F.unix_timestamp(F.col(ts_col)).cast("long") / 86400) \
        .cast("long")
    u = (events.groupBy(F.col(user_col).alias("u"))
         .agg(F.max(day).alias("last_d"),
              F.count(F.lit(1)).alias("f"),
              F.sum(F.round(F.col(value_col) * 100, 0).cast("long"))
              .alias("m")))
    gmax = u.agg(F.max("last_d").alias("gmax"))

    def score(c: F.Column, t1, t2, t3, reverse: bool = False):
        if reverse:  # smaller is better (recency)
            return (F.when(c <= t1, 4).when(c <= t2, 3)
                    .when(c <= t3, 2).otherwise(1))
        return (F.when(c >= t3, 4).when(c >= t2, 3)
                .when(c >= t1, 2).otherwise(1))

    scored = (u.crossJoin(F.broadcast(gmax))
              .select(score(F.col("gmax") - F.col("last_d"),
                            *r_days, reverse=True).alias("r_score"),
                      score(F.col("f"), *f_n).alias("f_score"),
                      score(F.col("m"), *m_cents).alias("m_score"),
                      F.col("m")))
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.round(F.sum("m") / 100.0, 2).alias("total_value"))
            .orderBy("r_score", "f_score", "m_score"))


def active_time_per_user(events: DataFrame, user_col: str = "user_id",
                         ts_col: str = "ts", gap: str = "5 minutes",
                         gap_us: int = 300_000_000) -> DataFrame:
    """Total ACTIVE time per user: activity windows (each event keeps
    the user active for ``gap``) merged where they overlap, summed —
    the interval-union (gaps-and-islands coverage) metric real
    engagement dashboards use instead of raw event counts, which
    double-count bursts.

    ``session_window`` does the merge in one keyed pass (same single
    exchange as sessionization); window bounds are exact integer µs,
    so the per-user totals replay on any engine. Output: (user,
    n_sessions, active_s) with active_s = Σ(end − start) in whole
    seconds, each window ending ``gap`` after its last event."""
    s = (events.groupBy(F.session_window(ts_col, gap).alias("w"),
                        F.col(user_col))
         .agg(F.count(F.lit(1)).alias("n")))
    dur_us = (F.unix_micros(F.col("w.end"))
              - F.unix_micros(F.col("w.start")))
    return (s.groupBy(user_col)
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 (F.sum(dur_us) / 1_000_000).cast("long")
                 .alias("active_s"))
            .orderBy(user_col))


def funnel_time_boxed(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_us_col: str = "ts_us",
                      stages: tuple[str, str, str] = ("view", "click",
                                                      "purchase"),
                      deadlines_us: tuple[int, int] = (3_600_000_000,
                                                       86_400_000_000),
                      ) -> DataFrame:
    """Time-boxed funnel: stage 2 must follow the user's first stage-1
    event within ``deadlines_us[0]``, stage 3 within
    ``deadlines_us[1]`` of that stage-2 event — the conversion-window
    discipline real funnels need (an attribution click a week later
    doesn't count). Timestamps are integer µs so every deadline
    comparison is exact on any engine.

    Same single-exchange shape as :func:`funnel_stages`: three
    chained conditional MINs over one user-partitioned window, then
    a per-user collapse reusing the partitioning."""
    from pyspark.sql.window import Window

    s1, s2, s3 = stages
    d1, d2 = deadlines_us
    e = events.select(F.col(user_col).alias("u"),
                      F.col(type_col).alias("t"),
                      F.col(ts_us_col).alias("ts"))
    w = Window.partitionBy("u")
    staged = (e
              .withColumn("t1", F.min(F.when(F.col("t") == s1,
                                             F.col("ts"))).over(w))
              .withColumn("t2", F.min(F.when(
                  (F.col("t") == s2) & (F.col("ts") > F.col("t1"))
                  & (F.col("ts") <= F.col("t1") + d1),
                  F.col("ts"))).over(w))
              .withColumn("t3", F.min(F.when(
                  (F.col("t") == s3) & (F.col("ts") > F.col("t2"))
                  & (F.col("ts") <= F.col("t2") + d2),
                  F.col("ts"))).over(w)))
    per_user = staged.groupBy("u").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"),
        F.first("t3").alias("t3"))
    return per_user.agg(
        F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0))
        .alias("n_stage1"),
        F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0))
        .alias("n_stage2_within"),
        F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0))
        .alias("n_stage3_within"))


def dau_wau(events: DataFrame, user_col: str = "user_id",
            ts_col: str = "ts", window_days: int = 7,
            round_dp: int = 6) -> DataFrame:
    """Exact DAU / WAU per day plus stickiness (dau/wau) — the
    engagement headline. Rolling DISTINCT is the op sliding windows
    can't do with a sum, so it's computed exactly by the presence
    fan-out: collapse to distinct (user, day) presence (one keyed
    exchange, bounded by users×days), then each presence row votes
    into the ``window_days`` windows that end on day d..d+6 (a
    narrow ×7 explode of the bounded frame), and WAU(d) is a count
    DISTINCT user per window-end day. New users come from the same
    presence frame via first-day MINs. All exact integers; one
    division for stickiness."""
    day = (F.unix_timestamp(F.col(ts_col)).cast("long") / 86400) \
        .cast("long")
    pres = (events.select(F.col(user_col).alias("u"), day.alias("d"))
            .distinct())
    dau = pres.groupBy(F.col("d").alias("day")) \
        .agg(F.count(F.lit(1)).alias("dau"))
    votes = pres.select(
        "u", F.explode(F.sequence(
            F.col("d"), F.col("d") + (window_days - 1))).alias("day"))
    wau = (votes.groupBy("day")
           .agg(F.count_distinct("u").alias("wau")))
    first = (pres.groupBy("u").agg(F.min("d").alias("d0"))
             .groupBy(F.col("d0").alias("day"))
             .agg(F.count(F.lit(1)).alias("new_users")))
    # inner-joining on dau keeps only observed days, which also drops
    # the partial windows that end beyond the last day of data
    return (dau.join(wau, "day")
            .join(first, "day", "left")
            .select("day", "dau", "wau",
                    F.coalesce(F.col("new_users"), F.lit(0))
                    .alias("new_users"),
                    F.round(F.col("dau").cast("double") / F.col("wau"),
                            round_dp).alias("stickiness"))
            .orderBy("day"))


def activity_heatmap(events: DataFrame, ts_col: str = "ts",
                     round_dp: int = 6) -> DataFrame:
    """Day-of-week × hour-of-day activity heat map with each cell's
    share of total traffic — the seasonality fingerprint read before
    choosing window sizes or forecast seasons. One pass to the 168
    cells; the share division happens on that bounded frame. Uses
    epoch arithmetic for dow (1970-01-01 was a Thursday: dow 0 =
    Monday) so both engines agree without timezone/locale lookups."""
    day = (F.unix_timestamp(F.col(ts_col)).cast("long") / 86400) \
        .cast("long")
    dow = (day + 3) % 7
    hod = ((F.unix_timestamp(F.col(ts_col)).cast("long") / 3600)
           .cast("long")) % 24
    cells = (events.groupBy(dow.alias("dow"), hod.alias("hod"))
             .agg(F.count(F.lit(1)).alias("n")))
    tot = cells.agg(F.sum("n").alias("t"))
    return (cells.crossJoin(F.broadcast(tot))
            .select("dow", "hod", "n",
                    F.round(F.col("n").cast("double") / F.col("t"),
                            round_dp).alias("share"))
            .orderBy("dow", "hod"))


def session_depth_stats(events: DataFrame, user_col: str = "user_id",
                        ts_col: str = "ts", gap: str = "30 minutes",
                        round_dp: int = 6) -> DataFrame:
    """Session depth distribution + bounce rate: sessions (gap-based)
    bucketed by how many events they contain — depth 1 is a bounce —
    with each bucket's share of all sessions. One keyed
    session_window pass to per-session counts, then a bounded bucket
    rollup; exact integers until the final share division."""
    s = (events.groupBy(F.session_window(ts_col, gap).alias("w"),
                        F.col(user_col))
         .agg(F.count(F.lit(1)).alias("n")))
    bucket = (F.when(F.col("n") == 1, "1 (bounce)")
              .when(F.col("n") <= 2, "2")
              .when(F.col("n") <= 5, "3-5")
              .when(F.col("n") <= 10, "6-10")
              .otherwise("11+"))
    b = s.groupBy(bucket.alias("depth")) \
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    tot = b.agg(F.sum("n_sessions").alias("t"))
    return (b.crossJoin(F.broadcast(tot))
            .select("depth", "n_sessions",
                    F.round(F.col("n_sessions").cast("double")
                            / F.col("t"), round_dp).alias("share"))
            .orderBy("depth"))


def time_decay_attribution(events: DataFrame,
                           user_col: str = "user_id",
                           type_col: str = "event_type",
                           ts_col: str = "ts",
                           convert_type: str = "purchase",
                           lookback_us: int = 86_400_000_000,
                           halflife_us: int = 21_600_000_000,
                           round_dp: int = 6) -> DataFrame:
    """Time-decay multi-touch attribution: every conversion spreads
    credit 2^(−age/halflife) over the same user's touches in the
    preceding ``lookback_us`` window; total credit per touch channel
    is the report — the fairer sibling of first/last-touch.

    Plan: a keyed equi-join on user (conversions × prior touches,
    fan-out bounded by touches-per-user-per-lookback) — the same
    bounded-interval shape as the temporal SCD2 join. Per-touch
    credits are deterministic doubles (exp2 of an exact µs ratio)
    quantized to a 1e-6 grid, so channel totals are exact integer
    sums on any engine."""
    ts_us = F.col("__us")
    base = events.select(F.col(user_col).alias("u"),
                         F.col(type_col).alias("t"),
                         F.unix_micros(F.col(ts_col)).alias("__us"))
    conv = (base.filter(F.col("t") == convert_type)
            .select(F.col("u").alias("cu"), ts_us.alias("cts")))
    touch = (base.filter(F.col("t") != convert_type)
             .select("u", "t", ts_us.alias("tts")))
    j = conv.join(touch,
                  (F.col("cu") == F.col("u"))
                  & (F.col("tts") < F.col("cts"))
                  & (F.col("tts") >= F.col("cts") - lookback_us))
    age = (F.col("cts") - F.col("tts")).cast("double")
    credit = F.pow(F.lit(2.0), -age / F.lit(float(halflife_us)))
    cq = F.round(credit * 1e6, 0).cast("long")
    return (j.groupBy(F.col("t").alias("channel"))
            .agg(F.count(F.lit(1)).alias("n_touches"),
                 F.round(F.sum(cq).cast("double") / 1e6, round_dp)
                 .alias("credit"))
            .orderBy("channel"))


def dod_wow_change(events: DataFrame, type_col: str = "event_type",
                   ts_col: str = "ts",
                   round_dp: int = 6) -> DataFrame:
    """Day-over-day and week-over-week percent change of daily
    activity per key — the dashboard delta row. One pass to the
    bounded daily grid; the lag-1 / lag-7 lookups are EQUI-JOINS of
    the grid with itself shifted (calendar-gap-safe — a missing
    yesterday yields NULL, not the wrong day, which a row-ordered
    window would silently produce). Exact integer counts; two
    divisions per output row."""
    day = (F.unix_timestamp(F.col(ts_col)).cast("long") / 86400) \
        .cast("long")
    daily = (events.groupBy(F.col(type_col).alias("k"), day.alias("d"))
             .agg(F.count(F.lit(1)).alias("n")))
    prev1 = daily.select(F.col("k").alias("k1"),
                         (F.col("d") + 1).alias("d1"),
                         F.col("n").alias("n_prev1"))
    prev7 = daily.select(F.col("k").alias("k7"),
                         (F.col("d") + 7).alias("d7"),
                         F.col("n").alias("n_prev7"))
    j = (daily
         .join(prev1, (F.col("k") == F.col("k1"))
               & (F.col("d") == F.col("d1")), "left")
         .join(prev7, (F.col("k") == F.col("k7"))
               & (F.col("d") == F.col("d7")), "left"))
    dod = (F.col("n") - F.col("n_prev1")).cast("double") \
        / F.col("n_prev1")
    wow = (F.col("n") - F.col("n_prev7")).cast("double") \
        / F.col("n_prev7")
    return (j.select(F.col("k").alias(type_col), F.col("d").alias("day"),
                     "n", F.round(dod, round_dp).alias("dod_pct"),
                     F.round(wow, round_dp).alias("wow_pct"))
            .orderBy(type_col, "day"))


def stl_lite_hourly(events: DataFrame, type_col: str = "event_type",
                    ts_col: str = "ts", half_window: int = 12,
                    round_dp: int = 6, micro: bool = False) -> DataFrame:
    """STL-lite seasonal decomposition of each key's hourly count
    series: y = trend + seasonal + residual, with

    - trend: centered moving average over ±``half_window`` hours
      (edge rows average their available neighbors),
    - seasonal: per hour-of-day mean of the detrended series,
    - residual: what's left — the component an anomaly screen reads.

    Determinism: the grid is DENSE (missing hours zero-filled via a
    per-key sequence, so window frames are true time offsets, not
    presence-dependent row offsets); trend is one exact-integer sum
    divided once; the detrended values are re-quantized on the 1e-6
    grid before the seasonal mean so that sum is exact again —
    every engine replays all three components bit-for-bit.

    Plan: one pass to the (key, hour) grid, a bounded per-key window
    (≤ series length), one (key, hour-of-day) aggregate broadcast
    back. Output rows = keys x hours — never data-sized.

    ``micro=True`` emits BIGINT 1e-6 fixed-point components
    (trend_micro / seasonal_micro / residual_micro) computed with
    integer DIV throughout: the float path's rational means can land
    within an ulp of decimal half-way points where engines round
    apart (observed at sf0.1); the integer recurrence replays
    bit-exactly in any engine at any scale."""
    from pyspark.sql.window import Window

    hourly = (events.groupBy(
        F.col(type_col).alias("event_type"),
        (F.unix_timestamp(F.col(ts_col)).cast("long") / 3600)
        .cast("long").alias("xh"))
        .agg(F.count(F.lit(1)).alias("n")))
    span = hourly.groupBy("event_type").agg(
        F.min("xh").alias("lo"), F.max("xh").alias("hi"))
    dense = (span.select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("xh"))
        .join(hourly, ["event_type", "xh"], "left_outer")
        .select("event_type", "xh",
                F.coalesce(F.col("n"), F.lit(0)).alias("y")))
    w = (Window.partitionBy("event_type").orderBy("xh")
         .rowsBetween(-half_window, half_window))
    if micro:
        t = (dense
             .withColumn("__sy", F.sum("y").over(w))
             .withColumn("__cw", F.count(F.lit(1)).over(w))
             .withColumn("trend_micro",
                         F.expr("(__sy * 1000000) DIV __cw"))
             .withColumn("det_micro",
                         F.col("y") * F.lit(1_000_000)
                         - F.col("trend_micro")))
        seas = (t.groupBy(F.col("event_type").alias("__se"),
                          F.pmod(F.col("xh"), F.lit(24)).alias("hod"))
                .agg(F.expr("SUM(det_micro) DIV COUNT(*)")
                     .alias("seasonal_micro")))
        return (t.join(F.broadcast(seas),
                       (F.col("event_type") == F.col("__se"))
                       & (F.pmod(F.col("xh"), F.lit(24))
                          == F.col("hod")))
                .select("event_type", "xh", "y", "trend_micro",
                        "seasonal_micro",
                        (F.col("det_micro") - F.col("seasonal_micro"))
                        .alias("residual_micro")))

    t = (dense
         .withColumn("trend", F.sum("y").over(w).cast("double")
                     / F.count(F.lit(1)).over(w).cast("double"))
         .withColumn("det",
                     F.round((F.col("y") - F.col("trend")) * 1000000, 0)
                     .cast("long")))
    seas = (t.groupBy(F.col("event_type").alias("__se"),
                      F.pmod(F.col("xh"), F.lit(24)).alias("hod"))
            .agg((F.sum("det").cast("double")
                  / F.count(F.lit(1)).cast("double") / 1000000.0)
                 .alias("seasonal")))
    out = (t.join(F.broadcast(seas),
                  (F.col("event_type") == F.col("__se"))
                  & (F.pmod(F.col("xh"), F.lit(24)) == F.col("hod")))
           .select("event_type", "xh", "y",
                   F.round("trend", round_dp).alias("trend"),
                   F.round("seasonal", round_dp).alias("seasonal"),
                   F.round(F.col("det").cast("double") / 1000000.0
                           - F.col("seasonal"), round_dp)
                   .alias("residual")))
    return out


def theil_sen_daily_trend(events: DataFrame,
                          ts_col: str = "ts") -> DataFrame:
    """Theil–Sen robust trend over the daily activity series: the
    MEDIAN of all pairwise slopes (events/day between every pair of
    distinct days) — breakdown point 29%, so bursts and outage days
    don't swing it the way the OLS trend does. Slopes are integerized
    once (floor(1e6·Δn/Δdays) — one fixed-shape division each) and
    the median is the exact lower order statistic over those
    integers, so the result is engine-replayable bit for bit.

    Scale shape: the daily grid is bounded by the time range (days,
    not rows) — the pair fan-out is grid², bounded and tiny relative
    to the corpus; the raw table contributes ONE keyed date count.
    The median is TakeOrdered(k) + a 1-row max — no global sort of
    anything unbounded. Returns one row: (n_days, n_pairs,
    slope_micro)."""
    from vega_spark.tables import ts_date
    daily = (events.select(ts_date(ts_col).alias("d"))
             .groupBy("d").agg(F.count(F.lit(1)).alias("n")))
    a = daily.select(F.col("d").alias("da"), F.col("n").alias("na"))
    b = daily.select(F.col("d").alias("db"), F.col("n").alias("nb"))
    slopes = (a.join(b, F.col("da") < F.col("db"))
              .select(F.floor(F.lit(1000000.0)
                              * (F.col("nb") - F.col("na"))
                              / F.datediff("db", "da"))
                      .cast("long").alias("slope")))
    counts = slopes.agg(F.count(F.lit(1)).alias("n_pairs"))
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    m = counts.collect()[0][0]
    k = (m + 1) // 2
    med = (slopes.orderBy("slope").limit(k)
           .agg(F.max("slope").alias("slope_micro")))
    return n_days.crossJoin(counts).crossJoin(med)


def diff_in_diff(events: DataFrame, boundary_date: str = "2024-01-16",
                 ts_col: str = "ts", user_col: str = "user_id",
                 value_col: str = "value") -> DataFrame:
    """Difference-in-differences estimator (Card & Krueger shape):
    treatment = even user ids (the deterministic assignment a real
    experiment replaces with its own flag), post-period = on/after
    ``boundary_date``. Returns the four cell means (exact-cent sums
    / counts, each ONE fixed-shape division) and the DiD estimate
    (T_post − T_pre) − (C_post − C_pre) in micro units.

    One aggregation pass over the raw table (4-cell grid — no
    shuffle wider than 4 keys after partial aggregation); everything
    downstream is driver-side constant arithmetic on the 4 cells."""
    from vega_spark.tables import ts_date

    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    cells = (events.select(
        (F.col(user_col) % 2 == 0).cast("int").alias("treated"),
        (ts_date(ts_col) >= F.lit(boundary_date).cast("date"))
        .cast("int").alias("post"),
        cents.alias("c"))
        .groupBy("treated", "post")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s"))
        .withColumn("mean_micro",
                    F.floor(F.lit(10000.0) * F.col("s") / F.col("n"))
                    .cast("long")))
    # fold the 4 cells via conditional sums (single pass, exact)
    m = cells.agg(
        F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 1),
                     F.col("mean_micro"))).alias("t_post"),
        F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 0),
                     F.col("mean_micro"))).alias("t_pre"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 1),
                     F.col("mean_micro"))).alias("c_post"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 0),
                     F.col("mean_micro"))).alias("c_pre"))
    return m.select(
        "t_pre", "t_post", "c_pre", "c_post",
        ((F.col("t_post") - F.col("t_pre"))
         - (F.col("c_post") - F.col("c_pre"))).alias("did_micro"))


def cuped_adjusted_means(events: DataFrame,
                         boundary_date: str = "2024-01-16",
                         ts_col: str = "ts", user_col: str = "user_id",
                         value_col: str = "value") -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13 — the standard
    experimentation readout): per user, the PRE-period mean value is
    the covariate X and the POST-period mean the metric Y; the
    adjusted metric Ŷ = Y − θ·(X − X̄) with θ = cov(X,Y)/var(X)
    removes the between-user variance X explains, tightening the
    treated/control comparison at identical sample size.

    Exactness: X, Y are floored integer cents per user; θ and the
    adjusted means are derived from EXACT int64 sufficient statistics
    (n, ΣX, ΣY, ΣXY, ΣX²) through a fixed shape of IEEE-double steps
    both engines replay operation for operation. Plan: one keyed
    per-user aggregate (the only data-sized shuffle), then constant-
    size cell algebra. Returns one row per variant
    (treated = even user id): n_users, raw mean, CUPED-adjusted
    mean (micro), and θ (micro)."""
    from vega_spark.tables import ts_date

    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    post = ts_date(ts_col) >= F.lit(boundary_date).cast("date")
    per_user = (events.select(F.col(user_col).alias("u"),
                              post.cast("int").alias("p"),
                              cents.alias("c"))
                .groupBy("u")
                .agg(F.sum(F.when(F.col("p") == 0, F.col("c")))
                     .alias("sx"),
                     F.count(F.when(F.col("p") == 0, 1)).alias("nx"),
                     F.sum(F.when(F.col("p") == 1, F.col("c")))
                     .alias("sy"),
                     F.count(F.when(F.col("p") == 1, 1)).alias("ny"))
                .filter((F.col("nx") > 0) & (F.col("ny") > 0))
                .select("u",
                        F.floor(F.col("sx") / F.col("nx")).cast("long")
                        .alias("x"),
                        F.floor(F.col("sy") / F.col("ny")).cast("long")
                        .alias("y"),
                        (F.col("u") % 2 == 0).cast("int")
                        .alias("variant")))
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"), F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    pv = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("nv"), F.sum("x").alias("sxv"),
        F.sum("y").alias("syv"))
    j = pv.crossJoin(F.broadcast(tot))
    theta = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             .cast("double")
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
             .cast("double"))
    xbar = F.col("sx").cast("double") / F.col("n").cast("double")
    mean_y = F.col("syv").cast("double") / F.col("nv").cast("double")
    mean_x = F.col("sxv").cast("double") / F.col("nv").cast("double")
    adj = mean_y - theta * (mean_x - xbar)
    return j.select(
        "variant", F.col("nv").alias("n_users"),
        F.round(mean_y * 10000, 0).cast("long").alias("mean_y_micro"),
        F.round(adj * 10000, 0).cast("long").alias("adj_mean_y_micro"),
        F.round(theta * 1000000, 0).cast("long").alias("theta_micro"))


def stl_residual_anomalies(events: DataFrame,
                           type_col: str = "event_type",
                           ts_col: str = "ts",
                           half_window: int = 12,
                           k_mad: int = 6) -> DataFrame:
    """Seasonality-aware anomaly screen: hours whose STL residual
    exceeds ``k_mad`` x the series' MAD — bursts that a plain
    z-score would mistake for (or hide inside) daily seasonality.
    Same dense-grid / integer-requantized decomposition as
    stl_lite_hourly, but the seasonal mean is integerized too, so
    the residual is an EXACT long (micro-events) and the MAD is an
    exact lower-median order statistic — fully engine-replayable.

    Per-key bounded windows only (grid length); output rows are the
    flagged anomalies, never the grid."""
    from pyspark.sql.window import Window

    hourly = (events.groupBy(
        F.col(type_col).alias("event_type"),
        (F.unix_timestamp(F.col(ts_col)).cast("long") / 3600)
        .cast("long").alias("xh"))
        .agg(F.count(F.lit(1)).alias("n")))
    span = hourly.groupBy("event_type").agg(
        F.min("xh").alias("lo"), F.max("xh").alias("hi"))
    dense = (span.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("xh"))
        .join(hourly, ["event_type", "xh"], "left_outer")
        .select("event_type", "xh",
                F.coalesce(F.col("n"), F.lit(0)).alias("y")))
    w = (Window.partitionBy("event_type").orderBy("xh")
         .rowsBetween(-half_window, half_window))
    t = (dense
         .withColumn("trend", F.sum("y").over(w).cast("double")
                     / F.count(F.lit(1)).over(w).cast("double"))
         .withColumn("det",
                     F.round((F.col("y") - F.col("trend")) * 1000000, 0)
                     .cast("long")))
    seas = (t.groupBy(F.col("event_type").alias("__se"),
                      F.pmod(F.col("xh"), F.lit(24)).alias("hod"))
            .agg(F.round(F.sum("det").cast("double")
                         / F.count(F.lit(1)).cast("double"), 0)
                 .cast("long").alias("seas_micro")))
    res = (t.join(F.broadcast(seas),
                  (F.col("event_type") == F.col("__se"))
                  & (F.pmod(F.col("xh"), F.lit(24)) == F.col("hod")))
           .select("event_type", "xh", "y",
                   (F.col("det") - F.col("seas_micro"))
                   .alias("res_micro")))
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("res_micro")).asc(), F.col("xh").asc())
    wc = Window.partitionBy("event_type")
    ranked = (res.withColumn("__r", F.row_number().over(wr))
              .withColumn("__cnt", F.count(F.lit(1)).over(wc)))
    med = (ranked.filter(F.col("__r") == F.floor((F.col("__cnt") + 1) / 2))
           .select(F.col("event_type").alias("__me"),
                   F.abs(F.col("res_micro")).alias("mad_micro")))
    med = med.select("__me",
                     F.greatest(F.col("mad_micro"),
                                F.lit(1000).cast("long"))
                     .alias("mad_micro"))
    return (res.join(F.broadcast(med),
                     F.col("event_type") == F.col("__me"))
            .filter(F.abs(F.col("res_micro"))
                    > k_mad * F.col("mad_micro"))
            .select("event_type", "xh", "y", "res_micro", "mad_micro"))
