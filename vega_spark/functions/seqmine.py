"""Sequential-pattern mining (PrefixSpan-style 2-sequences with
gaps): for every ordered pair of event types (a → b), how many users
do `a` and *later* `b` — the behavior-mining primitive behind
"viewers who later purchase" questions, and the order-aware sibling
of the itemset association rules in `operators/fuzzy`-adjacent
`assoc_rules`. Unlike `analytics.top_event_paths` (contiguous
n-grams), a pattern here allows arbitrary gaps between the two
events, which is what "later" means.

Reference scope: rajasekarv/vega expresses this only as a
group_by_key + per-user closure scan (reference src/rdd/rdd.rs
group_by path); here the subsequence enumeration is in-plan.

Scale shape: per-user sequences are TRUNCATED to the first
``max_len`` events (one bounded per-user rank window — the same
per-key-bounded pattern as analytics.user_event_gaps), so the
double-explode pair enumeration is ≤ max_len² rows per user —
linear in users, never quadratic in events. Support counting is one
keyed aggregate over (a, b); the event-type alphabet bounds the
output. No driver-side state.

Determinism: event order is (ts, event_id) — a total order, so
truncation and pairs are partition-invariant; confidence is
integerized ppm (one double division, round) so the output is
all-integer except nothing: (a, b, support, prefix_support,
conf_ppm) are all BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequential_pairs(events: DataFrame,
                     user_col: str = "user_id",
                     type_col: str = "event_type",
                     order_cols: tuple[str, str] = ("ts", "event_id"),
                     max_len: int = 30,
                     min_support: int = 1) -> DataFrame:
    """Support/confidence of every gapped 2-sequence a → b.

    support = #users with `a` before `b` (each user counted once);
    prefix_support = #users with `a` anywhere in their (truncated)
    sequence; conf_ppm = round(1e6·support/prefix_support)."""
    w = Window.partitionBy("u").orderBy(
        *[F.col(c).asc() for c in order_cols])
    seq = (events.select(F.col(user_col).alias("u"),
                         F.col(type_col).alias("et"),
                         *[F.col(c) for c in order_cols])
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= max_len)
           .select("u", "et", "rn"))
    first = seq.select("u", F.col("et").alias("a"),
                       F.col("rn").alias("i"))
    second = seq.select("u", F.col("et").alias("b"),
                        F.col("rn").alias("j"))
    pairs = (first.join(second, "u")
             .filter(F.col("i") < F.col("j"))
             .select("u", "a", "b").distinct())
    sup = (pairs.groupBy("a", "b")
           .agg(F.count(F.lit(1)).alias("support"))
           .filter(F.col("support") >= min_support))
    prefix = (seq.select("u", F.col("et").alias("a")).distinct()
              .groupBy("a")
              .agg(F.count(F.lit(1)).alias("prefix_support")))
    return (sup.join(F.broadcast(prefix), "a")
            .select("a", "b", "support", "prefix_support",
                    F.round(F.col("support").cast("double") * F.lit(1e6)
                            / F.col("prefix_support").cast("double"), 0)
                    .cast("long").alias("conf_ppm")))
