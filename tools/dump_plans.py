"""Regenerate PLANS.md: the formatted physical plan of each showcase
query with the scale-relevant reading. Run after plan-affecting
changes: `python tools/dump_plans.py` (writes PLANS.md at repo root).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vega_spark import registry  # noqa: E402
from vega_spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.001"

SHOWCASE: list[tuple[str, str]] = [
    ("image_near_dup_hamming",
     "Collapsed-class pigeonhole blocking (r9 opt): identical "
     "signatures collapse to one class row (ONE linear combinable "
     "groupBy of the corpus), the 4-chunk equi-join + XOR bit_count "
     "verify run over DISTINCT signatures only, and per-hamming "
     "counts come from class-size arithmetic — exact, with pair "
     "work bounded by the signature space, not corpus² (the "
     "doc-level self-join read 423x at the 300x smoke; this form "
     "9-13x across re-runs)."),
    ("maxsim_late_interaction",
     "Late-interaction MaxSim with query vectors folded into codegen "
     "as literals: the corpus side is one narrow explode + ONE keyed "
     "aggregate; no join against a query table at all."),
    ("mine_duplicate_spans",
     "Sliding k-gram digests (narrow in-row fan-out, computed ONCE) "
     "→ one uniform digest-keyed shuffle whose count() window marks "
     "duplicates in place (r10: the groupBy+join-back form re-ran "
     "the fan-out as the probe side) → per-document bounded island "
     "windows. Text never enters the wide stage; the digest shuffle "
     "is sized from footer text bytes at scale."),
    ("mmr_diverse_rerank",
     "Bounded BM25 head materialized once; the pairwise sim matrix "
     "is a token equi-join restricted to ≤top_n candidates; the "
     "greedy loop touches only the bounded state in one cogrouped "
     "task."),
    ("weblog_agg",
     "One scan → partial HashAggregate → single Exchange → final "
     "HashAggregate. The reference's de-facto benchmark query is "
     "exactly Spark's two-phase aggregate; nothing else to cut."),
    ("tpch_q3_shipping",
     "Dimension sides broadcast (no shuffle of lineitem for the "
     "joins); the only Exchange is the final group-by. At 100 TB the "
     "fact table moves once."),
    ("scd2_user_state",
     "lag-filter-lead over ONE hash Exchange + one Sort — all three "
     "windows share the (user_id) partitioning, so Catalyst plans a "
     "single shuffle for the whole SCD2 build."),
    ("decontaminate_against_eval",
     "Eval n-grams collapse to a BroadcastExchange; the corpus side "
     "explodes narrowly and aggregates once on doc_id. The corpus "
     "never shuffles on n-grams."),
    ("bucketed_join_priority_revenue",
     "Both sides read from bucketed tables: SortMergeJoin with NO "
     "Exchange and no per-query Sort on either input — the shuffle "
     "was paid once at write time."),
    ("partitioned_scan_prune",
     "The date predicate binds as PartitionFilters (directory "
     "pruning): the scan lists one date directory out of 30 before "
     "any row is read."),
    ("top_k",
     "TakeOrderedAndProject — per-partition bounded heaps + driver "
     "merge, the same algorithm as the reference's bounded priority "
     "queue top(), with no global sort."),
    ("dedup_exact",
     "Digest computed in the scan projection; the dedup shuffle "
     "carries (digest, id, features) only — document text never "
     "enters an Exchange."),
    ("zip_with_index",
     "Scalable zipWithIndex (r02 fix): rangepartitioning Exchange + "
     "in-partition sort, local positions from "
     "monotonically_increasing_id low bits, offsets broadcast back. "
     "No WindowExec, no single-task stage — the old plan funnelled "
     "every row through one reducer."),
    ("kmv_distinct_jaccard",
     "KMV sketch: per-partition bottom-k prune (Window partitioned "
     "by spark_partition_id — never global) bounds every Exchange at "
     "partitions x k rows; the estimator joins operate on <=k-row "
     "frames."),
    ("semantic_dedup_flags",
     "SemDeDup: centroid assignment is a narrow literal-expression "
     "argmin (zero joins); the only Exchanges are the per-cluster "
     "rank window and the cluster-keyed candidate self-join — no "
     "cartesian, no global window."),
    ("triangle_count_parts",
     "Degree-oriented triangles: all equi-joins (wedge self-join on "
     "the apex + closure join on the canonical pair); orientation "
     "makes wedge fan-out skew-immune, so no straggler reducer on "
     "hub nodes."),
    ("fuzzy_match_suppliers",
     "Record linkage: inverted-index equi-join on rare q-grams (the "
     "document-frequency cap drops the shared-prefix grams that "
     "would regenerate all-pairs), then a narrow levenshtein verify "
     "on surviving candidates."),
    ("web_url_dedup_pipeline",
     "URL stage: regex parse fused into the scan, blocklist as a "
     "BroadcastExchange anti-join (corpus side never shuffles for "
     "it), and one hash Exchange on the normalized URL for "
     "keep-best."),
    ("hist_quantile_rollup",
     "Mergeable quantiles: partial bin counts aggregate map-side, "
     "the merge is count addition, and the interpolation runs over "
     "a per-group window of at most `bins` rows — summary size, "
     "never data size, at every stage past the first scan."),
    ("cdc_apply_changes_orders",
     "CDC apply: the changefeed collapses with one keyed max_by "
     "aggregate, then deletes and upserts ride BROADCAST anti/left "
     "joins — the snapshot side (the 100 TB table) has no Exchange "
     "anywhere in the plan."),
    ("dsir_select_en",
     "DSIR selection: unigram hashing bounds the model frame at "
     "n_buckets rows regardless of corpus vocabulary, so both model "
     "joins are BroadcastExchanges; document text crosses exactly "
     "one hash Exchange (the doc-bucket aggregate)."),
    ("item_neighbors_parts",
     "Item-item CF: pair fan-out stays inside each basket row "
     "(no self-join of the fact table); supports broadcast back; "
     "the per-item top-k is a window PARTITIONED by item — per-key "
     "heaps, no global sort anywhere."),
    ("versioned_data_skipping_orders",
     "Data skipping: the pruned read's scan lists ONLY the manifest-"
     "selected files (2 of 8 for the one-year band) — the skip "
     "decision happened driver-side on metadata before this plan "
     "existed; the residual range filter sits ON the scan as a "
     "pushed predicate, so correctness never depends on the stats."),
    ("pareto_customer_frontier",
     "Two-phase skyline: phase 1 is a narrow mapInPandas frontier "
     "per partition (no Exchange touches non-candidates); the single-"
     "partition Exchange feeding phase 2 carries only the per-"
     "partition frontiers — TakeOrdered's driver-merge scale, by "
     "construction."),
    ("cv_stump_orders_priority",
     "k-fold CV as cell algebra: the data crosses ONE (fold, bin) "
     "Exchange; every training (totals minus held-out cell), the "
     "Gini argmin, and the held-out evaluation run on the folds x "
     "bins frame with windows PARTITIONED by fold — k never appears "
     "in the data-pass cost."),
    ("conformal_orders_price",
     "Conformal intervals: no global sort — the calibration quantile "
     "is a (group, bin) aggregate + a <=512-row per-group window, "
     "and the serve-side coverage check joins the tiny per-group "
     "model back as a BroadcastExchange."),
    ("jl_projection_embeddings",
     "JL projection: one narrow whole-stage-codegen pass — the sign "
     "matrix rides as array literals, each output component is a "
     "zip_with/aggregate fold, and the only Exchange in the plan "
     "belongs to the long-form posexplode output, not the math."),
    ("jackknife_event_means",
     "Jackknife error bars: the data crosses ONE (group, fold) "
     "Exchange; every resampling step after — totals, leave-one-out "
     "means, variance combine — runs on the groups x folds frame, "
     "joined back as BroadcastExchanges."),
    ("kaplan_meier_conversion",
     "Survival curve without a global window: per-user conditional "
     "MINs cross one user-keyed Exchange; the ordered risk-set "
     "recursion folds over a collected SORTED ARRAY bounded by the "
     "time span — the inherently-sequential part never touches a "
     "data-sized partition."),
    ("geo_neighbor_pairs_customers",
     "Spatial radius self-join as a cell equi-join: points bucket "
     "into radius-sized grid cells, the probe side explodes 9 "
     "neighbor offsets (9x a bounded frame, narrow), and the ONLY "
     "join is hash-partitioned on (cell_x, cell_y) — candidate "
     "count stays linear in points at any scale; the head is "
     "TakeOrderedAndProject."),
    ("logreg_purchase_value",
     "A learner as a declarative plan: each GD step is one scan + "
     "map-side-combined aggregate; weights flow forward as 1-row "
     "BroadcastExchanges — no driver loop, no collect, fixed "
     "3-scan pipeline at any data size."),
    ("scd2_temporal_purchases",
     "Point-in-time join: SCD2 versions and facts meet on a keyed "
     "equi-join (one Exchange each side) with the validity interval "
     "as a join FILTER — correct because versions per key are "
     "non-overlapping, so fan-out is bounded; never an interval "
     "cross-product."),
    ("dedup_simhash",
     "SimHash near-dup (r7 Manku combinatorial blocking): the "
     "fingerprint explodes to C(6,3)=20 ~32-bit combination keys "
     "(chance bucket collisions n^2/2^33, not n^2/2^16), ONE "
     "equi-join generates candidates, and the hamming XOR/bit_count "
     "verify runs INSIDE the join stage so the only pair-keyed "
     "Exchange is the distinct over within-budget survivors."),
    ("geo_copresence_users",
     "Co-presence (r7 density-adaptive grid): cell edge derives "
     "from one metadata count so bucket occupancy stays ~constant "
     "at any density; presence distinct, the deterministic cap "
     "window, and the bucket self-join all share the (hour, cell) "
     "key family, and the pair rollup head is "
     "TakeOrderedAndProject."),
]


def main() -> None:
    spark = get_session("plan-dump", cpus=8)
    out = [
        "# PLANS — physical plans of showcase queries",
        "",
        "Auto-generated by `tools/dump_plans.py` at sf0.001 (plan",
        "shapes are SF-independent; AQE may further coalesce at run",
        "time). Each section: why this plan survives 100x data, then",
        "the `explain` output. Plan-shape assertions live in",
        "`tests/test_plans.py`; this file is the human-readable view.",
        "",
    ]
    for name, note in SHOWCASE:
        df = registry.QUERIES[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        # strip file paths (machine-specific noise)
        plan = re.sub(r"file:[^\s,\]]+", "file:<path>", plan)
        plan = re.sub(r"Location: \S+", "Location: <pruned>", plan)
        out += [f"## {name}", "", note, "", "```", plan.rstrip(), "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
