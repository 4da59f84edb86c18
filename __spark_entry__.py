"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference's de-facto benchmark
aggregate, examples/file_read.rs:13-29, over the events table) at
sf0.001.

``queries()`` / ``oracle_sql()`` — the operator registry lives in
``vega_spark.registry``; every SURVEY.md §2 operator family has at
least one entry, and each SQL-expressible one carries a DuckDB
oracle with column names/types/rounding aligned on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from vega_spark import registry  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def _ship_package(spark: SparkSession) -> None:
    """Make ``vega_spark`` importable on EXECUTOR python workers.

    The sys.path insert above fixes the driver process only: worker
    processes unpickle UDF closures (mapInPandas kernels reference
    vega_spark functions) with their own interpreter, which knows
    nothing about this file's location when the driver was launched
    from a different cwd. Shipping a zip of the package via
    ``addPyFile`` covers every deployment mode (local worker
    subprocesses AND real clusters) without touching PYTHONPATH.
    Idempotent per SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, "_vega_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.join(_REPO_ROOT, "vega_spark")
    zpath = os.path.join(tempfile.mkdtemp(prefix="vega_pkg_"),
                         "vega_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, _REPO_ROOT))
    sc.addPyFile(zpath)
    sc._vega_pkg_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return registry.QUERIES["weblog_agg"](spark, SF0001)


# Driver-window rotation (VERDICT r02 next-round #2): the driver
# verifies roughly the first 50 entries of queries() per round.  The
# ordering below puts (1) queries whose LATEST driver row FAILED
# (hash/rows/schema mismatch, or a no_oracle row for a query that now
# has an oracle) at the very front — a fix must be re-checked, never
# buried; (2) never-checked queries in _PRIORITY order (§2 stragglers
# -> TPC-H judge-named shapes -> LLM flagships -> the rest); (3)
# fully-green queries at the tail.  Round 2 counted ANY row as
# verified, which rotated the 14 hash-failing queries out of the
# window permanently — that is the bug this ordering fixes.
_PRIORITY = [
    # remaining §2 operators — the r1 AND r2 verdicts' explicit ask;
    # they lead every never-checked query this round
    "zip_with_index", "glom_sizes", "count_approx", "count_by_value_approx",
    "sum_approx", "is_empty_flags", "save_text_roundtrip",
    "save_parquet_partitioned_roundtrip", "take_sample_contract",
    "for_each_observe_metrics", "read_whole_files_dir",
    # ex-no_oracle rows converted to driver-hashable contracts (r2
    # verdict #5); their old rows were err/no_oracle so they re-enter
    # through the failed-row front as soon as the oracle exists
    "write_size_targeted_roundtrip", "approx_count_distinct",
    "percentile_approx", "sample_seeded", "random_split_sizes",
    # TPC-H sweep (judge-named shapes first)
    "tpch_q1_pricing_summary", "tpch_q6_forecast_revenue",
    "tpch_q9_profit_by_nation", "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_suppliers",
    # LLM-pipeline flagships named by the r2 verdict (#6) — inside the
    # expected ~50-query window alongside the above
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "semantic_dedup_flags", "ann_pq_topk", "pipeline_clean_corpus",
    # rest of the TPC-H sweep
    "tpch_q2_min_cost_supplier", "tpch_q4_order_priority",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q10_returned_items", "tpch_q11_important_parts",
    "tpch_q12_late_shipments", "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_count", "tpch_q19_discounted_revenue",
    "tpch_q20_promo_suppliers", "tpch_q22_global_sales_opportunity",
    # remaining LLM flagship families
    "kmv_distinct_jaccard", "web_url_dedup_pipeline", "web_line_filter",
    "bpe_encode_docs", "triangle_count_parts", "label_propagation_parts",
    "fuzzy_match_suppliers", "ewma_user_values",
    "attribution_first_last_touch", "cdc_apply_changes_orders",
    "streaming_kmv_rollup", "mv_incremental_refresh",
    "bitmap_distinct_rollup", "hist_quantile_rollup",
    "audio_frame_energy_vad", "inverted_index_search",
    "dedup_ngram_jaccard", "dedup_components", "dedup_keep_representatives",
    "dedup_spans", "dedup_incremental", "dedup_incremental_bloom",
    "ann_cosine_topk", "ann_cosine_topk_arrow", "ann_lsh_topk",
    "ann_ivf_topk", "embedding_near_dup", "text_features",
    "encode_docs_vocab1k", "pipeline_corpus_stats",
    "decontaminate_against_eval", "split_assign_counts",
    "temperature_resample_langs", "pack_sequences_manifest",
    "training_shard_manifest", "pagerank_part_affinity", "kmeans_clusters",
    "streaming_windowed_counts", "streaming_stream_static_join",
    "streaming_dedup_exact", "asof_join", "range_join",
    "table_diff_orders", "multimodal_metadata", "multimodal_frames",
    "custom_source_events", "bucketed_join_priority_revenue",
    "partitioned_scan_prune", "sessionize_gap",
    # round-2 family queries that missed the r2 window
    "streaming_interval_join_pairs", "read_merge_schema_evolution",
    "geo_trajectory_users", "geo_copresence_users",
    "funnel_time_boxed_1h_24h", "dau_wau_stickiness",
    "corr_qty_discount_by_flag", "activity_heatmap_dow_hour",
    "session_depth_bounce", "attribution_time_decay",
    "dod_wow_event_changes", "fulfillment_lag_by_priority",
    "file_layout_skew_report", "user_feature_mart",
    "custom_sink_jsonl_roundtrip", "versioned_data_skipping_orders",
    "pareto_customer_frontier", "pca_covariance_lineitem",
    "cv_stump_orders_priority", "streaming_watermark_drops",
    "quality_suite_orders", "jl_projection_embeddings",
    "conformal_orders_price", "als_recommend_parts",
    "stl_decompose_hourly", "kmeans_silhouette",
    "versioned_bloom_point_lookup", "versioned_change_feed_orders",
    "streaming_left_outer_interval_join", "versioned_zorder_2d_skipping",
    "contrastive_negatives_docs", "versioned_delete_keys_orders",
]


def _driver_rows() -> dict[str, dict]:
    """Latest driver CORRECTNESS row per query (later rounds win)."""
    import glob
    import json

    rows: dict[str, dict] = {}
    for p in sorted(glob.glob(os.path.join(_REPO_ROOT,
                                           "CORRECTNESS_r*.json"))):
        try:
            with open(p) as f:
                data = json.load(f)
        except Exception:
            continue
        for name, row in data.items():
            if isinstance(row, dict):
                rows[name] = row
    return rows


def _is_green(name: str, row: dict) -> bool:
    """A row counts as verified ONLY when every driver check passed.
    A no_oracle row is terminal (counts) only while the query still
    has no oracle — the weaker rows-only check is all it can get."""
    if row.get("rows_match") and row.get("schema_match") \
            and row.get("hash_match"):
        return True
    return row.get("err") == "no_oracle" and name not in registry.ORACLES


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    so the driver's per-round window re-checks repaired failures
    first, then never-verified queries (see _PRIORITY)."""
    def shipped(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)
        return run

    q = {k: shipped(fn) for k, fn in registry.QUERIES.items()}
    rows = _driver_rows()
    green = {k for k, r in rows.items() if _is_green(k, r)}

    def rank(k: str) -> int:
        return _PRIORITY.index(k) if k in _PRIORITY else len(_PRIORITY)

    failed = sorted((k for k in q if k in rows and k not in green), key=rank)
    fresh = sorted((k for k in q if k not in rows), key=rank)
    tail = [k for k in q if k in green]
    return {k: q[k] for k in failed + fresh + tail}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(registry.ORACLES)
