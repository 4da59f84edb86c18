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


# Driver-window rotation (VERDICT r01 next-round #1): the driver
# verifies roughly the first 50 entries of queries() per round, so the
# ordering below puts queries WITHOUT a CORRECTNESS_r*.json row yet
# first — each round the window slides over the still-unverified tail
# automatically, and every query eventually gets a hard driver row.
# Within the unverified set, §2-critical operators come first, then
# the TPC-H sweep, then the LLM-pipeline flagships (the judge's
# priority order), then everything else in registry order.
_PRIORITY = [
    # round-2 continuation families (newest first: each is the lone
    # driver-visible representative of a new capability family)
    "image_dhash_census", "image_near_dup_hamming",
    "mine_repeated_ngrams", "audio_zcr_fingerprint",
    "mine_duplicate_spans", "maxsim_late_interaction",
    "parquet_footer_census", "mmr_diverse_rerank",
    "streaming_versioned_rollup", "ppr_part_affinity",
    "theil_sen_event_trend", "image_curation_pipeline",
    "diff_in_diff_purchases", "trimmed_mean_event_values",
    "cuped_event_values", "oov_rate_by_lang",
    "write_size_targeted_roundtrip", "approx_accuracy_contract",
    "optimize_table_orders", "incremental_join_view_orders",
    "join_view_signed_retractions", "secure_view_customers",
    "stl_residual_anomalies", "winsorized_mean_event_values",
    "png_pixel_decode_stats", "png_resize_roundtrip",
    "bm25_rank_docs", "hybrid_search_rrf",
    "retrieval_mrr_ndcg_trunc", "seq_pairs_events",
    "acf_hourly_events", "cusum_changepoint_hours",
    "kaplan_meier_conversion", "logreg_purchase_value",
    "l_diversity_docs", "clustering_coeff_parts",
    "geo_cell_density_customers", "geo_neighbor_pairs_customers",
    "geo_nearest_hub_nations", "streaming_session_windows",
    "pmi_collocations_docs", "gini_event_values",
    "woe_iv_purchase_value", "user_growth_daily",
    "scd2_temporal_purchases", "rfm_user_segments",
    "active_time_per_user", "join_full_outer",
    "embedding_truncation_recall", "sparse_cosine_doc_pairs",
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
    # remaining §2 operators
    "zip_with_index", "glom_sizes", "count_approx", "count_by_value_approx",
    "sum_approx",
    # newly driver-visible §2 actions/sources
    "is_empty_flags", "save_text_roundtrip",
    "save_parquet_partitioned_roundtrip", "take_sample_contract",
    "for_each_observe_metrics", "read_whole_files_dir",
    # TPC-H sweep (judge-named shapes first)
    "tpch_q1_pricing_summary", "tpch_q6_forecast_revenue",
    "tpch_q9_profit_by_nation", "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_suppliers",
    # LLM-pipeline flagships (round-2 capability families first: each
    # is the lone driver-visible representative of a new family)
    "semantic_dedup_flags", "ann_pq_topk", "kmv_distinct_jaccard",
    "web_url_dedup_pipeline", "web_line_filter", "bpe_encode_docs",
    "triangle_count_parts", "label_propagation_parts",
    "fuzzy_match_suppliers", "ewma_user_values",
    "attribution_first_last_touch", "cdc_apply_changes_orders",
    "streaming_kmv_rollup", "mv_incremental_refresh",
    "bitmap_distinct_rollup", "hist_quantile_rollup",
    "audio_frame_energy_vad", "inverted_index_search",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_components", "dedup_keep_representatives",
    "dedup_spans", "dedup_incremental", "dedup_incremental_bloom",
    "ann_cosine_topk", "ann_cosine_topk_arrow", "ann_lsh_topk",
    "ann_ivf_topk", "embedding_near_dup", "text_features",
    "encode_docs_vocab1k", "pipeline_clean_corpus", "pipeline_corpus_stats",
    "decontaminate_against_eval", "split_assign_counts",
    "temperature_resample_langs", "pack_sequences_manifest",
    "training_shard_manifest", "pagerank_part_affinity", "kmeans_clusters",
    "streaming_windowed_counts", "streaming_stream_static_join",
    "streaming_dedup_exact", "asof_join", "range_join",
    "table_diff_orders", "multimodal_metadata", "multimodal_frames",
    "custom_source_events", "bucketed_join_priority_revenue",
    "partitioned_scan_prune", "sessionize_gap",
]


def _driver_verified() -> set[str]:
    """Queries already carrying a row in any round's CORRECTNESS file."""
    import glob
    import json

    seen: set[str] = set()
    for p in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                seen |= set(json.load(f))
        except Exception:
            continue
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    so the driver's per-round verification window covers the
    not-yet-verified queries first (see _PRIORITY)."""
    def shipped(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)
        return run

    q = {k: shipped(fn) for k, fn in registry.QUERIES.items()}
    seen = _driver_verified()
    head = [k for k in _PRIORITY if k in q and k not in seen]
    head += [k for k in q if k not in seen and k not in head]
    tail = [k for k in q if k in seen]
    return {k: q[k] for k in head + tail}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(registry.ORACLES)
