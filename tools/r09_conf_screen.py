"""Quick A/B screen of session-level confs over the heaviest bench
queries (r9 optimization round). One fresh session per conf set, one
process per invocation: `python tools/r09_conf_screen.py <tag> [k=v ...]`.
Times each query once after an sf0.001 warm pass (same warm protocol
as bench.py); prints one JSON line. NOT the official bench — a
screening tool to decide which conf deserves a full bench + oracle
gate."""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from vega_spark import registry  # noqa: E402
from vega_spark.session import get_session  # noqa: E402

SUBSET = [
    "dedup_simhash_collapsed", "als_recommend_parts", "ppr_part_affinity",
    "mine_duplicate_spans", "image_near_dup_hamming", "dedup_simhash",
    "dedup_keep_representatives", "dedup_components", "pagerank_part_affinity",
    "kmeans_silhouette", "dedup_ngram_jaccard", "sssp_parts_weighted",
    "kmeans_clusters", "write_size_targeted_roundtrip", "dedup_minhash_lsh",
    "mmr_diverse_rerank", "label_propagation_parts", "hybrid_search_rrf",
    "png_resize_roundtrip", "bfs_parts_distance", "image_dhash_census",
    "ann_ivfpq_topk", "optimize_table_orders", "item_neighbors_parts",
    "kcore_parts", "triangle_count_parts", "resolve_supplier_entities",
    "clustering_coeff_parts", "assoc_rules_parts", "semantic_dedup_flags",
    "near_dup_incremental_lsh", "kmv_distinct_jaccard", "ann_pq_topk",
    "zip", "conformal_orders_price", "pca_covariance_lineitem",
    "cv_stump_orders_priority", "tpch_q9_profit_by_nation",
    "tpch_q8_market_share", "weblog_agg",
]


def main() -> None:
    tag = sys.argv[1]
    extra = dict(kv.split("=", 1) for kv in sys.argv[2:])
    sf = "/root/testdata/sf0.1"
    warm = "/root/testdata/sf0.001"
    spark = get_session(f"confscreen-{tag}", extra_conf=extra or None)
    spark.range(1000).count()
    for name in SUBSET:
        try:
            registry.QUERIES[name](spark, warm).count()
        except Exception as exc:
            print(f"# warm {name}: {exc}", file=sys.stderr)
    t: dict[str, float] = {}
    for name in SUBSET:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf).count()
        t[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"tag": tag, "conf": extra,
                      "total": round(sum(t.values()), 3), "queries": t}))
    spark.stop()


if __name__ == "__main__":
    main()
