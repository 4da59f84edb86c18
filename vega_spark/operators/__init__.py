"""Operator library: the reference's RDD operator algebra (SURVEY.md
§2) re-expressed as declarative DataFrame transforms.

Modules:
- core         narrow per-row / per-partition transforms (§2.3)
- actions      materializing actions (§2.2)
- aggregations keyed aggregation / combine_by_key family (§2.5)
- joins        join / cogroup / cartesian / zip (§2.4)
- setops       union / distinct / intersection / subtract (§2.6)
- partitioning physical-layout operators (§2.7)
- sampling     sample / take_sample / random_split (§2.8)
- topk         top / take_ordered / ordering (§2.5, §2.11 gap fill)
- approx       approximate / partial actions (§2.9)
"""
