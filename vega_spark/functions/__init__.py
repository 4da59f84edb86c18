"""LLM-data-pipeline extensions (SURVEY.md §7 stage 7 / BASELINE.json
north star) — beyond the reference's operator surface, the operations
a large-scale training-data pipeline needs, built as composable
DataFrame transforms designed for 100 TB:

- text       language-ID, quality scoring, token counting, fingerprints
- dedup      exact, MinHash+LSH, SimHash, n-gram Jaccard
- similarity brute-force cosine top-k + LSH-bucketed ANN
- multimodal opaque binary columns with typed metadata (decode stubbed)
"""
