"""LLM-training-data-pipeline operator surface (BASELINE.json north star).

Everything here is designed 100 TB-first: column expressions compile to JVM
codegen; the few Python paths are Arrow-batched pandas UDFs; candidate
generation for fuzzy matching is LSH-bucketed so no all-pairs shuffle exists
at scale (the exact all-pairs forms are kept as small-scale oracles).
"""
