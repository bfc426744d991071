"""Distributed data-pipeline operators (dedup, similarity, multimodal).

These go beyond the reference's own operator surface (SURVEY.md §2) —
they are the training-data-pipeline layer, each designed for the
100 TB path: LSH instead of n^2 joins, staged/persisted intermediates
instead of recomputed lineage, Arrow-vectorized kernels instead of
row-at-a-time Python.
"""
