"""Compute kernels: hashing, selection, sort, aggregation, join primitives."""
