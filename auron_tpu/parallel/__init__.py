"""Partitioning + distributed exchange (mesh data plane)."""
