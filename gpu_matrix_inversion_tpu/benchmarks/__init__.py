"""Benchmark harnesses reproducing the reference's experiment protocol."""
