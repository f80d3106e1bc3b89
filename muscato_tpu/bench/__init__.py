"""Synthetic workload generation and benchmark harness."""
