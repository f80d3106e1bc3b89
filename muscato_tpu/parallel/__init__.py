"""Mesh construction and sharded probe/verify execution."""
