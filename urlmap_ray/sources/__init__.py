"""Seed-list / frontier input sources."""

from .seeds import read_frontier, read_seed_list

__all__ = ["read_frontier", "read_seed_list"]
