"""Seed-list / frontier / WARC input sources."""

from .seeds import read_frontier, read_seed_list
from .warc import parse_warc_bytes, read_warc, write_warc

__all__ = [
    "read_frontier",
    "read_seed_list",
    "parse_warc_bytes",
    "read_warc",
    "write_warc",
]
