"""Seed-list / frontier / WARC / sitemap input sources."""

from .seeds import read_frontier, read_seed_list
from .sitemap import (
    parse_sitemap_bytes,
    read_sitemaps,
    sitemap_seeds,
    write_sitemap,
    write_sitemap_index,
)
from .warc import parse_warc_bytes, read_warc, write_warc

__all__ = [
    "read_frontier",
    "read_seed_list",
    "parse_warc_bytes",
    "read_warc",
    "write_warc",
    "parse_sitemap_bytes",
    "read_sitemaps",
    "sitemap_seeds",
    "write_sitemap",
    "write_sitemap_index",
]
