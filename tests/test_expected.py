"""Expected-table ("local oracle") generation: the Parquet ground truths the
driver's DuckDB gate reads for corpus-derived queries (urlmap_ray/expected.py).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from urlmap_ray.config import CrawlConfig
from urlmap_ray.corpus import generate_corpus
from urlmap_ray.expected import (
    MAX_ORACLE_PAGES,
    ensure_crawl_expected,
    ensure_link_stats_expected,
    ensure_page_links_expected,
    ensure_spa_expected,
)


@pytest.fixture(scope="module")
def corpus_info(tmp_path_factory):
    out = tmp_path_factory.mktemp("expcorp") / "c"
    return generate_corpus(str(out), 400)


def test_crawl_expected_matches_engine(ray_session, corpus_info, tmp_path):
    from urlmap_ray.pipelines.crawl import CrawlEngine

    cfg = CrawlConfig()
    path = ensure_crawl_expected(corpus_info, "bfs", cfg)
    exp = pq.read_table(path)
    eng = CrawlEngine(corpus_info, cfg, checkpoint_dir=str(tmp_path / "ck"), seen_shards=2)
    eng.crawl(corpus_info.seeds[0])
    got = eng.visited_dataset().to_pandas()
    assert exp.column_names == ["url", "depth", "status"]
    assert got[["url", "depth", "status"]].values.tolist() == exp.to_pandas().values.tolist()


def test_page_expected_tables_shape(corpus_info):
    links = pq.read_table(ensure_page_links_expected(corpus_info))
    spa = pq.read_table(ensure_spa_expected(corpus_info))
    stats = pq.read_table(ensure_link_stats_expected(corpus_info))
    assert links.num_rows == corpus_info.n_pages
    assert spa.num_rows == corpus_info.n_pages
    assert stats.num_rows == 1
    assert stats.column("sum_total_found")[0].as_py() >= stats.column("sum_valid")[0].as_py()
    # idempotent: second call returns the same file without regenerating
    m1 = os.path.getmtime(ensure_page_links_expected(corpus_info))
    m2 = os.path.getmtime(ensure_page_links_expected(corpus_info))
    assert m1 == m2


def test_generation_gated_to_small_corpora(corpus_info):
    big = type(corpus_info)(
        dir=corpus_info.dir,
        n_pages=MAX_ORACLE_PAGES + 1,
        n_hosts=corpus_info.n_hosts,
        seed=corpus_info.seed,
        partitions=corpus_info.partitions,
        seeds=corpus_info.seeds,
    )
    path = ensure_crawl_expected(big, "never", CrawlConfig())
    assert not os.path.exists(path)
