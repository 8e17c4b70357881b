"""CI guard over the EXPECTED-PARQUET oracle tier (VERDICT r4 #6).

``test_oracle_guard.py`` sweeps the 81 sf-portable pure-SQL oracles at
sf0.001; the other ~70 registered queries read materialized ground-truth
parquet pinned to the sf0.01 corpus (crawl waves, graph references,
kmeans/PCA/LM fixed-point references, ...). Those were previously covered
only by scattered golden suites plus manual ``tools/check_oracles.py``
sweeps — a drift in one of them could hide until the driver happened to
re-sample it. This module enumerates every one of them as a pytest node
and runs the exact driver compare (row count + column names + sorted
values) at sf0.01.

The sweep costs minutes (it runs six full crawls and the iterative-graph
shuffle demos at test parallelism), so the nodes are marked ``slow`` —
included in the default run, deselectable locally with ``-m "not slow"``
while iterating.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.01"


def _expected_parquet_names():
    import __ray_entry__ as entry
    from check_oracles import sf_portable

    oracles = entry.oracle_sql()
    return [
        name
        for name in entry.queries()
        if name in oracles and not sf_portable(oracles[name])
    ]


def test_every_registered_query_has_a_guard_node():
    """151/151: every queries() entry is enumerated by one of the two
    guard modules (portable tier at sf0.001 or this tier at sf0.01)."""
    import __ray_entry__ as entry
    from check_oracles import sf_portable
    from test_oracle_guard import _portable_names

    qs = set(entry.queries())
    covered = set(_portable_names()) | set(_expected_parquet_names())
    assert covered == qs, f"queries without a CI guard node: {sorted(qs - covered)}"


@pytest.fixture(scope="module")
def oracle_ctx(ray_session):
    import __ray_entry__ as entry
    from check_oracles import make_con

    con = make_con(SF_DIR)
    yield entry.queries(), entry.oracle_sql(), con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", _expected_parquet_names())
def test_query_matches_oracle_sf001(oracle_ctx, name):
    from check_oracles import check_query

    qs, oracles, con = oracle_ctx
    ok, detail = check_query(qs[name], oracles[name], con, SF_DIR)
    assert ok, f"{name} drifted from its sf0.01 expected-parquet oracle: {detail}"
