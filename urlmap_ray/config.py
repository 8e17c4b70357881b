"""Crawl job specification (reference Config, crawler.go:83-95).

The CLI hardcodes SameDomain=true and SamePathPrefix=true (main.go:163-174);
those are the defaults here. ``per_host_budget`` is this engine's wave-level
politeness admission (the scalable form of the reference's global rate
limiter + robots Crawl-delay sleeps): at most B URLs per host are crawled
per wave, admission deterministic (URL sort order), remainder deferred to
the next wave. ``None`` disables budgeting (reference parity mode — the
reference's rate limiter never changes the final URL set, only timing).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlConfig:
    max_depth: int = -1  # -1 = unlimited (reference default)
    same_domain: bool = True
    same_path_prefix: bool = True
    respect_robots: bool = False
    user_agent: str = "urlmap-ray/0.1 (+https://github.com/aoshimash/urlmap)"
    per_host_budget: int | None = None
    # Budget-admission priority within a host (the north-rule "per-host
    # politeness/priority queue"): "url" = lexicographic (reference-parity
    # default), "shallow" = lowest depth first (url tiebreak) — under a
    # deferral backlog the BFS frontier advances before deep stragglers.
    # Deterministic and cluster-size-invariant either way; the wave oracle
    # models both. No effect when per_host_budget is None (nothing defers).
    priority: str = "url"
    # Transient-failure retry budget (reference client.go:63-83: a 5xx /
    # network error is retried up to 3 attempts total). In the wave engine a
    # transient failure (corpus flaky page still within its flaky_fails
    # window) is re-eligible NEXT WAVE at unchanged depth, up to
    # max_attempts fetches; the run that exhausts the budget is recorded as
    # a final 503 error result (visited, links never followed).
    max_attempts: int = 3
    # Hot-host skew salting for the budgeted politeness gate: 0 = off; k > 0
    # splits every host's wave admission across k url-hash shards, each with
    # ceil(budget/k) quota, so no single gate task owns a hot host's whole
    # frontier slice. The final visited SET is unchanged (budget deferral
    # never drops URLs); only wave assignment shifts. Deterministic.
    hot_host_salt: int = 0
