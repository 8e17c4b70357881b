"""Per-host politeness gate (A2+A3): robots.txt + deterministic budget.

The reference rate-limits with a global token bucket (progress.go:108-159)
and sleeps per-host robots Crawl-delay (crawler.go:602-607); neither changes
the final URL set, only timing. At wave scale, sleeping is replaced by batch
admission: per host and wave, at most B URLs are crawled; the rest are
*deferred* to the next wave at unchanged depth. Admission is deterministic —
URLs sorted lexicographically within host, first B win — so a
budget-limited crawl yields the same output on any cluster size.

Hot-host salting (config.hot_host_salt=k) splits a host's admission into k
shards with ceil(B/k) quota each. This stays fully deterministic and
cluster-size-invariant, but the *schedule* differs from the unsalted crawl
(union of per-shard first-⌈B/k⌉ ≠ global first-B), so under a max_depth
limit the claim-first depth of late-discovered URLs — and thus the visited
set near the depth boundary — can differ slightly from the salt=0 schedule
that the wave oracle models. salt=0 matches the oracle exactly; any fixed
salt reproduces its own output exactly.

Robots handling mirrors processJob (crawler.go:583-607): a disallowed URL is
skipped entirely (it was already claimed in the seen set, so it never
reappears) and consumes no budget slot only if skipped before admission —
we admit first, then check robots/depth, exactly like the reference's
queue→process ordering (and like oracle.crawl_waves).

Runs as ``groupby("host").map_groups(PolitenessGate, ...)``: the hash
shuffle guarantees each task sees whole host groups. An actor pool
(callable class + concurrency) keeps parsed robots rules cached per actor
across waves of batches; a per-host crawl-delay scales the budget:
``effective_budget = min(B, wave_seconds / crawl_delay)`` when a delay is
declared.

Verdicts: admit | defer | skip_robots | skip_depth.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..robotstxt import RobotsData, check_rules, parse_robots
from ..gourl import parse as parse_url, URLError

VERDICT = pa.dictionary(pa.int8(), pa.string())


def origin_of(url: str) -> str:
    """scheme://host of a canonical URL (the robots cache key, robots.go:63)."""
    i = url.find("://")
    j = url.find("/", i + 3)
    return url if j < 0 else url[:j]


class PolitenessGate:
    def __init__(
        self,
        robots_bodies: dict[str, str],
        user_agent: str,
        per_host_budget: int | None,
        respect_robots: bool,
        max_depth: int,
        wave_seconds: float = 60.0,
        priority: str = "url",
    ):
        if priority not in ("url", "shallow"):
            raise ValueError(f"priority must be 'url' or 'shallow', got {priority!r}")
        self.robots_bodies = robots_bodies
        self.user_agent = user_agent
        self.per_host_budget = per_host_budget
        self.respect_robots = respect_robots
        self.max_depth = max_depth
        self.wave_seconds = wave_seconds
        self.priority = priority
        self._parsed: dict[str, RobotsData | None] = {}
        self._origin_set: pa.Array | None = None  # memoized is_in value_set

    def origin_value_set(self) -> pa.Array:
        if self._origin_set is None:
            self._origin_set = pa.array(sorted(self.robots_bodies), pa.string())
        return self._origin_set

    def _rules_for(self, origin: str) -> RobotsData | None:
        if origin not in self._parsed:
            body = self.robots_bodies.get(origin)
            self._parsed[origin] = parse_robots(body, self.user_agent) if body else None
        return self._parsed[origin]

    def _host_budget(self, origin: str) -> int | None:
        b = self.per_host_budget
        data = self._rules_for(origin)
        if data is not None and data.crawl_delay_s > 0:
            delay_cap = max(1, int(self.wave_seconds / data.crawl_delay_s))
            b = delay_cap if b is None else min(b, delay_cap)
        return b

    def __call__(self, group: pa.Table) -> pa.Table:
        # One whole admission group (or several — the engine groups by a
        # HASH BUCKET of the admission key, not the raw key: at 10^8 hosts a
        # per-host groupby would drown in per-group dispatch, while ~1k fat
        # buckets shuffle identically and we re-split vectorized here).
        # Split key is gate_key (host#salt) when hot-host salting is on —
        # splitting a salted bucket by bare host would merge a hot host's
        # salt shards back together and apply its per-shard budget once.
        # Per-host admission order = the priority queue: budget admits the
        # first B rows in this order, the rest defer to the next wave.
        sort_keys = (
            [("url", "ascending")]
            if self.priority == "url"
            else [("depth", "ascending"), ("url", "ascending")]
        )
        out_tables = []
        for host_tbl in _split_by_host(group):
            order = pc.sort_indices(host_tbl, sort_keys=sort_keys)
            host_tbl = host_tbl.take(order)
            urls = host_tbl.column("url").to_pylist()
            depths = host_tbl.column("depth").to_pylist()
            origin = origin_of(urls[0])
            budget = self._host_budget(origin) if (self.respect_robots or self.per_host_budget) else self.per_host_budget
            verdicts = []
            for rank, (u, d) in enumerate(zip(urls, depths)):
                if budget is not None and rank >= budget:
                    verdicts.append("defer")
                    continue
                if self.respect_robots:
                    data = self._rules_for(origin_of(u))
                    if data is not None:
                        try:
                            path = parse_url(u).path
                        except URLError:
                            path = "/"
                        if not check_rules(data.rules, path):
                            verdicts.append("skip_robots")
                            continue
                if self.max_depth >= 0 and d > self.max_depth:
                    verdicts.append("skip_depth")
                    continue
                verdicts.append("admit")
            out_tables.append(
                host_tbl.append_column("verdict", pa.array(verdicts, pa.string()))
            )
        return pa.concat_tables(out_tables)


# Canonical-URL shape the vectorized gate splits without a full parse:
# origin = scheme://authority, path = decoded-equals-raw when it has no '%'.
_ORIGIN_PATH_RE = r"^(?P<vorigin>https?://[^/?#]+)(?P<vpath>[^?#]*)(?:[?#].*)?$"


def gate_rows(gate: "PolitenessGate", batch: pa.Table) -> pa.Table:
    """Row-local verdicts: robots + depth only, no budget/deferral.

    Used when no per-host budget is configured — then admission does not
    depend on the rest of the host's group, so the gate runs as a plain
    map_batches with NO shuffle and no hot-host skew (the reference's
    Crawl-delay sleep is a throughput concern, not a set concern; budgeted
    crawls take the grouped path where the delay caps the wave budget).

    Vectorized: one Arrow regex pass splits origin/path, an ``is_in`` probe
    finds the rows whose origin actually declares robots rules (typically a
    minority), and only those run the per-path rule check; percent-escaped
    or non-canonical URLs fall back to the full parser with identical
    semantics. The depth verdict is a single compute expression.
    """
    import numpy as np

    n = batch.num_rows
    verdicts = np.full(n, "admit", dtype=object)
    if gate.respect_robots and gate.robots_bodies and n:
        urls_col = batch.column("url").combine_chunks()
        ex = pc.extract_regex(urls_col, pattern=_ORIGIN_PATH_RE)
        valid = pc.is_valid(ex).to_numpy(zero_copy_only=False)
        origins = pc.struct_field(ex, "vorigin")
        ruled = np.asarray(
            pc.is_in(origins, value_set=gate.origin_value_set())
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
        )
        check = np.flatnonzero((ruled & valid) | ~valid)
        if len(check):
            o_list = origins.take(pa.array(check)).to_pylist()
            p_list = pc.struct_field(ex, "vpath").take(pa.array(check)).to_pylist()
            for i, o, p in zip(check, o_list, p_list):
                if o is None or (p is not None and "%" in p):
                    # non-canonical URL: full-parser fallback (old code path)
                    u = urls_col[i].as_py()
                    data = gate._rules_for(origin_of(u))
                    if data is None:
                        continue
                    try:
                        p = parse_url(u).path
                    except URLError:
                        p = "/"
                    if not check_rules(data.rules, p):
                        verdicts[i] = "skip_robots"
                    continue
                data = gate._rules_for(o)
                if data is not None and not check_rules(data.rules, p or ""):
                    verdicts[i] = "skip_robots"
    if gate.max_depth >= 0 and n:
        depths = batch.column("depth").to_numpy(zero_copy_only=False)
        verdicts[(depths > gate.max_depth) & (verdicts == "admit")] = "skip_depth"
    return batch.append_column("verdict", pa.array(verdicts.tolist(), pa.string()))


# Worker-process cache of constructed gates (parsed robots rules), keyed by
# the broadcast object ref + config. Survives across waves without actor
# respawn cost; the robots dict is ray.put() once per crawl and ray.get()
# once per worker (zero-copy from the local object store thereafter).
_GATE_CACHE: dict[tuple, PolitenessGate] = {}


def gate_group(
    group: pa.Table,
    *,
    robots_ref,
    user_agent: str,
    per_host_budget: int | None,
    respect_robots: bool,
    max_depth: int,
    wave_seconds: float,
    priority: str = "url",
) -> pa.Table:
    import ray

    key = (
        robots_ref.hex() if isinstance(robots_ref, ray.ObjectRef) else None,
        user_agent,
        per_host_budget,
        respect_robots,
        max_depth,
        wave_seconds,
        priority,
    )
    gate = _GATE_CACHE.get(key)
    if gate is None:
        bodies = ray.get(robots_ref) if isinstance(robots_ref, ray.ObjectRef) else (robots_ref or {})
        gate = PolitenessGate(
            bodies, user_agent, per_host_budget, respect_robots, max_depth,
            wave_seconds, priority
        )
        _GATE_CACHE[key] = gate
    if per_host_budget is None:
        return gate_rows(gate, group)
    return gate(group)


def _split_by_host(tbl: pa.Table):
    """Split a (possibly multi-key) admission group into per-key tables.

    One sort + contiguous run slicing — O(N log N), not O(unique_keys × N):
    the driver-side hybrid gate routes frontiers up to millions of rows
    through here, where a per-key filter loop would quadratically stall."""
    key = "gate_key" if "gate_key" in tbl.column_names else "host"
    hosts = tbl.column(key)
    uniq = pc.unique(hosts)
    if len(uniq) == 1:
        yield tbl
        return
    order = pc.sort_indices(tbl, sort_keys=[(key, "ascending")])
    tbl = tbl.take(order)
    import numpy as np

    keys = np.asarray(tbl.column(key).to_pylist(), dtype=object)
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    bounds = np.append(starts, len(keys))
    for s, e in zip(bounds[:-1], bounds[1:]):
        yield tbl.slice(s, e - s)
