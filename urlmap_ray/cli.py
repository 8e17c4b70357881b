"""CLI mirroring the reference's flag surface (main.go:82-113) over the
corpus-backed Ray engine.

    python -m urlmap_ray.cli https://h00000.example.org/ --corpus /tmp/corpus \
        [--depth -1] [--output text|json|csv|xml] [--respect-robots]
        [--budget N] [--checkpoint DIR] [--resume] [--file OUT]

Differences from the reference, inherent to corpus mode: --corpus replaces
live HTTP; --concurrent maps to Ray parallelism (the streaming executor
schedules, so it is accepted and used as the seen-shard count hint);
--rate-limit rps maps to the deterministic per-wave host budget. JS-rendering
flags are accepted but inert (corpus pages are pre-rendered; see SURVEY §2.1
S2).

Owns its Ray session (scripts must leave driver-managed sessions alone).
"""

from __future__ import annotations

import argparse
import signal
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="urlmap-ray", description="Ray-Data-native URL frontier crawler")
    p.add_argument("url", nargs="?", default=None, help="seed URL to start crawling from")
    p.add_argument(
        "--seeds-file",
        default=None,
        help="seed list file (txt/csv/jsonl/parquet with a 'url' column) instead of a positional URL",
    )
    p.add_argument("--corpus", required=True, help="corpus directory (pages/ + robots.parquet)")
    p.add_argument("-d", "--depth", type=int, default=-1, help="max crawl depth (-1 unlimited)")
    p.add_argument("-c", "--concurrent", type=int, default=10, help="parallelism hint")
    p.add_argument("-r", "--rate-limit", type=int, default=0, help="per-host URLs per wave (0 = unlimited)")
    p.add_argument("-o", "--output", default="text", choices=["text", "json", "csv", "xml"])
    p.add_argument("--file", default=None, help="write text output to file instead of stdout")
    p.add_argument("--respect-robots", action="store_true")
    p.add_argument("--checkpoint", default=None, help="checkpoint directory")
    p.add_argument("--resume", action="store_true", help="resume from checkpoint")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("-q", "--quiet", action="store_true", help="suppress per-wave progress")
    # Accepted for flag parity; inert in corpus mode (pages are pre-rendered).
    p.add_argument("--js-render", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--js-timeout", type=int, default=30, help=argparse.SUPPRESS)
    return p


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if (args.url is None) == (args.seeds_file is None):
        parser.error("exactly one of a seed URL or --seeds-file is required")

    import ray

    from .config import CrawlConfig
    from .corpus import CorpusInfo
    from .pipelines.crawl import CrawlEngine
    from .sinks import render, write_file
    from .urlnorm import URLError

    import json
    import os

    manifest = os.path.join(args.corpus, "corpus.json")
    if not os.path.exists(manifest):
        print(f"error: no corpus manifest at {manifest}", file=sys.stderr)
        return 2
    with open(manifest) as f:
        m = json.load(f)
    info = CorpusInfo(
        args.corpus, m["n_pages"], m["n_hosts"], m["seed"], m["partitions"], m["seeds"]
    )

    cfg = CrawlConfig(
        max_depth=args.depth,
        respect_robots=args.respect_robots,
        per_host_budget=args.rate_limit or None,
    )
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", log_to_driver=args.verbose)
    try:
        # Live progress (reference progress.go:200-254, mapped to wave
        # granularity): one stderr line per completed wave with rate, queue
        # size and depth. On by default; --quiet for scripting.
        def _progress(stats, outcome):
            fetched = sum(w.admitted - w.failed for w in outcome.waves)
            rate = stats.admitted / stats.seconds if stats.seconds > 0 else 0.0
            queue = stats.new_urls + stats.deferred
            print(
                f"\rwave {stats.wave}: {stats.admitted} crawled "
                f"({fetched} total) · {rate:,.0f} urls/s · queue {queue} · "
                f"{stats.seconds:.1f}s",
                file=sys.stderr,
                flush=True,
            )

        # Sub-wave ticker (reference progress.go:200-254): during a long
        # wave, a 500 ms heartbeat with fetch progress so multi-minute waves
        # aren't silent between the per-wave lines above.
        def _tick(t):
            print(
                f"\r  wave {t['wave']}: {t['elapsed']:.1f}s · "
                f"{t['fetched']}/{t['frontier']} fetched · "
                f"{t['rate']:,.0f} urls/s",
                end="",
                file=sys.stderr,
                flush=True,
            )

        eng = CrawlEngine(
            info,
            cfg,
            checkpoint_dir=args.checkpoint,
            seen_shards=max(1, args.concurrent // 4),
            on_wave=None if args.quiet else _progress,
            on_tick=None if args.quiet else _tick,
        )

        # Graceful cancel (reference main.go:182-220): first SIGINT/SIGTERM
        # stops at the next wave boundary and still emits the partial visited
        # set (checkpoint stays resumable); a second signal restores the
        # default handler, so Ctrl-C twice force-quits.
        prev_handlers = {}

        def _on_signal(signum, frame):
            eng.request_stop()
            print(
                "\ninterrupt received — finishing current wave, writing partial "
                "output (repeat to force quit)",
                file=sys.stderr,
            )
            for s, h in prev_handlers.items():
                signal.signal(s, h)

        for s in (signal.SIGINT, signal.SIGTERM):
            prev_handlers[s] = signal.signal(s, _on_signal)

        if args.seeds_file:
            from .sources import read_seed_list

            seeds: str | list[str] = read_seed_list(args.seeds_file)
        else:
            seeds = args.url
        outcome = eng.crawl(seeds, resume=args.resume)
        urls = eng.visited_urls()
    except URLError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        ray.shutdown()

    if args.file:
        write_file(urls, args.file)
    else:
        sys.stdout.write(render(urls, args.output))
    if outcome.interrupted:
        print(
            f"crawl interrupted: {len(urls)} URLs from {len(outcome.waves)} "
            f"completed waves (resume with --resume"
            + (f" --checkpoint {args.checkpoint}" if args.checkpoint else "")
            + ")",
            file=sys.stderr,
        )
        return 130
    print(
        f"crawl complete: {len(urls)} URLs, {len(outcome.waves)} waves, "
        f"max depth {outcome.max_depth_reached}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
