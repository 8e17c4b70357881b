"""Job entry point for ``ray job submit`` (north_rule: resumable runs under
ray job submit on a fixed-size cluster).

    ray job submit --working-dir /root/repo -- \
        python tools/submit_crawl.py --corpus /data/corpus \
        --seeds https://h00000.example.org/ --checkpoint /data/ckpt --resume

In this sandbox there is no multi-node cluster; the same script runs
standalone (Ray auto-initializes in local mode). The crawl checkpoints every
wave, so re-submitting with --resume after a job kill continues from the
last complete wave.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--seeds", nargs="+", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--depth", type=int, default=-1)
    p.add_argument("--budget", type=int, default=None)
    p.add_argument("--respect-robots", action="store_true")
    p.add_argument("--salt", type=int, default=0)
    p.add_argument("--seen-shards", type=int, default=8)
    p.add_argument("--output", default=None, help="write sorted visited parquet here")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from urlmap_ray.config import CrawlConfig
    from urlmap_ray.corpus import CorpusInfo
    from urlmap_ray.pipelines.crawl import CrawlEngine
    from urlmap_ray.sinks import write_visited_parquet

    with open(os.path.join(args.corpus, "corpus.json")) as f:
        m = json.load(f)
    info = CorpusInfo(
        args.corpus, m["n_pages"], m["n_hosts"], m["seed"], m["partitions"], m["seeds"]
    )
    cfg = CrawlConfig(
        max_depth=args.depth,
        per_host_budget=args.budget,
        respect_robots=args.respect_robots,
        hot_host_salt=args.salt,
    )
    eng = CrawlEngine(info, cfg, checkpoint_dir=args.checkpoint, seen_shards=args.seen_shards)
    outcome = eng.crawl(args.seeds, resume=args.resume)
    print(
        json.dumps(
            {
                "waves": len(outcome.waves),
                "results": outcome.total_results,
                "max_depth": outcome.max_depth_reached,
                "checkpoint": outcome.checkpoint_dir,
            }
        )
    )
    if args.output:
        write_visited_parquet(eng.visited_dataset(), args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
