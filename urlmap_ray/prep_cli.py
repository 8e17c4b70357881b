"""CLI for the composed pre-training data-prep pipeline.

    python -m urlmap_ray.prep_cli --input docs.parquet --output /tmp/prep \
        [--lang en] [--min-words 10] [--threshold 0.8] \
        [--fractions train=0.8,val=0.1,test=0.1] \
        [--eval-parquet bench.parquet [--eval-text-col text]] [--quiet]

Runs gates → near-dup clustering → canonical selection → deterministic
split (pipelines/prep.py) over a documents Parquet table (columns
doc_id:int64, text:string[, lang:string]) and writes (doc_id, split) as
RESUMABLE split-partitioned Parquet — re-running after a failure writes
only the missing split partitions (sinks.write_resumable_parquet).

Owns its Ray session (driver-managed sessions never import this module).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="urlmap-ray-prep", description="pre-training corpus prep pipeline"
    )
    p.add_argument("--input", required=True,
                   help="documents parquet file/dir, or WARC file(s)/dir")
    p.add_argument("--input-format", choices=["parquet", "warc", "wet"],
                   default="parquet",
                   help="'warc' ingests Common-Crawl-style archives: "
                        "html → paragraph text, doc_id = url hash, "
                        "lang via the n-gram identifier; 'wet' ingests "
                        "pre-extracted text (WARC conversion records) "
                        "skipping the html stage")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--lang", default="en",
                   help="keep only this lang value ('' disables the gate)")
    p.add_argument("--min-words", type=int, default=10)
    p.add_argument("--threshold", type=float, default=0.8,
                   help="near-dup Jaccard threshold")
    p.add_argument("--fractions", default="train=0.8,val=0.1,test=0.1",
                   help="split fractions as name=frac[,name=frac...]")
    p.add_argument("--eval-parquet", default=None,
                   help="benchmark eval-set parquet for decontamination")
    p.add_argument("--eval-text-col", default="text")
    p.add_argument("--quiet", "-q", action="store_true")
    return p


def warc_documents(paths):
    """WARC archive(s) → streaming Dataset in the documents schema
    (doc_id:int64, text, lang): html records only, paragraph-text
    extraction (the engine's text operator), doc_id = low-63-bit md5 of
    the URL (deterministic at any cluster size), lang via the n-gram
    identifier. All row-local — file-level read parallelism carries
    straight into the prep gates with zero shuffles."""
    import hashlib

    import pyarrow as pa

    from urlmap_ray.extract import extract_text
    from urlmap_ray.functions.textstats import lang_id
    from urlmap_ray.sources.warc import read_warc

    def to_docs(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        texts: list[str] = []
        langs: list[str] = []
        for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
            if not h:
                continue
            txt = extract_text(h)
            ids.append(
                int.from_bytes(
                    hashlib.md5((u or "").encode("utf-8")).digest()[:8], "little"
                )
                >> 1
            )
            texts.append(txt)
            langs.append(lang_id(txt))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    return read_warc(paths).map_batches(
        to_docs, batch_format="pyarrow", zero_copy_batch=True
    )


def wet_documents(paths):
    """WET (extracted-text) archive(s) → streaming Dataset in the
    documents schema — same id/lang rules as :func:`warc_documents`, no
    html stage (WET payloads are already plain text)."""
    import hashlib

    import pyarrow as pa

    from urlmap_ray.functions.textstats import lang_id
    from urlmap_ray.sources.warc import read_wet

    def to_docs(t: pa.Table) -> pa.Table:
        ids, texts, langs = [], [], []
        for u, txt in zip(t.column("url").to_pylist(), t.column("text").to_pylist()):
            if not txt:
                continue
            ids.append(
                int.from_bytes(
                    hashlib.md5((u or "").encode("utf-8")).digest()[:8], "little"
                )
                >> 1
            )
            texts.append(txt)
            langs.append(lang_id(txt))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    return read_wet(paths).map_batches(
        to_docs, batch_format="pyarrow", zero_copy_batch=True
    )


def parse_fractions(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, frac = part.partition("=")
        if not name or not frac:
            raise SystemExit(f"bad --fractions entry: {part!r}")
        try:
            f = float(frac)
        except ValueError:
            raise SystemExit(f"bad --fractions value: {part!r}") from None
        if not 0.0 < f <= 1.0:
            raise SystemExit(f"--fractions values must be in (0, 1]: {part!r}")
        out[name.strip()] = f
    if abs(sum(out.values()) - 1.0) > 1e-9:
        raise SystemExit(f"--fractions must sum to 1.0, got {sum(out.values())}")
    return out


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    fractions = parse_fractions(args.fractions)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    try:
        import ray.data

        eval_hashes = None
        if args.eval_parquet:
            import pyarrow.parquet as pq

            from urlmap_ray.functions.decontam import eval_ngram_hashes

            texts = (
                pq.read_table(args.eval_parquet, columns=[args.eval_text_col])
                .column(args.eval_text_col)
                .to_pylist()
            )
            eval_hashes = eval_ngram_hashes(texts)
            if not args.quiet:
                print(
                    f"decontamination: {len(texts)} eval docs, "
                    f"{len(eval_hashes)} shingle hashes",
                    file=sys.stderr,
                )

        from urlmap_ray.pipelines.prep import prep_docs
        from urlmap_ray.sinks import write_resumable_parquet

        if args.input_format == "warc":
            docs = warc_documents(args.input)
        elif args.input_format == "wet":
            docs = wet_documents(args.input)
        else:
            docs = ray.data.read_parquet(args.input)
        result = prep_docs(
            docs,
            eval_hashes=eval_hashes,
            lang=args.lang or None,
            min_words=args.min_words,
            threshold=args.threshold,
            fractions=fractions,
            sort=False,  # the partition groupby reshuffles anyway
        )
        manifest = write_resumable_parquet(
            result, args.output, partition_col="split"
        )
        if not args.quiet:
            for r in manifest.sort_by("partition").to_pylist():
                print(
                    f"split={r['partition']}: {r['n_rows']} docs -> {r['path']}",
                    file=sys.stderr,
                )
            print(
                f"kept {sum(r['n_rows'] for r in manifest.to_pylist())} canonical "
                f"docs into {args.output}",
                file=sys.stderr,
            )
        return 0
    finally:
        if owns_session:  # never tear down a caller's session
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
