"""BPE vocabulary training + encoding (Sennrich et al. 2016) — the
tokenizer-prep step of an LLM data pipeline: learn merge rules from corpus
word frequencies, then count real subword tokens per document.

Scale shape (the pivot/tfidf declared-cap trust model):

- **Stage 1 — word counts — is the 100-TB part and is fully
  distributed**: per-batch ``Counter`` partials pre-aggregate before the
  one term-keyed shuffle (each batch ships its distinct words, not its
  tokens — the ``vocab_topk`` shape, textstats.py:125-170), then a
  per-block prune cuts the global sort input to blocks×``max_words`` rows
  before the tiny ``sort().limit()``.
- **Stage 2 — the merge loop — runs over that capped table**: BPE is
  trained on a word-frequency summary in every practical system, and the
  cap makes the summary a DECLARED bound (``max_words`` rows ×
  avg word length — tens of MB at 2^20 words), not corpus-sized driver
  state. The loop itself is the classic incremental-index algorithm: a
  pair→words inverted index so each merge touches only the words that
  contain the pair, O(affected) per round instead of O(vocab).
- **Encoding is row-local actor-pool inference**: the ranks table builds
  once per actor in ``__init__`` (the model-load pattern,
  quality_model.py), words memoize their encoding per actor, counts are
  integer ⇒ bit-equal at any parallelism.

Determinism contract (mirrored by the single-process reference in
expected.py — SQL cannot express the merge recursion, the kmeans/PCA
trust model): words are raw whitespace tokens (the ``doc_token_counts``
contract); symbols start as the word's characters plus a final ``</w>``
marker; each round merges the pair with the highest weighted count, ties
broken by (left, right) lexicographic ascending; merge application scans
left-to-right (so ``aaa`` under merge ``(a,a)`` becomes ``aa`` + ``a``);
training stops early when no pair occurs twice.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["train_bpe", "word_count_table", "BPEEncoder", "bpe_token_counts"]

_EOW = "</w>"


def word_count_table(ds, *, max_words: int, text_col: str = "text"):
    """documents → top-``max_words`` (word, cnt) by (cnt desc, word asc).
    Distributed exact counts with Counter pre-aggregation; the declared
    cap bounds everything downstream."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t.column(text_col).to_pylist():
            c.update((txt or "").split())
        words = sorted(c)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "cnt": pa.array([c[w] for w in words], pa.int64()),
            }
        )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= max_words:
            return t
        order = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("word", "ascending")]
        )
        return t.take(order[:max_words])

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(local_topk, batch_size=None, batch_format="pyarrow")
        .sort(["cnt", "word"], descending=[True, False])
        .limit(max_words)
    )


def merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Apply one merge left-to-right (the pinned scan rule)."""
    out: list[str] = []
    i, n = 0, len(symbols)
    joined = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def merge_loop(
    word_counts: list[tuple[str, int]], *, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The incremental-index BPE trainer over a (word, count) summary.
    Returns [(rank, left, right, weighted_pair_count_at_merge)]."""
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (_EOW,), c) for w, c in word_counts
    ]
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, cnt) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += cnt
            pair_words[p].add(wi)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        if not pair_counts:
            break
        best_cnt = max(pair_counts.values())
        if best_cnt < 2:
            break  # nothing occurs twice — merging is pure memorization
        best = min(p for p, c in pair_counts.items() if c == best_cnt)
        merges.append((rank, best[0], best[1], best_cnt))
        for wi in list(pair_words[best]):
            syms, cnt = words[wi]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= cnt
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(wi)
            syms = merge_word(syms, best)
            words[wi] = (syms, cnt)
            for p in zip(syms, syms[1:]):
                pair_counts[p] += cnt
                pair_words[p].add(wi)
    return merges


def train_bpe(
    ds, *, n_merges: int, max_words: int = 65536, text_col: str = "text"
) -> pa.Table:
    """documents → merge table (rank, left, right, pair_count). The pull
    is the capped word-count summary (≤ max_words rows), never the corpus."""
    if n_merges <= 0 or max_words <= 0:
        raise ValueError("n_merges and max_words must be positive")
    wc = word_count_table(ds, max_words=max_words, text_col=text_col).take_all()
    merges = merge_loop(
        [(r["word"], r["cnt"]) for r in wc], n_merges=n_merges
    )
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Encode one word: repeatedly apply the LOWEST-rank merge present
    (the standard BPE inference rule)."""
    syms = tuple(word) + (_EOW,)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = merge_word(syms, best_pair)
    return syms


class BPEEncoder:
    """Actor-pool encoding stage: ranks built once per actor in
    ``__init__`` from the broadcast merge table, per-word encodings
    memoized across batches. → (doc_id, n_bpe_tokens, n_words)."""

    def __init__(self, merges_ref, *, text_col: str = "text", id_col: str = "doc_id"):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, pa.Table) else merges_ref
        self.ranks = {
            (l, r): k
            for k, l, r in zip(
                merges.column("rank").to_pylist(),
                merges.column("left").to_pylist(),
                merges.column("right").to_pylist(),
            )
        }
        self.text_col, self.id_col = text_col, id_col
        self._memo: dict[str, int] = {}

    def _word_len(self, w: str) -> int:
        n = self._memo.get(w)
        if n is None:
            n = len(encode_word(w, self.ranks))
            self._memo[w] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        n_tok, n_words = [], []
        for txt in t.column(self.text_col).to_pylist():
            ws = (txt or "").split()
            n_words.append(len(ws))
            n_tok.append(sum(self._word_len(w) for w in ws))
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "n_bpe_tokens": pa.array(n_tok, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
            }
        )


def bpe_token_counts(
    ds,
    merges: pa.Table,
    *,
    concurrency: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Distributed encoding: broadcast the merge table once (``ray.put``),
    score per batch in an actor pool.

    The pool is AUTOSCALING ``(1, concurrency)``, not a fixed count: a
    fixed-size pool of N CPU-1 actors on a cluster with exactly N CPUs
    starves the upstream read tasks of every core and the pipeline
    deadlocks (observed: a 600-row encode hanging forever in a 4-cpu
    test session). Min 1 actor always fits; the executor grows the pool
    only while spare CPUs exist."""
    import ray

    ref = ray.put(merges)
    return ds.map_batches(
        BPEEncoder,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, concurrency),
    )
