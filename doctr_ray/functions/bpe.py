"""Distributed BPE tokenizer training and application.

Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") restructured
for Ray Data the way production trainers actually scale: the ONLY
corpus-sized step is a single distributed word-frequency pass — after
that, every merge iteration runs over the compressed (word_type,
count) table, which is bounded by ``max_word_types`` regardless of
corpus size (GPT-2's trainer does the same compression). The learned
merge table is tiny and broadcasts via ``ray.put`` into a stateless
task stage that encodes documents per batch.

Determinism contract (pinned in tests): merges pick (count desc, pair
lexicographic asc); the word-type table keeps the ``max_word_types``
most frequent words with the same tie-break; results are invariant to
input partitioning because integer counts are merged associatively.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EOW = "▁"  # end-of-word marker (the sentencepiece block char)


def word_counts(docs_ds, max_word_types: int = 100_000):
    """One distributed pass: (word, n) for the ``max_word_types`` most
    frequent whitespace words. Per-batch Counter partials -> one
    groupby(word) sum -> partial top-k per block -> single final
    combine (never a global sort of the full vocabulary)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import collections

        c: collections.Counter = collections.Counter()
        for t in batch["text"].to_pylist():
            c.update((t or "").split(" "))
        c.pop("", None)
        return pa.Table.from_pydict({"word": list(c.keys()), "n": list(c.values())})

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )

    def _topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["n", "word"], ascending=[False, True], kind="stable"
        ).head(max_word_types)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        agg.map_batches(_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_topk, batch_format="pyarrow", batch_size=None)
    )


def _merge_loop(wc: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge iterations over the compressed word-type
    table, with incremental pair-count maintenance (only words that
    contain the merged pair are re-scanned). O(num_merges x affected
    words), never a rescan of the full table per merge."""
    import collections

    # each word type -> list of symbols; seed pair counts + inverted index
    symbols: dict[str, list[str]] = {
        w: list(w) + [_EOW] for w in wc
    }
    pair_counts: collections.Counter = collections.Counter()
    pair_words: dict[tuple[str, str], set[str]] = collections.defaultdict(set)
    for w, syms in symbols.items():
        n = wc[w]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += n
            pair_words[(a, b)].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        merged_sym = best[0] + best[1]
        for w in list(pair_words.get(best, ())):
            syms = symbols[w]
            n = wc[w]
            # remove this word's old pair contributions
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= n
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(w)
            # apply the merge left-to-right
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = out
            # add new contributions
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += n
                pair_words[(a, b)].add(w)
    return merges


def train_bpe(docs_ds, num_merges: int = 200, max_word_types: int = 100_000):
    """Learn a BPE merge table from a corpus.

    Returns a Dataset of (rank, left, right, merged) — the artifact a
    tokenizer ships. The distributed part is the word-count pass; the
    merge loop runs driver-side over <= max_word_types rows (the
    standard compression: corpus scale never enters the iteration).
    """
    import ray.data as rd

    wc_df = word_counts(docs_ds, max_word_types=max_word_types).to_pandas()
    wc = dict(zip(wc_df["word"], wc_df["n"].astype(int)))
    merges = _merge_loop(wc, num_merges)
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
                "left": pa.array([m[0] for m in merges], pa.string()),
                "right": pa.array([m[1] for m in merges], pa.string()),
                "merged": pa.array([m[0] + m[1] for m in merges], pa.string()),
            }
        )
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encoding of one word (the GPT-2
    ``bpe()`` function shape)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Stateless-per-batch encoder over a broadcast merge table.

    A task stage, not an actor pool: the only state is the ray.put
    ref (resolved once per task process via the lru cache below), so
    it scales elastically with the cluster.
    """

    def __init__(self, merges_ref) -> None:
        self._ref = merges_ref
        self._ranks: dict[tuple[str, str], int] | None = None
        self._cache: dict[str, int] = {}

    def _get_ranks(self) -> dict[tuple[str, str], int]:
        if self._ranks is None:
            import ray

            mdf = ray.get(self._ref)
            self._ranks = {
                (l, r): int(k)
                for k, l, r in zip(mdf["rank"], mdf["left"], mdf["right"])
            }
        return self._ranks

    def __call__(self, batch: pa.Table) -> pa.Table:
        ranks = self._get_ranks()
        n_words, n_sub = [], []
        for t in batch["text"].to_pylist():
            words = [w for w in (t or "").split(" ") if w]
            total = 0
            for w in words:
                c = self._cache.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    if len(self._cache) < 200_000:
                        self._cache[w] = c
                total += c
            n_words.append(len(words))
            n_sub.append(total)
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                pa.array(n_words, pa.int64()),
                pa.array(n_sub, pa.int64()),
            ],
            names=["doc_id", "n_words", "n_bpe_tokens"],
        )


def apply_bpe(docs_ds, merges_df: pd.DataFrame):
    """Encode every document with a learned merge table: (doc_id,
    n_words, n_bpe_tokens). The merge table broadcasts once via
    ray.put; encoding is a task stage with a per-process word cache."""
    import ray

    ref = ray.put(
        {
            "rank": merges_df["rank"].tolist(),
            "left": merges_df["left"].tolist(),
            "right": merges_df["right"].tolist(),
        }
    )
    return docs_ds.map_batches(BpeEncoder(ref), batch_format="pyarrow")
