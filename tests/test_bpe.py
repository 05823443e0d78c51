"""BPE training: brute-force Sennrich reference parity, partitioning
invariance, encode/merge consistency, corpus integration."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa

from doctr_ray.functions.bpe import (
    _EOW,
    _merge_loop,
    apply_bpe,
    encode_word,
    train_bpe,
)


def _brute_bpe(wc: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Textbook Sennrich trainer: full pair recount every iteration."""
    symbols = {w: list(w) + [_EOW] for w in wc}
    merges = []
    for _ in range(num_merges):
        counts: collections.Counter = collections.Counter()
        for w, syms in symbols.items():
            for p in zip(syms, syms[1:]):
                counts[p] += wc[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in symbols.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = out
    return merges


def test_merge_loop_matches_brute_force():
    wc = {
        "low": 5,
        "lower": 2,
        "newest": 6,
        "widest": 3,
        "aaa": 4,  # overlapping-pair edge: left-to-right merge
    }
    assert _merge_loop(dict(wc), 12) == _brute_bpe(dict(wc), 12)


def test_merge_loop_matches_brute_force_random():
    import random

    rng = random.Random(3)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
        for _ in range(60)
    ]
    wc: dict[str, int] = {}
    for w in words:
        wc[w] = wc.get(w, 0) + rng.randint(1, 9)
    assert _merge_loop(dict(wc), 25) == _brute_bpe(dict(wc), 25)


def test_encode_word_respects_merge_ranks():
    wc = {"newest": 6, "widest": 3, "new": 4}
    merges = _merge_loop(dict(wc), 8)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in wc:
        syms = encode_word(w, ranks)
        # lossless: symbols concatenate back to word + end marker
        assert "".join(syms) == w + _EOW


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    rows = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(40)], pa.string()),
            "text": pa.array(
                [
                    " ".join(["the quick brown fox", "jumps over"][i % 2].split())
                    + f" tail{i % 5}"
                    for i in range(40)
                ],
                pa.string(),
            ),
        }
    )
    m1 = train_bpe(rd.from_arrow(rows).repartition(1), num_merges=15).to_pandas()
    m8 = train_bpe(rd.from_arrow(rows).repartition(8), num_merges=15).to_pandas()
    pd.testing.assert_frame_equal(m1, m8)


def test_corpus_integration(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    merges = train_bpe(docs, num_merges=50, max_word_types=5000).to_pandas()
    assert len(merges) == 50
    assert (merges["merged"] == merges["left"] + merges["right"]).all()
    enc = apply_bpe(docs, merges).to_pandas()
    assert len(enc) == docs.count()
    # merges compress: subword count strictly between words and chars
    assert (enc["n_bpe_tokens"] >= enc["n_words"]).all()
    total_chars = sum(
        len(w) + 1
        for t in pd.read_parquet("/root/testdata/sf0.001/documents.parquet")["text"]
        for w in (t or "").split(" ")
        if w
    )
    assert enc["n_bpe_tokens"].sum() < total_chars
