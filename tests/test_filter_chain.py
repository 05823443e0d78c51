"""Composed corpus-filter chain: gate semantics, keep-first dedup,
and block-layout independence."""

import pyarrow as pa
import ray.data as rd

from doctr_ray.functions.filter_chain import corpus_filter


def _corpus():
    # crafted docs: one per gate, survivors, and an exact-dup pair
    good = " ".join(["the"] + [f"word{i}" for i in range(30)])  # en, varied
    docs = [
        (1, good, "web"),                                   # survives (keeper)
        (2, good, "web"),                                   # exact dup of 1
        (3, " ".join(f"tok{i}" for i in range(25)), "web"), # und lang -> drop
        (4, "the " + "spam " * 40, "web"),                  # low ttr -> drop
        (5, "the " + " ".join("ab" for _ in range(30)), "web"),  # short toks
        (6, "the tiny doc", "web"),                         # < min_tokens
        (7, "the " + " ".join(f"w{i:04d} extra" for i in range(20)), "books"),
    ]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": [d[0] for d in docs],
                "text": [d[1] for d in docs],
                "source": [d[2] for d in docs],
            }
        )
    )


def test_gates_and_keep_first(ray_session):
    rows = sorted(
        (r["doc_id"], r["source"], r["n_tokens"])
        for r in corpus_filter(_corpus()).take_all()
    )
    # doc 1 kept (min doc_id of the dup pair), doc 7 kept; 2-6 dropped
    assert [r[0] for r in rows] == [1, 7]
    assert rows[0] == (1, "web", 31)
    assert rows[1][1] == "books"


def test_block_layout_independent(ray_session):
    a = sorted(r["doc_id"] for r in corpus_filter(_corpus()).take_all())
    b = sorted(
        r["doc_id"] for r in corpus_filter(_corpus().repartition(5)).take_all()
    )
    assert a == b == [1, 7]


def test_thresholds_are_parameters(ray_session):
    # loosening every gate keeps everything except the und-language doc
    rows = corpus_filter(
        _corpus(), min_tokens=1, min_ttr_e6=0, max_short_e6=1_000_000
    ).take_all()
    kept = sorted(r["doc_id"] for r in rows)
    assert kept == [1, 4, 5, 6, 7]  # 2 deduped, 3 is 'und'
