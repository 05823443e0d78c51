"""BM25-style distributed retrieval: stats correctness, scoring
monotonicity, top-k merge behavior."""

import pyarrow as pa
import pytest
import ray.data as rd

from doctr_ray.functions.search import bm25_topk, corpus_query_stats


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        )
    )


def test_corpus_query_stats(ray_session):
    ds = _docs([("a", "x y z"), ("b", "x x"), ("c", "")])
    stats = corpus_query_stats(ds, ["x", "q"])
    assert stats["N"] == 3
    assert stats["avgdl"] == pytest.approx(5 / 3)
    assert stats["df"] == {"x": 2, "q": 0}


def test_bm25_ranks_relevance(ray_session):
    ds = _docs(
        [
            ("heavy", "cat cat cat dog"),
            ("light", "cat bird fish tree"),
            ("none", "bird fish tree rock"),
            ("rare", "zebra cat"),
        ]
    )
    out = bm25_topk(ds, "cat zebra", k=4).to_pandas()
    # 'rare' contains the rarest term -> largest idf contribution
    assert out.iloc[0]["doc_id"] == "rare"
    assert set(out["doc_id"]) == {"rare", "heavy", "light"}  # 'none' scores 0
    assert list(out["rank"]) == [1, 2, 3]
    assert (out["score_e6"].diff().dropna() <= 0).all()


def test_bm25_topk_respects_k_and_ties(ray_session):
    rows = [(f"d{i}", "term filler") for i in range(10)]
    ds = _docs(rows).repartition(4)
    out = bm25_topk(ds, "term", k=5).to_pandas()
    assert len(out) == 5
    # identical scores -> lexicographic doc_id order
    assert list(out["doc_id"]) == sorted(out["doc_id"])
