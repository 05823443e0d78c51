"""Near-dup clustering: distributed connected components over pair rows."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doctr_ray.functions.dedup import connected_components


def _pairs(*pairs):
    return rd.from_arrow(
        pa.table({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})
    )


def _clusters(ds):
    rows = ds.take_all()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_cc_single_component_chain(ray_session):
    # path graph a-b-c-d: diameter 3, exercises multi-round propagation
    got = _clusters(connected_components(_pairs(("a", "b"), ("b", "c"), ("c", "d"))))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_cc_multiple_components(ray_session):
    got = _clusters(
        connected_components(_pairs(("d1", "d2"), ("d2", "d3"), ("x1", "x2"), ("z8", "z9")))
    )
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "x1": "x1", "x2": "x1", "z8": "z8", "z9": "z8"}


def test_cc_duplicate_and_reversed_pairs(ray_session):
    got = _clusters(connected_components(_pairs(("b", "a"), ("a", "b"), ("b", "c"))))
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(11)
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = set()
    while len(edges) < 28:
        i, j = rng.integers(0, len(nodes), 2)
        if i != j:
            edges.add((nodes[min(i, j)], nodes[max(i, j)]))
    edges = sorted(edges)

    # driver-side union-find oracle
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for a, b in edges:
        for n in (a, b):
            expected[n] = find(n)
    # canonicalize: representative = min of component
    comp: dict[str, list[str]] = {}
    for n, r in expected.items():
        comp.setdefault(r, []).append(n)
    expected = {n: min(members) for r, members in comp.items() for n in members}

    got = _clusters(connected_components(_pairs(*edges)))
    assert got == expected


def test_cc_long_path_converges(ray_session):
    # 12-node path: worst-case (diameter) topology for hash-min; the
    # pointer-jump rounds must collapse it in O(log n) iterations
    edges = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(11)]
    got = _clusters(connected_components(_pairs(*edges)))
    assert set(got.values()) == {"p00"}
    assert len(got) == 12


def test_chunk_dedup_stats(ray_session):
    import pyarrow as pa

    from doctr_ray.functions.dedup import chunk_dedup_stats

    # 12-token chunks: doc a and b share their first chunk exactly;
    # doc c is unique
    shared = " ".join(f"w{i}" for i in range(12))
    t = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "text": [
                shared + " tail-a unique words here",
                shared + " different ending entirely now",
                "totally distinct content with no repeats at all",
            ],
        }
    )
    import ray.data as rd

    out = chunk_dedup_stats(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc["a", "n_chunks"] == 2 and out.loc["a", "n_dup_chunks"] == 1
    assert out.loc["b", "n_chunks"] == 2 and out.loc["b", "n_dup_chunks"] == 1
    assert out.loc["c", "n_dup_chunks"] == 0
    assert out.loc["a", "dup_frac_e6"] == 500000
