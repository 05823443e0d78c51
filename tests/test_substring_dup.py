"""Exact substring-level duplication: rolling-hash exactness, cross-doc
vs within-doc semantics, short-doc zero rows, DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from doctr_ray.functions.dedup import (
    _ss_gram_keys,
    substring_dup_sql,
    substring_dup_stats,
)


def test_rolling_hash_matches_substring_equality():
    import random

    rng = random.Random(11)
    # small alphabet forces many genuine repeats
    txt = "".join(rng.choice("abc") for _ in range(4000))
    k = 8
    keys = _ss_gram_keys(txt, k)
    grams = [txt[i : i + k] for i in range(len(txt) - k + 1)]
    key_of: dict[str, int] = {}
    gram_of: dict[int, str] = {}
    for g, h in zip(grams, keys):
        h = int(h)
        assert key_of.setdefault(g, h) == h  # stable
        assert gram_of.setdefault(h, g) == g  # collision-free here
    assert len(set(keys)) < len(keys)  # repeats actually exercised


def test_unicode_code_point_semantics():
    # characters, not bytes: matches SQL substr/length over UTF-8
    t = "héllo wörld ünïcode ❤ " * 40
    k = 32
    keys = _ss_gram_keys(t, k)
    assert len(keys) == len(t) - k + 1


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_semantics(ray_session):
    import ray.data as rd

    shared = "S" * 16 + "0123456789abcdef"  # exactly 32 chars
    rows = [
        # a and b share one 32-gram; every position of it counts in both
        ("a", "xxxx" + shared + "yyyy"),
        ("b", "zz" + shared + "qqqq"),
        # c repeats a 32-gram WITHIN itself only -> not cross-doc dup
        ("c", ("R" * 16 + "0123456789ABCDEF") * 2),
        # d is too short for any 32-gram -> zero counts, still present
        ("d", "tiny"),
    ]
    out = (
        substring_dup_stats(rd.from_arrow(_docs(rows)))
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(out) == 4
    # doc a: text len 40 -> 9 positions, exactly one (the shared gram
    # at offset 4) duplicated cross-doc
    assert out.loc["a", "n_pos"] == 9
    assert out.loc["a", "n_dup_pos"] == 1
    assert out.loc["b", "n_dup_pos"] == 1
    assert out.loc["c", "n_dup_pos"] == 0
    assert out.loc["c", "n_pos"] == 33  # len 64 -> 33 positions
    assert out.loc["d", "n_pos"] == 0
    assert out.loc["d", "dup_frac_e6"] == 0
    assert out.loc["a", "dup_frac_e6"] == 1_000_000 // 9


def test_duckdb_parity(ray_session):
    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    got = (
        substring_dup_stats(
            rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got["doc_id"] = got["doc_id"].astype(str)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.sql(substring_dup_sql()).df().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_dup_pos"] > 0).any()  # corpus has real cross-doc repeats
