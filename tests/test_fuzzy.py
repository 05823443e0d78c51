"""Fuzzy join (edit distance 1): within-one checker, blocking recall,
dedup across variants, DuckDB levenshtein parity."""

import pyarrow as pa
import pytest
import ray.data as rd

from doctr_ray.functions.fuzzy import _within_one, fuzzy_pairs


@pytest.mark.parametrize(
    "a,b,ok",
    [
        ("abc", "abc", True),       # equal
        ("abc", "abd", True),       # substitution
        ("abc", "ab", True),        # deletion
        ("abc", "abcd", True),      # insertion
        ("abc", "xabc", True),      # front insertion
        ("abc", "adc", True),
        ("abc", "xyc", False),      # two substitutions
        ("abc", "a", False),        # two deletions
        ("abc", "cab", False),      # rotation = 2 edits
        ("", "a", True),
        ("", "", True),
    ],
)
def test_within_one(a, b, ok):
    assert _within_one(a, b) == ok


def test_fuzzy_pairs_matches_duckdb(ray_session):
    names = (
        [f"user{i:03d}" for i in range(40)]
        + ["user00x", "usr001", "user0011", "totally-different"]
    )
    t = pa.table({"c_name": names})
    mine = sorted(
        (r["a"], r["b"]) for r in fuzzy_pairs(rd.from_arrow(t), "c_name").take_all()
    )
    import duckdb

    con = duckdb.connect()
    con.register("tbl", t)
    oracle = sorted(
        tuple(r)
        for r in con.sql(
            "SELECT a.c_name, b.c_name FROM tbl a JOIN tbl b "
            "ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) = 1"
        ).fetchall()
    )
    assert mine == oracle
    assert len(mine) > 50  # the numbered names are dense in distance-1 space


def test_fuzzy_pairs_dedup_and_block_independence(ray_session):
    names = [f"w{i}" for i in range(30)] + ["w1x"]
    t = pa.table({"c_name": names})
    a = sorted((r["a"], r["b"]) for r in fuzzy_pairs(rd.from_arrow(t), "c_name").take_all())
    assert len(a) == len(set(a))  # no duplicate pairs across variants
    b = sorted(
        (r["a"], r["b"])
        for r in fuzzy_pairs(rd.from_arrow(t).repartition(5), "c_name").take_all()
    )
    assert a == b
