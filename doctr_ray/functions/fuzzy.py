"""Fuzzy join: edit-distance <= 1 pairs via deletion-neighborhood
blocking (FastSS) — the record-linkage / typo-dedup operator family.

All-pairs Levenshtein is O(n^2) and dead at scale; the deletion
neighborhood makes it a hash join: two strings are within edit
distance 1 iff they are equal, one is a single-character deletion of
the other, or deleting ONE (aligned) character from each yields the
same string (a substitution). So every string explodes to its <= L+1
deletion variants, variants hash-join (ONE coarse bucket shuffle), and
the candidate pairs are verified with an exact distance-<=1 check.
A second coarse shuffle dedups pairs discovered through multiple
variants. The oracle verifies against DuckDB's ``levenshtein`` over
all pairs (feasible at the sf0.01 gate; the engine path is the one
that scales).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from .dedup import PAIR_BUCKETS, _md5_bucket


def _within_one(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 (fast special case; agrees with any
    correct Levenshtein, including DuckDB's)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is one longer: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _del_variants(s: str) -> list[str]:
    return [s] + [s[:i] + s[i + 1 :] for i in range(len(s))]


def fuzzy_pairs(ds, col: str, buckets: int = PAIR_BUCKETS):
    """Distinct (a, b, dist) pairs with ``a < b`` and Levenshtein
    distance exactly 1 between values of ``col`` (identical values are
    exact-dup territory, not fuzzy matches — excluded)."""

    def _explode(batch: pa.Table) -> pa.Table:
        vals, keys, vbs = [], [], []
        for s in batch[col].to_pylist():
            s = s or ""
            for v in _del_variants(s):
                vals.append(s)
                keys.append(v)
                vbs.append(_md5_bucket(v, buckets))
        return pa.Table.from_arrays(
            [
                pa.array(vbs, pa.int32()),
                pa.array(keys, pa.string()),
                pa.array(vals, pa.string()),
            ],
            names=["vb", "variant", "val"],
        )

    def _candidates(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        # vectorized grouping by variant INSIDE the coarse bucket (a
        # per-variant groupby shuffle would pay ~1ms Python per tiny
        # group — the CLAUDE.md landmine)
        for _, grp in g.groupby("variant", sort=False):
            vs = sorted(set(grp["val"]))
            if len(vs) < 2:
                continue
            for i in range(len(vs)):
                for j in range(i + 1, len(vs)):
                    if _within_one(vs[i], vs[j]):
                        out_a.append(vs[i])
                        out_b.append(vs[j])
        df = pd.DataFrame({"a": out_a, "b": out_b})
        if len(df):
            df["pb"] = [_md5_bucket(a, buckets) for a in df["a"]]
        else:
            df["pb"] = pd.Series([], dtype="int64")
        return df

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["a", "b"])[["a", "b"]].copy()
        out["dist"] = 1
        out["dist"] = out["dist"].astype("int64")
        return out

    return (
        ds.map_batches(_explode, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(_candidates, batch_format="pandas")
        .groupby("pb")
        .map_groups(_dedup, batch_format="pandas")
    )


def fuzzy_pairs_sql(col: str, table: str) -> str:
    """DuckDB mirror: all-pairs Levenshtein (the recall oracle — O(n^2)
    by design, viable only at the correctness-gate scale)."""
    return (
        f"SELECT a.{col} AS a, b.{col} AS b, CAST(1 AS BIGINT) AS dist "
        f"FROM {table} a JOIN {table} b ON a.{col} < b.{col} "
        f"AND levenshtein(a.{col}, b.{col}) = 1"
    )
