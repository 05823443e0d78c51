"""Exact distributed quantiles: histogram-merge per group.

The scale pattern for percentiles over bounded discrete domains
(lengths, token counts, scores in fixed-point): each batch collapses to
(group, value, count) partial-histogram rows — the shuffle moves
distinct values per group, never data rows — and a per-group reducer
sorts the merged histogram and reads quantiles off the cumulative
counts. Exact (no t-digest approximation) whenever the value domain is
discrete, which in this engine it always is (int64 fixed-point
everywhere, CLAUDE.md oracle-numerics invariant).

Quantile semantics match DuckDB's ``quantile_disc``: the value at
1-based rank ``ceil(q * n)`` with EXACT arithmetic — the engine
computes ``ceil(p * n / 100)`` in integer math (``-(-p * n // 100)``),
so e.g. p90 over n=10 is rank 9, not the float-ulp rank 10 that naive
``ceil(0.9 * 10)`` in float64 produces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def group_quantiles(ds, value_col: str, group_col: str,
                    percents: tuple[int, ...] = (25, 50, 75, 90)):
    """One row per group: ``group_col, n, p<P> ...`` exact discrete
    quantiles of ``value_col`` (int domain)."""
    for p in percents:
        if not 0 < p <= 100:
            raise ValueError(f"percents must be in (0, 100], got {p}")

    def _partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_pandas(),
                "v": batch[value_col].to_numpy(zero_copy_only=False),
            }
        )
        out = df.groupby(["g", "v"], sort=False).size().reset_index(name="cnt")
        return pa.Table.from_arrays(
            [
                pa.Array.from_pandas(out["g"], type=batch.schema.field(group_col).type),
                pa.array(out["v"].to_numpy(dtype=np.int64), pa.int64()),
                pa.array(out["cnt"].to_numpy(dtype=np.int64), pa.int64()),
            ],
            names=[group_col, "v", "cnt"],
        )

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        hist = g.groupby("v", sort=True)["cnt"].sum()
        values = hist.index.to_numpy(dtype=np.int64)
        cum = np.cumsum(hist.to_numpy(dtype=np.int64))
        n = int(cum[-1])
        row: dict = {group_col: g[group_col].iloc[0], "n": n}
        for p in percents:
            rank = -(-p * n // 100)  # ceil(p*n/100) in exact int math
            row[f"p{p}"] = int(values[np.searchsorted(cum, rank)])
        return pd.DataFrame([row])

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(_reduce, batch_format="pandas")
    )


def group_quantiles_sql(value_col: str, group_col: str, table: str = "documents",
                        percents: tuple[int, ...] = (25, 50, 75, 90)) -> str:
    """DuckDB mirror via ``quantile_disc`` (decimal quantile literals —
    DuckDB's exact-arithmetic rank matches the engine's integer ceil)."""
    qs = ", ".join(
        f"CAST(quantile_disc({value_col}, {p / 100}) AS BIGINT) AS p{p}"
        for p in percents
    )
    return (
        f"SELECT {group_col}, count(*) AS n, {qs} FROM {table} "
        f"GROUP BY {group_col}"
    )


def group_moments(ds, value_col: str, group_col: str):
    """Exact distributed moments per group: the mergeable-partials
    pattern (each batch collapses to (group, n, sum, sumsq); a tiny
    groupby merges them; means/variances come out in int64 fixed-point
    with HUGEINT-exact integer arithmetic — Python big ints here,
    HUGEINT in the oracle — so no float accumulation order can flip a
    ulp). Population variance: var = (n*sumsq - sum^2) / n^2.

    Output: ``group_col, n, sum, mean_e6, var_e6``.
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_pandas(),
                "v": batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        df["v2"] = df["v"] * df["v"]
        df["one"] = 1
        out = df.groupby("g", sort=False)[["one", "v", "v2"]].sum().reset_index()
        out.columns = [group_col, "n", "sum", "sumsq"]
        return pa.Table.from_arrays(
            [
                pa.Array.from_pandas(out[group_col], type=batch.schema.field(group_col).type),
                pa.array(out["n"].to_numpy(dtype=np.int64), pa.int64()),
                pa.array(out["sum"].to_numpy(dtype=np.int64), pa.int64()),
                pa.array(out["sumsq"].to_numpy(dtype=np.int64), pa.int64()),
            ],
            names=[group_col, "n", "sum", "sumsq"],
        )

    def _finish(batch: pa.Table) -> pa.Table:
        ns = batch["n"].to_pylist()
        sums = batch["sum"].to_pylist()
        sqs = batch["sumsq"].to_pylist()
        mean_e6 = [s * 1_000_000 // n for s, n in zip(sums, ns)]  # exact big ints
        var_e6 = [
            (n * q - s * s) * 1_000_000 // (n * n)
            for n, s, q in zip(ns, sums, sqs)
        ]
        return pa.Table.from_arrays(
            [
                batch[group_col],
                pa.array(ns, pa.int64()),
                pa.array(sums, pa.int64()),
                pa.array(mean_e6, pa.int64()),
                pa.array(var_e6, pa.int64()),
            ],
            names=[group_col, "n", "sum", "mean_e6", "var_e6"],
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum", alias_name="sum"),
            Sum("sumsq", alias_name="sumsq"),
        )
        .map_batches(_finish, batch_format="pyarrow")
    )


def group_moments_sql(value_col: str, group_col: str, table: str = "documents") -> str:
    """DuckDB mirror in HUGEINT-exact integer arithmetic (nonnegative
    values assumed: Python floor division and DuckDB's truncating //
    agree on nonnegative operands)."""
    return (
        f"WITH a AS (SELECT {group_col}, count(*) AS n, "
        f"sum(CAST({value_col} AS HUGEINT)) AS s, "
        f"sum(CAST({value_col} AS HUGEINT) * {value_col}) AS q FROM {table} "
        f"GROUP BY {group_col}) "
        f"SELECT {group_col}, n, CAST(s AS BIGINT) AS sum, "
        "CAST(s * 1000000 // n AS BIGINT) AS mean_e6, "
        "CAST((n * q - s * s) * 1000000 // (n * n) AS BIGINT) AS var_e6 FROM a"
    )


def quantile_gated_docs(ds, p: int = 25, value_col: str = "n_chars",
                        group_col: str = "source"):
    """Two-pass percentile-gated filter: keep documents whose value is
    >= their OWN group's exact p-th percentile (per-source length
    floor — the grouped-threshold cleaning shape). Pass 1 is the exact
    distributed quantile (histogram-merge partials, one tiny row per
    group); the thresholds broadcast via ``ray.put`` (group count is
    small by construction); pass 2 is a vectorized gate — the corpus
    streams through once per pass and never shuffles.

    Output: ``doc_id, group_col, value_col`` for survivors.
    """
    import ray

    th_rows = group_quantiles(ds, value_col, group_col, percents=(p,)).to_pandas()
    thresholds = dict(zip(th_rows[group_col], th_rows[f"p{p}"].astype(np.int64)))
    tref = ray.put(thresholds)

    class _Gate:
        def __init__(self, ref) -> None:
            self.ref = ref
            self.th = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.th is None:
                self.th = ray.get(self.ref)
            groups = batch[group_col].to_pylist()
            vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
            lim = np.array([self.th.get(g, np.iinfo(np.int64).max) for g in groups])
            return batch.filter(pa.array(vals >= lim))

    return ds.map_batches(_Gate(tref), batch_format="pyarrow")


def quantile_gated_docs_sql(p: int = 25, value_col: str = "n_chars",
                            group_col: str = "source",
                            table: str = "documents") -> str:
    """DuckDB mirror: quantile_disc threshold join (same exact rank
    arithmetic as group_quantiles)."""
    return (
        f"WITH th AS (SELECT {group_col}, "
        f"CAST(quantile_disc({value_col}, {p / 100}) AS BIGINT) AS lim "
        f"FROM {table} GROUP BY {group_col}) "
        f"SELECT d.doc_id, d.{group_col}, d.{value_col} FROM {table} d "
        f"JOIN th USING ({group_col}) WHERE d.{value_col} >= th.lim"
    )
