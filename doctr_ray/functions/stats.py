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
