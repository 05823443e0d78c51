"""Deterministic sampling and dataset splitting for training-data prep.

At 100 TB, sampling and train/val/test splitting must be DETERMINISTIC
functions of the row key — not ``random_shuffle`` (an all-to-all over
the full corpus) and not per-task RNG (irreproducible under retries and
cluster resizes). Every operator here derives its decision from
``md5(key | salt)``, so:

- re-running a failed partition reproduces the same membership
  (resumability under ``run_partitioned``);
- membership is independent of parallelism, block layout, and cluster
  size;
- the SQL oracle can recompute the exact same decision in DuckDB
  (md5 hex prefixes compare identically as strings and numbers).

All stages are per-batch ``map_batches`` kernels — no shuffle anywhere.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# width of the hex prefix used for the decision (32 bits of the digest)
_HEX_DIGITS = 8


def _key_hex(values, salt: str) -> list[str]:
    return [
        hashlib.md5(f"{v}|{salt}".encode()).hexdigest()[:_HEX_DIGITS] for v in values
    ]


def rate_to_hex(rate: float) -> str:
    """The hex threshold t such that P[md5_prefix < t] == rate (up to
    2^-32): rows whose 8-hex-digit prefix sorts below t are selected."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * (1 << 32)), (1 << 32) - 1), "08x")


def deterministic_sample(ds, rate: float, key: str = "doc_id", salt: str = "sample"):
    """Keep a deterministic ``rate`` fraction of rows, decided per row
    by ``md5(key|salt)`` — reproducible across runs, retries, and
    cluster sizes; no shuffle, no RNG state."""
    thresh = rate_to_hex(rate)

    def _filter(batch: pa.Table) -> pa.Table:
        hx = _key_hex(batch[key].to_pylist(), salt)
        mask = pa.array([h < thresh for h in hx], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def hash_split(
    ds,
    weights: dict[str, float] | None = None,
    key: str = "doc_id",
    salt: str = "split",
):
    """Assign every row a deterministic split label ("train"/"val"/...)
    with the given weights: the md5 prefix falls into consecutive hex
    ranges. Appends a ``split`` column; never moves a row."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bounds: list[tuple[str, str]] = []
    acc = 0.0
    for name, wgt in weights.items():
        acc += wgt
        bounds.append((name, rate_to_hex(acc)))
    bounds[-1] = (bounds[-1][0], "g")  # > every hex prefix: catches all

    def _assign(batch: pa.Table) -> pa.Table:
        hx = _key_hex(batch[key].to_pylist(), salt)
        labels = []
        for h in hx:
            for name, hi in bounds:
                if h < hi:
                    labels.append(name)
                    break
        return batch.append_column("split", pa.array(labels, pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def split_counts(ds, weights: dict[str, float] | None = None, key: str = "doc_id", salt: str = "split"):
    """(split, n_docs) summary of a hash_split — a tiny groupby over
    label partials, used as the verification surface."""
    from ray.data.aggregate import Count

    return hash_split(ds, weights, key, salt).groupby("split").aggregate(Count(alias_name="n_docs"))


def sample_weighted_columns(ds, rate: float, key: str = "doc_id", salt: str = "sample", columns: list[str] | None = None):
    """Deterministic sample projected to ``columns`` (pruning helper)."""
    out = deterministic_sample(ds, rate, key, salt)
    if columns:
        out = out.select_columns(columns)
    return out


def epoch_shuffle_head(ds, epoch: int = 1, k: int = 100, key: str = "doc_id",
                       salt: str = "shuffle"):
    """Deterministic global shuffle for training epochs: order rows by
    ``md5(key|epoch|salt)`` — a keyed SORT, not ``random_shuffle``, so
    the permutation is reproducible across runs/retries/cluster sizes
    and each epoch value yields an independent permutation. Returns the
    first ``k`` rows with their shuffle rank (the verification surface;
    a training exporter would stream the full sorted Dataset instead of
    taking a head).

    Scale: one all-to-all sort of (key, h) — unavoidable for a global
    permutation, and strictly cheaper than ``random_shuffle`` because
    the key is computed, not exchanged state. The rank column is
    assigned inside ONE final block (k rows), never driver-side.
    """
    import pyarrow as pa

    def _key(batch: pa.Table) -> pa.Table:
        hx = _key_hex_salted(batch[key].to_pylist(), f"{epoch}|{salt}")
        return pa.Table.from_arrays(
            [batch[key], pa.array(hx, pa.string())], names=[key, "h"]
        )

    def _rank(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rank", pa.array(range(1, len(batch) + 1), pa.int64())
        )

    return (
        ds.map_batches(_key, batch_format="pyarrow")
        .sort("h")
        .limit(k)
        .repartition(1)
        .map_batches(_rank, batch_format="pyarrow", batch_size=None)
    )


def _key_hex_salted(values, salt: str) -> list[str]:
    """Full md5 hex of ``value|salt`` (32 digits: rank ties impossible
    short of an md5 collision, matching SQL ORDER BY md5(...))."""
    return [hashlib.md5(f"{v}|{salt}".encode()).hexdigest() for v in values]


def epoch_shuffle_sql(epoch: int = 1, k: int = 100, key: str = "doc_id",
                      salt: str = "shuffle", table: str = "documents") -> str:
    """DuckDB mirror: ROW_NUMBER over the same md5 ordering."""
    h = f"md5(CAST({key} AS VARCHAR) || '|{epoch}|{salt}')"
    return (
        f"SELECT {key}, {h} AS h, "
        f"CAST(row_number() OVER (ORDER BY {h}) AS BIGINT) AS rank "
        f"FROM {table} ORDER BY h LIMIT {k}"
    )


def stratified_sample(
    ds,
    n_per_group: int = 5,
    group_col: str = "source",
    key: str = "doc_id",
    salt: str = "strat",
    rows_hint: int | None = None,
):
    """Deterministic stratified sample: exactly ``n_per_group`` rows
    from every group (fewer if the group is smaller), picked by
    smallest ``md5(key|salt)`` — the per-group analog of
    :func:`deterministic_sample`, for balanced eval sets over skewed
    source distributions.

    Scale shape: per-batch vectorized top-n per group (pandas groupby
    head over a sorted frame) collapses each batch to <= n x groups
    rows; one coarse shuffle on an adaptive group-hash bucket (never
    one reducer per group — the ~1ms-per-map_groups-call landmine)
    finishes the selection and assigns ranks. Membership is a pure
    function of the key: independent of parallelism and resumable.
    """
    import pandas as pd

    n_buckets = max(1, (rows_hint or 0) // 50_000 + 1)

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[[group_col, key]].copy()
        df[key] = df[key].astype(str)
        df["h"] = _key_hex_salted(df[key], salt)
        df = df.sort_values(["h", key], kind="stable")
        df = df.groupby(group_col, sort=False).head(n_per_group)
        df["gb"] = [
            int(hashlib.md5(str(g).encode()).hexdigest()[:8], 16) % n_buckets
            for g in df[group_col]
        ]
        return pa.Table.from_pandas(df, preserve_index=False)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", key], kind="stable")
        g = g.groupby(group_col, sort=False).head(n_per_group).copy()
        g["rk"] = g.groupby(group_col, sort=False).cumcount() + 1
        return g[[group_col, key, "rk"]]

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(_final, batch_format="pandas")
    )


def stratified_sample_sql(
    n_per_group: int = 5,
    group_col: str = "source",
    key: str = "doc_id",
    salt: str = "strat",
    table: str = "documents",
) -> str:
    """DuckDB mirror: ROW_NUMBER over the same md5-within-group order."""
    h = f"md5(CAST({key} AS VARCHAR) || '|{salt}')"
    return (
        f"SELECT {group_col}, CAST({key} AS VARCHAR) AS {key}, rk FROM ("
        f"SELECT {group_col}, {key}, CAST(row_number() OVER ("
        f"PARTITION BY {group_col} ORDER BY {h}, CAST({key} AS VARCHAR)"
        f") AS BIGINT) AS rk FROM {table}) WHERE rk <= {n_per_group}"
    )
