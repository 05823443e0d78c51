"""Table path resolution + footer-sized reads, single- or multi-file.

The bench tables are one parquet file per table
(``{sf_dir}/{table}.parquet``), but production 100-TB inputs are
sharded — a directory of parquet files per table
(``{sf_dir}/{table}/part-*.parquet``) or a shard-suffixed flat layout
(``{sf_dir}/{table}-00001.parquet``). Every reader in the engine
resolves through here so all three layouts behave identically, footer
metadata (row counts — free, no data pages) sums across shards, and
the block-count clamp stays in one place: Ray's min-task-count read
splitting shreds small files into ~64 near-empty blocks whose per-task
scheduling dominates every downstream stage, so block count is
data-sized (~``rows_per_block`` rows each) with a floor of one block
per shard.
"""

from __future__ import annotations

import glob
import math
import os


def resolve_table_paths(sf_dir: str, table: str) -> list[str]:
    """``(dir, table)`` -> ordered parquet shard paths.

    Accepts, in priority order: the single-file layout
    ``{table}.parquet``, a ``{table}/`` directory of ``*.parquet``
    shards (recursive), and flat shard files ``{table}-*.parquet`` /
    ``{table}_*.parquet``. Shards are sorted for deterministic block
    order.
    """
    single = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isfile(single):
        return [single]
    if os.path.isdir(os.path.join(sf_dir, f"{table}.lance")):
        # Lance datasets route through read_table_ds's lance branch,
        # not the parquet shard resolver
        raise IsADirectoryError(
            f"{table}.lance is a Lance dataset; use read_table_ds"
        )
    subdir = os.path.join(sf_dir, table)
    if os.path.isdir(subdir):
        shards = sorted(
            glob.glob(os.path.join(subdir, "**", "*.parquet"), recursive=True)
        )
        if shards:
            return shards
    flat = sorted(
        glob.glob(os.path.join(sf_dir, f"{table}-*.parquet"))
        + glob.glob(os.path.join(sf_dir, f"{table}_*.parquet"))
    )
    if flat:
        return flat
    raise FileNotFoundError(
        f"no parquet for table '{table}' under {sf_dir} "
        f"(tried {table}.parquet, {table}/**.parquet, {table}[-_]*.parquet)"
    )


def table_num_rows(sf_dir: str, table: str) -> int:
    """Total row count across shards from parquet footers only."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(p).metadata.num_rows
        for p in resolve_table_paths(sf_dir, table)
    )


def read_dim_pandas(sf_dir: str, table: str, columns=None):
    """Driver-side pandas read of a SMALL dimension table across any
    shard layout (callers gate on :func:`table_num_rows` first — see
    ``DIM_BROADCAST_MAX_ROWS``)."""
    import pyarrow.parquet as pq

    return pq.read_table(
        resolve_table_paths(sf_dir, table), columns=columns
    ).to_pandas()


def read_table_ds(
    sf_dir: str,
    table: str,
    columns=None,
    rows_per_block: int = 500,
    min_blocks: int = 8,
    max_blocks: int = 64,
):
    """Pruned, footer-sized ``ray.data.read_parquet`` over the resolved
    shards. Block count ~= rows/``rows_per_block`` clamped to
    [``min_blocks``, ``max_blocks``], with BOTH bounds raised to the
    shard count (never merge shards below one block per file — per-file
    blocks are the resume/lineage unit at scale)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    lance_dir = os.path.join(sf_dir, f"{table}.lance")
    if os.path.isdir(lance_dir):
        # the north brief's native table format: ray.data.read_lance
        # when pylance is installed; this container ships parquet-only
        # test data, so the branch is import-guarded and the error
        # names the real dependency
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                f"{lance_dir} is a Lance dataset but pylance is not "
                "installed in this container; materialize the table as "
                "parquet or install pylance"
            ) from e
        ds = rd.read_lance(lance_dir, columns=columns)
        return ds

    paths = resolve_table_paths(sf_dir, table)
    n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    blocks = min(
        max(max_blocks, len(paths)),
        max(min_blocks, len(paths), math.ceil(n_rows / rows_per_block)),
    )
    return rd.read_parquet(paths, columns=columns, override_num_blocks=blocks)
