"""Multi-file (sharded) table layouts must behave identically to the
single-file bench layout: path resolution, footer row counts, Dataset
reads, the docs corpus, and a real query end-to-end."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from doctr_ray.tableio import (
    read_dim_pandas,
    read_table_ds,
    resolve_table_paths,
    table_num_rows,
)

SF = "/root/testdata/sf0.001"


def _shard_table(src_dir, out_dir, table, n_shards, layout="subdir"):
    """Split {table}.parquet into n shards under out_dir."""
    t = pq.read_table(f"{src_dir}/{table}.parquet")
    edges = np.linspace(0, t.num_rows, n_shards + 1).astype(int)
    if layout == "subdir":
        os.makedirs(f"{out_dir}/{table}", exist_ok=True)
        paths = [f"{out_dir}/{table}/part-{i:05d}.parquet" for i in range(n_shards)]
    else:
        paths = [f"{out_dir}/{table}-{i:05d}.parquet" for i in range(n_shards)]
    for i, p in enumerate(paths):
        pq.write_table(t.slice(edges[i], edges[i + 1] - edges[i]), p)
    return paths


def test_resolution_priority_and_errors(tmp_path):
    d = str(tmp_path)
    _shard_table(SF, d, "nation", 2, layout="subdir")
    assert len(resolve_table_paths(d, "nation")) == 2
    _shard_table(SF, d, "region", 3, layout="flat")
    assert len(resolve_table_paths(d, "region")) == 3
    # single file wins when present
    pq.write_table(pq.read_table(f"{SF}/nation.parquet"), f"{d}/nation.parquet")
    assert resolve_table_paths(d, "nation") == [f"{d}/nation.parquet"]
    with pytest.raises(FileNotFoundError, match="no parquet"):
        resolve_table_paths(d, "missing_table")


def test_footer_rows_sum_across_shards(tmp_path):
    d = str(tmp_path)
    _shard_table(SF, d, "orders", 4)
    assert table_num_rows(d, "orders") == table_num_rows(SF, "orders")


def test_read_table_ds_sharded_equals_single(ray_session, tmp_path):
    d = str(tmp_path)
    _shard_table(SF, d, "orders", 4)
    got = (
        read_table_ds(d, "orders", ["o_orderkey", "o_custkey"])
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want = (
        read_table_ds(SF, "orders", ["o_orderkey", "o_custkey"])
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # >= one block per shard
    assert read_table_ds(d, "orders").materialize().num_blocks() >= 4


def test_read_dim_pandas_sharded(tmp_path):
    d = str(tmp_path)
    _shard_table(SF, d, "customer", 3)
    got = read_dim_pandas(d, "customer", ["c_custkey"]).sort_values("c_custkey")
    want = read_dim_pandas(SF, "customer", ["c_custkey"]).sort_values("c_custkey")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_docs_dataset_sharded_identical(ray_session, tmp_path):
    from doctr_ray.corpus import docs_dataset

    d = str(tmp_path)
    _shard_table(SF, d, "documents", 4)

    def _flat(ds):
        df = ds.to_pandas()
        return {
            r.doc_id: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans]
            for r in df.itertuples()
        }

    # no limit: Ray's LimitOperator takes the first-arriving blocks,
    # which is not layout-stable — the corpus itself must be identical
    got = _flat(docs_dataset(d))
    want = _flat(docs_dataset(SF))
    assert got == want


def test_query_end_to_end_sharded(ray_session, tmp_path):
    """A real driver query over a 4-shard lineitem + sharded dims must
    hash-match the single-file answer."""
    from doctr_ray.functions.relational import shipping_priority

    d = str(tmp_path)
    for t in ("lineitem", "orders"):
        _shard_table(SF, d, t, 4)
    _shard_table(SF, d, "customer", 2, layout="flat")
    got = shipping_priority(d).to_pandas().reset_index(drop=True)
    want = shipping_priority(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_lance_dataset_branch_names_dependency(tmp_path):
    """A {table}.lance directory routes to the Lance branch: without
    pylance in the container it raises naming the dependency (the
    parquet shard resolver must NOT silently miss it)."""
    import pytest

    from doctr_ray.tableio import read_table_ds, resolve_table_paths

    (tmp_path / "docs.lance").mkdir()
    with pytest.raises(NotImplementedError, match="pylance"):
        read_table_ds(str(tmp_path), "docs")
    with pytest.raises(IsADirectoryError, match="Lance"):
        resolve_table_paths(str(tmp_path), "docs")
