"""Partitioned, resumable output with manifests."""

import json
import os

import pyarrow as pa
import pytest

import ray.data as rd

from doctr_ray.state.checkpoint import (
    MANIFEST,
    CheckpointMismatch,
    is_committed,
    load_all,
    partition_of,
    run_partitioned,
)


def _docs():
    return rd.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": [f"doc-{i}" for i in range(40)],
                "text": [f"text number {i}" for i in range(40)],
            }
        )
    )


def _identity_pipeline(ds):
    return ds


def test_partition_of_stable():
    assert partition_of("doc-1", 8) == partition_of("doc-1", 8)
    parts = {partition_of(f"doc-{i}", 8) for i in range(100)}
    assert len(parts) > 4  # spreads


def test_run_partitioned_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "out")
    res1 = run_partitioned(_docs, _identity_pipeline, out, num_partitions=4)
    assert [r.skipped for r in res1] == [False] * 4
    assert all(is_committed(out, p) for p in range(4))
    total = sum(r.metrics["rows"] for r in res1)
    assert total == 40

    # resume: all partitions skip
    res2 = run_partitioned(_docs, _identity_pipeline, out, num_partitions=4)
    assert [r.skipped for r in res2] == [True] * 4

    # break one partition's manifest -> only that one re-runs
    os.remove(os.path.join(out, "part=2", MANIFEST))
    res3 = run_partitioned(_docs, _identity_pipeline, out, num_partitions=4)
    assert [r.skipped for r in res3] == [True, True, False, True]

    # read back everything
    ds = load_all(out)
    assert ds.count() == 40
    m = json.load(open(os.path.join(out, "part=0", MANIFEST)))
    assert m["engine_version"] and m["metrics"]["rows"] >= 0
    assert m["lineage"]["pipeline"] == "_identity_pipeline"


def test_resume_rejects_scheme_mismatch(ray_session, tmp_path):
    """Resuming with a different --partitions or lineage must fail loudly,
    not silently skip old-scheme partitions (missing/duplicated docs)."""
    out = str(tmp_path / "out3")
    run_partitioned(_docs, _identity_pipeline, out, num_partitions=4)

    with pytest.raises(CheckpointMismatch, match="num_partitions"):
        run_partitioned(_docs, _identity_pipeline, out, num_partitions=8)

    with pytest.raises(CheckpointMismatch, match="lineage"):
        run_partitioned(
            _docs, _identity_pipeline, out, num_partitions=4,
            lineage_extra={"input": "/other/place"},
        )

    # matching scheme still resumes cleanly
    res = run_partitioned(_docs, _identity_pipeline, out, num_partitions=4)
    assert [r.skipped for r in res] == [True] * 4


def test_partitions_disjoint_and_complete(ray_session, tmp_path):
    out = str(tmp_path / "out2")
    run_partitioned(_docs, _identity_pipeline, out, num_partitions=3)
    ds = load_all(out)
    ids = sorted(r["doc_id"] for r in ds.take_all())
    assert ids == sorted(f"doc-{i}" for i in range(40))
