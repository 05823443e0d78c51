"""Gate-combination census + language pivot: semantics on hand-built
docs and exhaustiveness invariants."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from doctr_ray.functions.audit import filter_gate_audit, lang_source_pivot


def _docs():
    long_en = "the " + " ".join(f"value{i} row{i} abc{i}" for i in range(20))
    return pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                long_en,              # every gate passes
                "xqz " * 5,           # no lang marker, short, repetitive
                "the the the the",    # en but ttr fails
            ],
            "source": ["s0", "s0", "s1"],
        }
    )


def test_gate_audit_masks(ray_session):
    got = filter_gate_audit(rd.from_arrow(_docs())).to_pandas()
    by = dict(zip(got["gate_mask"], got["n_docs"]))
    assert sum(by.values()) == 3  # census is exhaustive
    assert by.get(15, 0) == 1  # doc 1 passes all gates
    assert all(0 <= m <= 15 for m in by)
    # doc 3: lang ok (bit 1), ttr low (no bit 2), short-ratio ok (bit 4),
    # too few tokens (no bit 8) -> mask 5
    assert by.get(5, 0) == 1
    # census is independent of block layout
    got2 = filter_gate_audit(rd.from_arrow(_docs()).repartition(3)).to_pandas()
    assert dict(zip(got2["gate_mask"], got2["n_docs"])) == by


def test_lang_pivot(ray_session):
    got = lang_source_pivot(rd.from_arrow(_docs())).to_pandas()
    got = got.set_index("source")
    assert got.loc["s0", "n_en"] == 1
    assert got.loc["s0", "n_und"] == 1
    assert got.loc["s1", "n_en"] == 1
    total = got[[c for c in got.columns]].to_numpy().sum()
    assert total == 3
    assert got.to_numpy().dtype == np.int64
