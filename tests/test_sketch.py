"""HLL / Count-Min sketches: register exactness vs brute force,
partitioning invariance, estimate accuracy, one-sided CMS error."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from doctr_ray.functions.sketch import (
    _bitlen_vec,
    _h64,
    cms_top_tokens,
    hll_estimate,
    hll_registers,
)


def _docs(n=400, vocab=1000, seed=7):
    rng = np.random.RandomState(seed)
    texts = [
        " ".join(f"w{rng.zipf(1.5) % vocab}" for _ in range(40)) for _ in range(n)
    ]
    return pa.table(
        {
            "source": [f"s{i % 4}" for i in range(n)],
            "text": texts,
        }
    )


def test_bitlen_vec_exact():
    vals = np.array([0, 1, 2, 3, 4, 255, 256, (1 << 47) - 1, 1 << 47], np.int64)
    assert _bitlen_vec(vals).tolist() == [int(v).bit_length() for v in vals]


def test_hll_registers_match_brute_force(ray_session):
    tbl = _docs()
    got = hll_registers(rd.from_arrow(tbl), b=12).to_pandas()
    # brute-force register file
    b, shift, wmask = 12, 48, (1 << 48) - 1
    want: dict = {}
    for src, text in zip(tbl["source"].to_pylist(), tbl["text"].to_pylist()):
        for tok in text.split(" "):
            if not tok:
                continue
            h = _h64(tok) >> 4
            reg, w = h >> shift, h & wmask
            rho = (48 - w.bit_length() + 1) if w else 49
            key = (src, reg)
            want[key] = max(want.get(key, 0), rho)
    got_map = {
        (r.source, r.reg): r.max_rho for r in got.itertuples()
    }
    assert got_map == want
    # block layout does not change the register file
    got2 = hll_registers(rd.from_arrow(tbl).repartition(7), b=12).to_pandas()
    assert (
        sorted(map(tuple, got2.to_numpy().tolist()))
        == sorted(map(tuple, got.to_numpy().tolist()))
    )


def test_hll_estimate_accuracy(ray_session):
    tbl = _docs(n=800)
    regs = hll_registers(rd.from_arrow(tbl), b=12).to_pandas()
    est = hll_estimate(regs, b=12)
    truth: dict = {}
    for src, text in zip(tbl["source"].to_pylist(), tbl["text"].to_pylist()):
        truth.setdefault(src, set()).update(t for t in text.split(" ") if t)
    for src, true_n in truth.items():
        # HLL standard error at m=4096 is ~1.6%; allow 4 sigma
        assert abs(est[src] - len(true_n)) / len(true_n) < 0.07, (
            src, est[src], len(true_n))


def test_cms_one_sided_and_topk(ray_session):
    tbl = _docs(n=300)
    got = cms_top_tokens(rd.from_arrow(tbl), k=10, rows_hint=300).to_pandas()
    assert len(got) == 10
    # one-sided error: CMS never underestimates
    assert (got["n_cms"] >= got["n_true"]).all()
    # the top-k really are the true top-k (count desc, token asc)
    c: dict = {}
    for text in tbl["text"].to_pylist():
        for tok in text.split(" "):
            if tok:
                c[tok] = c.get(tok, 0) + 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["token"], got["n_true"])) == [
        (t, np.int64(n)) for t, n in want
    ]
    # block layout does not change the sketch or the ranking
    got2 = cms_top_tokens(
        rd.from_arrow(tbl).repartition(9), k=10, rows_hint=300
    ).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), got2.reset_index(drop=True)
    )


def test_exact_distinct_matches_truth_and_hll(ray_session):
    from doctr_ray.functions.sketch import source_distinct_tokens

    tbl = _docs(n=400)
    got = source_distinct_tokens(
        rd.from_arrow(tbl), rows_hint=400
    ).to_pandas().set_index("source")["n_distinct"]
    truth: dict = {}
    for src, text in zip(tbl["source"].to_pylist(), tbl["text"].to_pylist()):
        truth.setdefault(src, set()).update(t for t in text.split(" ") if t)
    for src, toks in truth.items():
        assert got[src] == len(toks)
    # block layout does not change the counts
    got2 = source_distinct_tokens(
        rd.from_arrow(tbl).repartition(7), rows_hint=400
    ).to_pandas().set_index("source")["n_distinct"]
    assert got.to_dict() == got2.to_dict()
