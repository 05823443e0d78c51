"""Hardware-scaling profile of the per-media OCR kernel — NO Ray.

Answers one question: how much of the pipeline's 8->32 cpu scaling gap
is the single-socket memory system, and how much is Ray overhead? The
same fixed media workload (derived from $GRAFT_SF_DIR documents exactly
like the bench corpus) runs in K INDEPENDENT worker processes joined by
a plain multiprocessing pool — no object store, no scheduler, no
stream. The aggregate media/s at K=8 vs K=32 is the hardware ceiling
any 32-cpu execution of this kernel can reach on this box; the Ray
pipeline's efficiency should be compared against THIS, not against 4.0x
ideal (a real N->4N *cluster* adds memory bandwidth with every node,
one socket does not).

Usage::

    GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/kernel_scaling_profile.py 8 32

Prints one JSON line per level plus the pairwise efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEDIA_PER_LEVEL = int(os.environ.get("PROFILE_MEDIA", "12000"))


def _build_workload(sf_dir: str, n_media: int) -> list[str]:
    import pyarrow.parquet as pq

    from doctr_ray.corpus import doc_spans

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    refs: list[str] = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for s in doc_spans(str(did), text or "", 1.0):
            if s["kind"] == "media":
                refs.append(s["media_ref"])
                if len(refs) >= n_media:
                    return refs
    return refs


def _work(refs: list[str]) -> int:
    from doctr_ray.pipelines.ocr import media_to_ocr_span
    from doctr_ray.recognition import GlyphRecognizer

    rec = GlyphRecognizer()
    n = 0
    for r in refs:
        media_to_ocr_span("p", r, 0, rec, False, False, False)
        n += 1
    return n


def run_level(refs: list[str], k: int) -> dict:
    chunks = [refs[i::k] for i in range(k)]
    # warm imports/page cache untimed
    with mp.get_context("spawn").Pool(k) as pool:
        pool.map(_work, [c[:8] for c in chunks])
        t0 = time.monotonic()
        done = sum(pool.map(_work, chunks))
        wall = time.monotonic() - t0
    return {"k": k, "media": done, "sec": round(wall, 3),
            "media_per_sec": round(done / wall, 1)}


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    levels = [int(x) for x in (sys.argv[1:] or ["8", "32"])]
    refs = _build_workload(sf_dir, MEDIA_PER_LEVEL)
    results = [run_level(refs, k) for k in levels]
    for r in results:
        print(json.dumps(r))
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        eff = (hi["media_per_sec"] / lo["media_per_sec"]) / (hi["k"] / lo["k"])
        print(json.dumps({
            "metric": "kernel_scaling_efficiency_no_ray",
            "lo": lo["k"], "hi": hi["k"], "value": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
