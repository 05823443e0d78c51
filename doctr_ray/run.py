"""Job entry point: partitioned, resumable extraction over a docs table.

The ``ray job submit`` surface (reference analog: cli/main.py:17-66 /
scripts/analyze.py — parse args, build predictor, run, dump results;
here: read docs parquet -> hash-partitioned OCR pipeline -> per-
partition parquet + lineage/metrics manifests, resumable)::

    python -m doctr_ray.run --input /root/testdata/sf0.01 \
        --output /tmp/spans_out --partitions 8 [--resume] [--staged]

Owns its Ray session (guarded init) — the library itself never calls
ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sf_dir containing documents.parquet")
    ap.add_argument("--output", required=True, help="output directory (partitioned)")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--limit", type=int, default=None, help="limit input docs")
    ap.add_argument("--staged", action="store_true", help="use the staged pipeline")
    ap.add_argument(
        "--detect-orientation", action="store_true",
        help="recover 90-degree page rotations before extraction",
    )
    ap.add_argument(
        "--keep-reading-order", action="store_true",
        help="column-aware reading order (XY-cut) instead of row order",
    )
    ap.add_argument(
        "--straighten-pages", action="store_true",
        help="exact skew recovery for arbitrary-angle scans (doctr_ray.skew)",
    )
    ap.add_argument(
        "--no-resume",
        action="store_true",
        help="ignore existing partition manifests (default: resume)",
    )
    ap.add_argument(
        "--on-media-error",
        choices=("raise", "quarantine"),
        default="raise",
        help="quarantine keeps the job alive on corrupt media (fused "
        "mode): failed spans emit empty text with kind=media_error — "
        "surfaced in the output, never silently skipped",
    )
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--query",
        default=None,
        help="instead of the OCR pipeline, run a named signal query "
        "(any __ray_entry__.queries() entry) over --input and write "
        "its result to --output as parquet",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.query:
        return _run_query(args)

    from doctr_ray.corpus import docs_dataset
    from doctr_ray.pipelines.ocr import ocr_spans
    from doctr_ray.state.checkpoint import run_partitioned

    if args.no_resume:
        import glob as g
        import shutil

        for p in g.glob(f"{args.output}/part=*"):
            shutil.rmtree(p, ignore_errors=True)

    mode = "staged" if args.staged else "fused"

    def factory():
        return docs_dataset(args.input, limit=args.limit)

    def pipeline(ds):
        return ocr_spans(
            ds,
            mode=mode,
            keep_reading_order=args.keep_reading_order,
            detect_orientation=args.detect_orientation,
            straighten_pages=args.straighten_pages,
            on_media_error=args.on_media_error,
        )

    pipeline.__name__ = f"ocr_spans[{mode}]"

    results = run_partitioned(
        factory,
        pipeline,
        args.output,
        num_partitions=args.partitions,
        lineage_extra={"input": args.input, "limit": args.limit, "mode": mode},
    )
    summary = {
        "partitions": len(results),
        "skipped": sum(r.skipped for r in results),
        "rows": sum(r.metrics.get("rows", 0) for r in results),
        "wall_sec": round(sum(r.metrics.get("wall_sec", 0) for r in results if not r.skipped), 3),
        "output": args.output,
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def _run_query(args) -> int:
    """Run one named signal pipeline and write its result as parquet —
    the CLI surface for every ``__ray_entry__.queries()`` operator, so
    a user can ``ray job submit`` any of them, not only OCR."""
    import importlib.util
    import os
    import time

    import ray

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__ray_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()
    if args.query not in qs:
        print(
            f"unknown query '{args.query}'; available: {sorted(qs)}",
            file=sys.stderr,
        )
        return 2

    t0 = time.monotonic()
    res = qs[args.query](args.input)
    if hasattr(res, "write_parquet"):  # ray Dataset: streamed, block-partitioned
        res.write_parquet(args.output)
        n_rows = None
    else:  # small pandas/arrow result
        import pandas as pd
        import pyarrow.parquet as pq

        os.makedirs(args.output, exist_ok=True)
        if isinstance(res, pd.DataFrame):
            res.to_parquet(os.path.join(args.output, "part-0.parquet"))
            n_rows = len(res)
        else:
            pq.write_table(res, os.path.join(args.output, "part-0.parquet"))
            n_rows = res.num_rows
    summary = {
        "query": args.query,
        "output": args.output,
        "wall_sec": round(time.monotonic() - t0, 3),
    }
    if n_rows is not None:
        summary["rows"] = n_rows
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
