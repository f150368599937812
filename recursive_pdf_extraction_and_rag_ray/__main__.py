"""CLI entry point: the analog of the reference pipeline's argparse
surface (/root/reference/src/services/RAG/convert_to_embeddings.py:448-470
— input/output dirs, workers, resume, embed batch), mapped onto the
flagship Ray pipeline.

    python -m recursive_pdf_extraction_and_rag_ray --input pages_dir/ --out out_dir/ \
        [--workers N] [--no-resume] [--no-index] [--embed-batch 512]

Owns its Ray session (guarded — the graft driver and tests never go
through here).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="recursive_pdf_extraction_and_rag_ray")
    ap.add_argument("--input", required=True,
                    help="directory of pages parquet shards")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--workers", type=int, default=None,
                    help="stage concurrency (default: cluster CPUs)")
    ap.add_argument("--embed-batch", type=int, default=512)
    ap.add_argument("--no-resume", action="store_true",
                    help="reprocess every shard even if committed")
    ap.add_argument("--no-index", action="store_true",
                    help="skip the index-build stage")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        from .pipelines.extract_pipeline import (
            run_extract_stage,
            run_index_stage,
            run_rag_stage,
        )
        stats = run_extract_stage(args.input, args.out,
                                  concurrency=args.workers,
                                  resume=not args.no_resume)
        stats.update({f"rag_{k}": v for k, v in run_rag_stage(
            args.out, concurrency=args.workers,
            embed_batch=args.embed_batch,
            resume=not args.no_resume).items()})
        if not args.no_index:
            run_index_stage(args.out, concurrency=args.workers)
        print(json.dumps(stats))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
