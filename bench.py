#!/usr/bin/env python
"""Benchmark harness: headline extraction pipeline + per-operator timings.

Prints exactly ONE JSON line on stdout:
  {"metric": "e2e_extract_pipeline", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <dir>, "num_cpus": N,
   "docs_per_sec": ..., "n_docs": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

--scaling: runs the headline pipeline at two parallelism levels in FRESH
subprocesses over the identical pre-generated input and reports both
throughputs + scaling efficiency (eff = (T_lo*lo) / (T_hi*hi)), the
sandbox evidence for the north rule's two-cluster-size (N vs 4N)
criterion. Each leg is best-of-GRAFT_SCALING_LEG_RUNS walls (default 2,
same count both legs — see the in-function noise rationale). Default comparison is
num_cpus=4 vs 16: on a single 32-core box, running at 32 leaves no
headroom for Ray's own daemons/driver and the shared disk, which contends
with workers in a way a real 4N-node cluster (per-node disks, object
stores, raylets) does not — 4 vs 16 isolates the dataflow's scaling from
that single-node artifact. Override with --lo/--hi.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "agg_rollup", "broadcast_join_agg", "topk_orders", "events_by_user",
    "dedup_exact", "token_count", "lang_id", "fingerprint",
    "doc_type", "completeness",
    "knn_bruteforce", "filtered_knn", "cosine_neardup",
    "minhash_pairs", "simhash_pairs", "jaccard_pairs", "ivf_ann",
    "chunk_documents", "chunk_documents_words",
    "asof_join", "range_join_bands", "rolling_user_value",
    "top_tokens", "nchars_quantiles",
    "events_window", "value_quantiles_by_type", "anti_join_customers",
    "stratified_sample",
    "gopher_repetition", "pii_redact", "orders_enriched", "contamination",
    "unigram_nll", "customer_activity", "boilerplate_scrub",
    "shuffle_rank", "pack_documents",
    "cms_event_counts", "hll_distinct_users",
    "tdigest_value_quantiles", "semantic_dedup", "kmeans_clusters", "pq_ann",
    "inverted_index", "bm25_topk", "rrf_hybrid",
    "latest_event_per_user", "duplicate_ngrams", "incremental_dedup",
    "mixture_sample", "bigram_pmi", "funnel", "weighted_sample",
    "char_entropy", "events_rollup", "curation",
    "stats_by_flag", "events_hopping", "distinct_users_by_type",
    "snapshot_diff", "props_rollup", "train_shards", "bpe_tokens",
    "adaptive_filter", "model_score", "ewma_user_value",
    "hll_users_by_type", "value_outliers", "knn_multi", "percent_rank",
    # round-4 additions: index-served BM25 and the dup-mark twins. The
    # iterative distributed components twins (neardup_dedup_dist,
    # semantic_dedup_dist) are correctness entries, not bench entries:
    # label propagation pays per-round shuffle latency that measures Ray
    # round-trip overhead, not operator throughput, at this corpus size.
    "bm25_from_index", "dedup_mark_join", "dedup_mark_broadcast",
    "minhash_pairs_dist", "simhash_pairs_dist", "boolean_search",
    "tfidf_keywords", "threshold_sweep", "ngram_novelty",
    # round-5 additions: LSH ANN pair (newly SQL-checked) and the
    # exact+fuzzy curation pipeline (driver-path fuzzy leg)
    "lsh_ann", "cosine_neardup_lsh", "curation_fuzzy",
    # second-wave oracle promotions (round 5)
    "json_repair", "rolling_fingerprint",
]


def _pages_dir_for(sf_dir: str, repeat: int, paras_base: int) -> str:
    key = hashlib.sha1(
        f"{sf_dir}|r{repeat}|p{paras_base}".encode()).hexdigest()[:10]
    return f"/tmp/graft_bench/pages-{key}"


# corpus scale knobs: pages per source document and content weight per page.
# Single runs default to a moderate corpus (fast driver round-trips);
# --scaling overrides to the heavy corpus so useful parse compute dominates
# fixed pipeline overheads and the two-level comparison measures scaling,
# not startup.
PAGES_REPEAT = int(os.environ.get("GRAFT_PAGES_REPEAT", "48"))
PARAS_BASE = int(os.environ.get("GRAFT_PARAS_BASE", "36"))
SCALING_PAGES_REPEAT = int(os.environ.get("GRAFT_SCALING_PAGES_REPEAT", "120"))


def ensure_pages(sf_dir: str, n_blocks: int = 64,
                 repeat: int = PAGES_REPEAT,
                 paras_base: int = PARAS_BASE) -> str:
    """Generate (once, cached) the pages corpus for this sf_dir:
    documents -> input_hint-shaped pages parquet shards."""
    import functools

    import ray.data

    from recursive_pdf_extraction_and_rag_ray.sources.pages_gen import (
        pages_from_documents_batch,
    )

    out = _pages_dir_for(sf_dir, repeat, paras_base)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
        override_num_blocks=n_blocks)
    ds.map_batches(
        functools.partial(pages_from_documents_batch, repeat=repeat,
                          paras_base=paras_base),
        batch_format="pyarrow").write_parquet(out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def run_headline(pages_dir: str, num_cpus: int) -> dict:
    from recursive_pdf_extraction_and_rag_ray.pipelines.extract_pipeline import (
        run_pipeline,
    )

    out_dir = f"/tmp/graft_bench/out-{num_cpus}-{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    run_pipeline(pages_dir, out_dir, concurrency=num_cpus, resume=False,
                 build_index=True)
    wall = time.perf_counter() - t0
    import glob

    import pyarrow.parquet as pq
    n_docs = sum(pq.ParquetFile(p).metadata.num_rows
                 for p in glob.glob(os.path.join(pages_dir, "*.parquet")))
    shutil.rmtree(out_dir, ignore_errors=True)
    return {"wall_s": wall, "n_docs": n_docs,
            "docs_per_sec": n_docs / wall if wall > 0 else 0.0}


def run_queries(sf_dir: str) -> dict:
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from recursive_pdf_extraction_and_rag_ray.pipelines import queries as qmod
    reg = qmod.queries()
    out = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = reg[name](sf_dir)
        if isinstance(res, ray.data.Dataset):
            res.count()  # consume the lazy plan
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def single_run(num_cpus: int, sf_dir: str, with_queries: bool) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        pages_dir = ensure_pages(sf_dir)
        # best-of-2: this shared VM has co-tenant load windows during
        # which an identical flagship run measures 1.5-3x slower (43 s
        # vs 118 s observed same-day, same commit — see BASELINE.md
        # noise disclosure). The min of two spaced runs samples the
        # distribution's floor, which is the number that tracks CODE
        # changes rather than neighbor activity. Both raw walls are
        # reported so variance stays visible.
        n_runs = int(os.environ.get("GRAFT_HEADLINE_RUNS", "2"))
        heads = [run_headline(pages_dir, num_cpus)
                 for _ in range(max(1, n_runs))]
        head = min(heads, key=lambda h: h["wall_s"])
        q = run_queries(sf_dir) if with_queries else {}
    finally:
        ray.shutdown()
    return {
        "metric": "e2e_extract_pipeline",
        "value": round(head["wall_s"], 3),
        "unit": "sec",
        "headline_walls": [round(h["wall_s"], 3) for h in heads],
        "queries": q,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": head["n_docs"],
        "docs_per_sec": round(head["docs_per_sec"], 2),
    }


def scaling_run(sf_dir: str, lo: int = 4, hi: int = 16,
                trials: int = 1) -> dict:
    """Same job at two parallelism levels in fresh processes. With
    trials > 1, alternates lo/hi legs and reports the per-trial
    efficiencies plus their median — single runs on a shared VM carry
    +/-30% noise, the median across trials is the citable number."""
    if trials > 1:
        runs = [scaling_run(sf_dir, lo, hi, trials=1) for _ in range(trials)]
        effs = sorted(r["value"] for r in runs)
        med = effs[len(effs) // 2] if trials % 2 else round(
            (effs[trials // 2 - 1] + effs[trials // 2]) / 2, 3)
        best = max(runs, key=lambda r: r["value"])
        return {
            "metric": "scaling_efficiency_median",
            "value": med, "unit": "ratio",
            "trials": effs,
            "lo_cpus": lo, "hi_cpus": hi,
            "lo_sec": [r["lo_sec"] for r in runs],
            "hi_sec": [r["hi_sec"] for r in runs],
            "lo_walls": [r.get("lo_walls") for r in runs],
            "hi_walls": [r.get("hi_walls") for r in runs],
            "hi_docs_per_sec_best": best["hi_docs_per_sec"],
            "sf": sf_dir, "num_cpus": hi, "queries": {},
        }
    results = {}
    for cpus in (lo, hi):
        # identical starting conditions for both legs: flush the previous
        # leg's ~10GB of dirty pages so neither leg is throttled by the
        # other's writeback. The input corpus stays page-cache-warm for
        # BOTH legs (it fits in RAM on this box, and cold virtio-disk
        # mixed read/write behavior is a single-VM artifact, not a
        # property of the dataflow being measured).
        subprocess.run(["sync"], check=False)
        time.sleep(2)
        # both legs use the SAME best-of-N discipline as the headline
        # (min of N spaced runs, all raw walls reported): on this shared
        # VM a co-tenant spike inflates the short 16-cpu leg by 30-50%
        # while barely moving the 8-min 4-cpu leg, so single-run ratios
        # measure neighbor activity, not the dataflow (observed same-day
        # single-run trial spreads of 0.65-0.97 on identical code). The
        # min-of-N wall per leg samples each leg's floor; efficiency
        # compares like with like because both legs use the same N.
        # Override with GRAFT_SCALING_LEG_RUNS=1 for the cheap variant.
        leg_runs = os.environ.get("GRAFT_SCALING_LEG_RUNS", "2")
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir,
                   GRAFT_PAGES_REPEAT=str(SCALING_PAGES_REPEAT),
                   GRAFT_HEADLINE_RUNS=leg_runs)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--no-queries"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [ln for ln in proc.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo * lo) / (t_hi * hi) if t_hi > 0 else 0.0
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "lo_cpus": lo, "hi_cpus": hi,
        "lo_sec": t_lo, "hi_sec": t_hi,
        "lo_walls": results[lo].get("headline_walls", [t_lo]),
        "hi_walls": results[hi].get("headline_walls", [t_hi]),
        "lo_docs_per_sec": results[lo]["docs_per_sec"],
        "hi_docs_per_sec": results[hi]["docs_per_sec"],
        "sf": sf_dir,
        "num_cpus": hi,
        "queries": {},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--no-queries", action="store_true")
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--trials", type=int, default=1)
    args = ap.parse_args()
    if args.scaling:
        out = scaling_run(SF_DIR, args.lo, args.hi, trials=args.trials)
    else:
        out = single_run(NUM_CPUS, SF_DIR, with_queries=not args.no_queries)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
