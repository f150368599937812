"""Metrics / billing: per-batch metric rows + a final rollup.

Replaces the reference's mutable shared billing ledger (atomic JSON
rewritten after every file, /root/reference/src/services/RAG/billing.py:
9-72) with the Ray-native pattern: stages EMIT metric columns, the rollup
is a partial+final aggregate at the end — no shared mutable state, no
file lock, works at any parallelism.

Token counting follows the reference fallback ``max(1, len(text)//4)``
(convert_to_embeddings.py:106-118 — tiktoken when present, the //4
heuristic otherwise); price defaults to the reference's
$0.012 per 1M tokens (billing.py:18).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

PRICE_PER_M_TOKENS = 0.012  # reference billing.py:18


def count_tokens_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_tokens (len//4 heuristic, min 1) — vectorized."""
    n = pc.max_element_wise(
        pc.cast(pc.divide(pc.utf8_length(batch.column(text_col)),
                          pa.scalar(4)), pa.int64()),
        pa.scalar(1, pa.int64()))
    return batch.append_column("n_tokens", n)


def billing_rollup(chunks: "ray.data.Dataset", *, group_col: str = "group_key",
                   price_per_m: float = PRICE_PER_M_TOKENS) -> "ray.data.Dataset":
    """Per-group token/chunk totals + cost (the reference's per-file billing
    map + global totals, billing.py:53-72, as one grouped aggregate)."""
    with_tokens = chunks.map_batches(count_tokens_batch, batch_format="pyarrow")
    agg = with_tokens.groupby(group_col).aggregate(
        Count(alias_name="n_chunks"),
        Sum("n_tokens", alias_name="n_tokens"))

    def add_cost(t: pa.Table) -> pa.Table:
        cost = pc.multiply(pc.cast(t["n_tokens"], pa.float64()),
                           pa.scalar(price_per_m / 1_000_000.0))
        return t.append_column("cost_usd", cost)

    return agg.map_batches(add_cost, batch_format="pyarrow")


METRICS_DIRNAME = "_metrics"


def append_metrics(out_dir: str, rows: list) -> str:
    """Persist metric rows beside ``_lineage`` — the durable billing
    ledger the reference keeps as an atomic JSON rewrite
    (billing.py:34-51). Filename is a pure function of (stage, key set),
    so a rerun of the same shards OVERWRITES its own file instead of
    double-counting — totals accumulate exactly once per shard across
    resumes."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from ..schemas import METRICS

    if not rows:
        return ""
    d = os.path.join(out_dir, METRICS_DIRNAME)
    os.makedirs(d, exist_ok=True)
    key = hashlib.sha1(
        "|".join(sorted(f"{r['stage']}:{r['key']}" for r in rows)).encode()
    ).hexdigest()[:16]
    path = os.path.join(d, f"metrics-{key}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=METRICS), tmp)
    os.replace(tmp, path)
    return path


def load_metrics(out_dir: str):
    import os

    import pyarrow.parquet as pq
    d = os.path.join(out_dir, METRICS_DIRNAME)
    if not os.path.isdir(d):
        return None
    files = sorted(os.path.join(d, f) for f in os.listdir(d)
                   if f.endswith(".parquet"))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


def metrics_totals(out_dir: str, *, stage: str = "chunks_embedded",
                   price_per_m: float = PRICE_PER_M_TOKENS) -> dict:
    """Global billing totals reconstructed from the persisted table
    (billing.py:53-72 final-summary analog). Duplicate (stage, key) rows
    cannot occur — the writer's content-keyed filename guarantees one
    surviving row per shard."""
    t = load_metrics(out_dir)
    if t is None:
        return {"shards": 0, "n_rows": 0, "n_tokens": 0, "cost_usd": 0.0}
    t = t.filter(pc.equal(t["stage"], stage))
    n_tokens = int(pc.sum(t["n_tokens"]).as_py() or 0)
    return {
        "shards": t.num_rows,
        "n_rows": int(pc.sum(t["n_rows"]).as_py() or 0),
        "n_tokens": n_tokens,
        "cost_usd": n_tokens * price_per_m / 1_000_000.0,
    }


def billing_totals(chunks: "ray.data.Dataset") -> dict:
    """Global totals (billing.py final summary analog)."""
    per_group = billing_rollup(chunks).to_pandas()
    return {
        "groups": int(len(per_group)),
        "n_chunks": int(per_group["n_chunks"].sum()),
        "n_tokens": int(per_group["n_tokens"].sum()),
        "cost_usd": float(per_group["cost_usd"].sum()),
    }
