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


def billing_totals(chunks: "ray.data.Dataset") -> dict:
    """Global totals (billing.py final summary analog)."""
    per_group = billing_rollup(chunks).to_pandas()
    return {
        "groups": int(len(per_group)),
        "n_chunks": int(per_group["n_chunks"].sum()),
        "n_tokens": int(per_group["n_tokens"].sum()),
        "cost_usd": float(per_group["cost_usd"].sum()),
    }
