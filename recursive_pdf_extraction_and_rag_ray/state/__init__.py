"""Engine state: per-partition lineage + exact resume.

Replaces the reference's JSON progress ledger / seen-files index / caches
(/root/reference/src/services/RAG/progress_store.py, cache_utils.py) with a
Parquet lineage table — the commit record for each completed input shard."""

from .keymanager import AllKeysExhausted, KeyManager, RateLimit  # noqa: F401
from .lineage import (  # noqa: F401
    append_lineage,
    completed_shards,
    load_lineage,
    shard_checksums,
)
