"""Embedding stage: chunks -> chunks + embedding column.

Actor-pool callable class (``map_batches(HashEmbedder, concurrency=N,
batch_size=96)``) — the Ray-native analog of the reference's embedding
clients (Cloudflare BGE-M3 with batch cap 96/100 and 5-try exponential
backoff, /root/reference/src/services/RAG/convert_to_embeddings.py:125-171;
threaded order-preserving variant src/services/Cloudflare/
cf_bge_service.py:80-125; Ollama src/services/Ollama/ollama_service.py).

Providers share one duck-type (``embed(list[str]) -> np.ndarray``):

- ``HashEmbedder`` — deterministic local PRF embedder (shake_128 of the
  text -> 64 float32, L2-normalized). Default for tests/bench: no network
  in the sandbox, and determinism is what the correctness gate needs.
- ``RandomProjectionEmbedder`` — second concrete local backend: hashed
  bag-of-words + seeded Gaussian random projection, with the projection
  matrix built ONCE per actor (the model-load shape). Proves the A4
  multi-provider plug point with two exercisable implementations.
- ``HttpEmbedder`` — the production shape: batched POST with retry/backoff
  identical in spirit to the reference's RetryCfg (5 tries, x1.5 backoff,
  max sleep 20s). Gated behind an import-try; raises unless an endpoint is
  configured. The Ray plumbing (actor pool, batching, order preservation)
  is identical to HashEmbedder's, so tests of the plumbing cover both.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa

from ..schemas import EMBED_DIM

EMBED_TYPE_HASH = "hash-prf-64"


def hash_embed_texts(texts: List[str], dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic PRF embedding: shake_128(text) -> dim u32 words ->
    [-1, 1] floats, L2-normalized. Hashing is per-row (inherent); all float
    work is one vectorized pass over the whole batch."""
    if not texts:
        return np.empty((0, dim), dtype=np.float32)
    nbytes = dim * 4
    buf = b"".join(
        hashlib.shake_128(t.encode("utf-8")).digest(nbytes) for t in texts)
    x = np.frombuffer(buf, dtype="<u4").astype(np.float64).reshape(-1, dim)
    x = x / 4294967295.0 * 2.0 - 1.0
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (x / norms).astype(np.float32)


class HashEmbedder:
    """Deterministic embedder actor. ``__init__`` once per actor."""

    def __init__(self, dim: int = EMBED_DIM, text_col: str = "text",
                 embedding_type: str = EMBED_TYPE_HASH):
        self.dim = dim
        self.text_col = text_col
        self.embedding_type = embedding_type

    def embed(self, texts: List[str]) -> np.ndarray:
        return hash_embed_texts(texts, self.dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        vecs = self.embed(texts)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), self.dim)
        batch = batch.append_column("embedding", emb)
        return batch.append_column(
            "embedding_type",
            pa.array([self.embedding_type] * len(texts), pa.string()))


class RandomProjectionEmbedder(HashEmbedder):
    """Second concrete LOCAL backend behind the same duck-type (the
    reference ships multiple interchangeable providers — Cloudflare BGE /
    Ollama / Gemini — behind one surface; this proves the plug point
    with two real, exercisable implementations, not one impl + a stub):
    feature-hash the whitespace tokens into a ``n_features`` count
    vector, project with a seeded Gaussian matrix (Johnson-Lindenstrauss
    random projection — public method), L2-normalize.

    Distinct semantics from HashEmbedder (bag-of-words: token-permuted
    texts collide here, never there) and a REAL model-loading shape: the
    (n_features x dim) projection matrix is built once per actor in
    __init__ — the 'load the model once, not per batch' contract an
    actor-pool stage exists for."""

    def __init__(self, dim: int = EMBED_DIM, n_features: int = 4096,
                 seed: int = 0x5EED, text_col: str = "text"):
        super().__init__(dim=dim, text_col=text_col,
                         embedding_type="random-projection")
        self.n_features = n_features
        # per-actor "model load": seeded dense projection, built once
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((n_features, dim)) \
            / np.sqrt(dim)

    def embed(self, texts: List[str]) -> np.ndarray:
        import pandas as pd
        if not texts:
            return np.empty((0, self.dim), dtype=np.float32)
        toks = pd.Series(texts, dtype="object").str.lower().str.split()
        ex = toks.explode().dropna()
        counts = np.zeros((len(texts), self.n_features), dtype=np.float64)
        if len(ex):
            rows = ex.index.to_numpy().astype(np.int64)
            cols = (pd.util.hash_array(ex.to_numpy(dtype=object))
                    % np.uint64(self.n_features)).astype(np.int64)
            np.add.at(counts, (rows, cols), 1.0)
        x = counts @ self.proj
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (x / norms).astype(np.float32)


class HttpEmbedder(HashEmbedder):
    """Production embedder shape: batch cap + retry/backoff inside the actor
    (retry semantics follow convert_to_embeddings.py:125-171: 5 tries,
    exponential x1.5, sleep capped at 20s, retry on 429/5xx/network)."""

    def __init__(self, endpoint: Optional[str] = None, token: str = "",
                 dim: int = 1024, batch_cap: int = 96, tries: int = 5,
                 backoff: float = 1.5, max_sleep: float = 20.0,
                 text_col: str = "text", key_manager=None,
                 model: str = "embedding"):
        super().__init__(dim=dim, text_col=text_col,
                         embedding_type="http-embedder")
        self.endpoint = endpoint
        self.token = token
        # optional per-actor keyed rate-limit/rotation state
        # (state.keymanager.KeyManager — the reference's backpressure
        # mechanism, api_key_manager.py:11-133); when set, each sub-batch
        # draws an available key and records usage after success
        self.key_manager = key_manager
        self.model = model
        self.batch_cap = min(batch_cap, 100)  # reference hard cap: 100
        self.tries = tries
        self.backoff = backoff
        self.max_sleep = max_sleep
        try:
            import requests  # noqa: F401
            self._requests = requests
        except ImportError:
            self._requests = None

    def embed(self, texts: List[str]) -> np.ndarray:
        if not self.endpoint or self._requests is None:
            raise NotImplementedError(
                "HttpEmbedder needs a configured endpoint and the 'requests' "
                "package; use HashEmbedder in sandboxed/test runs")
        import time
        out: List[List[float]] = []
        for start in range(0, len(texts), self.batch_cap):
            sub = texts[start:start + self.batch_cap]
            delay = 1.0
            for attempt in range(self.tries):
                # key acquisition is INSIDE the retry loop: a transient
                # minute-window exhaustion (AllKeysExhausted) backs off
                # like a 429 instead of killing the whole batch task, and
                # the rpm window is charged at SEND time so failed/retried
                # requests still count against the provider's real limits
                try:
                    token = self.token
                    if self.key_manager is not None:
                        token = self.key_manager.get_key(self.model)
                        self.key_manager.record_request(token, self.model)
                    resp = self._requests.post(
                        self.endpoint, json={"text": sub},
                        headers={"Authorization": f"Bearer {token}"},
                        timeout=60)
                    if resp.status_code in (429,) or resp.status_code >= 500:
                        raise IOError(f"retryable status {resp.status_code}")
                    resp.raise_for_status()
                    out.extend(resp.json()["result"]["data"])
                    if self.key_manager is not None:
                        # tokens ~ len//4 (the reference's fallback counter)
                        self.key_manager.record_tokens(
                            token, self.model,
                            sum(max(1, len(t) // 4) for t in sub))
                    break
                except Exception:
                    if attempt == self.tries - 1:
                        raise
                    time.sleep(min(delay, self.max_sleep))
                    delay *= self.backoff
        return np.asarray(out, dtype=np.float32)
