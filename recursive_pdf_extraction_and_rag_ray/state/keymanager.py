"""Keyed rate-limit / rotation state for external-service actor pools.

Reference semantics (/root/reference/src/services/Gemini/
api_key_manager.py:11-133 and rate_limit_data.py:8-13): a pool of API
keys, each gated per model by requests-per-minute (sliding 60 s window),
requests-per-day, and a daily token budget; `get_key` returns the current
key if available else rotates to the next available one, raising once the
rotation wraps with nothing available. This is the reference pipeline's
real backpressure mechanism for its network embedder.

Ray-native placement: ONE KeyManager lives inside each embedder actor
(per-actor key slices) or as a small named `@ray.remote` actor shared by
the pool when keys must be globally coordinated; either way the state
never touches the driver's hot path. The clock is injectable so the
sliding-window gating is unit-testable deterministically. The reference's
JSON cache persistence is replaced by the lineage/metrics tables (daily
counters are reconstructable), so nothing here writes files.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List


@dataclass(frozen=True)
class RateLimit:
    """Per-model limits (reference rate_limit_data.py:8-13 shape)."""
    per_minute: int
    per_day: int
    tokens_per_day: int = 2_000_000  # reference api_key_manager.py:97-99


@dataclass
class _KeyUsage:
    rpd: Dict[str, int] = field(default_factory=dict)
    tokens: Dict[str, int] = field(default_factory=dict)
    rpm_ts: Dict[str, List[float]] = field(default_factory=dict)


class AllKeysExhausted(RuntimeError):
    pass


class KeyManager:
    """Deterministic reimplementation of the reference's ApiKeyManager
    gating + rotation (api_key_manager.py:63-133)."""

    def __init__(self, keys: List[str], limits: Dict[str, RateLimit],
                 clock: Callable[[], float] = time.monotonic):
        if not keys:
            raise ValueError("No API keys configured.")
        self.keys = list(keys)
        self.limits = dict(limits)
        self.clock = clock
        self.current = 0
        self._usage = {k: _KeyUsage() for k in self.keys}

    def is_key_available(self, key: str, model: str) -> bool:
        lim = self.limits[model]
        u = self._usage[key]
        if u.rpd.get(model, 0) >= lim.per_day:
            return False
        now = self.clock()
        ts = [t for t in u.rpm_ts.get(model, []) if now - t < 60.0]
        u.rpm_ts[model] = ts
        if len(ts) >= lim.per_minute:
            return False
        if u.tokens.get(model, 0) >= lim.tokens_per_day:
            return False
        return True

    def get_key(self, model: str) -> str:
        key = self.keys[self.current]
        if self.is_key_available(key, model):
            return key
        return self.rotate_key(model)

    def rotate_key(self, model: str) -> str:
        """Advance to the next available key; one full wrap with nothing
        available raises (reference api_key_manager.py:121-133)."""
        start = self.current
        while True:
            self.current = (self.current + 1) % len(self.keys)
            if self.current == start:
                raise AllKeysExhausted("All API keys are over their limits.")
            key = self.keys[self.current]
            if self.is_key_available(key, model):
                return key

    def record_request(self, key: str, model: str) -> None:
        """Count a request at SEND time (rpm window + daily counter) —
        failed/retried requests still consume the provider's rate limit,
        so recording only on success would under-throttle."""
        u = self._usage[key]
        u.rpd[model] = u.rpd.get(model, 0) + 1
        u.rpm_ts.setdefault(model, []).append(self.clock())

    def record_tokens(self, key: str, model: str, tokens: int) -> None:
        """Add to the daily token budget (known only after success)."""
        u = self._usage[key]
        u.tokens[model] = u.tokens.get(model, 0) + tokens

    def update_usage(self, key: str, model: str, tokens: int) -> None:
        """One-shot request + tokens (send and success coincide)."""
        self.record_request(key, model)
        self.record_tokens(key, model, tokens)

    def reset_daily(self) -> None:
        """New-day reset (reference _load_cache date rollover)."""
        self._usage = {k: _KeyUsage() for k in self.keys}
        self.current = 0
