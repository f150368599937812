"""User-extension surface (SURVEY 2.11): a Stage registry and a pipeline
assembled from a plain config list — the Ray-native analog of the
reference's CLI-flag / env-overlay extension surface
(/root/reference/src/services/RAG/convert_to_embeddings.py:448-485,
config.py:7-39) and its duck-typed pluggable embedding providers
(cf_bge_service.py:19-24, ollama_service.py:17-99).

A stage is either a batch FUNCTION (stateless task) or a callable CLASS
(stateful actor pool, built once per actor); both are registered under a
name with their batch format and defaults, and ``build_pipeline`` chains
them over a Dataset from a config like:

    [{"stage": "extract", "concurrency": 8, "batch_size": 64},
     {"stage": "chunk"},
     {"stage": "embed.hash", "batch_size": 96, "concurrency": 4}]

Per-stage config keys ``batch_size``, ``concurrency``, ``num_cpus``
override the registered defaults; anything else is passed to the stage
constructor (actor stages) or via functools.partial (function stages).
"""

from __future__ import annotations

import functools
import inspect
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import ray.data


@dataclass(frozen=True)
class StageSpec:
    name: str
    fn: Callable            # batch fn, or callable class for actor stages
    batch_format: str = "pyarrow"
    batch_size: Optional[int] = None
    concurrency: Optional[int] = None   # set => actor pool (autoscale 1..n)
    num_cpus: int = 1
    defaults: Dict[str, Any] = field(default_factory=dict)

    @property
    def is_actor(self) -> bool:
        return inspect.isclass(self.fn)


_REGISTRY: Dict[str, StageSpec] = {}


def register_stage(spec: StageSpec) -> None:
    _REGISTRY[spec.name] = spec


def registered_stages() -> List[str]:
    return sorted(_REGISTRY)


def get_stage(name: str) -> StageSpec:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown stage {name!r}; registered: {registered_stages()}")
    return _REGISTRY[name]


def _apply(ds: "ray.data.Dataset", spec: StageSpec,
           conf: Dict[str, Any]) -> "ray.data.Dataset":
    kwargs: Dict[str, Any] = {"batch_format": spec.batch_format}
    bs = conf.get("batch_size", spec.batch_size)
    if bs is not None:
        kwargs["batch_size"] = bs
    extra = {k: v for k, v in {**spec.defaults, **conf}.items()
             if k not in ("stage", "batch_size", "concurrency", "num_cpus")}
    if spec.is_actor:
        n = conf.get("concurrency", spec.concurrency) or 2
        kwargs["concurrency"] = (1, int(n))  # autoscale: never starve reads
        kwargs["num_cpus"] = conf.get("num_cpus", spec.num_cpus)
        if extra:
            kwargs["fn_constructor_kwargs"] = extra
        return ds.map_batches(spec.fn, **kwargs)
    fn = functools.partial(spec.fn, **extra) if extra else spec.fn
    return ds.map_batches(fn, **kwargs)


def build_pipeline(config: List[Dict[str, Any]]) \
        -> Callable[["ray.data.Dataset"], "ray.data.Dataset"]:
    """Config list -> composed Dataset transform. Stage names are resolved
    at build time so a bad config fails before any execution."""
    resolved = [(get_stage(c["stage"]), c) for c in config]

    def run(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        for spec, conf in resolved:
            ds = _apply(ds, spec, conf)
        return ds

    return run


def _register_builtins() -> None:
    from ..stages.chunk import chunk_docs_batch
    from ..stages.embed import (HashEmbedder, HttpEmbedder,
                                RandomProjectionEmbedder)
    from ..stages.extract import ExtractPages
    from ..stages import textstats

    register_stage(StageSpec("extract", ExtractPages, batch_size=64,
                             concurrency=8))
    register_stage(StageSpec("chunk", chunk_docs_batch))
    register_stage(StageSpec("embed.hash", HashEmbedder, batch_size=96,
                             concurrency=4))
    register_stage(StageSpec("embed.http", HttpEmbedder, batch_size=96,
                             concurrency=4))
    register_stage(StageSpec("embed.rp", RandomProjectionEmbedder,
                             batch_size=96, concurrency=4))
    for name in ("token_count", "lang_id", "quality_score", "fingerprint",
                 "doc_type", "completeness", "rolling_fingerprint"):
        register_stage(StageSpec(
            f"textstats.{name}", getattr(textstats, f"{name}_batch"),
            batch_format="pandas"))


_register_builtins()
