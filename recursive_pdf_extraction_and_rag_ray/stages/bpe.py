"""Byte-pair-encoding tokenizer TRAINING and encoding over the corpus
(Sennrich, Haddow, Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units", ACL — public method).

The published algorithm is two-phase, and the phases have opposite
scale shapes — which is exactly what makes it Ray-Data-friendly:

1. **Word-frequency collection scans the corpus** — one distributed
   wordcount (per-batch explode + value_counts partials, one
   groupby-sum shuffle of slim (word, n) rows, top-``max_words`` cut by
   a deterministic sort). The corpus is touched exactly once.
2. **Merge learning runs over the BOUNDED vocabulary** — the classic
   greedy loop (count weighted adjacent symbol pairs, merge the most
   frequent, repeat) iterates over <= max_words weighted word shapes on
   the driver. No corpus pass per merge: a 100 TB corpus and a 100 MB
   corpus pay the same training cost after the wordcount.
3. **Encoding scans the corpus again** — an actor-pool stage with the
   (small) learned merge ranks broadcast once and applied per UNIQUE
   word with a per-actor cache, so a word is encoded once per actor,
   not once per occurrence.

Ties in merge selection break lexicographically, so the merge sequence
is a pure function of the wordcount table — partitioning- and
run-invariant (tested).

Reference parity note: the reference counts tokens with tiktoken or
len//4 (src/services/Gemini/gemini_service.py); training a corpus
tokenizer is the upstream capability a from-scratch training-data
pipeline adds.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

import ray

WORD_RE = re.compile(r"[a-z']+")
END = "</w>"


def bpe_wordcounts(ds: "ray.data.Dataset", *, text_col: str = "text",
                   max_words: int = 8192) -> pd.DataFrame:
    """Distributed (word, n) frequency table, top ``max_words`` by
    (n desc, word asc). Slim partial rows only; the returned table is
    vocabulary-sized (driver-safe by construction)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # one C-level pass: join the batch's texts (the word regex can't
        # match across the '\n' joiner), findall once, value_counts once
        blob = "\n".join(t or "" for t in df[text_col]).lower()
        vc = pd.Series(WORD_RE.findall(blob), dtype="object").value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    counts = ds.select_columns([text_col]) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("word").aggregate(Sum("n", alias_name="n"))

    # distributed top-max_words cut: after the groupby-sum the totals are
    # FINAL and each word lives in exactly one output block, so a
    # block-local top-max_words by (n desc, word asc) provably contains
    # the global top-max_words. Only <= blocks x max_words rows ever
    # reach the driver — vocabulary-sized, never the corpus-distinct-word
    # table (at web scale raw [a-z']+ vocabularies run 1e8-1e9 rows).
    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n"] = df["n"].astype("int64")
        return df.sort_values(["n", "word"], ascending=[False, True],
                              kind="mergesort").head(max_words)

    df = counts.map_batches(block_top, batch_format="pandas").to_pandas()
    df = df.sort_values(["n", "word"], ascending=[False, True],
                        kind="mergesort").head(max_words)
    return df.reset_index(drop=True)


def bpe_train(wordcounts: pd.DataFrame,
              n_merges: int = 200) -> List[Tuple[str, str]]:
    """Greedy BPE merge learning over the bounded word-frequency table
    (driver-side by design — the input is vocabulary-sized, never the
    corpus). Deterministic: ties break on the lexicographically
    smallest pair."""
    shapes: Dict[Tuple[str, ...], int] = {}
    for w, n in zip(wordcounts["word"], wordcounts["n"]):
        shapes[tuple(w) + (END,)] = shapes.get(tuple(w) + (END,), 0) \
            + int(n)
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for shape, n in shapes.items():
            for a, b in zip(shape, shape[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # deterministic argmax: highest count, then smallest pair
        top = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == top)
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_shapes: Dict[Tuple[str, ...], int] = {}
        for shape, n in shapes.items():
            out: List[str] = []
            i = 0
            while i < len(shape):
                if (i + 1 < len(shape) and shape[i] == best[0]
                        and shape[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(shape[i])
                    i += 1
            key = tuple(out)
            new_shapes[key] = new_shapes.get(key, 0) + n
        shapes = new_shapes
    return merges


def _encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> int:
    """Number of BPE tokens for one word under the learned merges —
    standard rank-greedy application."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


class BpeCounter:
    """Actor-pool encode stage: merge ranks built once per actor from
    the broadcast merge list; per-word token counts cached so each
    unique word is encoded once per actor, not once per occurrence."""

    def __init__(self, merges_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        merges = ray.get(merges_ref)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.id_col = id_col
        self.text_col = text_col
        self.cache: Dict[str, int] = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # vectorized shape: findall per row (C regex), explode, encode
        # only UNIQUE NEW words (per-actor cache), then one mapped
        # groupby-sum back to rows
        words = df[self.text_col].fillna("").str.lower() \
            .str.findall(WORD_RE)
        ex = words.reset_index(drop=True).explode().dropna()
        for w in pd.unique(ex):
            if w not in self.cache:
                self.cache[w] = _encode_word(w, self.ranks)
        per_doc = ex.map(self.cache).groupby(level=0).sum()
        out_n = np.zeros(len(df), dtype=np.int64)
        out_n[per_doc.index.to_numpy()] = per_doc.to_numpy()
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy().astype("int64"),
            "n_bpe_tokens": out_n})


def bpe_token_counts(ds: "ray.data.Dataset",
                     merges: List[Tuple[str, str]], *,
                     id_col: str = "doc_id", text_col: str = "text",
                     concurrency=(1, 8)) -> "ray.data.Dataset":
    """(id, n_bpe_tokens) per document under the trained merges."""
    ref = ray.put([tuple(m) for m in merges])
    return ds.select_columns([id_col, text_col]).map_batches(
        BpeCounter, fn_constructor_args=(ref, id_col, text_col),
        batch_format="pandas", concurrency=concurrency)
