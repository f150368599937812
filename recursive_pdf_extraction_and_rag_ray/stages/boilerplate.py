"""Corpus-frequency boilerplate line removal (CCNet / RefinedWeb
style): drop every line that appears in >= ``min_df`` DISTINCT
documents — navigation bars, cookie banners, footers — and reassemble
each document from its surviving lines in original order.

Reference parity: the reference cleans page furniture inside its
extract path (repeated header/footer strings per PDF,
src/services/RAG/convert_to_embeddings.py paragraph filters); this is
the corpus-global generalization a 100 TB web pipeline needs.

Scale shape (two passes, no all-to-all on documents):
1. **DF count** — per-batch explode + per-doc dedup + ``value_counts``
   partials (each batch shrinks to its distinct lines), combined with
   the same bounded driver / coarse-hash-partitioned reduce the token
   sketches use (stages/sketch.py:_combine_value_counts). Exact
   because each document lives in exactly one batch, so per-batch
   distinct-doc counts sum to corpus distinct-doc counts.
2. **Scrub** — the frequent set (tiny by nature: boilerplate is what
   repeats) is ``ray.put`` once and probed per batch with one
   vectorized ``isin`` over the exploded lines; documents never
   shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from .sketch import _combine_value_counts

LINE_SEP = "\n"


def _explode_lines(df: pd.DataFrame, text_col: str):
    """Flatten a batch's texts to (parent_row, line) with one C-level
    split per row. Empty text yields one empty line, matching DuckDB's
    ``string_split('', chr(10)) = ['']``."""
    splits = df[text_col].fillna("").str.split(LINE_SEP)
    lens = splits.str.len().to_numpy()
    if len(df) == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=object)
    flat = np.concatenate(splits.to_numpy())
    parent = np.repeat(np.arange(len(df), dtype=np.int64), lens)
    return parent, flat


def _line_df_partials(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """(line, n) rows: n = distinct documents IN THIS BATCH containing
    the line (a line repeated within one document counts once)."""
    parent, flat = _explode_lines(df, text_col)
    if not len(flat):
        return pd.DataFrame({"line": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    uniq = pd.DataFrame({"p": parent, "line": flat}).drop_duplicates()
    vc = uniq["line"].value_counts()
    return pd.DataFrame({"line": vc.index.to_numpy(),
                         "n": vc.to_numpy().astype("int64")})


def frequent_lines(ds, *, min_df: int = 2, text_col: str = "text",
                   distributed: bool = False) -> pd.DataFrame:
    """Exact corpus document-frequency per line, filtered to
    df >= min_df. The result is small by construction (only repeated
    boilerplate survives the filter); the pre-filter combine is the
    documented sketch-combine path with its coarse-partition
    distributed variant."""
    parts = ds.select_columns([text_col]).map_batches(
        lambda df: _line_df_partials(df, text_col),
        batch_format="pandas")
    tot = _combine_value_counts(parts, "line", distributed)
    if not len(tot):
        return pd.DataFrame({"line": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    out = tot[tot["n"] >= min_df].reset_index(drop=True)
    return out.astype({"n": "int64"})


def remove_boilerplate_lines(ds, *, min_df: int = 2,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             distributed: bool = False):
    """Dataset of (id_col, text_col cleaned, n_removed): every line
    present in >= min_df distinct documents is dropped, survivors are
    re-joined in original order ('' when nothing survives)."""
    hot = frequent_lines(ds, min_df=min_df, text_col=text_col,
                         distributed=distributed)
    hot_ref = ray.put(hot["line"].to_numpy())

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        hot_lines = ray.get(hot_ref)
        parent, flat = _explode_lines(df, text_col)
        n = len(df)
        if not len(flat):
            return pd.DataFrame({
                id_col: df[id_col].to_numpy(),
                text_col: np.array([""] * n, dtype=object),
                "n_removed": np.zeros(n, dtype="int64")})
        keep = ~pd.Series(flat).isin(hot_lines).to_numpy()
        joined = pd.Series(flat[keep]).groupby(parent[keep]) \
            .agg(LINE_SEP.join)
        cleaned = np.array([""] * n, dtype=object)
        cleaned[joined.index.to_numpy()] = joined.to_numpy()
        n_lines = np.bincount(parent, minlength=n)
        n_kept = np.bincount(parent[keep], minlength=n)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            text_col: cleaned,
            "n_removed": (n_lines - n_kept).astype("int64")})

    return ds.map_batches(scrub, batch_format="pandas")
