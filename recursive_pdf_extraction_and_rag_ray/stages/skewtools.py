"""Skew handling: size-hint pre-pass, explode giant layout payloads into
page-range segments, parse segments in parallel, reassemble per url.

Why: one multi-hundred-page document otherwise occupies one actor for the
whole parse (the reference's exact failure mode — a 600-page scanned PDF
holds a worker until the 1800 s timeout, /root/reference/src/services/RAG/
convert_to_embeddings.py:456,602-638). Ray-native fix: make the unit of
work a bounded segment, then a keyed reassembly.

    pages -> map_batches(explode: giant layout docs -> N segment rows)
          -> map_batches(ExtractSegments actor pool)     # bounded work units
          -> groupby(url).map_groups(reassemble)          # keyed shuffle

Partitioning assumption (documented per north rule): header/footer census
is segment-local, so reassembled text is byte-identical to the whole-doc
parse iff furniture repeats uniformly across pages (per-page running
heads/footers — true for the corpus generator and the common real-world
case; a doc whose furniture appears on < 50% of a segment's pages could
differ). The conformance test pins this on the synthetic giants.

Non-layout (HTML) payloads are never split — a DOM parse is not
page-decomposable — so the explode is a no-op for them (seg 0 of 1).
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.extract_doc import extract_document
from ..functions.layout import LAYOUT_MAGIC, is_layout_payload
from ..functions.textproc import sha256_text

DEFAULT_MAX_PAGES = 50

SEG_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("seg_index", pa.int32()),
    ("n_segs", pa.int32()),
    ("text", pa.string()),
    ("html", pa.large_binary()),
    ("lang", pa.string()),
])


def split_layout_payload(payload: bytes, max_pages: int) -> List[bytes]:
    """Split a layout payload into <= max_pages-page sub-payloads, each a
    valid payload (magic + PAGE blocks)."""
    text = payload.decode("utf-8", errors="replace")
    lines = text.split("\n")
    pages: List[List[str]] = []
    cur: List[str] = []
    for ln in lines[1:]:
        if ln.startswith("PAGE "):
            if cur:
                pages.append(cur)
            cur = [ln]
        elif ln:
            cur.append(ln)
    if cur:
        pages.append(cur)
    if len(pages) <= max_pages:
        return [payload]
    # balanced split: every segment gets >= 2 pages, so per-page furniture
    # always meets the segment-local census threshold max(2, ceil(0.5*s))
    n = len(pages)
    n_segs = -(-n // max_pages)
    size = -(-n // n_segs)
    segs: List[bytes] = []
    magic = LAYOUT_MAGIC.decode()
    for i in range(0, n, size):
        body = "\n".join("\n".join(p) for p in pages[i:i + size])
        segs.append(f"{magic}\n{body}".encode("utf-8"))
    return segs


def explode_giants_batch(batch: pa.Table,
                         max_pages: int = DEFAULT_MAX_PAGES,
                         size_hint: int = 0,
                         keep: tuple = ()) -> pa.Table:
    """pages batch -> segment rows. Direct-text and HTML rows pass through
    as a single segment.

    ``size_hint`` > 0 adds a cheap byte gate: only payloads larger than it
    are even page-counted, and a batch with NO oversized payload takes a
    fully vectorized passthrough (constant seg columns appended, zero
    per-row Python — the explode must cost ~nothing on a normal corpus).
    ``keep`` lists extra columns replicated onto every segment (e.g.
    ``path`` for shard attribution)."""
    import pyarrow.compute as pc

    schema = SEG_SCHEMA
    for c in keep:
        schema = schema.append(pa.field(c, batch.schema.field(c).type))

    def passthrough(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "url": pc.cast(t["url"], pa.string()),
            "seg_index": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            "n_segs": pa.array(np.ones(n, dtype=np.int32), pa.int32()),
            "text": pc.cast(t["text"], pa.string()),
            "html": pc.cast(t["html"], pa.large_binary()),
            "lang": pc.cast(t["lang"], pa.string()),
        }
        for c in keep:
            cols[c] = t[c]
        return pa.table(cols).cast(schema)

    if size_hint > 0:
        lens = pc.fill_null(pc.binary_length(batch["html"]), 0)
        big_mask = pc.greater(lens, size_hint)
        if not pc.any(big_mask).as_py():
            return passthrough(batch)
        small = batch.filter(pc.invert(big_mask))
        big = batch.filter(big_mask)
    else:
        small = batch.slice(0, 0)
        big = batch

    keep_vals = {c: big[c].to_pylist() for c in keep}
    rows = []
    for i, (url, text, html, lang) in enumerate(zip(
            big["url"].to_pylist(), big["text"].to_pylist(),
            big["html"].to_pylist(), big["lang"].to_pylist())):
        payload = html or b""
        if (is_layout_payload(payload) and not (text or "").strip()):
            segs = split_layout_payload(payload, max_pages)
        else:
            segs = [payload]
        n = len(segs)
        for k, seg in enumerate(segs):
            row = {"url": url, "seg_index": k, "n_segs": n,
                   "text": text if k == 0 else "",
                   "html": seg, "lang": lang}
            for c in keep:
                row[c] = keep_vals[c][i]
            rows.append(row)
    exploded = pa.Table.from_pylist(rows, schema=schema)
    if small.num_rows == 0:
        return exploded
    return pa.concat_tables([passthrough(small), exploded])


class ExtractSegments:
    """Actor-pool extraction over bounded segments (same per-row semantics
    as stages.extract.ExtractPages, minus url-meta).

    Multi-segment rows (always layout splits) are parsed UNGATED: the
    ``eff >= 50`` accept threshold is a whole-document rule
    (ocr_engine.py:229-234), so a sparse segment of a giant doc must still
    contribute its text — the gate is applied once, to the reassembled
    whole, in ``_reassemble_group``. Single-segment rows keep the full
    ``extract_document`` routing (gate included), identical to
    ExtractPages."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.layout import extract_layout

        out = {"url": [], "seg_index": [], "n_segs": [], "seg_text": [],
               "seg_method": [], "lang": []}
        for url, seg_index, n_segs, text, html, lang in zip(
                batch["url"].to_pylist(), batch["seg_index"].to_pylist(),
                batch["n_segs"].to_pylist(), batch["text"].to_pylist(),
                batch["html"].to_pylist(), batch["lang"].to_pylist()):
            if n_segs > 1:
                tx, _ = extract_layout(html or b"")
                method = "parsed"
            else:
                tx, method, _ = extract_document(text or "", html or b"")
            out["url"].append(url)
            out["seg_index"].append(seg_index)
            out["n_segs"].append(n_segs)
            out["seg_text"].append(tx)
            out["seg_method"].append(method)
            out["lang"].append(lang)
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "seg_index": pa.array(out["seg_index"], pa.int32()),
            "n_segs": pa.array(out["n_segs"], pa.int32()),
            "seg_text": pa.array(out["seg_text"], pa.large_string()),
            "seg_method": pa.array(out["seg_method"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
        })


def _reassemble_group(group: pa.Table) -> pa.Table:
    idx = group.column("seg_index").to_pylist()
    texts = group.column("seg_text").to_pylist()
    methods = group.column("seg_method").to_pylist()
    order = sorted(range(len(idx)), key=lambda i: idx[i])
    # multi-segment docs are layout parses: page texts join with "\n"
    # (ocr_engine.py:258 analog); single segments pass through untouched.
    # The eff>=50 accept gate (a WHOLE-document rule) is applied here to
    # the reassembled text, not per segment — a sparse segment still
    # contributes its lines exactly as a whole-doc parse would include
    # them.
    # empty segment texts stay in the join: a whole-doc parse keeps empty
    # page entries in its "\n" join, so dropping them would shift bytes
    parts = [texts[i] for i in order]
    full = "\n".join(parts) if len(order) > 1 else (texts[order[0]] if order else "")
    method = methods[order[0]] if order else "empty"
    if len(order) > 1:
        from ..functions.textproc import MIN_EFFECTIVE_CHARS, effective_chars
        if effective_chars(full) >= MIN_EFFECTIVE_CHARS:
            method = "parsed"
        else:
            full, method = "", "empty"
    url = group.column("url").to_pylist()[0]
    lang = group.column("lang").to_pylist()[0]
    return pa.table({
        "url": pa.array([url], pa.string()),
        "text_extracted": pa.array([full], pa.large_string()),
        "text_sha256": pa.array([sha256_text(full)], pa.string()),
        "method": pa.array([method], pa.string()),
        "n_chars": pa.array([len(full)], pa.int64()),
        "lang": pa.array([lang], pa.string()),
    })


# --- exact tiled all-pairs over a blocking key -------------------------------

def _tile_sub_block(ids: np.ndarray, n_tiles: int) -> np.ndarray:
    """Deterministic sub-block per id (Knuth multiplicative hash)."""
    return ((ids.astype(np.uint64) * np.uint64(2654435761)) %
            np.uint64(1 << 32)).astype(np.int64) % n_tiles


def _explode_tiles(df: pd.DataFrame, n_tiles_ref, id_col: str,
                   block_col: str) -> pd.DataFrame:
    """Replicate each row into every tile its sub-block participates in.
    A block of k members with w = max_width gets B = ceil(k/w) sub-blocks
    and B*(B+1)/2 tiles; each row lands in B tiles (one per partner
    sub-block), so the pair space is PARTITIONED exactly: pair (x, y) with
    sub-blocks (bx, by) appears in tile (min, max) only. ``n_tiles_ref``
    is a ray.put dict read zero-copy-ish per batch (never re-shipped)."""
    meta, t_max = ray.get(n_tiles_ref)
    outs = []
    for block, g in df.groupby(block_col, sort=False):
        if block not in meta:
            # every block MUST come from the count pre-pass: a silent
            # (1, 0) fallback would give all unknown blocks _gk=0 and
            # emit cross-block pairs the (block, ti, tj) key never could
            raise KeyError(
                f"block {block!r} missing from tile meta — upstream "
                "lineage changed between the count pass and the explode "
                "pass (non-deterministic input?)")
        n, base = meta[block]
        b = _tile_sub_block(g[id_col].to_numpy(), n)
        for b2 in range(n):
            part = g.copy()
            ti = np.minimum(b, b2)
            tj = np.maximum(b, b2)
            part["_ti"] = ti
            part["_tj"] = tj
            part["_side"] = (b > b2).astype("int64")
            # single fused int64 group key: Ray's multi-column groupby
            # shuffle measures ~10x slower than the same rows under one
            # int key (see BASELINE.md); (block ordinal, ti, tj) packs
            # collision-free because ti, tj < t_max
            part["_gk"] = base + ti * t_max + tj
            outs.append(part)
    if not outs:
        out = df.copy()
        out["_ti"] = pd.Series([], dtype="int64")
        out["_tj"] = pd.Series([], dtype="int64")
        out["_side"] = pd.Series([], dtype="int64")
        out["_gk"] = pd.Series([], dtype="int64")
        return out
    return pd.concat(outs, ignore_index=True)


def tiled_pair_groups(ds: "ray.data.Dataset", *, block_col: str, id_col: str,
                      pair_fn: Callable[[pd.DataFrame], pd.DataFrame],
                      max_width: int = 200) -> "ray.data.Dataset":
    """Exact all-pairs-within-block with bounded per-task work.

    A hot blocking key (one dominant label/source) otherwise serializes the
    stage in a single O(k^2) task. Here blocks wider than ``max_width`` are
    tiled: a count pre-pass (vectorized aggregate, rows = distinct blocks)
    sizes each block's tile grid, rows are replicated ~k/max_width times,
    and each tile becomes its own group — so no task ever sees more than
    2*max_width rows, while the emitted pair set is IDENTICAL to the
    untiled computation. ``pair_fn`` receives a group whose ``_side``
    column is 0/1: all-zero => diagonal tile (pair i<j); mixed => pair
    across sides only.

    Partitioning assumption: replication factor is ceil(k/max_width) per
    row of a width-k block — a single block holding ~the whole corpus
    would square the shuffled volume; cap corpus-scale blocking keys
    upstream (LSH buckets already are)."""
    from ray.data.aggregate import Count

    # count pre-pass ships ONLY the key column, never the payload
    counts = ds.select_columns([block_col]).groupby(block_col).aggregate(
        Count(alias_name="n"))
    n_tiles = {}
    for b in counts.iter_batches(batch_format="pandas", batch_size=65536):
        for block, k in zip(b[block_col], b["n"]):
            n_tiles[block] = max(1, -(-int(k) // max_width))
    import functools

    # fuse (block, ti, tj) into ONE int64 key: the count pre-pass already
    # holds every distinct block on the driver, so a dense ordinal per
    # block is free, and ti/tj < t_max makes the packing collision-free.
    # Ray's multi-column groupby shuffle is ~10x slower than the same
    # rows under a single int key (measured in BASELINE.md), and this
    # groupby moves the REPLICATED pair stream — the stage's whole
    # shuffle volume.
    t_max = max(n_tiles.values(), default=1)
    meta = {}
    base = 0
    for block in n_tiles:                     # insertion order, stable
        meta[block] = (n_tiles[block], base)
        base += n_tiles[block] * t_max + 1
    if base >= (1 << 53):                     # float64-roundtrip key bound
        raise ValueError(
            f"tile key space {base} exceeds 2^53; raise max_width or "
            "pre-partition the blocking key")

    ref = ray.put((meta, t_max))
    exploded = ds.map_batches(
        functools.partial(_explode_tiles, n_tiles_ref=ref, id_col=id_col,
                          block_col=block_col),
        batch_format="pandas")
    return exploded.groupby("_gk").map_groups(pair_fn,
                                              batch_format="pandas")


# byte gate for flagship routing: normal synthetic docs are ~2-20 KB,
# giants ~100x that. Purely a routing hint — a giant below it parses
# whole (correct, just unsplit), a normal layout doc above it splits into
# one segment-set and reassembles byte-identically.
GIANT_PAYLOAD_HINT = 64 * 1024


class ExtractPagesSegmentsRouter:
    """Flagship extraction actor with skew-safe giant routing, SINGLE input
    read: single-segment rows (the overwhelming majority) go through the
    full ``ExtractPages`` semantics unchanged; multi-segment rows (giants
    exploded upstream) are layout-parsed UNGATED and spilled as parsed
    segment rows to ``side_dir`` — bounded work per task, no giant ever
    occupies an actor end-to-end (the reference's 600-page-PDF failure
    mode, convert_to_embeddings.py:456,602-638). The caller reassembles
    the (tiny) spill with one keyed exchange after the main write; only
    parsed giant text moves, never raw payloads, and the pages input is
    scanned exactly once."""

    def __init__(self, side_dir: str, policy: str = "fallback",
                 force_parse: bool = False):
        import os

        from .extract import ExtractPages
        self.side_dir = side_dir
        self.inner = ExtractPages(policy=policy, force_parse=force_parse)
        self._seq = 0
        os.makedirs(side_dir, exist_ok=True)

    def _spill(self, table: pa.Table) -> None:
        import os

        import pyarrow.parquet as pq
        name = f"{os.getpid()}-{self._seq}.parquet"
        self._seq += 1
        tmp = os.path.join(self.side_dir, name + ".tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.side_dir, name))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .extract import SPANS_TYPE, shard_from_path
        from ..functions.layout import extract_layout

        single = batch.filter(pc.equal(batch["n_segs"], 1)) \
            .drop_columns(["seg_index", "n_segs"])
        multi = batch.filter(pc.greater(batch["n_segs"], 1))
        if multi.num_rows:
            segs = {"url": multi["url"].to_pylist(),
                    "seg_index": multi["seg_index"].to_pylist(),
                    "n_segs": multi["n_segs"].to_pylist(),
                    "lang": multi["lang"].to_pylist(),
                    "shard": [shard_from_path(p)
                              for p in multi["path"].to_pylist()]}
            texts, spans_col = [], []
            for payload in multi["html"].to_pylist():
                tx, spans = extract_layout(payload or b"")
                texts.append(tx)
                spans_col.append([{"block_id": b, "start": s, "end": e}
                                  for b, s, e in spans])
            self._spill(pa.table({
                "url": pa.array(segs["url"], pa.string()),
                "seg_index": pa.array(segs["seg_index"], pa.int32()),
                "n_segs": pa.array(segs["n_segs"], pa.int32()),
                "seg_text": pa.array(texts, pa.large_string()),
                "spans": pa.array(spans_col, SPANS_TYPE),
                "lang": pa.array(segs["lang"], pa.string()),
                "shard": pa.array(segs["shard"], pa.string()),
            }))
        return self.inner(single)


def _reassemble_group_full(group: pa.Table) -> pa.Table:
    """Spilled segment rows of ONE url -> one full docs-schema row,
    byte-identical to the whole-doc parse under the uniform-furniture
    assumption (module docstring; conformance-tested). Spans are merged
    with cumulative page-index and char offsets, so block ids and offsets
    equal the whole-doc parse's. Duplicate seg_index rows (a retried
    spill task) are dropped — segment content is deterministic."""
    from ..functions.textproc import MIN_EFFECTIVE_CHARS, effective_chars
    from ..functions.urlmeta import parse_url_meta
    from .extract import SPANS_TYPE

    df = group.to_pandas().drop_duplicates("seg_index") \
        .sort_values("seg_index")
    parts = df["seg_text"].tolist()
    full = "\n".join(parts)
    spans: List[dict] = []
    if effective_chars(full) >= MIN_EFFECTIVE_CHARS:
        method = "parsed"
        page_base = 0
        char_base = 0
        for k, (txt, seg_spans) in enumerate(zip(parts, df["spans"])):
            if k:
                char_base += 1  # the "\n" segment joiner
            for s in seg_spans:
                spans.append({"block_id": int(s["block_id"]) + page_base,
                              "start": int(s["start"]) + char_base,
                              "end": int(s["end"]) + char_base})
            page_base += len(seg_spans)
            char_base += len(txt)
    else:
        full, method = "", "empty"
    url = df["url"].iloc[0]
    meta = parse_url_meta(url)
    digest = sha256_text(full)
    return pa.table({
        "url": pa.array([url], pa.string()),
        "text_extracted": pa.array([full], pa.large_string()),
        "text_sha256": pa.array([digest], pa.string()),
        "spans": pa.array([spans], SPANS_TYPE),
        "method": pa.array([method], pa.string()),
        "n_blocks": pa.array([len(spans)], pa.int32()),
        "n_chars": pa.array([len(full)], pa.int64()),
        "lang": pa.array([df["lang"].iloc[0]], pa.string()),
        "host": pa.array([meta["host"]], pa.string()),
        "group_key": pa.array([meta["group_key"]], pa.string()),
        "doc_hash": pa.array([digest], pa.string()),
        "shard": pa.array([df["shard"].iloc[0]], pa.string()),
    })


def reassemble_spilled_segments(side_dir: str) -> "ray.data.Dataset":
    """Read the spill and reassemble per url — the only keyed exchange of
    the skew-safe extract path, over parsed giant text only (a tiny
    fraction of the corpus by construction)."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(side_dir, "*.parquet")))
    ds = ray.data.read_parquet(files)
    return ds.groupby("url").map_groups(_reassemble_group_full,
                                        batch_format="pyarrow")


def extract_with_giant_split(pages: "ray.data.Dataset", *,
                             max_pages: int = DEFAULT_MAX_PAGES,
                             concurrency=(1, 8),
                             batch_size: int = 32) -> "ray.data.Dataset":
    """The skew-safe extraction pipeline variant."""
    segs = pages.map_batches(
        lambda t: explode_giants_batch(t, max_pages), batch_format="pyarrow")
    parsed = segs.map_batches(ExtractSegments, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency)
    return parsed.groupby("url").map_groups(_reassemble_group,
                                            batch_format="pyarrow")
