"""Deterministic synthetic ``pages`` corpus generator (FIXTURES.md section 1).

Two entry points:

- ``synthesize_corpus`` — pure-Python seeded writer for tests: controlled
  rates of exact duplicates, intra-doc repeated paragraphs, near-empty docs,
  giant skewed docs, one hot host, CRLF + PAGE BREAK markers.
- ``pages_from_documents_batch`` — row-local Arrow batch transform turning
  the driver's ``documents`` table into pages of the exact input_hint shape
  ``(url, warc_ts, html, text, lang)``; used by ``entry()`` and ``bench.py``
  through ``ray.data.read_parquet(...).map_batches(...)``. Every page is a
  pure function of ``(doc_id, text, lang)`` so the result is deterministic
  under any partitioning.

No wall-clock, no global RNG: every random draw comes from a ``Random``
seeded by (seed, doc index).
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import PAGES

EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z
TS_STEP_US = 137_000_000

HOT_HOST = "www.bigportal.example"
HOSTS = [
    "news.alpha.example", "blog.beta.example", "docs.gamma.example",
    "wiki.delta.example", "shop.epsilon.example", "forum.zeta.example",
    "www.eta.example", "m.theta.example", "static.iota.example",
    "papers.kappa.example", "mail.lambda.example", "cdn.mu.example",
    "app.nu.example", "data.xi.example", "dev.omicron.example",
    "api.pi.example", "status.rho.example", "learn.sigma.example",
    "about.tau.example",
]
SECTIONS = ["articles", "posts", "docs", "wiki", "products", "threads",
            "research", "guides", "reviews", "archive"]

WORDS = (
    "the a of to and in that for with as on by this from are was were has "
    "have will can may should system data value table stream batch merge "
    "sort hash join scan index vector column row group window page block "
    "shard key order filter count total result model text content page "
    "engine parse extract chunk embed store query plan cost time size "
    "memory disk network node cluster task actor stage schema record field"
).split()

LINK_WORDS = "home about contact login signup terms privacy sitemap help faq".split()


def _host_for(i: int, rng: random.Random) -> str:
    # one hot host carries ~30% of rows (skew fixture), rest zipf-ish
    if rng.random() < 0.30:
        return HOT_HOST
    r = rng.random()
    idx = min(int(len(HOSTS) * (r ** 2.0)), len(HOSTS) - 1)  # quadratic skew
    return HOSTS[idx]


def _paragraph(rng: random.Random, words: List[str], n_words: int) -> str:
    toks = [words[rng.randrange(len(words))] for _ in range(n_words)]
    toks[0] = toks[0].capitalize()
    return " ".join(toks) + "."


def _content_paras(rng: random.Random, words: List[str], n_paras: int) -> List[str]:
    return [_paragraph(rng, words, 40 + rng.randrange(50)) for _ in range(n_paras)]


def render_html(title: str, paras: List[str], rng: random.Random) -> bytes:
    """Boilerplate scaffold (nav/header/footer/aside, link-dense blocks)
    wrapping the known main content in <article><p> blocks."""
    nav = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(LINK_WORDS, 6)
    )
    related = "".join(
        f'<li><a href="/r/{i}">{_paragraph(rng, WORDS, 4)}</a></li>' for i in range(5)
    )
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    html = f"""<!DOCTYPE html>
<html><head><title>{title}</title>
<script>var t={rng.randrange(10 ** 6)};track(t);</script>
<style>.main{{color:#222}}</style>
</head><body>
<header><h1><a href="/">{title[:20]}</a></h1><nav>{nav}</nav></header>
<aside><h3>Related</h3><ul>{related}</ul></aside>
<div id="content"><article>
<h1>{title}</h1>
{body_paras}
</article></div>
<div class="share">{nav}</div>
<footer><p>copyright {rng.randrange(2015, 2026)} example inc. {nav}</p></footer>
</body></html>"""
    return html.encode("utf-8")


def _render_layout_det(paras: List[str], two_col: bool) -> bytes:
    """Page-oriented layout payload (grammar in functions/layout.py) with
    repeating header/footer furniture and optional 2-column reading order."""
    w, h = 612, 792
    flat: List[str] = []
    for p in paras:
        toks = p.split()
        for j in range(0, len(toks), 9):
            flat.append(" ".join(toks[j:j + 9]))
    pages = [flat[i:i + 40] for i in range(0, len(flat), 40)]
    out = ["%RPX-LAYOUT 1"]
    for pno, page_lines in enumerate(pages):
        out.append(f"PAGE {w} {h}")
        out.append("72 30 CONFIDENTIAL DRAFT")
        if two_col:
            half = (len(page_lines) + 1) // 2
            for k, ln in enumerate(page_lines[:half]):
                out.append(f"72 {100 + k * 16} {ln}")
            for k, ln in enumerate(page_lines[half:]):
                out.append(f"320 {100 + k * 16} {ln}")
        else:
            for k, ln in enumerate(page_lines):
                out.append(f"72 {100 + k * 16} {ln}")
        out.append(f"280 770 - {pno + 1} -")
    return "\n".join(out).encode("utf-8")


# route codes
R_DIRECT, R_HTML, R_LAYOUT, R_EMPTY = "direct", "html", "layout", "empty"


def _route_for(i: int) -> str:
    h = (i * 2654435761) % 100  # Knuth multiplicative hash -> stable bucket
    if h < 45:
        return R_DIRECT
    if h < 80:
        return R_HTML
    if h < 92:
        return R_LAYOUT
    return R_EMPTY


def _page_row(i: int, paras: List[str], lang: str, seed: int,
              route: Optional[str] = None,
              content_key: Optional[int] = None) -> Dict:
    rng = random.Random((seed << 20) ^ i)
    # text-affecting draws (joiner, page-break injection) come from an RNG
    # keyed by the SHARED content index, so both rows of an exact-duplicate
    # pair (same paras, different urls) render byte-identical text — with
    # the per-row rng, ~20% of intended dup pairs diverged on the injected
    # PAGE BREAK and silently weakened the corpus-dedup fixture
    trng = random.Random((seed << 24) ^ (i if content_key is None else content_key))
    route = route or _route_for(i)
    host = _host_for(i, rng)
    section = SECTIONS[i % len(SECTIONS)]
    url = f"https://{host}/{section}/item-{i:08d}"
    title = _paragraph(rng, WORDS, 6)[:-1]

    text, html = "", b""
    if route == R_DIRECT:
        joiner = "\r\n\r\n" if trng.random() < 0.25 else "\n\n"
        body = joiner.join(paras)
        if trng.random() < 0.2 and len(paras) > 2:
            # inject an OCR-style page-break marker (reference main.py:163,169)
            parts = body.split(joiner)
            mid = len(parts) // 2
            body = joiner.join(parts[:mid]) + f"{joiner}--- PAGE BREAK ---{joiner}" + joiner.join(parts[mid:])
        text = body
        html = render_html(title, paras, rng)  # present but unused on direct path
    elif route == R_HTML:
        text = "" if rng.random() < 0.7 else "n/a"  # below eff>=50 -> parse path
        html = render_html(title, paras, rng)
    elif route == R_LAYOUT:
        text = ""
        html = _render_layout_det(paras, two_col=(i % 3 == 0))
    else:  # near-empty (skip reason empty_text)
        text = "ok."
        html = b"<html><body><p>404</p></body></html>"

    return {
        "url": url,
        "warc_ts": EPOCH_US + i * TS_STEP_US,
        "html": html,
        "text": text,
        "lang": lang,
    }


def synthesize_corpus(out_dir: str, n_docs: int = 500, n_shards: int = 8,
                      seed: int = 42) -> List[str]:
    """Write ``part-{i:05d}.parquet`` shards (contiguous row ranges — stable
    partition boundaries for lineage/resume). Returns shard paths."""
    os.makedirs(out_dir, exist_ok=True)
    rows: List[Dict] = []
    langs = ["en"] * 8 + ["de", "fr"]
    dup_content: Dict[int, List[str]] = {}
    for i in range(n_docs):
        rng = random.Random((seed << 21) ^ i)
        lang = langs[i % len(langs)]
        giant = (i % 211 == 13)
        if giant:
            # ~100x median size, multi-hundred layout pages (skew fixture)
            paras = _content_paras(rng, WORDS, 600)
        elif i % 37 == 5:
            # intra-doc repeated paragraphs: alternate two >max_chars paras so
            # merged+overlapped chunks repeat (exercises chunking.py:50-61 analog)
            a = _paragraph(rng, WORDS, 400)
            b = _paragraph(rng, WORDS, 400)
            paras = [a, b, a, b, a, b, a, b]
        else:
            paras = _content_paras(rng, WORDS, 4 + rng.randrange(8))

        if i % 29 == 1 and i > 1:
            # exact whole-document duplicate of row i-1 (different url);
            # content_key=i-1 replays the SAME joiner/page-break draws
            prev = dup_content.get(i - 1)
            if prev is not None:
                paras = prev
                rows.append(_page_row(i, paras, lang, seed, route=R_DIRECT,
                                      content_key=i - 1))
                continue
        if i % 29 == 0:
            dup_content[i] = paras
            rows.append(_page_row(i, paras, lang, seed, route=R_DIRECT))
            continue
        rows.append(_page_row(i, paras, lang, seed,
                              route=R_LAYOUT if giant else None))

    paths: List[str] = []
    per = (n_docs + n_shards - 1) // n_shards
    for s in range(n_shards):
        shard_rows = rows[s * per:(s + 1) * per]
        if not shard_rows:
            break
        table = pa.Table.from_pylist(shard_rows, schema=PAGES)
        path = os.path.join(out_dir, f"part-{s:05d}.parquet")
        pq.write_table(table, path)
        paths.append(path)
    return paths


def pages_from_documents_batch(batch: pa.Table, *, seed: int = 42,
                               repeat: int = 1, paras_base: int = 4,
                               paras_spread: int = 8) -> pa.Table:
    """Arrow batch transform: driver ``documents`` rows -> ``pages`` rows.

    Row-local and deterministic: content is a pure function of
    ``(doc_id, repeat_index, text)``; rows with page index ``i % 29 in
    {0, 1}`` share pool-generated content (an exact-duplicate pair with
    different urls); every 211th page is a giant (skew fixture). ``repeat``
    emits that many pages per source document (distinct urls/content) so
    benchmarks can scale the corpus independently of the documents table.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    out: List[Dict] = []
    for doc_id, text, lang in zip(doc_ids, texts, langs):
        for r in range(max(1, repeat)):
            i = int(doc_id) * max(1, repeat) + r
            rng = random.Random((seed << 22) ^ (i - (i % 29 == 1)))
            if i % 29 in (0, 1):
                paras = _content_paras(rng, WORDS, 6)
                out.append(_page_row(i, paras, lang, seed, route=R_DIRECT,
                                     content_key=i - (i % 29 == 1)))
                continue
            words = text.split() or ["empty"]
            if i % 211 == 13:
                paras = _content_paras(rng, words, 200)  # giant doc
            elif i % 37 == 5:
                a = _paragraph(rng, words, 400)
                b = _paragraph(rng, words, 400)
                paras = [a, b, a, b, a, b]
            else:
                paras = _content_paras(
                    rng, words, paras_base + rng.randrange(paras_spread))
            out.append(_page_row(i, paras, lang, seed))
    return pa.Table.from_pylist(out, schema=PAGES)
