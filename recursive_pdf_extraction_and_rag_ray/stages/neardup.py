"""Near-duplicate detection family over a documents-style table
(doc_id, text): MinHash+LSH, SimHash, n-gram Jaccard. Embedding-cosine
near-dup lives in stages/similarity.py.

The reference only does exact dedup (seen-files sha256 index,
/root/reference/src/services/RAG/convert_to_embeddings.py:559-566); these
are the standard published scale-path algorithms a training-data pipeline
needs (MinHash/LSH per Broder 1997; SimHash per Charikar 2002 with the
block-permutation candidate trick of Manku et al. WWW 2007; winnowing per
Schleimer et al. 2003).

Ray-Data shape (all three follow the same skeleton):
    map_batches(signatures)            # vectorized numpy, row-local
      -> flat emit of (bucket, doc_id) rows
      -> groupby(bucket).map_groups(pairs within bucket)   # the shuffle
      -> unique pairs (groupby pair key, keep one)
Buckets bound the pairwise work; the all-to-all moves only (bucket_key,
doc_id[, signature]) rows, never document text.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# --- shingling / minhash -----------------------------------------------------

MINHASH_PERMS = 64
LSH_BANDS = 16          # 16 bands x 4 rows
LSH_ROWS = MINHASH_PERMS // LSH_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(k: int = MINHASH_PERMS, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def char_shingles(text: str, n: int = 5) -> np.ndarray:
    """crc32 of each n-char shingle of the whitespace-normalized text."""
    s = " ".join(text.split()).lower()
    if len(s) < n:
        s = s + " " * (n - len(s))
    vals = {zlib.crc32(s[i:i + n].encode("utf-8")) for i in range(len(s) - n + 1)}
    return np.fromiter(vals, dtype=np.uint64, count=len(vals))


def minhash_signature(text: str) -> np.ndarray:
    x = char_shingles(text)
    if len(x) == 0:
        return np.zeros(MINHASH_PERMS, dtype=np.uint64)
    # h_i(x) = ((a_i * x + b_i) wrapped mod 2^64) mod p — NOT exact
    # universal hashing (a_i can reach 2^61 and x 2^32, so the uint64
    # product wraps before the Mersenne mod). Deterministic and
    # well-mixed in practice; Jaccard estimates remain approximately
    # unbiased. min over shingles per permutation.
    prod = (x[None, :] * _PERM_A[:, None] + _PERM_B[:, None]) % _MERSENNE
    return prod.min(axis=1).astype(np.uint64)


def minhash_jaccard_est(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def _minhash_bucket_rows(batch: pd.DataFrame) -> pd.DataFrame:
    """doc -> LSH_BANDS rows of (bucket, doc_id, sig_hex)."""
    out_bucket: List[str] = []
    out_doc: List[int] = []
    out_sig: List[str] = []
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        sig = minhash_signature(text)
        sig_hex = sig.tobytes().hex()
        for band in range(LSH_BANDS):
            rows = sig[band * LSH_ROWS:(band + 1) * LSH_ROWS]
            key = hashlib.sha1(
                band.to_bytes(2, "little") + rows.tobytes()).hexdigest()[:16]
            out_bucket.append(key)
            out_doc.append(int(doc_id))
            out_sig.append(sig_hex)
    return pd.DataFrame({"bucket": out_bucket, "doc_id": out_doc, "sig": out_sig})


# buckets wider than this are skipped: a bucket holding hundreds of docs
# carries no near-dup signal (its key is a degenerate/common pattern) and
# its O(k^2) pair scan runs in ONE task — the classic LSH hot-bucket skew.
# Standard practice is a width cap (cf. dense-bucket dropping in production
# LSH dedup systems); at 100TB pair generation inside a bucket must be
# bounded or a single degenerate key serializes the stage.
MAX_BUCKET_WIDTH = 200


def _pairs_from_bucket(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    if len(group) > MAX_BUCKET_WIDTH:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard_est": pd.Series([], dtype="float64")})
    g = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    sigs = [np.frombuffer(bytes.fromhex(s), dtype=np.uint64) for s in g["sig"]]
    a_out, b_out, est = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sim = minhash_jaccard_est(sigs[i], sigs[j])
            if sim >= threshold:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[j]))
                est.append(round(sim, 6))
    return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "jaccard_est": est})


def minhash_lsh_pairs(docs: "ray.data.Dataset",
                      threshold: float = 0.8) -> "ray.data.Dataset":
    """documents -> unique candidate near-dup pairs (doc_a < doc_b) with
    minhash-estimated Jaccard >= threshold."""
    from ray.data.aggregate import Max

    buckets = docs.select_columns(["doc_id", "text"]).map_batches(
        _minhash_bucket_rows, batch_format="pandas")
    pairs = buckets.groupby("bucket").map_groups(
        lambda g: _pairs_from_bucket(g, threshold), batch_format="pandas")
    # a pair can surface from several bands -> dedupe on (doc_a, doc_b) with
    # a vectorized aggregate (per-group map_groups on millions of 2-row
    # groups is the measured slow path; see stages/dedup.py)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("jaccard_est", alias_name="jaccard_est"))


# --- simhash -----------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BLOCKS = 4      # 4 x 16-bit blocks; near-dups share >= 1 block
SIMHASH_MAX_HAMMING = 3


def simhash64(text: str) -> int:
    acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for tok in set(text.lower().split()):
        h = int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little")
        bits = np.frombuffer(
            np.uint64(h).tobytes(), dtype=np.uint8)
        bitarr = np.unpackbits(bits, bitorder="little").astype(np.int64)
        acc += bitarr * 2 - 1
    sig = 0
    for i in range(SIMHASH_BITS):
        if acc[i] > 0:
            sig |= 1 << i
    return sig


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _simhash_bucket_rows(batch: pd.DataFrame) -> pd.DataFrame:
    rows = {"bucket": [], "doc_id": [], "sig": []}
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        sig = simhash64(text)
        for blk in range(SIMHASH_BLOCKS):
            val = (sig >> (16 * blk)) & 0xFFFF
            rows["bucket"].append(f"{blk}:{val:04x}")
            rows["doc_id"].append(int(doc_id))
            rows["sig"].append(np.uint64(sig))
    return pd.DataFrame(rows)


def _simhash_pairs(group: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    if len(group) > MAX_BUCKET_WIDTH:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    g = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    sigs = g["sig"].to_numpy()
    a_out, b_out, dist = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = hamming64(int(sigs[i]), int(sigs[j]))
            if d <= max_hamming:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[j]))
                dist.append(d)
    return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "hamming": dist})


def simhash_pairs(docs: "ray.data.Dataset",
                  max_hamming: int = SIMHASH_MAX_HAMMING) -> "ray.data.Dataset":
    from ray.data.aggregate import Min

    buckets = docs.select_columns(["doc_id", "text"]).map_batches(
        _simhash_bucket_rows, batch_format="pandas")
    pairs = buckets.groupby("bucket").map_groups(
        lambda g: _simhash_pairs(g, max_hamming), batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# --- exact n-gram jaccard ----------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def _jaccard_group_pairs(group: pd.DataFrame, n: int, threshold: float) -> pd.DataFrame:
    g = group.sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    grams = [word_ngrams(t, n) for t in g["text"].fillna("")]
    a_out, b_out, sim_out = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            s = jaccard(grams[i], grams[j])
            if s >= threshold:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[j]))
                sim_out.append(round(s, 6))
    return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "jaccard": sim_out})


def ngram_jaccard_pairs(docs: "ray.data.Dataset", *, block_col: str = "source",
                        n: int = 3, threshold: float = 0.5) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard >= threshold for pairs sharing a blocking
    key (pairwise work bounded per block; at scale the blocking key comes
    from LSH buckets rather than a metadata column)."""
    return docs.select_columns([block_col, "doc_id", "text"]).groupby(
        block_col).map_groups(
        lambda g: _jaccard_group_pairs(g, n, threshold), batch_format="pandas")
