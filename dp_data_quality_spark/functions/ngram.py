"""Shared byte-n-gram hashing for the langid and perplexity scorers.

The scoring hot path is fully numpy-vectorized over an Arrow batch: all
texts in the batch are UTF-8 encoded into ONE contiguous byte buffer with
NUL separators, n-gram bucket indexes are computed with vectorized
integer arithmetic, per-row aggregation uses ``np.add.reduceat`` — no
per-row Python loop anywhere (north rule).  N-grams touching a NUL
separator are masked out, so no n-gram crosses a row boundary.
"""

from __future__ import annotations

import numpy as np

N_BUCKETS = 1 << 16  # 65536
_MULT = 31


def hash_ngrams(buf: np.ndarray, n: int) -> np.ndarray:
    """Bucket index for every length-``n`` window of ``buf`` (uint8).
    Returns int64 array of len(buf)-n+1 (empty if buf too short)."""
    if len(buf) < n:
        return np.empty(0, dtype=np.int64)
    acc = np.zeros(len(buf) - n + 1, dtype=np.int64)
    for k in range(n):
        acc = acc * _MULT + buf[k : len(buf) - n + 1 + k]
    return acc % N_BUCKETS


def encode_batch(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode a sequence of (possibly-None) strings into one NUL-separated
    byte buffer.  Returns (buffer uint8, start offsets int64, lengths int64).
    None → length 0."""
    encoded = [(t.encode("utf-8", "ignore") if isinstance(t, str) else b"") for t in texts]
    lengths = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=len(encoded))
    # one NUL after each text (also terminates the last one)
    total = int(lengths.sum()) + len(encoded)
    buf = np.zeros(total, dtype=np.uint8)
    offsets = np.zeros(len(encoded), dtype=np.int64)
    pos = 0
    for i, b in enumerate(encoded):
        offsets[i] = pos
        if b:
            buf[pos : pos + len(b)] = np.frombuffer(b, dtype=np.uint8)
        pos += len(b) + 1
    return buf, offsets, lengths


def rowwise_ngram_stats(
    buf: np.ndarray,
    offsets: np.ndarray,
    n: int,
    logprob_table: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """For each row segment of ``buf``: (sum of table[bucket] over the row's
    n-grams, count of valid n-grams).

    ``logprob_table`` may be 1-D (n_buckets,) or 2-D **bucket-first**
    (n_buckets, n_langs); sums come back shaped (rows,) or
    (rows, n_langs).  Bucket-first means the multi-language gather is a
    single contiguous-row fancy-index — one (W, L) C-ordered copy —
    instead of L strided gathers.  N-grams containing the NUL separator
    contribute zero (masked in place on the fresh gather).
    """
    idx = hash_ngrams(buf, n)
    if idx.size == 0:
        rows = len(offsets)
        if logprob_table.ndim == 1:
            return np.zeros(rows), np.zeros(rows, dtype=np.int64)
        return np.zeros((rows, logprob_table.shape[1])), np.zeros(rows, dtype=np.int64)

    # valid window ⇔ no NUL byte inside
    valid = np.ones(idx.size, dtype=bool)
    for k in range(n):
        valid &= buf[k : len(buf) - n + 1 + k] != 0

    # reduceat boundaries in window space (window i starts at byte i);
    # boundaries must stay < idx.size, rows past the end are zeroed below.
    starts = np.minimum(offsets, idx.size - 1)
    counts = np.add.reduceat(valid.astype(np.int64), starts)
    invalid = ~valid
    if logprob_table.ndim == 1:
        contrib = logprob_table[idx].astype(np.float64, copy=True)
        contrib[invalid] = 0.0
        sums = np.add.reduceat(contrib, starts)
    else:
        gathered = logprob_table[idx]                 # (W, L), C-contiguous
        gathered[invalid] = 0.0                       # in place on the copy
        sums = np.add.reduceat(gathered, starts, axis=0)  # (rows, L)

    # np.add.reduceat quirk: for an empty segment (equal consecutive
    # boundaries) it returns the single element at the boundary instead of
    # 0 — zero those rows explicitly.
    seg_ends = np.append(starts[1:], idx.size)
    empty = (seg_ends <= starts) | (offsets >= idx.size)
    counts[empty] = 0
    if logprob_table.ndim == 1:
        sums[empty] = 0.0
    else:
        sums[empty, :] = 0.0
    return sums, counts
