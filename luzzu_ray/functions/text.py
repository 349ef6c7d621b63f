"""Vectorized byte-level text kernels over Arrow string columns.

Every kernel operates on the raw UTF-8 buffer of a ``pyarrow``
StringArray — zero-copy out of the Ray object store — plus its offsets,
and produces per-row statistics with NumPy segmented operations
(``bincount`` / ``reduceat``).  No Python-per-row loops anywhere: this is
the engine's answer to Luzzu's per-quad ``compute()`` hot path
(/root/reference/README.md:7 — streaming metric computation), re-expressed
as whole-batch columnar kernels.

Byte-class semantics are defined by the shared tables in
``luzzu_ray.constants``; the oracle implements the same *definitions*
independently (per-row Python), so these kernels are genuinely under test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from luzzu_ray import constants as C

CHUNK_TARGET_BYTES = 256 * 1024  # keep kernel working sets L2-resident


def chunked(fn):
    """Run a batch transform over ~256KB table slices and concat.

    The vectorized kernels make ~20 passes over arrays sized to the
    chunk's text bytes; slicing keeps those arrays cache-resident, which
    turns the stage from DRAM-bandwidth-bound into compute-bound (the
    difference between ~8 and ~24 effective cores on a 32-core node).
    Zero-copy: ``pa.Table.slice`` shares buffers.  Safe because every
    per-row output is independent of batch composition (property-tested).
    """

    def wrapper(t: pa.Table, **kw):
        n = t.num_rows
        if n == 0:
            return fn(t, **kw)
        avg = max(1, t.nbytes // n)
        rows = int(min(4096, max(64, CHUNK_TARGET_BYTES // avg)))
        if n <= rows:
            return fn(t, **kw)
        return pa.concat_tables(
            fn(t.slice(s, rows), **kw) for s in range(0, n, rows)
        )

    wrapper.__name__ = getattr(fn, "__name__", "chunked")
    wrapper.__wrapped__ = fn
    return wrapper


# class ids for combined bincount
_CLASS_ID = np.zeros(256, dtype=np.int64)
_CLASS_ID[C.BYTE_ALPHA] = 0
_CLASS_ID[C.BYTE_DIGIT] = 1
_CLASS_ID[C.BYTE_SPACE] = 2
_CLASS_ID[C.BYTE_SYMBOL] = 3
N_CLASSES = 4


def utf8_view(arr: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (data_bytes, absolute_offsets) for a string column.

    Nulls are treated as empty strings.  ``offsets`` has length n+1 and
    indexes into ``data``; offsets need not start at zero (sliced arrays).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:  # pragma: no cover - defensive
        arr = pc.cast(arr, pa.string())
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64, copy=False)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return data, offsets


def row_lengths(offsets: np.ndarray) -> np.ndarray:
    return offsets[1:] - offsets[:-1]


def byte_class_fractions(data: np.ndarray, offsets: np.ndarray):
    """Per-row (alpha, digit, space, symbol) byte counts, shape (n, 4)."""
    n = len(offsets) - 1
    lens = row_lengths(offsets)
    lo, hi = offsets[0], offsets[-1]
    if hi == lo:
        return np.zeros((n, N_CLASSES), dtype=np.int64)
    rid = np.repeat(np.arange(n, dtype=np.int64), lens)
    cls = _CLASS_ID[data[lo:hi]]
    combined = rid * N_CLASSES + cls
    counts = np.bincount(combined, minlength=n * N_CLASSES)
    return counts.reshape(n, N_CLASSES)


def token_segments(data: np.ndarray, offsets: np.ndarray):
    """Find word tokens (maximal runs of word bytes, never crossing rows).

    Returns (tok_start, tok_len, tok_rid) — absolute byte positions.
    """
    n = len(offsets) - 1
    lo, hi = int(offsets[0]), int(offsets[-1])
    if hi == lo:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    w = C.BYTE_WORD[data[lo:hi]]
    prev_w = np.empty_like(w)
    prev_w[0] = False
    prev_w[1:] = w[:-1]
    next_w = np.empty_like(w)
    next_w[-1] = False
    next_w[:-1] = w[1:]
    # force token boundaries at row boundaries
    row_starts = offsets[:-1] - lo
    row_lasts = offsets[1:] - lo - 1
    valid_rows = offsets[1:] > offsets[:-1]
    prev_w[row_starts[valid_rows]] = False
    next_w[row_lasts[valid_rows]] = False
    starts = np.flatnonzero(w & ~prev_w)
    ends = np.flatnonzero(w & ~next_w)
    tok_len = ends - starts + 1
    tok_start = starts + lo
    tok_rid = np.searchsorted(offsets, tok_start, side="right") - 1
    return tok_start, tok_len, tok_rid


def token_hashes(data: np.ndarray, tok_start: np.ndarray, tok_len: np.ndarray):
    """Position-weighted 64-bit content hash per token (case-folded:
    ASCII A-Z byte-wise plus the two-byte UTF-8 simple fold —
    Latin-1/Extended/Greek/Cyrillic — via ``constants.casefold_utf8``;
    length-invariant by construction, so positions and weights never
    shift).

    h(tok) = sum_i fold(byte_i) * W[i mod 256]  (mod 2^64)
    Shared definition with the oracle via :func:`token_hash_py`.
    """
    if len(tok_start) == 0:
        return np.zeros(0, dtype=np.uint64)
    # fold the CONTIGUOUS batch bytes first (the pair fold is
    # sequence-aware), then gather token bytes
    data_f = C.casefold_utf8(data)
    total = int(tok_len.sum())
    starts_c = np.zeros(len(tok_start), dtype=np.int64)
    np.cumsum(tok_len[:-1], out=starts_c[1:])
    # absolute byte positions of every token byte
    pos_in_tok = np.arange(total, dtype=np.int64) - np.repeat(starts_c, tok_len)
    pos = np.repeat(tok_start, tok_len) + pos_in_tok
    bytes_l = data_f[pos].astype(np.uint64)
    contrib = bytes_l * C.TOKEN_POS_WEIGHTS[pos_in_tok & 255]
    h = np.add.reduceat(contrib, starts_c)
    return h


def token_hash_py(token: bytes) -> int:
    """Oracle-side scalar twin of :func:`token_hashes` (same definition)."""
    folded = C.casefold_utf8(np.frombuffer(token, np.uint8))
    h = 0
    W = C.TOKEN_POS_WEIGHTS
    for i, b in enumerate(folded):
        h = (h + int(b) * int(W[i & 255])) & 0xFFFFFFFFFFFFFFFF
    return h


def _runs(sorted_rid: np.ndarray, sorted_h: np.ndarray):
    """Run boundaries of equal (rid, hash) pairs in sorted order."""
    if len(sorted_rid) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    new = np.empty(len(sorted_rid), dtype=bool)
    new[0] = True
    new[1:] = (sorted_rid[1:] != sorted_rid[:-1]) | (sorted_h[1:] != sorted_h[:-1])
    run_starts = np.flatnonzero(new)
    run_ends = np.empty_like(run_starts)
    run_ends[:-1] = run_starts[1:]
    run_ends[-1] = len(sorted_rid)
    return run_starts, run_ends


def dup_ngram_fraction(
    tok_h: np.ndarray, tok_rid: np.ndarray, n_rows: int, k: int
) -> np.ndarray:
    """Per-row fraction of word k-gram occurrences that are duplicates:
    1 - unique/total (0.0 when the row has no k-grams)."""
    if len(tok_h) < k:
        return np.zeros(n_rows, dtype=np.float64)
    m = len(tok_h) - k + 1
    g = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        g += tok_h[j : j + m] * C.NGRAM_MIX[j]
    valid = tok_rid[:m] == tok_rid[k - 1 :]
    g = g[valid]
    rid = tok_rid[:m][valid]
    if len(g) == 0:
        return np.zeros(n_rows, dtype=np.float64)
    order = np.lexsort((g, rid))
    srid, sh = rid[order], g[order]
    run_starts, _ = _runs(srid, sh)
    uniq = np.bincount(srid[run_starts], minlength=n_rows)
    total = np.bincount(rid, minlength=n_rows)
    out = np.zeros(n_rows, dtype=np.float64)
    nz = total > 0
    out[nz] = 1.0 - uniq[nz] / total[nz]
    return out


def top_token_fraction(
    tok_h: np.ndarray, tok_rid: np.ndarray, n_rows: int
) -> np.ndarray:
    """Per-row fraction of tokens equal to the row's most frequent token."""
    out = np.zeros(n_rows, dtype=np.float64)
    if len(tok_h) == 0:
        return out
    order = np.lexsort((tok_h, tok_rid))
    srid, sh = tok_rid[order], tok_h[order]
    run_starts, run_ends = _runs(srid, sh)
    run_lens = run_ends - run_starts
    run_rids = srid[run_starts]
    # per-row max run length: rows are contiguous in run space
    row_counts = np.bincount(run_rids, minlength=n_rows)
    nz_rows = np.flatnonzero(row_counts)
    if len(nz_rows) == 0:
        return out
    row_starts_in_runs = np.zeros(len(nz_rows), dtype=np.int64)
    np.cumsum(row_counts[nz_rows][:-1], out=row_starts_in_runs[1:])
    max_per_row = np.maximum.reduceat(run_lens, row_starts_in_runs)
    totals = np.bincount(tok_rid, minlength=n_rows)
    out[nz_rows] = max_per_row / totals[nz_rows]
    return out


def trigram_positions(data: np.ndarray, offsets: np.ndarray):
    """All byte positions p where (p, p+1, p+2) lie within one row.

    Returns (pos, rid) with absolute positions into ``data``.
    """
    n = len(offsets) - 1
    lens = row_lengths(offsets)
    tri_counts = np.maximum(lens - 2, 0)
    total = int(tri_counts.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    rid = np.repeat(np.arange(n, dtype=np.int64), tri_counts)
    starts_c = np.zeros(n, dtype=np.int64)
    np.cumsum(tri_counts[:-1], out=starts_c[1:])
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(starts_c, tri_counts)
    pos = np.repeat(offsets[:-1], tri_counts) + pos_in_row
    return pos, rid
