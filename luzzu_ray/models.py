"""Deterministic langid + perplexity models (hashed char n-grams).

- LangID: fastText-style hashed character-trigram profiles, one weight
  vector per language over 2^16 hash buckets, trained at import time from
  the embedded seed corpora (``luzzu_ray.seed_corpora``).  Luzzu analogue:
  the "understandability/versatility" metrics that detect label languages
  (/root/reference/README.md:7).
- Perplexity: KenLM-style character trigram LM with stupid backoff over
  hashed count tables (2^18 buckets per order), one table set per language.

Both the Ray engine (actor-pool stages) and the pure-Python oracle call the
SAME scorers here — the model is shared "weights" exactly as two processes
would load one fastText ``.bin`` — while pipeline logic (rules, ordering,
scrubbing) is implemented independently on each side.

Kernel style: SLIDING-WINDOW over the whole batch byte buffer with
in-place arithmetic and per-row ``np.add.reduceat`` segment sums — no
per-position gather/repeat index arrays.  This keeps temporary
allocation at a few multiples of the text bytes (allocation/page-fault
cost dominates vectorized compute on the target machines).  Scoring is
bit-deterministic and batch-size-invariant: reduceat accumulates each
row's positions left-to-right exactly as a single-row call would.
"""

from __future__ import annotations

import numpy as np

from luzzu_ray import constants as C
from luzzu_ray import seed_corpora

LANGS = seed_corpora.LANGS  # sorted tuple, e.g. ("de", "en", "es", "fr")
_LANGID_MASK = (1 << C.LANGID_TABLE_BITS) - 1
_PPL_MASK = (1 << C.PPL_TABLE_BITS) - 1


def _lower_bytes(text: str) -> np.ndarray:
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return C.BYTE_LOWER[raw]


def _tri_hash_full(lb: np.ndarray, mask: int) -> np.ndarray:
    """Hash of the trigram starting at every byte position (len-2 values).

    One int32 temporary; all updates in place.
    """
    if len(lb) < 3:
        return np.zeros(0, dtype=np.int32)
    h = lb[:-2].astype(np.int32)
    np.multiply(h, 131, out=h)
    np.add(h, lb[1:-1], out=h, casting="unsafe")
    np.multiply(h, 131, out=h)
    np.add(h, lb[2:], out=h, casting="unsafe")
    np.bitwise_and(h, mask, out=h)
    return h


def _bi_hash_full(lb: np.ndarray, mask: int) -> np.ndarray:
    """Hash of the bigram starting at every byte position (len-1 values)."""
    if len(lb) < 2:
        return np.zeros(0, dtype=np.int32)
    h = lb[:-1].astype(np.int32)
    np.multiply(h, 131, out=h)
    np.add(h, lb[1:], out=h, casting="unsafe")
    np.bitwise_and(h, mask, out=h)
    return h


def _row_geometry(offsets: np.ndarray, width: int):
    """(starts, counts) of valid width-gram positions per row, in the
    coordinate system of the full-buffer sliding-window arrays."""
    lo = offsets[0]
    starts = (offsets[:-1] - lo).astype(np.int64)
    lens = offsets[1:] - offsets[:-1]
    counts = np.maximum(lens - (width - 1), 0).astype(np.int64)
    return starts, counts


def _invalid_mask_f32(total: int, starts: np.ndarray, counts: np.ndarray,
                      width: int) -> np.ndarray:
    """float32 {0,1} mask over the full sliding-window array: 1 where the
    width-gram at that position lies inside one row."""
    valid = np.ones(total, dtype=np.float32)
    # positions in [row_start + count, next_row_start) are invalid
    for k in range(width - 1):
        idx = starts + counts + k
        sel = idx < np.minimum(
            np.concatenate((starts[1:], [total])), total
        )
        # only rows whose tail actually reaches into the buffer
        bad = idx[sel]
        bad = bad[bad < total]
        valid[bad] = 0.0
    return valid


def _segment_sums(values: np.ndarray, starts: np.ndarray,
                  counts: np.ndarray) -> np.ndarray:
    """Per-row sums of a full-buffer array, rows given by (start, count).

    Sequential within each row (batch-size invariant).  Rows with zero
    count get 0.0.
    """
    n = len(starts)
    out = np.zeros(n, dtype=np.float64)
    nz = np.flatnonzero(counts > 0)
    if len(nz) == 0 or len(values) == 0:
        return out
    # one dummy element so the final [start, end) segment is a real
    # reduceat slot — EVERY row sums via the same sequential reduceat,
    # making results bit-identical whether a row is scored alone or
    # inside any batch
    vals = np.empty(len(values) + 1, dtype=np.float64)
    vals[:-1] = values
    vals[-1] = 0.0
    bounds = np.empty(2 * len(nz), dtype=np.int64)
    bounds[0::2] = starts[nz]
    bounds[1::2] = starts[nz] + counts[nz]
    red = np.add.reduceat(vals, bounds)
    out[nz] = red[0::2]
    return out


# ---------------------------------------------------------------------------
# Model building (pure function of the seed corpora; runs once per process)
# ---------------------------------------------------------------------------

def _build_models() -> dict:
    T = 1 << C.LANGID_TABLE_BITS
    counts = np.zeros((len(LANGS), T), dtype=np.float64)
    ppl_t3 = np.zeros((len(LANGS), _PPL_MASK + 1), dtype=np.float32)
    ppl_t2 = np.zeros((len(LANGS), _PPL_MASK + 1), dtype=np.float32)
    ppl_t1 = np.zeros((len(LANGS), 256), dtype=np.float32)
    totals = np.zeros(len(LANGS), dtype=np.float64)
    for li, lang in enumerate(LANGS):
        text = " ".join(seed_corpora.SEED_TEXT[lang].split())
        lb = _lower_bytes(text)
        n = len(lb)
        h3 = _tri_hash_full(lb, _LANGID_MASK)
        np.add.at(counts[li], h3, 1.0)
        h3p = _tri_hash_full(lb, _PPL_MASK)
        np.add.at(ppl_t3[li], h3p, 1.0)
        h2p = _bi_hash_full(lb, _PPL_MASK)
        np.add.at(ppl_t2[li], h2p, 1.0)
        np.add.at(ppl_t1[li], lb.astype(np.int64), 1.0)
        totals[li] = n

    tot = counts.sum(axis=1, keepdims=True)
    p = (counts + 0.5) / (tot + 0.5 * T)
    p_avg = p.mean(axis=0, keepdims=True)
    W = (np.log(p) - np.log(p_avg)).astype(np.float32)
    # pre-fold the unigram backoff: u1[lang, byte] = B^2 * (c1+1) / (total+256)
    B = C.PPL_BACKOFF
    ppl_u1 = (B * B) * (ppl_t1 + 1.0) / (totals[:, None] + 256.0)
    return {
        "langid_W": W,
        "ppl_t3": ppl_t3,
        "ppl_t2": ppl_t2,
        "ppl_t1": ppl_t1,
        "ppl_u1": ppl_u1.astype(np.float32),
        "ppl_totals": totals,
    }


_MODELS: dict | None = None


def get_models() -> dict:
    """Lazily-built process-wide model singleton (cheap: seed text is ~5 kB)."""
    global _MODELS
    if _MODELS is None:
        _MODELS = _build_models()
    return _MODELS


# ---------------------------------------------------------------------------
# Batch scorers (shared engine/oracle code path)
# ---------------------------------------------------------------------------

def langid_scores(
    data: np.ndarray, offsets: np.ndarray, W: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Score every row: returns (lang_idx int64, conf float64).

    lang_idx == -1 means "und" (too few trigrams or no positive profile).
    """
    n = len(offsets) - 1
    lo, hi = int(offsets[0]), int(offsets[-1])
    lb = C.BYTE_LOWER[data[lo:hi]]
    starts, counts = _row_geometry(offsets, 3)
    if counts.sum() == 0:
        return np.full(n, -1, dtype=np.int64), np.zeros(n, dtype=np.float64)
    h = _tri_hash_full(lb, _LANGID_MASK)
    valid = _invalid_mask_f32(len(h), starts, counts, 3)
    L = W.shape[0]
    means = np.zeros((L, n), dtype=np.float64)
    nzc = np.maximum(counts, 1)
    w = np.empty(len(h), dtype=np.float32)
    for li in range(L):
        np.take(W[li], h, out=w)
        np.multiply(w, valid, out=w)
        means[li] = _segment_sums(w, starts, counts) / nzc
    lang_idx = means.argmax(axis=0)
    srt = np.sort(means, axis=0)
    s1 = srt[-1]
    s2 = srt[-2] if L > 1 else np.zeros(n)
    conf = np.clip((s1 - s2) * C.LANGID_CONF_SCALE, 0.0, 1.0)
    und = (counts < C.LANGID_MIN_TRIGRAMS) | (s1 <= 0.0)
    lang_idx[und] = -1
    conf[und] = 0.0
    return lang_idx, conf


def ppl_scores(
    data: np.ndarray,
    offsets: np.ndarray,
    lang_idx: np.ndarray,
    models: dict,
) -> np.ndarray:
    """Per-row char-trigram perplexity under the row's predicted language LM
    (stupid backoff).  Rows with lang_idx == -1 get 0.0 (undefined).

    Vectorized per language over the rows predicted as that language:
    sliding-window hashes on the full buffer, per-position probabilities
    with in-place float32 arithmetic, per-row reduceat of log p.
    """
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    lo = int(offsets[0])
    lb = C.BYTE_LOWER[data[lo: int(offsets[-1])]]
    starts, counts = _row_geometry(offsets, 3)
    scored_rows = np.flatnonzero((lang_idx >= 0) & (counts > 0))
    if counts.sum() == 0 or len(scored_rows) == 0:
        return out
    M = _PPL_MASK + 1
    # ONE pass over the buffer for every language: per-position table
    # indices are offset by the row's language (lang * table_size) into
    # the stacked per-language tables.  Rows with lang -1 gather from
    # lang 0 but are never read back by the segment sums.
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    lang_clip = np.maximum(lang_idx, 0).astype(np.int32)
    h3 = _tri_hash_full(lb, _PPL_MASK)
    h2 = _bi_hash_full(lb, _PPL_MASK)   # h2[i] = hash(lb[i], lb[i+1])
    npos = len(h3)
    scaled = np.repeat(lang_clip * np.int32(M), lens)[:npos]
    t3f = models["ppl_t3"].reshape(-1)
    t2f = models["ppl_t2"].reshape(-1)
    t1f = models["ppl_t1"].reshape(-1)
    u1f = models["ppl_u1"].reshape(-1)

    np.add(h3, scaled, out=h3)
    c3 = np.take(t3f, h3)
    idx = np.add(h2[:-1], scaled)                 # context (b[i], b[i+1])
    c2ab = np.take(t2f, idx)
    np.subtract(idx, h2[:-1], out=idx)
    np.add(idx, h2[1:], out=idx)                  # continuation (b[i+1], b[i+2])
    c2bc = np.take(t2f, idx)
    # unigram indices: lang*256 + byte
    np.right_shift(scaled, 10, out=scaled)        # lang*2^18 -> lang*2^8
    np.add(scaled, lb[1:-1], out=idx, casting="unsafe")
    c1b = np.take(t1f, idx)
    np.subtract(idx, lb[1:-1], out=idx, casting="unsafe")
    np.add(idx, lb[2:], out=idx, casting="unsafe")
    p_uni = np.take(u1f, idx)                     # pre-folded B^2(c1+1)/(tot+256)
    B = np.float32(C.PPL_BACKOFF)
    # p_tri = c3 / max(c2ab, c3, 1)  (in-place into c2ab)
    np.maximum(c2ab, c3, out=c2ab)
    np.maximum(c2ab, np.float32(1.0), out=c2ab)
    p_tri = np.divide(c3, c2ab, out=c2ab)
    # p_bi = B * c2bc / max(c1b, c2bc, 1)  (in-place into c1b)
    np.maximum(c1b, c2bc, out=c1b)
    np.maximum(c1b, np.float32(1.0), out=c1b)
    p_bi = np.divide(c2bc, c1b, out=c1b)
    np.multiply(p_bi, B, out=p_bi)
    # select: c3>0 -> p_tri; elif c2bc>0 -> p_bi; else p_uni  (into p_tri)
    np.copyto(p_tri, p_bi, where=(c3 <= 0))
    np.copyto(p_tri, p_uni, where=(c3 <= 0) & (c2bc <= 0))
    p = p_tri
    np.log(p, out=p)
    valid = _invalid_mask_f32(npos, starts, counts, 3)
    np.multiply(p, valid, out=p)
    sums = _segment_sums(p, starts[scored_rows], counts[scored_rows])
    cnt = counts[scored_rows]
    out[scored_rows] = np.exp(-sums / cnt)
    return out


# ---------------------------------------------------------------------------
# Scalar convenience twins (oracle / tests)
# ---------------------------------------------------------------------------

def _single_view(text: str) -> tuple[np.ndarray, np.ndarray]:
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return raw, np.array([0, len(raw)], dtype=np.int64)


def langid_row(text: str) -> tuple[str, float]:
    W = get_models()["langid_W"]
    data, offs = _single_view(text)
    idx, conf = langid_scores(data, offs, W)
    lang = LANGS[idx[0]] if idx[0] >= 0 else C.LANG_UND
    return lang, float(conf[0])


def ppl_row(text: str, lang: str) -> float:
    m = get_models()
    data, offs = _single_view(text)
    li = LANGS.index(lang) if lang in LANGS else -1
    out = ppl_scores(data, offs, np.array([li], dtype=np.int64), m)
    return float(out[0])
