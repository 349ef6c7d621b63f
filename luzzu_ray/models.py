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
scrubbing) is implemented independently on each side.  Scoring is
bit-deterministic: per-row accumulation order is identical whether a row is
scored alone or inside a batch (``np.bincount`` accumulates in position
order), so oracle and engine agree exactly.
"""

from __future__ import annotations

import numpy as np

from luzzu_ray import constants as C
from luzzu_ray import seed_corpora
from luzzu_ray.functions.text import trigram_positions

LANGS = seed_corpora.LANGS  # sorted tuple, e.g. ("de", "en", "es", "fr")
_LANGID_MASK = (1 << C.LANGID_TABLE_BITS) - 1
_PPL_MASK = (1 << C.PPL_TABLE_BITS) - 1


def _lower_bytes(text: str) -> np.ndarray:
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return C.BYTE_LOWER[raw]


def _tri_hashes(lb: np.ndarray, pos: np.ndarray, mask: int) -> np.ndarray:
    """Hash of the char trigram starting at each position (lowercased bytes)."""
    b0 = lb[pos].astype(np.int64)
    b1 = lb[pos + 1].astype(np.int64)
    b2 = lb[pos + 2].astype(np.int64)
    return ((b0 * 131 + b1) * 131 + b2) & mask


def _bi_hashes(lb: np.ndarray, pos: np.ndarray, mask: int) -> np.ndarray:
    b0 = lb[pos].astype(np.int64)
    b1 = lb[pos + 1].astype(np.int64)
    return (b0 * 131 + b1) & mask


# ---------------------------------------------------------------------------
# Model building (pure function of the seed corpora; runs once per process)
# ---------------------------------------------------------------------------

def _build_models() -> dict:
    T = 1 << C.LANGID_TABLE_BITS
    counts = np.zeros((len(LANGS), T), dtype=np.float64)
    ppl_tables = {}
    for li, lang in enumerate(LANGS):
        text = " ".join(seed_corpora.SEED_TEXT[lang].split())
        lb = _lower_bytes(text)
        n = len(lb)
        pos = np.arange(max(n - 2, 0), dtype=np.int64)
        h3 = _tri_hashes(lb, pos, _LANGID_MASK)
        np.add.at(counts[li], h3, 1.0)

        # perplexity tables (separate, wider hash space)
        t3 = np.zeros(_PPL_MASK + 1, dtype=np.int64)
        t2 = np.zeros(_PPL_MASK + 1, dtype=np.int64)
        t1 = np.zeros(256, dtype=np.int64)
        h3p = _tri_hashes(lb, pos, _PPL_MASK)
        np.add.at(t3, h3p, 1)
        bpos = np.arange(max(n - 1, 0), dtype=np.int64)
        h2p = _bi_hashes(lb, bpos, _PPL_MASK)
        np.add.at(t2, h2p, 1)
        np.add.at(t1, lb.astype(np.int64), 1)
        ppl_tables[lang] = {"t3": t3, "t2": t2, "t1": t1, "total": n}

    totals = counts.sum(axis=1, keepdims=True)
    p = (counts + 0.5) / (totals + 0.5 * T)
    p_avg = p.mean(axis=0, keepdims=True)
    W = (np.log(p) - np.log(p_avg)).astype(np.float32)
    return {"langid_W": W, "ppl": ppl_tables}


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
    pos_abs, rid = trigram_positions(data, offsets)
    pos = pos_abs - lo
    tri_counts = np.bincount(rid, minlength=n) if len(rid) else np.zeros(n, np.int64)
    if len(pos) == 0:
        return np.full(n, -1, dtype=np.int64), np.zeros(n, dtype=np.float64)
    h = _tri_hashes(lb, pos, _LANGID_MASK)
    L = W.shape[0]
    means = np.zeros((L, n), dtype=np.float64)
    nz = tri_counts > 0
    for li in range(L):
        sums = np.bincount(rid, weights=W[li][h].astype(np.float64), minlength=n)
        means[li, nz] = sums[nz] / tri_counts[nz]
    lang_idx = means.argmax(axis=0)
    srt = np.sort(means, axis=0)
    s1 = srt[-1]
    s2 = srt[-2] if L > 1 else np.zeros(n)
    conf = np.clip((s1 - s2) * C.LANGID_CONF_SCALE, 0.0, 1.0)
    und = (tri_counts < C.LANGID_MIN_TRIGRAMS) | (s1 <= 0.0)
    lang_idx[und] = -1
    conf[und] = 0.0
    return lang_idx, conf


def ppl_scores(
    data: np.ndarray,
    offsets: np.ndarray,
    lang_idx: np.ndarray,
    ppl_tables: dict,
) -> np.ndarray:
    """Per-row char-trigram perplexity under the row's predicted language LM.

    Rows with lang_idx == -1 (or fewer than PPL_MIN_CHARS chars) get 0.0
    (undefined; the verdict never reaches the ppl rule for those rows).
    """
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    lo, hi = int(offsets[0]), int(offsets[-1])
    lb = C.BYTE_LOWER[data[lo:hi]]
    pos_abs, rid = trigram_positions(data, offsets)
    if len(pos_abs) == 0:
        return out
    pos = pos_abs - lo
    pos_lang = lang_idx[rid]
    logp = np.zeros(len(pos), dtype=np.float64)
    B = C.PPL_BACKOFF
    for li, lang in enumerate(LANGS):
        m = pos_lang == li
        if not m.any():
            continue
        p_m = pos[m]
        tb = ppl_tables[lang]
        h3 = _tri_hashes(lb, p_m, _PPL_MASK)
        h2ab = _bi_hashes(lb, p_m, _PPL_MASK)
        h2bc = _bi_hashes(lb, p_m + 1, _PPL_MASK)
        b1 = lb[p_m + 1].astype(np.int64)
        b2 = lb[p_m + 2].astype(np.int64)
        c3 = tb["t3"][h3]
        c2ab = tb["t2"][h2ab]
        c2bc = tb["t2"][h2bc]
        c1b = tb["t1"][b1]
        c1c = tb["t1"][b2]
        p_tri = c3 / np.maximum(np.maximum(c2ab, c3), 1)
        p_bi = B * c2bc / np.maximum(np.maximum(c1b, c2bc), 1)
        p_uni = B * B * (c1c + 1) / (tb["total"] + 256)
        p_all = np.where(c3 > 0, p_tri, np.where(c2bc > 0, p_bi, p_uni))
        logp[m] = np.log(p_all)
    sums = np.bincount(rid, weights=logp, minlength=n)
    counts = np.bincount(rid, minlength=n)
    valid = (counts > 0) & (lang_idx >= 0)
    out[valid] = np.exp(-sums[valid] / counts[valid])
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
    tables = get_models()["ppl"]
    data, offs = _single_view(text)
    li = LANGS.index(lang) if lang in LANGS else -1
    out = ppl_scores(data, offs, np.array([li], dtype=np.int64), tables)
    return float(out[0])
