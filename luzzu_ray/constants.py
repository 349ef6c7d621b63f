"""Shared constants for the transcript quality-filter engine.

This module is the single source of truth for thresholds, reason codes,
regex packs and model hyper-parameters.  BOTH the Ray Data engine
(`luzzu_ray.stages.*`) and the pure-Python oracle (`tests/oracle.py`)
import it, mirroring Luzzu's pattern of versioned, declarative metric
configuration (reference: /root/reference/README.md:13 — "declarative
quality metric specification language"; the thresholds here play the
role of Luzzu's LQML rule parameters, re-expressed as plain data).

Stage versions recorded in lineage come from ``STAGE_VERSIONS``.
"""

from __future__ import annotations

import numpy as np

SEED = 42

# ---------------------------------------------------------------------------
# Canonical transcript schema (BASELINE.json:input_hint)
# ---------------------------------------------------------------------------
ROLES = ("user", "assistant", "system", "tool")

# Codepoint-level twin of the BYTE_WORD byte class (ASCII alnum + every
# non-ASCII char; hyphen is NOT a word char) — shared by the oracle and
# scalar twins of the byte-level kernels.
TOKEN_PATTERN = "[A-Za-z0-9\u0080-\U0010ffff]+"

# ---------------------------------------------------------------------------
# Drop-reason codes, in verdict priority order (first failing rule wins).
# Turn-level reasons come first; conversation-level reasons are applied by
# the conversation stage after reassembly.
# ---------------------------------------------------------------------------
R_MALFORMED = "malformed"
R_EMPTY = "empty"
R_TOO_SHORT = "too_short"
R_TOO_LONG = "too_long"
R_BAD_LANG = "bad_lang"
R_LOW_LANG_CONF = "low_lang_conf"
R_HIGH_PPL = "high_ppl"
R_REPETITIVE = "repetitive"
R_TOP_WORD = "top_word"
R_SYMBOL_HEAVY = "symbol_heavy"
R_DIGIT_HEAVY = "digit_heavy"
R_DUPLICATE_TURN = "duplicate_turn"
R_CONV_TOO_SHORT = "conv_too_short"
R_CONV_LOW_QUALITY = "conv_low_quality"

TURN_REASON_ORDER = (
    R_MALFORMED,
    R_EMPTY,
    R_TOO_SHORT,
    R_TOO_LONG,
    R_BAD_LANG,
    R_LOW_LANG_CONF,
    R_HIGH_PPL,
    R_REPETITIVE,
    R_TOP_WORD,
    R_SYMBOL_HEAVY,
    R_DIGIT_HEAVY,
)

# ---------------------------------------------------------------------------
# Turn-level thresholds (C4/Gopher-style heuristics)
# ---------------------------------------------------------------------------
MIN_CHARS = 5          # n_chars < MIN_CHARS (and > 0)      -> too_short
MAX_CHARS = 20_000     # n_chars > MAX_CHARS                -> too_long
ALLOWED_LANGS = ("en", "fr", "de", "es")
MIN_LANG_CONF = 0.20   # lang_conf < MIN_LANG_CONF          -> low_lang_conf
PPL_MAX = 40.0         # ppl > PPL_MAX                      -> high_ppl
REP_2GRAM_MAX = 0.30   # duplicate word-2gram fraction      -> repetitive
TOP_WORD_MAX = 0.30    # most-common-token fraction         -> top_word
SYMBOL_MAX = 0.30      # symbol bytes / non-space bytes     -> symbol_heavy
DIGIT_MAX = 0.50       # digit bytes / non-space bytes      -> digit_heavy
# rows shorter than this many words are exempt from rep/top-word rules
MIN_WORDS_FOR_REP = 8

# ---------------------------------------------------------------------------
# Conversation-level rules (applied after groupby(conv_id) reassembly)
# ---------------------------------------------------------------------------
CONV_MIN_TURNS = 2        # conversations with fewer kept turns drop entirely
CONV_MIN_KEEP_RATIO = 0.25
SALT_CHUNK = 512          # turns per salted chunk for giant conversations
GIANT_MIN_TURNS = 2000    # convs with >= this many turns take the salted path

# ---------------------------------------------------------------------------
# Byte-class tables (shared by engine kernels and oracle).
# UTF-8 bytes >= 0x80 (non-ASCII) are classified as word/alpha bytes so that
# multi-byte characters count as letters and never split tokens.
# ---------------------------------------------------------------------------
def _build_byte_tables():
    alpha = np.zeros(256, dtype=bool)
    digit = np.zeros(256, dtype=bool)
    space = np.zeros(256, dtype=bool)
    for b in range(ord("A"), ord("Z") + 1):
        alpha[b] = True
    for b in range(ord("a"), ord("z") + 1):
        alpha[b] = True
    for b in range(0x80, 256):
        alpha[b] = True
    for b in range(ord("0"), ord("9") + 1):
        digit[b] = True
    for b in (0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20):
        space[b] = True
    word = alpha | digit          # token chars
    symbol = ~(word | space)      # everything else
    lower = np.arange(256, dtype=np.uint8)
    lower[ord("A"): ord("Z") + 1] += 32   # ASCII-only lowercase
    return alpha, digit, space, word, symbol, lower


BYTE_ALPHA, BYTE_DIGIT, BYTE_SPACE, BYTE_WORD, BYTE_SYMBOL, BYTE_LOWER = (
    _build_byte_tables()
)


def _build_casefold2_tables():
    """Pair-mapping tables for TWO-BYTE UTF-8 simple case folding
    (U+0080..U+07FF — Latin-1 Supplement, Latin Extended, Greek,
    Cyrillic, Armenian, Hebrew/Arabic no-ops): sequence
    (lead, cont) -> (CASEFOLD2_B1[k], CASEFOLD2_B2[k]), k = lead*256
    + cont; identity everywhere except codepoints whose Unicode
    simple lowercase is a SINGLE codepoint that also encodes in two
    bytes (so byte LENGTH is invariant — token positions and hash
    weights never shift).  Length-changing mappings (e.g. U+0130 'İ')
    and 3+-byte codepoints stay identity — the documented residual
    divergence vs DuckDB's full-Unicode ``lower()``.  Generated from
    Python's Unicode tables, which agree with DuckDB/utf8proc on the
    default (un-tailored) simple mapping in this range."""
    idx = np.arange(65536, dtype=np.int64)
    b1 = (idx >> 8).astype(np.uint8)
    b2 = (idx & 255).astype(np.uint8)
    for cp in range(0x80, 0x800):
        lo = chr(cp).lower()
        if len(lo) != 1:
            continue
        lcp = ord(lo)
        if lcp == cp or not (0x80 <= lcp < 0x800):
            continue
        sb = chr(cp).encode("utf-8")
        lb = lo.encode("utf-8")
        k = sb[0] * 256 + sb[1]
        b1[k] = lb[0]
        b2[k] = lb[1]
    return b1, b2


CASEFOLD2_B1, CASEFOLD2_B2 = _build_casefold2_tables()


def casefold_utf8(data: np.ndarray) -> np.ndarray:
    """UTF-8 case fold of a byte array: ASCII A-Z byte-wise (the
    BYTE_LOWER table) plus the two-byte pair fold above.  Returns a
    NEW array of the SAME length; sequence-aware, so it must run on
    the contiguous original bytes BEFORE any token gather.  The two
    passes touch disjoint bytes (A-Z vs lead bytes >= 0xC2)."""
    out = BYTE_LOWER[data]
    if len(data) >= 2:
        lead = np.flatnonzero(
            (data[:-1] >= 0xC2) & (data[:-1] <= 0xDF)
            & (data[1:] >= 0x80) & (data[1:] < 0xC0)
        )
        if len(lead):
            k = data[lead].astype(np.int32) * 256 + data[lead + 1]
            out[lead] = CASEFOLD2_B1[k]
            out[lead + 1] = CASEFOLD2_B2[k]
    return out

# Deterministic 64-bit positional weights for token hashing (shared hash fn).
_rng = np.random.Generator(np.random.PCG64(SEED))
TOKEN_POS_WEIGHTS = _rng.integers(1, 2**63, size=256, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
# Odd multipliers for n-gram combination
NGRAM_MIX = _rng.integers(1, 2**63, size=4, dtype=np.uint64) * np.uint64(2) + np.uint64(1)

# ---------------------------------------------------------------------------
# LangID model hyper-parameters (fastText-style hashed char n-grams)
# ---------------------------------------------------------------------------
LANGID_TABLE_BITS = 16              # 65536 hash buckets
LANGID_MIN_TRIGRAMS = 5             # fewer -> "und"
LANGID_CONF_SCALE = 4.0             # conf = clip((s1 - s2) * scale, 0, 1)
LANG_UND = "und"

# ---------------------------------------------------------------------------
# Perplexity model hyper-parameters (KenLM-style hashed char n-gram LM,
# stupid backoff)
# ---------------------------------------------------------------------------
PPL_TABLE_BITS = 18                 # 262144 hash buckets per order
PPL_BACKOFF = 0.4                   # stupid-backoff discount
PPL_MIN_CHARS = 3                   # fewer -> ppl undefined (0.0, exempt)

# ---------------------------------------------------------------------------
# PII / toxicity scrub pack.  Fixed application order; each entry is
# (class_name, pattern, replacement).  Patterns are RE2-compatible (no
# lookaround, no backrefs, can never match the empty string) so that
# pyarrow.compute (RE2) in the engine and `re` in the oracle agree.
# ---------------------------------------------------------------------------
TOX_WORDS = ("frakking", "dangblast", "grishnak", "skroggle", "vexmuck")

SCRUB_PACK = (
    ("url_cred", r"https?://[A-Za-z0-9._%-]+:[^@\s]+@[^\s]+", "<URL_CRED>"),
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("credit_card", r"\b(?:\d{4}[ -]){3}\d{4}\b|\b\d{15,16}\b", "<CC>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b|\(\d{3}\) ?\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("toxicity", r"(?i)\b(?:" + "|".join(TOX_WORDS) + r")\b", "<TOX>"),
)
SCRUB_CLASSES = tuple(name for name, _, _ in SCRUB_PACK)

# ---------------------------------------------------------------------------
# Stage versions (recorded in per-partition lineage, Luzzu daQ provenance
# analogue — /root/reference/README.md:8)
# ---------------------------------------------------------------------------
STAGE_VERSIONS = {
    "normalize": "1.0",
    "langid": "1.0",
    "perplexity": "1.0",
    "heuristics": "1.0",
    "scrub": "1.0",
    "verdict": "1.0",
    "conversation": "1.0",
}
