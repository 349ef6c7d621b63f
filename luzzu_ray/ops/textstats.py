"""Text-analysis operators over a document table (doc_id, text, ...).

Reuses the engine's byte-level batch kernels (luzzu_ray.functions.text)
— language-ID heuristics, quality scoring, token counting, document
fingerprinting — each a stateless vectorized ``map_batches`` stage.
Luzzu analogue: the intrinsic-category metric processors applied to a
whole record stream `[paper]` (/root/reference/README.md:7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from luzzu_ray import constants as C
from luzzu_ray.functions import text as TX

from luzzu_ray.ops.common import pool as _pool

# fixed 64-bit FNV-style params for the rolling document fingerprint
FP_BASE = np.uint64(1099511628211)
FP_SEED = np.uint64(14695981039346656037)


def doc_stats_batch(t: pa.Table) -> pa.Table:
    """n_chars / n_words / symbol_ratio / digit_ratio per document."""
    text = t["text"]
    n = t.num_rows
    data, offs = TX.utf8_view(text)
    cls = TX.byte_class_fractions(data, offs)
    nonspace = np.maximum(cls[:, 0] + cls[:, 1] + cls[:, 3], 1)
    ts_, tl_, tr_ = TX.token_segments(data, offs)
    n_words = np.bincount(tr_, minlength=n) if len(tr_) else np.zeros(n, np.int64)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.fill_null(pc.utf8_length(text), 0), pa.int64()),
            "n_words": pa.array(n_words.astype(np.int64)),
            "n_symbol_bytes": pa.array(cls[:, 3].astype(np.int64)),
            "n_digit_bytes": pa.array(cls[:, 1].astype(np.int64)),
            "symbol_ratio_q6": pa.array(
                np.floor(cls[:, 3] / nonspace * 1e6).astype(np.int64)
            ),
            "digit_ratio_q6": pa.array(
                np.floor(cls[:, 1] / nonspace * 1e6).astype(np.int64)
            ),
        }
    )


def quality_score_batch(t: pa.Table) -> pa.Table:
    """C4-style keep verdict on documents with SQL-expressible rules only
    (length bounds, symbol/digit density) so DuckDB can oracle it."""
    s = doc_stats_batch(t)
    n_chars = s["n_chars"]
    keep = pc.and_(
        pc.and_(
            pc.greater_equal(n_chars, C.MIN_CHARS),
            pc.less_equal(n_chars, C.MAX_CHARS),
        ),
        pc.and_(
            pc.less_equal(s["symbol_ratio_q6"], int(C.SYMBOL_MAX * 1e6)),
            pc.less_equal(s["digit_ratio_q6"], int(C.DIGIT_MAX * 1e6)),
        ),
    )
    return s.append_column("keep", keep)


def token_hashes_for_rows(t: pa.Table):
    """(token_hash uint64, row_id) for a batch's text column."""
    data, offs = TX.utf8_view(t["text"])
    ts_, tl_, tr_ = TX.token_segments(data, offs)
    return TX.token_hashes(data, ts_, tl_), tr_


def token_diversity_batch(t: pa.Table) -> pa.Table:
    """Exact Simpson repeat index per document: with per-token counts
    c over the doc's word tokens, ``rep_pairs = sum c*(c-1)`` and
    ``simpson_q9 = floor(1e9 * rep_pairs / (n*(n-1)))`` — the
    probability two tokens drawn without replacement coincide
    (1 - Simpson is Gini-Simpson diversity; Simpson 1949).  Entirely
    integer (no logarithm, unlike Shannon entropy), so the SQL twin
    matches bit-for-bit; the 1e9-scaled product stays in int64 up to
    rep_pairs ~ 9.2e9 (n ~ 96k tokens) and falls back to Python-int
    arithmetic above the a-priori bound instead of wrapping.

    Exchange-free map: one lexsort of (row, token_hash) per batch
    finds per-doc token runs; docs with zero tokens emit no row
    (matching the SQL GROUP BY).  Same 64-bit hash-vs-string caveat
    as the shingle family.
    """
    n_rows = t.num_rows
    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "n_distinct": pa.array([], pa.int64()),
        "rep_pairs": pa.array([], pa.int64()),
        "simpson_q9": pa.array([], pa.int64()),
    })
    if n_rows == 0:
        return empty
    th, tr = token_hashes_for_rows(t)
    if not len(th):
        return empty
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((th, tr))
    rs, hs = tr[order], th[order]
    first = np.concatenate(
        ([True], (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])))
    starts = np.flatnonzero(first)
    c = np.diff(np.concatenate((starts, [len(hs)]))).astype(np.int64)
    run_row = rs[starts]
    n = np.bincount(tr, minlength=n_rows).astype(np.int64)
    nd = np.bincount(run_row, minlength=n_rows).astype(np.int64)
    rp = np.zeros(n_rows, dtype=np.int64)
    np.add.at(rp, run_row, c * (c - 1))
    keep = n > 0
    n_k, nd_k, rp_k = n[keep], nd[keep], rp[keep]
    den = n_k * (n_k - 1)
    scale = 10**9
    simpson = np.zeros(len(n_k), dtype=np.int64)
    ok = (den > 0) & (rp_k <= (2**63 - 1) // scale)
    simpson[ok] = (scale * rp_k[ok]) // den[ok]
    for i in np.flatnonzero((den > 0) & ~ok):
        simpson[i] = (scale * int(rp_k[i])) // int(den[i])
    return pa.table({
        "doc_id": pa.array(ids[keep].astype(np.int64)),
        "n_tokens": pa.array(n_k),
        "n_distinct": pa.array(nd_k),
        "rep_pairs": pa.array(rp_k),
        "simpson_q9": pa.array(simpson),
    })


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Order-sensitive 64-bit rolling hash over a doc's token hashes.

    fp = fold(fp * FP_BASE + token_hash) starting from FP_SEED — a
    deterministic content fingerprint (exact-dup key that ignores
    whitespace/symbol differences).  Vectorized per batch via per-row
    Horner evaluation using cumulative powers.
    """
    th, tr = token_hashes_for_rows(t)
    n = t.num_rows
    fp = np.full(n, FP_SEED, dtype=np.uint64)
    if len(th):
        counts = np.bincount(tr, minlength=n)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        pos = np.arange(len(th), dtype=np.int64) - starts[tr]
        # Horner unrolled: fp = seed*B^m + sum_i th_i * B^(m-1-i) (mod 2^64)
        mx = int(counts.max(initial=0))
        with np.errstate(over="ignore"):  # mod-2^64 arithmetic is intended
            pows = np.empty(mx + 1, dtype=np.uint64)
            pows[0] = np.uint64(1)
            for e in range(1, mx + 1):
                pows[e] = pows[e - 1] * FP_BASE
            contrib = th * pows[(counts[tr] - 1 - pos)]
            sums = np.zeros(n, dtype=np.uint64)
            np.add.at(sums, tr, contrib)
            fp = np.uint64(FP_SEED) * pows[counts] + sums
    return pa.table(
        {"doc_id": t["doc_id"], "fingerprint": pa.array(fp.view(np.int64))}
    )


def fingerprint_py(text: str) -> int:
    """Scalar oracle twin of :func:`fingerprint_batch`."""
    import re

    from luzzu_ray.functions.text import token_hash_py

    fp = int(FP_SEED)
    for tok in re.findall(C.TOKEN_PATTERN, text):
        h = token_hash_py(tok.encode("utf-8"))
        fp = (fp * int(FP_BASE) + h) & 0xFFFFFFFFFFFFFFFF
    return fp - (1 << 64) if fp >= (1 << 63) else fp


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish pre-tokenizer) and stopword ratio
# ---------------------------------------------------------------------------

# Small fixed English stopword list (quality-scoring heuristic); matched
# against ASCII-lowered word tokens via the shared token hash.
STOPWORDS = (
    "the a an and or but if of to in on for with as at by from is are "
    "was were be been it this that not no you i he she they we do does "
    "did have has had will would can could"
).split()

# the shared byte->class table (text._CLASS_ID: alpha=0 digit=1 space=2
# symbol=3), narrowed so the sentinel -1 fits; single source of truth
_LEX_CLASS = TX._CLASS_ID.astype(np.int8)
_LEX_SPACE = np.int8(2)


def _stopword_hashes() -> np.ndarray:
    from luzzu_ray.functions.text import token_hash_py

    return np.array(
        sorted(token_hash_py(w.encode()) for w in STOPWORDS), dtype=np.uint64
    )


_STOPWORD_HASHES = _stopword_hashes()


def lexical_stats_batch(t: pa.Table) -> pa.Table:
    """Token counts per document, three tokenizations side by side:

    - ``n_ws_tokens``: whitespace tokens (maximal runs of non-space bytes);
    - ``n_bpe_tokens``: BPE-ish pre-tokenizer count — maximal runs of a
      uniform byte class among alpha / digit / symbol (the GPT-2-style
      category split, sans contraction rules);
    - ``n_word_tokens`` / ``n_stop_tokens`` / ``stop_ratio_q6``: word
      tokens (alnum runs) and the stopword fraction among them, matched
      via the shared position-weighted token hash.

    Fully vectorized over the batch's byte buffer; rows never mix
    (boundaries forced at row starts, same pattern as token_segments).
    """
    n = t.num_rows
    data, offs = TX.utf8_view(t["text"])
    ts_, tl_, tr_ = TX.token_segments(data, offs)
    n_word = (
        np.bincount(tr_, minlength=n) if len(tr_) else np.zeros(n, np.int64)
    )
    if len(tr_):
        th = TX.token_hashes(data, ts_, tl_)
        stop_rid = tr_[np.isin(th, _STOPWORD_HASHES)]
        n_stop = np.bincount(stop_rid, minlength=n)
    else:
        n_stop = np.zeros(n, np.int64)
    n_ws = np.zeros(n, dtype=np.int64)
    n_bpe = np.zeros(n, dtype=np.int64)
    lo, hi = int(offs[0]), int(offs[-1])
    if hi > lo:
        b = data[lo:hi]
        c = _LEX_CLASS[b]
        prev_c = np.empty_like(c)
        prev_c[0] = -1
        prev_c[1:] = c[:-1]
        row_starts = (offs[:-1] - lo)[offs[1:] > offs[:-1]]
        prev_c[row_starts] = -1
        nonspace = c != _LEX_SPACE
        ws_start = nonspace & ((prev_c == _LEX_SPACE) | (prev_c == -1))
        bpe_start = nonspace & (c != prev_c)
        rid = np.repeat(
            np.arange(n, dtype=np.int64), (offs[1:] - offs[:-1])
        )
        n_ws = np.bincount(rid[ws_start], minlength=n)
        n_bpe = np.bincount(rid[bpe_start], minlength=n)
    ratio = np.floor(n_stop / np.maximum(n_word, 1) * 1e6).astype(np.int64)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_ws_tokens": pa.array(n_ws.astype(np.int64)),
            "n_bpe_tokens": pa.array(n_bpe.astype(np.int64)),
            "n_word_tokens": pa.array(n_word.astype(np.int64)),
            "n_stop_tokens": pa.array(n_stop.astype(np.int64)),
            "stop_ratio_q6": pa.array(ratio),
        }
    )


def lexical_stats_py(text: str | None) -> dict:
    """Scalar oracle twin of :func:`lexical_stats_batch` (byte-level)."""
    import re

    raw = (text or "").encode("utf-8")
    ws = re.findall(rb"[^ \t\n\x0b\f\r]+", raw)
    bpe = re.findall(
        rb"[A-Za-z\x80-\xff]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r\x80-\xff]+", raw
    )
    words = re.findall(rb"[A-Za-z0-9\x80-\xff]+", raw)
    lowered = [bytes(C.BYTE_LOWER[np.frombuffer(w, np.uint8)]) for w in words]
    stops = {w.encode() for w in STOPWORDS}
    n_stop = sum(1 for w in lowered if w in stops)
    return {
        "n_ws_tokens": len(ws),
        "n_bpe_tokens": len(bpe),
        "n_word_tokens": len(words),
        "n_stop_tokens": n_stop,
        "stop_ratio_q6": int(
            np.floor(n_stop / max(len(words), 1) * 1e6)
        ),
    }


def langid_documents(ds: ray.data.Dataset, model_ref=None) -> ray.data.Dataset:
    """Engine langid over a documents table -> (doc_id, lang, lang_conf)."""
    from luzzu_ray.stages.actors import LangIdScorer

    scored = ds.map_batches(
        LangIdScorer,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=_pool(),
        fn_constructor_kwargs={"model_ref": model_ref},
    )
    return scored.select_columns(["doc_id", "lang", "lang_conf"])


# ---------------------------------------------------------------------------
# compression-ratio quality signal (zlib)
# ---------------------------------------------------------------------------

ZLIB_LEVEL = 6


def compression_ratio_batch(t: pa.Table) -> pa.Table:
    """Per-document zlib compression ratio — the classic web-pipeline
    redundancy signal (highly repetitive / boilerplate text compresses
    far below natural prose; Gopher-style filters threshold on it).

    Emitted as exact integers: (doc_id, raw_len, comp_len, ratio_q4 =
    comp_len * 10^4 // max(raw_len, 1)) — no float division to diverge.
    The per-row ``zlib.compress`` loop is inherent (DEFLATE is a
    sequential per-payload codec, like the multimodal decode stages);
    the stage stays batched so scheduling, I/O and the Arrow column
    assembly amortize across the batch.  NULL text -> null outputs.
    """
    import zlib

    ids = t["doc_id"]
    texts = t["text"].combine_chunks()
    null_mask = pc.is_null(texts).to_numpy(zero_copy_only=False)
    n = t.num_rows
    raw = np.zeros(n, dtype=np.int64)
    comp = np.zeros(n, dtype=np.int64)
    for i in range(n):
        if null_mask[i]:
            continue
        b = texts[i].as_py().encode("utf-8")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, ZLIB_LEVEL))
    ratio = comp * 10_000 // np.maximum(raw, 1)
    return pa.table(
        {"doc_id": ids,
         "raw_len": pa.array(raw),
         "comp_len": pa.array(comp),
         "ratio_q4": pa.array(ratio),
         "is_null_text": pa.array(null_mask)}
    )


def compression_ratio_py(text: str | None) -> tuple[int, int, int]:
    """Row-at-a-time fixture twin of :func:`compression_ratio_batch`."""
    import zlib

    if text is None:
        return (0, 0, 0)
    b = text.encode("utf-8")
    raw = len(b)
    comp = len(zlib.compress(b, ZLIB_LEVEL))
    return (raw, comp, comp * 10_000 // max(raw, 1))


def unicode_stats_batch(t: pa.Table) -> pa.Table:
    """UTF-8 codepoint-class stats per document, fully vectorized.

    Codepoints are counted from lead bytes (any byte outside the
    0b10xxxxxx continuation range), split into the four UTF-8 encoding
    classes (ASCII, 2-, 3-, 4-byte sequences == codepoint ranges
    U+0000-7F / U+0080-07FF / U+0800-FFFF / U+10000-10FFFF).  One
    cumulative-sum pass per class over the batch's bytes; per-row sums
    are two gathers on the row offsets — no Python loop.  NULL text
    counts as empty (all zeros, like the SQL twin's COALESCE).

    ``nonascii_frac_q4`` = floor(1e4 * (n_cp - n_ascii) / n_cp), 0 for
    empty.  The DuckDB oracle reproduces every column from ``strlen``
    / ``length`` / RE2 class deletions — exact integers, no float
    slack.  (Removes the engine's documented ASCII-domain caveat for
    the stats family: this kernel is correct on arbitrary UTF-8.)
    """
    data, offs = TX.utf8_view(t["text"])
    n = t.num_rows
    lo, hi = int(offs[0]), int(offs[-1])
    b = data[lo:hi]
    starts = offs[:-1] - lo
    ends = offs[1:] - lo

    def rowsum(mask: np.ndarray) -> np.ndarray:
        if hi == lo:
            return np.zeros(n, dtype=np.int64)
        c = np.zeros(len(b) + 1, dtype=np.int64)
        np.cumsum(mask, out=c[1:])
        return c[ends] - c[starts]

    n_ascii = rowsum(b < 0x80)
    n_2b = rowsum((b >= 0xC0) & (b < 0xE0))
    n_3b = rowsum((b >= 0xE0) & (b < 0xF0))
    n_4b = rowsum(b >= 0xF0)
    n_cp = n_ascii + n_2b + n_3b + n_4b
    frac = (n_cp - n_ascii) * 10_000 // np.maximum(n_cp, 1)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_bytes": pa.array(ends - starts),
        "n_cp": pa.array(n_cp),
        "n_ascii": pa.array(n_ascii),
        "n_2byte": pa.array(n_2b),
        "n_3byte": pa.array(n_3b),
        "n_4byte": pa.array(n_4b),
        "nonascii_frac_q4": pa.array(frac),
    })


def unicode_stats_py(text: str | None) -> dict:
    """Row-at-a-time twin of :func:`unicode_stats_batch`."""
    if text is None:
        text = ""
    cps = [ord(c) for c in text]
    n_ascii = sum(1 for c in cps if c < 0x80)
    n_2b = sum(1 for c in cps if 0x80 <= c < 0x800)
    n_3b = sum(1 for c in cps if 0x800 <= c < 0x10000)
    n_4b = sum(1 for c in cps if c >= 0x10000)
    n_cp = len(cps)
    return {
        "n_bytes": len(text.encode("utf-8")),
        "n_cp": n_cp,
        "n_ascii": n_ascii,
        "n_2byte": n_2b,
        "n_3byte": n_3b,
        "n_4byte": n_4b,
        "nonascii_frac_q4": (n_cp - n_ascii) * 10_000 // max(n_cp, 1),
    }


def sentence_stats_batch(t: pa.Table, terminator: str = ".") -> pa.Table:
    """Sentence segmentation stats per document, all-Arrow: sentence
    count = RE2 count of maximal non-terminator runs, mean length as an
    exact integer (q2).  NULL text counts as zero sentences."""
    tx = pc.fill_null(t["text"], "")
    n_chars = pc.cast(pc.utf8_length(tx), pa.int64())
    n_term = pc.cast(
        pc.count_substring(tx, pattern=terminator), pa.int64())
    n_sent = pc.cast(
        pc.count_substring_regex(tx, pattern=f"[^{terminator}]+"),
        pa.int64())
    chars = pc.subtract(n_chars, n_term).to_numpy(zero_copy_only=False)
    sents = n_sent.to_numpy(zero_copy_only=False)
    mean_q2 = chars * 100 // np.maximum(sents, 1)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_sentences": n_sent,
        "n_sentence_chars": pa.array(chars),
        "mean_sentence_len_q2": pa.array(mean_q2),
    })


def repetition_stats_batch(
    t: pa.Table, words_per_line: int = 8
) -> pa.Table:
    """Gopher-style repetition battery per document (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition filters), emitted as
    EXACT integers so every fraction reconstructs without float
    division and a DuckDB twin matches bit-for-bit:

    - ``n_words``            single-space split count (>= 1 always —
      ``split('', ' ') == ['']``, same as SQL ``string_split``);
    - ``n_lines`` / ``n_dup_lines`` / ``dup_line_chars``  W-word-window
      "lines" (the same corpus-agnostic derivation as
      :mod:`luzzu_ray.ops.lines`); a line occurrence is a duplicate if
      its text appeared earlier in the SAME doc, so
      ``n_dup_lines = n_lines - n_distinct_lines`` and
      ``dup_line_chars`` sums ``(cnt - 1) * char_len(line)`` — the
      "fraction of characters in duplicate lines" numerator;
    - ``n_bigrams`` / ``top_bigram_count``  occurrences of the modal
      word bigram (the "fraction of tokens in the most common 2-gram"
      concentration statistic) — tie-free because only the max COUNT is
      reported;
    - ``n_5grams`` / ``n_distinct_5grams``  the duplicate-5-gram
      fraction is ``1 - distinct/total``.

    Embarrassingly parallel, no exchange; per batch: one dictionary
    encode of the flat word array, one lexsort per n-gram width on raw
    code tuples (never a composite id — overflow-proof past 2^21
    distinct tokens, same discipline as ``dup_trigram_positions``),
    run-length counts scattered per doc with exact integer ``np.add.at``
    / ``np.maximum.at``.  Line equality compares MATERIALIZED line
    strings via one extra dictionary encode (lines are m/W-bounded, not
    m), so multibyte text and odd spacing behave exactly like the SQL
    twin's ``string_agg`` groups.
    """
    n = t.num_rows
    id_col = t["doc_id"]
    empty = pa.array([], pa.int64())
    if n == 0:
        return pa.table({
            "doc_id": empty, "n_words": empty, "n_lines": empty,
            "n_dup_lines": empty, "dup_line_chars": empty,
            "n_bigrams": empty, "top_bigram_count": empty,
            "n_5grams": empty, "n_distinct_5grams": empty,
        })
    filled = pc.fill_null(pc.cast(t["text"], pa.string()), "")
    words = pc.split_pattern(filled, " ").combine_chunks()
    flat = words.flatten()
    offs = words.offsets.to_numpy().astype(np.int64)
    per_row = offs[1:] - offs[:-1]
    m = int(offs[-1])
    rid = np.repeat(np.arange(n, dtype=np.int64), per_row)
    wi = np.arange(m, dtype=np.int64) - offs[:-1][rid]

    # ---- W-word lines: per-(doc, line-text) run lengths ----
    starts = np.flatnonzero(wi % words_per_line == 0)
    l_offsets = np.append(starts, m).astype(np.int32)
    lines = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(l_offsets), flat), " ")
    line_doc = rid[starts]
    lcodes = pc.dictionary_encode(lines).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    llen = pc.utf8_length(lines).to_numpy(
        zero_copy_only=False).astype(np.int64)
    order = np.lexsort((lcodes, line_doc))
    ld, lc_s = line_doc[order], lcodes[order]
    new_run = np.ones(len(ld), dtype=bool)
    new_run[1:] = (ld[1:] != ld[:-1]) | (lc_s[1:] != lc_s[:-1])
    run_starts = np.flatnonzero(new_run)
    run_len = np.diff(np.append(run_starts, len(ld)))
    run_doc = ld[run_starts]
    run_linelen = llen[order][run_starts]
    n_lines = np.bincount(line_doc, minlength=n).astype(np.int64)
    n_distinct_lines = np.bincount(run_doc, minlength=n).astype(np.int64)
    dup_line_chars = np.zeros(n, dtype=np.int64)
    np.add.at(dup_line_chars, run_doc, (run_len - 1) * run_linelen)

    # ---- word n-grams on dictionary codes ----
    codes = pc.dictionary_encode(flat).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    top_bigram = np.zeros(n, dtype=np.int64)
    if m >= 2:
        valid = np.flatnonzero(rid[:-1] == rid[1:])
        if len(valid):
            kd = rid[valid]
            c0, c1 = codes[valid], codes[valid + 1]
            o2 = np.lexsort((c1, c0, kd))
            kd, c0, c1 = kd[o2], c0[o2], c1[o2]
            nr = np.ones(len(kd), dtype=bool)
            nr[1:] = ((kd[1:] != kd[:-1]) | (c0[1:] != c0[:-1])
                      | (c1[1:] != c1[:-1]))
            rs = np.flatnonzero(nr)
            rl = np.diff(np.append(rs, len(kd)))
            np.maximum.at(top_bigram, kd[rs], rl)
    n_distinct_5 = np.zeros(n, dtype=np.int64)
    if m >= 5:
        valid5 = np.flatnonzero(rid[:-4] == rid[4:])
        if len(valid5):
            kd5 = rid[valid5]
            cs = [codes[valid5 + j] for j in range(5)]
            o5 = np.lexsort((cs[4], cs[3], cs[2], cs[1], cs[0], kd5))
            kd5 = kd5[o5]
            cs = [c[o5] for c in cs]
            nr5 = np.ones(len(kd5), dtype=bool)
            nr5[1:] = kd5[1:] != kd5[:-1]
            for c in cs:
                nr5[1:] |= c[1:] != c[:-1]
            n_distinct_5 = np.bincount(
                kd5[np.flatnonzero(nr5)], minlength=n).astype(np.int64)
    return pa.table({
        "doc_id": id_col,
        "n_words": pa.array(per_row.astype(np.int64)),
        "n_lines": pa.array(n_lines),
        "n_dup_lines": pa.array(n_lines - n_distinct_lines),
        "dup_line_chars": pa.array(dup_line_chars),
        "n_bigrams": pa.array(np.maximum(per_row - 1, 0).astype(np.int64)),
        "top_bigram_count": pa.array(top_bigram),
        "n_5grams": pa.array(np.maximum(per_row - 4, 0).astype(np.int64)),
        "n_distinct_5grams": pa.array(n_distinct_5),
    })


def repetition_stats(
    ds: ray.data.Dataset, words_per_line: int = 8
) -> ray.data.Dataset:
    """Per-document repetition battery — see
    :func:`repetition_stats_batch`.  Stateless vectorized map, no
    exchange; at 100 TB this is a pure streaming pass."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        lambda t: repetition_stats_batch(t, words_per_line),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def repetition_stats_py(
    text: str | None, words_per_line: int = 8
) -> dict:
    """Row-at-a-time twin of :func:`repetition_stats_batch`."""
    from collections import Counter

    words = (text or "").split(" ")
    nw = len(words)
    lines = [" ".join(words[i:i + words_per_line])
             for i in range(0, nw, words_per_line)]
    lcnt = Counter(lines)
    bigrams = Counter(zip(words, words[1:]))
    g5 = set(zip(words, words[1:], words[2:], words[3:], words[4:]))
    return {
        "n_words": nw,
        "n_lines": len(lines),
        "n_dup_lines": len(lines) - len(lcnt),
        "dup_line_chars": sum(
            (c - 1) * len(l) for l, c in lcnt.items()),
        "n_bigrams": max(nw - 1, 0),
        "top_bigram_count": max(bigrams.values(), default=0),
        "n_5grams": max(nw - 4, 0),
        "n_distinct_5grams": len(g5) if nw >= 5 else 0,
    }


def nfc_normalize_batch(t: pa.Table) -> pa.Table:
    """Unicode NFC canonical normalization (doc_id, text) ->
    (doc_id, text_nfc, changed, n_cp) — the canonical-form pass every
    multilingual pipeline runs before hashing/dedup so "café" composed
    and decomposed stop being distinct keys.

    pyarrow 16.1's ``utf8_normalize`` does not COMPOSE (NFC == NFD
    output, probed), so composition uses stdlib ``unicodedata`` — a
    per-row C call, inherent like the zlib/codec stages.  The hot-path
    mitigation is the ASCII FAST PATH: pure-ASCII rows are NFC by
    definition (byte len == codepoint len), so only rows containing a
    non-ASCII byte enter the loop — on web corpora that is a small
    fraction of rows.  NULL text -> null outputs.
    """
    import unicodedata

    texts = t["text"].combine_chunks()
    null_mask = pc.is_null(texts).to_numpy(zero_copy_only=False)
    filled = pc.fill_null(texts, "")
    n_bytes = pc.binary_length(filled).to_numpy(zero_copy_only=False)
    n_cp = pc.utf8_length(filled).to_numpy(zero_copy_only=False)
    needs = np.flatnonzero((n_bytes != n_cp) & ~null_mask)
    out = filled.to_pylist()
    changed = np.zeros(t.num_rows, dtype=bool)
    for i in needs:
        norm = unicodedata.normalize("NFC", out[i])
        if norm != out[i]:
            out[i] = norm
            changed[i] = True
    arr = pa.array(out, pa.string())
    if null_mask.any():
        arr = pc.if_else(pa.array(null_mask), pa.scalar(None, pa.string()), arr)
    return pa.table({
        "doc_id": t["doc_id"],
        "text_nfc": arr,
        "changed": pc.if_else(
            pa.array(null_mask), pa.scalar(None, pa.bool_()),
            pa.array(changed)),
        "n_cp": pc.utf8_length(arr),
    })


def nfc_normalize_py(text: str | None) -> tuple[str | None, bool | None, int | None]:
    """Row-at-a-time twin of :func:`nfc_normalize_batch`."""
    import unicodedata

    if text is None:
        return None, None, None
    norm = unicodedata.normalize("NFC", text)
    return norm, norm != text, len(norm)


def word_hashes(words) -> np.ndarray:
    """Token hashes of standalone lowercase words, using the SAME
    kernel as the corpus tokenizer — for broadcast keyword / stopword
    lookup tables that must compare equal to in-text token hashes."""
    arr = pa.array(list(words), pa.string())
    data, offs = TX.utf8_view(arr)
    ts_, tl_, _ = TX.token_segments(data, offs)
    return TX.token_hashes(data, ts_, tl_)


def topic_bucket_batch(
    t: pa.Table, topics: dict[str, tuple[str, ...]],
    other: str = "other",
) -> pa.Table:
    """Keyword-list topic bucketing — the deterministic domain
    classifier used to build training mixtures (docs route to the
    topic whose keyword list they hit most; ties break by topic
    DECLARATION order; zero hits route to ``other``).  Output:
    (doc_id, topic, n_hits).

    Exchange-free vectorized map: one tokenization pass, then per
    TOPIC (a handful) one ``np.isin`` against the topic's token-hash
    set — never a per-row loop.  Topic lists are driver-known and
    small (ship the dict in the task closure; ``ray.put`` it once if
    lists grow to real lexicon size).  Same 64-bit token-hash identity
    contract as the vocabulary family (the SQL twin matches STRINGS,
    so a collision surfaces as a hash mismatch)."""
    names = list(topics)
    n = t.num_rows
    th, tr = token_hashes_for_rows(t)
    counts = np.zeros((len(names), n), dtype=np.int64)
    for ti, name in enumerate(names):
        kw = word_hashes(topics[name])
        if len(th):
            m = np.isin(th, kw)
            counts[ti] = np.bincount(tr[m], minlength=n)
    best = counts.argmax(axis=0)          # first max wins (declaration order)
    n_hits = counts[best, np.arange(n)]
    topic = np.where(n_hits > 0, np.array(names, dtype=object)[best], other)
    return pa.table({
        "doc_id": t["doc_id"],
        "topic": pa.array(list(topic), pa.string()),
        "n_hits": pa.array(n_hits),
    })


# Pair-hash mix constants: odd, < 2^62 so the SQL twin's HUGEINT
# products h * A stay inside INT128 before the mod-2^64 fold.
WM_A = np.uint64(2862933555777941757)
WM_B = np.uint64(3202034522624059733)
WM_GAMMA_NUM = 1
WM_GAMMA_DEN = 4
WM_Z = 2


def watermark_stats_batch(
    t: pa.Table,
    gamma_num: int = WM_GAMMA_NUM,
    gamma_den: int = WM_GAMMA_DEN,
    z: int = WM_Z,
) -> pa.Table:
    """Green-list watermark detection statistics (Kirchenbauer et al.
    2023, "A Watermark for Large Language Models", arXiv:2301.10226):
    token i is GREEN iff a seeded hash of the (previous, current)
    token pair falls in the gamma = gamma_num/gamma_den fraction of
    hash space; a watermarked generation over-selects green tokens, so
    per doc we report ``n_scored`` adjacent pairs, ``n_green``, and
    ``wm_flag`` — the one-sided z >= ``z`` test computed EXACTLY in
    integers via the cross-multiplied form
    ``(den*g - num*n) > 0 AND (den*g - num*n)^2 >= z^2 * n * num *
    (den - num)`` (no sqrt, no float; int64-safe to n ~ 1e9 pairs at
    den = 4).  The filter every synthetic-text screen runs over a
    crawled corpus.

    Exchange-free vectorized map; pair hash =
    ``(h_prev * WM_A + h_cur * WM_B) mod 2^64`` over the shared token
    hashes, identical in the SQL twin's HUGEINT rebuild.  Docs with
    < 2 tokens score 0 pairs and never flag."""
    n = t.num_rows
    th, tr = token_hashes_for_rows(t)
    scored = np.zeros(n, dtype=np.int64)
    g = np.zeros(n, dtype=np.int64)
    if len(th) >= 2:
        same = tr[1:] == tr[:-1]
        with np.errstate(over="ignore"):
            h2 = th[:-1] * WM_A + th[1:] * WM_B
        green = same & ((h2 % np.uint64(gamma_den)).astype(np.int64)
                        < gamma_num)
        scored = np.bincount(tr[1:][same], minlength=n).astype(np.int64)
        g = np.bincount(tr[1:][green], minlength=n).astype(np.int64)
    lhs = gamma_den * g - gamma_num * scored
    flag = (lhs > 0) & (
        lhs * lhs >= z * z * scored * gamma_num * (gamma_den - gamma_num))
    return pa.table({
        "doc_id": t["doc_id"],
        "n_scored": pa.array(scored),
        "n_green": pa.array(g),
        "wm_flag": pa.array(flag),
    })


def readability_stats_batch(t: pa.Table) -> pa.Table:
    """Flesch-style readability per document as EXACT integers
    (Flesch 1948 reading-ease; Kincaid et al. 1975): word count W
    (maximal non-space runs), sentence count S (maximal non-'.' runs,
    the ``sentence_stats_batch`` convention), and syllable stand-in V =
    count of maximal ``[aeiouy]+`` runs over the lowercased text — the
    classic vowel-group heuristic.  The reading-ease score
    ``206.835 - 1.015*W/S - 84.6*V/W`` is emitted as an exact integer
    RATIONAL (``flesch_num``, ``flesch_den``) with
    ``num = 206835*S*W - 1015*W^2 - 84600*V*S`` and ``den = 1000*S*W``
    so no floor/truncation semantics can diverge between engine and
    SQL twin (a-priori int64 bound: ``W*S < 4.4e13`` — ~10^6-word
    single-sentence docs; far beyond any real document).

    Empty/NULL text: W = S = V = 0 and the rational is 0/0 — emitted
    as integers, never divided.  Exchange-free stateless map.
    """
    tx = pc.fill_null(t["text"], "")
    W = pc.cast(
        pc.count_substring_regex(tx, pattern="[^ ]+"), pa.int64()
    ).to_numpy(zero_copy_only=False)
    S = pc.cast(
        pc.count_substring_regex(tx, pattern="[^.]+"), pa.int64()
    ).to_numpy(zero_copy_only=False)
    V = pc.cast(
        pc.count_substring_regex(
            pc.utf8_lower(tx), pattern="[aeiouy]+"),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    num = 206835 * S * W - 1015 * W * W - 84600 * V * S
    den = 1000 * S * W
    return pa.table({
        "doc_id": t["doc_id"],
        "n_words": pa.array(W),
        "n_sentences": pa.array(S),
        "n_vowel_groups": pa.array(V),
        "flesch_num": pa.array(num),
        "flesch_den": pa.array(den),
    })


# Unicode punctuation -> ASCII normalization table (the C4/CCNet text
# cleanup step): applied as a FIXED ORDERED chain of literal
# replacements so a SQL twin (chained replace()) matches byte-for-byte.
PUNCT_MAP = [
    ("“", '"'), ("”", '"'),   # curly double quotes
    ("‘", "'"), ("’", "'"),   # curly single quotes
    ("—", "-"), ("–", "-"),   # em / en dash
    ("…", "..."),                   # ellipsis
    (" ", " "),                     # no-break space
]


def punct_normalize_batch(t: pa.Table) -> pa.Table:
    """Vectorized punctuation normalization: the ordered literal
    replacement chain above (plain substring replace, NOT regex — no
    metacharacter semantics to match across engines).  Output
    (doc_id, text_norm, changed); NULL text stays NULL with NULL
    changed."""
    tx = t["text"].combine_chunks()
    null_mask = tx.is_null()
    cur = pc.fill_null(tx, "")
    for a, b in PUNCT_MAP:
        cur = pc.replace_substring(cur, pattern=a, replacement=b)
    changed = pc.not_equal(cur, pc.fill_null(tx, ""))
    return pa.table({
        "doc_id": t["doc_id"],
        "text_norm": pc.if_else(null_mask, pa.scalar(None, pa.string()),
                                cur),
        "changed": pc.if_else(null_mask, pa.scalar(None, pa.bool_()),
                              changed),
    })


def script_mix_batch(t: pa.Table) -> pa.Table:
    """Per-document SCRIPT MIX profile — the multilingual-corpus
    diagnostic (dominant-script purity, mixed-script spam detection):
    exact counts of codepoints in the Latin-Extended (U+0080-U+024F),
    Greek (U+0370-U+03FF), Cyrillic (U+0400-U+04FF) blocks plus all
    remaining non-ASCII codepoints.  Vectorized: decode two-byte
    codepoints from (lead, continuation) pairs once per batch; 3+-byte
    codepoints land in ``n_other_nonascii`` by lead-byte count.
    Output: (doc_id, n_latin_ext, n_greek, n_cyrillic,
    n_other_nonascii).
    """
    from luzzu_ray.functions import text as TX

    data, offs = TX.utf8_view(t["text"])
    n = t.num_rows
    out = {k: np.zeros(n, dtype=np.int64) for k in
           ("n_latin_ext", "n_greek", "n_cyrillic", "n_other_nonascii")}
    lo, hi = int(offs[0]), int(offs[-1])  # sliced arrays: window only
    if hi > lo:
        span = np.arange(lo, hi, dtype=np.int64)
        is_lead2 = np.zeros(len(span), dtype=bool)
        if hi - lo >= 2:
            is_lead2[:-1] = (
                (data[lo:hi - 1] >= 0xC2) & (data[lo:hi - 1] <= 0xDF)
                & (data[lo + 1:hi] >= 0x80) & (data[lo + 1:hi] < 0xC0))
        lead34 = data[lo:hi] >= 0xE0  # 3- and 4-byte sequence leads
        pos2 = span[np.flatnonzero(is_lead2)]

        def rid_for(pos):
            return np.searchsorted(offs, pos, side="right") - 1

        if len(pos2):
            cp = ((data[pos2].astype(np.int64) & 0x1F) << 6) | (
                data[pos2 + 1].astype(np.int64) & 0x3F)
            rid = rid_for(pos2)
            sel_lat = (cp >= 0x80) & (cp <= 0x24F)
            sel_gr = (cp >= 0x370) & (cp <= 0x3FF)
            sel_cy = (cp >= 0x400) & (cp <= 0x4FF)
            sel_other = ~(sel_lat | sel_gr | sel_cy)
            np.add.at(out["n_latin_ext"], rid[sel_lat], 1)
            np.add.at(out["n_greek"], rid[sel_gr], 1)
            np.add.at(out["n_cyrillic"], rid[sel_cy], 1)
            np.add.at(out["n_other_nonascii"], rid[sel_other], 1)
        pos34 = span[np.flatnonzero(lead34)]
        if len(pos34):
            np.add.at(out["n_other_nonascii"], rid_for(pos34), 1)
    return pa.table({"doc_id": t["doc_id"], **{
        k: pa.array(v) for k, v in out.items()}})
