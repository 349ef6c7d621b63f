"""Stateless per-batch turn-level stages (Arrow in / Arrow out, zero-copy).

Luzzu analogues (all `[paper]`-reconstructed; /root/reference/README.md:7):
  - normalize  ≙ syntactic-validity metrics (malformed records flagged)
  - heuristics ≙ completeness / conciseness / representational metrics
    (C4/Gopher-style: length bounds, repetition, symbol density)
  - scrub      ≙ (no Luzzu equivalent — the north rule *rewrites* instead
    of only reporting; BASELINE.json:north_star "compiled-regex PII/
    toxicity scrubbing")
  - verdict    ≙ per-record problem annotation (QPRO problem reports,
    README.md:9) collapsed to keep/drop + first-failing reason

Each stage appends columns and never drops rows: the labeled table is the
problem report.  Vectorization: pyarrow.compute kernels + the NumPy
segmented kernels in ``luzzu_ray.functions.text`` — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from luzzu_ray import constants as C
from luzzu_ray.functions import text as TX
from luzzu_ray.stages import register_stage

_TS_TYPE = pa.timestamp("us")

_CANONICAL = (
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", _TS_TYPE),
)


@register_stage("normalize", version=C.STAGE_VERSIONS["normalize"])
def normalize_batch(batch: pa.Table) -> pa.Table:
    """Cast to the canonical schema and flag malformed rows (M2)."""
    cols = {}
    for name, typ in _CANONICAL:
        if name in batch.column_names:
            col = batch[name]
            if col.type != typ:
                col = pc.cast(col, typ)
        else:
            col = pa.nulls(batch.num_rows, typ)
        cols[name] = col
    t = pa.table(cols)
    role = t["role"]
    malformed = pc.or_kleene(
        pc.or_kleene(pc.is_null(t["conv_id"]), pc.is_null(t["turn_idx"])),
        pc.or_kleene(
            pc.or_kleene(pc.is_null(t["ts"]), pc.is_null(t["text"])),
            pc.or_kleene(
                pc.invert(pc.is_in(role, value_set=pa.array(C.ROLES))),
                pc.and_kleene(pc.equal(role, "tool"), pc.is_null(t["tool"])),
            ),
        ),
    )
    return t.append_column("malformed", pc.fill_null(malformed, True))


@register_stage("heuristics", version=C.STAGE_VERSIONS["heuristics"])
@TX.chunked
def signals_batch(batch: pa.Table) -> pa.Table:
    """Length / repetition / symbol-density signals (M3-M5), vectorized."""
    text = batch["text"]
    n = batch.num_rows
    data, offs = TX.utf8_view(text)
    n_chars = pc.fill_null(pc.utf8_length(text), 0)
    cls = TX.byte_class_fractions(data, offs)  # (n,4): alpha,digit,space,symbol
    nonspace = np.maximum(cls[:, 0] + cls[:, 1] + cls[:, 3], 1)
    symbol_ratio = cls[:, 3] / nonspace
    digit_ratio = cls[:, 1] / nonspace

    ts_, tl_, tr_ = TX.token_segments(data, offs)
    th = TX.token_hashes(data, ts_, tl_)
    n_words = np.bincount(tr_, minlength=n) if len(tr_) else np.zeros(n, np.int64)
    rep_ratio = TX.dup_ngram_fraction(th, tr_, n, 2)
    top_word_ratio = TX.top_token_fraction(th, tr_, n)

    return (
        batch.append_column("n_chars", pc.cast(n_chars, pa.int32()))
        .append_column("n_words", pa.array(n_words.astype(np.int32)))
        .append_column("rep_ratio", pa.array(rep_ratio))
        .append_column("top_word_ratio", pa.array(top_word_ratio))
        .append_column("symbol_ratio", pa.array(symbol_ratio))
        .append_column("digit_ratio", pa.array(digit_ratio))
    )


@register_stage("scrub", version=C.STAGE_VERSIONS["scrub"])
@TX.chunked
def scrub_batch(batch: pa.Table) -> pa.Table:
    """PII/toxicity scrub (M8): fixed-order RE2 pack, vectorized per pattern.

    Patterns are shared with the oracle via ``constants.SCRUB_PACK`` and are
    written to behave identically under RE2 (pyarrow) and Python ``re``.
    Deterministic and idempotent (property-tested).
    """
    text = batch["text"]
    cur = pc.fill_null(text, "")
    out = batch
    for name, pat, repl in C.SCRUB_PACK:
        cnt = pc.count_substring_regex(cur, pattern=pat)
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
        out = out.append_column(f"scrub_{name}", pc.cast(cnt, pa.int32()))
    scrubbed = pc.if_else(pc.is_valid(text), cur, pa.nulls(batch.num_rows, pa.string()))
    return out.append_column("text_scrubbed", scrubbed)


_ALLOWED_IDX: np.ndarray | None = None


def _allowed_lang_idx() -> np.ndarray:
    global _ALLOWED_IDX
    if _ALLOWED_IDX is None:
        from luzzu_ray.models import LANGS

        _ALLOWED_IDX = np.array(
            [LANGS.index(l) for l in C.ALLOWED_LANGS if l in LANGS], dtype=np.int64
        )
    return _ALLOWED_IDX


@register_stage("verdict", version=C.STAGE_VERSIONS["verdict"])
def verdict_batch(batch: pa.Table) -> pa.Table:
    """Turn-level verdict (M7): first failing rule in TURN_REASON_ORDER.

    Conversation-level reasons (duplicate_turn, conv_*) are applied later by
    the conversation stage; this stage emits ``drop_reason`` (null == pass
    so far).
    """
    n = batch.num_rows
    malformed = batch["malformed"].combine_chunks().to_numpy(zero_copy_only=False)
    n_chars = batch["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
    n_words = batch["n_words"].combine_chunks().to_numpy(zero_copy_only=False)
    rep = batch["rep_ratio"].combine_chunks().to_numpy(zero_copy_only=False)
    top = batch["top_word_ratio"].combine_chunks().to_numpy(zero_copy_only=False)
    sym = batch["symbol_ratio"].combine_chunks().to_numpy(zero_copy_only=False)
    dig = batch["digit_ratio"].combine_chunks().to_numpy(zero_copy_only=False)
    lang_idx = batch["lang_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    conf = batch["lang_conf"].combine_chunks().to_numpy(zero_copy_only=False)
    ppl = batch["ppl"].combine_chunks().to_numpy(zero_copy_only=False)

    rep_eligible = n_words >= C.MIN_WORDS_FOR_REP
    conds = [
        malformed,
        n_chars == 0,
        n_chars < C.MIN_CHARS,
        n_chars > C.MAX_CHARS,
        ~np.isin(lang_idx, _allowed_lang_idx()),
        conf < C.MIN_LANG_CONF,
        ppl > C.PPL_MAX,
        rep_eligible & (rep > C.REP_2GRAM_MAX),
        rep_eligible & (top > C.TOP_WORD_MAX),
        sym > C.SYMBOL_MAX,
        dig > C.DIGIT_MAX,
    ]
    reasons = list(C.TURN_REASON_ORDER)
    sel = np.select(conds, reasons, default="")
    mask = sel == ""
    reason_arr = pa.array(sel.tolist(), type=pa.string(), mask=mask)
    return batch.append_column("drop_reason", reason_arr)
