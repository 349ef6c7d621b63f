"""Pure-Python single-process oracle for the transcript quality pipeline.

Row-at-a-time, dict-based, no Ray, no vectorization — the independent
"reference implementation" whose per-turn ``keep`` / ``drop_reason`` /
``text_scrubbed`` the engine must reproduce (BASELINE.json:north_rule:
F1 >= 0.99 on keep/drop, exact scrubbed-text equality).

Shared with the engine (by design, like loading the same model file):
  - ``luzzu_ray.constants`` (thresholds, regex pack, byte-class tables)
  - ``luzzu_ray.models`` scorers (langid / perplexity model weights)
Implemented independently here: tokenization, n-gram repetition stats,
byte-class ratios, scrubbing, verdict logic, conversation rules, ordering.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pyarrow as pa

from luzzu_ray import constants as C
from luzzu_ray import models

_TOKEN_RE = re.compile(C.TOKEN_PATTERN)
_ASCII_LOWER = str.maketrans(
    {chr(c): chr(c + 32) for c in range(ord("A"), ord("Z") + 1)}
)
_SCRUB_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in C.SCRUB_PACK]

# byte -> class translation table: a=alpha, d=digit, s=space, y=symbol
_CLASS_TRANS = bytes(
    (ord("a") if C.BYTE_ALPHA[b] else ord("d") if C.BYTE_DIGIT[b]
     else ord("s") if C.BYTE_SPACE[b] else ord("y"))
    for b in range(256)
)


def tokenize(text: str) -> list[str]:
    return [t.translate(_ASCII_LOWER) for t in _TOKEN_RE.findall(text)]


def text_signals(text: str, _model: tuple | None = None) -> dict:
    """All per-turn quality signals for one text (independent impl).

    ``_model`` optionally injects precomputed (lang, conf, ppl) from the
    batch scorer; when absent the per-row scorers are used (identical).
    """
    toks = tokenize(text)
    n_words = len(toks)
    bigrams = list(zip(toks, toks[1:]))
    if bigrams:
        rep2 = 1.0 - len(set(bigrams)) / len(bigrams)
    else:
        rep2 = 0.0
    if toks:
        top = Counter(toks).most_common(1)[0][1] / n_words
    else:
        top = 0.0
    classified = text.encode("utf-8").translate(_CLASS_TRANS)
    n_alpha = classified.count(b"a")
    n_digit = classified.count(b"d")
    n_sym = classified.count(b"y")
    nonspace = n_alpha + n_digit + n_sym
    if _model is not None:
        lang, conf, ppl = _model
    else:
        lang, conf = models.langid_row(text)
        ppl = models.ppl_row(text, lang)
    return {
        "n_chars": len(text),
        "n_words": n_words,
        "rep_ratio": rep2,
        "top_word_ratio": top,
        "symbol_ratio": n_sym / max(1, nonspace),
        "digit_ratio": n_digit / max(1, nonspace),
        "lang": lang,
        "lang_conf": conf,
        "ppl": ppl,
    }


def scrub(text: str) -> tuple[str, dict[str, int]]:
    """Apply the scrub pack in fixed order; returns (scrubbed, counts)."""
    counts = {}
    for name, rx, repl in _SCRUB_COMPILED:
        text, k = rx.subn(repl, text)
        counts[name] = k
    return text, counts


def turn_verdict(row: dict, sig: dict | None) -> str | None:
    """First failing turn-level rule, in C.TURN_REASON_ORDER; None == keep."""
    malformed = (
        row["conv_id"] is None
        or row["turn_idx"] is None
        or row["ts"] is None
        or row["role"] not in C.ROLES
        or (row["role"] == "tool" and row["tool"] is None)
        or row["text"] is None
    )
    if malformed:
        return C.R_MALFORMED
    assert sig is not None
    if sig["n_chars"] == 0:
        return C.R_EMPTY
    if sig["n_chars"] < C.MIN_CHARS:
        return C.R_TOO_SHORT
    if sig["n_chars"] > C.MAX_CHARS:
        return C.R_TOO_LONG
    if sig["lang"] not in C.ALLOWED_LANGS:
        return C.R_BAD_LANG
    if sig["lang_conf"] < C.MIN_LANG_CONF:
        return C.R_LOW_LANG_CONF
    if sig["ppl"] > C.PPL_MAX:
        return C.R_HIGH_PPL
    if sig["n_words"] >= C.MIN_WORDS_FOR_REP:
        if sig["rep_ratio"] > C.REP_2GRAM_MAX:
            return C.R_REPETITIVE
        if sig["top_word_ratio"] > C.TOP_WORD_MAX:
            return C.R_TOP_WORD
    if sig["symbol_ratio"] > C.SYMBOL_MAX:
        return C.R_SYMBOL_HEAVY
    if sig["digit_ratio"] > C.DIGIT_MAX:
        return C.R_DIGIT_HEAVY
    return None


def _batch_model_scores(rows: list[dict]):
    """Precompute langid/ppl for all rows in one batch.

    Bit-identical to per-row ``models.langid_row`` / ``ppl_row`` calls
    (verified by test_models); this is purely an oracle speed-up — the
    model weights and scorers are shared with the engine by design.
    """
    import numpy as np

    from luzzu_ray.functions.text import utf8_view

    texts = pa.array(
        [r["text"] if r["text"] is not None else "" for r in rows], pa.string()
    )
    data, offs = utf8_view(texts)
    m = models.get_models()
    idx, conf = models.langid_scores(data, offs, m["langid_W"])
    ppl = models.ppl_scores(data, offs, idx, m)
    langs = [models.LANGS[i] if i >= 0 else C.LANG_UND for i in idx]
    return langs, conf, ppl


def assess_rows(rows: list[dict]) -> list[dict]:
    """Assess a full corpus given as a list of row dicts (any order).

    Returns one output dict per input row (same physical rows), each with
    the input key columns plus keep/drop_reason/text_scrubbed and signals.
    """
    langs, confs, ppls = _batch_model_scores(rows)
    outs = []
    by_conv: dict[object, list[int]] = defaultdict(list)
    for i, row in enumerate(rows):
        text = row["text"]
        sig = text_signals(text, _model=(langs[i], float(confs[i]), float(ppls[i]))) if text is not None else None
        reason = turn_verdict(row, sig)
        if text is not None:
            scrubbed, sc = scrub(text)
        else:
            scrubbed, sc = None, {k: 0 for k in C.SCRUB_CLASSES}
        out = {
            "conv_id": row["conv_id"],
            "turn_idx": row["turn_idx"],
            "role": row["role"],
            "ts": row["ts"],
            "text": text,
            "text_scrubbed": scrubbed,
            "drop_reason": reason,
            **{f"scrub_{k}": v for k, v in sc.items()},
        }
        if sig is not None:
            out.update(sig)
        else:
            out.update(
                {
                    "n_chars": 0, "n_words": 0, "rep_ratio": 0.0,
                    "top_word_ratio": 0.0, "symbol_ratio": 0.0,
                    "digit_ratio": 0.0, "lang": C.LANG_UND,
                    "lang_conf": 0.0, "ppl": 0.0,
                }
            )
        outs.append(out)
        by_conv[row["conv_id"]].append(i)

    # conversation-level pass: stable order, duplicate turns, conv rules
    for conv_id, idxs in by_conv.items():
        import datetime as _dt

        _TS_MIN = _dt.datetime(1, 1, 1)
        order = sorted(
            idxs,
            key=lambda i: (
                outs[i]["turn_idx"] if outs[i]["turn_idx"] is not None else -1,
                outs[i]["ts"] if outs[i]["ts"] is not None else _TS_MIN,
                outs[i]["text"] or "",
            ),
        )
        seen_turns: set = set()
        for i in order:
            t = outs[i]["turn_idx"]
            if outs[i]["drop_reason"] is None:
                if t in seen_turns:
                    outs[i]["drop_reason"] = C.R_DUPLICATE_TURN
            if t is not None:
                seen_turns.add(t)
        valid = [i for i in idxs if outs[i]["drop_reason"] is None]
        total = len(idxs)
        conv_reason = None
        if len(valid) < C.CONV_MIN_TURNS:
            conv_reason = C.R_CONV_TOO_SHORT
        elif len(valid) / total < C.CONV_MIN_KEEP_RATIO:
            conv_reason = C.R_CONV_LOW_QUALITY
        if conv_reason:
            for i in valid:
                outs[i]["drop_reason"] = conv_reason

    for o in outs:
        o["keep"] = o["drop_reason"] is None
    return outs


def assess_table(table: pa.Table) -> list[dict]:
    return assess_rows(table.to_pylist())
