"""Declarative quality-rule specs (Luzzu LQML analogue, SURVEY.md §2.10 X2).

Luzzu ships "a novel declarative quality metric specification language"
(/root/reference/README.md:13) compiled to imperative metrics; here a
rule is plain data — ``(reason, signal, op, value[, guard])`` — compiled
once into a vectorized evaluator over the signal columns.  The default
pack reproduces ``constants.TURN_REASON_ORDER`` exactly (property: the
compiled default pack and the hand-written verdict stage agree row for
row), and user pipelines can pass their own pack through the runner /
pipeline config to re-threshold without touching engine code.

Ops: ``lt le gt ge eq ne in not_in``.  A rule fires when
``op(signal, value)`` AND its guard (another rule triple) holds.  First
firing rule in pack order wins — Luzzu's metric-priority semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from luzzu_ray import constants as C

_OPS = {
    "lt": np.less,
    "le": np.less_equal,
    "gt": np.greater,
    "ge": np.greater_equal,
    "eq": np.equal,
    "ne": np.not_equal,
}


@dataclass(frozen=True)
class Rule:
    reason: str
    signal: str
    op: str          # lt/le/gt/ge/eq/ne/in/not_in
    value: object
    guard: tuple | None = None   # (signal, op, value) that must ALSO hold

    def to_dict(self) -> dict:
        d = {"reason": self.reason, "signal": self.signal, "op": self.op,
             "value": self.value}
        if self.guard:
            d["guard"] = list(self.guard)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "Rule":
        g = d.get("guard")
        return cls(d["reason"], d["signal"], d["op"], d["value"],
                   tuple(g) if g else None)


def default_rule_pack() -> list[Rule]:
    """The engine's turn-level verdict expressed as data.

    Mirrors ``stages.turn_stages.verdict_batch`` / TURN_REASON_ORDER.
    """
    rep_guard = ("n_words", "ge", C.MIN_WORDS_FOR_REP)
    return [
        Rule(C.R_MALFORMED, "malformed", "eq", True),
        Rule(C.R_EMPTY, "n_chars", "eq", 0),
        Rule(C.R_TOO_SHORT, "n_chars", "lt", C.MIN_CHARS),
        Rule(C.R_TOO_LONG, "n_chars", "gt", C.MAX_CHARS),
        Rule(C.R_BAD_LANG, "lang", "not_in", list(C.ALLOWED_LANGS)),
        Rule(C.R_LOW_LANG_CONF, "lang_conf", "lt", C.MIN_LANG_CONF),
        Rule(C.R_HIGH_PPL, "ppl", "gt", C.PPL_MAX),
        Rule(C.R_REPETITIVE, "rep_ratio", "gt", C.REP_2GRAM_MAX, rep_guard),
        Rule(C.R_TOP_WORD, "top_word_ratio", "gt", C.TOP_WORD_MAX, rep_guard),
        Rule(C.R_SYMBOL_HEAVY, "symbol_ratio", "gt", C.SYMBOL_MAX),
        Rule(C.R_DIGIT_HEAVY, "digit_ratio", "gt", C.DIGIT_MAX),
    ]


def _eval_cond(t: pa.Table, signal: str, op: str, value) -> np.ndarray:
    col = t[signal].combine_chunks().to_numpy(zero_copy_only=False)
    if op == "in":
        return np.isin(col, np.asarray(value))
    if op == "not_in":
        return ~np.isin(col, np.asarray(value))
    return _OPS[op](col, value)


def compile_rules(pack: list[Rule]):
    """Compile a pack into fn(batch) -> batch + drop_reason column."""

    def verdict(t: pa.Table) -> pa.Table:
        n = t.num_rows
        decided = np.zeros(n, dtype=bool)
        reason = np.empty(n, dtype=object)
        reason[:] = None
        for r in pack:
            cond = _eval_cond(t, r.signal, r.op, r.value)
            if r.guard is not None:
                cond = cond & _eval_cond(t, *r.guard)
            fire = cond & ~decided
            reason[fire] = r.reason
            decided |= fire
        return t.append_column(
            "drop_reason", pa.array(reason, type=pa.string(), from_pandas=True)
        )

    return verdict


def load_rule_pack(path: str) -> list[Rule]:
    """Load a JSON rule pack ([{reason, signal, op, value, guard?}, ...])."""
    import json

    with open(path) as f:
        return [Rule.from_dict(d) for d in json.load(f)]
