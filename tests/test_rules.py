"""Declarative rule pack (LQML analogue): the compiled default pack must
agree with the hand-written verdict stage row for row; custom packs
re-threshold without code changes."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from luzzu_ray import constants as C
from luzzu_ray.rules import Rule, compile_rules, default_rule_pack, load_rule_pack
from luzzu_ray.stages.actors import ModelScorer
from luzzu_ray.stages.turn_stages import normalize_batch, signals_batch, verdict_batch


def _signal_table():
    files = sorted(glob.glob("/tmp/luzzu_test_corpora/smoke/*.parquet"))
    t = pa.concat_tables(pq.read_table(f) for f in files)
    t = signals_batch(normalize_batch(t))
    return ModelScorer(warmup=False)(t)


def test_default_pack_matches_verdict_stage(smoke_corpus_dir):
    t = _signal_table()
    want = verdict_batch(t)["drop_reason"].to_pylist()
    got = compile_rules(default_rule_pack())(t)["drop_reason"].to_pylist()
    assert got == want


def test_custom_pack_rethresholds(smoke_corpus_dir):
    t = _signal_table()
    strict = [Rule("too_short", "n_chars", "lt", 10_000)]
    out = compile_rules(strict)(t)["drop_reason"].to_pylist()
    n_chars = t["n_chars"].to_pylist()
    assert all(
        (r == "too_short") == (c < 10_000) for r, c in zip(out, n_chars)
    )


def test_pack_roundtrip(tmp_path):
    import json

    pack = default_rule_pack()
    p = tmp_path / "pack.json"
    p.write_text(json.dumps([r.to_dict() for r in pack]))
    loaded = load_rule_pack(str(p))
    assert loaded == pack
