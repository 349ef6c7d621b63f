"""Property-based invariants (SURVEY.md §5.2.3): scrub idempotence,
engine/oracle per-row agreement on arbitrary text, permutation
invariance of batch kernels.  No Ray needed — these exercise the
shared kernels directly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import oracle
from luzzu_ray import constants as C
from luzzu_ray import models
from luzzu_ray.functions import text as TX
from luzzu_ray.stages.turn_stages import scrub_batch, signals_batch

# text with PII-ish fragments mixed in to stress the scrub pack
_pii_bits = st.sampled_from(
    ["a.b@example.com", "123-45-6789", "555-123-4567", "10.0.0.1",
     "4111 1111 1111 1111", "http://u:p@x.com/z", "frakking", "", " "]
)
_texts = st.lists(
    st.one_of(st.text(max_size=40), _pii_bits), max_size=8
).map(" ".join)


@given(_texts)
@settings(max_examples=150, deadline=None)
def test_scrub_idempotent(text):
    once, _ = oracle.scrub(text)
    twice, _ = oracle.scrub(once)
    assert once == twice


@given(_texts)
@settings(max_examples=150, deadline=None)
def test_engine_scrub_equals_oracle(text):
    t = pa.table({"text": pa.array([text], pa.string())})
    got = scrub_batch(t)["text_scrubbed"][0].as_py()
    want, counts = oracle.scrub(text)
    assert got == want
    out = scrub_batch(t)
    for name, n in counts.items():
        assert out[f"scrub_{name}"][0].as_py() == n, name


@given(_texts)
@settings(max_examples=100, deadline=None)
def test_engine_signals_equal_oracle(text):
    t = pa.table({"text": pa.array([text], pa.string())})
    s = signals_batch(t)
    o = oracle.text_signals(text, _model=("en", 1.0, 0.0))
    assert s["n_chars"][0].as_py() == o["n_chars"]
    assert s["n_words"][0].as_py() == o["n_words"]
    assert abs(s["rep_ratio"][0].as_py() - o["rep_ratio"]) < 1e-12
    assert abs(s["top_word_ratio"][0].as_py() - o["top_word_ratio"]) < 1e-12
    assert abs(s["symbol_ratio"][0].as_py() - o["symbol_ratio"]) < 1e-12
    assert abs(s["digit_ratio"][0].as_py() - o["digit_ratio"]) < 1e-12


@given(st.lists(_texts, min_size=2, max_size=12), st.randoms())
@settings(max_examples=50, deadline=None)
def test_model_scores_permutation_invariant(texts, rnd):
    arr = pa.array(texts, pa.string())
    data, offs = TX.utf8_view(arr)
    m = models.get_models()
    idx, conf = models.langid_scores(data, offs, m["langid_W"])
    ppl = models.ppl_scores(data, offs, idx, m)

    perm = list(range(len(texts)))
    rnd.shuffle(perm)
    arr2 = arr.take(pa.array(perm))
    d2, o2 = TX.utf8_view(arr2)
    i2, c2 = models.langid_scores(d2, o2, m["langid_W"])
    p2 = models.ppl_scores(d2, o2, i2, m)
    assert (i2 == idx[perm]).all()
    assert (c2 == conf[perm]).all()
    assert (p2 == ppl[perm]).all()


@given(st.lists(_texts, min_size=1, max_size=10))
@settings(max_examples=50, deadline=None)
def test_batch_scoring_equals_row_scoring(texts):
    arr = pa.array(texts, pa.string())
    data, offs = TX.utf8_view(arr)
    m = models.get_models()
    idx, conf = models.langid_scores(data, offs, m["langid_W"])
    ppl = models.ppl_scores(data, offs, idx, m)
    for i, t in enumerate(texts):
        lang_s, conf_s = models.langid_row(t)
        lang_b = models.LANGS[idx[i]] if idx[i] >= 0 else C.LANG_UND
        assert lang_s == lang_b
        assert conf_s == conf[i]
        assert models.ppl_row(t, lang_s) == ppl[i]


@given(st.lists(st.one_of(st.text(max_size=60), _pii_bits), max_size=10))
@settings(max_examples=100, deadline=None)
def test_lexical_stats_batch_equals_row(texts):
    from luzzu_ray.ops.textstats import lexical_stats_batch, lexical_stats_py

    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = lexical_stats_batch(t).to_pylist()
    for row, txt in zip(out, texts):
        want = lexical_stats_py(txt)
        assert {k: row[k] for k in want} == want, repr(txt)
