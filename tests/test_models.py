"""Unit tests for the deterministic langid / perplexity models."""

import numpy as np
import pyarrow as pa

from luzzu_ray import constants as C
from luzzu_ray import models
from luzzu_ray.functions import text as TX


def test_langid_detects_seed_languages():
    cases = {
        "en": "the quick brown fox jumps over the lazy dog near the river",
        "fr": "le renard brun saute par dessus le chien paresseux pres de la riviere",
        "de": "der schnelle braune fuchs springt uber den faulen hund am fluss",
        "es": "el rapido zorro marron salta sobre el perro perezoso junto al rio",
    }
    for want, text in cases.items():
        lang, conf = models.langid_row(text)
        assert lang == want
        assert conf > 0.5


def test_langid_und_for_junk_and_short():
    assert models.langid_row("")[0] == C.LANG_UND
    assert models.langid_row("ab")[0] == C.LANG_UND
    lang, conf = models.langid_row("xk qzj wvv 9934 @@##")
    # junk either lands on und or has negligible confidence
    assert lang == C.LANG_UND or conf < C.MIN_LANG_CONF


def test_ppl_orders_clean_below_junk():
    clean = "thank you for your help with the analysis it was very useful"
    junk = "zxqv jkwp qqqq mmnb zzzz xwxw kjkj popo"
    assert models.ppl_row(clean, "en") < C.PPL_MAX
    assert models.ppl_row(junk, "en") > C.PPL_MAX


def test_batch_equals_single_bitwise():
    texts = [
        "the quick brown fox", "le renard brun", "", "a",
        "zxqv jkwp qqqq", "der schnelle braune fuchs springt",
        "@@@@ #### $$$$", "el rapido zorro marron salta sobre el perro",
    ]
    arr = pa.array(texts, pa.string())
    data, offs = TX.utf8_view(arr)
    m = models.get_models()
    idx, conf = models.langid_scores(data, offs, m["langid_W"])
    ppl = models.ppl_scores(data, offs, idx, m)
    for i, t in enumerate(texts):
        lang_s, conf_s = models.langid_row(t)
        lang_b = models.LANGS[idx[i]] if idx[i] >= 0 else C.LANG_UND
        assert lang_s == lang_b
        assert conf_s == float(conf[i])  # bit-exact
        assert models.ppl_row(t, lang_s) == float(ppl[i])  # bit-exact


def test_model_weights_deterministic():
    w1 = models._build_models()["langid_W"]
    w2 = models._build_models()["langid_W"]
    assert np.array_equal(w1, w2)


def test_quality_classifier_batch_equals_rows():
    import numpy as np
    import pyarrow as pa

    from luzzu_ray.ops.classifier import QualityClassifierStage, classify_row

    rng = np.random.default_rng(123)
    vocab = ["alpha", "beta", "gamma", "x", "longtokenword", "1", "...", "é"]
    texts = []
    for _ in range(200):
        k = rng.integers(0, 12)
        words = [vocab[i] for i in rng.integers(0, len(vocab), k)]
        s = " ".join(words)
        if rng.random() < 0.2:
            s = "  " + s + "  "          # leading/trailing/multi spaces
        texts.append(s)
    texts += [None, "", " ", "word"]
    stage = QualityClassifierStage()
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    whole = stage(t)
    for i, txt in enumerate(texts):
        s, k = classify_row(txt)
        assert whole["clf_score"][i].as_py() == s
        assert whole["clf_keep"][i].as_py() == k
    # layout invariance: scoring a slice matches the whole-batch run
    part = stage(t.slice(3, 50))
    assert part["clf_score"].to_pylist() == whole["clf_score"].to_pylist()[3:53]
