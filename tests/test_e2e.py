"""End-to-end: full Ray pipeline vs the pure-Python oracle (north rule:
keep/drop F1 >= 0.99, exact scrubbed-text equality)."""

import pandas as pd
import pytest


def _engine_df(ray_session, smoke_corpus_dir, **kw):
    from luzzu_ray.pipelines.filter_pipeline import run_flagship

    ds = run_flagship(
        smoke_corpus_dir, giant_min_turns=500, num_partitions=8, **kw
    )
    return ds.to_pandas()


def _aligned(e: pd.DataFrame, o: pd.DataFrame):
    key = ["conv_id", "turn_idx", "ts", "text", "drop_reason"]
    e = e.sort_values(key, na_position="first").reset_index(drop=True)
    o = o.sort_values(key, na_position="first").reset_index(drop=True)
    return e, o


@pytest.fixture(scope="module")
def engine_and_oracle(ray_session, smoke_corpus_dir, oracle_results):
    e = _engine_df(ray_session, smoke_corpus_dir)
    o = pd.DataFrame(oracle_results)
    o["ts"] = pd.to_datetime(o["ts"])
    return _aligned(e, o)


def test_row_counts(engine_and_oracle):
    e, o = engine_and_oracle
    assert len(e) == len(o)


def test_keep_f1(engine_and_oracle):
    e, o = engine_and_oracle
    tp = ((e["keep"]) & (o["keep"])).sum()
    fp = ((e["keep"]) & (~o["keep"])).sum()
    fn = ((~e["keep"]) & (o["keep"])).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"F1={f1}"


def test_reasons_exact(engine_and_oracle):
    e, o = engine_and_oracle
    assert (e["drop_reason"].fillna("") == o["drop_reason"].fillna("")).all()


def test_scrubbed_text_exact(engine_and_oracle):
    e, o = engine_and_oracle
    assert (e["text_scrubbed"].fillna("") == o["text_scrubbed"].fillna("")).all()


def test_signals_exact(engine_and_oracle):
    e, o = engine_and_oracle
    for col in ["lang", "lang_conf", "ppl", "rep_ratio", "top_word_ratio",
                "symbol_ratio", "digit_ratio", "n_chars", "n_words"]:
        if col == "lang":
            assert (e[col] == o[col]).all(), col
        else:
            assert (e[col].values == o[col].values).all(), col


def test_salted_equals_unsalted(ray_session, smoke_corpus_dir, engine_and_oracle):
    """Giant-conv salted path produces identical verdicts to unsalted."""
    e_salted, _ = engine_and_oracle
    e_plain = _engine_df(ray_session, smoke_corpus_dir, skip_giant_detection=True)
    e_plain, _ = _aligned(e_plain, e_plain.copy())
    cols = ["conv_id", "turn_idx", "keep", "drop_reason", "text_scrubbed"]
    a = e_salted[cols].reset_index(drop=True)
    b = e_plain[cols].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
