"""Vectorized text kernels vs independent per-row computation."""

import numpy as np
import pyarrow as pa

import oracle
from luzzu_ray.functions import text as TX

TEXTS = [
    "hello world hello world hello world hello world",
    "all distinct words in this short sentence right here",
    "",
    "  leading and trailing   spaces  ",
    "punct,comma;semi:colon!bang?quest",
    "café süß naïve — unicode wörds",
    "123 456 123 456 123 456",
    "a",
    "x" * 500,
    "mixed CASE Mixed case MIXED case",
]


def _cols():
    arr = pa.array(TEXTS, pa.string())
    return TX.utf8_view(arr)


def test_token_counts_match_oracle_tokenizer():
    data, offs = _cols()
    _, _, tr = TX.token_segments(data, offs)
    n_words = np.bincount(tr, minlength=len(TEXTS))
    for i, t in enumerate(TEXTS):
        assert n_words[i] == len(oracle.tokenize(t)), t


def test_dup_and_top_fraction_match_bruteforce():
    data, offs = _cols()
    ts_, tl_, tr_ = TX.token_segments(data, offs)
    th = TX.token_hashes(data, ts_, tl_)
    dup2 = TX.dup_ngram_fraction(th, tr_, len(TEXTS), 2)
    top = TX.top_token_fraction(th, tr_, len(TEXTS))
    for i, t in enumerate(TEXTS):
        sig = oracle.text_signals(t, _model=("en", 1.0, 1.0))
        assert abs(dup2[i] - sig["rep_ratio"]) < 1e-12, t
        assert abs(top[i] - sig["top_word_ratio"]) < 1e-12, t


def test_byte_class_fractions_match_oracle():
    data, offs = _cols()
    cls = TX.byte_class_fractions(data, offs)
    for i, t in enumerate(TEXTS):
        sig = oracle.text_signals(t, _model=("en", 1.0, 1.0))
        nonspace = max(1, int(cls[i, 0] + cls[i, 1] + cls[i, 3]))
        assert cls[i, 3] / nonspace == sig["symbol_ratio"]
        assert cls[i, 1] / nonspace == sig["digit_ratio"]


def test_token_hash_collision_free_on_vocab():
    # distinct tokens -> distinct hashes on a realistic vocabulary
    toks = {f"tok{i}word{i*7}" for i in range(5000)}
    hashes = {TX.token_hash_py(t.encode()) for t in toks}
    assert len(hashes) == len(toks)


def test_null_and_sliced_arrays():
    arr = pa.array(["abc", None, "def", ""], pa.string())
    data, offs = TX.utf8_view(arr)
    assert list(TX.row_lengths(offs)) == [3, 0, 3, 0]
    sl = arr.slice(1, 2)
    data2, offs2 = TX.utf8_view(sl)
    assert list(TX.row_lengths(offs2)) == [0, 3]


def test_non_ascii_engine_vs_sql_divergence():
    """Pin the documented ASCII-only domain of the SQL oracles.

    The engine's byte tables classify every non-ASCII byte as a
    word/alpha byte (multi-byte chars never split tokens), while the
    DuckDB oracle's `[A-Za-z0-9]+` word definition is ASCII-only.  On
    pure-ASCII input (the sf fixtures, verified in datagen) both agree;
    on non-ASCII input they MUST diverge exactly as documented in
    __ray_entry__.py's domain note.
    """
    import duckdb

    text = "élève café"  # 2 tokens to the engine, 3 ASCII runs to SQL
    data, offs = TX.utf8_view(pa.array([text]))
    _, _, tr_ = TX.token_segments(data, offs)
    engine_words = int((tr_ == 0).sum())
    assert engine_words == 2

    sql_words = duckdb.sql(
        "SELECT len(regexp_extract_all(?, '[A-Za-z0-9]+'))", params=[text]
    ).fetchone()[0]
    assert sql_words == 3  # 'l', 've', 'caf' — accents split/truncate runs

    # and symbol counting: the engine sees 0 symbol bytes (non-ASCII ->
    # word bytes), the SQL CHAR class sees 0 symbols too but counts
    # chars not bytes — divergence shows up in nonspace denominators
    cls = TX.byte_class_fractions(data, offs)
    assert int(cls[0, 0]) == len(text.encode()) - text.count(" ")  # alpha BYTES
    assert len(text) - text.count(" ") != int(cls[0, 0])  # chars != bytes
