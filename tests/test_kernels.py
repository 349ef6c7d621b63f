"""Vectorized text kernels vs independent per-row computation."""

import numpy as np
import pyarrow as pa

import oracle
from luzzu_ray import constants as C
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


def test_non_ascii_engine_vs_sql_agree():
    """Pin the widened UTF-8 oracle domain of the case-insensitive
    kernels (engine byte classes == extended-word-class SQL on ANY
    valid UTF-8 input), per __ray_entry__.py's domain note."""
    import duckdb
    import numpy as np

    texts = [
        "élève café",                       # Latin-1 accents
        "naïve — «quoted» text…",           # punctuation beyond ASCII
        "日本語のテキスト 123 abc!",          # CJK + ASCII mix
        "emoji \U0001f389\U0001f38a party!!",
        "a b",                          # NBSP: word byte on both sides
        "tabs\tand\nnewlines  ok",
        "",
        "   ",
        "pure ascii 42%",
    ]
    data, offs = TX.utf8_view(pa.array(texts))
    cls = TX.byte_class_fractions(data, offs)
    _, _, tr_ = TX.token_segments(data, offs)
    n_words = np.bincount(tr_, minlength=len(texts))
    con = duckdb.connect()
    for i, t in enumerate(texts):
        words, symbols, digits, nonspace = con.execute(
            r"""
            SELECT len(regexp_extract_all(?, '[A-Za-z0-9\x{80}-\x{10FFFF}]+')),
                   len(regexp_extract_all(?, '[^A-Za-z0-9\x{80}-\x{10FFFF}[:space:]]')),
                   len(regexp_extract_all(?, '[0-9]')),
                   octet_length(encode(?)) - len(regexp_extract_all(?, '[[:space:]]'))
            """,
            [t] * 5,
        ).fetchone()
        assert words == int(n_words[i]), t
        assert symbols == int(cls[i, 3]), t
        assert digits == int(cls[i, 1]), t
        assert nonspace == int(cls[i, 0] + cls[i, 1] + cls[i, 3]), t

    # NBSP sanity: 'a\xa0b' is ONE token on both sides (no split).
    assert int(n_words[4]) == 1

    # The LOWERCASING kernels now case-fold the TWO-BYTE UTF-8 range
    # (Latin-1 Supplement / Latin Extended / Greek / Cyrillic simple
    # fold, length-invariant) in agreement with DuckDB lower(); 3+-byte
    # uppercase (e.g. fullwidth A) and length-changing mappings (İ)
    # remain identity — the documented residual divergence.
    for ch in ("É", "Æ", "Ž", "Σ", "Д", "Ю", "Ÿ"):
        eng = bytes(C.casefold_utf8(
            np.frombuffer(ch.encode(), np.uint8))).decode()
        sql = con.execute("SELECT lower(?)", [ch]).fetchone()[0]
        assert eng == sql == ch.lower(), ch
    # folding is position-safe inside longer byte streams
    s = "Crème BRÛLÉE и Ещё"
    eng_s = bytes(C.casefold_utf8(
        np.frombuffer(s.encode(), np.uint8))).decode()
    assert eng_s == s.lower()
    for ch in ("Ａ", "İ", "Ⴀ"):  # 3-byte, length-changing, 3-byte
        eng = bytes(C.casefold_utf8(np.frombuffer(ch.encode(), np.uint8)))
        assert eng == ch.encode()  # engine: identity — pinned divergence
    # every fold output must round-trip as valid UTF-8 of equal length
    for cp in range(0x80, 0x800):
        b = chr(cp).encode()
        f = bytes(C.casefold_utf8(np.frombuffer(b, np.uint8)))
        assert len(f) == len(b)
        f.decode("utf-8")


def test_year_from_epoch_us_matches_datetime():
    """The integer civil-from-days year kernel (Hinnant) agrees with
    Python's proleptic-Gregorian datetime on a dense sweep across leap
    years, century rules, and pre-epoch dates."""
    import datetime as dt

    from luzzu_ray.ops.common import year_from_epoch_us

    # every 17 days over 1899..2101 (covers 1900 non-leap, 2000 leap,
    # negative epochs) plus exact year boundaries
    days = np.arange(-26_000, 48_000, 17, dtype=np.int64)
    bounds = [
        int((dt.datetime(y, 1, 1, tzinfo=dt.timezone.utc)
             - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc))
            .total_seconds()) // 86_400
        for y in (1900, 1970, 2000, 2001, 2100)
    ]
    days = np.concatenate([days, np.array(bounds, np.int64),
                           np.array(bounds, np.int64) - 1])
    us = days * 86_400_000_000 + 12 * 3_600_000_000  # mid-day, no edge
    got = year_from_epoch_us(us)
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    want = np.array(
        [(epoch + dt.timedelta(days=int(d))).year for d in days], np.int64)
    assert (got == want).all()


def test_repetition_stats_batch_matches_scalar_twin():
    import pyarrow as pa

    from luzzu_ray.ops.textstats import (
        repetition_stats_batch, repetition_stats_py)

    texts = [
        "", "a", None,
        "a a a a a a a a a a a a a a a a",          # one repeated line
        "the cat sat on the mat the cat sat on the mat",
        "x y " * 30,                                 # trailing-space words
        "héllo wörld héllo wörld héllo wörld héllo", # multibyte chars
        "a  b   c a  b   c",                         # empty-string words
        "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8 tail",
        " ".join(f"t{i % 7}" for i in range(100)),
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    for w in (3, 8):
        out = repetition_stats_batch(t, words_per_line=w).to_pydict()
        for i, tx in enumerate(texts):
            exp = repetition_stats_py(tx, words_per_line=w)
            got = {k: out[k][i] for k in exp}
            assert got == exp, (w, i, tx, got, exp)


def test_minhash_dedup_multibyte_fixture(ray_session):
    """minhash_dedup == the DuckDB all-pairs Jaccard + closure twin on
    a MULTIBYTE corpus (Latin-1/Greek/Cyrillic uppercase planted in
    near-dup groups): the two-byte casefold kernel makes the engine's
    lowered token stream agree with DuckDB lower() on these ranges
    (the oracle's word class is the codepoint twin of BYTE_WORD)."""
    import duckdb
    import ray.data

    import __ray_entry__ as E
    from luzzu_ray.ops.dedup import minhash_dedup

    base = [
        "Crème BRÛLÉE recipe with Œufs and sugar butter flour salt",
        "ΣΟΦΊΑ and Αθηνά discuss Φιλοσοφία in ancient ΕΛΛΆΔΑ today",
        "Москва и Санкт-Петербург ЗИМОЙ очень Холодно друзья мои да",
        "plain ascii control document nothing fancy here at all now",
    ]
    texts, ids = [], []
    for i, b in enumerate(base):
        # near-dup group: the original, a case-variant, and one with a
        # word swapped — all above the 0.6 word-shingle threshold
        texts += [b, b.upper(), b.lower()]
        ids += [i * 10, i * 10 + 1, i * 10 + 2]
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = minhash_dedup(
        ray.data.from_arrow(t).repartition(3), jaccard_threshold=0.6)
    if not isinstance(got, pa.Table):
        got = pa.Table.from_pylist(got.take_all())
    got = got.sort_by("doc_id")

    con = duckdb.connect()
    con.register("documents", t)
    pat = r"[a-z0-9\x{80}-\x{10FFFF}]+"
    sql = E._jaccard_pairs_sql(600000).replace("[a-z0-9]+", pat) \
        + E._CLOSURE_SQL
    want = con.execute(
        sql + " ORDER BY doc_id").fetch_arrow_table()
    assert got.num_rows == want.num_rows > 0
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["cluster"].to_pylist() == want["cluster"].to_pylist()
    assert got["is_dup"].to_pylist() == want["is_dup"].to_pylist()
    # every planted group actually clustered (4 groups x 3 members)
    assert got.num_rows == 12
