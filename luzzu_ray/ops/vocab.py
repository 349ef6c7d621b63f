"""Corpus vocabulary construction: word-level term/document frequency
and top-V selection — the "build a tokenizer vocab / stopword list"
step of a training-data pipeline.

Luzzu analogue: vocabulary-driven metrics (/root/reference/README.md:14)
which score documents against a corpus-level term table; here the term
table itself is built distributed.

Scale shape: each block reduces to its LOCAL (word, tf, df) table
before the exchange — the shuffle carries at most |block vocab| rows
per block (Zipf makes this a small fraction of the token count), then
one hash groupby sums partials and a narrow sort takes the top V.
Never ships raw token streams through the exchange.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from luzzu_ray.ops.common import pool as _pool


def _word_partial(t: pa.Table, text_col: str) -> pa.Table:
    """Per-block partial: (word, tf, df) over this block's rows.

    tf = token occurrences, df = rows (documents) containing the word.
    Tokenization is a plain single-space split, matching SQL
    ``string_split(text, ' ')`` exactly (empty text yields one empty
    token, double spaces yield empty tokens — both sides agree).
    """
    n = t.num_rows
    if n == 0:
        return pa.table(
            {"word": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64()),
             "df": pa.array([], pa.int64())}
        )
    words = pc.split_pattern(t[text_col], " ").combine_chunks()
    flat = words.flatten()
    per_row = (words.offsets.to_numpy()[1:]
               - words.offsets.to_numpy()[:-1]).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    tf = np.bincount(codes, minlength=len(vocab))
    rid = np.repeat(np.arange(n, dtype=np.int64), per_row)
    pairs = np.unique(codes * n + rid)
    df = np.bincount(pairs // n, minlength=len(vocab))
    return pa.table(
        {"word": vocab,
         "tf": pa.array(tf.astype(np.int64)),
         "df": pa.array(df.astype(np.int64))}
    )


def word_stats_topv(
    ds: ray.data.Dataset,
    v: int,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Top-V corpus vocabulary by (tf DESC, word ASC): columns
    (word, tf, df).  SQL twin::

        SELECT word, count(*) tf, count(DISTINCT doc_id) df
        FROM (SELECT doc_id, unnest(string_split(text,' ')) word FROM t)
        GROUP BY word ORDER BY tf DESC, word LIMIT V
    """
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.ops.relational import topk
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    # materialize the NARROW partials (per-block vocab rows, never the
    # token stream) so the combine width follows the actual partial row
    # count — a 30-word corpus gets 1 partition, not the cluster cap
    parts = ds.select_columns([text_col]).map_batches(
        _word_partial, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    totals = parts.groupby(
        "word", num_partitions=auto_partitions(parts, num_partitions)
    ).aggregate(Sum("tf", alias_name="tf"), Sum("df", alias_name="df"))
    return topk(totals, "tf", v, "word")


def collapse_repeat_tokens(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Intra-document repetition cleanup: drop every token equal to its
    immediate predecessor ("a a the" -> "a the") — the cheap stutter /
    copy-paste artifact scrub of a web-text pipeline.  Embarrassingly
    parallel per-batch kernel, no exchange; the whole batch is ONE
    Arrow split + ONE shifted vector equality + ONE rejoin (no per-row
    Python).  SQL twin: list_filter(w, (x,i) -> i=1 OR x<>w[i-1]).

    Output: (id_col, text_collapsed, n_removed).
    """

    def block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "text_collapsed": pa.array([], pa.string()),
                 "n_removed": pa.array([], pa.int64())}
            )
        words = pc.split_pattern(t[text_col], " ").combine_chunks()
        offs = words.offsets.to_numpy().astype(np.int64)
        flat = words.flatten()
        m = len(flat)
        keep = np.ones(m, dtype=bool)
        if m > 1:
            eq = pc.equal(flat.slice(1), flat.slice(0, m - 1))
            keep[1:] = ~eq.to_numpy(zero_copy_only=False).astype(bool)
        starts = offs[:-1] - offs[0]
        keep[starts[(offs[1:] - offs[:-1]) > 0]] = True  # row firsts
        kept = flat.filter(pa.array(keep))
        per_row = np.add.reduceat(
            keep.astype(np.int64), starts, dtype=np.int64
        ) if m else np.zeros(n, dtype=np.int64)
        per_row[(offs[1:] - offs[:-1]) == 0] = 0
        new_offs = np.concatenate(
            ([0], np.cumsum(per_row))
        ).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(new_offs), kept), " "
        )
        removed = (offs[1:] - offs[:-1]) - per_row
        return pa.table(
            {id_col: t[id_col],
             "text_collapsed": joined,
             "n_removed": pa.array(removed.astype(np.int64))}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True
    )


TFIDF_VOCAB_CAP = 1_000_000


def tfidf_top_terms(
    ds: ray.data.Dataset,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    vocab_cap: int = TFIDF_VOCAB_CAP,
) -> ray.data.Dataset:
    """Keyword extraction: each document's top-k terms by a RATIONAL
    tf-idf score kept entirely in integers —
    ``score = tf * N_docs * 10^4 // df`` — so ranking is bit-exact and
    SQL-checkable (no libm log whose last ulp differs across engines;
    N/df is the same monotone-in-idf ordering for fixed tf).

    Two phases: (1) corpus df via the word_stats partial+final combine
    (narrow (word, df) rows through the exchange), PRUNED to the top
    ``vocab_cap`` words by (df DESC, word ASC) through the same
    distributed top-k used by :func:`word_stats_topv` — so the driver
    holds AT MOST ``vocab_cap`` rows by construction, never the full
    distinct-word table (web corpora have 10^8-10^9 distinct tokens;
    the unbounded ``take_all`` was VERDICT r03 "what's wrong" #2);
    (2) the capped df table is broadcast once via ``ray.put`` and every
    batch scores its own docs locally — per-doc top-k never leaves the
    batch, so phase 2 is exchange-free.

    Words OUTSIDE the cap default to df = 1: any dropped word's true df
    is <= the smallest retained df, so the default can only RAISE its
    idf — rare terms stay maximally ranked, and the approximation
    touches only the sub-cap df tail (with the 10^6 default, hapax-ish
    typos/URLs whose exact df never matters for keyword extraction).
    With ``vocab_cap`` >= the true vocabulary the result is EXACT and
    the DuckDB oracle needs no cap modeling (the sf corpora have ~31
    distinct words).

    Output: (id_col, term, tfidf_score, rnk).
    """
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.ops.relational import topk
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    n_docs = ds.count()

    parts = ds.select_columns([text_col]).map_batches(
        _word_partial, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()  # narrow partials; sizes the combine to the data
    df_tbl = parts.groupby(
        "word", num_partitions=auto_partitions(parts, num_partitions)
    ).aggregate(Sum("df", alias_name="df"))
    import pyarrow as _pa

    df_rows = topk(df_tbl, "df", vocab_cap, "word").take_all()
    assert len(df_rows) <= vocab_cap  # bounded driver pull, by topk
    vocab = _pa.array([r["word"] for r in df_rows], pa.string())
    dfs = np.array([r["df"] for r in df_rows], dtype=np.int64)
    df_ref = ray.put((vocab, dfs))

    class Scorer:
        """df lookup resolved ONCE per actor; per-batch all-Arrow."""

        def __init__(self, ref):
            self.vocab, self.dfs = ray.get(ref)
            order = pc.array_sort_indices(self.vocab)
            self.sorted_vocab = self.vocab.take(order)
            self.sorted_dfs = self.dfs[order.to_numpy()]

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return pa.table(
                    {id_col: pa.array([], pa.int64()),
                     "term": pa.array([], pa.string()),
                     "tfidf_score": pa.array([], pa.int64()),
                     "rnk": pa.array([], pa.int64())}
                )
            words = pc.split_pattern(t[text_col], " ").combine_chunks()
            offs = words.offsets.to_numpy().astype(np.int64)
            flat = words.flatten()
            per_row = offs[1:] - offs[:-1]
            rid = np.repeat(np.arange(n, dtype=np.int64), per_row)
            enc = pc.dictionary_encode(flat)
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            nvoc = len(enc.dictionary)
            # per-(doc, word) tf via unique pair ids
            pair = rid * nvoc + codes
            upair, tf = np.unique(pair, return_counts=True)
            urow, ucode = upair // nvoc, upair % nvoc
            # df lookup: batch dictionary -> position in sorted vocab;
            # words beyond the broadcast cap default to df = 1 (see
            # the vocab_cap contract in the docstring)
            pos = pc.fill_null(
                pc.index_in(enc.dictionary, value_set=self.sorted_vocab),
                -1,
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            hit = pos >= 0
            if len(self.sorted_dfs):
                wdf = np.where(
                    hit[ucode],
                    self.sorted_dfs[np.where(hit, pos, 0)[ucode]],
                    1,
                )
            else:
                wdf = np.ones(len(ucode), dtype=np.int64)
            # integer-rational score; object dtype only if overflow risk
            score = (tf.astype(np.int64) * (n_docs * 10_000)) // wdf
            uterm = pc.take(enc.dictionary, pa.array(ucode)).to_numpy(
                zero_copy_only=False
            )
            order = np.lexsort((uterm, -score, urow))
            us, ss = urow[order], score[order]
            newseg = np.concatenate(([True], us[1:] != us[:-1]))
            seg_start = np.maximum.accumulate(
                np.where(newseg, np.arange(len(us)), 0)
            )
            posk = np.arange(len(us)) - seg_start
            sel = order[posk < k]
            ids_np = t[id_col].to_numpy(zero_copy_only=False)
            return pa.table(
                {id_col: pa.array(ids_np[urow[sel]]),
                 "term": pc.take(enc.dictionary, pa.array(ucode[sel])),
                 "tfidf_score": pa.array(score[sel].astype(np.int64)),
                 "rnk": pa.array((posk[posk < k] + 1).astype(np.int64))}
            )

    return ds.select_columns([id_col, text_col]).map_batches(
        Scorer, fn_constructor_kwargs={"ref": df_ref},
        batch_format="pyarrow", concurrency=_pool(),
    )


def chunk_documents(
    ds: ray.data.Dataset,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Sliding-window document CHUNKING: each doc becomes
    ``1 + max(0, ceil((T - window) / stride))`` overlapping token
    chunks (the embed/RAG/context-window preprocessing step).  All
    integer arithmetic, so the SQL ``generate_series + list_slice``
    oracle matches exactly; the whole batch is segment index math +
    ONE Arrow ``take`` + ONE rejoin — no per-row Python.  Overlap
    duplicates at most window/stride x the token bytes (that is the
    op's contract, not an implementation artifact).

    Output: (id_col, chunk_idx, chunk_text, n_tokens).
    """

    def block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "chunk_idx": pa.array([], pa.int64()),
                 "chunk_text": pa.array([], pa.string()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        words = pc.split_pattern(t[text_col], " ").combine_chunks()
        offs = words.offsets.to_numpy().astype(np.int64)
        flat = words.flatten()
        T = offs[1:] - offs[:-1]
        nk = 1 + (np.maximum(T - window, 0) + stride - 1) // stride
        rid = np.repeat(np.arange(n, dtype=np.int64), nk)
        # chunk index within its doc
        kstart = np.concatenate(([0], np.cumsum(nk)))
        ci = np.arange(int(kstart[-1]), dtype=np.int64) - kstart[rid]
        c_lo = ci * stride
        c_hi = np.minimum(c_lo + window, T[rid])
        c_len = c_hi - c_lo
        # token gather indices: one arange per chunk, segment-built
        tstart = np.concatenate(([0], np.cumsum(c_len)))
        M = int(tstart[-1])
        within = np.arange(M, dtype=np.int64) - np.repeat(
            tstart[:-1], c_len
        )
        tok_idx = (offs[:-1] - offs[0])[rid].repeat(c_len) \
            + c_lo.repeat(c_len) + within
        kept = flat.take(pa.array(tok_idx))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(tstart.astype(np.int32)), kept
            ), " "
        )
        ids_np = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {id_col: pa.array(ids_np[rid]),
             "chunk_idx": pa.array(ci),
             "chunk_text": joined,
             "n_tokens": pa.array(c_len.astype(np.int64))}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True
    )


def inverted_postings(
    ds: ray.data.Dataset,
    v: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Inverted-index build for the top-V vocabulary: flat (word,
    doc_id) posting pairs, one per DISTINCT (word in top-V, document)
    membership — the retrieval-index construction step.

    Scale shape: the top-V vocab comes from the existing
    ``word_stats_topv`` combine (narrow partials, one small sort); the
    V words are broadcast via ``ray.put`` and every batch emits its own
    distinct postings locally (``_word_partial`` already reduces to
    per-(doc, word) rows; filtering against the sorted vocab is ONE
    ``index_in``) — no exchange at all in the posting pass, because a
    document lives in exactly one row.  Emitting FLAT pairs instead of
    list-typed posting arrays keeps blocks splittable and the output
    mergeable; group downstream if an array layout is needed.
    """
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    vocab_rows = word_stats_topv(
        ds.select_columns([text_col]), v, text_col, num_partitions
    ).take_all()  # V rows only
    vocab = pa.array(sorted(r["word"] for r in vocab_rows), pa.string())
    vocab_ref = ray.put(vocab)

    class Postings:
        def __init__(self, ref):
            self.vocab = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"word": pa.array([], pa.string()),
                     id_col: pa.array([], pa.int64())}
                )
            words = pc.split_pattern(
                t[text_col].combine_chunks(), " "
            )
            offs = words.offsets.to_numpy().astype(np.int64)
            flat = words.flatten()
            per_row = offs[1:] - offs[:-1]
            rid = np.repeat(
                np.arange(t.num_rows, dtype=np.int64), per_row
            )
            pos = pc.index_in(flat, value_set=self.vocab)
            hit = pc.is_valid(pos).to_numpy(zero_copy_only=False)
            code = pos.to_numpy(zero_copy_only=False)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            hc = code[hit].astype(np.int64)
            hr = rid[hit]
            upair = np.unique(hc * t.num_rows + hr)  # distinct (w, doc)
            return pa.table(
                {"word": pc.take(
                    self.vocab, pa.array(upair // t.num_rows)
                 ),
                 id_col: pa.array(ids[upair % t.num_rows])}
            )

    return ds.select_columns([id_col, text_col]).map_batches(
        Postings, fn_constructor_kwargs={"ref": vocab_ref},
        batch_format="pyarrow", concurrency=_pool(),
    )


def _bigram_partial(t: pa.Table, text_col: str) -> pa.Table:
    """Per-block partial: (w1, w2, n) counts of ADJACENT token pairs,
    single-space tokenization (matches SQL ``string_split(text, ' ')``
    + ``lead() OVER (PARTITION BY doc ORDER BY position)`` exactly);
    pairs never cross row (document) boundaries."""
    empty = pa.table(
        {"w1": pa.array([], pa.string()),
         "w2": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    words = pc.split_pattern(t[text_col], " ").combine_chunks()
    flat = words.flatten()
    offs = words.offsets.to_numpy()
    if len(flat) == 0:
        return empty
    mask = np.ones(len(flat), dtype=bool)
    has_tok = offs[1:] > offs[:-1]
    mask[offs[1:][has_tok] - 1] = False     # last token of each row
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return empty
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    v = len(vocab)
    pair = codes[idx] * v + codes[idx + 1]
    uniq, cnt = np.unique(pair, return_counts=True)
    return pa.table(
        {"w1": vocab.take(pa.array(uniq // v)),
         "w2": vocab.take(pa.array(uniq % v)),
         "n": pa.array(cnt.astype(np.int64))}
    )


def bigram_next_topk(
    ds: ray.data.Dataset,
    k: int = 3,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed bigram language-model table: for every token w1, the
    top-k most frequent next tokens, rank-ordered — the count table a
    stupid-backoff / KenLM-style n-gram scorer trains from (the flagship
    perplexity stage CONSUMES such a table; this op BUILDS one from the
    corpus).  SQL twin::

        WITH toks AS (SELECT doc_id,
                        unnest(string_split(text,' ')) w,
                        generate_subscripts(string_split(text,' '),1) i
                      FROM t),
             big AS (SELECT w AS w1,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY i) w2
                     FROM toks),
             cnt AS (SELECT w1, w2, count(*) n FROM big
                     WHERE w2 IS NOT NULL GROUP BY 1, 2)
        SELECT w1, w2, n,
               row_number() OVER (PARTITION BY w1
                                  ORDER BY n DESC, w2) rk
        FROM cnt QUALIFY rk <= k

    Scale shape: per-block pair counting collapses the token stream to
    (w1, w2, n) partials BEFORE the one hash exchange on w1 (only
    distinct-pair rows move, never tokens); each reduce block then
    merges its co-located partials and cuts top-k in one vectorized
    kernel.  Skew: one hot w1 = one reduce block holding that word's
    distinct successors — bounded by vocabulary size, not corpus size.
    Output: (w1, w2, n, rk).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    parts = ds.select_columns([text_col]).map_batches(
        _bigram_partial, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    width = auto_partitions(parts, num_partitions)

    def merge_cut(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64()),
                 "rk": pa.array([], pa.int64())}
            )
        e1 = pc.dictionary_encode(t["w1"].combine_chunks())
        e2 = pc.dictionary_encode(t["w2"].combine_chunks())
        c1 = e1.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = e2.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        v2 = len(e2.dictionary)
        pair = c1 * v2 + c2
        uniq, inv = np.unique(pair, return_inverse=True)
        # int64-exact merge: bincount(weights=) accumulates in float64
        # and silently rounds once a hot pair's total passes 2^53.
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, n)
        u1, u2 = uniq // v2, uniq % v2
        # lexicographic rank of each w2 dictionary code for tie-breaks
        d2 = e2.dictionary.to_numpy(zero_copy_only=False)
        r2 = np.empty(v2, dtype=np.int64)
        r2[np.argsort(d2)] = np.arange(v2)
        order = np.lexsort((r2[u2], -tot, u1))
        g = u1[order]
        newseg = np.concatenate(([True], g[1:] != g[:-1]))
        seg_start = np.maximum.accumulate(
            np.where(newseg, np.arange(len(g)), 0)
        )
        pos = np.arange(len(g)) - seg_start
        keep = pos < k
        sel = order[keep]
        return pa.table(
            {"w1": e1.dictionary.take(pa.array(u1[sel])),
             "w2": e2.dictionary.take(pa.array(u2[sel])),
             "n": pa.array(tot[sel]),
             "rk": pa.array((pos[keep] + 1).astype(np.int64))}
        )

    return parts.repartition(
        num_blocks=width, keys=["w1"]
    ).map_batches(merge_cut, batch_format="pyarrow", batch_size=None)


def _bpe_pair_partial(t: pa.Table, text_col: str) -> pa.Table:
    """Per-block partial: counts of adjacent BYTE pairs within words
    (single-space tokenization) — the statistic the first BPE merge is
    chosen from (byte-level BPE a la GPT-2's tokenizer).  One bincount
    over a 65536-slot table; pairs never cross word boundaries.  Pairs
    are rendered latin-1, which equals the SQL character twin on ASCII
    corpora (multi-byte UTF-8 diverges by design: this op is
    byte-level)."""
    from luzzu_ray.functions.text import utf8_view

    empty = pa.table({"pair": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    words = pc.split_pattern(t[text_col], " ").combine_chunks()
    flat = words.flatten()
    if len(flat) == 0:
        return empty
    data, offs = utf8_view(flat)
    if offs[-1] - offs[0] < 2:
        return empty
    mask = np.zeros(len(data), dtype=bool)
    mask[offs[0]:offs[-1]] = True
    has_byte = offs[1:] > offs[:-1]
    mask[offs[1:][has_byte] - 1] = False      # last byte of each word
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return empty
    pair = data[idx].astype(np.int32) * 256 + data[idx + 1]
    cnt = np.bincount(pair, minlength=65536)
    nz = np.flatnonzero(cnt)
    pairs = [chr(int(p) >> 8) + chr(int(p) & 255) for p in nz]
    return pa.table({"pair": pa.array(pairs, pa.string()),
                     "n": pa.array(cnt[nz].astype(np.int64))})


def bpe_pair_counts(
    ds: ray.data.Dataset,
    k: int = 20,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Top-k within-word adjacent byte pairs by (count DESC, pair ASC)
    — the corpus statistic byte-level BPE tokenizer training consumes
    for its merge decisions.  Per-block bincount partials bound every
    exchange at 65,536 rows per block regardless of corpus size; the
    combine is a narrow groupby + global top-k.  Output: (pair, n)."""
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.ops.relational import topk
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    parts = ds.select_columns([text_col]).map_batches(
        _bpe_pair_partial, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    totals = parts.groupby(
        "pair", num_partitions=auto_partitions(parts, num_partitions)
    ).aggregate(Sum("n", alias_name="n"))
    return topk(totals, "n", k, "pair")


def _cooc_partial(t: pa.Table, text_col: str, cap: int) -> pa.Table:
    """Per-block partial: within-document distinct-token co-occurrence
    pair counts (w1 < w2 in byte order), each document capped to its
    ``cap`` byte-order-smallest distinct tokens.

    Fully vectorized: one dictionary encode, per-doc distinct via one
    ``np.unique`` over composite keys, then pair expansion batched BY
    DISTINCT-COUNT (every doc with m distinct tokens shares one
    ``triu_indices(m)`` template — at most ``cap`` template loops per
    block, never a per-row loop)."""
    empty = pa.table(
        {"w1": pa.array([], pa.string()),
         "w2": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())}
    )
    n = t.num_rows
    if n == 0:
        return empty
    words = pc.split_pattern(t[text_col], " ").combine_chunks()
    flat = words.flatten()
    offs = words.offsets.to_numpy()
    per_row = (offs[1:] - offs[:-1]).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    v = len(enc.dictionary)
    if v == 0:
        return empty
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # byte-order rank of each dictionary code (arrow-native sort), so
    # "w1 < w2" and the per-doc cap both follow SQL string collation
    sort_idx = pc.sort_indices(enc.dictionary).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rank = np.empty(v, dtype=np.int64)
    rank[sort_idx] = np.arange(v, dtype=np.int64)
    sorted_vocab = enc.dictionary.take(pa.array(sort_idx))
    rid = np.repeat(np.arange(n, dtype=np.int64), per_row)
    uk = np.unique(rid * v + rank[codes])  # distinct (doc, token-rank)
    drid, drk = uk // v, uk % v
    newdoc = np.concatenate(([True], drid[1:] != drid[:-1]))
    seg_start = np.maximum.accumulate(
        np.where(newdoc, np.arange(len(uk)), 0))
    pos = np.arange(len(uk)) - seg_start
    keep = pos < cap
    drid, drk = drid[keep], drk[keep]
    starts = np.flatnonzero(
        np.concatenate(([True], drid[1:] != drid[:-1])))
    counts = np.diff(np.concatenate((starts, [len(drid)])))
    out_a, out_b = [], []
    for m in np.unique(counts):
        if m < 2:
            continue
        docs_i = np.flatnonzero(counts == m)
        idx = starts[docs_i][:, None] + np.arange(m)[None, :]
        mat = drk[idx]  # (n_docs_with_m, m), ranks ascending per row
        iu0, iu1 = np.triu_indices(m, 1)
        out_a.append(mat[:, iu0].ravel())
        out_b.append(mat[:, iu1].ravel())
    if not out_a:
        return empty
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    upair, cnts = np.unique(a * v + b, return_counts=True)
    return pa.table(
        {"w1": sorted_vocab.take(pa.array(upair // v)),
         "w2": sorted_vocab.take(pa.array(upair % v)),
         "n": pa.array(cnts.astype(np.int64))}
    )


def token_cooccurrence(
    ds: ray.data.Dataset,
    k: int = 50,
    text_col: str = "text",
    cap: int = 512,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Top-k within-document distinct-token co-occurrence pairs — the
    corpus statistic PMI / word-association mining consumes (Luzzu
    analogue: corpus-level vocabulary metrics,
    /root/reference/README.md:14, extended to pairwise association).

    Semantics (SQL twin): per document, DISTINCT tokens (single-space
    split), capped to the ``cap`` byte-order-smallest tokens; every
    unordered pair (w1 < w2) counts once per document; output the k
    most frequent pairs ordered by (n DESC, w1, w2).

    Scale shape: the cap bounds pair expansion at m(m-1)/2 <= cap^2/2
    per document (quadratic blowup is the op's inherent hazard — the
    cap is part of the SPEC, mirrored in the oracle, not a silent
    truncation); each block reduces to its local (w1, w2, n) table
    before the ONE hash groupby, so the exchange carries block-local
    pair vocabularies, never token streams; the final top-k is a
    narrow sort over merged counts."""
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    parts = ds.select_columns([text_col]).map_batches(
        _cooc_partial, fn_kwargs={"text_col": text_col, "cap": cap},
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    totals = parts.groupby(
        ["w1", "w2"], num_partitions=auto_partitions(parts, num_partitions)
    ).aggregate(Sum("n", alias_name="n"))
    return totals.sort(
        ["n", "w1", "w2"], descending=[True, False, False]
    ).limit(k)


def dup_trigram_positions(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Gopher-style repetition coverage: per document, how many token
    positions are covered by a TRIGRAM that occurs 2+ times within the
    document (the "fraction of positions inside duplicate n-grams"
    filter, emitted as exact integers n_tokens / n_dup_positions so the
    fraction reconstructs without float division).

    Embarrassingly parallel — no exchange; per batch: ONE dictionary
    encode, one lexsort on the raw (doc, code-triple) keys — never a
    composite id, which would overflow int64 past 2^21 distinct tokens
    — marks within-doc duplicate trigrams, and covered positions
    scatter into a flat array counted per doc with a cumsum.  Tokens
    are the single-space split (SQL twin joins them with spaces —
    injective, tokens cannot contain spaces)."""

    def block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "n_dup_positions": pa.array([], pa.int64())}
            )
        words = pc.split_pattern(t[text_col], " ").combine_chunks()
        flat = words.flatten()
        offs = words.offsets.to_numpy().astype(np.int64)
        per_row = offs[1:] - offs[:-1]
        m = len(flat)
        n_dup = np.zeros(n, dtype=np.int64)
        if m >= 3:
            enc = pc.dictionary_encode(flat)
            codes = enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            rid = np.repeat(np.arange(n, dtype=np.int64), per_row)
            # valid trigram starts: i, i+1, i+2 in the same doc
            valid = np.flatnonzero(rid[:-2] == rid[2:])
            if len(valid):
                # sort on the raw code triple (never a composite id —
                # (c0*v + c1)*v + c2 overflows int64 past v = 2^21)
                c0 = codes[valid]
                c1 = codes[valid + 1]
                c2 = codes[valid + 2]
                key_doc = rid[valid]
                order = np.lexsort((c2, c1, c0, key_doc))
                kd = key_doc[order]
                s0, s1, s2 = c0[order], c1[order], c2[order]
                same = np.concatenate(
                    ([False],
                     (kd[1:] == kd[:-1]) & (s0[1:] == s0[:-1])
                     & (s1[1:] == s1[:-1]) & (s2[1:] == s2[:-1])))
                # an occurrence is duplicated if it matches its sorted
                # neighbor on either side
                dup_occ = same.copy()
                dup_occ[:-1] |= same[1:]
                dup_starts = valid[order[dup_occ]]
                flags = np.zeros(m, dtype=np.int64)
                flags[dup_starts] = 1
                flags[dup_starts + 1] = 1
                flags[dup_starts + 2] = 1
                cs = np.concatenate(([0], np.cumsum(flags)))
                n_dup = (cs[offs[1:]] - cs[offs[:-1]]).astype(np.int64)
        return pa.table(
            {id_col: t[id_col],
             "n_tokens": pa.array(per_row.astype(np.int64)),
             "n_dup_positions": pa.array(n_dup)}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True)


# BM25 constants, expressed as exact decimal fractions of k1=1.2 b=0.75:
# k1+1 = 2.2, k1*(1-b) = 0.3, k1*b = 0.9 — used as double literals in an
# IEEE-deterministic score expression (see bm25_topk docstring)
BM25_K1_PLUS1 = 2.2
BM25_K1_1MB = 0.3
BM25_K1B = 0.9


def bm25_topk(
    ds: ray.data.Dataset,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Distributed BM25 ranked retrieval for a constant query.

    Two narrow passes, no shuffle of tokens:

    1. corpus statistics — per-block partials of (n_docs, total_tokens,
       df per query term) reduce to one tiny row; the broadcast is
       O(|query terms|) scalars (NOT the corpus vocabulary — unlike the
       tf-idf df table there is no unbounded pull here);
    2. broadcast those integers into a scoring map stage: per-batch
       term frequencies via one Arrow split + flatten + bincount per
       term, then per-block top-k pruning so only k rows per block
       reach the final (k × n_blocks)-row sort.

    Exactness: the idf uses the RATIONAL core of the Robertson idf,
    (2N - 2df + 1) / (2df + 1) — the argument of the usual log — so
    the whole score is a composition of IEEE-exact ops (+ - * /) on
    integer-valued doubles, with a FIXED left-to-right term order.
    DuckDB evaluates the literally-identical expression bit-for-bit,
    so ``score_q6 = floor(score * 1e6)`` carries no float slack.
    (Monotone-transformed idf changes absolute scores vs log-idf but
    is a recognized idf variant; ranking quality is comparable for
    short queries.)  Tokenization is the corpus convention shared with
    the tf-idf family: split on single spaces, case-sensitive.
    """
    mt = len(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        tx = pc.fill_null(t[text_col], "")
        split = pc.split_pattern(tx, " ")
        dl = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        parents = np.repeat(np.arange(t.num_rows, dtype=np.int64), dl)
        cols = {
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "total_tokens": pa.array([int(dl.sum())], pa.int64()),
        }
        for j, term in enumerate(terms):
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            hit_docs = np.unique(parents[m])
            cols[f"df_{j}"] = pa.array([len(hit_docs)], pa.int64())
        return pa.table(cols)

    parts = ds.select_columns([id_col, text_col]).map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    tot = parts.sum(
        ["n_docs", "total_tokens"] + [f"df_{j}" for j in range(mt)]
    )
    if tot is None:  # empty input dataset
        tot = {"sum(n_docs)": 0, "sum(total_tokens)": 0,
               **{f"sum(df_{j})": 0 for j in range(mt)}}
    n_docs = int(tot["sum(n_docs)"])
    total_tokens = int(tot["sum(total_tokens)"])
    dfs = [int(tot[f"sum(df_{j})"]) for j in range(mt)]

    nf = float(n_docs)
    # an empty corpus still scores (all zeros) instead of dividing by 0
    totf = float(max(total_tokens, 1))

    def score_block(t: pa.Table) -> pa.Table:
        tx = pc.fill_null(t[text_col], "")
        split = pc.split_pattern(tx, " ")
        dl = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        n = t.num_rows
        parents = np.repeat(np.arange(n, dtype=np.int64), dl)
        dlf = dl.astype(np.float64)
        # den_base = 0.3 + ((0.9 * dl) * N) / total   (left-assoc, as SQL)
        den_base = BM25_K1_1MB + ((BM25_K1B * dlf) * nf) / totf
        score = None
        for j, term in enumerate(terms):
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(parents[m], minlength=n).astype(np.float64)
            idf = (2.0 * nf - 2.0 * float(dfs[j]) + 1.0) / (
                2.0 * float(dfs[j]) + 1.0
            )
            term_s = idf * ((tf * BM25_K1_PLUS1) / (tf + den_base))
            score = term_s if score is None else score + term_s
        q6 = np.floor(score * 1000000.0).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -q6))[:k]
        return pa.table({
            id_col: pa.array(ids[order]),
            "score_q6": pa.array(q6[order]),
        })

    pruned = ds.select_columns([id_col, text_col]).map_batches(
        score_block, batch_format="pyarrow", zero_copy_batch=True
    )
    return pruned.sort(["score_q6", id_col], descending=[True, False]).limit(k)


# byte-level BPE training: token ids pack into (a << 21) | b pair keys
_BPE_ID_BITS = 21


def _bpe_tokenize_block(t: pa.Table, text_col: str) -> pa.Table:
    """UTF-8 bytes of each doc as a list<int32> token column."""
    from luzzu_ray.functions import text as TX

    data, offs = TX.utf8_view(t[text_col])
    lo = int(offs[0])
    vals = data[lo:int(offs[-1])].astype(np.int32)
    la = pa.ListArray.from_arrays(
        pa.array((offs - lo).astype(np.int32)), pa.array(vals)
    )
    return pa.table({"toks": la})


def _list_view(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat int32 values, zero-based int64 offsets) of a list<int32>
    column; robust to sliced arrays (offsets re-based to the returned
    values slice)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.asarray(arr.offsets)[: len(arr) + 1].astype(np.int64)
    vals = np.asarray(arr.values)[offs[0]:offs[-1]]
    return vals, offs - offs[0]


def _pair_counts_block(t: pa.Table) -> pa.Table:
    """Distinct (packed adjacent pair, count) rows for a block."""
    empty = pa.table({
        "pair": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
    })
    if t.num_rows == 0:
        return empty
    vals, offs = _list_view(t["toks"])
    if len(vals) < 2:
        return empty
    a = vals[:-1].astype(np.int64)
    b = vals[1:].astype(np.int64)
    valid = np.ones(len(a), dtype=bool)
    # position i pairs vals[i] with vals[i+1]; i == doc_end-1 spans docs
    ends = offs[1:-1] - 1
    valid[ends[(ends >= 0) & (ends < len(a))]] = False
    # a freshly-started doc of length 0 contributes nothing already
    pairs = ((a << _BPE_ID_BITS) | b)[valid]
    if len(pairs) == 0:
        return empty
    u, cnt = np.unique(pairs, return_counts=True)
    return pa.table({"pair": pa.array(u), "n": pa.array(cnt.astype(np.int64))})


def _apply_merge_block(t: pa.Table, a: int, b: int, new_id: int) -> pa.Table:
    """Leftmost-greedy application of one merge (a, b) -> new_id."""
    if t.num_rows == 0:
        return t
    vals, offs = _list_view(t["toks"])
    vals = vals.astype(np.int32, copy=True)
    if len(vals) < 2:
        return t
    m = (vals[:-1] == a) & (vals[1:] == b)
    ends = offs[1:-1] - 1
    m[ends[(ends >= 0) & (ends < len(m))]] = False
    p = np.flatnonzero(m)
    if a == b and len(p) > 1:
        # overlapping runs ("aaa"): greedy keeps alternate matches
        new_run = np.ones(len(p), dtype=bool)
        new_run[1:] = np.diff(p) != 1
        run_id = np.cumsum(new_run) - 1
        first_of_run = p[new_run][run_id]
        p = p[((p - first_of_run) % 2) == 0]
    if len(p) == 0:
        return t
    vals[p] = new_id
    keep_mask = np.ones(len(vals), dtype=bool)
    keep_mask[p + 1] = False
    new_vals = vals[keep_mask]
    removed_before = np.searchsorted(p + 1, offs, side="left")
    new_offs = offs - removed_before
    la = pa.ListArray.from_arrays(
        pa.array((new_offs - new_offs[0]).astype(np.int32)),
        pa.array(new_vals),
    )
    return pa.table({"toks": la})


def bpe_train(
    ds: ray.data.Dataset,
    n_merges: int,
    text_col: str = "text",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> pa.Table:
    """Distributed byte-level BPE merge training (Sennrich et al. 2016).

    The corpus lives as a list<int32> token dataset; each round is

    1. one map pass emitting per-block DISTINCT (adjacent-pair, count)
       partials (the exchange carries block vocabularies of pairs,
       never token streams),
    2. one narrow keyed exchange where co-located pair counts sum and
       each reduce block emits its single best candidate (argmax is
       distributive: max count, ties to the smallest packed pair id ==
       lexicographic (a, b)), the driver comparing only
       #partitions rows,
    3. one incremental map pass applying JUST the new merge
       (leftmost-greedy, vectorized; equal-token runs merge at
       alternate positions) and rematerializing the token dataset.

    Returns (step, tok_a, tok_b, new_id, pair_count).  Token ids must
    stay under 2^21 (= 2M merges) for the packed pair key.  Verified
    against an independent row-at-a-time Python twin via a committed
    fixture (iterative state makes the loop non-SQL-expressible).

    ``checkpoint_dir`` makes the loop RESUMABLE (the runner's
    lineage pattern applied to iterative state): every
    ``checkpoint_every`` merges the tokenized corpus is written to
    ``<dir>/toks-step<k>/`` and ``state.json`` is replaced LAST
    (the atomic commit point), so a crash mid-training restarts from
    the latest completed checkpoint instead of step 0 — a later call
    with a larger ``n_merges`` continues where the last one stopped.
    The caller must pass the SAME corpus; the state file records the
    merges, whose replay on a different corpus would diverge loudly in
    the verified outputs.
    """
    import json
    import shutil

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    width = auto_partitions(ds, num_partitions)

    state_path = (
        os.path.join(checkpoint_dir, "state.json") if checkpoint_dir
        else None
    )
    merges: list[tuple[int, int, int, int, int]] = []
    toks = None
    if state_path and os.path.exists(state_path):
        with open(state_path) as f:
            st = json.load(f)
        if st.get("version") != 1:
            raise ValueError(f"unknown bpe checkpoint version in {state_path}")
        # a checkpoint may hold MORE steps than this call asks for:
        # training is a deterministic prefix, so truncation is exact
        merges = [tuple(m) for m in st["merges"]][:n_merges]
        toks = ray.data.read_parquet(st["toks_path"]).materialize()
    if toks is None:
        toks = ds.select_columns([text_col]).map_batches(
            lambda t: _bpe_tokenize_block(t, text_col),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()

    def checkpoint(step: int, toks_ds) -> None:
        if not checkpoint_dir:
            return
        os.makedirs(checkpoint_dir, exist_ok=True)
        toks_path = os.path.join(checkpoint_dir, f"toks-step{step}")
        shutil.rmtree(toks_path, ignore_errors=True)
        toks_ds.write_parquet(toks_path)
        tmp = f"{state_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"version": 1, "step": step,
                       "toks_path": toks_path, "merges": merges}, f)
        os.replace(tmp, state_path)  # state commits AFTER the data
        for old in os.listdir(checkpoint_dir):
            if old.startswith("toks-step") and old != f"toks-step{step}":
                shutil.rmtree(os.path.join(checkpoint_dir, old),
                              ignore_errors=True)

    def best_block(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "pair": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        pairs = t["pair"].to_numpy(zero_copy_only=False)
        ns = t["n"].to_numpy(zero_copy_only=False)
        u, codes = np.unique(pairs, return_inverse=True)
        tot = np.bincount(codes, weights=ns.astype(np.float64)).astype(np.int64)
        j = np.lexsort((u, -tot))[0]
        return pa.table({
            "pair": pa.array([int(u[j])], pa.int64()),
            "n": pa.array([int(tot[j])], pa.int64()),
        })

    for step in range(len(merges), n_merges):
        cands = toks.map_batches(
            _pair_counts_block, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ).repartition(num_blocks=width, keys=["pair"]).map_batches(
            best_block, batch_format="pyarrow", batch_size=None,
        ).take_all()
        if not cands:
            break
        best = max(cands, key=lambda r: (r["n"], -r["pair"]))
        if best["n"] < 2:
            break
        pair, cnt = int(best["pair"]), int(best["n"])
        a, b = pair >> _BPE_ID_BITS, pair & ((1 << _BPE_ID_BITS) - 1)
        new_id = 256 + step
        merges.append((step, a, b, new_id, cnt))
        toks = toks.map_batches(
            lambda t, a=a, b=b, ni=new_id: _apply_merge_block(t, a, b, ni),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        ).materialize()
        if (step + 1) % checkpoint_every == 0 or step + 1 == n_merges:
            checkpoint(step + 1, toks)
    return pa.table({
        "step": pa.array([m[0] for m in merges], pa.int64()),
        "tok_a": pa.array([m[1] for m in merges], pa.int64()),
        "tok_b": pa.array([m[2] for m in merges], pa.int64()),
        "new_id": pa.array([m[3] for m in merges], pa.int64()),
        "pair_count": pa.array([m[4] for m in merges], pa.int64()),
    })


def bpe_train_sampled(
    ds: ray.data.Dataset,
    n_merges: int,
    sample_k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    hash_a: int = 6364136223846793005,
    hash_b: int = 1442695040888963407,
) -> pa.Table:
    """BPE merge training on a DETERMINISTIC bottom-k-by-hash sample —
    the production composition for realistic merge counts.

    :func:`bpe_train` is exact but rematerializes the full corpus once
    per merge: at 32k merges x 100 TB that is 32k full passes (VERDICT
    r03 "what's wrong" #3).  Real tokenizer training never needs the
    full corpus — merge statistics converge on a bounded sample — so
    this wrapper trains on the ``sample_k`` documents with the smallest
    keyed hash (:func:`~luzzu_ray.ops.relational.bottom_k_by_hash`:
    reproducible across cluster sizes, block layouts and reruns, unlike
    an RNG reservoir) and returns the same (step, tok_a, tok_b, new_id,
    pair_count) merge table.

    Pass-count bound: ONE pass over the full corpus (the bottom-k
    partials) + ``n_merges`` passes over ``sample_k`` rows — full-corpus
    work is O(1) passes instead of O(n_merges).  Encoding with the
    learned merges (:func:`bpe_encode_counts`) is unchanged and remains
    a single full-corpus pass.  Checkpointing/resume semantics are
    inherited from :func:`bpe_train` (the sample is deterministic, so a
    resumed run re-draws the identical sample).

    Verified against the pure-Python twin (``bpe_train_py``) over the
    same hash-sample via a committed fixture (see
    ``tools/make_fixtures.py``).
    """
    from luzzu_ray.ops.relational import bottom_k_by_hash

    sample = bottom_k_by_hash(
        ds, id_col, sample_k, [text_col], hash_a, hash_b
    )
    return bpe_train(
        ray.data.from_arrow(sample.select([text_col])),
        n_merges,
        text_col=text_col,
        num_partitions=num_partitions,
        checkpoint_dir=checkpoint_dir,
    )


def bpe_train_py(texts: list[str | None], n_merges: int) -> list[tuple]:
    """Row-at-a-time BPE twin: independent control flow (explicit python
    scan with leftmost-greedy merging) for fixture generation."""
    docs = [list((t or "").encode("utf-8")) for t in texts]
    out = []
    for step in range(n_merges):
        counts: dict = {}
        for d in docs:
            for i in range(len(d) - 1):
                k = (d[i], d[i + 1])
                counts[k] = counts.get(k, 0) + 1
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], (-kv[0][0], -kv[0][1])))
        (a, b), cnt = best
        if cnt < 2:
            break
        new_id = 256 + step
        out.append((step, a, b, new_id, cnt))
        for di, d in enumerate(docs):
            nd = []
            i = 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    nd.append(new_id)
                    i += 2
                else:
                    nd.append(d[i])
                    i += 1
            docs[di] = nd
    return out


def bigram_surprisal(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    scale: int = 10**9,
    carry_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Distributed bigram-LM training + per-document scoring with an
    EXACT integer score — the document-table twin of the transcript
    perplexity stage, SQL-verifiable because no logarithm is involved:
    each adjacent pair (a, b) contributes
    ``floor(scale * c(a,b) / c(a,·))`` (its conditional probability as
    a fixed-point integer), and the per-doc int64 sum is the score.
    Higher = more predictable text (the monotone complement of
    perplexity for fixed length).

    Phase 1 (train): per-block (w1, w2, n) partials (the token stream
    collapses before the exchange), one keyed combine, then the count
    table collects to the driver and broadcasts via ``ray.put`` —
    BROADCAST ASSUMPTION: the distinct-bigram table fits a worker
    (Zipf; beyond memory, hash-join the pairs instead, as tf-idf
    documents).

    Phase 2 (score): exchange-free map — per batch, one Arrow
    ``index_in`` of the batch's DISTINCT words against the broadcast
    vocabulary, packed-key searchsorted for pair counts, one bincount
    per batch for the doc sums.  Docs with no bigram (<= 1 token) are
    omitted, matching the SQL GROUP BY over pair terms.  Bigrams
    absent from the table (only possible when scoring text the model
    was not trained on) contribute 0.

    ``carry_cols`` ride along row-wise through the exchange-free score
    map (zero extra shuffle — the co-resident batch already holds
    them), so per-doc grouping attributes (language, source) reach the
    scored output without a join.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    carry = list(carry_cols or [])
    parts = ds.select_columns([text_col]).map_batches(
        lambda t: _bigram_partial(t, text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        g = t.group_by(["w1", "w2"]).aggregate([("n", "sum")])
        return g.rename_columns(["w1", "w2", "n"])

    counts = parts.repartition(
        num_blocks=auto_partitions(parts, num_partitions),
        keys=["w1", "w2"],
    ).map_batches(combine, batch_format="pyarrow", batch_size=None)
    nonempty = [t for t in ray.get(list(counts.to_arrow_refs()))
                if t.num_rows]
    if not nonempty:
        # corpus contains no bigram at all (every doc <= 1 token):
        # every doc is omitted per the contract below
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        cols = {
            id_col: pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "score_q9": pa.array([], pa.int64()),
        }
        for c in carry:
            cols[c] = pa.array([], types[c])
        return ray.data.from_arrow(pa.table(cols))
    ct = pa.concat_tables(nonempty).combine_chunks()

    w1 = ct["w1"].combine_chunks()
    w2 = ct["w2"].combine_chunks()
    n = ct["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = pc.unique(pa.concat_arrays([w1, w2]))
    v = len(vocab)
    c1 = pc.index_in(w1, value_set=vocab).to_numpy(zero_copy_only=False)
    c2 = pc.index_in(w2, value_set=vocab).to_numpy(zero_copy_only=False)
    packed = c1.astype(np.int64) * v + c2.astype(np.int64)
    order = np.argsort(packed)
    packed, cb = packed[order], n[order]
    cp = np.bincount(c1.astype(np.int64), weights=n.astype(np.float64),
                     minlength=v).astype(np.int64)
    model_ref = ray.put((vocab, packed, cb, cp))

    def score(t: pa.Table) -> pa.Table:
        cols = {
            id_col: pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "score_q9": pa.array([], pa.int64()),
        }
        for c in carry:
            cols[c] = t[c].slice(0, 0).combine_chunks()
        empty = pa.table(cols)
        if t.num_rows == 0:
            return empty
        voc, pk, cbn, cpn = (
            ray.get(model_ref)
            if isinstance(model_ref, ray.ObjectRef) else model_ref
        )
        words = pc.split_pattern(
            pc.fill_null(t[text_col], ""), " ").combine_chunks()
        flat = words.flatten()
        offs = words.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        if len(flat) == 0:
            return empty
        enc = pc.dictionary_encode(flat)
        bcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bvocab = enc.dictionary
        vmap_pa = pc.index_in(bvocab, value_set=voc)
        vmap = np.asarray(vmap_pa.fill_null(-1).to_numpy(
            zero_copy_only=False)).astype(np.int64)
        codes = vmap[bcodes]
        mask = np.ones(len(flat), dtype=bool)
        has_tok = offs[1:] > offs[:-1]
        mask[offs[1:][has_tok] - 1] = False
        idx = np.flatnonzero(mask)
        rowid = np.repeat(
            np.arange(t.num_rows, dtype=np.int64), offs[1:] - offs[:-1]
        )[idx]
        a, b = codes[idx], codes[idx + 1]
        known = (a >= 0) & (b >= 0)
        key = a * len(voc) + b
        pos = np.searchsorted(pk, key)
        posc = np.minimum(pos, max(len(pk) - 1, 0))
        found = known & (pos < len(pk)) & (pk[posc] == key)
        term = np.zeros(len(idx), dtype=np.int64)
        fa = a[found]
        term[found] = (scale * cbn[posc[found]]) // cpn[fa]
        nb = np.bincount(rowid, minlength=t.num_rows)
        # unbuffered int64 scatter-add: exact for any doc length
        sq = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(sq, rowid, term)
        keep = nb > 0
        ids = t[id_col].to_numpy(zero_copy_only=False)[keep]
        out = {
            id_col: pa.array(ids),
            "n_bigrams": pa.array(nb[keep].astype(np.int64)),
            "score_q9": pa.array(sq[keep]),
        }
        keep_pa = pa.array(keep)
        for c in carry:
            out[c] = t[c].filter(keep_pa).combine_chunks()
        return pa.table(out)

    return ds.select_columns([id_col, text_col] + carry).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True,
    )


def ccnet_ppl_buckets(
    ds: ray.data.Dataset,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    frac_head: float = 0.2,
    frac_middle: float = 0.3,
) -> ray.data.Dataset:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.,
    LREC 2020): score every document with the distributed bigram LM,
    then split each language's documents into ``head`` (the most
    LM-predictable ``frac_head`` fraction — lowest perplexity),
    ``middle`` (next ``frac_middle``) and ``tail`` (the rest) by exact
    per-group discrete quantile cutoffs of the length-normalized score.

    All integer end to end, so DuckDB replays it bit-for-bit: the
    per-doc score is ``score_q9 // n_bigrams`` (higher = more
    predictable, the monotone complement of perplexity at fixed
    length), cutoffs are ``quantile_disc`` order statistics at
    ``1 - frac_head`` and ``1 - frac_head - frac_middle``, and the
    bucket rule is ``avg >= cut``.  Docs with no bigram (<= 1 token)
    are omitted, matching the LM contract.

    Scale shape: one corpus scan (train partials + exchange-free score
    with ``group_col`` carried row-wise — no join), the scored NARROW
    3-column table materialized once so cutoffs and assignment reuse
    it (object store spills; the alternative is a second full text
    scan), one group-keyed exchange for the cutoffs (#groups rows
    out), cutoff table broadcast into a map-side CASE.  Languages are
    hot keys: at 10^12 docs per group the exact-quantile co-location
    assumption breaks — swap the cutoff stage for
    ``luzzu_ray.ops.sketch.approx_quantiles`` (mergeable, bounded
    memory) and keep everything else unchanged.
    """
    from luzzu_ray.ops.relational import grouped_quantiles_q

    cut_head = 1.0 - frac_head
    cut_mid = 1.0 - frac_head - frac_middle

    scored = bigram_surprisal(
        ds, id_col=id_col, text_col=text_col, carry_cols=[group_col])

    def add_avg(t: pa.Table) -> pa.Table:
        sq = t["score_q9"].to_numpy(zero_copy_only=False)
        nb = t["n_bigrams"].to_numpy(zero_copy_only=False)
        avg = sq // np.maximum(nb, 1)  # nb >= 1 by the LM contract
        return pa.table({
            id_col: t[id_col],
            group_col: t[group_col],
            "avg_q9": pa.array(avg.astype(np.int64)),
        })

    avgd = scored.map_batches(
        add_avg, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    cuts = grouped_quantiles_q(
        avgd, key=group_col, value_col="avg_q9",
        quantiles={"cut_head": cut_head, "cut_mid": cut_mid}, q=0,
    ).take_all()  # bounded by #distinct groups (languages)
    groups = [r[group_col] for r in cuts]
    ch = np.array([r["cut_head_q0"] for r in cuts], dtype=np.int64)
    cm = np.array([r["cut_mid_q0"] for r in cuts], dtype=np.int64)
    gset = pa.array(groups, pa.string())

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("bucket", pa.array([], pa.string()))
        # every group present here fed the cutoff table, so no null idx
        idx = pc.index_in(t[group_col], value_set=gset).to_numpy(
            zero_copy_only=False).astype(np.int64)
        avg = t["avg_q9"].to_numpy(zero_copy_only=False)
        bucket = np.where(
            avg >= ch[idx], "head",
            np.where(avg >= cm[idx], "middle", "tail"))
        return t.append_column("bucket", pa.array(bucket))

    return avgd.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)


def term_positions(
    ds: ray.data.Dataset,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Positional postings for a fixed term set: (word, doc_id, pos)
    rows, pos = 0-based token position — the phrase-query /
    proximity-scoring extension of the inverted index.  Exchange-free:
    one Arrow split + one ``index_in`` of the flattened tokens against
    the term list per batch; emitted rows are bounded by term
    occurrences, not tokens."""
    term_arr = pa.array(terms, pa.string())

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "word": pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        words = pc.split_pattern(
            pc.fill_null(t[text_col], ""), " ").combine_chunks()
        flat = words.flatten()
        if len(flat) == 0:
            return empty
        offs = words.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        code = pc.index_in(flat, value_set=term_arr)
        hit = np.asarray(
            code.is_valid().to_numpy(zero_copy_only=False)).astype(bool)
        if not hit.any():
            return empty
        lens = offs[1:] - offs[:-1]
        rowid = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        pos_in_doc = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1], lens)
        idx = np.flatnonzero(hit)
        codes = np.asarray(code.fill_null(0).to_numpy(
            zero_copy_only=False)).astype(np.int64)[idx]
        ids = t[id_col].to_numpy(zero_copy_only=False)[rowid[idx]]
        return pa.table({
            "word": term_arr.take(pa.array(codes)),
            id_col: pa.array(ids),
            "pos": pa.array(pos_in_doc[idx]),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True,
    )


def bpe_encode_counts(
    ds: ray.data.Dataset,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Train byte-level BPE on the corpus, then ENCODE every document
    with the learned merges — the tokenizer apply step that pairs with
    ``bpe_train``.  Output: (id, n_bytes, n_tokens) where n_tokens is
    the post-merge sequence length (the compression a tokenizer buys).

    Encoding is exchange-free: the tiny ordered merge list rides the
    task closure; each batch tokenizes to bytes and applies the merges
    in training order with the same vectorized leftmost-greedy kernel
    the trainer uses.  Verified against a committed fixture from the
    independent row-at-a-time twin (training + encoding both
    re-derived in pure Python)."""
    merges = bpe_train(ds, n_merges, text_col=text_col,
                       num_partitions=num_partitions)
    mlist = list(zip(merges["tok_a"].to_pylist(),
                     merges["tok_b"].to_pylist(),
                     merges["new_id"].to_pylist()))

    def enc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_bytes": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            })
        toks = _bpe_tokenize_block(t, text_col)
        _, offs0 = _list_view(toks["toks"])
        n_bytes = offs0[1:] - offs0[:-1]
        for a, b, ni in mlist:
            toks = _apply_merge_block(toks, a, b, ni)
        _, offs1 = _list_view(toks["toks"])
        return pa.table({
            id_col: t[id_col],
            "n_bytes": pa.array(n_bytes.astype(np.int64)),
            "n_tokens": pa.array((offs1[1:] - offs1[:-1]).astype(np.int64)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True,
    )


def bpe_encode_py(texts: list, n_merges: int) -> list[tuple[int, int]]:
    """Row-at-a-time twin of :func:`bpe_encode_counts`: trains with
    ``bpe_train_py`` and encodes each doc with an explicit scan."""
    merges = bpe_train_py(texts, n_merges)
    out = []
    for tx in texts:
        d = list((tx or "").encode("utf-8"))
        nb = len(d)
        for _, a, b, ni, _ in merges:
            nd = []
            i = 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    nd.append(ni)
                    i += 2
                else:
                    nd.append(d[i])
                    i += 1
            d = nd
        out.append((nb, len(d)))
    return out


# ---------------------------------------------------------------------------
# DSIR-style hashed-ngram importance weighting
# ---------------------------------------------------------------------------

DSIR_BASE = np.uint64(1099511628211)  # FNV-ish, SQL-foldable multiplier
DSIR_MOD = 1 << 64


def _dsir_bucket_block(
    texts: pa.ChunkedArray, n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """(bucket per token, row_id per token) for one batch.

    Token = single-space split (SQL ``string_split`` convention: empty
    text yields one empty token).  Bucket = polynomial byte hash
    ``h = fold(h * BASE + byte) mod 2^64``, then ``h % n_buckets`` —
    the fold is SQL-expressible (DuckDB ``reduce`` over the token's
    chars with HUGEINT arithmetic), so the oracle rebuilds the exact
    bucket ids with no committed fixture.  Arbitrary token lengths
    supported (the power table extends on demand — the classifier's
    256-byte cap bug class, avoided by construction).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    split = pc.split_pattern(pc.fill_null(texts, ""), " ")
    flat = pc.list_flatten(split)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n_rows = len(texts)
    per_row = pc.list_value_length(split).to_numpy(zero_copy_only=False)
    rid = np.repeat(np.arange(n_rows, dtype=np.int64), per_row)
    if len(flat) == 0:
        return np.zeros(0, dtype=np.int64), rid
    buf = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
        flat.offset: flat.offset + len(flat) + 1]
    starts = offs[:-1].astype(np.int64)
    ends = offs[1:].astype(np.int64)
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.zeros(len(flat), dtype=np.int64), rid
    max_len = int(lens.max())
    # powers of BASE mod 2^64, extended to this batch's longest token
    pows = np.empty(max_len, dtype=np.uint64)
    pows[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(1, max_len):
            pows[i] = pows[i - 1] * DSIR_BASE
        # byte positions: exponent = (token_end - 1 - byte_index)
        pos = np.arange(total, dtype=np.int64)
        tok_of_byte = np.repeat(np.arange(len(flat), dtype=np.int64), lens)
        rel = pos - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
        exp = np.repeat(lens, lens) - 1 - rel
        contrib = buf[np.repeat(starts, lens) + rel].astype(
            np.uint64) * pows[exp]
        h = np.zeros(len(flat), dtype=np.uint64)
        nz = lens > 0
        seg_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[nz]
        h[nz] = np.add.reduceat(contrib, seg_starts)
    return (h % np.uint64(n_buckets)).astype(np.int64), rid


def dsir_importance(
    ds: ray.data.Dataset,
    target_source: str,
    n_buckets: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> ray.data.Dataset:
    """DSIR-style data selection with importance resampling (Xie et
    al. 2023, arXiv:2302.03169): score every document by how much its
    hashed-token profile looks like a TARGET domain (the rows whose
    ``source_col`` equals ``target_source``) relative to the raw
    corpus.  Returns (doc_id, n_tokens, dsir_score) — rank/threshold
    on the score to select target-like pretraining data.

    The paper scores log p_target(x)/p_raw(x) under hashed n-gram
    bag models; this engine keeps the architecture (hashed features,
    two narrow passes, bounded broadcast) but replaces the per-token
    LOG ratio with the add-one-smoothed likelihood RATIO quantized to
    1e-6 — ``w[b] = floor(1e6 * (t_b+1)(R+B) / ((r_b+1)(T+B)))`` —
    summed over tokens.  All-integer, so the DuckDB oracle rebuilds
    the identical weights (the bucket hash itself is a SQL-foldable
    polynomial — see :func:`_dsir_bucket_block`) with zero float
    slack.

    Scale shape: pass 1 reduces per-block bucket bincounts through one
    ``n_buckets``-row-bounded keyed exchange and pulls exactly
    ``n_buckets`` rows to the driver (a CONSTANT, not data-sized — cf.
    the tf-idf top-V cap); the weight table broadcasts once via
    ``ray.put``; pass 2 is a stateless scoring map."""
    import ray

    from luzzu_ray.ops.relational import grouped_sum_q

    def count_partial(t: pa.Table) -> pa.Table:
        b, rid = _dsir_bucket_block(
            t[text_col].combine_chunks()
            if isinstance(t[text_col], pa.ChunkedArray) else t[text_col],
            n_buckets,
        )
        is_tgt = pc.equal(
            pc.fill_null(t[source_col], ""), target_source
        ).to_numpy(zero_copy_only=False).astype(bool)
        rc = np.bincount(b, minlength=n_buckets)
        tc = np.bincount(b[is_tgt[rid]], minlength=n_buckets)
        nz = (rc > 0) | (tc > 0)
        return pa.table({
            "b": pa.array(np.flatnonzero(nz).astype(np.int64)),
            "tc": pa.array(tc[nz].astype(np.int64)),
            "rc": pa.array(rc[nz].astype(np.int64)),
        })

    counts = grouped_sum_q(
        ds.select_columns([text_col, source_col]).map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["b"], float_cols={}, int_cols={"tc": "tc", "rc": "rc"},
        num_partitions=2,
    ).take_all()  # bounded: <= n_buckets rows by construction
    tcv = np.zeros(n_buckets, dtype=object)
    rcv = np.zeros(n_buckets, dtype=object)
    for r in counts:
        tcv[r["b"]] = int(r["tc"])
        rcv[r["b"]] = int(r["rc"])
    T = int(sum(tcv))
    R = int(sum(rcv))
    # exact integer weights (Python ints — no intermediate overflow)
    w = np.array(
        [int(1_000_000 * (int(tcv[b]) + 1) * (R + n_buckets)
             // ((int(rcv[b]) + 1) * (T + n_buckets)))
         for b in range(n_buckets)],
        dtype=np.int64,
    )
    w_ref = ray.put(w)

    def score_block(t: pa.Table) -> pa.Table:
        wt = ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef) else w_ref
        col = t[text_col]
        b, rid = _dsir_bucket_block(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col, n_buckets,
        )
        n = t.num_rows
        ntok = np.bincount(rid, minlength=n).astype(np.int64)
        score = np.zeros(n, dtype=np.int64)
        if len(b):
            np.add.at(score, rid, wt[b])
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(ntok),
            "dsir_score": pa.array(score),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score_block, batch_format="pyarrow", zero_copy_batch=True)


def context_examples(
    chunks: ray.data.Dataset,
    window_turns: int,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    text_col: str = "chunk_text",
    sep: str = " | ",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Training-example construction (SFT context building): for each
    turn/chunk, the concatenation of up to ``window_turns`` PRECEDING
    turns of the same conversation becomes ``context_text`` and the
    turn itself ``target_text`` — the preprocessing step that turns a
    flat turn table into next-turn-prediction examples.

    One keyed exchange co-locates each conversation; per block, rows
    sort by (id, idx) once and contexts build from ``window_turns``
    vectorized shifted takes.  Within a sorted group the prev-validity
    masks are NESTED (a valid prev at distance w implies one at w-1),
    so each row's context is exactly the join of its last v valid
    parts — selected from the w candidate emit-null joins with w
    ``if_else`` kernels (pyarrow 16.1's ``null_handling='skip'``
    DROPS all-null rows instead of emitting "", so it cannot be used
    element-wise).  No per-row Python, no per-group loop.  A turn with
    an empty frame (the conversation opener) gets a NULL context,
    matching SQL ``string_agg OVER (ROWS BETWEEN w PRECEDING AND
    1 PRECEDING)``.

    Skew note: one conversation lands in one reduce block; the repo's
    salting protocol applies if a single conversation outgrows a block
    (same contract as conversation reassembly).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    # chunking upstream is row-expanding: metadata row counts would
    # under-size the exchange
    width = auto_partitions(chunks, num_partitions, expanding=True)

    def block(t: pa.Table) -> pa.Table:
        t = t.sort_by([(id_col, "ascending"), (idx_col, "ascending")])
        n = t.num_rows
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        txt = t[text_col].combine_chunks()
        pos = np.arange(n, dtype=np.int64)
        parts, valids = [], []
        for w in range(window_turns, 0, -1):  # oldest turn first
            valid = np.zeros(n, dtype=bool)
            if n > w:
                valid[w:] = ids[w:] == ids[:-w]
            shifted = txt.take(pa.array(np.maximum(pos - w, 0)))
            parts.append(pc.if_else(pa.array(valid), shifted,
                                    pa.nulls(n, pa.string())))
            valids.append(valid)
        n_prev = (np.sum(valids, axis=0) if valids
                  else np.zeros(n, dtype=np.int64))
        ctx = pa.nulls(n, pa.string())
        for v in range(1, window_turns + 1):
            tail = parts[window_turns - v:]
            jv = tail[0] if v == 1 else pc.binary_join_element_wise(
                *tail, sep, null_handling="emit_null")
            ctx = pc.if_else(pa.array(n_prev == v), jv, ctx)
        return pa.table({
            id_col: t[id_col],
            idx_col: t[idx_col],
            "target_text": txt,
            "context_text": ctx,
        })

    return chunks.repartition(
        num_blocks=width, keys=[id_col]
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


def vocab_coverage(
    ds: ray.data.Dataset,
    v: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document coverage of the corpus top-V vocabulary —
    (id, n_tokens, n_oov) — the tokenizer-coverage / OOV-rate
    diagnostic run before committing to a vocab size.

    The vocabulary comes from the word_stats_topv combine (narrow
    per-block partials, one hash groupby, top-V sort); the resulting
    word set is BOUNDED BY V by construction, so pulling it to the
    driver and re-broadcasting via ray.put is a capped transfer (the
    same contract as the tf-idf top-V cap), and the coverage pass
    itself is exchange-free: one split + one is_in + one reduceat per
    batch."""

    vocab_rows = word_stats_topv(ds, v, text_col).take_all()  # <= v rows
    vocab_arr = pa.array([r["word"] for r in vocab_rows], pa.string())
    ref = ray.put(vocab_arr)

    class Cover:
        def __init__(self, vocab_ref):
            self.vocab = (ray.get(vocab_ref)
                          if not isinstance(vocab_ref, pa.Array)
                          else vocab_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            words = pc.split_pattern(t[text_col], " ").combine_chunks()
            offs = words.offsets.to_numpy().astype(np.int64)
            flat = words.flatten()
            n_tok = offs[1:] - offs[:-1]
            if len(flat):
                oov = pc.invert(
                    pc.is_in(flat, value_set=self.vocab)
                ).to_numpy(zero_copy_only=False).astype(np.int64)
                starts = offs[:-1] - offs[0]
                n_oov = np.add.reduceat(oov, starts, dtype=np.int64)
                n_oov[n_tok == 0] = 0
            else:
                n_oov = np.zeros(n, dtype=np.int64)
            return pa.table({
                id_col: t[id_col],
                "n_tokens": pa.array(n_tok.astype(np.int64)),
                "n_oov": pa.array(n_oov),
            })

    from luzzu_ray.ops.common import pool

    return ds.select_columns([id_col, text_col]).map_batches(
        lambda t: t.filter(pc.is_valid(t[text_col])),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(
        Cover, fn_constructor_args=(ref,),
        batch_format="pyarrow", concurrency=pool(),
    )


def source_divergence(
    ds: ray.data.Dataset,
    v: int,
    text_col: str = "text",
    source_col: str = "source",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Domain-shift diagnostic: per-source chi-square divergence of the
    word distribution vs the whole corpus, over the top-V vocabulary —
    "which sources look least like the mixture" (the statistic behind
    importance-resampling / mixture-debugging decisions).

    All-integer definition so a HUGEINT SQL twin matches bit-for-bit
    (no libm, no float summation): with c_s = source count of word w,
    n_s = source total over V, c_t / n_t the corpus analogues,

        chi2_q6 = sum over ALL V words of
                  ((c_s*n_t - n_s*c_t)^2 * 10^6) // (n_s * c_t * n_t)

    (floor per term; zero-count words included — they contribute the
    expected-mass term).  Sources with no in-vocab token emit no row
    (they have no distribution to compare).

    Scale shape: the V-row vocabulary broadcasts once (ray.put); per
    block one split + index_in + bincount produces (source, widx, c)
    partials bounded by sources_in_block x V; one exchange on source;
    the final per-source loop is O(V) Python-int ops (V is the SPEC
    constant, not data-dependent).  Output: (source, n_tokens,
    chi2_q6)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    vocab_rows = word_stats_topv(ds, v, text_col=text_col).take_all()
    if not vocab_rows:  # empty corpus: no distribution to compare
        return ray.data.from_arrow(
            pa.table(
                {source_col: pa.array([], pa.string()),
                 "n_tokens": pa.array([], pa.int64()),
                 "chi2_q6": pa.array([], pa.int64())}
            )
        )
    vocab_tbl = pa.Table.from_pylist(vocab_rows)
    words = vocab_tbl["word"].to_pylist()
    ct = np.asarray(vocab_tbl["tf"].to_pylist(), dtype=np.int64)
    n_t = int(ct.sum())
    vset = pa.array(words, pa.string())
    ref = ray.put({"vset": vset, "nwords": len(words)})

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {source_col: pa.array([], pa.string()),
             "widx": pa.array([], pa.int64()),
             "c": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        side = ray.get(ref)
        toks = pc.split_pattern(t[text_col], " ").combine_chunks()
        flat = toks.flatten()
        per_row = (toks.offsets.to_numpy()[1:]
                   - toks.offsets.to_numpy()[:-1]).astype(np.int64)
        widx = pc.index_in(flat, value_set=side["vset"])
        wnp = widx.to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(wnp)
        if not ok.any():
            return empty
        wv = wnp[ok].astype(np.int64)
        senc = pc.dictionary_encode(t[source_col].combine_chunks())
        sidx = np.repeat(
            senc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            per_row,
        )[ok]
        nv = side["nwords"]
        code = sidx * nv + wv
        u, cnt = np.unique(code, return_counts=True)
        return pa.table(
            {source_col: pc.take(senc.dictionary, pa.array(u // nv)),
             "widx": pa.array((u % nv).astype(np.int64)),
             "c": pa.array(cnt.astype(np.int64))}
        )

    parts = ds.select_columns([source_col, text_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    nv = len(words)
    ct_list = [int(x) for x in ct]

    def final(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {source_col: pa.array([], pa.string()),
             "n_tokens": pa.array([], pa.int64()),
             "chi2_q6": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        senc = pc.dictionary_encode(t[source_col].combine_chunks())
        si = senc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        wi = t["widx"].to_numpy(zero_copy_only=False)
        cc = t["c"].to_numpy(zero_copy_only=False)
        n_src = len(senc.dictionary)
        grid = np.zeros((n_src, nv), dtype=np.int64)
        np.add.at(grid, (si, wi), cc)
        n_s = grid.sum(axis=1)
        chi = []
        for s in range(n_src):
            ns = int(n_s[s])
            acc = 0
            row = grid[s]
            for w in range(nv):
                d = int(row[w]) * n_t - ns * ct_list[w]
                acc += (d * d * 1_000_000) // (ns * ct_list[w] * n_t)
            if acc >= 2**63:
                raise ValueError(
                    "source_divergence: chi2_q6 exceeds int64 "
                    f"({acc}); rescale the quantization"
                )
            chi.append(acc)
        return pa.table(
            {source_col: senc.dictionary,
             "n_tokens": pa.array(n_s),
             "chi2_q6": pa.array(np.array(chi, dtype=np.int64))}
        )

    return parts.repartition(
        num_blocks=auto_partitions(parts, None), keys=[source_col]
    ).map_batches(final, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# pairwise source vocabulary overlap (corpus-mix / contamination diagnostic)
# ---------------------------------------------------------------------------

def source_vocab_overlap(
    ds: ray.data.Dataset,
    text_col: str = "text",
    source_col: str = "source",
    num_partitions: int | None = None,
) -> pa.Table:
    """Pairwise Jaccard overlap between the DISTINCT word vocabularies
    of every source pair — the corpus-mix / cross-source-contamination
    diagnostic ("how much does source A's vocabulary look like B's?").

    Output: one row per unordered source pair (source_a < source_b)
    with exact integers (n_a, n_b, n_common, n_union) and
    ``jaccard_q6 = n_common * 1e6 // n_union``.

    Scale shape (100 TB posture):
    - sources are discovered first (a narrow distinct pass; the list is
      tiny — dozens of corpus components) and assigned BITS, capped at
      62 so a per-word presence set is one int64 bitmask;
    - the exchange carries one (word, mask) row per distinct word per
      block — bounded by block vocabulary, never the token stream
      (the ``word_stats_topv`` discipline);
    - after the word-keyed OR-combine, masks EXPAND DISTRIBUTED into
      (bit_i, bit_j) pair partials (<= s^2 rows per block) and reduce
      by a narrow groupby — the driver only ever holds the s*(s+1)/2
      final pair rows, never a mask histogram (which could approach
      2^s distinct subsets on a many-source corpus).
    """
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    sources = sorted(
        s for s in ds.select_columns([source_col]).unique(source_col)
        if s is not None
    )
    if len(sources) > 62:
        raise ValueError(
            f"source_vocab_overlap supports <= 62 sources (int64 "
            f"bitmask), got {len(sources)}"
        )
    bit_of = {s: i for i, s in enumerate(sources)}

    def word_mask_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "mask": pa.array([], pa.int64())})
        enc_s = pc.dictionary_encode(t[source_col].combine_chunks())
        sbits = np.array(
            [bit_of.get(v, -1) for v in enc_s.dictionary.to_pylist()],
            dtype=np.int64,
        )
        row_bit = sbits[
            enc_s.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        filled = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        words = pc.split_pattern(filled, " ").combine_chunks()
        flat = words.flatten()
        offs = words.offsets.to_numpy().astype(np.int64)
        per_row = offs[1:] - offs[:-1]
        rid = np.repeat(np.arange(n, dtype=np.int64), per_row)
        enc_w = pc.dictionary_encode(flat)
        codes = enc_w.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok_bit = row_bit[rid]
        keep = tok_bit >= 0
        u = np.unique(codes[keep] * 64 + tok_bit[keep])
        acc = np.zeros(len(enc_w.dictionary), dtype=np.int64)
        np.bitwise_or.at(acc, u // 64, np.int64(1) << (u % 64))
        nz = np.flatnonzero(acc)
        return pa.table({
            "word": enc_w.dictionary.take(pa.array(nz)),
            "mask": pa.array(acc[nz]),
        })

    parts = ds.select_columns([source_col, text_col]).map_batches(
        word_mask_partial, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(t["word"].combine_chunks())
        codes = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        masks = t["mask"].to_numpy(zero_copy_only=False)
        acc = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.bitwise_or.at(acc, codes, masks)
        um, cnt = np.unique(acc, return_counts=True)
        ii, jj, nn = [], [], []
        for mask, c in zip(um, cnt):
            bits = np.flatnonzero(
                (mask >> np.arange(62, dtype=np.int64)) & 1)
            for a_i, a in enumerate(bits):
                ii.append(a); jj.append(a); nn.append(c)
                for b in bits[a_i + 1:]:
                    ii.append(a); jj.append(b); nn.append(c)
        return pa.table({"i": pa.array(ii, pa.int64()),
                         "j": pa.array(jj, pa.int64()),
                         "n": pa.array(nn, pa.int64())})

    pair_counts = parts.repartition(
        num_blocks=auto_partitions(parts, num_partitions), keys=["word"]
    ).map_batches(
        pair_partial, batch_format="pyarrow", batch_size=None
    ).groupby(["i", "j"], num_partitions=4).aggregate(Sum("n", alias_name="n")).take_all()

    n_of = {(r["i"], r["j"]): r["n"] for r in pair_counts}
    rows = []
    for a in range(len(sources)):
        for b in range(a + 1, len(sources)):
            n_a = n_of.get((a, a), 0)
            n_b = n_of.get((b, b), 0)
            n_common = n_of.get((a, b), 0)
            n_union = n_a + n_b - n_common
            rows.append({
                "source_a": sources[a], "source_b": sources[b],
                "n_a": n_a, "n_b": n_b, "n_common": n_common,
                "n_union": n_union,
                "jaccard_q6": (n_common * 1_000_000 // n_union
                               if n_union else 0),
            })
    return pa.table({
        "source_a": pa.array([r["source_a"] for r in rows], pa.string()),
        "source_b": pa.array([r["source_b"] for r in rows], pa.string()),
        "n_a": pa.array([r["n_a"] for r in rows], pa.int64()),
        "n_b": pa.array([r["n_b"] for r in rows], pa.int64()),
        "n_common": pa.array([r["n_common"] for r in rows], pa.int64()),
        "n_union": pa.array([r["n_union"] for r in rows], pa.int64()),
        "jaccard_q6": pa.array(
            [r["jaccard_q6"] for r in rows], pa.int64()),
    })


def sliding_chunk_stats(
    ds: ray.data.Dataset,
    window: int,
    stride: int,
    min_df: int = 2,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """RAG-chunk dedup signal: sliding-window chunk the corpus
    (:func:`chunk_documents` — the embed/RAG preprocessing step), then
    per document report ``n_chunks`` and ``n_shared`` = chunk
    instances whose TEXT occurs in >= ``min_df`` distinct documents —
    "how much of my RAG index is redundant, and which docs contribute
    it".  The chunk-granularity complement of whole-doc dedup: two
    docs sharing one section share its chunks even when their hashes
    and shingle profiles differ elsewhere.

    Scale shape: the chunk pass is row-expanding (~tokens/stride rows
    per doc), so the exchange width comes from the walked-input bound
    times the expansion; chunk identity crosses the exchange as the
    64-bit polynomial content key (``content_key_batch`` k1 — the SQL
    oracle groups by chunk STRING, so a collision surfaces as a hash
    mismatch, never silently); the df/merge tail is the shared
    ``chunk_df_stats_pipeline`` (one h-keyed + one doc-keyed
    exchange, nothing driver-side).
    """
    from luzzu_ray.ops.dedup import (
        auto_partitions,
        chunk_df_stats_pipeline,
        content_key_batch,
    )

    if num_partitions is None:
        num_partitions = auto_partitions(ds, None)
    chunks = chunk_documents(ds, window, stride)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "h": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
            "n_occ": pa.array([], pa.int64()),
            "is_total": pa.array([], pa.int8()),
        })
        if t.num_rows == 0:
            return empty
        ck = content_key_batch(pa.table({
            "doc_id": t["doc_id"], "text": t["chunk_text"]}))
        h = ck["k1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (h, doc) occurrence counts within the block
        order = np.lexsort((h, ids))
        hs, ds_ = h[order], ids[order]
        first = np.concatenate(
            ([True], (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])))
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(hs))
        occ = pa.table({
            "h": pa.array(hs[starts]),
            "doc_id": pa.array(ds_[starts]),
            "n_occ": pa.array((ends - starts).astype(np.int64)),
            "is_total": pa.array(np.zeros(len(starts), dtype=np.int8)),
        })
        # per-doc chunk totals, spread-keyed so totals distribute
        dstarts = np.flatnonzero(
            np.concatenate(([True], ds_[1:] != ds_[:-1])))
        dids = ds_[dstarts]
        dcnt = np.diff(np.append(dstarts, len(ds_)))
        with np.errstate(over="ignore"):
            spread = dids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        totals = pa.table({
            "h": pa.array(spread),
            "doc_id": pa.array(dids),
            "n_occ": pa.array(dcnt.astype(np.int64)),
            "is_total": pa.array(np.ones(len(dids), dtype=np.int8)),
        })
        return pa.concat_tables([occ, totals])

    parts = chunks.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return chunk_df_stats_pipeline(parts, min_df, num_partitions)


# fill-in-middle constants: < 2^30 so doc_id * A stays int64-exact for
# ids < 2^31 (the random_walks bound) and HUGEINT-trivial in SQL
FIM_A1 = 0x2545F491
FIM_A2 = 0x1E3779B9


def _slices_to_strings(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> pa.Array:
    """Vectorized StringArray from arbitrary (start, len) byte slices
    of one flat buffer: gather token bytes with a segment arange, then
    rebuild offsets — no per-row Python."""
    total = int(lens.sum())
    if total == 0:
        return pa.array([""] * len(starts), pa.string())
    cum = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=cum[1:])
    pos = np.repeat(starts, lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(cum, lens))
    flat = data[pos]
    offs = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offs[1:])
    return pa.StringArray.from_buffers(
        len(starts), pa.py_buffer(offs.tobytes()),
        pa.py_buffer(flat.tobytes()))


def fim_examples(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 8,
) -> ray.data.Dataset:
    """Deterministic FILL-IN-THE-MIDDLE example construction (Bavarian
    et al. 2022, "Efficient Training of Language Models to Fill in the
    Middle"): each document splits into (prefix, middle, suffix) at two
    cut points that are a pure integer function of (doc_id, length) —
    ``cut1 = 1 + (doc_id * A1) % (n - 2)``, ``cut2 = cut1 + 1 +
    (doc_id * A2) % (n - cut1 - 1)`` — so every segment is non-empty
    and the SQL twin replays the identical arithmetic with ``substr``.
    Documents shorter than ``min_chars`` (or NULL) emit nothing.

    Cut positions are BYTE offsets (the DSIR-family ASCII-exact oracle
    domain: SQL ``substr`` counts characters, so the twin is byte-exact
    on ASCII corpora; on multibyte text the engine cuts at bytes —
    deliberate, models consume bytes/tokens, but the oracle then
    diverges).  Exchange-free: one vectorized map pass (byte-slice
    gather, no per-row Python); output (doc_id, prefix, middle,
    suffix).
    """
    from luzzu_ray.functions.text import utf8_view

    lo = max(3, min_chars)

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "prefix": pa.array([], pa.string()),
            "middle": pa.array([], pa.string()),
            "suffix": pa.array([], pa.string()),
        })
        if t.num_rows == 0:
            return empty
        txt = t[text_col].combine_chunks()
        null_mask = (txt.is_null().to_numpy(zero_copy_only=False)
                     if txt.null_count else
                     np.zeros(t.num_rows, dtype=bool))
        data, offs = utf8_view(txt)
        n = (offs[1:] - offs[:-1]).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (~null_mask) & (n >= lo)
        if not keep.any():
            return empty
        ids, n, row_lo = ids[keep], n[keep], offs[:-1][keep].astype(np.int64)
        cut1 = 1 + (ids * FIM_A1) % (n - 2)
        cut2 = cut1 + 1 + (ids * FIM_A2) % (n - cut1 - 1)
        return pa.table({
            id_col: pa.array(ids),
            "prefix": _slices_to_strings(data, row_lo, cut1),
            "middle": _slices_to_strings(data, row_lo + cut1, cut2 - cut1),
            "suffix": _slices_to_strings(data, row_lo + cut2, n - cut2),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True)


CROP_A1 = 0x9E3779B1
CROP_A2 = 0x85EBCA77


def contrastive_crops(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 8,
) -> ray.data.Dataset:
    """Deterministic positive-pair construction for contrastive
    embedding training (the SimCSE/cropping augmentation family: two
    overlapping views of one document form a positive pair): each doc
    emits two crops of length ``L = max(1, 3n // 4)`` whose start
    offsets are pure integer functions of doc_id —
    ``start_v = (doc_id * A_v) % (n - L + 1)`` — so views overlap by
    at least ``2L - n >= n/2`` characters and any twin (SQL substr or
    Python) replays them exactly.  Byte offsets (ASCII-exact oracle
    domain, the FIM contract); docs shorter than ``min_chars`` or NULL
    emit nothing.  Exchange-free vectorized byte-slice gather.

    Output: (doc_id, view1, view2).
    """
    from luzzu_ray.functions.text import utf8_view

    lo = max(2, min_chars)

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "view1": pa.array([], pa.string()),
            "view2": pa.array([], pa.string()),
        })
        if t.num_rows == 0:
            return empty
        txt = t[text_col].combine_chunks()
        null_mask = (txt.is_null().to_numpy(zero_copy_only=False)
                     if txt.null_count else
                     np.zeros(t.num_rows, dtype=bool))
        data, offs = utf8_view(txt)
        n = (offs[1:] - offs[:-1]).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (~null_mask) & (n >= lo)
        if not keep.any():
            return empty
        ids, n, row_lo = ids[keep], n[keep], offs[:-1][keep].astype(np.int64)
        L = np.maximum(1, (3 * n) // 4)
        span = n - L + 1
        s1 = (ids * CROP_A1) % span
        s2 = (ids * CROP_A2) % span
        return pa.table({
            id_col: pa.array(ids),
            "view1": _slices_to_strings(data, row_lo + s1, L),
            "view2": _slices_to_strings(data, row_lo + s2, L),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True)


def doc_hapax_rate(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-document HAPAX LEGOMENA count — lexical novelty at corpus
    granularity (a doc rich in corpus-unique words is either novel
    signal or OCR noise; either way curation wants the number): for
    every doc, how many of its token occurrences are corpus-wide
    hapaxes (total occurrence count exactly 1).  Output
    (doc_id, n_tokens, n_hapax); docs with zero tokens emit n_tokens 0.

    Scale shape (the dup_span_docs gram-df pattern): per-block
    (token-hash, doc, n) partials collapse the token stream BEFORE one
    hash-keyed exchange; after the exchange each hash's total count is
    block-final, df==1 rows emit (doc, 1) partials, and per-doc sums
    merge with the map-side token counts through one narrow doc-keyed
    grouped sum.  The hapax SET is Zipf-huge and never broadcasts or
    reaches the driver.  Same 64-bit hash-vs-string caveat as the
    shingle family (a collision surfaces as an oracle mismatch).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.ops.relational import grouped_sum_q
    from luzzu_ray.ops.textstats import token_hashes_for_rows
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    width = auto_partitions(ds, num_partitions)
    base = ds.select_columns([id_col, text_col])

    def tok_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "h": pa.array([], pa.int64()),
                "doc": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        tt = t.rename_columns(["doc_id", "text"]) \
            if t.schema.names != ["doc_id", "text"] else t
        th, tr = token_hashes_for_rows(tt)
        ids = tt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(th):
            return pa.table({
                "h": pa.array([], pa.int64()),
                "doc": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        hs = th.view(np.int64)
        order = np.lexsort((tr, hs))
        h_s, r_s = hs[order], tr[order]
        first = np.ones(len(h_s), dtype=bool)
        first[1:] = (h_s[1:] != h_s[:-1]) | (r_s[1:] != r_s[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(h_s)))
        return pa.table({
            "h": pa.array(h_s[starts]),
            "doc": pa.array(ids[r_s[starts]]),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def hapax_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_hapax": pa.array([], pa.int64()),
            })
        h = t["h"].to_numpy(zero_copy_only=False)
        d = t["doc"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h_s, d_s, n_s = h[order], d[order], n[order]
        starts = np.r_[0, np.flatnonzero(h_s[1:] != h_s[:-1]) + 1]
        tot = np.add.reduceat(n_s, starts)
        # hapax: total corpus count 1 -> exactly one (doc, n=1) row
        sel = starts[(tot == 1)]
        if not len(sel):
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_hapax": pa.array([], pa.int64()),
            })
        docs = d_s[sel]
        u, c = np.unique(docs, return_counts=True)
        return pa.table({
            id_col: pa.array(u.astype(np.int64)),
            "n_tokens": pa.array(np.zeros(len(u), dtype=np.int64)),
            "n_hapax": pa.array(c.astype(np.int64)),
        })

    hapax = base.map_batches(
        tok_partial, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=width, keys=["h"]).map_batches(
        hapax_block, batch_format="pyarrow", batch_size=None)

    def ntok(t: pa.Table) -> pa.Table:
        tt = t.rename_columns(["doc_id", "text"]) \
            if t.schema.names != ["doc_id", "text"] else t
        th, tr = token_hashes_for_rows(tt)
        counts = (np.bincount(tr, minlength=t.num_rows)
                  if len(tr) else np.zeros(t.num_rows, dtype=np.int64))
        return pa.table({
            id_col: tt["doc_id"],
            "n_tokens": pa.array(counts.astype(np.int64)),
            "n_hapax": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        })

    both = base.map_batches(
        ntok, batch_format="pyarrow", zero_copy_batch=True).union(hapax)
    return grouped_sum_q(
        both, [id_col], float_cols={},
        int_cols={"n_tokens": "n_tokens", "n_hapax": "n_hapax"},
        num_partitions=num_partitions,
    )
