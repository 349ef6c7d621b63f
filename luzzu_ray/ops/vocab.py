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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


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


def tfidf_top_terms(
    ds: ray.data.Dataset,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Keyword extraction: each document's top-k terms by a RATIONAL
    tf-idf score kept entirely in integers —
    ``score = tf * N_docs * 10^4 // df`` — so ranking is bit-exact and
    SQL-checkable (no libm log whose last ulp differs across engines;
    N/df is the same monotone-in-idf ordering for fixed tf).

    Two phases: (1) corpus df via the word_stats partial+final combine
    (narrow (word, df) rows through the exchange); (2) the df table is
    broadcast once via ``ray.put`` and every batch scores its own docs
    locally — per-doc top-k never leaves the batch, so phase 2 is
    exchange-free.  BROADCAST ASSUMPTION: the distinct-word table fits
    a worker heap (Zipf keeps it far below the token count; for a
    vocabulary beyond memory, hash-join words instead).

    Output: (id_col, term, tfidf_score, rnk).
    """
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
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

    df_rows = df_tbl.take_all()
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
            # df lookup: batch dictionary -> position in sorted vocab
            pos = pc.index_in(
                enc.dictionary, value_set=self.sorted_vocab
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            wdf = self.sorted_dfs[pos[ucode]]
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
        batch_format="pyarrow", concurrency=(1, 8),
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
        batch_format="pyarrow", concurrency=(1, 8),
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
