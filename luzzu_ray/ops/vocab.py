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
    parts = ds.select_columns([text_col]).map_batches(
        _word_partial, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # width follows the PARTIAL row count (block-local vocab sizes), not
    # the input token count; explicit num_partitions wins for tuning
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
