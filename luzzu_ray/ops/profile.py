"""Dataset profiler: per-column quality metadata in one distributed
pass — the closest transcript-pipeline analogue of Luzzu's daQ quality
metadata graph (category -> dimension -> metric observations,
/root/reference/README.md:6,8,14): each profiled column yields one
observation row (row count, null count, EXACT distinct count, min and
max rendered as SQL-cast strings).

Scale shape: one read, per-block partials collapse every column to its
DISTINCT values plus one meta row BEFORE the single hash exchange on
(col_name, val) — the bytes that move are per-block-distinct values,
never the data.  After the exchange every (col, val) pair lives in
exactly ONE block, so per-block unique-pair counts SUM to the exact
global distinct count; a column's meta rows all share one key
(col, NULL) and fully reduce in one block.  The final combine is
O(#columns x #blocks) rows.  Caveat (documented, same cost class as
``Dataset.unique``): a column whose per-block distincts approach its
row count (e.g. a unique id) ships ~n narrow rows for that column.

Min/max are reduced in their NATIVE domain (int64 or string) through
every stage and stringified only after the final reduction — a string
reduction over stringified ints would order "10" < "9".  Supported
column types: integers (widened to int64) and strings; cast anything
else upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_OUT = {
    "col_name": pa.string(),
    "n_rows": pa.int64(),
    "n_nulls": pa.int64(),
    "n_distinct": pa.int64(),
    "min_val": pa.string(),
    "max_val": pa.string(),
}

_PARTIAL = {
    "col_name": pa.string(),
    "val": pa.string(),
    "n": pa.int64(),
    "nulls": pa.int64(),
    "mn_i": pa.int64(),
    "mx_i": pa.int64(),
    "mn_s": pa.string(),
    "mx_s": pa.string(),
}


def _typed_empty(schema: dict) -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in schema.items()})


def _partial(t: pa.Table, columns: list[str]) -> pa.Table:
    """Per block, per column: one meta row (val=NULL, counters + native
    min/max) + one row per DISTINCT non-null value (counters 0)."""
    if t.num_rows == 0:
        return _typed_empty(_PARTIAL)
    cols = {k: [] for k in _PARTIAL}

    def put(name, c, u, n_null, mn_i, mx_i, mn_s, mx_s):
        k = len(u)
        cols["col_name"].append(pa.array([name] * (k + 1)))
        cols["val"].append(pa.concat_arrays(
            [pa.array([None], pa.string()), u]))
        cols["n"].append(pa.array([t.num_rows] + [0] * k, pa.int64()))
        cols["nulls"].append(pa.array([n_null] + [0] * k, pa.int64()))
        cols["mn_i"].append(pa.array([mn_i] + [None] * k, pa.int64()))
        cols["mx_i"].append(pa.array([mx_i] + [None] * k, pa.int64()))
        cols["mn_s"].append(pa.array([mn_s] + [None] * k, pa.string()))
        cols["mx_s"].append(pa.array([mx_s] + [None] * k, pa.string()))

    for c in columns:
        col = t[c].combine_chunks()
        ty = col.type
        nn = pc.drop_null(col)
        n_null = int(col.null_count)
        mm = pc.min_max(col)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if pa.types.is_integer(ty):
            u = pc.cast(pc.unique(nn), pa.string())
            put(c, col, u, n_null, mn, mx, None, None)
        elif pa.types.is_string(ty) or pa.types.is_large_string(ty):
            u = pc.cast(pc.unique(nn), pa.string())
            put(c, col, u, n_null, None, None, mn, mx)
        else:
            raise TypeError(
                f"profile_table supports int/string columns; {c} is {ty}"
            )
    return pa.table({k: pa.concat_arrays(v) for k, v in cols.items()})


def _resolve_block(t: pa.Table) -> pa.Table:
    """Post-exchange: dedupe this block's (col, val) pairs into partial
    distinct counts; finalize meta rows (all of a column's meta shares
    one exchange key, so its full native-domain reduction happens here
    and min/max can be stringified)."""
    if t.num_rows == 0:
        return _typed_empty(_OUT)
    is_meta = pc.is_null(t["val"])
    meta = t.filter(is_meta)
    pairs = t.filter(pc.invert(is_meta))
    out = {k: [] for k in _OUT}

    if pairs.num_rows:
        g = pairs.group_by("col_name").aggregate(
            [("val", "count_distinct")]
        )
        k = len(g)
        out["col_name"].append(g["col_name"].combine_chunks())
        out["n_distinct"].append(
            pc.cast(g["val_count_distinct"], pa.int64()).combine_chunks())
        out["n_rows"].append(pa.array([0] * k, pa.int64()))
        out["n_nulls"].append(pa.array([0] * k, pa.int64()))
        out["min_val"].append(pa.array([None] * k, pa.string()))
        out["max_val"].append(pa.array([None] * k, pa.string()))
    if meta.num_rows:
        g = meta.group_by("col_name").aggregate(
            [("n", "sum"), ("nulls", "sum"),
             ("mn_i", "min"), ("mx_i", "max"),
             ("mn_s", "min"), ("mx_s", "max")]
        )
        k = len(g)
        mn = pc.coalesce(pc.cast(g["mn_i_min"], pa.string()), g["mn_s_min"])
        mx = pc.coalesce(pc.cast(g["mx_i_max"], pa.string()), g["mx_s_max"])
        out["col_name"].append(g["col_name"].combine_chunks())
        out["n_rows"].append(pc.cast(g["n_sum"], pa.int64()).combine_chunks())
        out["n_nulls"].append(
            pc.cast(g["nulls_sum"], pa.int64()).combine_chunks())
        out["n_distinct"].append(pa.array([0] * k, pa.int64()))
        out["min_val"].append(mn.combine_chunks())
        out["max_val"].append(mx.combine_chunks())
    return pa.table({k: pa.concat_arrays(v) for k, v in out.items()})


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val) — n_distinct is EXACT, min/max are
    SQL-cast strings.  SQL twin: a UNION ALL of one aggregate SELECT
    per column."""
    from ray.data.aggregate import Max, Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    parts = ds.select_columns(columns).map_batches(
        _partial, fn_kwargs={"columns": columns},
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    width = auto_partitions(parts, num_partitions)
    resolved = parts.repartition(
        num_blocks=width, keys=["col_name", "val"]
    ).map_batches(_resolve_block, batch_format="pyarrow", batch_size=None)
    # per column: meta contributed exactly one fully-reduced row (its
    # key co-located every meta partial), distinct partials SUM; the
    # null-skipping Max just picks that single non-null min/max string
    return resolved.groupby("col_name", num_partitions=2).aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_nulls", alias_name="n_nulls"),
        Sum("n_distinct", alias_name="n_distinct"),
        Max("min_val", alias_name="min_val"),
        Max("max_val", alias_name="max_val"),
    )


# per-rule validation report: rule name -> vectorized predicate over the
# doc_stats signal table (True = violation).  Mirrors the Luzzu
# metric-per-processor model: each rule is an independent accumulator
# over the record stream, reduced to one (rule, count) observation.
DOC_RULES = (
    "null_text", "empty", "too_short", "too_long",
    "symbol_heavy", "digit_heavy",
)


def _doc_rule_matrix(t: pa.Table) -> np.ndarray:
    """(n_rules,) violation counts for one batch of documents."""
    from luzzu_ray import constants as C
    from luzzu_ray.ops.textstats import doc_stats_batch

    is_null = pc.is_null(t["text"]).to_numpy(zero_copy_only=False)
    s = doc_stats_batch(t)
    n_chars = s["n_chars"].to_numpy(zero_copy_only=False)
    sym = s["symbol_ratio_q6"].to_numpy(zero_copy_only=False)
    dig = s["digit_ratio_q6"].to_numpy(zero_copy_only=False)
    return np.array([
        int(is_null.sum()),
        int(((n_chars == 0) & ~is_null).sum()),
        int(((n_chars > 0) & (n_chars < C.MIN_CHARS)).sum()),
        int((n_chars > C.MAX_CHARS).sum()),
        int((sym > int(C.SYMBOL_MAX * 1e6)).sum()),
        int((dig > int(C.DIGIT_MAX * 1e6)).sum()),
    ], dtype=np.int64)


def validate_documents(ds: ray.data.Dataset) -> pa.Table:
    """Per-rule violation counts over a document table — the Luzzu
    quality-metadata observation table (daQ analog) as one narrow
    partial+final reduce: each block contributes a 1-row wide partial
    (one int64 per rule + n_checked), ``Dataset.sum`` combines, and
    the driver reshapes the single wide row to long (rule,
    n_violations, n_checked).  No exchange beyond the O(#blocks)
    partials.
    """

    def partial(t: pa.Table) -> pa.Table:
        m = _doc_rule_matrix(t)
        cols = {f"r{i}": pa.array([int(v)], pa.int64())
                for i, v in enumerate(m)}
        cols["n"] = pa.array([t.num_rows], pa.int64())
        return pa.table(cols)

    parts = ds.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    tot = parts.sum([f"r{i}" for i in range(len(DOC_RULES))] + ["n"])
    if tot is None:  # empty input dataset
        tot = {f"sum(r{i})": 0 for i in range(len(DOC_RULES))}
        tot["sum(n)"] = 0
    n_checked = int(tot["sum(n)"])
    return pa.table({
        "rule": pa.array(list(DOC_RULES), pa.string()),
        "n_violations": pa.array(
            [int(tot[f"sum(r{i})"]) for i in range(len(DOC_RULES))],
            pa.int64()),
        "n_checked": pa.array(
            [n_checked] * len(DOC_RULES), pa.int64()),
    })


def corpus_quality_card(
    ds: ray.data.Dataset,
    num_partitions: int | None = None,
) -> pa.Table:
    """One-table CORPUS QUALITY CARD — the Luzzu daQ quality-report
    analogue (aggregated quality metadata a curation run publishes
    beside its output): ``(metric, value)`` rows, all integer /
    fixed-point so the SQL twin matches bit-for-bit:

    - ``n_docs``, ``n_kept`` (C4 keep verdict), ``keep_rate_q6``;
    - ``total_words``, ``mean_words_q2`` (floor(100 * words / docs));
    - ``n_distinct_texts`` (distinct texts with NULL as its OWN value,
      distinct from '' — the dedup family's layout-proof key
      semantics), ``n_exact_dup_docs`` = docs - distinct;
    - ``n_langs`` (distinct lang values, NULL excluded).

    Scale shape: ONE text scan computes verdict+words+content keys
    (the training_data_pipeline fusion); distinct text counting is the
    16-byte-key exchange; langs are an O(#langs) reduce; the driver
    only ever holds the card rows.
    """
    from luzzu_ray.ops.dedup import auto_partitions, content_key_batch
    from luzzu_ray.ops.textstats import quality_score_batch
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def scan(t: pa.Table) -> pa.Table:
        s = quality_score_batch(t)
        keys = content_key_batch(t)
        return pa.table({
            "k1": keys["k1"], "k2": keys["k2"],
            "n_words": s["n_words"],
            "keep": pc.cast(s["keep"], pa.int64()),
        })

    scanned = ds.select_columns(["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # 28-byte rows; scanned ONCE
    width = auto_partitions(scanned, num_partitions)

    def sums(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "n_kept": pa.array([int(pc.sum(t["keep"]).as_py() or 0)],
                               pa.int64()),
            "total_words": pa.array(
                [int(pc.sum(t["n_words"]).as_py() or 0)], pa.int64()),
        })

    agg = {"n_docs": 0, "n_kept": 0, "total_words": 0}
    for b in scanned.map_batches(
            sums, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        # an output batch may hold one row PER input batch: sum them
        for k in agg:
            agg[k] += int(pc.sum(b[k]).as_py() or 0)

    def key_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k1": pa.array([], pa.uint64()),
                             "k2": pa.array([], pa.uint64())})
        k1 = t["k1"].to_numpy(zero_copy_only=False)
        k2 = t["k2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k2, k1))
        k1s, k2s = k1[order], k2[order]
        first = np.ones(len(k1s), dtype=bool)
        first[1:] = (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])
        return pa.table({"k1": pa.array(k1s[first]),
                         "k2": pa.array(k2s[first])})

    n_distinct = 0
    for b in scanned.map_batches(
            key_partial, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=width, keys=["k1"]).map_batches(
            key_partial, batch_format="pyarrow", batch_size=None
    ).map_batches(
            lambda t: pa.table({"d": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow", batch_size=None,
    ).iter_batches(batch_format="pyarrow"):
        n_distinct += int(pc.sum(b["d"]).as_py() or 0)

    def lang_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(pc.drop_null(t["lang"]))
        return pa.table({"lang": u})

    n_langs = len({
        v
        for b in ds.select_columns(["lang"]).map_batches(
            lang_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")
        for v in b["lang"].to_pylist()
    })  # bounded by #distinct langs per block x #blocks, langs are few

    card = [
        ("n_docs", agg["n_docs"]),
        ("n_kept", agg["n_kept"]),
        ("keep_rate_q6",
         (10**6 * agg["n_kept"]) // agg["n_docs"] if agg["n_docs"] else 0),
        ("total_words", agg["total_words"]),
        ("mean_words_q2",
         (100 * agg["total_words"]) // agg["n_docs"]
         if agg["n_docs"] else 0),
        ("n_distinct_texts", n_distinct),
        ("n_exact_dup_docs", agg["n_docs"] - n_distinct),
        ("n_langs", n_langs),
    ]
    return pa.table({
        "metric": pa.array([m for m, _ in card], pa.string()),
        "value": pa.array([v for _, v in card], pa.int64()),
    })
