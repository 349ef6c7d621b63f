"""Relational patterns used by the conformance queries: broadcast hash
join, partial+final aggregation, deterministic top-k.

Luzzu analogues: vocabulary map-joins (J1, /root/reference/README.md:14),
metric finalization aggregates (G2, README.md:7-8), dataset ranking
(O1, README.md:15).  The join broadcasts the SMALL side once via
``ray.put`` and probes it inside ``map_batches`` — no shuffle of the big
side, the 100TB-safe shape for dimension joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from luzzu_ray.ops.common import pool as _pool


class BroadcastJoiner:
    """Actor-pool map-join: big-side batches probe a broadcast small table."""

    def __init__(self, small_ref, key: str, small_cols: list[str]):
        small: pa.Table = ray.get(small_ref)
        self.key = key
        self.small = small.select([key] + small_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.join(self.small, keys=[self.key], join_type="inner")


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table,
    key: str,
    small_cols: list[str],
    concurrency=None,
) -> ray.data.Dataset:
    ref = ray.put(small)
    return big.map_batches(
        BroadcastJoiner,
        batch_format="pyarrow",
        concurrency=concurrency if concurrency is not None else _pool(),
        fn_constructor_kwargs={"small_ref": ref, "key": key, "small_cols": small_cols},
    )


def grouped_sum_q(
    ds: ray.data.Dataset,
    keys: list[str],
    float_cols: dict[str, str],
    int_cols: dict[str, str] | None = None,
    count_as: str | None = None,
    q: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Partial+final grouped sums with fixed-point floats.

    ``float_cols``: {src_col: out_name} — summed as integer multiples of
    10^-q (floor at the ROW level, then integer-summed), so the result is
    exactly reproducible regardless of summation order, and a DuckDB
    oracle matches it bit-for-bit via
    ``SUM(CAST(FLOOR(x * 10^q) AS BIGINT))`` (floor is unambiguous across
    engines; round differs in half-even vs half-away ties).
    """
    int_cols = int_cols or {}
    scale = float(10 ** q)

    def partial(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        agg_src = {}
        for src, out in float_cols.items():
            v = pc.floor(pc.multiply(pc.cast(t[src], pa.float64()), scale))
            agg_src[out] = pc.cast(v, pa.int64())
        for src, out in int_cols.items():
            agg_src[out] = pc.cast(t[src], pa.int64())
        if count_as:
            agg_src[count_as] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        g = pa.table({**cols, **agg_src}).group_by(keys).aggregate(
            [(c, "sum") for c in agg_src]
        )
        return g.rename_columns(keys + list(agg_src))

    sum_cols = list(float_cols.values()) + list(int_cols.values()) + (
        [count_as] if count_as else []
    )
    parts = ds.map_batches(partial, batch_format="pyarrow")
    # final = one keyed hash exchange + a block-local group_by: equal
    # keys co-locate, so per-block integer sums are globally final.
    # This beats groupby().aggregate() ~8x on high-cardinality keys
    # (147k orderkeys at sf0.1: 0.95s vs 7.4s) because the partial rows
    # flow straight into Arrow's hash aggregation instead of Ray's
    # per-key sort-based aggregator; low-cardinality callers still pass
    # a small num_partitions to cap the exchange width.
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t  # partial schema == final schema
        g = t.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
        return g.rename_columns(keys + sum_cols)

    return parts.repartition(
        num_blocks=auto_partitions(ds, num_partitions), keys=keys
    ).map_batches(
        final, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def topk(
    ds: ray.data.Dataset, order_col: str, k: int, tie_col: str
) -> ray.data.Dataset:
    """Deterministic global top-k: sort desc on order_col, ties by tie_col."""
    return ds.sort([order_col, tie_col], descending=[True, False]).limit(k)


def grouped_quantiles_q(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    quantiles: dict[str, float] | None = None,
    q: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact per-group DISCRETE quantiles over row-level fixed-point
    values: element at index ceil(frac * n) - 1 of the sorted group —
    DuckDB's ``quantile_disc`` definition (probed empirically), which
    keeps the whole computation in integers so no interpolation
    last-ulp float divergence can flip a fixed-point boundary.

    Hash-partition on the group key, then one whole-block sorted pass
    computes every group's quantiles with NumPy segmented indexing —
    the G1 co-location pattern applied to order statistics.  Exactness
    requires a group's rows to fit one block (same documented
    assumption as conversation reassembly); for heavy-hitter keys at
    10^12 scale use the mergeable partial-histogram combine in
    ``luzzu_ray.ops.sketch.approx_quantiles`` (bounded memory, <=eps
    relative error, no co-location assumption).
    """
    quantiles = quantiles or {"median": 0.5, "p90": 0.9}
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    scale = float(10 ** q)
    out_names = [f"{name}_q{q}" for name in quantiles]

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {key: pa.array([], pa.int64())}
            cols.update({n: pa.array([], pa.int64()) for n in out_names})
            cols["n"] = pa.array([], pa.int64())
            return pa.table(cols)
        k = t[key].to_numpy(zero_copy_only=False)
        vf = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        vq = np.floor(vf * scale).astype(np.int64)  # row-level fixed point
        order = np.lexsort((vq, k))
        k, vq = k[order], vq[order]
        new_g = np.concatenate(([True], k[1:] != k[:-1]))
        starts = np.flatnonzero(new_g)
        counts = np.diff(np.concatenate((starts, [len(k)])))
        cols = {key: pa.array(k[starts])}
        for name, frac in quantiles.items():
            idx = np.maximum(
                np.ceil(frac * counts).astype(np.int64) - 1, 0
            )
            cols[f"{name}_q{q}"] = pa.array(vq[starts + idx])
        cols["n"] = pa.array(counts.astype(np.int64))
        return pa.table(cols)

    picked = ds.select_columns([key, value_col])
    part = picked.repartition(num_blocks=num_partitions, keys=[key])
    return part.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def grouped_quantiles_cont(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    quantiles: dict[str, float] | None = None,
    q: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact per-group CONTINUOUS (interpolated) quantiles — the
    ``quantile_cont`` twin of :func:`grouped_quantiles_q`.

    DuckDB's interpolation, probed on 200 random (n, frac) cases and
    replicated LITERALLY so the float64 result is bit-identical:
    ``p = (n - 1) * frac`` (double), ``lo = floor(p)``,
    ``hi = min(lo + 1, n - 1)``, ``f = p - lo``, value =
    ``v[lo] * (1 - f) + v[hi] * f`` — every operand is an
    integer-valued double (row-level fixed-point < 2^53), so the only
    rounding is the shared IEEE evaluation of the shared expression.

    Same co-location contract as the discrete op: one hash exchange on
    the group key, each group's rows in one block, one sorted segmented
    pass computing every group's quantiles; for heavy-hitter keys use
    the mergeable sketch in ``ops.sketch.approx_quantiles``.
    Output: (key, <name>_cont float64 ..., n).
    """
    quantiles = quantiles or {"median": 0.5, "p90": 0.9}
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    scale = float(10 ** q)
    out_names = [f"{name}_cont" for name in quantiles]

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {key: pa.array([], pa.int64())}
            cols.update({n: pa.array([], pa.float64()) for n in out_names})
            cols["n"] = pa.array([], pa.int64())
            return pa.table(cols)
        k = t[key].to_numpy(zero_copy_only=False)
        vf = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        vq = np.floor(vf * scale).astype(np.int64)  # row-level fixed point
        order = np.lexsort((vq, k))
        k, vq = k[order], vq[order]
        new_g = np.concatenate(([True], k[1:] != k[:-1]))
        starts = np.flatnonzero(new_g)
        counts = np.diff(np.concatenate((starts, [len(k)])))
        cols = {key: pa.array(k[starts])}
        vqf = vq.astype(np.float64)
        for name, frac in quantiles.items():
            p = (counts - 1).astype(np.float64) * frac
            lo = np.floor(p).astype(np.int64)
            hi = np.minimum(lo + 1, counts - 1)
            f = p - lo
            lov = vqf[starts + lo]
            hiv = vqf[starts + hi]
            cols[f"{name}_cont"] = pa.array(lov * (1.0 - f) + hiv * f)
        cols["n"] = pa.array(counts.astype(np.int64))
        return pa.table(cols)

    picked = ds.select_columns([key, value_col])
    part = picked.repartition(num_blocks=num_partitions, keys=[key])
    return part.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def bottom_k_by_hash(
    ds: ray.data.Dataset,
    id_col: str,
    k: int,
    carry_cols: list[str],
    hash_a: int,
    hash_b: int,
) -> pa.Table:
    """Deterministic distributed reservoir sample: the k rows with the
    smallest keyed hash (a bottom-k sketch — statistically a uniform
    k-sample, but reproducible across cluster sizes, block layouts and
    reruns, unlike an RNG reservoir).  Per-batch partial bottom-k keeps
    O(k) rows per block; partials flow through ONE narrow hash exchange
    to a single reduce block for the final bottom-k (never a driver-side
    merge of all partials — at 10^6 blocks that is a driver hot spot),
    and only the final k rows return to the caller.  Carry-column types
    are preserved verbatim (the partial slices the input table).
    Luzzu analogue: reservoir sampling inside accessibility metrics
    `[paper]` (/root/reference/README.md:12)."""
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = ids * np.uint64(hash_a) + np.uint64(hash_b)
        kk = min(k, len(h))
        if kk == 0:
            out = t.slice(0, 0).append_column("h", pa.array([], pa.uint64()))
        else:
            idx = np.argpartition(h, kk - 1)[:kk]
            out = t.take(pa.array(idx)).append_column("h", pa.array(h[idx]))
        return out.append_column(
            "_mrg", pa.array(np.zeros(out.num_rows, dtype=np.int32))
        )

    parts = ds.select_columns([id_col] + carry_cols).map_batches(
        partial, batch_format="pyarrow"
    )

    def final(t: pa.Table) -> pa.Table:
        top = t.drop_columns(["_mrg"]).sort_by(
            [("h", "ascending"), (id_col, "ascending")]
        ).slice(0, k)
        return top.drop_columns(["h"])

    merged = parts.repartition(num_blocks=1, keys=["_mrg"]).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )
    out = merged.take_all()  # exactly k rows
    sch = ds.schema()
    fields = [
        (c, sch.types[sch.names.index(c)]) for c in [id_col] + carry_cols
    ]
    return pa.Table.from_pylist(out, schema=pa.schema(fields))


def stratified_bottom_k(
    ds: ray.data.Dataset,
    key: str,
    id_col: str,
    k: int,
    hash_a: int,
    hash_b: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Deterministic stratified sample: the k rows with the smallest
    keyed hash PER GROUP (bottom-k sketch per stratum) — reproducible
    across cluster sizes and block layouts like :func:`bottom_k_by_hash`,
    but balanced across a grouping column (the classic stratified-sample
    need: per-language / per-source training-data quotas).

    Per-batch partial keeps <= k rows per group per block; partials
    merge through one narrow hash exchange on the group key.  Returns
    (key, id_col) rows."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def bottom_per_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([key, id_col])
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = ids * np.uint64(hash_a) + np.uint64(hash_b)
        enc = pc.dictionary_encode(t[key].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        g = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, h, g))
        gs = g[order]
        new_g = np.concatenate(([True], gs[1:] != gs[:-1]))
        starts = np.flatnonzero(new_g)
        pos = np.arange(len(gs)) - starts[np.cumsum(new_g) - 1]
        keep = order[pos < k]
        return t.select([key, id_col]).take(pa.array(np.sort(keep)))

    partials = ds.select_columns([key, id_col]).map_batches(
        bottom_per_group, batch_format="pyarrow"
    )
    merged = partials.repartition(
        num_blocks=max(4, num_partitions // 8), keys=[key]
    )
    return merged.map_batches(
        bottom_per_group, batch_format="pyarrow", batch_size=None
    )


def global_equidepth_histogram(
    ds: ray.data.Dataset,
    value_col: str,
    n_bins: int = 4,
    q: int = 4,
    num_partitions: int | None = None,
) -> pa.Table:
    """EXACT global equi-depth (equal-count) histogram over a
    fixed-point-quantized value column — bin edges are the DISCRETE
    quantiles (DuckDB ``quantile_disc``: element at sorted index
    ``ceil(frac * n) - 1``), bin k holds rows with
    ``edge[k-1] < v <= edge[k]`` (last bin unbounded above).

    One value-count exchange (``(vq, count)`` partials per block, the
    same bounded-domain contract as ``top_fraction_by_score`` /
    the CMS histogram ops: rows reaching the driver are bounded by the
    quantized value DOMAIN, not by n), then every output — edges and
    bin counts alike — is derived from the count table with Python-int
    cumulative scans (no second data pass, no overflow)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    scale = float(10 ** q)

    def count_partial(t: pa.Table) -> pa.Table:
        vq = pc.cast(pc.floor(pc.multiply(
            pc.cast(t[value_col], pa.float64()), scale)), pa.int64())
        g = pa.table({"vq": vq}).group_by("vq").aggregate(
            [("vq", "count")])
        return g.rename_columns(["vq", "n"])

    counts = (
        ds.select_columns([value_col])
        .map_batches(count_partial, batch_format="pyarrow")
        .repartition(num_blocks=max(4, num_partitions // 8), keys=["vq"])
        .map_batches(
            lambda t: t.group_by("vq").aggregate([("n", "sum")])
            .rename_columns(["vq", "n"]),
            batch_format="pyarrow", batch_size=None,
        )
        .take_all()
    )
    empty = pa.table({
        "bin": pa.array([], pa.int64()),
        "hi_q": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
    })
    if not counts:
        return empty
    vals = sorted((int(c["vq"]), int(c["n"])) for c in counts)
    n_total = sum(n for _, n in vals)
    edges = []
    cum, vi = 0, 0
    for k in range(1, n_bins):
        target = -((-k * n_total) // n_bins)  # ceil(k * n / n_bins)
        while cum < target:
            cum += vals[vi][1]
            vi += 1
        edges.append(vals[vi - 1][0])
    edges.append(vals[-1][0])  # global max closes the last bin
    bins, his, ns = [], [], []
    lo_idx = 0
    consumed = 0
    for b, hi in enumerate(edges):
        cnt = 0
        while lo_idx < len(vals) and (vals[lo_idx][0] <= hi
                                      or b == n_bins - 1):
            cnt += vals[lo_idx][1]
            lo_idx += 1
        consumed += cnt
        bins.append(b)
        his.append(hi)
        ns.append(cnt)
    assert consumed == n_total
    return pa.table({
        "bin": pa.array(bins, pa.int64()),
        "hi_q": pa.array(his, pa.int64()),
        "n": pa.array(ns, pa.int64()),
    })


def equidepth_calibration(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    num_partitions: int | None = None,
) -> pa.Table:
    """Classifier CALIBRATION table: exact equi-depth bins of an
    already-quantized integer score with the positive (keep) rate per
    bin — the reliability-diagram statistic for a quality filter
    ("do high-score bins actually keep more documents?").

    Bin edges are DISCRETE quantiles (DuckDB ``quantile_disc``
    semantics: sorted element at ``ceil(frac * n) - 1``); bin k holds
    rows with ``edge[k-1] < score <= edge[k]`` (last bin unbounded,
    its reported edge is the global max).  ``keep_rate_q6`` is the
    exact integer ``n_keep * 10^6 // n`` (NULL for empty bins — edges
    can coincide under heavy ties).

    Scale shape (same bounded-domain contract as
    ``global_equidepth_histogram``): per-block ``(score, n, n_keep)``
    partials, ONE narrow hash exchange on the score value, and a
    driver-side Python-int scan over at most |score domain| rows —
    never a global sort, never a second data pass.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "vq": pc.cast(t[score_col], pa.int64()),
            "pos": pc.cast(pc.cast(t[label_col], pa.int8()), pa.int64()),
        }).group_by("vq").aggregate([("pos", "count"), ("pos", "sum")])
        return g.rename_columns(["vq", "n", "n_keep"])

    counts = (
        ds.select_columns([score_col, label_col])
        .map_batches(count_partial, batch_format="pyarrow")
        .repartition(num_blocks=max(4, num_partitions // 8), keys=["vq"])
        .map_batches(
            lambda t: t.group_by("vq").aggregate(
                [("n", "sum"), ("n_keep", "sum")]
            ).rename_columns(["vq", "n", "n_keep"]),
            batch_format="pyarrow", batch_size=None,
        )
        .take_all()
    )
    schema = pa.schema([
        ("bin", pa.int64()), ("hi_q", pa.int64()), ("n", pa.int64()),
        ("n_keep", pa.int64()), ("keep_rate_q6", pa.int64()),
    ])
    if not counts:
        return schema.empty_table()
    vals = sorted(
        (int(c["vq"]), int(c["n"]), int(c["n_keep"])) for c in counts
    )
    n_total = sum(n for _, n, _ in vals)
    edges = []
    cum, vi = 0, 0
    for k in range(1, n_bins):
        target = -((-k * n_total) // n_bins)  # ceil(k * n / n_bins)
        while cum < target:
            cum += vals[vi][1]
            vi += 1
        edges.append(vals[vi - 1][0])
    edges.append(vals[-1][0])  # global max closes the last bin
    bins, his, ns, keeps, rates = [], [], [], [], []
    lo_idx = 0
    consumed = 0
    for b, hi in enumerate(edges):
        cnt = pos = 0
        while lo_idx < len(vals) and (vals[lo_idx][0] <= hi
                                      or b == n_bins - 1):
            cnt += vals[lo_idx][1]
            pos += vals[lo_idx][2]
            lo_idx += 1
        consumed += cnt
        bins.append(b)
        his.append(hi)
        ns.append(cnt)
        keeps.append(pos)
        rates.append((pos * 10**6) // cnt if cnt else None)
    assert consumed == n_total
    return pa.table({
        "bin": pa.array(bins, pa.int64()),
        "hi_q": pa.array(his, pa.int64()),
        "n": pa.array(ns, pa.int64()),
        "n_keep": pa.array(keeps, pa.int64()),
        "keep_rate_q6": pa.array(rates, pa.int64()),
    })


def top_fraction_by_score(
    ds: ray.data.Dataset,
    score_col: str,
    id_col: str,
    numer: int,
    denom: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Global top-``numer/denom`` selection by an integer score — the
    "keep the best P% of the corpus by quality score" primitive of
    training-data curation, computed EXACTLY and deterministically
    (ties broken by ascending ``id_col``), equal to SQL's
    ``QUALIFY row_number() OVER (ORDER BY score DESC, id) <= K`` with
    ``K = ceil(numer * n / denom)`` in integer arithmetic.

    Two passes, no global sort:

    1. value-count pass — per-block ``(score, count)`` partials merge
       through one NARROW hash exchange on ``score``; the driver only
       receives one row per distinct score value (the score must be
       quantized to a bounded domain, like the histogram ops) and scans
       the descending cumulative counts for the threshold ``v*`` and the
       tie quota ``r`` (rows with score == v* still needed to reach K).
    2. filter pass — rows with score > v* stream straight through;
       rows with score == v* go through a bottom-``r``-by-id trim
       (per-block partial keeps <= r rows, one narrow exchange, final
       trim), and the two streams union.

    SCALE NOTE: the tie trim's reduce block holds <= min(#blocks * r,
    n_ties) rows.  With a fine-grained score (q6) boundary ties are a
    sliver of the data; in the degenerate all-one-score corpus this
    decays to a bottom-K merge and the exchange carries ~K rows."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns([id_col, score_col])

    def count_partial(t: pa.Table) -> pa.Table:
        return (
            t.select([score_col]).group_by(score_col)
            .aggregate([(score_col, "count")])
            .rename_columns([score_col, "n"])
        )

    def count_merge(t: pa.Table) -> pa.Table:
        return (
            t.group_by(score_col).aggregate([("n", "sum")])
            .rename_columns([score_col, "n"])
        )

    counts = (
        picked.map_batches(count_partial, batch_format="pyarrow")
        .repartition(
            num_blocks=max(4, num_partitions // 8), keys=[score_col]
        )
        .map_batches(count_merge, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    if not counts:
        return picked.limit(0)
    vals = np.array([c[score_col] for c in counts], dtype=np.int64)
    ns = np.array([c["n"] for c in counts], dtype=np.int64)
    order = np.argsort(-vals)
    vals, ns = vals[order], ns[order]
    n_total = int(ns.sum())
    k_target = (numer * n_total + denom - 1) // denom
    cum = np.cumsum(ns)
    ti = int(np.searchsorted(cum, k_target))
    v_star = int(vals[ti])
    r_ties = int(k_target - (cum[ti - 1] if ti else 0))

    above = picked.filter(
        expr=f"{score_col} > {v_star}"
    )
    if r_ties <= 0:
        return above

    def tie_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t[score_col], v_star))
        if t.num_rows > r_ties:
            t = t.sort_by([(id_col, "ascending")]).slice(0, r_ties)
        return t

    trimmed = (
        picked.map_batches(tie_partial, batch_format="pyarrow")
        .repartition(num_blocks=1)
        .map_batches(tie_partial, batch_format="pyarrow", batch_size=None)
    )
    return above.union(trimmed)


def ordered_prefix_pack(
    ds: ray.data.Dataset,
    id_col: str,
    weight_col: str,
    budget: int,
    num_buckets: int = 256,
    emit_offset: bool = False,
) -> ray.data.Dataset:
    """Global ordered prefix-sum packing — the LM-training "concatenate
    the corpus in ``id_col`` order and cut it into fixed token budgets"
    primitive: ``pack_id = exclusive_prefix_sum(weight) // budget`` over
    the GLOBAL ``id_col`` order, i.e. SQL's
    ``(sum(w) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) - w) // budget``.

    A scan (running total) is the classic shuffle-hostile shape; here it
    is three metadata-light passes with NO global sort:

    1. min/max of ``id_col`` (streaming aggregate) fixes a range-bucket
       width (on Parquet at scale this is free from row-group stats);
    2. per-block ``(bucket, sum(weight))`` partials merge through one
       narrow exchange — the driver receives <= ``num_buckets`` rows and
       prefix-sums them into per-bucket exclusive offsets;
    3. rows hash-exchange on their range bucket; each reduce block
       sorts its buckets by ``id_col``, local-cumsums, and adds the
       broadcast bucket offset.

    ``emit_offset=True`` additionally emits ``offset_in_pack`` (the
    row's starting token position inside its pack — what the actual
    sequence writer needs to place BOS/EOS and attention-mask segment
    boundaries): ``exclusive_prefix_sum(w) - pack_id * budget``, free
    from the same prefix sums.

    Deterministic, layout-invariant, and exact-integer.  Skew note: a
    range bucket with a disproportionate share of rows makes one reduce
    block large; ``num_buckets`` scales with the cluster and buckets are
    contiguous id ranges, so uniform-ish ids (the common case for dense
    doc ids) balance well."""
    from ray.data.aggregate import Max, Min

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, None)
    picked = ds.select_columns([id_col, weight_col])

    rng = picked.aggregate(Min(id_col), Max(id_col))
    if not rng or rng.get(f"min({id_col})") is None:
        return picked.limit(0)
    lo, hi = int(rng[f"min({id_col})"]), int(rng[f"max({id_col})"])
    width = max(1, (hi - lo + num_buckets) // num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (ids.astype(np.int64) - lo) // width
        return t.append_column("_bkt", pa.array(b))

    bucketed = picked.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    def sum_partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["_bkt", weight_col]).group_by("_bkt")
            .aggregate([(weight_col, "sum")]).rename_columns(["_bkt", "w"])
        )

    totals = (
        bucketed.map_batches(sum_partial, batch_format="pyarrow")
        .repartition(num_blocks=max(4, num_partitions // 8), keys=["_bkt"])
        .map_batches(
            lambda t: t.group_by("_bkt").aggregate([("w", "sum")])
            .rename_columns(["_bkt", "w"]),
            batch_format="pyarrow", batch_size=None,
        )
        .take_all()
    )
    offsets = np.zeros(num_buckets + 1, dtype=np.int64)
    for row in totals:
        offsets[int(row["_bkt"]) + 1] = int(row["w"])
    offsets = np.cumsum(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64())}
            if emit_offset:
                cols["offset_in_pack"] = pa.array([], pa.int64())
            return pa.table(cols)
        t = t.sort_by([("_bkt", "ascending"), (id_col, "ascending")])
        b = t["_bkt"].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cs = np.cumsum(w)
        new_b = np.concatenate(([True], b[1:] != b[:-1]))
        starts = np.flatnonzero(new_b)
        seg0 = np.where(starts > 0, cs[starts - 1], 0)  # cumsum before seg
        excl = cs - w - seg0[np.cumsum(new_b) - 1] + offsets[b[starts]][
            np.cumsum(new_b) - 1
        ]
        cols = {id_col: t[id_col],
                "n_tokens": pa.array(w),
                "pack_id": pa.array(excl // budget)}
        if emit_offset:
            cols["offset_in_pack"] = pa.array(excl - (excl // budget) * budget)
        return pa.table(cols)

    part = bucketed.repartition(
        num_blocks=min(num_partitions, num_buckets), keys=["_bkt"]
    )
    return part.map_batches(assign, batch_format="pyarrow", batch_size=None)


def anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    carry_cols: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed ANTI join: rows of ``left`` whose key appears nowhere
    in ``right`` (SQL ``NOT EXISTS``)."""
    return _existence_join(
        left, right, left_key, right_key, carry_cols,
        negate=True, num_partitions=num_partitions,
    )


def semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    carry_cols: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed SEMI join: rows of ``left`` whose key appears at
    least once in ``right`` (SQL ``EXISTS``) — existence filtering
    without duplicating left rows per match the way an inner join
    would."""
    return _existence_join(
        left, right, left_key, right_key, carry_cols,
        negate=False, num_partitions=num_partitions,
    )


def _existence_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    carry_cols: list[str],
    negate: bool,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Shared EXISTS / NOT EXISTS engine — the relational complement the
    inner joins don't cover, needed for "customers with(out) X" audits
    and held-out-set exclusion.

    Both sides hash-exchange on the key; the right side is reduced to
    per-block DISTINCT keys BEFORE the exchange (only unique keys move,
    never right payloads), and each reduce block filters its co-located
    left rows against its right-key set with one vectorized ``is_in``.
    NULL right keys match nothing, per SQL EXISTS semantics."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(left, num_partitions)
    lsch = left.schema()
    carry_types = {c: lsch.types[lsch.names.index(c)] for c in carry_cols}
    key_type = lsch.types[lsch.names.index(left_key)]

    def conform_left(t: pa.Table) -> pa.Table:
        cols = {left_key: t[left_key]}
        cols.update({c: t[c] for c in carry_cols})
        cols["_side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def conform_right(t: pa.Table) -> pa.Table:
        k = pc.unique(pc.cast(t[right_key], key_type))
        cols = {left_key: k}
        cols.update(
            {c: pa.nulls(len(k), carry_types[c]) for c in carry_cols}
        )
        cols["_side"] = pa.array(np.ones(len(k), dtype=np.int8))
        return pa.table(cols)

    both = left.select_columns([left_key] + carry_cols).map_batches(
        conform_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.select_columns([right_key]).map_batches(
            conform_right, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def exists_block(t: pa.Table) -> pa.Table:
        side = t["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).drop_columns(["_side"])
        rk = pc.unique(
            pc.drop_null(t.filter(pa.array(side == 1))[left_key])
        )
        if len(rk) == 0 or lt.num_rows == 0:
            return lt if negate else lt.slice(0, 0)
        hit = pc.is_in(lt[left_key], value_set=rk)
        return lt.filter(pc.invert(hit) if negate else hit)

    return both.repartition(
        num_blocks=num_partitions, keys=[left_key]
    ).map_batches(exists_block, batch_format="pyarrow", batch_size=None)


RANK_HASH_A = 0x9E3779B97F4A7C15
RANK_HASH_B = 0xD1B54A32D192ED03
RANK_SAMPLE_K = 4096


def global_rank(
    ds: ray.data.Dataset,
    score_col: str,
    id_col: str,
    ntile: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact global ``row_number() OVER (ORDER BY score DESC, id ASC)``
    for EVERY row — a distributed order-statistics primitive, without a
    monolithic sort materialization of the wide table.

    Protocol (all exchanges are narrow: only (id, score) rows move):

    1. bottom-k-hash sample of scores → up to B-1 range cut points
       (layout-invariant; cuts affect only balance, never the result);
    2. each row gets a range id ``pid`` via ``searchsorted`` — EQUAL
       scores always land in the SAME range, so intra-score id-ordering
       never crosses a partition (skew caveat: one hot score value = one
       hot partition, same assumption class as sessionize);
    3. one hash exchange on pid; the narrow shuffled table is
       materialized ONCE (it is the id+score projection, not the data);
    4. per-range counts roll up to the driver as O(B) values → prefix
       offsets broadcast back;
    5. each block sorts by (score DESC, id) and emits
       rank = offset[pid] + position-in-range; ``ntile=k`` additionally
       emits the SQL NTILE(k) bucket derived from rank and the total.

    Output columns: (id_col, score_col, rnk[, tile]).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    narrow = ds.select_columns([id_col, score_col])

    sample = bottom_k_by_hash(
        narrow, id_col, RANK_SAMPLE_K, [score_col], RANK_HASH_A, RANK_HASH_B
    )
    svals = np.unique(
        np.asarray(sample[score_col].to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    )  # ascending distinct sampled scores
    if len(svals) > 1:
        # descending-order ranges: cut on negated scores, ascending
        pick = np.linspace(0, len(svals) - 1, min(num_partitions, len(svals)),
                           dtype=np.int64)
        cuts_neg = np.sort(-svals[pick])[:-1]
    else:
        cuts_neg = np.empty(0, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = np.searchsorted(cuts_neg, -s, side="right").astype(np.int64)
        return pa.table(
            {id_col: t[id_col], score_col: t[score_col],
             "pid": pa.array(pid)}
        )

    part = narrow.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=num_partitions, keys=["pid"]).materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        pid = t["pid"].to_numpy(zero_copy_only=False)
        c = np.bincount(pid, minlength=len(cuts_neg) + 1).astype(np.int64)
        return pa.table(
            {"pid": pa.array(np.arange(len(c), dtype=np.int64)),
             "n": pa.array(c)}
        )

    from ray.data.aggregate import Sum

    cnt_rows = part.map_batches(
        count_partial, batch_format="pyarrow"
    ).groupby("pid", num_partitions=4).aggregate(
        Sum("n", alias_name="n")
    ).take_all()  # <= B rows on the driver, by construction
    counts = np.zeros(len(cuts_neg) + 1, dtype=np.int64)
    for r in cnt_rows:
        counts[r["pid"]] = r["n"]
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    n_total = int(counts.sum())

    if ntile is not None:
        q, r = divmod(n_total, ntile)
        tile_edge = r * (q + 1)

    def rank_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {id_col: pa.array([], pa.int64()),
                    score_col: pa.array([], pa.int64()),
                    "rnk": pa.array([], pa.int64())}
            if ntile is not None:
                cols["tile"] = pa.array([], pa.int64())
            return pa.table(cols)
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pid = t["pid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))
        pid_o = pid[order]
        # position within each contiguous pid segment (pid is a
        # monotone function of -score, so the sort groups ranges)
        newseg = np.concatenate(([True], pid_o[1:] != pid_o[:-1]))
        seg_start = np.maximum.accumulate(
            np.where(newseg, np.arange(len(pid_o)), 0)
        )
        rnk = offsets[pid_o] + (np.arange(len(pid_o)) - seg_start) + 1
        cols = {id_col: pa.array(ids[order]),
                score_col: pa.array(s[order]),
                "rnk": pa.array(rnk.astype(np.int64))}
        if ntile is not None:
            in_big = rnk <= tile_edge
            big = (rnk - 1) // (q + 1)
            small = r + (rnk - 1 - tile_edge) // max(q, 1)
            cols["tile"] = pa.array(
                (np.where(in_big, big, small) + 1).astype(np.int64)
            )
        return pa.table(cols)

    return part.map_batches(
        rank_block, batch_format="pyarrow", batch_size=None
    )


def rebalance_mixture(
    ds: ray.data.Dataset,
    source_col: str,
    id_col: str,
    shares: dict[str, float],
    target_frac: float,
    hash_a: int,
    hash_b: int,
) -> ray.data.Dataset:
    """Dataset-mixing sampler: downsample each source so the kept corpus
    approaches ``target_frac`` of the input with per-source proportions
    ``shares`` (the domain-reweighting step of a training-data mix).

    Two passes, both narrow: (1) per-source row counts via a tiny
    partial+final aggregate (O(#sources) rows ever reach the driver);
    (2) a deterministic keyed-hash filter at per-source rate
    ``min(1, shares[s] * target_total / n_s)``.  Membership is a pure
    function of (id, source) — reproducible across cluster sizes and
    block layouts, and exactly SQL-checkable: the rate arithmetic is
    float64 ``share * target / n`` then ``floor(rate * 2^32)``,
    matching ``CAST(floor(least(1.0, share*target/n)*4294967296) AS
    BIGINT)`` in DuckDB bit-for-bit (IEEE doubles, same evaluation
    order).  Sources absent from ``shares`` are dropped.
    """
    from ray.data.aggregate import Sum

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {source_col: t[source_col],
             "n": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        ).group_by([source_col]).aggregate([("n", "sum")])
        return g.rename_columns([source_col, "n"])

    cnt = ds.select_columns([source_col]).map_batches(
        count_partial, batch_format="pyarrow"
    ).groupby(source_col, num_partitions=2).aggregate(
        Sum("n", alias_name="n")
    ).take_all()  # O(#sources) rows
    n_by_src = {r[source_col]: r["n"] for r in cnt}
    target_total = float(int(target_frac * sum(n_by_src.values())))
    thr = {
        s: int(np.floor(
            min(1.0, shares[s] * target_total / n_by_src[s]) * 4294967296.0
        ))
        for s in n_by_src if s in shares
    }

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * np.uint64(hash_a) + np.uint64(hash_b)) >> np.uint64(32)
        enc = pc.dictionary_encode(t[source_col].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        lims = np.array(
            [thr.get(s.as_py(), 0) for s in enc.dictionary], dtype=np.uint64
        )
        return t.filter(pa.array(h < lims[codes]))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def grouped_topk(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Top-k rows PER GROUP by (order_col DESC, id_col ASC), with the
    per-group rank — SQL ``QUALIFY row_number() OVER (PARTITION BY g
    ORDER BY o DESC, id) <= k``.

    Scale shape: each block first prunes to its LOCAL top-k per group
    (vectorized lexsort + segment arithmetic, no per-group Python), so
    at most k rows per (block, group) enter the one hash exchange; the
    final per-group cut runs the same kernel on co-located groups.
    Output: (group_col, order_col, id_col, rnk).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def cut(t: pa.Table, with_rank: bool) -> pa.Table:
        if t.num_rows == 0:
            sch = t.schema
            cols = {c: t[c] for c in (group_col, order_col, id_col)
                    if c in sch.names}
            if with_rank:
                cols["rnk"] = pa.array([], pa.int64())
            return pa.table(cols) if cols else t
        g = t[group_col].combine_chunks()
        enc = pc.dictionary_encode(g)
        gc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        o = t[order_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -o, gc))
        gs = gc[order]
        newseg = np.concatenate(([True], gs[1:] != gs[:-1]))
        seg_start = np.maximum.accumulate(
            np.where(newseg, np.arange(len(gs)), 0)
        )
        pos = np.arange(len(gs)) - seg_start
        sel = order[pos < k]
        out = pa.table(
            {group_col: g.take(pa.array(sel)),
             order_col: pa.array(o[sel]),
             id_col: pa.array(ids[sel])}
        )
        if with_rank:
            out = out.append_column(
                "rnk", pa.array((pos[pos < k] + 1).astype(np.int64))
            )
        return out

    parts = ds.select_columns([group_col, order_col, id_col]).map_batches(
        lambda t: cut(t, False), batch_format="pyarrow", zero_copy_batch=True
    )
    return parts.repartition(
        num_blocks=num_partitions, keys=[group_col]
    ).map_batches(
        lambda t: cut(t, True), batch_format="pyarrow", batch_size=None
    )


def broadcast_interval_join(
    ds: ray.data.Dataset,
    value_col: str,
    bands: pa.Table,
    band_col: str = "band",
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> ray.data.Dataset:
    """RANGE JOIN against a broadcast interval table: each row gets the
    band whose [lo, hi) contains its value (sorted non-overlapping
    intervals; rows outside every band are DROPPED — inner semantics).
    The band table rides in the task closure (it is dimension-table
    sized: price bands, geo ranges, SLA tiers); lookup is ONE
    ``searchsorted`` per batch — never a shuffle of the fact side, the
    same 100TB shape as the broadcast hash join."""
    order = pc.sort_indices(bands, sort_keys=[(lo_col, "ascending")])
    bands = bands.take(order)
    los = bands[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
    his = bands[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
    names = bands[band_col]

    def assign(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(los, v, side="right") - 1
        ok = (idx >= 0) & (v < his[np.clip(idx, 0, len(his) - 1)])
        kept = t.filter(pa.array(ok))
        return kept.append_column(
            band_col, pc.take(names, pa.array(idx[ok], pa.int64()))
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def _fine_grain_counts(
    ds: ray.data.Dataset,
    keys: list[str],
    num_partitions: int | None,
) -> tuple[ray.data.Dataset, dict]:
    """Finest-grain (k1..kn, n) counts via the usual partial+final
    combine, materialized so ROLLUP/CUBE derive every coarser grain
    from #groups rows instead of rescanning the fact table."""
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {**{k: t[k] for k in keys},
             "n": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        ).group_by(keys).aggregate([("n", "sum")])
        return g.rename_columns(keys + ["n"])

    fine = ds.select_columns(keys).map_batches(
        count_partial, batch_format="pyarrow"
    ).groupby(
        keys, num_partitions=auto_partitions(ds, num_partitions)
    ).aggregate(Sum("n", alias_name="n")).materialize()
    sch = fine.schema()
    types = {k: sch.types[sch.names.index(k)] for k in keys}
    return fine, types


def rollup_counts(
    ds: ray.data.Dataset,
    keys: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """GROUP BY ROLLUP(keys...): counts at every prefix grain —
    (k1..kn), (k1..kn-1), ..., () — with NULLs in aggregated-out key
    columns, exactly SQL's ROLLUP result shape.

    Scale shape: ONE full-data pass builds the finest grain via the
    usual partial+final combine; every coarser grain is then derived
    from the PREVIOUS grain's (already tiny) aggregate — n-1 extra
    narrow groupbys over #groups rows, never another scan of the fact
    table.  Output: (*keys, n).
    """
    from ray.data.aggregate import Sum

    fine, types = _fine_grain_counts(ds, keys, num_partitions)

    def widen(level: int):
        # null out keys beyond `level` (grain = first `level` keys)
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for i, k in enumerate(keys):
                cols[k] = (t[k] if i < level
                           else pa.nulls(t.num_rows, types[k]))
            cols["n"] = t["n"]
            return pa.table(cols)
        return fn

    levels = [fine]
    prev = fine
    for level in range(len(keys) - 1, 0, -1):
        agg = prev.groupby(
            keys[:level], num_partitions=2
        ).aggregate(Sum("n", alias_name="n")).map_batches(
            widen(level), batch_format="pyarrow"  # re-add NULL columns
        ).materialize()
        levels.append(agg)
        prev = agg
    total = prev.sum("n") or 0  # () grain: global sum over #groups rows
    levels.append(ray.data.from_arrow(pa.table(
        {**{k: pa.nulls(1, types[k]) for k in keys},
         "n": pa.array([int(total)], pa.int64())}
    )))
    out = levels[0]
    for ex in levels[1:]:
        out = out.union(ex)
    return out


def pivot_count(
    ds: ray.data.Dataset,
    row_col: str,
    pivot_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """PIVOT: one output row per ``row_col`` value, one ``n_<v>`` count
    column per distinct ``pivot_col`` value — SQL conditional
    aggregation ``count(*) FILTER (WHERE pivot = v)``.

    Protocol: (1) distinct pivot values via per-block unique partials
    (narrow; the pivot domain is assumed SMALL — that is the pivot
    contract, a thousand-column table is a modeling error, not a scale
    path); (2) each block 2-D-bincounts (row_code x pivot_code) into an
    ALREADY-WIDE partial, so the exchange carries |rows-per-block
    distinct| x (|domain|+1) cells, never raw rows; (3) one hash
    groupby sums the wide partials.  NULL pivot values count toward no
    column (SQL FILTER semantics); the row key still appears.
    """
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    uniq = ds.select_columns([pivot_col]).map_batches(
        lambda t: pa.table({pivot_col: pc.unique(
            pc.drop_null(t[pivot_col].combine_chunks())
        )}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    vals = sorted(v for v in uniq.unique(pivot_col) if v is not None)
    val_arr = pa.array(vals)
    ncols = [f"n_{v}" for v in vals]
    sch = ds.schema()
    row_type = sch.types[sch.names.index(row_col)]
    v = len(vals)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {row_col: pa.array([], row_type)}
            cols.update({c: pa.array([], pa.int64()) for c in ncols})
            return pa.table(cols)
        enc = pc.dictionary_encode(t[row_col].combine_chunks())
        rcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pos = pc.index_in(t[pivot_col].combine_chunks(), value_set=val_arr)
        pcode = pos.to_numpy(zero_copy_only=False)
        nr = len(enc.dictionary)
        valid = ~np.isnan(pcode) if pcode.dtype.kind == "f" else np.ones(
            len(pcode), dtype=bool
        )
        flat = np.bincount(
            (rcode[valid] * v + pcode[valid].astype(np.int64)),
            minlength=nr * v,
        ).reshape(nr, v) if v else np.zeros((nr, 0), dtype=np.int64)
        cols = {row_col: enc.dictionary}
        for j, c in enumerate(ncols):
            cols[c] = pa.array(flat[:, j].astype(np.int64))
        return pa.table(cols)

    parts = ds.select_columns([row_col, pivot_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # wide-but-short partials size the combine
    return parts.groupby(
        row_col, num_partitions=auto_partitions(parts, num_partitions)
    ).aggregate(*[Sum(c, alias_name=c) for c in ncols])


def grouped_corr_q(
    ds: ray.data.Dataset,
    key: str,
    x_col: str,
    y_col: str,
    q: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group Pearson correlation with a DETERMINISTIC float result:
    x is fixed-pointed at the row level (floor x 10^q), all five moments
    (sx, sy, sxx, syy, sxy) and n are EXACT integer sums (so any block
    layout / summation order gives identical numbers), and the single
    float expression ``num / sqrt(d1 * d2)`` runs once per group over
    those integers — a SQL twin computing the same moments in HUGEINT
    and the same final expression matches bit-for-bit, which no
    streaming corr() (Welford) implementation can.

    DOMAIN BOUND (documented, not checked per row): int64 partial sums
    are exact while |x_q|, |y| and group row counts keep
    ``n * max(x_q^2)`` below 2^63 — at web scale beyond that, widen the
    partial dtype to float128/object in `partial`, the protocol is
    unchanged.  The finalize block sees #groups rows and uses Python
    bigints, so the num/denom products never overflow.

    Output: (key, n, sx, sy, sxx, syy, sxy, corr_xy) — corr NULL when
    either variance term is <= 0 (constant column), per SQL CASE.
    """
    import math

    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    scale = float(10 ** q)
    moments = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    sch = ds.schema()
    key_type = sch.types[sch.names.index(key)]

    def partial(t: pa.Table) -> pa.Table:
        xq = pc.cast(
            pc.floor(pc.multiply(pc.cast(t[x_col], pa.float64()), scale)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        y = pc.cast(t[y_col], pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table(
            {key: t[key],
             "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
             "sx": pa.array(xq), "sy": pa.array(y),
             "sxx": pa.array(xq * xq), "syy": pa.array(y * y),
             "sxy": pa.array(xq * y)}
        ).group_by([key]).aggregate([(c, "sum") for c in moments])
        return g.rename_columns([key] + moments)

    parts = ds.select_columns([key, x_col, y_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    tot = parts.groupby(
        key, num_partitions=auto_partitions(parts, num_partitions)
    ).aggregate(*[Sum(c, alias_name=c) for c in moments])

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {key: pa.array([], key_type)}
            cols.update({c: pa.array([], pa.int64()) for c in moments})
            cols["corr_xy"] = pa.array([], pa.float64())
            return pa.table(cols)
        rows = t.to_pylist()
        corr = []
        for r in rows:  # #groups rows only; Python bigints, no overflow
            n, sx, sy = r["n"], r["sx"], r["sy"]
            d1 = n * r["sxx"] - sx * sx
            d2 = n * r["syy"] - sy * sy
            if d1 > 0 and d2 > 0:
                corr.append(
                    float(n * r["sxy"] - sx * sy)
                    / math.sqrt(float(d1) * float(d2))
                )
            else:
                corr.append(None)
        out = {key: t[key]}
        out.update({c: t[c] for c in moments})
        out["corr_xy"] = pa.array(corr, pa.float64())
        return pa.table(out)

    return tot.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def grouped_sigma_outliers(
    ds: ray.data.Dataset,
    key: str,
    id_col: str,
    x_col: str,
    q: int = 4,
    sigma: int = 3,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group k-sigma outlier flagging — the "drop statistically
    absurd rows" quality filter — with an ORDER-INVARIANT cut: moments
    (n, sx, sxx) are exact integer sums over row-level fixed-point
    values, and the cut |n*xq - sx| > bound is evaluated per group with
    ``bound = floor(sqrt(double(sigma^2 * (n*sxx - sx^2))))`` — the one
    float op is a shared deterministic rule both this engine and the
    SQL twin compute identically, so the flag set is bit-reproducible
    (a streaming stddev would not be).

    Scale shape: pass 1 is a narrow moments combine (#groups rows);
    the per-group integer cut is rearranged DRIVER-SIDE with Python
    bigints into plain int64 (lo, hi) thresholds per group
    (xq > hi  <=>  n*xq > sx + bound, exactly), so pass 2 is an
    embarrassingly-parallel broadcast-lookup filter with no per-row
    wide arithmetic and no overflow.  Output: flagged
    (id_col, key, xq) rows.
    """
    import math

    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    scale = float(10 ** q)
    I64MAX, I64MIN = (1 << 63) - 1, -(1 << 63)

    def xq_of(t: pa.Table) -> pa.Table:
        xq = pc.cast(
            pc.floor(pc.multiply(pc.cast(t[x_col], pa.float64()), scale)),
            pa.int64(),
        )
        return pa.table({id_col: t[id_col], key: t[key], "xq": xq})

    prepped = ds.select_columns([id_col, key, x_col]).map_batches(
        xq_of, batch_format="pyarrow", zero_copy_batch=True
    )

    def mpartial(t: pa.Table) -> pa.Table:
        xq = t["xq"].to_numpy(zero_copy_only=False)
        g = pa.table(
            {key: t[key],
             "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
             "sx": pa.array(xq), "sxx": pa.array(xq * xq)}
        ).group_by([key]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sxx", "sum")]
        )
        return g.rename_columns([key, "n", "sx", "sxx"])

    parts = prepped.map_batches(
        mpartial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    rows = parts.groupby(
        key, num_partitions=auto_partitions(parts, num_partitions)
    ).aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sxx", alias_name="sxx"),
    ).take_all()  # #groups rows only
    bounds: dict = {}
    for r in rows:
        n, sx, sxx = int(r["n"]), int(r["sx"]), int(r["sxx"])
        d = sigma * sigma * (n * sxx - sx * sx)
        b = int(math.floor(math.sqrt(float(d)))) if d > 0 else 0
        # xq*n > sx+b  <=>  xq >= (sx+b)//n + 1  (exact, n > 0)
        hi = (sx + b) // n + 1 if n else I64MAX
        # xq*n < sx-b  <=>  xq <= -((-(sx-b))//n) - 1
        lo = -((-(sx - b)) // n) - 1 if n else I64MIN
        bounds[r[key]] = (max(min(lo, I64MAX), I64MIN),
                          max(min(hi, I64MAX), I64MIN))
    ref = ray.put(bounds)

    class Flag:
        def __init__(self, bref):
            b = ray.get(bref)
            self.keys = pa.array(sorted(b))
            ks = sorted(b)
            self.lo = np.array([b[k][0] for k in ks], dtype=np.int64)
            self.hi = np.array([b[k][1] for k in ks], dtype=np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            pos = pc.index_in(
                t[key].combine_chunks(), value_set=self.keys
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            xq = t["xq"].to_numpy(zero_copy_only=False)
            out = (xq <= self.lo[pos]) | (xq >= self.hi[pos])
            return t.filter(pa.array(out))

    return prepped.map_batches(
        Flag, fn_constructor_kwargs={"bref": ref},
        batch_format="pyarrow", concurrency=_pool(),
    )


def cube_counts(
    ds: ray.data.Dataset,
    keys: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """GROUP BY CUBE(keys...): counts at EVERY subset grain (2^n of
    them), NULLs in aggregated-out key columns — SQL's CUBE shape.

    Scale shape: one full-data pass builds the finest grain (shared
    ``_fine_grain_counts`` combine); every other subset aggregates the
    materialized fine grain (#groups rows) — 2^n - 1 narrow groupbys
    that never rescan the fact table.  n is assumed small (CUBE over
    many keys is a modeling error: the output itself is 2^n tables).
    Output: (*keys, n).
    """
    import itertools

    from ray.data.aggregate import Sum

    fine, types = _fine_grain_counts(ds, keys, num_partitions)

    def widen(subset: tuple):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (t[k] if k in subset
                           else pa.nulls(t.num_rows, types[k]))
            cols["n"] = t["n"]
            return pa.table(cols)
        return fn

    levels = [fine]
    for r in range(len(keys) - 1, 0, -1):
        for subset in itertools.combinations(keys, r):
            agg = fine.groupby(
                list(subset), num_partitions=2
            ).aggregate(Sum("n", alias_name="n")).map_batches(
                widen(subset), batch_format="pyarrow"
            ).materialize()
            levels.append(agg)
    total = fine.sum("n") or 0
    levels.append(ray.data.from_arrow(pa.table(
        {**{k: pa.nulls(1, types[k]) for k in keys},
         "n": pa.array([int(total)], pa.int64())}
    )))
    out = levels[0]
    for ex in levels[1:]:
        out = out.union(ex)
    return out


def grouping_sets_counts(
    ds: ray.data.Dataset,
    keys: list[str],
    sets: list[tuple[str, ...]],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """GROUP BY GROUPING SETS ((...), ...): counts at exactly the
    REQUESTED grains (each a subset of ``keys``), NULLs in
    aggregated-out key columns — the general form ROLLUP and CUBE are
    sugar for, needed when a report wants, say, (lang) and (source)
    marginals without the (lang, source) cross table.

    Scale shape: ONE full-data pass builds the finest grain (the union
    of all requested sets, via the shared ``_fine_grain_counts``
    combine); every requested set then aggregates the materialized
    fine grain (#groups rows) — |sets| narrow groupbys that never
    rescan the fact table.  The empty set () is allowed and becomes
    the global total.  Output: (*keys, n), one row block per grain,
    duplicate sets rejected (SQL would emit duplicate rows; that is a
    modeling error here).
    """
    from ray.data.aggregate import Sum

    norm = [tuple(s) for s in sets]
    if len(set(norm)) != len(norm):
        raise ValueError(f"duplicate grouping sets: {sets}")
    for s in norm:
        unknown = [k for k in s if k not in keys]
        if unknown:
            raise ValueError(f"grouping set {s} not a subset of {keys}")
    fine, types = _fine_grain_counts(ds, keys, num_partitions)

    def widen(subset: tuple):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (t[k] if k in subset
                           else pa.nulls(t.num_rows, types[k]))
            cols["n"] = t["n"]
            return pa.table(cols)
        return fn

    levels = []
    for subset in norm:
        if set(subset) == set(keys):
            levels.append(fine)
        elif subset:
            levels.append(fine.groupby(
                list(subset), num_partitions=2
            ).aggregate(Sum("n", alias_name="n")).map_batches(
                widen(subset), batch_format="pyarrow"
            ).materialize())
        else:
            total = fine.sum("n") or 0
            levels.append(ray.data.from_arrow(pa.table(
                {**{k: pa.nulls(1, types[k]) for k in keys},
                 "n": pa.array([int(total)], pa.int64())}
            )))
    out = levels[0]
    for ex in levels[1:]:
        out = out.union(ex)
    return out


def unpivot_q(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    q: int = 4,
) -> ray.data.Dataset:
    """UNPIVOT / melt: wide measure columns -> long (ids..., measure,
    value_q{q}) rows, values row-level fixed-pointed so the SQL
    UNION-ALL twin matches exactly.  Embarrassingly parallel: each batch
    emits one sliced table per measure and concatenates — no exchange,
    output is |value_cols| x input rows by contract.
    """
    scale = float(10 ** q)
    vname = f"value_q{q}"

    def block(t: pa.Table) -> pa.Table:
        outs = []
        for c in value_cols:
            vq = pc.cast(
                pc.floor(pc.multiply(pc.cast(t[c], pa.float64()), scale)),
                pa.int64(),
            )
            cols = {k: t[k] for k in id_cols}
            cols["measure"] = pa.array([c] * t.num_rows, pa.string())
            cols[vname] = vq
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    return ds.select_columns(id_cols + value_cols).map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True
    )


BLOOM_M_BITS = 1 << 20  # 128 KiB bitmap broadcast
BLOOM_H1 = 0x9E3779B97F4A7C15
BLOOM_H2 = 0xC2B2AE3D27D4EB4F


def _bloom_positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """k double-hashed bit positions per key, flattened (int64)."""
    v = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = v * np.uint64(BLOOM_H1)
        h2 = v * np.uint64(BLOOM_H2) | np.uint64(1)
        pos = np.concatenate([
            ((h1 + np.uint64(i) * h2) % np.uint64(m_bits))
            for i in range(k_hashes)
        ])
    return pos.astype(np.int64)


def bloom_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    carry_cols: list[str],
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Semi-join with BLOOM-FILTER PRUNING: output is EXACTLY
    ``semi_join(left, right, ...)`` — the Bloom filter has no false
    negatives, so it only REDUCES what the exact existence exchange
    must carry; false positives proceed to the exact pass and are
    eliminated there.  This is the classic join-pruning pattern: at
    100 TB the left fact table is filtered map-side against a 128 KiB
    broadcast bitmap BEFORE paying the shuffle, cutting exchange bytes
    by the true selectivity.

    Build: per-block partials emit distinct SET-BIT POSITIONS (narrow
    int rows, never bitmaps) through one single-partition reduce that
    materializes the m-bit bitmap once; ``ray.put`` broadcasts it.
    Integer keys only (hash upstream for strings).
    """
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def pos_partial(t: pa.Table) -> pa.Table:
        k = t[right_key].combine_chunks()
        k = pc.drop_null(k).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table(
                {"pos": pa.array([], pa.int64()),
                 "_mrg": pa.array([], pa.int32())}
            )
        pos = np.unique(_bloom_positions(np.unique(k), m_bits, k_hashes))
        return pa.table(
            {"pos": pa.array(pos),
             "_mrg": pa.array(np.zeros(len(pos), dtype=np.int32))}
        )

    def build_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(m_bits // 64, dtype=np.uint64)
        p = t["pos"].to_numpy(zero_copy_only=False)
        np.bitwise_or.at(bm, p // 64, np.uint64(1) << (p % 64).astype(np.uint64))
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.binary())})

    row = (
        right.select_columns([right_key])
        .map_batches(pos_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .repartition(num_blocks=1, keys=["_mrg"])
        .map_batches(build_bitmap, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    bm = (np.frombuffer(row[0]["bitmap"], dtype=np.uint64)
          if row else np.zeros(m_bits // 64, dtype=np.uint64))
    bm_ref = ray.put(bm)

    class Prefilter:
        def __init__(self, ref):
            self.bm = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[left_key]))  # NULL never matches
            k = t[left_key].combine_chunks().to_numpy(zero_copy_only=False)
            pos = _bloom_positions(k, m_bits, k_hashes).reshape(k_hashes, -1)
            hit = np.ones(len(k), dtype=bool)
            for i in range(k_hashes):
                p = pos[i]
                hit &= (self.bm[p // 64]
                        >> (p % 64).astype(np.uint64)) & np.uint64(1) == 1
            return t.filter(pa.array(hit))

    pruned = left.select_columns([left_key] + carry_cols).map_batches(
        Prefilter, fn_constructor_kwargs={"ref": bm_ref},
        batch_format="pyarrow", concurrency=_pool(),
    )
    return semi_join(
        pruned, right, left_key, right_key, carry_cols, num_partitions
    )


# ---------------------------------------------------------------------------
# general outer hash join (LEFT / FULL): null-filling equality join
# ---------------------------------------------------------------------------

def outer_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    left_cols: list[str],
    right_cols: list[str],
    how: str = "left",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed LEFT / FULL OUTER equality join — the null-filling
    complement of the inner/semi/anti family (Luzzu analogue: J1/J2
    vocabulary joins, /root/reference/README.md:14, generalized to
    preserve unmatched records the way QPRO problem reports keep
    un-assessed resources).

    Shape: both sides conform to ONE schema (shared key column, each
    side's payload columns null on the other side, an int8 side tag),
    union, ONE hash exchange on the key, then a per-block vectorized
    kernel resolves matches:

    * the block's key column is dictionary-encoded ONCE (both sides
      share the encoding, so any key dtype — int, string, date —
      reduces to int codes);
    * right codes are stably argsorted; each left code finds its match
      range via two ``searchsorted`` calls; 1:N duplication is a
      ``repeat`` + range-flatten (no Python per-row work);
    * unmatched left rows emit with null right payload (LEFT and FULL);
      unmatched right rows emit with null left payload (FULL only),
      found with one boolean scatter over the hit index.

    SQL NULL semantics: a NULL key matches nothing, but the row itself
    is preserved on its own side's outer direction.

    Skew note: like every hash join, one hot key lands in one reduce
    block; the repo's salting protocol (sessionize_salted) applies if a
    key's match product exceeds a block.  Both sides ship ONLY
    key+payload projections through the exchange.
    """
    if how not in ("left", "full"):
        raise ValueError(f"how must be 'left' or 'full', got {how!r}")
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    if num_partitions is None:
        # Both sides flow through the ONE unioned exchange, so the
        # width must cover their combined row count, not just the left.
        # The WALKED upper bound (read->map/filter chains resolve to
        # parquet footer counts) sizes correctly where the exact count
        # is unavailable — a filtered side merely over-counts, which
        # only tops the width out early; the cluster-cap fallback on a
        # 165k-row join was 128 partitions of pure fixed shuffle cost
        # (tpch_q13 17s -> ~3s after this fix).
        from luzzu_ray.ops.dedup import (_default_parts, _size_partitions,
                                         count_upper_bound_if_cheap)

        nl = count_upper_bound_if_cheap(left)
        nr = count_upper_bound_if_cheap(right)
        if nl is not None and nr is not None:
            num_partitions = _size_partitions(nl + nr, _default_parts(None))
        else:
            num_partitions = _default_parts(None)
    lsch, rsch = left.schema(), right.schema()
    ltypes = {c: lsch.types[lsch.names.index(c)] for c in left_cols}
    rtypes = {c: rsch.types[rsch.names.index(c)] for c in right_cols}
    key_type = lsch.types[lsch.names.index(left_key)]
    emit_right_unmatched = how == "full"

    def conform_left(t: pa.Table) -> pa.Table:
        cols = {left_key: t[left_key]}
        cols.update({c: t[c] for c in left_cols})
        cols.update({c: pa.nulls(t.num_rows, rtypes[c]) for c in right_cols})
        cols["_side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def conform_right(t: pa.Table) -> pa.Table:
        cols = {left_key: pc.cast(t[right_key], key_type)}
        cols.update({c: pa.nulls(t.num_rows, ltypes[c]) for c in left_cols})
        cols.update({c: t[c] for c in right_cols})
        cols["_side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    both = left.select_columns([left_key] + left_cols).map_batches(
        conform_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.select_columns([right_key] + right_cols).map_batches(
            conform_right, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    out_names = [left_key] + left_cols + right_cols

    def join_block(t: pa.Table) -> pa.Table:
        side = t["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        body = t.drop_columns(["_side"])
        lt = body.filter(pa.array(side == 0))
        rt = body.filter(pa.array(side == 1))
        if lt.num_rows == 0 and not emit_right_unmatched:
            return body.slice(0, 0)
        # shared integer codes for any key dtype; null -> -1 sentinel
        enc = pc.dictionary_encode(body[left_key].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        codes = np.where(np.isnan(codes), -1, codes).astype(np.int64) \
            if codes.dtype.kind == "f" else codes.astype(np.int64)
        lc = codes[side == 0]
        rc = codes[side == 1]
        rvalid = np.flatnonzero(rc >= 0)          # null right keys match nothing
        rs = rvalid[np.argsort(rc[rvalid], kind="stable")]
        rk_sorted = rc[rs]
        lo = np.searchsorted(rk_sorted, lc, side="left")
        hi = np.searchsorted(rk_sorted, lc, side="right")
        null_l = lc < 0
        lo = np.where(null_l, 0, lo)
        hi = np.where(null_l, 0, hi)              # null left keys match nothing
        cnt = hi - lo
        total = int(cnt.sum())
        l_idx = np.repeat(np.arange(len(lc), dtype=np.int64), cnt)
        excl = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        pos = np.repeat(lo, cnt) + (
            np.arange(total, dtype=np.int64) - np.repeat(excl, cnt)
        )
        r_idx = rs[pos]
        matched = lt.take(pa.array(l_idx)).select([left_key] + left_cols)
        for c in right_cols:
            matched = matched.append_column(c, rt[c].take(pa.array(r_idx)))
        parts = [matched]
        miss_l = np.flatnonzero(cnt == 0)
        if len(miss_l):
            parts.append(lt.take(pa.array(miss_l)).select(out_names))
        if emit_right_unmatched:
            hit_r = np.zeros(rt.num_rows, dtype=bool)
            hit_r[r_idx] = True
            miss_r = np.flatnonzero(~hit_r)
            if len(miss_r):
                parts.append(rt.take(pa.array(miss_r)).select(out_names))
        return pa.concat_tables(parts)

    return both.repartition(
        num_blocks=num_partitions, keys=[left_key]
    ).map_batches(join_block, batch_format="pyarrow", batch_size=None)


def dataset_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    old_key: str,
    new_key: str,
    old_col: str,
    new_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Keyed diff of two dataset versions — the regression check a
    pipeline rerun needs (Luzzu analogue: comparing quality-metadata
    snapshots across assessments, /root/reference/README.md:8): per key,
    status in {added, removed, changed, same} comparing ``old_col`` vs
    ``new_col`` null-safely (null == null counts as same).

    Built ON the outer-join engine: each side gains an int8 presence
    marker, one FULL outer hash exchange co-locates versions, and a
    vectorized case kernel classifies.  Only (key, payload) projections
    move.  Output: (key as ``old_key``, status).

    NULL keys identify nothing and are EXCLUDED from the diff on both
    sides (a full-join oracle would otherwise misread its own null-fill
    markers and call a preserved null-key old row "added").
    """
    def mark(name, key_col):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[key_col]))
            return t.append_column(
                name, pa.array(np.ones(t.num_rows, dtype=np.int8)))
        return fn

    o = old.select_columns([old_key, old_col]).map_batches(
        mark("_in_old", old_key), batch_format="pyarrow",
        zero_copy_batch=True)
    renamed = new.select_columns([new_key, new_col])
    ncol = new_col
    if new_col == old_col:
        ncol = new_col + "__new"
        renamed = renamed.rename_columns({new_col: ncol})
    n = renamed.map_batches(
        mark("_in_new", new_key), batch_format="pyarrow",
        zero_copy_batch=True)

    j = outer_hash_join(
        o, n, old_key, new_key,
        left_cols=[old_col, "_in_old"], right_cols=[ncol, "_in_new"],
        how="full", num_partitions=num_partitions,
    )

    def classify(t: pa.Table) -> pa.Table:
        in_old = pc.is_valid(t["_in_old"])
        in_new = pc.is_valid(t["_in_new"])
        a, b = t[old_col], t[ncol]
        same_val = pc.or_kleene(
            pc.equal(a, b),
            pc.and_(pc.is_null(a), pc.is_null(b)),
        )
        same_val = pc.fill_null(same_val, False)
        status = pc.if_else(
            pc.invert(in_old), pa.scalar("added"),
            pc.if_else(
                pc.invert(in_new), pa.scalar("removed"),
                pc.if_else(same_val, pa.scalar("same"),
                           pa.scalar("changed")),
            ),
        )
        return pa.table({old_key: t[old_key], "status": status})

    return j.map_batches(classify, batch_format="pyarrow",
                         batch_size=None)


def grouped_argmax(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    tie_col: str,
    carry_cols: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group ARGMAX with full row carry: the row with the greatest
    ``order_col`` per key, ties broken by smallest ``tie_col`` — SQL
    ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY o DESC, t)
    = 1`` — e.g. "latest event per user, with payload".

    Scale shape: argmax is MERGEABLE, so unlike the window ops this
    needs NO key co-location of full groups — each block reduces to one
    candidate row per key it sees (vectorized lexsort + segment-first),
    ONLY those candidates enter the hash exchange (#keys x #blocks
    upper bound, independent of group size), and the same kernel on
    co-located candidates yields the global winner.  A hot key costs
    one candidate per block, never its full history in one place.

    ``order_col`` must be numeric or timestamp (negated for the sort);
    ``key`` may be any dtype (dictionary-encoded per block).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    cols = [key, order_col, tie_col] + carry_cols

    def best_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(cols)
        enc = pc.dictionary_encode(t[key].combine_chunks())
        kc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ocol = t[order_col].combine_chunks()
        o_null = pc.is_null(ocol).to_numpy(zero_copy_only=False)
        o = ocol.to_numpy(zero_copy_only=False)
        if o.dtype.kind == "M":
            o = o.view(np.int64)
        if o.dtype.kind in "iub":
            # Descending key via bitwise-not: strictly monotone
            # decreasing with NO overflow (negating INT64_MIN — NaT's
            # sentinel — or any uint64 would wrap and flip the order).
            desc = ~o
        else:
            desc = -o  # floats: no overflow; NaN handled as null below
            o_null = o_null | np.isnan(o)
        tie = t[tie_col].combine_chunks().to_numpy(zero_copy_only=False)
        # o_null before desc in lexsort priority: null/NaT order values
        # LOSE to any concrete value (SQL ORDER BY o DESC NULLS LAST).
        order = np.lexsort((tie, desc, o_null, kc))
        ks = kc[order]
        first = np.concatenate(([True], ks[1:] != ks[:-1]))
        return t.select(cols).take(pa.array(order[first]))

    parts = ds.select_columns(cols).map_batches(
        best_block, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    width = auto_partitions(parts, num_partitions)
    return parts.repartition(
        num_blocks=width, keys=[key]
    ).map_batches(best_block, batch_format="pyarrow", batch_size=None)


def _codes_with_null(arr: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """Dictionary-encode into int64 codes where NULL gets its own code
    ``len(dictionary)`` (a null dict index comes back as NaN from
    to_numpy, and ``.astype(int64)`` would turn it into INT64_MIN
    garbage).  Returns (codes, dictionary-with-trailing-null) so
    ``dict.take(codes)`` round-trips nulls."""
    enc = pc.dictionary_encode(arr)
    idx = enc.indices
    nullm = pc.is_null(idx).to_numpy(zero_copy_only=False)
    raw = idx.to_numpy(zero_copy_only=False)
    if nullm.any():
        codes = np.where(
            nullm, len(enc.dictionary), np.nan_to_num(raw)
        ).astype(np.int64)
        d = pa.concat_arrays([
            enc.dictionary,
            pa.array([None], enc.dictionary.type),
        ])
        return codes, d
    return raw.astype(np.int64), enc.dictionary


def grouped_count_share(
    ds: ray.data.Dataset,
    key: str,
    subkey: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Ratio-to-report: per (key, subkey) count plus the key's total —
    SQL ``count(*)`` with ``sum(count(*)) OVER (PARTITION BY key)`` —
    emitted as EXACT integers (n, key_total) so the share n/key_total
    is reconstructible without float divergence.

    Scale shape: each block pre-reduces to its local (key, subkey, n)
    counts, ONE hash exchange on ``key`` co-locates a key's (bounded:
    |distinct subkeys|) partial rows, and the final block computes
    per-key totals with one segmented sum — no second exchange, no
    window materialization.  A hot key costs |subkeys| rows per block
    in the exchange, never its raw rows."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def partial(t: pa.Table) -> pa.Table:
        # count_all, not count(subkey): SQL count(*) keeps null groups
        g = t.group_by([key, subkey]).aggregate([([], "count_all")])
        return pa.table(
            {key: g[key], subkey: g[subkey],
             "n": pc.cast(g["count_all"], pa.int64())}
        )

    parts = ds.select_columns([key, subkey]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    width = auto_partitions(parts, num_partitions)
    psch = parts.schema()
    key_t = psch.types[psch.names.index(key)]
    sub_t = psch.types[psch.names.index(subkey)]

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], key_t),
                 subkey: pa.array([], sub_t),
                 "n": pa.array([], pa.int64()),
                 "key_total": pa.array([], pa.int64())}
            )
        kc, kd = _codes_with_null(t[key].combine_chunks())
        sc, sd = _codes_with_null(t[subkey].combine_chunks())
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        vs = len(sd)
        comb = kc * vs + sc
        uniq, inv = np.unique(comb, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, n)
        uk, us = uniq // vs, uniq % vs
        # per-key totals: uniq is sorted, so keys are contiguous
        newk = np.concatenate(([True], uk[1:] != uk[:-1]))
        starts = np.flatnonzero(newk)
        ends = np.concatenate((starts[1:], [len(uk)]))
        ktot = np.add.reduceat(tot, starts)
        key_total = np.repeat(ktot, ends - starts)
        return pa.table(
            {key: kd.take(pa.array(uk)),
             subkey: sd.take(pa.array(us)),
             "n": pa.array(tot),
             "key_total": pa.array(key_total)}
        )

    return parts.repartition(
        num_blocks=width, keys=[key]
    ).map_batches(finalize, batch_format="pyarrow", batch_size=None)


def grouped_distinct_count(
    ds: ray.data.Dataset,
    key: str | list[str],
    value_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """EXACT per-group distinct count — SQL ``count(DISTINCT v) GROUP
    BY k`` (``key`` may be one column or a composite list) — the exact
    complement of the KMV estimator in ``ops.sketch.kmv_distinct_by``
    (use the sketch when a group's distinct set exceeds block memory).

    Scale shape: each block pre-reduces to its DISTINCT (key, value)
    pairs (one Arrow group_by, no Python), so the exchange carries
    block-local pair vocabularies, never raw rows; the final block
    dedups the co-located pairs once more and counts per key.  NULL
    values are ignored (SQL COUNT semantics); NULL keys form their own
    group (SQL GROUP BY semantics)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    keys = [key] if isinstance(key, str) else list(key)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        return t.select(keys + [value_col]).group_by(
            keys + [value_col]).aggregate([])

    parts = ds.select_columns(keys + [value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    width = auto_partitions(parts, num_partitions)
    psch = parts.schema()
    key_ts = {k: psch.types[psch.names.index(k)] for k in keys}

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], key_ts[k]) for k in keys},
                 "n_distinct": pa.array([], pa.int64())}
            )
        d = t.group_by(keys + [value_col]).aggregate([])
        g = d.group_by(keys).aggregate([(value_col, "count")])
        return pa.table(
            {**{k: g[k] for k in keys},
             "n_distinct": pc.cast(g[f"{value_col}_count"], pa.int64())}
        )

    return parts.repartition(
        num_blocks=width, keys=keys
    ).map_batches(finalize, batch_format="pyarrow", batch_size=None)


def grouped_mad_q(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    q: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group MEDIAN ABSOLUTE DEVIATION over fixed-point values —
    the robust dispersion statistic outlier pipelines prefer to sigma
    (one wild value cannot move it).  Exact and SQL-checkable: values
    quantize once to integers (floor(v * 10^q)), the per-group discrete
    median (DuckDB ``quantile_disc`` semantics, as in
    ``grouped_quantiles_q``) and the median of |vq - med| are both
    computed IN THE SAME co-located block, so the whole statistic costs
    ONE keyed exchange — no second pass, no medians join (a v1 of this
    op joined a medians table back and paid 3 sequential executions;
    both passes need full-group co-location anyway, so fusing them is
    strictly better).  Co-location assumption and the heavy-hitter
    escape hatch are the same as ``grouped_quantiles_q``.

    Output: (key, mad_q0, n)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    scale = float(10 ** q)

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], pa.int64()),
                 "mad_q0": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        k = t[key].to_numpy(zero_copy_only=False)
        vf = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        vq = np.floor(vf * scale).astype(np.int64)
        order = np.lexsort((vq, k))
        ks, vs = k[order], vq[order]
        new_g = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new_g)
        counts = np.diff(np.concatenate((starts, [len(ks)])))
        med_idx = starts + np.maximum(
            np.ceil(0.5 * counts).astype(np.int64) - 1, 0)
        seg = np.repeat(np.arange(len(starts)), counts)
        dev = np.abs(vs - vq[order][med_idx][seg])
        order2 = np.lexsort((dev, ks))
        dev_s = dev[order2]
        mad = dev_s[starts + np.maximum(
            np.ceil(0.5 * counts).astype(np.int64) - 1, 0)]
        return pa.table(
            {key: pa.array(ks[starts]),
             "mad_q0": pa.array(mad),
             "n": pa.array(counts.astype(np.int64))}
        )

    picked = ds.select_columns([key, value_col])
    part = picked.repartition(num_blocks=num_partitions, keys=[key])
    return part.map_batches(per_block, batch_format="pyarrow",
                            batch_size=None)


def grouped_winsorize_q(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    id_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    q: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group WINSORIZATION: clip each row's fixed-point value to its
    group's [lo, hi] discrete quantiles — the outlier-taming transform
    robust aggregate pipelines apply before averaging.  Exact: values
    quantize to integers once, the cut points are DuckDB
    ``quantile_disc`` order statistics, and the clip is integer
    min/max, all inside the ONE co-located block (same single-exchange
    fusion as ``grouped_mad_q``; same co-location assumption and
    sketch escape hatch as ``grouped_quantiles_q``).

    Output: (id_col, key, value_q{q}, value_wins_q{q})."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    scale = float(10 ** q)
    vname, wname = f"value_q{q}", f"value_wins_q{q}"

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 key: pa.array([], pa.int64()),
                 vname: pa.array([], pa.int64()),
                 wname: pa.array([], pa.int64())}
            )
        k = t[key].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        vf = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        vq = np.floor(vf * scale).astype(np.int64)
        order = np.lexsort((vq, k))
        ks, vs = k[order], vq[order]
        new_g = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new_g)
        counts = np.diff(np.concatenate((starts, [len(ks)])))
        lo_i = starts + np.maximum(
            np.ceil(lo * counts).astype(np.int64) - 1, 0)
        hi_i = starts + np.maximum(
            np.ceil(hi * counts).astype(np.int64) - 1, 0)
        seg = np.repeat(np.arange(len(starts)), counts)
        clipped = np.clip(vs, vs[lo_i][seg], vs[hi_i][seg])
        return pa.table(
            {id_col: pa.array(ids[order]),
             key: pa.array(ks),
             vname: pa.array(vs),
             wname: pa.array(clipped)}
        )

    picked = ds.select_columns([id_col, key, value_col])
    part = picked.repartition(num_blocks=num_partitions, keys=[key])
    return part.map_batches(per_block, batch_format="pyarrow",
                            batch_size=None)


def salted_inner_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    hot_threshold: int = 1_000_000,
    n_salt: int = 8,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Skew-proof INNER hash join: the sessionize_salted protocol
    applied to joins.  A hot key in a plain hash join lands its entire
    match product in ONE reduce block; here hot LEFT keys fan out over
    ``n_salt`` sub-keys and the (assumed narrower) RIGHT rows for those
    keys replicate once per salt, so no reduce block ever holds more
    than ~1/n_salt of a hot key's probe side.  Join results are
    IDENTICAL to the unsalted join (property-tested) — salting only
    changes placement.

    Hot-key detection is exact: one narrow (key, n) pre-pass over the
    left (per-block partial counts, one groupby); keys above
    ``hot_threshold`` are <= n_rows/threshold, so the hot set is small
    by construction and broadcasts via ``ray.put``.

    Cost note: the pre-pass exchange carries distinct keys per block —
    pay it only when skew is plausible; for known-uniform keys use the
    plain ``Dataset.join``."""
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    width = auto_partitions(left, num_partitions)

    def key_counts(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by(key).aggregate([(key, "count")])
        return pa.table(
            {key: g[key], "n": pc.cast(g[f"{key}_count"], pa.int64())}
        )

    def hot_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t  # partial schema == final schema
        g = t.group_by(key).aggregate([("n", "sum")])
        g = g.rename_columns([key, "n"])
        # only hot keys leave the block: the take_all is O(#hot)
        return g.filter(pc.greater(g["n"], hot_threshold))

    hot_rows = left.map_batches(
        key_counts, batch_format="pyarrow", zero_copy_batch=True,
    ).repartition(num_blocks=width, keys=[key]).map_batches(
        hot_block, batch_format="pyarrow", batch_size=None,
    ).take_all()
    # keep the hot set as a TYPED Arrow array: the key may be string,
    # date, uint64 — never assume int64
    hot_arr = pa.array([r[key] for r in hot_rows]) if hot_rows else None
    hot_ref = ray.put(hot_arr)

    class SaltLeft:
        def __init__(self, ref):
            self.hot = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            salt = np.zeros(t.num_rows, dtype=np.int64)
            if self.hot is not None:
                is_hot = pc.is_in(
                    t[key], value_set=self.hot
                ).to_numpy(zero_copy_only=False).astype(bool)
                # any spread works (results invariant); position hash
                # spreads a hot key's rows evenly within each batch
                salt[is_hot] = (
                    np.flatnonzero(is_hot) % n_salt)
            return t.append_column("_salt", pa.array(salt))

    class SaltRight:
        def __init__(self, ref):
            self.hot = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            salt = np.zeros(t.num_rows, dtype=np.int64)
            out = t.append_column("_salt", pa.array(salt))
            if self.hot is not None:
                is_hot = pc.is_in(
                    t[key], value_set=self.hot
                ).to_numpy(zero_copy_only=False).astype(bool)
                if is_hot.any():
                    hot_part = t.filter(pa.array(is_hot))
                    reps = []
                    for s in range(1, n_salt):
                        reps.append(hot_part.append_column(
                            "_salt",
                            pa.array(np.full(hot_part.num_rows, s,
                                             dtype=np.int64))))
                    out = pa.concat_tables([out] + reps)
            return out

    lsalted = left.map_batches(
        SaltLeft, fn_constructor_args=(hot_ref,),
        concurrency=_pool(), batch_format="pyarrow")
    rsalted = right.map_batches(
        SaltRight, fn_constructor_args=(hot_ref,),
        concurrency=_pool(), batch_format="pyarrow")
    joined = lsalted.join(
        rsalted, join_type="inner", on=(key, "_salt"),
        num_partitions=width,
    )
    return joined.drop_columns(["_salt"])


def distinct_set_op(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    col: str,
    op: str,
    right_col: str | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """SQL ``INTERSECT`` / ``EXCEPT`` (DISTINCT set semantics) on one
    column — the two set operators UNION (D2) didn't cover.

    Both sides reduce to per-block DISTINCT values before the single
    keyed exchange (only unique values move); each reduce block holds
    every occurrence of its values, so one vectorized membership test
    finishes the operator.  NULLs follow SQL set-op semantics: NULL is
    a value, so it intersects with NULL and survives EXCEPT only when
    absent on the right.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"unknown set op {op!r}")
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    rcol = right_col or col
    width = auto_partitions(left, num_partitions)
    ltype = left.schema().types[left.schema().names.index(col)]

    def conform(side: int, src: str):
        def fn(t: pa.Table) -> pa.Table:
            v = pc.unique(pc.cast(t[src], ltype))
            return pa.table({
                col: v,
                "_side": pa.array(np.full(len(v), side, dtype=np.int8)),
            })
        return fn

    both = left.select_columns([col]).map_batches(
        conform(0, col), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.select_columns([rcol]).map_batches(
            conform(1, rcol), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    keep_hits = op == "intersect"

    def block(t: pa.Table) -> pa.Table:
        side = t["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        lv = pc.unique(t.filter(pa.array(side == 0))[col])
        rv = t.filter(pa.array(side == 1))[col]
        if len(lv) == 0:
            return pa.table({col: pa.array([], ltype)})
        # NULL-aware membership: skip_nulls=False makes null match null
        hit = pc.is_in(lv, value_set=pc.unique(rv.combine_chunks()),
                       skip_nulls=False)
        return pa.table({
            col: lv.filter(hit if keep_hits else pc.invert(hit))
        })

    return both.repartition(
        num_blocks=width, keys=[col]
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


def merge_summaries(
    old_summary_path: str,
    delta: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    num_partitions: int = 2,
) -> ray.data.Dataset:
    """Incremental summary maintenance: publish ``old ∪ delta`` with one
    grouped sum — additive summaries (counts, sums, any commutative
    monoid stored as columns) update without rescanning old data.

    ``old_summary_path`` must be readable by every node (shared storage
    on a cluster); the caller persists the NEW merged summary for the
    next increment.  Exactness is associativity: the merge is
    bit-identical to a full recompute, which is how the conformance
    oracle checks it.
    """
    from ray.data.aggregate import Sum

    old = ray.data.read_parquet(old_summary_path)
    return old.union(delta).groupby(
        keys, num_partitions=num_partitions
    ).aggregate(*[Sum(c, alias_name=c) for c in sum_cols])


def grouped_pct_rank(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group percentile-rank normalization (quality-score
    CALIBRATION for mixing corpora: a raw score is only comparable
    within its source, its within-group percentile is comparable
    across sources).  ``pct_q4 = (row_number - 1) * 10^4 //
    (group_size - 1)`` with deterministic (value, id) ordering —
    row-number-based so ties break exactly like the SQL twin, and a
    singleton group is 0.

    One keyed exchange co-locates each group; ranking is one lexsort
    per reduce block.  Output: (group_col, id_col, value_col, pct_q4).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    width = auto_partitions(ds, num_partitions)
    picked = ds.select_columns([group_col, value_col, id_col])
    sch = picked.schema()
    gtype = sch.types[0]
    vtype = sch.types[1]
    itype = sch.types[2]

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                group_col: pa.array([], gtype),
                id_col: pa.array([], itype),
                value_col: pa.array([], vtype),
                "pct_q4": pa.array([], pa.int64()),
            })
        g = t[group_col].combine_chunks()
        gcodes = pc.dictionary_encode(g).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False)
        i = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, v, gcodes))
        gs, vs, isrt = gcodes[order], v[order], i[order]
        new_g = np.concatenate(([True], gs[1:] != gs[:-1]))
        starts = np.flatnonzero(new_g)
        sizes = np.diff(np.append(starts, len(gs)))
        rown = np.arange(len(gs), dtype=np.int64) - np.repeat(
            starts, sizes)
        denom = np.maximum(np.repeat(sizes, sizes) - 1, 1)
        pct = rown * 10_000 // denom
        return pa.table({
            group_col: g.take(pa.array(order)),
            id_col: pa.array(isrt),
            value_col: pa.array(vs),
            "pct_q4": pa.array(pct),
        })

    return picked.repartition(
        num_blocks=width, keys=[group_col]
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


def binary_auc(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact ROC-AUC of an INTEGER score against a boolean label — the
    Mann-Whitney U statistic with average-rank tie handling, reported
    as exact integers: ``u2 = 2U = sum_v np_v * (2*cumneg_<v + nn_v)``
    over ascending distinct score values v, and ``auc_q6 =
    (u2 * 10^6) // (2 * n_pos * n_neg)`` (NULL when one class is
    empty).  The quality-filter eval metric: "does the score actually
    rank kept docs above dropped ones".

    Scale shape: per-block (score, n_pos, n_neg) partials (bounded by
    the block's distinct scores), one gather into a single reduce block
    bounded by the DISTINCT-SCORE DOMAIN — callers must pass a
    quantized score whose domain is bounded (e.g. ratio scores in
    [0, 2e6]), which is what makes a global rank statistic computable
    without a global sort.  The final U accumulation falls back to
    Python ints when the a-priori bound 2 * n * n_pos >= 2^63 would
    risk int64 overflow (the repo's _exact_group_sum convention).
    """
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"score": pa.array([], pa.int64()),
                 "np_": pa.array([], pa.int64()),
                 "nn_": pa.array([], pa.int64()),
                 "_mrg": pa.array([], pa.int32())}
            )
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(bool)
        u, inv = np.unique(s, return_inverse=True)
        npos = np.bincount(inv, weights=lab, minlength=len(u))
        tot = np.bincount(inv, minlength=len(u))
        return pa.table(
            {"score": pa.array(u),
             "np_": pa.array(npos.astype(np.int64)),
             "nn_": pa.array((tot - npos).astype(np.int64)),
             "_mrg": pa.array(np.zeros(len(u), dtype=np.int32))}
        )

    def final(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False)
        np_in = t["np_"].to_numpy(zero_copy_only=False)
        nn_in = t["nn_"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(s, return_inverse=True)
        # int64 scatter-adds (float bincount weights would lose
        # exactness past 2^53 per-score totals at corpus scale)
        npos = np.zeros(len(u), dtype=np.int64)
        nneg = np.zeros(len(u), dtype=np.int64)
        np.add.at(npos, inv, np_in)
        np.add.at(nneg, inv, nn_in)
        n_pos, n_neg = int(npos.sum()), int(nneg.sum())
        n = n_pos + n_neg
        if n_pos == 0 or n_neg == 0:
            u2, auc = (0, None)
        elif 2 * n * n_pos < 2**63:
            cumneg = np.concatenate(([0], np.cumsum(nneg)[:-1]))
            u2 = int((npos * (2 * cumneg + nneg)).sum())
            auc = (u2 * 1_000_000) // (2 * n_pos * n_neg)
        else:  # exactness beyond the int64 bound: Python-int accumulation
            u2, cum = 0, 0
            for p, q in zip(npos.tolist(), nneg.tolist()):
                u2 += p * (2 * cum + q)
                cum += q
            auc = (u2 * 1_000_000) // (2 * n_pos * n_neg)
        return pa.table(
            {"n_pos": pa.array([n_pos], pa.int64()),
             "n_neg": pa.array([n_neg], pa.int64()),
             "u2": pa.array([u2], pa.int64()),
             "auc_q6": pa.array([auc], pa.int64())}
        )

    parts = ds.select_columns([score_col, label_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return parts.repartition(num_blocks=1, keys=["_mrg"]).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def grouped_trimmed_sum_q(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    lo: float = 0.1,
    hi: float = 0.9,
    q: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group TRIMMED statistics: rows whose fixed-point value falls
    inside the group's [lo, hi] discrete-quantile cut points are kept
    and reported as exact integers (n_kept, sum_q{q}) — the robust-mean
    building block (the caller divides; no float mean is emitted, so a
    SQL twin matches bit-for-bit).  Value-based trim: ties AT a cut
    point are all kept, exactly like SQL ``BETWEEN quantile_disc(lo)
    AND quantile_disc(hi)``.

    Same single-exchange co-located-group shape, quantile formula and
    escape-hatch notes as :func:`grouped_winsorize_q`.
    Output: (key, n_kept, sum_q{q})."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    scale = float(10 ** q)
    sname = f"sum_q{q}"

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], pa.int64()),
                 "n_kept": pa.array([], pa.int64()),
                 sname: pa.array([], pa.int64())}
            )
        k = t[key].to_numpy(zero_copy_only=False)
        vf = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        vq = np.floor(vf * scale).astype(np.int64)
        order = np.lexsort((vq, k))
        ks, vs = k[order], vq[order]
        new_g = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new_g)
        counts = np.diff(np.concatenate((starts, [len(ks)])))
        lo_i = starts + np.maximum(
            np.ceil(lo * counts).astype(np.int64) - 1, 0)
        hi_i = starts + np.maximum(
            np.ceil(hi * counts).astype(np.int64) - 1, 0)
        seg = np.repeat(np.arange(len(starts)), counts)
        keep = (vs >= vs[lo_i][seg]) & (vs <= vs[hi_i][seg])
        n_kept = np.add.reduceat(keep.astype(np.int64), starts)
        sums = np.add.reduceat(np.where(keep, vs, 0), starts)
        return pa.table(
            {key: pa.array(ks[starts]),
             "n_kept": pa.array(n_kept),
             sname: pa.array(sums)}
        )

    # only (key, value) cross the exchange — the output is per-group
    picked = ds.select_columns([key, value_col])
    part = picked.repartition(num_blocks=num_partitions, keys=[key])
    return part.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    )


def grouped_ks_vs_rest(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> pa.Table:
    """EXACT two-sample Kolmogorov-Smirnov distance of each group's
    integer-value distribution against the REST of the dataset — the
    distribution-drift diagnostic ("does source A's length profile
    differ from everything else?").

    Output: (group, n_group, n_rest, ks_q6) with
    ``ks_q6 = max_x |F_g(x) - F_rest(x)| * 1e6`` computed as exact
    rationals: the max of ``|cum_g(x) * n_rest - cum_rest(x) * n_g|``
    over the distinct-value grid, floor-divided by ``n_g * n_rest`` in
    PYTHON ints (the numerator reaches n_g*n_rest*1e6 ~ 1e24 at
    billion-row groups — past int64 by design, never materialized in a
    fixed-width column).

    Scale shape: one (group, value)-keyed grouped count is the only
    exchange; the driver holds the VALUE-COUNT table (groups x distinct
    values — doc-length-style domains, not row counts; the same bound
    as a grouped histogram finalize).  ECDFs only step at observed
    values, so evaluating on the distinct-value grid is exact.
    """
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def vc_partial(t: pa.Table) -> pa.Table:
        # no empty-block special case: Arrow group_by on a 0-row table
        # preserves input types, where a hardcoded schema would diverge
        # for non-string group columns
        g = t.group_by([group_col, value_col]).aggregate(
            [(value_col, "count")])
        return pa.table({
            group_col: g[group_col],
            value_col: pc.cast(g[value_col], pa.int64()),
            "c": pc.cast(g[f"{value_col}_count"], pa.int64()),
        })

    parts = ds.select_columns([group_col, value_col]).map_batches(
        vc_partial, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    vc = parts.groupby(
        [group_col, value_col],
        num_partitions=auto_partitions(parts, num_partitions),
    ).aggregate(Sum("c", alias_name="c")).take_all()

    from collections import defaultdict

    counts: dict = defaultdict(dict)
    for r in vc:
        counts[r[group_col]][r[value_col]] = int(r["c"])
    grid = sorted({v for m in counts.values() for v in m})
    tot_of = {v: sum(m.get(v, 0) for m in counts.values()) for v in grid}
    n_total = sum(tot_of.values())
    groups = sorted(counts)
    out_g, out_n, out_r, out_ks = [], [], [], []
    for g in groups:
        m = counts[g]
        n_g = sum(m.values())
        n_r = n_total - n_g
        cum_g = 0
        cum_t = 0
        best = 0
        for v in grid:
            cum_g += m.get(v, 0)
            cum_t += tot_of[v]
            cum_r = cum_t - cum_g
            best = max(best, abs(cum_g * n_r - cum_r * n_g))
        out_g.append(g)
        out_n.append(n_g)
        out_r.append(n_r)
        out_ks.append(best * 1_000_000 // (n_g * n_r) if n_g and n_r
                      else 0)
    return pa.table({
        group_col: pa.array(out_g),
        "n_group": pa.array(out_n, pa.int64()),
        "n_rest": pa.array(out_r, pa.int64()),
        "ks_q6": pa.array(out_ks, pa.int64()),
    })


def binary_pr_curve(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
) -> ray.data.Dataset:
    """Exact precision/recall curve of an INTEGER score against a
    boolean label: one row per distinct score value v with the
    confusion counts of the rule "keep iff score >= v" and exact-
    rational q6 metrics (``precision_q6 = tp*1e6 // (tp+fp)``,
    ``recall_q6 = tp*1e6 // n_pos``, ``f1_q6 = 2*tp*1e6 //
    (2*tp+fp+fn)``) — the threshold-picking companion to
    :func:`binary_auc` ("where on the score axis do we cut?").

    Scale shape: identical to :func:`binary_auc` — per-block
    (score, n_pos, n_neg) partials bounded by the block's distinct
    scores, one gather into a reduce block bounded by the QUANTIZED
    SCORE DOMAIN (callers pass q6-style scores), reverse-cumulative
    sums there.  Metric division falls back to Python ints when
    ``n * 1e6`` approaches int64 (the _exact_group_sum convention).
    """
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"score": pa.array([], pa.int64()),
                 "np_": pa.array([], pa.int64()),
                 "nn_": pa.array([], pa.int64()),
                 "_mrg": pa.array([], pa.int32())}
            )
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(bool)
        u, inv = np.unique(s, return_inverse=True)
        npos = np.bincount(inv, weights=lab, minlength=len(u))
        tot = np.bincount(inv, minlength=len(u))
        return pa.table(
            {"score": pa.array(u),
             "np_": pa.array(npos.astype(np.int64)),
             "nn_": pa.array((tot - npos).astype(np.int64)),
             "_mrg": pa.array(np.zeros(len(u), dtype=np.int32))}
        )

    def final(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False)
        np_in = t["np_"].to_numpy(zero_copy_only=False)
        nn_in = t["nn_"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(s, return_inverse=True)
        npos = np.zeros(len(u), dtype=np.int64)
        nneg = np.zeros(len(u), dtype=np.int64)
        np.add.at(npos, inv, np_in)
        np.add.at(nneg, inv, nn_in)
        n_pos, n_neg = int(npos.sum()), int(nneg.sum())
        # keep iff score >= v: reverse cumulative over descending v
        tp = npos[::-1].cumsum()[::-1]
        fp = nneg[::-1].cumsum()[::-1]
        fn = n_pos - tp
        if (n_pos + n_neg) * 2_000_000 < 2**63:
            prec = tp * 1_000_000 // (tp + fp)  # tp+fp >= 1 at observed v
            f1 = 2 * tp * 1_000_000 // (2 * tp + fp + fn)
            rec_arr = (pa.array(tp * 1_000_000 // n_pos, pa.int64())
                       if n_pos else pa.nulls(len(u), pa.int64()))
        else:  # exactness beyond int64: Python-int division
            prec = [p * 1_000_000 // (p + q)
                    for p, q in zip(tp.tolist(), fp.tolist())]
            f1 = [2 * p * 1_000_000 // (2 * p + q + r) for p, q, r
                  in zip(tp.tolist(), fp.tolist(), fn.tolist())]
            rec_arr = (pa.array(
                [p * 1_000_000 // n_pos for p in tp.tolist()], pa.int64())
                if n_pos else pa.nulls(len(u), pa.int64()))
        return pa.table(
            {"score": pa.array(u, pa.int64()),
             "tp": pa.array(tp, pa.int64()),
             "fp": pa.array(fp, pa.int64()),
             "fn": pa.array(fn, pa.int64()),
             "tn": pa.array(n_neg - fp, pa.int64()),
             "precision_q6": pa.array(np.asarray(prec), pa.int64()),
             "recall_q6": rec_arr,
             "f1_q6": pa.array(np.asarray(f1), pa.int64())}
        )

    parts = ds.select_columns([score_col, label_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return parts.repartition(num_blocks=1, keys=["_mrg"]).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def rater_agreement(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
) -> ray.data.Dataset:
    """Cohen's kappa between two boolean verdict columns — the
    filter-agreement eval ("does the learned classifier agree with the
    heuristic rules beyond chance?").  Output is one row:
    (n, n11, n10, n01, n00, po_q6, kappa_q6) with
    ``kappa = (n*(n11+n00) - (r1*c1 + r0*c0)) / (n^2 - (r1*c1+r0*c0))``
    computed in PYTHON ints (n^2 passes int64 at ~3e9 rows by design)
    and floored to q6; NULL when chance agreement is 1 (a constant
    rater).

    Scale shape: per-block 2x2 cell counts (4 ints), one single-row
    gather — no data-bearing exchange at all.
    """
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"n11": z, "n10": z, "n01": z, "n00": z,
                             "_mrg": pa.array([], pa.int32())})
        a = t[col_a].to_numpy(zero_copy_only=False).astype(bool)
        b = t[col_b].to_numpy(zero_copy_only=False).astype(bool)
        cell = np.bincount(a.astype(np.int64) * 2 + b, minlength=4)
        return pa.table({
            "n11": pa.array([int(cell[3])], pa.int64()),
            "n10": pa.array([int(cell[2])], pa.int64()),
            "n01": pa.array([int(cell[1])], pa.int64()),
            "n00": pa.array([int(cell[0])], pa.int64()),
            "_mrg": pa.array([0], pa.int32()),
        })

    def final(t: pa.Table) -> pa.Table:
        n11 = int(pc.sum(t["n11"]).as_py() or 0)
        n10 = int(pc.sum(t["n10"]).as_py() or 0)
        n01 = int(pc.sum(t["n01"]).as_py() or 0)
        n00 = int(pc.sum(t["n00"]).as_py() or 0)
        n = n11 + n10 + n01 + n00
        r1, r0 = n11 + n10, n01 + n00
        c1, c0 = n11 + n01, n10 + n00
        pe_num = r1 * c1 + r0 * c0  # /n^2
        po_q6 = (n11 + n00) * 1_000_000 // n if n else None
        den = n * n - pe_num
        kappa_q6 = ((n * (n11 + n00) - pe_num) * 1_000_000 // den
                    if den else None)
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "n11": pa.array([n11], pa.int64()),
            "n10": pa.array([n10], pa.int64()),
            "n01": pa.array([n01], pa.int64()),
            "n00": pa.array([n00], pa.int64()),
            "po_q6": pa.array([po_q6], pa.int64()),
            "kappa_q6": pa.array([kappa_q6], pa.int64()),
        })

    parts = ds.select_columns([col_a, col_b]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return parts.repartition(num_blocks=1, keys=["_mrg"]).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def small_group_rows(
    ds: ray.data.Dataset,
    keys: list[str],
    max_n: int,
    k_as: str = "k",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Rows whose group (by ``keys``) has FEWER than ``max_n`` members,
    with the group size attached — the k-anonymity risk filter
    (Sweeney 2002): a record whose quasi-identifier combination is
    shared by < k rows is re-identifiable and must be suppressed or
    generalized before release.

    One hash exchange co-locates each quasi-identifier group, then a
    whole-block lexsort counts groups and emits only the at-risk rows
    (no join, no second pass); output size is bounded by
    ``max_n * #small_groups``, typically a tiny fraction of the input.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(k_as, pa.array([], pa.int64()))
        arrs = [
            t[c].to_numpy(zero_copy_only=False) for c in keys
        ]
        order = np.lexsort(arrs[::-1])
        new_g = np.zeros(t.num_rows, dtype=bool)
        new_g[0] = True
        for a in arrs:
            s = a[order]
            new_g[1:] |= s[1:] != s[:-1]
        starts = np.flatnonzero(new_g)
        counts = np.diff(np.concatenate((starts, [t.num_rows])))
        kk = np.repeat(counts, counts)
        risky = kk < max_n
        out = t.take(pa.array(order[risky]))
        return out.append_column(
            k_as, pa.array(kk[risky].astype(np.int64)))

    part = ds.repartition(num_blocks=num_partitions, keys=keys)
    return part.map_batches(
        block, batch_format="pyarrow", batch_size=None)


KENDALL_GROUP_CAP = 100_000


def grouped_kendall_counts(
    ds: ray.data.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    group_cap: int = KENDALL_GROUP_CAP,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group Kendall rank-agreement PAIR COUNTS between two integer
    columns: (key, n, n_conc, n_disc, n_tie_x, n_tie_y, n_tie_both)
    over all unordered row pairs within the group — the exact integer
    numerators of tau-a/tau-b (the float tau is one driver-side
    expression away; floats stay out of the exchange).

    One keyed exchange co-locates each group; the in-block kernel is a
    CHUNKED pairwise comparison (sign agreement over broadcast strips),
    O(m^2) per group BY SPEC with a loud ``group_cap`` guard — beyond
    the cap use the O(m log m) merge-inversion decomposition (disc =
    inversions of y under x-order with tie splitting), which trades the
    transparent pair semantics for recursion.  Pairs are unordered and
    counted once; NULLs are excluded per column pair (both x and y must
    be valid), matching the SQL self-join twin.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def pick(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t[x_col]), pc.is_valid(t[y_col]))
        t = t.filter(m)
        return pa.table({
            "key": t[key_col],
            "x": pc.cast(t[x_col], pa.int64()),
            "y": pc.cast(t[y_col], pa.int64()),
        })

    empty = pa.table({
        "key": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
        "n_conc": pa.array([], pa.int64()),
        "n_disc": pa.array([], pa.int64()),
        "n_tie_x": pa.array([], pa.int64()),
        "n_tie_y": pa.array([], pa.int64()),
        "n_tie_both": pa.array([], pa.int64()),
    })

    def kendall_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("key", "ascending")])
        keys = t["key"].combine_chunks()
        code = pc.dictionary_encode(keys)
        if isinstance(code, pa.ChunkedArray):
            code = code.combine_chunks()
        cd = code.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        rows = []
        bounds = np.flatnonzero(np.diff(cd)) + 1
        for s, e in zip(
            np.concatenate(([0], bounds)),
            np.concatenate((bounds, [len(cd)])),
        ):
            m = e - s
            if m > group_cap:
                raise ValueError(
                    f"grouped_kendall_counts: group of {m} rows exceeds "
                    f"group_cap={group_cap}; use the merge-inversion "
                    "O(m log m) path for groups beyond the pairwise spec"
                )
            gx, gy = x[s:e], y[s:e]
            conc = disc = tx = ty = tboth = 0
            chunk = max(1, (1 << 22) // max(m, 1))  # ~4M cells per strip
            for lo in range(0, m, chunk):
                hi = min(lo + chunk, m)
                dx = np.sign(gx[lo:hi, None] - gx[None, :])
                dy = np.sign(gy[lo:hi, None] - gy[None, :])
                iu = np.triu(np.ones((hi - lo, m), dtype=bool),
                             k=lo + 1)[:, :m]
                prod = (dx * dy)[iu]
                dxm, dym = dx[iu], dy[iu]
                conc += int((prod == 1).sum())
                disc += int((prod == -1).sum())
                tboth += int(((dxm == 0) & (dym == 0)).sum())
                tx += int(((dxm == 0) & (dym != 0)).sum())
                ty += int(((dxm != 0) & (dym == 0)).sum())
            rows.append((keys[s].as_py(), m * (m - 1) // 2,
                         conc, disc, tx, ty, tboth))
        if not rows:
            return empty
        cols = list(zip(*rows))
        return pa.table({
            "key": pa.array(cols[0], pa.string()),
            "n": pa.array(cols[1], pa.int64()),
            "n_conc": pa.array(cols[2], pa.int64()),
            "n_disc": pa.array(cols[3], pa.int64()),
            "n_tie_x": pa.array(cols[4], pa.int64()),
            "n_tie_y": pa.array(cols[5], pa.int64()),
            "n_tie_both": pa.array(cols[6], pa.int64()),
        })

    picked = ds.map_batches(pick, batch_format="pyarrow",
                            zero_copy_batch=True)
    return picked.repartition(
        num_blocks=num_partitions, keys=["key"]
    ).map_batches(kendall_block, batch_format="pyarrow", batch_size=None)


def grouped_top_fraction_by_score(
    ds: ray.data.Dataset,
    key_col: str,
    score_col: str,
    id_col: str,
    numer: int,
    denom: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-GROUP exact top-``numer/denom`` selection by an integer
    score — the "keep the best P% of each source/language by quality
    score" primitive of adaptive curation (a global threshold lets one
    high-scoring source crowd out every other; per-group thresholds
    are how mixture-preserving filtering is actually run).  Equal to
    SQL's ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY score
    DESC, id) <= ceil(numer * count(*) OVER (PARTITION BY key) /
    denom)`` in exact integer arithmetic; ties at each group's
    boundary score break by ascending ``id_col``.

    Same two-pass shape as ``top_fraction_by_score``, with the driver
    table growing from |score domain| to |keys| x |per-key score
    domain| rows — the score must be quantized (q6-style) and the key
    domain bounded (sources, languages), the same contract as the
    histogram ops; at 100 TB that is still a metadata-sized pull.
    Thresholds broadcast once via ``ray.put``; rows with
    ``score > v*[key]`` stream straight through, boundary ties go
    through a per-key bottom-``r`` trim whose reduce blocks hold
    <= ``#map_blocks * r_key`` rows per key.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns([key_col, id_col, score_col])

    def count_partial(t: pa.Table) -> pa.Table:
        return (
            t.select([key_col, score_col]).group_by([key_col, score_col])
            .aggregate([([], "count_all")])
            .rename_columns([key_col, score_col, "n"])
        )

    def count_merge(t: pa.Table) -> pa.Table:
        return (
            t.group_by([key_col, score_col]).aggregate([("n", "sum")])
            .rename_columns([key_col, score_col, "n"])
        )

    counts = (
        picked.map_batches(count_partial, batch_format="pyarrow")
        .repartition(
            num_blocks=max(4, num_partitions // 8), keys=[key_col]
        )
        .map_batches(count_merge, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    empty = pa.table({
        key_col: pa.array([], pa.string()),
        id_col: pa.array([], pa.int64()),
        score_col: pa.array([], pa.int64()),
    })
    if not counts:
        return ray.data.from_arrow(empty)

    # Driver-side per-key threshold scan (|keys| x |score domain| rows).
    by_key: dict[str, list[tuple[int, int]]] = {}
    for c in counts:
        by_key.setdefault(c[key_col], []).append(
            (int(c[score_col]), int(c["n"])))
    v_star: dict[str, int] = {}
    r_ties: dict[str, int] = {}
    for k, pairs in by_key.items():
        pairs.sort(key=lambda p: -p[0])
        n_total = sum(n for _, n in pairs)
        k_target = (numer * n_total + denom - 1) // denom
        cum = 0
        for v, n in pairs:
            if cum + n >= k_target:
                v_star[k] = v
                r_ties[k] = k_target - cum
                break
            cum += n

    keys_sorted = np.array(sorted(v_star), dtype=object)
    v_arr = np.array([v_star[k] for k in keys_sorted], dtype=np.int64)
    r_arr = np.array([r_ties[k] for k in keys_sorted], dtype=np.int64)
    thr_ref = ray.put((keys_sorted, v_arr, r_arr))

    def _lookup(keys: np.ndarray, table_ref):
        ks, vs, rs = ray.get(table_ref)
        idx = np.searchsorted(ks, keys)
        idx = np.clip(idx, 0, len(ks) - 1)
        ok = ks[idx] == keys
        return idx, ok, vs, rs

    def above_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        keys = np.asarray(
            t[key_col].to_numpy(zero_copy_only=False), dtype=object)
        s = t[score_col].to_numpy(zero_copy_only=False)
        idx, ok, vs, _ = _lookup(keys, thr_ref)
        return t.filter(pa.array(ok & (s > vs[idx]))).select(
            [key_col, id_col, score_col])

    def tie_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        keys = np.asarray(
            t[key_col].to_numpy(zero_copy_only=False), dtype=object)
        s = t[score_col].to_numpy(zero_copy_only=False)
        idx, ok, vs, rs = _lookup(keys, thr_ref)
        t = t.filter(pa.array(ok & (s == vs[idx]))).select(
            [key_col, id_col, score_col])
        if t.num_rows == 0:
            return empty
        # keep the bottom-r[key] ids per key (partial: safe superset)
        t = t.sort_by([(key_col, "ascending"), (id_col, "ascending")])
        keys2 = np.asarray(
            t[key_col].to_numpy(zero_copy_only=False), dtype=object)
        idx2, _, _, rs2 = _lookup(keys2, thr_ref)
        starts = np.r_[0, np.flatnonzero(keys2[1:] != keys2[:-1]) + 1]
        group_of = np.searchsorted(starts, np.arange(len(keys2)), "right") - 1
        rank_in_group = np.arange(len(keys2)) - starts[group_of]
        return t.filter(pa.array(rank_in_group < rs2[idx2]))

    above = picked.map_batches(
        above_fn, batch_format="pyarrow", zero_copy_batch=True)
    trimmed = (
        picked.map_batches(
            tie_partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_blocks=max(4, num_partitions // 8),
                     keys=[key_col])
        .map_batches(tie_partial, batch_format="pyarrow", batch_size=None)
    )
    return above.union(trimmed)


def length_bucket_batches(
    ds: ray.data.Dataset,
    id_col: str,
    len_col: str,
    bucket_size: int,
    batch_budget: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Padding-efficient LENGTH-BUCKETED batching — the dataloader
    primitive that groups similar-length sequences so per-batch padding
    waste is bounded by ``bucket_size`` tokens/row: ``bucket =
    len // bucket_size``; within each bucket rows rank by id ascending
    and fill fixed-size batches of ``max(1, batch_budget //
    ((bucket + 1) * bucket_size))`` rows (the bucket's padded row cost
    is its upper edge).  Output: ``(id, len, bucket, batch_idx)``.

    SQL twin: ``row_number() OVER (PARTITION BY len // BS ORDER BY id)
    - 1`` integer-divided by the per-bucket batch capacity.

    Scale shape: one narrow keyed exchange on bucket (24-byte rows),
    block-local sort + rank (a bucket is co-located whole — the
    sessionize skew contract: one giant bucket = one hot block; salt
    by id range and offset-merge if a single bucket outgrows a worker,
    the conv_structure_audit_salted pattern).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    width = auto_partitions(ds, num_partitions)

    def assign(t: pa.Table) -> pa.Table:
        ln = t[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            len_col: pa.array(ln),
            "bucket": pa.array(ln // bucket_size),
        })

    part = ds.select_columns([id_col, len_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=width, keys=["bucket"])

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                len_col: pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "batch_idx": pa.array([], pa.int64()),
            })
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = t[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, bk))
        bs, is_, ls = bk[order], ids[order], ln[order]
        starts = np.r_[0, np.flatnonzero(bs[1:] != bs[:-1]) + 1]
        g = np.searchsorted(starts, np.arange(len(bs)), "right") - 1
        rnk = np.arange(len(bs)) - starts[g]
        cap = np.maximum(1, batch_budget // ((bs + 1) * bucket_size))
        return pa.table({
            id_col: pa.array(is_),
            len_col: pa.array(ls),
            "bucket": pa.array(bs),
            "batch_idx": pa.array(rnk // cap),
        })

    return part.map_batches(block, batch_format="pyarrow", batch_size=None)


def borda_rank_fusion(
    ds: ray.data.Dataset,
    id_col: str,
    score_cols: list[str],
    k: int,
    num_partitions: int | None = None,
) -> pa.Table:
    """Borda-count fusion of multiple integer quality signals (the
    rank-sum voting rule; the quality-signal sibling of the RRF
    retrieval fusion in ``ann_rrf_fusion``): each signal contributes
    its exact global ``row_number() OVER (ORDER BY signal DESC, id)``
    and the fused score is the SUM of ranks (lower = better on every
    dimension).  Returns the top-``k`` rows by (borda ASC, id ASC)
    with every per-signal rank attached — all-integer, so no float
    weighting can diverge between engine and oracle.

    Scale shape: one :func:`global_rank` pass per signal (narrow
    (id, score) rows through the distributed rank protocol — never the
    payload), the rank tables join on id through len(score_cols) - 1
    narrow hash joins, and only k rows reach the caller.
    """
    from luzzu_ray.ops.dedup import auto_partitions

    width = auto_partitions(ds, num_partitions)
    # one narrow materialization: each rank pass (and its internal
    # bottom-k sample) then reads the projection instead of re-running
    # the caller's upstream lineage once per signal
    base = ds.select_columns([id_col] + score_cols).materialize()
    ranked = None
    for c in score_cols:
        r = global_rank(
            base.select_columns([id_col, c]), c, id_col,
            num_partitions=num_partitions,
        ).map_batches(
            lambda t, c=c: pa.table({
                id_col: t[id_col], f"rnk_{c}": t["rnk"]}),
            batch_format="pyarrow",
        ).repartition(num_blocks=width).materialize()
        if ranked is None:
            ranked = r
        else:
            ranked = ranked.join(
                r, join_type="inner", on=(id_col,), num_partitions=width,
            ).repartition(num_blocks=width).materialize()

    def fuse(t: pa.Table) -> pa.Table:
        cols = {id_col: t[id_col]}
        total = np.zeros(t.num_rows, dtype=np.int64)
        for c in score_cols:
            r = t[f"rnk_{c}"].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[f"rnk_{c}"] = pa.array(r)
            total += r
        cols["borda"] = pa.array(-total)  # negated: topk sorts DESC
        return pa.table(cols)

    top = topk(
        ranked.map_batches(fuse, batch_format="pyarrow"),
        "borda", k, id_col,
    )
    rows = top.take_all()  # at most k rows
    if not rows:  # empty input: typed empty result (review r05)
        return pa.table({
            id_col: pa.array([], pa.int64()),
            **{f"rnk_{c}": pa.array([], pa.int64())
               for c in score_cols},
            "borda": pa.array([], pa.int64()),
        })
    t = pa.Table.from_pylist(rows)
    return pa.table({
        id_col: t[id_col],
        **{f"rnk_{c}": t[f"rnk_{c}"] for c in score_cols},
        "borda": pc.negate(t["borda"]),
    })


def temperature_mixture(
    ds: ray.data.Dataset,
    source_col: str,
    id_col: str,
    target_frac: float,
    hash_a: int,
    hash_b: int,
) -> ray.data.Dataset:
    """Temperature-flattened mixture resampling at alpha = 0.5 (the
    sqrt-scaling of multilingual corpus balancing, Devlin et al. 2019 /
    Conneau & Lample 2019): per-source target shares proportional to
    ``sqrt(n_s)`` instead of ``n_s``, boosting small sources without
    letting them dominate.  alpha is FIXED at 0.5 because ``sqrt`` is
    an IEEE-754 correctly-rounded operation — a scalar twin (or a SQL
    oracle with driver-derived literals) reproduces every threshold
    bit-for-bit, which a libm ``pow(n, alpha)`` cannot guarantee.

    The share normalization sums ``sqrt(n_s)`` in SORTED source order
    (float sums are order-dependent; sorting pins the order for any
    twin).  Selection applies :func:`rebalance_mixture`'s deterministic
    keyed-hash filter — membership is a pure function of (id, source).

    Scale shape: one O(#sources) count reduce, then one exchange-free
    filter map; the count pass runs twice (here and inside
    rebalance_mixture) — both are narrow partial+final aggregates.
    """
    from ray.data.aggregate import Sum

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {source_col: t[source_col],
             "n": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        ).group_by([source_col]).aggregate([("n", "sum")])
        return g.rename_columns([source_col, "n"])

    cnt = ds.select_columns([source_col]).map_batches(
        count_partial, batch_format="pyarrow"
    ).groupby(source_col, num_partitions=2).aggregate(
        Sum("n", alias_name="n")
    ).take_all()  # O(#sources) rows
    n_by_src = {r[source_col]: int(r["n"]) for r in cnt}
    roots = {s: float(np.sqrt(float(n))) for s, n in n_by_src.items()}
    denom = 0.0
    for s in sorted(roots):  # pinned summation order
        denom += roots[s]
    shares = {s: roots[s] / denom for s in roots}
    return rebalance_mixture(
        ds, source_col, id_col, shares, target_frac, hash_a, hash_b)


def curriculum_interleave(
    ds: ray.data.Dataset,
    score_col: str,
    id_col: str,
    n_tiles: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Curriculum data ordering with difficulty interleaving: rows rank
    globally by ``score`` (DESC, id tiebreak — "easiest first" when
    score = easiness), split into ``n_tiles`` NTILE difficulty bands,
    and the training order key ``curriculum_key = rank_in_tile *
    n_tiles + tile`` round-robins one row per band — the
    easy-to-hard-with-mixing schedule (Bengio et al. 2009 curriculum
    learning, the interleaved variant that avoids catastrophic
    distribution shift between phases).  All-integer; a consumer sorts
    by curriculum_key (keys are unique: rank_in_tile strides by
    n_tiles, tile fills the residue).

    Output: (id, score, tile, rank_in_tile, curriculum_key).

    Scale shape: one :func:`global_rank` pass (narrow rank protocol,
    ntile attached); per-tile minimum ranks are an O(n_tiles) driver
    gather broadcast back into an exchange-free map — no second rank
    pass, because rank_in_tile = rnk - min(rnk | tile).
    """
    from ray.data.aggregate import Min

    ranked = global_rank(
        ds.select_columns([id_col, score_col]), score_col, id_col,
        ntile=n_tiles, num_partitions=num_partitions,
    ).materialize()
    base = ranked.groupby("tile", num_partitions=2).aggregate(
        Min("rnk", alias_name="mn")
    ).take_all()  # exactly n_tiles rows
    mn_by_tile = {int(r["tile"]): int(r["mn"]) for r in base}

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                score_col: pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64()),
                "rank_in_tile": pa.array([], pa.int64()),
                "curriculum_key": pa.array([], pa.int64()),
            })
        tile = t["tile"].to_numpy(zero_copy_only=False).astype(np.int64)
        rnk = t["rnk"].to_numpy(zero_copy_only=False).astype(np.int64)
        # vectorized O(n_tiles) lookup, no per-row Python (review r05)
        keys = np.array(sorted(mn_by_tile), dtype=np.int64)
        vals = np.array([mn_by_tile[int(x)] for x in keys],
                        dtype=np.int64)
        base_arr = vals[np.searchsorted(keys, tile)]
        rit = rnk - base_arr
        return pa.table({
            id_col: t[id_col],
            score_col: t[score_col],
            "tile": pa.array(tile),
            "rank_in_tile": pa.array(rit),
            "curriculum_key": pa.array(rit * n_tiles + tile),
        })

    return ranked.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True)


def grouped_mode(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group MODE of a string column (most frequent value, ties to
    the LEXICOGRAPHICALLY SMALLEST — deterministic, unlike SQL
    ``mode()``'s unspecified tie): (key, mode_value, n_mode).

    Scale shape: per-block (key, value, n) partials collapse each
    block BEFORE one key-keyed exchange; the block-final argmax runs
    over the collapsed pairs (bounded by distinct values per key, not
    rows).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    width = auto_partitions(ds, num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                value_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        g = pa.table({
            key_col: t[key_col], value_col: t[value_col],
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        }).group_by([key_col, value_col]).aggregate([("n", "sum")])
        return g.rename_columns([key_col, value_col, "n"])

    part = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=width, keys=[key_col])

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                "mode_value": pa.array([], pa.string()),
                "n_mode": pa.array([], pa.int64()),
            })
        g = t.group_by([key_col, value_col]).aggregate([("n", "sum")])
        # first row per key under (count DESC, value ASC)
        idx = pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), ("n_sum", "descending"),
            (value_col, "ascending")])
        s = g.take(idx)
        keys = s[key_col].to_numpy(zero_copy_only=False)
        lead = np.ones(len(keys), dtype=bool)
        lead[1:] = keys[1:] != keys[:-1]
        out = s.filter(pa.array(lead))
        return pa.table({
            key_col: out[key_col],
            "mode_value": out[value_col],
            "n_mode": out["n_sum"],
        })

    return part.map_batches(final, batch_format="pyarrow", batch_size=None)
