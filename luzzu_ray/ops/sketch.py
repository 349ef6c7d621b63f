"""Mergeable sketches: the bounded-memory path for statistics whose
exact computation needs a whole group co-located (SURVEY.md §2.3 T3 —
Luzzu bounds metric memory with approximate structures `[paper]`,
/root/reference/README.md:12).

``approx_quantiles`` is the heavy-hitter escape hatch documented in
``relational.grouped_quantiles_q``: per-batch partial histograms over
log-spaced bins (relative-error ``eps`` per value), merged by an
ordinary partial+final aggregation — bytes through the shuffle scale
with #groups x #bins (~O(log(range)/eps)), never with rows, and no key
ever needs to fit in one block.  Deterministic: no sampling, identical
results for any block layout (property-tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from luzzu_ray.ops.common import pool as _pool

DEFAULT_EPS = 0.01


def _to_bins(v: np.ndarray, eps: float) -> np.ndarray:
    """Signed log-spaced bin ids: |relative error| <= eps within a bin."""
    base = np.log1p(eps)
    mag = np.floor(np.log1p(np.abs(v)) / base).astype(np.int64)
    return np.where(v < 0, -mag - 1, mag)


def _bin_value(b: np.ndarray, eps: float) -> np.ndarray:
    """Representative value (geometric bin midpoint) for a bin id."""
    base = np.log1p(eps)
    neg = b < 0
    mag = np.where(neg, -b - 1, b).astype(np.float64)
    lo = np.expm1(mag * base)
    hi = np.expm1((mag + 1.0) * base)
    mid = (lo + hi) / 2.0
    return np.where(neg, -mid, mid)


def approx_quantiles(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    quantiles: dict[str, float] | None = None,
    eps: float = DEFAULT_EPS,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-group approximate quantiles with relative error <= ~eps.

    Stage 1 (map): per-batch (key, bin, n) partial histograms — one
    vectorized binning + group_by per batch.  Stage 2: hash-merge the
    partials on (key, bin) and per-block finalize: cumulative counts
    pick each quantile's bin (the quantile_disc index rule:
    ceil(frac * n) - 1), reported as the bin's representative value.
    """
    quantiles = quantiles or {"median": 0.5, "p90": 0.9}
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    sch = ds.schema()
    key_type = sch.types[sch.names.index(key)]

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    key: t[key],
                    "bin": pa.array(_to_bins(v, eps)),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by([key, "bin"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns([key, "bin", "n"])

    parts = ds.select_columns([key, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    # merge histograms: one hash shuffle on the GROUP key so a block
    # holds every (bin, n) row of its groups and can finalize them
    merged = parts.repartition(num_blocks=num_partitions, keys=[key])

    def finalize(t: pa.Table) -> pa.Table:
        names = [f"{name}_approx" for name in quantiles]
        if t.num_rows == 0:
            cols = {key: pa.array([], key_type)}
            cols.update({n: pa.array([], pa.float64()) for n in names})
            cols["n"] = pa.array([], pa.int64())
            return pa.table(cols)
        # dictionary-encode the group key so ANY key type (string,
        # int, ...) sorts/groups through the same int-code path; codes
        # map back to values at the end
        enc = pc.dictionary_encode(t[key].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        key_dict = enc.dictionary
        kk = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bb = t["bin"].to_numpy(zero_copy_only=False)
        nn = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, kk))
        kk, bb, nn = kk[order], bb[order], nn[order]
        # merge duplicate (key, bin) rows from different partial batches
        first = np.concatenate(([True], (kk[1:] != kk[:-1]) | (bb[1:] != bb[:-1])))
        gid = np.cumsum(first) - 1
        nn = np.bincount(gid, weights=nn).astype(np.int64)
        kk, bb = kk[first], bb[first]
        new_k = np.concatenate(([True], kk[1:] != kk[:-1]))
        starts = np.flatnonzero(new_k)
        bounds = np.concatenate((starts, [len(kk)]))
        cum = np.cumsum(nn)
        base = np.concatenate(([0], cum[bounds[1:-1] - 1]))
        within = cum - base[np.cumsum(new_k) - 1]
        totals = within[bounds[1:] - 1]
        cols = {key: key_dict.take(pa.array(kk[starts], pa.int64()))}
        for (name, frac), out in zip(quantiles.items(),
                                     [f"{n}_approx" for n in quantiles]):
            target = np.maximum(np.ceil(frac * totals).astype(np.int64), 1)
            picks = np.empty(len(starts), dtype=np.int64)
            for i in range(len(starts)):
                s, e = bounds[i], bounds[i + 1]
                picks[i] = s + np.searchsorted(within[s:e], target[i])
            cols[out] = pa.array(_bin_value(bb[picks], eps))
        cols["n"] = pa.array(totals)
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow", batch_size=None)


KMV_HASH_A = 0xC2B2AE3D27D4EB4F
KMV_HASH_B = 0x165667B19E3779F9
TWO64 = 1 << 64


def kmv_distinct(
    ds: ray.data.Dataset,
    key_col: str,
    k: int = 256,
) -> ray.data.Dataset:
    """KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002):
    estimate ndistinct(key) with O(k) memory per block and O(k) bytes
    through ONE narrow exchange.  The estimator is a DETERMINISTIC
    function of the key set — (k-1)*2^64 // h_(k) over the k smallest
    keyed hashes, exact integer arithmetic — so a SQL oracle reproduces
    it bit-for-bit (HUGEINT math over the same multiplicative hash);
    when fewer than k distinct hashes exist the exact count is returned.

    Input keys must be integers (quantize floats upstream).
    Output: one row (k, n_distinct_est).
    """
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def partial(t: pa.Table) -> pa.Table:
        v = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = v * np.uint64(KMV_HASH_A) + np.uint64(KMV_HASH_B)
        h = np.unique(h)[:k]  # sorted; bottom-k of this block
        return pa.table(
            {"h": pa.array(h),
             "_mrg": pa.array(np.zeros(len(h), dtype=np.int32))}
        )

    def final(t: pa.Table) -> pa.Table:
        h = np.unique(t["h"].to_numpy(zero_copy_only=False))[:k]
        if len(h) < k:
            est = len(h)
        else:
            est = (k - 1) * TWO64 // (int(h[k - 1]) or 1)
        return pa.table(
            {"k": pa.array([k], pa.int64()),
             "n_distinct_est": pa.array([est], pa.int64())}
        )

    parts = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return parts.repartition(num_blocks=1, keys=["_mrg"]).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def frequent_words(
    ds: ray.data.Dataset,
    denom: int = 500,
    capacity: int = 1024,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """EXACT heavy hitters with bounded memory: every word whose corpus
    count >= ceil(n_tokens / denom), via the two-pass sketch-then-verify
    protocol (Misra-Gries '82 / Manku-Motwani lossy counting, merged per
    Agarwal et al. "Mergeable Summaries" PODS'12).

    Pass A (candidate generation, bounded): each block computes EXACT
    local (word, c) counts and keeps only words with
    ``c * (capacity+1) >= n_block`` — at most capacity+1 rows per block,
    and a dropped word loses < n_block/(capacity+1) count, so after the
    narrow groupby-sum the summed counter satisfies
    ``mg(w) > true(w) - n/(capacity+1)``.  The global candidate prune
    ``mg*(capacity+1) > T*(capacity+1) - n`` (all-integer, no float
    rounding) therefore has RECALL 1 for true count >= T, and keeps at
    most ~n/(T - n/(capacity+1)) ~ 2*denom candidates when
    capacity+1 >= 2*denom (enforced).

    Pass B (exact verify): the tiny candidate list is broadcast via
    ``ray.put``; each block recounts ONLY candidate words (dictionary
    ``index_in`` + bincount), one narrow groupby-sum, filter >= T.

    Scale shape: the exchange carries <= capacity+1 rows per block in
    pass A and <= 2*denom rows per block in pass B — never the token
    stream and never the full vocabulary, unlike a plain
    groupby(word).  Output: (word, n_occ), exactly the SQL
    ``GROUP BY word HAVING count(*) >= (n + denom - 1) // denom``.
    """
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.ops.vocab import _word_partial
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    if capacity + 1 < 2 * denom:
        raise ValueError(
            f"capacity+1={capacity + 1} must be >= 2*denom={2 * denom} "
            "for the candidate-set bound"
        )
    _ensure_hash_shuffle()
    text = ds.select_columns([text_col])

    def ntok_partial(t: pa.Table) -> pa.Table:
        c = pc.count_substring(t[text_col], " ")
        n = int(pc.sum(c).as_py() or 0) + len(
            t[text_col].drop_null()
        )
        return pa.table({"ntok": pa.array([n], pa.int64())})

    n_tokens = int(
        text.map_batches(ntok_partial, batch_format="pyarrow")
        .sum("ntok")
        or 0
    )
    if n_tokens == 0:
        return ray.data.from_arrow(
            pa.table({"word": pa.array([], pa.string()),
                      "n_occ": pa.array([], pa.int64())})
        )
    thresh = (n_tokens + denom - 1) // denom

    def mg_partial(t: pa.Table) -> pa.Table:
        p = _word_partial(t, text_col)
        c = p["tf"].to_numpy(zero_copy_only=False)
        nb = int(c.sum())
        keep = c * (capacity + 1) >= nb
        return pa.table(
            {"word": p["word"].filter(pa.array(keep)),
             "c": pa.array(c[keep].astype(np.int64))}
        )

    parts = text.map_batches(
        mg_partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # narrow: <= capacity+1 rows per block
    mg = parts.groupby(
        "word", num_partitions=auto_partitions(parts, num_partitions)
    ).aggregate(Sum("c", alias_name="c"))
    # all-integer recall-1 prune; bounded to ~2*denom rows by
    # construction.  c*(cap+1) > T*(cap+1) - n  <=>  c >= bound//(cap+1)+1
    # (exact for integers, either sign of the bound)
    bound = thresh * (capacity + 1) - n_tokens
    cmin = bound // (capacity + 1) + 1
    cand_tbl = mg.filter(expr=f"c >= {cmin}").take_all()
    cand = pa.array(sorted(r["word"] for r in cand_tbl), pa.string())
    if len(cand) == 0:
        return ray.data.from_arrow(
            pa.table({"word": pa.array([], pa.string()),
                      "n_occ": pa.array([], pa.int64())})
        )
    cand_ref = ray.put(cand)

    class Recount:
        """Candidate list resolved ONCE per actor; per-batch: split,
        dictionary-encode, index_in against the sorted candidates,
        bincount — exact counts for candidate words only."""

        def __init__(self, ref):
            self.cand = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            p = _word_partial(t, text_col)
            pos = pc.index_in(p["word"], value_set=self.cand)
            hit = pc.is_valid(pos)
            return pa.table(
                {"word": p["word"].filter(hit),
                 "c": p["tf"].filter(hit)}
            )

    counts = text.map_batches(
        Recount, fn_constructor_kwargs={"ref": cand_ref},
        batch_format="pyarrow", concurrency=_pool(),
    ).materialize()
    exact = counts.groupby(
        "word", num_partitions=auto_partitions(counts, num_partitions)
    ).aggregate(Sum("c", alias_name="n_occ"))
    return exact.filter(expr=f"n_occ >= {thresh}")


def kmv_distinct_by(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    k: int = 64,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """GROUPED KMV: ndistinct(key) estimate PER GROUP — the mergeable
    sketch dropped into the partial+final groupby shape.  Each block
    keeps at most k (group, hash) rows per group (sorted unique +
    segment cut, one lexsort per block), the exchange co-locates groups,
    and the same kernel finalizes; the integer estimator matches a SQL
    window oracle exactly.  Output: (group_col, k, n_distinct_est)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    sch = ds.schema()
    gtype = sch.types[sch.names.index(group_col)]

    def bottom(t: pa.Table, finalize: bool) -> pa.Table:
        if t.num_rows == 0:
            if finalize:
                return pa.table(
                    {group_col: pa.array([], gtype),
                     "k": pa.array([], pa.int64()),
                     "n_distinct_est": pa.array([], pa.int64())}
                )
            return pa.table(
                {group_col: pa.array([], gtype),
                 "h": pa.array([], pa.uint64())}
            )
        g = t[group_col].combine_chunks()
        if "h" in t.schema.names:
            h = t["h"].to_numpy(zero_copy_only=False)
        else:
            v = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = v * np.uint64(KMV_HASH_A) + np.uint64(KMV_HASH_B)
        enc = pc.dictionary_encode(g)
        gc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((h, gc))
        gs, hs = gc[order], h[order]
        first = np.concatenate(
            ([True], (gs[1:] != gs[:-1]) | (hs[1:] != hs[:-1]))
        )
        gs, hs = gs[first], hs[first]
        newseg = np.concatenate(([True], gs[1:] != gs[:-1]))
        seg_start = np.maximum.accumulate(
            np.where(newseg, np.arange(len(gs)), 0)
        )
        pos = np.arange(len(gs)) - seg_start
        keep = pos < k
        gs, hs, pos = gs[keep], hs[keep], pos[keep]
        if not finalize:
            return pa.table(
                {group_col: pc.take(enc.dictionary, pa.array(gs)),
                 "h": pa.array(hs)}
            )
        # per group: exact count below k, else (k-1)*2^64 // kth hash
        ends = np.concatenate((np.flatnonzero(pos == 0)[1:], [len(gs)]))
        starts2 = np.flatnonzero(pos == 0)
        counts = ends - starts2
        ests = []
        for s0, c in zip(starts2, counts):
            if c < k:
                ests.append(int(c))
            else:
                ests.append((k - 1) * TWO64 // (int(hs[s0 + k - 1]) or 1))
        return pa.table(
            {group_col: pc.take(enc.dictionary, pa.array(gs[starts2])),
             "k": pa.array(np.full(len(starts2), k, dtype=np.int64)),
             "n_distinct_est": pa.array(np.array(ests, dtype=np.int64))}
        )

    parts = ds.select_columns([group_col, key_col]).map_batches(
        lambda t: bottom(t, False),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return parts.repartition(
        num_blocks=num_partitions, keys=[group_col]
    ).map_batches(
        lambda t: bottom(t, True), batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# count-min sketch over token occurrences (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 1024
# Pairwise-hash params: a < 2^62 (so HUGEINT h*a never overflows in the
# SQL oracle) and odd; b < 2^64.  Fixed public constants.
CMS_A = (
    0x27D4EB2F165667C5 % (1 << 62) | 1,
    0x9E3779B97F4A7C15 % (1 << 62) | 1,
    0xC2B2AE3D27D4EB4F % (1 << 62) | 1,
    0x165667B19E3779F9 % (1 << 62) | 1,
)
CMS_B = (
    0x85EBCA6B2E4F1D3B,
    0x2545F4914F6CDD1D,
    0xFF51AFD7ED558CCD,
    0xC4CEB9FE1A85EC53,
)


def _cms_partial(t: pa.Table, text_col: str) -> pa.Table:
    """Per-block SPARSE count-min partial: nonzero (row, cell, count)
    entries of this block's d x w counter grid over token-occurrence
    hashes (the shared [a-z0-9]+ token hash)."""
    from luzzu_ray.ops.textstats import token_hashes_for_rows

    empty = pa.table(
        {"i": pa.array([], pa.int64()),
         "cell": pa.array([], pa.int64()),
         "c": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    th, _ = token_hashes_for_rows(t.select([text_col]).rename_columns(
        ["text"]))
    if len(th) == 0:
        return empty
    uh, cnts = np.unique(th, return_counts=True)
    out_i, out_cell, out_c = [], [], []
    for i in range(CMS_D):
        with np.errstate(over="ignore"):  # mod-2^64 wrap is the hash
            hv = uh * np.uint64(CMS_A[i]) + np.uint64(CMS_B[i])
        cell = (hv % np.uint64(CMS_W)).astype(np.int64)
        g = np.zeros(CMS_W, dtype=np.int64)
        np.add.at(g, cell, cnts)
        nz = np.flatnonzero(g)
        out_i.append(np.full(len(nz), i, dtype=np.int64))
        out_cell.append(nz.astype(np.int64))
        out_c.append(g[nz])
    return pa.table(
        {"i": pa.array(np.concatenate(out_i)),
         "cell": pa.array(np.concatenate(out_cell)),
         "c": pa.array(np.concatenate(out_c))}
    )


def cms_token_counts(
    ds: ray.data.Dataset,
    probe_tokens: list[str],
    text_col: str = "text",
    num_partitions: int | None = None,
) -> pa.Table:
    """Count-min sketch point queries: estimated occurrence count for
    each probe token, over the corpus's [a-z0-9]+ lowered tokens.

    Deterministic and EXACTLY SQL-reproducible (unlike most sketches):
    the grid is a pure function of the multiset of token hashes, so a
    DuckDB oracle can rebuild every counter from the same public hash
    constants and reach bit-identical estimates — while the engine
    never materializes per-token counts.

    Scale shape: each block emits only its nonzero grid entries (<=
    d*w = 4096 rows, typically far fewer), ONE narrow (i, cell) groupby
    merges partials — counters are fully mergeable by addition — and
    the final d x w grid (32 KiB) returns to the driver for the O(d)
    point lookups.  Estimate >= true count always (one-sided error,
    Cormode & Muthukrishnan 2005); overestimate bounded by collision
    mass e*N/w with prob 1-e^-d.

    Output: pa.Table (token, est) for the probes."""
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    parts = ds.select_columns([text_col]).map_batches(
        _cms_partial, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    merged = parts.groupby(
        ["i", "cell"], num_partitions=auto_partitions(parts, num_partitions)
    ).aggregate(Sum("c", alias_name="c")).take_all()
    grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for r in merged:
        grid[r["i"], r["cell"]] = r["c"]

    from luzzu_ray.functions.text import token_hash_py

    ests = []
    for tok in probe_tokens:
        h = np.uint64(token_hash_py(tok.encode("utf-8")) & ((1 << 64) - 1))
        with np.errstate(over="ignore"):
            cells = [
                int((h * np.uint64(CMS_A[i]) + np.uint64(CMS_B[i]))
                    % np.uint64(CMS_W))
                for i in range(CMS_D)
            ]
        ests.append(int(min(grid[i, cells[i]] for i in range(CMS_D))))
    return pa.table(
        {"token": pa.array(probe_tokens, pa.string()),
         "est": pa.array(ests, pa.int64())}
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet/Fusy/Gandouet/Meunier 2007)
# ---------------------------------------------------------------------------

HLL_P = 10                        # 1024 registers
HLL_GAMMA = 0x9E3779B97F4A7C15    # splitmix64 constants (Steele et al.)
HLL_MIX1 = 0xBF58476D1CE4E5B9
HLL_MIX2 = 0x94D049BB133111EB


def splitmix64(v: np.ndarray) -> np.ndarray:
    """Full-avalanche 64-bit mix (splitmix64 finalizer).  The simple
    affine hash the KMV sketch uses is NOT enough here: HLL reads
    trailing-bit patterns, and an affine image of sequential ids is an
    arithmetic progression mod 2^64 whose low bits are structured (a
    measured ~2x estimator bias on the events fixture).  Every step is
    exact uint64 arithmetic a SQL twin reproduces (xor + // shifts +
    split-multiply mod 2^64 in HUGEINT)."""
    with np.errstate(over="ignore"):
        z = v + np.uint64(HLL_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(HLL_MIX1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(HLL_MIX2)
        return z ^ (z >> np.uint64(31))


def _hll_partial_factory(key_col: str, p: int):
    m = 1 << p
    sentinel = np.uint64(1) << np.uint64(64 - p)

    def partial(t: pa.Table) -> pa.Table:
        v = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(v)
        reg = (h & np.uint64(m - 1)).astype(np.int64)
        # sentinel bit caps rho at 65-p: rho is NEVER degenerate, and a
        # SQL twin recovers it exactly as log2(w & -w) + 1 (w & -w is a
        # power of two <= 2^(64-p), exact in float64)
        w = (h >> np.uint64(p)) | sentinel
        # lowest set bit isolated is a power of two <= 2^(64-p), exactly
        # representable in float64, so log2 is exact — one vectorized op
        with np.errstate(over="ignore"):
            low = w & (~w + np.uint64(1))
        rho = np.log2(low.astype(np.float64)).astype(np.int64) + 1
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, reg, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {"register": pa.array(nz.astype(np.int64)),
             "rho": pa.array(regs[nz]),
             "_mrg": pa.array(np.zeros(len(nz), dtype=np.int32))}
        )

    return partial, m


def hll_registers(
    ds: ray.data.Dataset, key_col: str, p: int = HLL_P
) -> ray.data.Dataset:
    """HyperLogLog register table: (register, rho) for every non-empty
    register — register = low ``p`` hash bits, rho = trailing zeros of
    the remaining bits (sentinel-capped) + 1, max-merged.

    Scale shape: each block's partial is at most 2^p rows regardless of
    block size (the register array IS the bounded sketch), so the single
    narrow exchange moves <= blocks x 2^p tiny rows; registers from any
    two corpus halves MERGE by per-register max (mergeability is the
    whole point of the sketch — incremental maintenance composes with
    pipelines.summaries).  Input keys must be integers (quantize floats
    upstream, as kmv_distinct does).
    """
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    partial, m = _hll_partial_factory(key_col, p)

    def final(t: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(
            regs,
            t["register"].to_numpy(zero_copy_only=False),
            t["rho"].to_numpy(zero_copy_only=False),
        )
        nz = np.flatnonzero(regs)
        return pa.table(
            {"register": pa.array(nz.astype(np.int64)),
             "rho": pa.array(regs[nz])}
        )

    parts = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return parts.repartition(num_blocks=1, keys=["_mrg"]).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def hll_estimate(
    ds: ray.data.Dataset, key_col: str, p: int = HLL_P
) -> ray.data.Dataset:
    """One-row HLL distinct estimate — DETERMINISTIC exact-integer
    arithmetic so a SQL twin reproduces it bit-for-bit (HUGEINT math):

        D   = sum over ALL 2^p registers of 2^(64 - rho_j)   (empty: 2^64)
        est = floor(7213 * m^3 * 2^64 / (10 * (1000*m + 1079) * D))

    which is the raw HLL estimator alpha_m * m^2 / sum(2^-rho) with
    alpha_m = 0.7213 / (1 + 1.079/m) expressed as one exact rational —
    no float summation anywhere, so block order can never flip a bit.
    Output: (m, n_zero_registers, est_raw).  The small-range linear-
    counting correction (m * ln(m / n_zero) when est <= 2.5m) is left to
    the CONSUMER: ln() is not bit-reproducible across libms, and n_zero
    is emitted precisely so callers can apply it.
    """
    return hll_estimate_from_registers(hll_registers(ds, key_col, p), p)


def hll_estimate_from_registers(
    regs: ray.data.Dataset, p: int = HLL_P
) -> ray.data.Dataset:
    """Finalize a (register, rho) table into the one-row exact-integer
    estimate of :func:`hll_estimate`.  The input may be the UNION of
    several runs' register tables (duplicate registers max-merge here)
    — mergeability is what makes the sketch maintainable incrementally:
    registers(A ∪ B) == max-merge(registers(A), registers(B))."""
    m = 1 << p

    def estimate(t: pa.Table) -> pa.Table:
        arr = np.zeros(m, dtype=np.int64)
        if t.num_rows:
            np.maximum.at(
                arr,
                t["register"].to_numpy(zero_copy_only=False),
                t["rho"].to_numpy(zero_copy_only=False),
            )
        rho = arr[arr > 0]
        n_zero = m - len(rho)
        d = int(n_zero) * (1 << 64) + sum(1 << (64 - int(r)) for r in rho)
        est = (7213 * m * m * m * (1 << 64)) // (10 * (1000 * m + 1079) * d)
        return pa.table(
            {"m": pa.array([m], pa.int64()),
             "n_zero_registers": pa.array([n_zero], pa.int64()),
             "est_raw": pa.array([est], pa.int64())}
        )

    return regs.repartition(num_blocks=1).map_batches(
        estimate, batch_format="pyarrow", batch_size=None
    )


def hll_estimate_by(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    p: int = HLL_P,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """GROUPED HyperLogLog: ndistinct(key) estimate PER GROUP with the
    same exact-integer estimator as :func:`hll_estimate` (bit-for-bit
    SQL-reproducible; the consumer applies linear counting from the
    emitted ``n_zero_registers`` if it wants the small-range fix).

    Scale shape: each block ships at most ``distinct_groups_in_block x
    2^p`` (group, register, rho) rows — the register array IS the
    bounded per-group state — one hash exchange co-locates groups, and
    the identical kernel max-merges + finalizes.  The per-group sum of
    2^(64-rho) is limb-decomposed (hi for rho <= 32, lo for rho >= 33;
    each term <= 2^31, so both limbs are exact int64 segment sums) and
    only the final rational division runs in Python ints — O(#groups)
    big-int ops, never O(#groups x m).
    Output: (group_col, m, n_zero_registers, est_raw).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    sch = ds.schema()
    gtype = sch.types[sch.names.index(group_col)]
    m = 1 << p
    sentinel = np.uint64(1) << np.uint64(64 - p)

    def stage(t: pa.Table, finalize: bool) -> pa.Table:
        if t.num_rows == 0:
            if finalize:
                return pa.table(
                    {group_col: pa.array([], gtype),
                     "m": pa.array([], pa.int64()),
                     "n_zero_registers": pa.array([], pa.int64()),
                     "est_raw": pa.array([], pa.int64())}
                )
            return pa.table(
                {group_col: pa.array([], gtype),
                 "register": pa.array([], pa.int64()),
                 "rho": pa.array([], pa.int64())}
            )
        enc = pc.dictionary_encode(t[group_col].combine_chunks())
        gc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if "register" in t.schema.names:
            reg = t["register"].to_numpy(zero_copy_only=False)
            rho = t["rho"].to_numpy(zero_copy_only=False)
        else:
            v = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = splitmix64(v)
            reg = (h & np.uint64(m - 1)).astype(np.int64)
            w = (h >> np.uint64(p)) | sentinel
            with np.errstate(over="ignore"):
                low = w & (~w + np.uint64(1))
            rho = np.log2(low.astype(np.float64)).astype(np.int64) + 1
        # max-rho per (group, register): sort rho DESC within the pair
        order = np.lexsort((-rho, reg, gc))
        gs, rs, hs = gc[order], reg[order], rho[order]
        first = np.concatenate(
            ([True], (gs[1:] != gs[:-1]) | (rs[1:] != rs[:-1]))
        )
        gs, rs, hs = gs[first], rs[first], hs[first]
        if not finalize:
            return pa.table(
                {group_col: pc.take(enc.dictionary, pa.array(gs)),
                 "register": pa.array(rs), "rho": pa.array(hs)}
            )
        newseg = np.concatenate(([True], gs[1:] != gs[:-1]))
        starts = np.flatnonzero(newseg)
        seg = np.cumsum(newseg) - 1
        n_nonzero = np.bincount(seg, minlength=len(starts))
        term_hi = np.where(
            hs <= 32, np.int64(1) << (32 - np.clip(hs, 1, 32)), 0
        )
        term_lo = np.where(
            hs >= 33, np.int64(1) << (64 - np.clip(hs, 33, 64)), 0
        )
        hi_s = np.add.reduceat(term_hi, starts)
        lo_s = np.add.reduceat(term_lo, starts)
        num = 7213 * m * m * m * TWO64
        den0 = 10 * (1000 * m + 1079)
        ests = np.fromiter(
            (
                num // (den0 * ((m - int(nz)) * TWO64
                                + (int(h) << 32) + int(lo)))
                for nz, h, lo in zip(n_nonzero, hi_s, lo_s)
            ),
            dtype=np.int64, count=len(starts),
        )
        return pa.table(
            {group_col: pc.take(enc.dictionary, pa.array(gs[starts])),
             "m": pa.array(np.full(len(starts), m, dtype=np.int64)),
             "n_zero_registers": pa.array((m - n_nonzero).astype(np.int64)),
             "est_raw": pa.array(ests)}
        )

    parts = ds.select_columns([group_col, key_col]).map_batches(
        lambda t: stage(t, False),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return parts.repartition(
        num_blocks=num_partitions, keys=[group_col]
    ).map_batches(
        lambda t: stage(t, True), batch_format="pyarrow", batch_size=None
    )
