"""Deduplication operators (D1 family + training-data-pipeline extensions).

Luzzu's extensional-conciseness metric flags duplicate records `[paper]`
(/root/reference/README.md:7); at training-data scale the same capability
splits into:

- exact dedup            128-bit content key in the map stage, shuffle
                         (doc_id, key) ONLY — full text never enters the
                         exchange (~100x fewer bytes than shuffling text)
- MinHash + LSH near-dup shingle -> minhash sig -> band buckets ->
                         vectorized in-bucket compare -> EXACT-jaccard
                         verify (join-based, off-driver)
- SimHash near-dup       64-bit sign fingerprint -> band buckets ->
                         vectorized hamming (table popcount)
- n-gram Jaccard verify  exact set Jaccard on LSH candidate pairs

All are Ray-Data compositions: vectorized ``map_batches`` to compute
signatures, hash shuffles on bucket/content keys, NumPy segmented ops
inside whole-block functions.  Candidate-pair clustering runs through
:func:`cluster_pairs`: a driver-side union-find fast path for small pair
tables, and a shuffle-based alternating large-star/small-star contraction
(public algorithm: Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014) that converges in O(log n) rounds with the driver
never holding the edge set — the 100TB path.

Oversized LSH buckets (degenerate near-identical corpora) are salt-split
to ``bucket_cap`` members per subgroup; pairs split across subgroups in
one band are recovered by other bands (each band salts the split
differently).  Documented recall bound: a pair is lost only if separated
in EVERY band — P < (1 - 1/s)^n_bands for split factor s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from luzzu_ray.ops.textstats import token_hashes_for_rows

from luzzu_ray.ops.common import pool as _pool

# ---------------------------------------------------------------------------
# deterministic hash families (seeded once, shared by engine + tests)
# ---------------------------------------------------------------------------
_rng = np.random.Generator(np.random.PCG64(20260817))
N_PERM = 64          # minhash permutations
N_BANDS = 16         # default bands of r = N_PERM // N_BANDS rows
BAND_R = N_PERM // N_BANDS
# verification-grade banding: recall at jaccard>=0.5 is 1 - (1-j^2)^32
# (~1e-4 miss at j=0.5, ~6e-7 at j=0.6) at the cost of more candidates;
# used by the exact-verified queries, while (16, 4) is the
# throughput-grade default for signature-agreement screening.
N_BANDS_VERIFY = 32
BAND_R_VERIFY = 2
SHINGLE_K = 3        # word-shingle width
_MH_A = _rng.integers(1, 2**63, size=N_PERM, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
_MH_B = _rng.integers(0, 2**63, size=N_PERM, dtype=np.uint64)
_BAND_SALT = _rng.integers(1, 2**63, size=64, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
SIMHASH_BANDS = 4    # 4 x 16-bit chunks
SIMHASH_HAMMING_MAX = 3

# content-key (exact dedup) polynomial bases + seeds, two independent
# streams -> 128-bit key; collision probability ~ n^2 / 2^128 for
# NON-ADVERSARIAL data only: both streams are fixed-base polynomials
# mod 2^64 with public constants, so a crafted corpus can engineer
# simultaneous collisions.  If adversarial inputs are in scope, mix a
# non-polynomial finalizer (e.g. per-word xxhash-style avalanche) in.
_CK_BASE1 = np.uint64(0x100000001B3)          # FNV-64 prime
_CK_BASE2 = np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
_CK_SEED1 = np.uint64(14695981039346656037)
_CK_SEED2 = np.uint64(0x2545F4914F6CDD1D)

# default ceiling for driver-side union-find; above it clustering runs
# distributed (star contraction) so the driver never holds the pairs
PAIRS_DRIVER_MAX = 1_000_000
BUCKET_CAP = 8192    # salt-split LSH buckets above this many members

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a byte lookup table (any shape)."""
    flat = np.ascontiguousarray(x, dtype=np.uint64)
    out = _POP8[flat.view(np.uint8)].reshape(*flat.shape, 8).sum(
        axis=-1, dtype=np.int32
    )
    return out


def _hash_shuffle_ctx() -> None:
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()


def _default_parts(num_partitions: int | None) -> int:
    from luzzu_ray.pipelines.filter_pipeline import default_num_partitions

    return default_num_partitions() if num_partitions is None else num_partitions


def _size_partitions(n_rows: int, cap: int, rows_per_partition: int = 200_000) -> int:
    """Partitions proportional to DATA, clamped to the cluster-derived cap.

    Hash-shuffle cost has a ~50-100ms fixed component per partition
    (finalize task + block bookkeeping), so a cluster-wide width (4x
    CPUs) on a small intermediate wastes seconds moving kilobytes; at
    full scale the row count hits the cap and width is cluster-sized
    again."""
    return max(4, min(cap, -(-n_rows // rows_per_partition)))


def count_if_cheap(ds: ray.data.Dataset) -> int | None:
    """Row count ONLY when it's metadata-priced.

    ``Dataset.count()`` is cheap on a bare read (parquet footers) and on
    already-materialized datasets, but on any transformed pipeline it
    EXECUTES the whole upstream once just to count — and the subsequent
    real consumption executes it again.  Returns None when counting
    would not be cheap."""
    try:
        from ray.data._internal.logical.operators.read_operator import Read
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            return ds.count()
        dag = ds._logical_plan.dag
        if isinstance(dag, Read) and not dag.input_dependencies:
            return ds.count()
    except Exception:  # pragma: no cover - internal API drift
        pass
    return None


def count_upper_bound_if_cheap(ds: ray.data.Dataset) -> int | None:
    """Row-count UPPER BOUND at metadata price, for shuffle-width sizing.

    Walks the logical DAG through one-to-one operators and unions down
    to leaves whose ``infer_metadata()`` carries a row count (parquet
    footers, in-memory tables).  Filters make the bound loose
    (survivors over-counted — width merely tops out early).

    Enforced contract (ADVICE r03): ``FlatMap`` is a HARD STOP — it is
    row-expanding by intent, so the walk returns None rather than an
    under-estimate.  ``map_batches`` CAN also expand rows but is this
    repo's universal row-preserving-or-reducing partial idiom, so it
    stays walkable — callers shuffling a deliberately row-expanding
    map_batches chain must pass ``expanding=True`` to
    :func:`auto_partitions` (which skips this bound entirely) or an
    explicit width; every expanding producer in-repo materializes first
    (exact count) or passes the flag."""
    n = count_if_cheap(ds)
    if n is not None:
        return n
    try:
        from ray.data._internal.logical.operators.map_operator import (
            AbstractOneToOne,
            FlatMap,
        )
        from ray.data._internal.logical.operators.n_ary_operator import (
            Union as LUnion,
        )

        def walk(op) -> int | None:
            md = op.infer_metadata()
            if md is not None and md.num_rows is not None:
                return int(md.num_rows)
            if isinstance(op, FlatMap):
                return None  # row-expanding by intent: no safe bound
            deps = op.input_dependencies
            if isinstance(op, AbstractOneToOne) and len(deps) == 1:
                return walk(deps[0])
            if isinstance(op, LUnion):
                total = 0
                for dep in deps:
                    c = walk(dep)
                    if c is None:
                        return None
                    total += c
                return total
            return None

        return walk(ds._logical_plan.dag)
    except Exception:  # pragma: no cover - internal API drift
        return None


def auto_partitions(
    ds: ray.data.Dataset,
    num_partitions: int | None,
    rows_per_partition: int = 200_000,
    expanding: bool = False,
) -> int:
    """Resolve a shuffle width: an EXPLICIT num_partitions wins verbatim
    (callers tuning straggler granularity / block memory get exactly
    what they asked for); otherwise size to the data when a row-count
    upper bound is metadata-cheap (bare reads, and read->map/filter/
    union pipelines via the footer counts), else fall back to the
    cluster-derived cap.

    ``expanding=True`` declares that ``ds`` contains a row-EXPANDING
    transform (pair generation, unpivot, shingling) downstream of the
    countable leaves — the metadata bound would then be an
    UNDER-estimate (oversized blocks, worker-memory risk at the 100 TB
    posture), so the cluster-cap fallback is forced instead (ADVICE
    r03: contract made enforceable at the call site, not a docstring
    caveat)."""
    if num_partitions is not None:
        return num_partitions
    cap = _default_parts(None)
    if expanding:
        return cap
    n = count_upper_bound_if_cheap(ds)
    return _size_partitions(n, cap, rows_per_partition) if n is not None else cap


# ---------------------------------------------------------------------------
# exact dedup: shuffle 128-bit content keys, never the text
# ---------------------------------------------------------------------------

def content_key_batch(t: pa.Table) -> pa.Table:
    """(doc_id, k1, k2): two independent 64-bit polynomial hashes of the
    raw text bytes (Horner, mod 2^64).  Vectorized: one pass over the
    batch's bytes per stream, per-row segment sums via ``reduceat``."""
    from luzzu_ray.functions import text as TX

    n = t.num_rows
    text = t["text"]
    data, offs = TX.utf8_view(text)
    lens = offs[1:] - offs[:-1]
    lo, hi = int(offs[0]), int(offs[-1])
    k1 = np.full(n, _CK_SEED1, dtype=np.uint64)
    k2 = np.full(n, _CK_SEED2, dtype=np.uint64)
    if hi > lo:
        b = data[lo:hi].astype(np.uint64)
        rid = np.repeat(np.arange(n, dtype=np.int64), lens)
        starts_rel = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts_rel[1:])
        pos = np.arange(hi - lo, dtype=np.int64) - starts_rel[rid]
        exp = lens[rid] - 1 - pos
        mx = int(lens.max())
        nz = lens > 0
        starts_nz = starts_rel[nz]
        with np.errstate(over="ignore"):
            for base, seed, out in ((_CK_BASE1, _CK_SEED1, k1),
                                    (_CK_BASE2, _CK_SEED2, k2)):
                pows = np.empty(mx + 1, dtype=np.uint64)
                pows[0] = np.uint64(1)
                np.cumprod(np.full(mx, base, dtype=np.uint64), out=pows[1:])
                contrib = b * pows[exp]
                sums = np.add.reduceat(contrib, starts_nz)
                out[:] = seed * pows[lens]
                out[nz] += sums
    # NULL text must not collide with the empty string (utf8_view maps
    # both to zero bytes); SQL groups all NULLs together but apart from
    # '' — mix a constant into null rows' keys to match.  Applied AFTER
    # the polynomial block: null rows have len 0, so the overwrite above
    # set them to seed*pows[0]==seed; XOR-ing here survives any batch
    # layout (an earlier version XOR-ed first and the overwrite erased
    # it whenever the batch contained non-empty text).
    null_mask = pc.is_null(text).to_numpy(zero_copy_only=False)
    if null_mask.any():
        k1[null_mask] ^= np.uint64(0xA5A5A5A55A5A5A5A)
        k2[null_mask] ^= np.uint64(0x3C3C3C3CC3C3C3C3)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "k1": pa.array(k1.view(np.int64)),
            "k2": pa.array(k2.view(np.int64)),
        }
    )


def exact_duplicates(ds: ray.data.Dataset, num_partitions: int | None = None) -> ray.data.Dataset:
    """(doc_id, is_dup): is_dup iff a smaller doc_id has identical text.

    The map stage reduces each row to a 128-bit content key; ONLY
    (doc_id, k1, k2) rows enter the hash exchange — at 100TB that is
    ~100x fewer shuffled bytes than exchanging the text itself.  The
    keep-first idiom then runs per block (group-min + join).
    """
    _hash_shuffle_ctx()
    keys = ds.select_columns(["doc_id", "text"]).map_batches(
        content_key_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # 24-byte rows; count sizes the shuffle
    part = keys.repartition(
        num_blocks=auto_partitions(keys, num_partitions, 1_000_000),
        keys=["k1"],
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "is_dup": pa.array([], pa.bool_())}
            )
        mins = t.group_by(["k1", "k2"]).aggregate([("doc_id", "min")])
        joined = t.join(mins, keys=["k1", "k2"], join_type="inner")
        return pa.table(
            {
                "doc_id": joined["doc_id"],
                "is_dup": pc.not_equal(joined["doc_id"], joined["doc_id_min"]),
            }
        )

    return part.map_batches(per_block, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# signatures (vectorized per batch)
# ---------------------------------------------------------------------------

def _shingle_hashes(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(shingle_hash uint64, row_id) of word k-shingles per doc."""
    th, tr = token_hashes_for_rows(t)
    k = SHINGLE_K
    if len(th) < k:
        z = np.zeros(0, dtype=np.uint64)
        return z, np.zeros(0, dtype=np.int64)
    m = len(th) - k + 1
    with np.errstate(over="ignore"):
        g = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            g = g * np.uint64(1099511628211) + th[j : j + m]
    valid = tr[:m] == tr[k - 1 :]
    return g[valid], tr[:m][valid]


def minhash_signatures(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(n_rows x N_PERM) uint64 minhash signature matrix + has_sig mask.

    Rows with fewer than SHINGLE_K tokens get an all-max sentinel
    signature (has_sig False) and never enter banding.
    """
    n = t.num_rows
    sh, rid = _shingle_hashes(t)
    sig = np.full((n, N_PERM), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    if len(sh):
        order = np.argsort(rid, kind="stable")
        rid_s, sh_s = rid[order], sh[order]
        starts = np.flatnonzero(
            np.concatenate(([True], rid_s[1:] != rid_s[:-1]))
        )
        rows_present = rid_s[starts]
        with np.errstate(over="ignore"):
            for p in range(N_PERM):
                hp = sh_s * _MH_A[p] + _MH_B[p]
                sig[rows_present, p] = np.minimum.reduceat(hp, starts)
    has = np.zeros(n, dtype=bool)
    if len(sh):
        has[np.unique(rid)] = True
    return sig, has


def simhash_signatures(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """64-bit simhash per row from token hashes (+ has_sig mask)."""
    th, tr = token_hashes_for_rows(t)
    n = t.num_rows
    sim = np.zeros(n, dtype=np.uint64)
    has = np.zeros(n, dtype=bool)
    if len(th):
        bits = (
            (th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.int32)
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, tr, bits * 2 - 1)
        sim_bits = (acc > 0).astype(np.uint64)
        sim = (sim_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        has[np.unique(tr)] = True
    return sim, has


# ---------------------------------------------------------------------------
# LSH banding -> candidate pairs (vectorized, bucket-capped)
# ---------------------------------------------------------------------------

def _minhash_band_rows(
    t: pa.Table, n_bands: int = N_BANDS, band_r: int = BAND_R,
    with_sig: bool = True,
) -> pa.Table:
    """Explode each doc into n_bands (band, bucket) rows (first
    n_bands*band_r of the N_PERM signature positions).

    ``with_sig=False`` omits the 512-byte signature column — the
    exact-verify pipeline filters pairs by TRUE Jaccard afterwards, so
    shipping signatures through the exchange would be pure waste (for
    the sf0.1 corpus it is ~95% of the shuffled bytes)."""
    assert n_bands * band_r <= N_PERM
    sig, has = minhash_signatures(t)
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(has)
    with np.errstate(over="ignore"):
        bands = sig[idx, : n_bands * band_r].reshape(len(idx), n_bands, band_r)
        bucket = np.zeros((len(idx), n_bands), dtype=np.uint64)
        for j in range(band_r):
            bucket = bucket * np.uint64(1099511628211) + bands[:, :, j]
        bucket = bucket * _BAND_SALT[None, :n_bands]
    n_out = len(idx) * n_bands
    if n_out:
        cols = {
            "band": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int32), len(idx))
            ),
            "bucket": pa.array(bucket.reshape(-1).view(np.int64)),
            "doc_id": pa.array(np.repeat(doc[idx], n_bands)),
        }
        if with_sig:
            cols["sig"] = pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.repeat(sig[idx], n_bands, axis=0).reshape(-1).view(np.int64)
                ),
                N_PERM,
            )
        return pa.table(cols)
    cols = {
        "band": pa.array([], pa.int32()),
        "bucket": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
    }
    if with_sig:
        cols["sig"] = pa.array([], pa.list_(pa.int64(), N_PERM))
    return pa.table(cols)


def _group_slices(band: np.ndarray, bucket: np.ndarray):
    """(start, end) slices of equal (band, bucket) runs in sorted arrays."""
    n = len(band)
    if n == 0:
        return
    change = np.flatnonzero(
        np.concatenate(([True], (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])))
    )
    bounds = np.concatenate((change, [n]))
    for i in range(len(change)):
        s, e = int(bounds[i]), int(bounds[i + 1])
        if e - s > 1:
            yield s, e


def _salt_subgroups(doc: np.ndarray, salt: np.uint64, cap: int):
    """Deterministically split an oversized member list into <=cap-sized
    subgroups, salted so each band splits differently."""
    g = len(doc)
    if g <= cap:
        yield np.arange(g)
        return
    nsub = -(-g // cap)  # ceil
    with np.errstate(over="ignore"):
        h = (doc.astype(np.uint64) ^ salt) * np.uint64(0x9E3779B97F4A7C15)
    sub = (h >> np.uint64(32)).astype(np.int64) % nsub
    for s in range(nsub):
        members = np.flatnonzero(sub == s)
        if len(members) > 1:
            yield members


def _pairs_from_tiles(d: np.ndarray, score_fn, keep_fn, tile_elems: int = 1 << 22):
    """Upper-triangle pairwise compare of a (sub)group, tiled so the score
    matrix stays cache/heap friendly.  ``score_fn(i0, i1)`` returns the
    (t, g) score tile; ``keep_fn(tile)`` the boolean keep mask."""
    g = len(d)
    tile = max(1, tile_elems // max(g, 1))
    out_a, out_b, out_s = [], [], []
    for i0 in range(0, g, tile):
        i1 = min(g, i0 + tile)
        scores = score_fn(i0, i1)  # (i1-i0, g)
        keep = keep_fn(scores)
        # strict upper triangle in GLOBAL indices: j > i
        jj = np.arange(g)[None, :]
        ii = np.arange(i0, i1)[:, None]
        keep &= jj > ii
        ti, tj = np.nonzero(keep)
        if len(ti):
            a = d[ti + i0]
            b = d[tj]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(scores[ti, tj])
    if not out_a:
        return None
    return (
        np.concatenate(out_a),
        np.concatenate(out_b),
        np.concatenate(out_s),
    )


def _candidate_pairs_block(
    t: pa.Table,
    sim_threshold: float,
    bucket_cap: int = BUCKET_CAP,
) -> pa.Table:
    """Within one hash-partitioned block: pairs sharing a (band, bucket)
    whose minhash signature agreement >= threshold.  Fully vectorized:
    per (sub)group one broadcast signature compare; oversized buckets are
    salt-split to ``bucket_cap`` (module docstring documents the recall
    bound)."""
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "est_sim": pa.array([], pa.float64())}
    )
    if t.num_rows == 0:
        return empty
    t = t.sort_by([("band", "ascending"), ("bucket", "ascending"),
                   ("doc_id", "ascending")])
    band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    screened = "sig" in t.column_names
    if screened:
        sig = (
            t["sig"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).reshape(-1, N_PERM)
        )
    out = []
    for s, e in _group_slices(band, bucket):
        salt = _BAND_SALT[int(band[s]) % len(_BAND_SALT)]
        d_all = doc[s:e]
        s_all = sig[s:e] if screened else None
        for members in _salt_subgroups(d_all, salt, bucket_cap):
            d = d_all[members]
            if screened:
                S = s_all[members]

                def score(i0, i1, S=S):
                    return (S[i0:i1, None, :] == S[None, :, :]).mean(axis=2)

                res = _pairs_from_tiles(d, score, lambda x: x >= sim_threshold)
            else:
                # unscreened: emit every in-bucket pair (the exact
                # Jaccard verify downstream is the filter); tiled like
                # the screened path so a cap-sized degenerate subgroup
                # never materializes O(cap^2) index arrays at once
                res = _pairs_from_tiles(
                    d,
                    lambda i0, i1, g=len(d): np.full(
                        (i1 - i0, g), -1.0, dtype=np.float32
                    ),
                    lambda x: np.ones_like(x, dtype=bool),
                )
            if res is not None:
                out.append(res)
    if not out:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate([r[0] for r in out])),
            "b": pa.array(np.concatenate([r[1] for r in out])),
            "est_sim": pa.array(
                np.concatenate([r[2] for r in out]).astype(np.float64)
            ),
        }
    )


def _dedupe_pairs(
    pairs: ray.data.Dataset,
    agg: tuple[str, str, pa.DataType],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distinct (a, b) rows (same pair surfaces from multiple bands),
    keeping ``agg`` = (col, "max"|"min", type) — one hash shuffle on the pair."""
    col, how, col_type = agg
    mat = pairs.materialize()  # pair tables are narrow; count sizes the shuffle
    part = mat.repartition(
        num_blocks=auto_partitions(mat, num_partitions), keys=["a", "b"]
    )

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # empty shuffle blocks arrive schema-less; rebuild typed
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 col: pa.array([], col_type)}
            )
        g = t.group_by(["a", "b"]).aggregate([(col, how)])
        return g.rename_columns(["a", "b", col])

    return part.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def minhash_candidate_pairs(
    ds: ray.data.Dataset,
    sim_threshold: float = 0.7,
    num_partitions: int | None = None,
    n_bands: int = N_BANDS,
    band_r: int = BAND_R,
    bucket_cap: int = BUCKET_CAP,
) -> ray.data.Dataset:
    """Distinct candidate (a, b, est_sim) pairs, a < b, as a Dataset
    (never materialized on the driver)."""
    _hash_shuffle_ctx()
    bands = ds.select_columns(["doc_id", "text"]).map_batches(
        _minhash_band_rows,
        fn_kwargs={
            "n_bands": n_bands, "band_r": band_r,
            # signatures only matter when an agreement screen is on
            "with_sig": sim_threshold > 0,
        },
        batch_format="pyarrow",
    )
    bands_mat = bands.materialize()  # (band, bucket, doc_id[, sig]) — narrow
    part = bands_mat.repartition(
        num_blocks=auto_partitions(bands_mat, num_partitions),
        keys=["band", "bucket"],
    )
    pairs = part.map_batches(
        _candidate_pairs_block,
        fn_kwargs={"sim_threshold": sim_threshold, "bucket_cap": bucket_cap},
        batch_format="pyarrow",
        batch_size=None,
    )
    return _dedupe_pairs(pairs, ("est_sim", "max", pa.float64()), num_partitions)


# ---------------------------------------------------------------------------
# connected components over a candidate-pair dataset
# ---------------------------------------------------------------------------

def _union_find_clusters(pairs: pa.Table) -> dict[int, int]:
    """doc_id -> cluster representative (min doc_id in component).

    Driver-side fast path; used when the pair table is small
    (<= PAIRS_DRIVER_MAX rows).  find() performs path HALVING (each
    step re-points a node to its grandparent), which keeps the
    amortized cost near-constant without union-by-rank — rank ordering
    would conflict with the semantic requirement that the component
    MINIMUM is the root."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes: set[int] = set()
    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    # every node in a pair gets a label — cluster ROOTS included
    return {x: find(x) for x in nodes}


_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _empty_edges() -> pa.Table:
    return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})


def _large_star_block(t: pa.Table) -> pa.Table:
    """Per u (all of Γ(u) co-located): emit (v, min(Γ(u) ∪ u)) for v > u."""
    if t.num_rows == 0:
        return _empty_edges()
    t = t.sort_by([("u", "ascending"), ("v", "ascending")])
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    new_u = np.concatenate(([True], u[1:] != u[:-1]))
    gid = np.cumsum(new_u) - 1
    starts = np.flatnonzero(new_u)
    # v sorted within u-run -> first v is the min neighbor
    m = np.minimum(v[starts], u[starts])[gid]
    keep = (v > u) & (v != m)
    return pa.table({"u": pa.array(v[keep]), "v": pa.array(m[keep])})


def _small_star_block(t: pa.Table) -> pa.Table:
    """Edges oriented u > v, grouped by u: m = min neighbors; emit
    (v, m) for the other small neighbors plus (u, m)."""
    if t.num_rows == 0:
        return _empty_edges()
    t = t.sort_by([("u", "ascending"), ("v", "ascending")])
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    # drop duplicate edges within the block (same (u,v) from many sources)
    first = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
    u, v = u[first], v[first]
    new_u = np.concatenate(([True], u[1:] != u[:-1]))
    gid = np.cumsum(new_u) - 1
    starts = np.flatnonzero(new_u)
    m = v[starts][gid]  # min small neighbor (all v < u)
    out_u = np.concatenate((v, u[starts]))
    out_v = np.concatenate((m, v[starts]))
    keep = out_u != out_v
    return pa.table({"u": pa.array(out_u[keep]), "v": pa.array(out_v[keep])})


def _orient_down(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _empty_edges()
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    return pa.table(
        {"u": pa.array(np.maximum(u, v)), "v": pa.array(np.minimum(u, v))}
    )


def _symmetrize(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _empty_edges()
    u = t["u"].combine_chunks()
    v = t["v"].combine_chunks()
    return pa.table(
        {
            "u": pa.concat_arrays([u, v]),
            "v": pa.concat_arrays([v, u]),
        }
    )


def _edge_signature(edges: ray.data.Dataset) -> tuple[int, int]:
    """(count, order-insensitive hash) of a distinct edge set."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "h": pa.array([0], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (u * np.uint64(0x9E3779B97F4A7C15) + v) * _CK_BASE2
        return pa.table(
            {"n": pa.array([t.num_rows], pa.int64()),
             "h": pa.array([int(h.sum(dtype=np.uint64).view(np.int64))], pa.int64())}
        )

    rows = edges.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    h = sum(r["h"] & 0xFFFFFFFFFFFFFFFF for r in rows) & 0xFFFFFFFFFFFFFFFF
    return n, h


def star_contraction(
    pairs: ray.data.Dataset,
    num_partitions: int | None = None,
    max_iters: int = 50,
) -> ray.data.Dataset:
    """Distributed connected components: alternating large-star /
    small-star rounds (each one hash shuffle on the node id) until the
    edge set is stable.  Returns (doc_id, cluster) rows for every node,
    cluster = component minimum.  O(log n) rounds; the driver only sees
    per-round (count, hash) signatures, never the edges."""
    _hash_shuffle_ctx()
    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    edges = pairs.map_batches(
        lambda t: pa.table({"u": t["a"], "v": t["b"]}) if t.num_rows
        else _empty_edges(), **kw
    ).materialize()
    prev_sig = None
    for _ in range(max_iters):
        parts = (
            num_partitions if num_partitions is not None
            else _size_partitions(edges.count() * 2, _default_parts(None))
        )
        # large star: symmetrize so Γ(u) is complete per u
        sym = edges.map_batches(_symmetrize, **kw)
        part = sym.repartition(num_blocks=parts, keys=["u"])
        edges = part.map_batches(
            _large_star_block, batch_format="pyarrow", batch_size=None
        )
        # small star on down-oriented edges
        down = edges.map_batches(_orient_down, **kw)
        part = down.repartition(num_blocks=parts, keys=["u"])
        edges = part.map_batches(
            _small_star_block, batch_format="pyarrow", batch_size=None
        )
        # dedupe + convergence signature
        edges = _dedupe_edges(edges, parts).materialize()
        sig = _edge_signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig

    def to_labels(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        return pa.table(
            {"doc_id": pa.concat_arrays([u, v]),
             "cluster": pa.concat_arrays([v, v])}
        )

    labels = edges.map_batches(to_labels, **kw)
    part = labels.repartition(
        num_blocks=(
            num_partitions if num_partitions is not None
            else _size_partitions(edges.count() * 2, _default_parts(None))
        ),
        keys=["doc_id"],
    )

    def uniq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        return t.group_by("doc_id").aggregate([("cluster", "min")]).rename_columns(
            ["doc_id", "cluster"]
        )

    return part.map_batches(uniq, batch_format="pyarrow", batch_size=None)


def _dedupe_edges(edges: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    part = edges.repartition(num_blocks=num_partitions, keys=["u"])

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_edges()
        return t.group_by(["u", "v"]).aggregate([]).select(["u", "v"])

    return part.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def cluster_pairs(
    pairs: ray.data.Dataset,
    num_partitions: int | None = None,
    driver_max: int = PAIRS_DRIVER_MAX,
) -> pa.Table | ray.data.Dataset:
    """(doc_id, cluster) for every doc in a pair, cluster = component min.

    Auto-routes: small pair tables (<= driver_max rows) use the
    driver-side union-find fast path; larger ones run the shuffle-based
    star contraction with the driver out of the loop.  Both paths are
    property-tested equal (tests/test_ops.py)."""
    mat = pairs.materialize()
    if mat.count() <= driver_max:
        batches = [
            b for b in mat.select_columns(["a", "b"]).iter_batches(
                batch_format="pyarrow"
            ) if b.num_rows
        ]
        tbl = (
            pa.concat_tables(batches) if batches
            else pa.table({"a": pa.array([], pa.int64()),
                           "b": pa.array([], pa.int64())})
        )
        clusters = _union_find_clusters(tbl)
        docs = sorted(clusters)
        return pa.table(
            {"doc_id": pa.array(docs, pa.int64()),
             "cluster": pa.array([clusters[d] for d in docs], pa.int64())}
        )
    return star_contraction(mat, num_partitions)


def _labels_to_dedup_table(labels: pa.Table | ray.data.Dataset) -> pa.Table | ray.data.Dataset:
    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "is_dup", pc.not_equal(t["doc_id"], t["cluster"])
        )

    if isinstance(labels, pa.Table):
        return finish(labels)
    return labels.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification of LSH candidates (join-based)
# ---------------------------------------------------------------------------

def _shingle_sets_batch(t: pa.Table, need: pa.Array | None = None) -> pa.Table:
    """(doc_id, shingles binary, n_sh) per doc — the sorted unique uint64
    shingle hashes packed little-endian (Acero hash joins carry binary
    payloads but not list columns).  A doc's shingle set derives from its
    own row only, so NO shuffle is needed to build these."""
    if need is not None:
        t = t.filter(pc.is_in(t["doc_id"], value_set=need))
    if t.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "shingles": pa.array([], pa.binary()),
             "n_sh": pa.array([], pa.int64())}
        )
    sh, rid = _shingle_hashes(t)
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    out_doc, out_bufs, out_n = [], [], []
    if len(sh):
        order = np.argsort(rid, kind="stable")
        rid_s, sh_s = rid[order], sh[order]
        starts = np.flatnonzero(np.concatenate(([True], rid_s[1:] != rid_s[:-1])))
        bounds = np.concatenate((starts, [len(rid_s)]))
        for i, r in enumerate(rid_s[starts]):
            vals = np.unique(sh_s[bounds[i]:bounds[i + 1]])
            out_doc.append(int(doc[r]))
            out_bufs.append(vals.astype("<u8").tobytes())
            out_n.append(len(vals))
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "shingles": pa.array(out_bufs, pa.binary()),
            "n_sh": pa.array(out_n, pa.int64()),
        }
    )


# broadcast the candidate shingle index only while it is comfortably
# small (candidate DOCS, i.e. docs appearing in >= 1 pair); beyond this
# the verification runs as two sequential hash joins
CANDIDATE_BROADCAST_MAX = 2_000_000


def _jaccard_q6(inter: np.ndarray, na: np.ndarray, nb: np.ndarray) -> np.ndarray:
    union = na + nb - inter
    return np.floor(
        inter.astype(np.float64) / np.maximum(union, 1) * 1e6
    ).astype(np.int64)


def _intersect_counts(
    bufs_a: list, bufs_b: list, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """|A_i ∩ B_i| per pair from packed ``<u8`` sorted-unique shingle
    buffers — the production kernel, a per-pair ``np.intersect1d`` loop.

    MEASURED (sf0.1-shaped batch: 8192 pairs, 20-120 shingles/side):
    this loop runs ~7us/pair; the "vectorized" one-big-lexsort variant
    below measures 10-16x SLOWER (lexsort over the concatenated
    (pair, value) keys costs ~245ns/element and the per-batch element
    count dwarfs the loop's interpreter overhead), and a per-pair
    ``searchsorted`` variant ~2x slower.  At 10^9 candidate pairs the
    loop is ~2 CPU-hours spread across the verify actor pool — not a
    bottleneck once the pool scales with the cluster (it does, see
    ``exact_jaccard_pairs``).  Keep the loop unless shingle sets grow
    by orders of magnitude.
    """
    na = np.fromiter((len(x) for x in bufs_a), count=n, dtype=np.int64) >> 3
    nb = np.fromiter((len(x) for x in bufs_b), count=n, dtype=np.int64) >> 3
    inter = np.zeros(n, dtype=np.int64)
    for i in range(n):
        if na[i] and nb[i]:
            inter[i] = len(np.intersect1d(
                np.frombuffer(bufs_a[i], dtype="<u8"),
                np.frombuffer(bufs_b[i], dtype="<u8"),
                assume_unique=True,
            ))
    return inter, na, nb


def _pairwise_intersect_counts(
    bufs_a: list, bufs_b: list, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched variant of :func:`_intersect_counts`: one lexsort over
    all (pair_id, value) keys, adjacent equal run == one hit.

    KEPT AS THE ALTERNATE PATH with its parity test, but NOT used in
    production: measured 10-16x slower than the loop at realistic
    shingle-set sizes (see the production kernel's docstring).  It
    would only win if per-pair Python overhead dominated — i.e. sets of
    just a few elements per side.
    Missing sides pass as ``b""`` and simply count 0.
    """
    na = np.fromiter((len(x) for x in bufs_a), count=n, dtype=np.int64) >> 3
    nb = np.fromiter((len(x) for x in bufs_b), count=n, dtype=np.int64) >> 3
    if int(na.sum() + nb.sum()) == 0:
        return np.zeros(n, dtype=np.int64), na, nb
    vals = np.frombuffer(b"".join(bufs_a) + b"".join(bufs_b), dtype="<u8")
    rng = np.arange(n, dtype=np.int64)
    pids = np.concatenate([np.repeat(rng, na), np.repeat(rng, nb)])
    order = np.lexsort((vals, pids))
    pv = pids[order]
    vv = vals[order]
    dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
    inter = np.bincount(pv[1:][dup], minlength=n).astype(np.int64)
    return inter, na, nb


class _BroadcastJaccardVerifier:
    """Actor-pool stage: verify candidate pairs against a broadcast
    doc_id -> packed-shingle-set index (resolved ONCE per actor)."""

    def __init__(self, index_ref):
        import ray

        self.index = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard_q6": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        get = self.index.get
        bufs_a = [get(x, b"") for x in t["a"].to_pylist()]
        bufs_b = [get(x, b"") for x in t["b"].to_pylist()]
        inter, na, nb = _intersect_counts(bufs_a, bufs_b, t.num_rows)
        jq6 = _jaccard_q6(inter, na, nb)
        jq6[(na == 0) | (nb == 0)] = -1
        return pa.table(
            {"a": t["a"], "b": t["b"], "jaccard_q6": pa.array(jq6)}
        )


def _verify_joined_batch(t: pa.Table) -> pa.Table:
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "jaccard_q6": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    na = t["n_a"].to_numpy(zero_copy_only=False)
    nb = t["n_b"].to_numpy(zero_copy_only=False)
    inter, _, _ = _intersect_counts(
        t["sh_a"].to_pylist(), t["sh_b"].to_pylist(), t.num_rows
    )
    return pa.table(
        {"a": t["a"], "b": t["b"],
         "jaccard_q6": pa.array(_jaccard_q6(inter, na, nb))}
    )


def _route_pair_verify(
    ds: ray.data.Dataset,
    cand: ray.data.Dataset,
    verifier_cls,
    joined_fn,
    num_partitions: int | None = None,
    broadcast_max: int = CANDIDATE_BROADCAST_MAX,
    sets: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Shared candidate-pair verification routing (used by both the
    Jaccard and the containment verify; the metric lives in the
    kernels).  Two paths:

    - candidate docs <= ``broadcast_max``: the packed shingle index is
      built once, broadcast via ``ray.put`` and consulted by the
      ``verifier_cls`` actor pool — the classic small-side map-join,
      one corpus scan, zero shuffles.
    - beyond that: two SEQUENTIAL hash joins of the pair table against
      the shingle table (materialize between, so only one join's
      aggregator pool is live at a time — two concurrent pools can
      starve a small cluster), finished by ``joined_fn``.  The driver
      never holds shingle sets on this path.

    ``sets``: optionally a pre-materialized ``_shingle_sets_batch``
    dataset to reuse (skips re-scanning ``ds``).
    """
    import ray

    _hash_shuffle_ctx()
    cand_mat = cand.materialize()
    num_partitions = auto_partitions(cand_mat, num_partitions)
    ids: set[int] = set()
    small = True
    for b in cand_mat.iter_batches(batch_format="pyarrow"):
        ids.update(b["a"].to_pylist())
        ids.update(b["b"].to_pylist())
        if len(ids) > broadcast_max:
            small = False
            ids.clear()
            break
    pairs = cand_mat.select_columns(["a", "b"])

    if small:
        need = pa.array(sorted(ids), pa.int64())
        index: dict[int, bytes] = {}
        if sets is None:
            sh = ds.select_columns(["doc_id", "text"]).map_batches(
                _shingle_sets_batch, fn_kwargs={"need": need},
                batch_format="pyarrow",
            )
        else:
            sh = sets.map_batches(
                lambda t, need=need: t.filter(
                    pc.is_in(t["doc_id"], value_set=need)),
                batch_format="pyarrow",
            )
        for b in sh.iter_batches(batch_format="pyarrow"):
            index.update(zip(b["doc_id"].to_pylist(), b["shingles"].to_pylist()))
        index_ref = ray.put(index)
        from luzzu_ray.pipelines.filter_pipeline import default_actor_pool

        return pairs.map_batches(
            verifier_cls,
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=default_actor_pool(),
            fn_constructor_kwargs={"index_ref": index_ref},
        )

    if sets is None:
        sets = ds.select_columns(["doc_id", "text"]).map_batches(
            _shingle_sets_batch, batch_format="pyarrow"
        ).materialize()  # consumed by both join sides
    sh_a = sets.map_batches(
        lambda t: t.rename_columns(["a", "sh_a", "n_a"]),
        batch_format="pyarrow",
    )
    sh_b = sets.map_batches(
        lambda t: t.rename_columns(["b", "sh_b", "n_b"]),
        batch_format="pyarrow",
    )
    # key-repartitioned datasets carry schema-less EMPTY blocks (Ray's
    # map operator skips empty blocks, so they cannot be re-typed) and
    # Acero rejects them as join input; a plain repartition packs the
    # rows back into uniformly-typed blocks first.
    pairs = pairs.repartition(num_blocks=num_partitions)
    # joins run SEQUENTIALLY (materialize between): two live aggregator
    # pools can starve a small cluster's CPUs
    j1 = pairs.join(sh_a, join_type="inner", on=("a",),
                    num_partitions=num_partitions).materialize()
    j2 = j1.join(sh_b, join_type="inner", on=("b",),
                 num_partitions=num_partitions)
    return j2.map_batches(joined_fn, batch_format="pyarrow")


def exact_jaccard_pairs(
    ds: ray.data.Dataset,
    cand: ray.data.Dataset,
    jaccard_threshold: float,
    num_partitions: int | None = None,
    broadcast_max: int = CANDIDATE_BROADCAST_MAX,
) -> ray.data.Dataset:
    """(a, b, jaccard_q6) for candidate pairs verified by EXACT word-
    shingle Jaccard >= threshold.  Per-doc shingle sets are computed in
    the map stage (no shuffle — a doc's set comes from its own row,
    packed as binary); verification routing (broadcast index vs two
    sequential hash joins) is :func:`_route_pair_verify`.
    """
    thr = int(jaccard_threshold * 1e6)
    verified = _route_pair_verify(
        ds, cand, _BroadcastJaccardVerifier, _verify_joined_batch,
        num_partitions, broadcast_max,
    )
    return verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard_q6"], thr)),
        batch_format="pyarrow",
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    jaccard_threshold: float = 0.6,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(a, b, jaccard_q6): pairs with exact word-shingle Jaccard >=
    threshold.  Candidates come from verification-grade minhash banding
    (r=2, b=32: miss probability (1-j^2)^32, ~6e-7 at j=0.6), every
    candidate exactly verified — so the result equals the all-pairs
    oracle up to that recall bound."""
    cand = minhash_candidate_pairs(
        ds, sim_threshold=0.0, num_partitions=num_partitions,
        n_bands=N_BANDS_VERIFY, band_r=BAND_R_VERIFY,
    )
    return exact_jaccard_pairs(ds, cand, jaccard_threshold, num_partitions)


def minhash_dedup(
    ds: ray.data.Dataset,
    jaccard_threshold: float = 0.6,
    num_partitions: int | None = None,
) -> pa.Table | ray.data.Dataset:
    """(doc_id, cluster, is_dup) for every doc in a near-dup cluster.

    Clusters = connected components of the EXACT-jaccard-verified pair
    graph (candidates from verification-grade LSH banding).  Component
    merge auto-routes driver union-find vs distributed star contraction
    (:func:`cluster_pairs`)."""
    pairs = ngram_jaccard_pairs(ds, jaccard_threshold, num_partitions)
    labels = cluster_pairs(pairs, num_partitions)
    return _labels_to_dedup_table(labels)


# ---------------------------------------------------------------------------
# simhash banding -> hamming-verified pairs -> clusters
# ---------------------------------------------------------------------------

def simhash_band_rows(t: pa.Table) -> pa.Table:
    """Explode docs into (band, bucket=16-bit chunk, doc_id, sim) rows."""
    sim, has = simhash_signatures(t)
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(has)
    chunks = np.zeros((len(idx), SIMHASH_BANDS), dtype=np.int64)
    for b in range(SIMHASH_BANDS):
        chunks[:, b] = ((sim[idx] >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(
            np.int64
        )
    return pa.table(
        {
            "band": pa.array(
                np.tile(np.arange(SIMHASH_BANDS, dtype=np.int32), len(idx))
            ),
            "bucket": pa.array(chunks.reshape(-1)),
            "doc_id": pa.array(np.repeat(doc[idx], SIMHASH_BANDS)),
            "sim": pa.array(np.repeat(sim[idx].view(np.int64), SIMHASH_BANDS)),
        }
    )


def _simhash_pairs_block(t: pa.Table, bucket_cap: int = BUCKET_CAP) -> pa.Table:
    """Pairs sharing a 16-bit simhash band with hamming <= max, vectorized
    (XOR + table popcount), oversized buckets salt-split."""
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "hamming": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    t = t.sort_by([("band", "ascending"), ("bucket", "ascending"),
                   ("doc_id", "ascending")])
    band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    sim = t["sim"].to_numpy(zero_copy_only=False).view(np.uint64)
    out = []
    for s, e in _group_slices(band, bucket):
        salt = _BAND_SALT[int(band[s]) % len(_BAND_SALT)]
        d_all, s_all = doc[s:e], sim[s:e]
        for members in _salt_subgroups(d_all, salt, bucket_cap):
            d, S = d_all[members], s_all[members]

            def score(i0, i1, S=S):
                return popcount_u64(S[i0:i1, None] ^ S[None, :])

            res = _pairs_from_tiles(
                d, score, lambda x: x <= SIMHASH_HAMMING_MAX
            )
            if res is not None:
                out.append(res)
    if not out:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate([r[0] for r in out])),
            "b": pa.array(np.concatenate([r[1] for r in out])),
            "hamming": pa.array(
                np.concatenate([r[2] for r in out]).astype(np.int64)
            ),
        }
    )


def simhash_candidate_pairs(
    ds: ray.data.Dataset, num_partitions: int | None = None,
    bucket_cap: int = BUCKET_CAP,
) -> ray.data.Dataset:
    """Distinct (a, b, hamming) simhash pairs, hamming <= SIMHASH_HAMMING_MAX.

    Recall is EXACT for hamming <= 3: with 4 x 16-bit bands, any pair
    within hamming 3 shares at least one identical band (pigeonhole) —
    modulo salt-splitting of degenerate buckets."""
    _hash_shuffle_ctx()
    bands = ds.select_columns(["doc_id", "text"]).map_batches(
        simhash_band_rows, batch_format="pyarrow"
    ).materialize()
    part = bands.repartition(
        num_blocks=auto_partitions(bands, num_partitions),
        keys=["band", "bucket"],
    )
    pairs = part.map_batches(
        _simhash_pairs_block, fn_kwargs={"bucket_cap": bucket_cap},
        batch_format="pyarrow", batch_size=None,
    )
    return _dedupe_pairs(pairs, ("hamming", "min", pa.int64()), num_partitions)


def simhash_dedup(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> pa.Table | ray.data.Dataset:
    """(doc_id, cluster, is_dup) via simhash banding + hamming verify."""
    pairs = simhash_candidate_pairs(ds, num_partitions)
    labels = cluster_pairs(pairs, num_partitions)
    return _labels_to_dedup_table(labels)


def signature_neardup_pairs(
    ds: ray.data.Dataset,
    num_partitions: int | None = None,
    bucket_cap: int = BUCKET_CAP,
    id_col: str = "doc_id",
    sig_col: str = "sim",
) -> ray.data.Dataset:
    """Distinct (a, b, hamming) pairs over a PRECOMPUTED 64-bit
    signature column (image aHash, audio fingerprint, any 64-bit
    sketch) — the simhash banding machinery generalized past text:
    4 x 16-bit band bucketing (exact pigeonhole recall for
    hamming <= 3), salt-split oversized buckets, in-bucket XOR +
    table-popcount verify, one distinct-pair exchange."""
    _hash_shuffle_ctx()

    def rows(t: pa.Table) -> pa.Table:
        doc = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sim = t[sig_col].combine_chunks().to_numpy(
            zero_copy_only=False).view(np.uint64)
        chunks = np.zeros((len(doc), SIMHASH_BANDS), dtype=np.int64)
        for b in range(SIMHASH_BANDS):
            chunks[:, b] = (
                (sim >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            ).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(
                    np.arange(SIMHASH_BANDS, dtype=np.int32), len(doc))),
                "bucket": pa.array(chunks.reshape(-1)),
                "doc_id": pa.array(
                    np.repeat(doc, SIMHASH_BANDS).astype(np.int64)),
                "sim": pa.array(np.repeat(sim, SIMHASH_BANDS).view(np.int64)),
            }
        )

    bands = ds.select_columns([id_col, sig_col]).map_batches(
        rows, batch_format="pyarrow"
    ).materialize()
    part = bands.repartition(
        num_blocks=auto_partitions(bands, num_partitions),
        keys=["band", "bucket"],
    )
    pairs = part.map_batches(
        _simhash_pairs_block, fn_kwargs={"bucket_cap": bucket_cap},
        batch_format="pyarrow", batch_size=None,
    )
    return _dedupe_pairs(pairs, ("hamming", "min", pa.int64()), num_partitions)


# ---------------------------------------------------------------------------
# benchmark decontamination: drop training docs that share any word
# k-shingle with a (small) evaluation corpus — the classic pre-training
# leak check (the eval side is benchmarks: tiny by construction, so it
# broadcasts; the training side streams)
# ---------------------------------------------------------------------------

def eval_shingle_index(eval_ds: ray.data.Dataset) -> "ray.ObjectRef":
    """Sorted unique uint64 shingle hashes of the EVAL corpus, built as
    per-block unique partials (no shuffle) and finalized on the driver —
    the eval side of decontamination is benchmark data, orders of
    magnitude smaller than the corpus, so a broadcast index is the
    100TB-correct shape (never a join that shuffles the training side)."""

    def partial(t: pa.Table) -> pa.Table:
        sh, _ = _shingle_hashes(t)
        return pa.table({"h": pa.array(np.unique(sh))})

    parts = eval_ds.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()
    if parts:
        idx = np.unique(np.array([p["h"] for p in parts], dtype=np.uint64))
    else:
        idx = np.zeros(0, dtype=np.uint64)
    return ray.put(idx)


class _ContaminationMarker:
    """Actor-pool stage: per-doc count of DISTINCT shingles shared with
    the broadcast eval index (resolved once per actor in __init__)."""

    def __init__(self, index_ref):
        self.index = ray.get(index_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        n_overlap = np.zeros(t.num_rows, dtype=np.int64)
        sh, rid = _shingle_hashes(t)
        if len(sh) and len(self.index):
            order = np.lexsort((sh, rid))
            rs, ss = rid[order], sh[order]
            first = np.concatenate(
                ([True], (rs[1:] != rs[:-1]) | (ss[1:] != ss[:-1]))
            )
            rs, ss = rs[first], ss[first]
            pos = np.searchsorted(self.index, ss)
            pos[pos == len(self.index)] = 0
            hit = self.index[pos] == ss
            if hit.any():
                n_overlap = np.bincount(
                    rs[hit], minlength=t.num_rows
                ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_overlap": pa.array(n_overlap),
                "contaminated": pa.array(n_overlap > 0),
            }
        )


def decontaminate(
    ds: ray.data.Dataset, eval_ds: ray.data.Dataset
) -> ray.data.Dataset:
    """(doc_id, n_overlap, contaminated) per TRAINING doc: n_overlap =
    #distinct word SHINGLE_K-shingles shared with ``eval_ds``.  Pure
    map — no shuffle, no materialization of the training side."""
    from luzzu_ray.pipelines.filter_pipeline import cluster_cpus

    ref = eval_shingle_index(eval_ds)
    return ds.select_columns(["doc_id", "text"]).map_batches(
        _ContaminationMarker,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=(1, max(2, cluster_cpus())),
        fn_constructor_kwargs={"index_ref": ref},
    )


def shingle_df_profile(
    ds: ray.data.Dataset, min_df: int = 2, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Corpus-wide shingle document-frequency PROFILE: for every df >=
    ``min_df``, how many distinct word SHINGLE_K-shingles occur in
    exactly df documents — the boilerplate / template-detection
    aggregate (a shingle shared by thousands of docs is navigation
    chrome, not content).  Emitting the (df, n_shingles) distribution
    instead of the shingles themselves keeps the result hash-free, so a
    string-shingle SQL oracle compares exactly.

    Shape: per-block (shingle_hash, partial_df) pre-aggregates (distinct
    per doc first), ONE hash exchange on the shingle hash, per-block
    final df + profile partial, then a second narrow exchange on df —
    shingle payloads never leave their reduce block."""
    _hash_shuffle_ctx()
    num_partitions = auto_partitions(ds, num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        sh, rid = _shingle_hashes(t)
        if not len(sh):
            return pa.table(
                {"h": pa.array([], pa.uint64()),
                 "c": pa.array([], pa.int64())}
            )
        order = np.lexsort((sh, rid))
        rs, ss = rid[order], sh[order]
        first = np.concatenate(
            ([True], (rs[1:] != rs[:-1]) | (ss[1:] != ss[:-1]))
        )
        hu, cu = np.unique(ss[first], return_counts=True)
        return pa.table(
            {"h": pa.array(hu), "c": pa.array(cu.astype(np.int64))}
        )

    def df_profile_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"df": pa.array([], pa.int64()),
                 "n_shingles": pa.array([], pa.int64())}
            )
        h = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, c = h[order], c[order]
        starts = np.flatnonzero(
            np.concatenate(([True], h[1:] != h[:-1]))
        )
        df = np.add.reduceat(c, starts)
        df = df[df >= min_df]
        if not len(df):
            return pa.table(
                {"df": pa.array([], pa.int64()),
                 "n_shingles": pa.array([], pa.int64())}
            )
        dfu, nsh = np.unique(df, return_counts=True)
        return pa.table(
            {"df": pa.array(dfu.astype(np.int64)),
             "n_shingles": pa.array(nsh.astype(np.int64))}
        )

    def profile_merge(t: pa.Table) -> pa.Table:
        return (
            t.group_by("df").aggregate([("n_shingles", "sum")])
            .rename_columns(["df", "n_shingles"])
        )

    parts = ds.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    profiles = parts.repartition(
        num_blocks=num_partitions, keys=["h"]
    ).map_batches(df_profile_block, batch_format="pyarrow", batch_size=None)
    return profiles.repartition(
        num_blocks=max(2, num_partitions // 16), keys=["df"]
    ).map_batches(profile_merge, batch_format="pyarrow", batch_size=None)


def doc_novelty_frac(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-document cross-corpus NOVELTY: the fraction of a doc's
    distinct word SHINGLE_K-shingles that occur in no other document
    (corpus df == 1) — the per-doc complement of the corpus-wide
    ``shingle_df_profile`` (a doc assembled from boilerplate scores 0,
    unique prose scores 1), the Self-BLEU-style diversity diagnostic
    (Zhu et al. 2018) as exact integers.  Docs with fewer than
    SHINGLE_K word tokens emit no row (no shingle exists), matching
    the SQL twin's ``len(ts) >= k`` gate.

    Shape: per-block distinct (shingle_hash, doc_id) pairs (globally
    distinct — a doc lives in one input row), ONE gram-keyed exchange
    computes df per hash and collapses immediately to per-doc
    (n, n_unique) partials (<= num_partitions rows per doc), then one
    narrow doc-keyed exchange finalizes.  Shingle payloads never leave
    their reduce block; the exchange carries 16-byte rows.  Same
    hash-vs-string caveat as every shingle op here: two distinct grams
    colliding in 64 bits would merge (probability ~ n^2/2^64,
    non-adversarial inputs only).
    """
    _hash_shuffle_ctx()
    num_partitions = auto_partitions(ds, num_partitions)

    def pairs(t: pa.Table) -> pa.Table:
        sh, rid = _shingle_hashes(t)
        empty = pa.table({
            "h": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
        })
        if not len(sh):
            return empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sh, rid))
        rs, ss = rid[order], sh[order]
        first = np.concatenate(
            ([True], (rs[1:] != rs[:-1]) | (ss[1:] != ss[:-1]))
        )
        return pa.table({
            "h": pa.array(ss[first]),
            "doc_id": pa.array(ids[rs[first]].astype(np.int64)),
        })

    def df_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "u": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        h = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        counts = np.diff(np.concatenate((starts, [len(h)])))
        uniq_row = np.repeat(counts == 1, counts)
        docs, n = np.unique(d, return_counts=True)
        u = np.zeros(len(docs), dtype=np.int64)
        if uniq_row.any():
            ud, uc = np.unique(d[uniq_row], return_counts=True)
            u[np.searchsorted(docs, ud)] = uc
        return pa.table({
            "doc_id": pa.array(docs.astype(np.int64)),
            "n": pa.array(n.astype(np.int64)),
            "u": pa.array(u),
        })

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_shingles": pa.array([], pa.int64()),
                "n_unique": pa.array([], pa.int64()),
                "novelty_q6": pa.array([], pa.int64()),
            })
        g = t.group_by("doc_id").aggregate([("n", "sum"), ("u", "sum")])
        n = g["n_sum"].to_numpy(zero_copy_only=False)
        u = g["u_sum"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": g["doc_id"],
            "n_shingles": pa.array(n.astype(np.int64)),
            "n_unique": pa.array(u.astype(np.int64)),
            "novelty_q6": pa.array((10**6 * u // n).astype(np.int64)),
        })

    pr = ds.select_columns(["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow"
    )
    partials = pr.repartition(
        num_blocks=num_partitions, keys=["h"]
    ).map_batches(df_partial, batch_format="pyarrow", batch_size=None)
    return partials.repartition(
        num_blocks=max(2, num_partitions // 4), keys=["doc_id"]
    ).map_batches(finalize, batch_format="pyarrow", batch_size=None)


def dup_span_docs(
    ds: ray.data.Dataset, min_df: int = 2, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-document duplicated-substring SPAN signal (the exact
    cross-document substring-dedup statistic of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499, at word-shingle granularity): for every doc,
    ``n_grams`` = its SHINGLE_K-gram position count and ``n_dup_pos`` =
    how many of those positions carry a gram that occurs in >=
    ``min_df`` DISTINCT documents.  ``n_dup_pos / n_grams`` is the
    fraction of the document that is corpus-duplicated text — the
    pruning score the paper thresholds on.

    Scale shape (no broadcast, no driver materialization — the df
    table never leaves the cluster, unlike decontaminate's bounded
    eval-side index):

    1. map: per-block (gram_hash, doc_id, n_occ) pre-aggregates — the
       exchange carries block-local gram vocabularies with occurrence
       counts, never token streams; per-doc totals stay map-side
       entirely (a doc is one row, so its gram count never needs an
       exchange) and enter the final doc-keyed exchange as
       (doc_id, n_grams, 0) rows;
    2. ONE hash exchange on gram_hash: each reduce block combines its
       grams' (doc, n_occ) partials, computes df = #distinct docs,
       and emits (doc_id, 0, n_dup_pos) partials for grams with
       df >= min_df;
    3. one narrow doc-keyed exchange sums the two streams.

    Same 64-bit gram-hash identity assumption as the minhash/shingle
    family (distinct grams collide with probability ~n^2/2^64 —
    negligible below ~10^8 distinct grams per corpus; the SQL oracle
    uses string grams, so a collision would surface as a hash
    mismatch, not pass silently)."""
    _hash_shuffle_ctx()
    num_partitions = auto_partitions(ds, num_partitions)
    k = SHINGLE_K

    def partial(t: pa.Table) -> pa.Table:
        sh, rid = _shingle_hashes(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        # map-side per-doc totals (complete: a doc is one row)
        _, tr = token_hashes_for_rows(t)
        ntok = np.bincount(tr, minlength=t.num_rows) if len(tr) else (
            np.zeros(t.num_rows, dtype=np.int64))
        n_grams = np.maximum(ntok - (k - 1), 0).astype(np.int64)
        # totals ride the gram exchange as passthrough rows; their key
        # is a doc-derived pseudo-hash so they SPREAD over partitions
        # (h=0 would funnel every doc's total into one reduce block)
        with np.errstate(over="ignore"):
            spread = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        totals = pa.table({
            "h": pa.array(spread),
            "doc_id": pa.array(ids.astype(np.int64)),
            "n_occ": pa.array(n_grams),
            "is_total": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })
        if not len(sh):
            return totals
        order = np.lexsort((sh, rid))
        rs, ss = rid[order], sh[order]
        first = np.concatenate(
            ([True], (rs[1:] != rs[:-1]) | (ss[1:] != ss[:-1]))
        )
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(rs))
        occ = pa.table({
            "h": pa.array(ss[starts]),
            "doc_id": pa.array(ids[rs[starts]].astype(np.int64)),
            "n_occ": pa.array((ends - starts).astype(np.int64)),
            "is_total": pa.array(np.zeros(len(starts), dtype=np.int8)),
        })
        return pa.concat_tables([occ, totals])

    def dup_block(t: pa.Table) -> pa.Table:
        """Reduce block co-located by gram hash: combine (h, doc)
        partials, flag df >= min_df, emit per-doc dup partials; total
        rows (is_total=1) pass through unchanged."""
        tot = t.filter(pc.equal(t["is_total"], 1))
        g = t.filter(pc.equal(t["is_total"], 0))
        passthrough = pa.table({
            "doc_id": tot["doc_id"],
            "n_grams": tot["n_occ"],
            "n_dup_pos": pa.array(
                np.zeros(tot.num_rows, dtype=np.int64)),
        })
        if g.num_rows == 0:
            return passthrough
        h = g["h"].combine_chunks().to_numpy(zero_copy_only=False)
        d = g["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        c = g["n_occ"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d, c = h[order], d[order], c[order]
        # combine multi-block partials of the same (h, doc)
        first = np.concatenate(
            ([True], (h[1:] != h[:-1]) | (d[1:] != d[:-1]))
        )
        starts = np.flatnonzero(first)
        hh, dd = h[starts], d[starts]
        cc = np.add.reduceat(c, starts)
        # df per gram = run length over hh (distinct docs per hash)
        gfirst = np.concatenate(([True], hh[1:] != hh[:-1]))
        gstarts = np.flatnonzero(gfirst)
        df = np.diff(np.append(gstarts, len(hh)))
        dup_gram = np.repeat(df >= min_df, df)
        if not dup_gram.any():
            return passthrough
        dsel, csel = dd[dup_gram], cc[dup_gram]
        # per-doc partial within this block
        dorder = np.argsort(dsel, kind="stable")
        dsel, csel = dsel[dorder], csel[dorder]
        dstarts = np.flatnonzero(
            np.concatenate(([True], dsel[1:] != dsel[:-1])))
        dups = pa.table({
            "doc_id": pa.array(dsel[dstarts].astype(np.int64)),
            "n_grams": pa.array(
                np.zeros(len(dstarts), dtype=np.int64)),
            "n_dup_pos": pa.array(
                np.add.reduceat(csel, dstarts).astype(np.int64)),
        })
        return pa.concat_tables([passthrough, dups])

    def doc_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate(
            [("n_grams", "sum"), ("n_dup_pos", "sum")])
        return g.rename_columns(["doc_id", "n_grams", "n_dup_pos"])

    parts = ds.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    dups = parts.repartition(
        num_blocks=num_partitions, keys=["h"]
    ).map_batches(dup_block, batch_format="pyarrow", batch_size=None)
    return dups.repartition(
        num_blocks=max(2, num_partitions // 4), keys=["doc_id"]
    ).map_batches(doc_merge, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Fuzzy (edit-distance<=1) prefix pair mining via deletion neighborhoods
# ---------------------------------------------------------------------------

def fuzzy_prefix_pairs(
    ds: ray.data.Dataset,
    prefix_len: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """All doc pairs whose lowercased ``prefix_len``-char prefix is
    within BYTE-level edit distance 1 (matching SQL ``levenshtein``,
    which DuckDB computes over bytes) — the fuzzy-title/near-identical-
    header dedup family.

    Blocking is the deletion-neighborhood scheme (spell-checker
    folklore; cf. FastSS, Bocek et al. 2007): each prefix emits itself
    plus its <= prefix_len single-byte-deletion variants as bucket
    keys.  Two strings at byte edit distance <= 1 ALWAYS share a key
    (equal -> the string; substitution -> deletion at that byte;
    indel -> the shorter string), so recall is 1 and the in-bucket
    verify (exact cp+cs >= len-1 rule, equivalent to edit<=1) restores
    precision.  Shuffle carries only (variant, doc_id, prefix) rows —
    ~(prefix_len+1) x 3 small fields per doc, never documents.

    In-bucket work groups docs by prefix VALUE first: value pairs are
    verified with a per-pair bytes check (buckets hold few distinct
    values; same measured trade-off as the Jaccard verify kernel) and
    doc pairs expand via vectorized index outer products.  Equal-prefix
    groups emit all intra-group pairs — the op's output contract is
    inherently quadratic in duplicate count; at web scale feed the
    pairs into ``cluster_pairs`` instead of materializing them.
    Duplicate discoveries across buckets are removed by one narrow
    exchange on the pair itself.  Output: (d1, d2), d1 < d2.
    """
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    big = 1 << 30

    def keys_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))  # NULL text pairs nothing
        p = pc.cast(
            pc.utf8_lower(
                pc.utf8_slice_codeunits(
                    t[text_col].combine_chunks(), 0, prefix_len
                )
            ),
            pa.binary(),
        )
        ids = t[id_col].combine_chunks()
        outs = [pa.table({"key": p, id_col: ids, "p": p})]
        for j in range(prefix_len * 4):  # prefix bytes (utf8 <= 4x chars)
            head = pc.binary_slice(p, 0, j)
            tail = pc.binary_slice(p, j + 1, big)
            var = pc.binary_join_element_wise(head, tail, b"")
            keep = pc.greater(pc.binary_length(p), j)
            if pc.sum(keep).as_py() in (0, None):
                break
            outs.append(
                pa.table({"key": var, id_col: ids, "p": p}).filter(keep)
            )
        return pa.concat_tables(outs)

    def ed1(a: bytes, b: bytes) -> bool:
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        cp = 0
        m = min(la, lb)
        while cp < m and a[cp] == b[cp]:
            cp += 1
        cs = 0
        while cs < m - cp and a[la - 1 - cs] == b[lb - 1 - cs]:
            cs += 1
        return cp + cs >= max(la, lb) - 1

    def mine_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"d1": pa.array([], pa.int64()), "d2": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("key", "ascending"), ("p", "ascending"),
             (id_col, "ascending")]
        )
        key = t["key"].combine_chunks()
        pv = t["p"].combine_chunks()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ke = pc.dictionary_encode(key).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        pe = pc.dictionary_encode(pv).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        # dedupe (key, doc) repeats from out-of-range deletion slots
        first = np.concatenate(
            ([True], (ke[1:] != ke[:-1]) | (ids[1:] != ids[:-1])
             | (pe[1:] != pe[:-1]))
        )
        ke, pe, ids = ke[first], pe[first], ids[first]
        pdict = pc.dictionary_encode(pv).dictionary
        d1s, d2s = [], []
        new_k = np.concatenate(([True], ke[1:] != ke[:-1]))
        starts = np.flatnonzero(new_k)
        bounds = np.concatenate((starts, [len(ke)]))
        for bi in range(len(starts)):
            s, e = bounds[bi], bounds[bi + 1]
            if e - s < 2:
                continue
            pseg, iseg = pe[s:e], ids[s:e]
            new_v = np.concatenate(([True], pseg[1:] != pseg[:-1]))
            vs = np.flatnonzero(new_v)
            vb = np.concatenate((vs, [len(pseg)]))
            vals = [bytes(pdict[pseg[x]].as_py()) for x in vs]
            docs = [iseg[vb[x]:vb[x + 1]] for x in range(len(vs))]
            for i in range(len(vals)):
                di = docs[i]
                if len(di) > 1:  # equal-prefix pairs
                    a, b = np.triu_indices(len(di), 1)
                    d1s.append(di[a]); d2s.append(di[b])
                for j in range(i + 1, len(vals)):
                    if ed1(vals[i], vals[j]):
                        lo = np.repeat(di, len(docs[j]))
                        hi = np.tile(docs[j], len(di))
                        d1s.append(np.minimum(lo, hi))
                        d2s.append(np.maximum(lo, hi))
        if not d1s:
            return empty
        return pa.table(
            {"d1": pa.array(np.concatenate(d1s).astype(np.int64)),
             "d2": pa.array(np.concatenate(d2s).astype(np.int64))}
        )

    def distinct_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"d1": pa.array([], pa.int64()),
                 "d2": pa.array([], pa.int64())}
            )
        a = t["d1"].to_numpy(zero_copy_only=False)
        b = t["d2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
        )
        return pa.table(
            {"d1": pa.array(a[keep]), "d2": pa.array(b[keep])}
        )

    triples = ds.select_columns([id_col, text_col]).map_batches(
        keys_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = triples.repartition(
        num_blocks=num_partitions, keys=["key"]
    ).map_batches(mine_block, batch_format="pyarrow", batch_size=None)
    return pairs.repartition(
        num_blocks=num_partitions, keys=["d1", "d2"]
    ).map_batches(distinct_block, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Exact set-similarity join via prefix filtering (recall EXACTLY 1):
# Chaudhuri et al. ICDE'06 / Bayardo et al. WWW'07 prefix principle,
# distributed per Vernica et al. SIGMOD'10
# ---------------------------------------------------------------------------

SSJOIN_HOT_DF = 256


def ssjoin_pairs(
    ds: ray.data.Dataset,
    jaccard_threshold: float = 0.5,
    hot_df: int = SSJOIN_HOT_DF,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(a, b, jaccard_q6): ALL pairs with exact word-shingle Jaccard >=
    threshold — recall exactly 1, no banding miss probability — via the
    prefix-filter principle: under ANY fixed global token order, two
    sets with J >= t must share a token inside each side's first
    ``n - ceil(t*n) + 1`` tokens, so only prefix tokens are emitted to
    the bucket exchange and every bucket pair is exactly verified (the
    existing broadcast/join Jaccard kernel).

    The global order is rarest-first by tier: shingles NOT in the hot
    set (df < hot_df) come first ordered by hash, then hot shingles by
    (exact df, hash) — pushing frequent shingles to suffixes so they
    rarely enter prefixes, which is what bounds bucket sizes (the
    Vernica et al. token-frequency ordering, coarsened to a two-tier
    broadcastable map: only shingles with df >= hot_df — at most
    total_occurrences/hot_df of them — are broadcast, not the whole
    dictionary).  SKEW NOTE: a hot shingle can still enter prefixes of
    docs that are mostly-hot; such buckets are quadratic in their size
    — inherent to exact prefix joins, mitigated by raising hot_df.

    Threshold is interpreted at q6 fixed point (tq/10^6) so the prefix
    length is computed in exact integers on both engines.
    """
    from ray.data.aggregate import Sum

    _hash_shuffle_ctx()
    tq = int(jaccard_threshold * 1e6)

    sets = ds.select_columns(["doc_id", "text"]).map_batches(
        _shingle_sets_batch, batch_format="pyarrow"
    ).materialize()  # narrow (id, packed u64s, n) rows; reused twice
    num_partitions = auto_partitions(sets, num_partitions)

    def df_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"sh": pa.array([], pa.uint64()),
                 "df": pa.array([], pa.int64())}
            )
        allv = np.frombuffer(
            b"".join(t["shingles"].to_pylist()), dtype="<u8"
        )
        u, c = np.unique(allv, return_counts=True)
        return pa.table(
            {"sh": pa.array(u.astype(np.uint64)),
             "df": pa.array(c.astype(np.int64))}
        )

    # per-doc sets are distinct, docs live in one row -> summed partial
    # df is the EXACT document frequency
    dparts = sets.map_batches(
        df_partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    hot_tbl = dparts.groupby(
        "sh", num_partitions=auto_partitions(dparts, None)
    ).aggregate(Sum("df", alias_name="df")).filter(
        expr=f"df >= {hot_df}"
    ).take_all()  # <= total_occurrences / hot_df rows
    hot_sh = np.array([r["sh"] for r in hot_tbl], dtype=np.uint64)
    hot_df_arr = np.array([r["df"] for r in hot_tbl], dtype=np.int64)
    ho = np.argsort(hot_sh)
    hot_sh, hot_df_arr = hot_sh[ho], hot_df_arr[ho]
    hot_ref = ray.put((hot_sh, hot_df_arr))

    class PrefixEmit:
        """Per batch: unpack sets, two-tier (df, hash) lexsort within
        each doc segment, emit the first n - ceil(t*n) + 1 entries."""

        def __init__(self, ref):
            self.hot_sh, self.hot_df = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"sh": pa.array([], pa.uint64()),
                     "doc_id": pa.array([], pa.int64()),
                     "n_sh": pa.array([], pa.int64())}
                )
            bufs = t["shingles"].to_pylist()
            n_sh = t["n_sh"].to_numpy(zero_copy_only=False)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            allv = np.frombuffer(b"".join(bufs), dtype="<u8")
            rid = np.repeat(np.arange(len(bufs), dtype=np.int64), n_sh)
            pos = np.searchsorted(self.hot_sh, allv)
            pos = np.minimum(pos, max(len(self.hot_sh) - 1, 0))
            hit = (
                (self.hot_sh[pos] == allv)
                if len(self.hot_sh) else np.zeros(len(allv), bool)
            )
            dfv = np.where(hit, self.hot_df[pos] if len(self.hot_sh)
                           else 0, 0)
            order = np.lexsort((allv, dfv, rid))
            rs = rid[order]
            newseg = np.concatenate(([True], rs[1:] != rs[:-1]))
            seg_start = np.maximum.accumulate(
                np.where(newseg, np.arange(len(rs)), 0)
            )
            within = np.arange(len(rs)) - seg_start
            p = n_sh - (tq * n_sh + 10**6 - 1) // 10**6 + 1
            keep = within < p[rs]
            return pa.table(
                {"sh": pa.array(allv[order][keep].astype(np.uint64)),
                 "doc_id": pa.array(ids[rs[keep]]),
                 "n_sh": pa.array(n_sh[rs[keep]])}
            )

    prefixes = sets.map_batches(
        PrefixEmit, fn_constructor_kwargs={"ref": hot_ref},
        batch_format="pyarrow", concurrency=_pool(),
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "w": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        sh = t["sh"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, sh))
        sh, doc = sh[order], doc[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sh[1:] != sh[:-1]))
        )
        bounds = np.concatenate((starts, [len(sh)]))
        d1s, d2s = [], []
        for i in range(len(starts)):
            s, e = bounds[i], bounds[i + 1]
            if e - s < 2:
                continue
            d = doc[s:e]
            ia, ib = np.triu_indices(len(d), 1)
            d1s.append(d[ia]); d2s.append(d[ib])
        if not d1s:
            return empty
        a = np.concatenate(d1s); b = np.concatenate(d2s)
        return pa.table(
            {"a": pa.array(np.minimum(a, b).astype(np.int64)),
             "b": pa.array(np.maximum(a, b).astype(np.int64)),
             "w": pa.array(np.ones(len(a), dtype=np.int64))}
        )

    raw_pairs = prefixes.repartition(
        num_blocks=num_partitions, keys=["sh"]
    ).map_batches(bucket_pairs, batch_format="pyarrow", batch_size=None)
    cand = _dedupe_pairs(raw_pairs, ("w", "max", pa.int64()),
                         num_partitions)
    return exact_jaccard_pairs(ds, cand, tq / 1e6, num_partitions)


# ---------------------------------------------------------------------------
# exact prefix-containment detection (containment-style dedup)
# ---------------------------------------------------------------------------

PREFIX_BUCKET_CP = 8
PREFIX_SHORT_CAP = 100_000


def _prefix_flag_block(t: pa.Table) -> pa.Table:
    """Whole-bucket kernel: flag rows whose text is a prefix of ANOTHER
    doc's text in this block.  Relies on the lexicographic-interval
    property: if any string in a set has prefix a, the immediate sorted
    successor of a has prefix a — so ONE adjacent byte-compare pass
    over the block-sorted texts decides every row.  Fully vectorized:
    one Arrow sort, one gathered byte-equality over concatenated
    candidate prefixes, one ``logical_and.reduceat``."""
    from luzzu_ray.functions.text import utf8_view

    if t.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "is_prefix_dup": pa.array([], pa.bool_())})
    sort_idx = pc.sort_indices(t["text"].combine_chunks())
    ts = t["text"].combine_chunks().take(sort_idx)
    ids = t["doc_id"].combine_chunks().take(sort_idx)
    data, offs = utf8_view(ts)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    n = len(lens)
    flag = np.zeros(n, dtype=bool)
    if n > 1:
        la, lb = lens[:-1], lens[1:]
        cand = np.flatnonzero(la <= lb)  # pair i -> i+1
        la_c = la[cand]
        # empty-prefix pairs are trivially contained
        flag[cand[la_c == 0]] = True
        nz = la_c > 0
        cand, la_c = cand[nz], la_c[nz]
        if len(cand):
            # gather in bounded chunks: the index arrays cost ~25x the
            # prefix bytes they compare, so a block of near-duplicate
            # long docs (this op's target workload) would otherwise
            # allocate GBs transiently
            budget = 16 << 20  # bytes of gathered prefix per chunk
            cum = np.cumsum(la_c)
            lo = 0
            while lo < len(cand):
                base = cum[lo - 1] if lo else 0
                hi = int(np.searchsorted(cum, base + budget)) + 1
                hi = min(hi, len(cand))
                cc, lc = cand[lo:hi], la_c[lo:hi]
                starts = np.concatenate(([0], np.cumsum(lc[:-1])))
                pos = np.arange(int(lc.sum())) - np.repeat(starts, lc)
                ia = np.repeat(offs[:-1][cc].astype(np.int64), lc) + pos
                ib = np.repeat(offs[1:][cc].astype(np.int64), lc) + pos
                eq = data[ia] == data[ib]
                flag[cc] = np.logical_and.reduceat(eq, starts)
                lo = hi
        # the LAST row of an equal-text run has no containing
        # successor but equals its predecessor — also contained
        eq_prev = flag[:-1] & (la == lb)
        flag[1:] |= eq_prev
    return pa.table({"doc_id": ids, "is_prefix_dup": pa.array(flag)})


class _ShortPrefixCounter:
    """Actor-pool stage: count, per broadcast short pattern, how many
    docs in each batch start with it (patterns resolved once per actor
    from the object store).

    Vectorized by PATTERN LENGTH, not per pattern: all patterns are
    shorter than PREFIX_BUCKET_CP codepoints, so there are at most that
    many distinct lengths; each length costs one ``utf8_slice`` + one
    ``index_in`` + one ``bincount`` over the batch — O(batch x lengths),
    never O(batch x |patterns|) (a 50k-pattern short set would
    otherwise mean 50k sequential scans per batch)."""

    def __init__(self, ref):
        patterns = ray.get(ref)
        self.by_len: dict[int, tuple[pa.Array, np.ndarray]] = {}
        for ln in {len(p) for p in patterns}:
            idxs = np.array(
                [j for j, p in enumerate(patterns) if len(p) == ln],
                dtype=np.int64)
            vals = pa.array([patterns[j] for j in idxs], pa.string())
            self.by_len[ln] = (vals, idxs)
        self.n_patterns = len(patterns)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].combine_chunks()
        tot = np.zeros(self.n_patterns, dtype=np.int64)
        for ln, (vals, idxs) in self.by_len.items():
            if ln == 0:
                # the empty string prefixes every (non-null) string
                tot[idxs] += len(texts) - texts.null_count
                continue
            sliced = pc.utf8_slice_codeunits(texts, 0, ln)
            pos = pc.index_in(sliced, value_set=vals)
            hits = pos.to_numpy(zero_copy_only=False)
            ok = ~np.isnan(hits)
            if ok.any():
                local = np.bincount(hits[ok].astype(np.int64),
                                    minlength=len(idxs))
                tot[idxs] += local
        nz = np.flatnonzero(tot)
        return pa.table({"sidx": pa.array(nz),
                         "n": pa.array(tot[nz])})


def prefix_contained(
    ds: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact PREFIX-CONTAINMENT dedup flags: for every doc, is its text
    a prefix of some OTHER doc's text (equal texts count — containment
    subsumes exact duplication)?  SQL twin: ``EXISTS(SELECT 1 FROM d b
    WHERE b.doc_id <> a.doc_id AND starts_with(b.text, a.text))``.

    Scale shape — three disjoint paths, no all-pairs anywhere:

    * docs with >= 8 codepoints bucket by their first-8-codepoint key
      and hash-exchange ONCE; a contained prefix always shares its
      container's bucket, and inside a co-located bucket the sorted
      immediate-successor check decides every row in one vectorized
      pass (cross-bucket pairs are impossible at this length);
    * docs SHORTER than the bucket key can be prefixes of anything, so
      they broadcast (``ray.put``, resolved per actor) and each batch
      counts matches vectorially per pattern; contained iff the global
      count >= 2 (the pattern matches itself once).  Degenerate-length
      docs are assumed rare — capped at PREFIX_SHORT_CAP with a loud
      error, never silent truncation;
    * NULL text matches nothing (SQL semantics) and flags false.
    """
    import ray.data as _rd

    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    picked = ds.select_columns(["doc_id", "text"])

    def with_len(t: pa.Table) -> pa.Table:
        lens = pc.fill_null(pc.utf8_length(t["text"]), -1)
        return t.append_column("_cp", pc.cast(lens, pa.int64()))

    tagged = picked.map_batches(with_len, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    longs = tagged.filter(
        expr=f"_cp >= {PREFIX_BUCKET_CP}")

    def bucket(t: pa.Table) -> pa.Table:
        p8 = pc.utf8_slice_codeunits(t["text"], 0, PREFIX_BUCKET_CP)
        return pa.table({"doc_id": t["doc_id"], "text": t["text"],
                         "p8": p8})

    long_flags = longs.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True,
    ).repartition(
        num_blocks=auto_partitions(longs, num_partitions), keys=["p8"],
    ).map_batches(_prefix_flag_block, batch_format="pyarrow",
                  batch_size=None)

    shorts = tagged.filter(
        expr=f"_cp >= 0 and _cp < {PREFIX_BUCKET_CP}"
    ).select_columns(["doc_id", "text"]).take_all()
    if len(shorts) > PREFIX_SHORT_CAP:
        raise ValueError(
            f"prefix_contained: {len(shorts)} docs shorter than "
            f"{PREFIX_BUCKET_CP} codepoints exceed the broadcast cap "
            f"{PREFIX_SHORT_CAP}; raise the cap or pre-filter degenerate "
            "docs")
    short_ids = np.array([r["doc_id"] for r in shorts], dtype=np.int64)
    out_parts = []
    if len(shorts):
        patterns = [r["text"] for r in shorts]
        ref = ray.put(patterns)
        # partials are <= |shorts| rows per block — sum on the driver
        # rather than paying (and risking a small-session deadlock
        # with) a second aggregator pool
        counts = picked.map_batches(
            lambda t: t.filter(pc.is_valid(t["text"])),
            batch_format="pyarrow", zero_copy_batch=True,
        ).map_batches(
            _ShortPrefixCounter, fn_constructor_args=(ref,),
            concurrency=_pool(), batch_format="pyarrow",
        ).take_all()
        tot = np.zeros(len(patterns), dtype=np.int64)
        for r in counts:
            tot[r["sidx"]] += r["n"]
        out_parts.append(pa.table(
            {"doc_id": pa.array(short_ids),
             "is_prefix_dup": pa.array(tot >= 2)}))
    def null_false(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"],
             "is_prefix_dup": pa.array(
                 np.zeros(t.num_rows, dtype=bool))}
        )

    nulls = tagged.filter(expr="_cp < 0").map_batches(
        null_false, batch_format="pyarrow", zero_copy_batch=True)
    out = long_flags.union(nulls)
    if out_parts:
        out = out.union(_rd.from_arrow(pa.concat_tables(out_parts)))
    return out


def cluster_size_hist(
    res: pa.Table | ray.data.Dataset,
) -> pa.Table | ray.data.Dataset:
    """Histogram of near-dup cluster sizes from a dedup labeling
    ((doc_id, cluster, is_dup) — the :func:`minhash_dedup` /
    :func:`simhash_dedup` output): (cluster_size, n_clusters) rows.

    The shape of this distribution is the standard post-dedup sanity
    check (a heavy tail of giant clusters usually means boilerplate or
    a degenerate shingle domain, not true near-duplication).  Two
    narrow grouped counts — the input labeling is already bounded by
    the clustered-doc count, so both exchanges are trivial at any
    scale."""

    def hist_table(t: pa.Table) -> pa.Table:
        sizes = t.group_by("cluster").aggregate([("doc_id", "count")])
        h = sizes.group_by("doc_id_count").aggregate([("cluster", "count")])
        out = pa.table({
            "cluster_size": pc.cast(h["doc_id_count"], pa.int64()),
            "n_clusters": pc.cast(h["cluster_count"], pa.int64()),
        })
        return out.sort_by("cluster_size")

    if isinstance(res, pa.Table):
        return hist_table(res)
    from ray.data.aggregate import Count

    sizes = res.groupby("cluster", num_partitions=4).aggregate(
        Count(alias_name="cluster_size"))
    hist = sizes.groupby("cluster_size", num_partitions=4).aggregate(
        Count(alias_name="n_clusters"))

    def cast_block(t: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_size": pc.cast(t["cluster_size"], pa.int64()),
            "n_clusters": pc.cast(t["n_clusters"], pa.int64()),
        })

    return hist.map_batches(cast_block, batch_format="pyarrow")


def _containment_q6(inter: np.ndarray, na: np.ndarray) -> np.ndarray:
    """floor(|A∩B| * 1e6 / |A|) in exact int64 (inter <= na <= doc
    shingle count, so the product stays far under 2^63)."""
    return np.where(na > 0, inter * 1_000_000 // np.maximum(na, 1), -1)


class _BroadcastContainmentVerifier:
    """Actor-pool stage: containment of A (column a) in B (column b)
    against a broadcast doc_id -> packed-shingle-set index."""

    def __init__(self, index_ref):
        import ray

        self.index = (ray.get(index_ref)
                      if not isinstance(index_ref, dict) else index_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "containment_q6": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        get = self.index.get
        bufs_a = [get(x, b"") for x in t["a"].to_pylist()]
        bufs_b = [get(x, b"") for x in t["b"].to_pylist()]
        inter, na, _ = _intersect_counts(bufs_a, bufs_b, t.num_rows)
        return pa.table(
            {"a": t["a"], "b": t["b"],
             "containment_q6": pa.array(_containment_q6(inter, na))}
        )


def _verify_joined_containment(t: pa.Table) -> pa.Table:
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "containment_q6": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    na = t["n_a"].to_numpy(zero_copy_only=False)
    inter, _, _ = _intersect_counts(
        t["sh_a"].to_pylist(), t["sh_b"].to_pylist(), t.num_rows
    )
    return pa.table(
        {"a": t["a"], "b": t["b"],
         "containment_q6": pa.array(_containment_q6(inter, na))}
    )


def containment_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.7,
    num_partitions: int | None = None,
    broadcast_max: int = CANDIDATE_BROADCAST_MAX,
) -> ray.data.Dataset:
    """(a, b, containment_q6): ORDERED pairs where doc a's word-shingle
    set is contained in doc b's at >= threshold —
    ``|A∩B| * 1e6 // |A| >= thr_q6``, a != b.  Catches the asymmetric
    near-dups Jaccard misses (a short doc quoted whole inside a long
    one has high containment but LOW Jaccard, so minhash banding never
    candidates it).

    Candidates by the containment prefix filter (pigeonhole): if
    ``|A∩B| >= ceil(t*|A|)`` then A shares at least one of its FIRST
    ``|A| - ceil(t*|A|) + 1`` shingles (under the fixed ascending-hash
    global order) with B — so probes emit only prefixes while the index
    side emits every shingle.  The full-postings index is the inherent
    cost of a containment join (same exchange class as
    :func:`luzzu_ray.ops.vocab.inverted_postings`); recall is exactly 1.

    SKEW NOTE: a hot shingle makes its bucket |probes| x |docs| —
    inherent to exact prefix joins; the refinement path is ssjoin's
    two-tier rarest-first token order (`ssjoin_pairs`), which empties
    hot shingles out of prefixes.  Verification reuses the
    broadcast-vs-sequential-join auto-routing of
    :func:`exact_jaccard_pairs`, orientation kept (containment is
    asymmetric: both (a,b) and (b,a) are evaluated independently).
    """
    import ray

    _hash_shuffle_ctx()
    thr_q6 = int(threshold * 1e6)

    sets = ds.select_columns(["doc_id", "text"]).map_batches(
        _shingle_sets_batch, batch_format="pyarrow"
    ).materialize()
    num_partitions = auto_partitions(sets, num_partitions)

    def emit(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sh": pa.array([], pa.uint64()),
             "doc_id": pa.array([], pa.int64()),
             "is_probe": pa.array([], pa.bool_())}
        )
        if t.num_rows == 0:
            return empty
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        out_sh, out_doc, out_probe = [], [], []
        for i in range(t.num_rows):
            vals = np.frombuffer(t["shingles"][i].as_py(), dtype="<u8")
            n = len(vals)
            if n == 0:
                continue
            p = n - (thr_q6 * n + 999_999) // 1_000_000 + 1
            p = max(1, min(n, p))
            out_sh.append(vals)
            out_doc.append(np.full(n, doc[i], dtype=np.int64))
            probe = np.zeros(n, dtype=bool)
            probe[:p] = True  # packed buffers are sorted ascending
            out_probe.append(probe)
        if not out_sh:
            return empty
        return pa.table(
            {"sh": pa.array(np.concatenate(out_sh).astype(np.uint64)),
             "doc_id": pa.array(np.concatenate(out_doc)),
             "is_probe": pa.array(np.concatenate(out_probe))}
        )

    posts = sets.map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "z": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("sh", "ascending")])
        sh = t["sh"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        probe = t["is_probe"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], sh[1:] != sh[:-1])))
        bounds = np.concatenate((starts, [len(sh)]))
        out_a, out_b = [], []
        for i in range(len(starts)):
            s, e = bounds[i], bounds[i + 1]
            probes = doc[s:e][probe[s:e]]
            if len(probes) == 0 or e - s < 2:
                continue
            allv = doc[s:e]
            a = np.repeat(probes, len(allv))
            b = np.tile(allv, len(probes))
            keep = a != b
            out_a.append(a[keep])
            out_b.append(b[keep])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        return pa.table(
            {"a": pa.array(a), "b": pa.array(np.concatenate(out_b)),
             "z": pa.array(np.zeros(len(a), dtype=np.int64))}
        )

    part = posts.repartition(
        num_blocks=auto_partitions(posts, None), keys=["sh"]
    )
    cand = _dedupe_pairs(
        part.map_batches(bucket_pairs, batch_format="pyarrow",
                         batch_size=None),
        ("z", "min", pa.int64()), num_partitions,
    )

    verified = _route_pair_verify(
        ds, cand.select_columns(["a", "b"]),
        _BroadcastContainmentVerifier, _verify_joined_containment,
        num_partitions, broadcast_max, sets=sets,
    )
    return verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["containment_q6"], thr_q6)),
        batch_format="pyarrow",
    )


def cross_source_dup_matrix(
    ds: ray.data.Dataset,
    jaccard_threshold: float = 0.6,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Near-dup pair counts by UNORDERED source pair — "which corpus
    components copy from each other?".  Composes the exact-verified
    near-dup pair graph (:func:`ngram_jaccard_pairs`) with two
    SEQUENTIAL hash joins against the (doc_id, source) projection (the
    doc->source map is corpus-sized, so it is joined, never broadcast
    or driver-pulled), normalizes each pair to (least, greatest) source
    order, and reduces with one narrow grouped count.

    Output: (source_a, source_b, n_pairs) with source_a <= source_b —
    the diagonal counts within-source duplication.
    """
    from ray.data.aggregate import Count

    _hash_shuffle_ctx()
    pairs = ngram_jaccard_pairs(
        ds, jaccard_threshold, num_partitions
    ).materialize()
    num_partitions = auto_partitions(pairs, num_partitions)
    src = ds.select_columns(["doc_id", "source"]).materialize()
    src_a = src.map_batches(
        lambda t: t.rename_columns(["a", "src_a"]), batch_format="pyarrow",
    )
    src_b = src.map_batches(
        lambda t: t.rename_columns(["b", "src_b"]), batch_format="pyarrow",
    )
    p = pairs.select_columns(["a", "b"]).repartition(
        num_blocks=num_partitions)
    # plain repartition between the chained joins repacks the
    # schema-less empty blocks a hash-keyed join output can carry —
    # Acero rejects them with "No match for key field" on tiny inputs
    j1 = p.join(src_a, join_type="inner", on=("a",),
                num_partitions=num_partitions).repartition(
                    num_blocks=num_partitions).materialize()
    j2 = j1.join(src_b, join_type="inner", on=("b",),
                 num_partitions=num_partitions)

    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"source_a": pa.array([], pa.string()),
                             "source_b": pa.array([], pa.string())})
        sa = pc.cast(t["src_a"], pa.string())
        sb = pc.cast(t["src_b"], pa.string())
        return pa.table({
            "source_a": pc.min_element_wise(sa, sb),
            "source_b": pc.max_element_wise(sa, sb),
        })

    agg = j2.map_batches(norm, batch_format="pyarrow").groupby(
        ["source_a", "source_b"], num_partitions=4,
    ).aggregate(Count(alias_name="n_pairs"))

    def cast_block(t: pa.Table) -> pa.Table:
        return pa.table({
            "source_a": pc.cast(t["source_a"], pa.string()),
            "source_b": pc.cast(t["source_b"], pa.string()),
            "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
        })

    return agg.map_batches(cast_block, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# persisted near-dup index + cross-corpus probe
# ---------------------------------------------------------------------------

def neardup_probe_index(
    corpus: ray.data.Dataset,
    new: ray.data.Dataset,
    index_dir: str,
    probe_dir: str,
    jaccard_threshold: float = 0.6,
    n_buckets: int = 32,
    num_partitions: int | None = None,
    reuse_index: bool = False,
) -> ray.data.Dataset:
    """Cross-corpus near-dup against a PERSISTED banding index — the
    "dedup the new crawl against the existing corpus" primitive.
    ``reuse_index=True`` skips the build when ``index_dir`` already
    holds a compatible manifest (the amortization point: one corpus
    index, many probes).

    Phase 1 (build, once per corpus): verification-grade minhash band
    rows (r=2, b=32; miss probability (1-j^2)^32, ~6e-7 at j=0.6) are
    written as a hash-bucketed layout (`ops/bucketed.py`) keyed on the
    salted band-bucket value — a reusable on-disk index whose buckets
    are the resume unit, amortized across every future probe.

    Phase 2 (probe, per new slice): the new slice's band rows are
    co-partitioned with the SAME layout and candidate generation is a
    shuffle-free :func:`bucketed_join` (one task per bucket).  The
    per-band salt (`_BAND_SALT`) makes the bucket value alone a sound
    join key: equal values across DIFFERENT bands are a ~2^-64
    collision, and any false candidate dies in the exact verify.

    Phase 3: candidates dedupe through one narrow (a, b) exchange and
    are EXACTLY verified by word-shingle Jaccard
    (:func:`exact_jaccard_pairs`) over the union corpus.

    Output: (corpus_id, new_id, jaccard_q6), jaccard >= threshold.

    SCALE NOTE: a bucketed-join task holds its hottest band-bucket's
    cross product; verification-grade buckets are tiny on natural text,
    but an adversarial all-identical corpus needs the BUCKET_CAP
    salt-split of the standard candidate path applied at build time.
    """
    from .bucketed import bucket_write, bucketed_join

    def band_rows(t: pa.Table, out_id: str) -> pa.Table:
        b = _minhash_band_rows(
            t, n_bands=N_BANDS_VERIFY, band_r=BAND_R_VERIFY,
            with_sig=False,
        )
        return pa.table({"key": b["bucket"], out_id: b["doc_id"]})

    import os

    from .bucketed import MANIFEST_NAME, read_manifest

    have_index = (
        reuse_index
        and os.path.exists(os.path.join(index_dir, MANIFEST_NAME))
    )
    if have_index:
        m = read_manifest(index_dir)
        if m["key"] != "key" or int(m["n_buckets"]) != n_buckets:
            raise ValueError(
                f"existing index at {index_dir} has layout {m}, "
                f"expected key='key', n_buckets={n_buckets}"
            )
    else:
        bucket_write(
            corpus.map_batches(
                band_rows, fn_kwargs={"out_id": "corpus_id"},
                batch_format="pyarrow",
            ),
            "key", n_buckets, index_dir,
        )
    bucket_write(
        new.map_batches(
            band_rows, fn_kwargs={"out_id": "new_id"},
            batch_format="pyarrow",
        ),
        "key", n_buckets, probe_dir,
    )

    def local_pairs(j: pa.Table) -> pa.Table:
        g = j.select(["corpus_id", "new_id"]).group_by(
            ["corpus_id", "new_id"]).aggregate([])
        return g.rename_columns(["a", "b"])

    cand = bucketed_join(
        index_dir, probe_dir, "key", "key", per_bucket=local_pairs,
    ).materialize()  # narrow (a, b) pairs; count sizes the dedupe

    def distinct_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return t.group_by(["a", "b"]).aggregate([])

    cand = cand.repartition(
        num_blocks=auto_partitions(cand, num_partitions), keys=["a", "b"]
    ).map_batches(distinct_block, batch_format="pyarrow",
                  batch_size=None)

    both = corpus.union(new)
    verified = exact_jaccard_pairs(
        both, cand, jaccard_threshold, num_partitions
    )
    return verified.map_batches(
        lambda t: t.rename_columns(["corpus_id", "new_id", "jaccard_q6"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) shared-chunk statistics
# ---------------------------------------------------------------------------

CDC_W = 8          # boundary-decision window, bytes
CDC_B = 131        # window-hash base
CDC_M = (1 << 31) - 1   # window-hash modulus (Mersenne; h*B fits int64)
CDC_D = 64         # boundary divisor -> expected chunk ~D+W bytes


def cdc_chunk_stats(
    ds: ray.data.Dataset,
    min_df: int = 2,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-document content-defined-chunk dedup signal: split every
    document at CONTENT-DEFINED cut points (the LBFS/storage-dedup
    construction: a boundary falls after any ``CDC_W``-byte window
    whose polynomial hash is ``0 mod CDC_D``), then report per doc
    ``n_chunks`` and ``n_shared`` = chunk instances whose content
    occurs in >= ``min_df`` DISTINCT documents.

    Because boundaries depend only on a local byte window, an
    insertion or deletion re-chunks ONLY its neighborhood — two
    documents that share a long run of text share its interior chunks
    no matter how their prefixes differ.  That makes
    ``n_shared / n_chunks`` a partial-duplication score that fixed
    shingles (``dup_span_docs``) and whole-text keys cannot see past
    an edit, the classic CDC robustness property.

    Scale shape mirrors ``dup_span_docs`` (no broadcast, no driver
    pull): one chunk-hash exchange computes df per chunk content and
    emits per-doc dup partials; one narrow doc-keyed exchange sums
    them with the map-side per-doc totals.  Chunk identity is the
    64-bit mod-2^64 Horner hash of the chunk bytes — same
    collision-probability contract as the shingle family (the SQL
    oracle groups by chunk STRING, so a collision surfaces as a hash
    mismatch, never silently).  Boundary detection and chunk hashing
    are fully vectorized over the batch's flat byte buffer (prefix
    Horner hashes + gather; no per-row Python).  Docs shorter than
    ``CDC_W`` are one chunk; empty/NULL docs emit no row.

    ASCII-domain note (same contract as the fingerprint family): the
    engine windows over BYTES while the SQL twin windows over
    codepoints, identical on ASCII corpora.
    """
    _hash_shuffle_ctx()
    num_partitions = auto_partitions(ds, num_partitions)
    w = CDC_W

    def _chunks(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Return (chunk_hash u64, rid int64, n_chunks per row)."""
        from luzzu_ray.functions import text as TX

        n = t.num_rows
        data, offs = TX.utf8_view(t["text"])
        offs0 = offs - offs[0]
        flat = data[offs[0]:offs[-1]].astype(np.int64)
        nflat = len(flat)
        nwin = nflat - w + 1
        if nwin > 0:
            h = np.zeros(nwin, dtype=np.int64)
            for j in range(w):
                h = (h * CDC_B + flat[j:nwin + j]) % CDC_M
            starts = np.flatnonzero(h % CDC_D == 0)
            doc_of = np.searchsorted(offs0, starts, "right") - 1
            ok = starts + w <= offs0[doc_of + 1]
            cuts = starts[ok] + w
        else:
            cuts = np.zeros(0, dtype=np.int64)
        bounds = np.union1d(cuts, offs0)  # sorted unique flat positions
        seg_s, seg_e = bounds[:-1], bounds[1:]
        keep = seg_e > seg_s
        seg_s, seg_e = seg_s[keep], seg_e[keep]
        rid = np.searchsorted(offs0, seg_s, "right") - 1
        n_chunks = np.bincount(rid, minlength=n).astype(np.int64)
        if not len(seg_s):
            return np.zeros(0, np.uint64), rid, n_chunks
        # chunk hash via prefix Horner mod 2^64: H(s..e) =
        # P[e] - P[s] * B^(e-s), P inclusive-prefix of the flat bytes
        # Weighted-prefix trick: pref[i] = sum_{j<i} b[j]*B^(n-1-j)
        # (one cumsum, no sequential Horner scan); then
        # H(s..e) = (pref[e]-pref[s]) * B^-(n-e)  ==  Horner hash of
        # the chunk with leading coefficient B^(len-1).  B (the FNV
        # prime) is odd, hence invertible mod 2^64, so the rescale is
        # one gather from an inverse-power table.
        with np.errstate(over="ignore"):
            b64 = flat.astype(np.uint64)
            base = _CK_BASE1
            pows = np.empty(nflat, dtype=np.uint64)
            pows[0] = np.uint64(1)
            if nflat > 1:
                np.cumprod(np.full(nflat - 1, base, dtype=np.uint64),
                           out=pows[1:])
            pref = np.empty(nflat + 1, dtype=np.uint64)
            pref[0] = np.uint64(0)
            np.cumsum(b64 * pows[::-1], out=pref[1:])
            invp = np.empty(nflat + 1, dtype=np.uint64)
            invp[0] = np.uint64(1)
            if nflat:
                np.cumprod(np.full(nflat, _modinv64(base),
                                   dtype=np.uint64), out=invp[1:])
            ch = (pref[seg_e] - pref[seg_s]) * invp[nflat - seg_e]
        return ch, rid, n_chunks

    def partial(t: pa.Table) -> pa.Table:
        ch, rid, n_chunks = _chunks(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            spread = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        present = n_chunks > 0
        totals = pa.table({
            "h": pa.array(spread[present]),
            "doc_id": pa.array(ids[present].astype(np.int64)),
            "n_occ": pa.array(n_chunks[present]),
            "is_total": pa.array(
                np.ones(int(present.sum()), dtype=np.int8)),
        })
        if not len(ch):
            return totals
        order = np.lexsort((ch, rid))
        rs, cs = rid[order], ch[order]
        first = np.concatenate(
            ([True], (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])))
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(rs))
        occ = pa.table({
            "h": pa.array(cs[starts]),
            "doc_id": pa.array(ids[rs[starts]].astype(np.int64)),
            "n_occ": pa.array((ends - starts).astype(np.int64)),
            "is_total": pa.array(np.zeros(len(starts), dtype=np.int8)),
        })
        return pa.concat_tables([occ, totals])

    parts = ds.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow")
    return chunk_df_stats_pipeline(parts, min_df, num_partitions)


def chunk_df_stats_pipeline(
    parts: ray.data.Dataset, min_df: int, num_partitions: int
) -> ray.data.Dataset:
    """Shared tail of the chunk-dedup family (CDC and sliding-window
    chunking both feed it): ``parts`` rows are ``(h:uint64,
    doc_id:int64, n_occ:int64, is_total:int8)`` — per-block distinct
    (chunk-hash, doc) occurrence partials plus one per-doc total row
    (``is_total = 1``, ``h`` = a spread hash of the doc id so totals
    distribute).  One h-keyed exchange computes df per chunk content
    and per-doc dup partials; one narrow doc-keyed exchange merges
    them with the totals.  Output: (doc_id, n_chunks, n_shared)."""

    def dup_block(t: pa.Table) -> pa.Table:
        tot = t.filter(pc.equal(t["is_total"], 1))
        g = t.filter(pc.equal(t["is_total"], 0))
        passthrough = pa.table({
            "doc_id": tot["doc_id"],
            "n_chunks": tot["n_occ"],
            "n_shared": pa.array(np.zeros(tot.num_rows, dtype=np.int64)),
        })
        if g.num_rows == 0:
            return passthrough
        h = g["h"].combine_chunks().to_numpy(zero_copy_only=False)
        d = g["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        c = g["n_occ"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d, c = h[order], d[order], c[order]
        first = np.concatenate(
            ([True], (h[1:] != h[:-1]) | (d[1:] != d[:-1])))
        starts = np.flatnonzero(first)
        hh, dd = h[starts], d[starts]
        cc = np.add.reduceat(c, starts)
        gstarts = np.flatnonzero(
            np.concatenate(([True], hh[1:] != hh[:-1])))
        df = np.diff(np.append(gstarts, len(hh)))
        dup = np.repeat(df >= min_df, df)
        if not dup.any():
            return passthrough
        dsel, csel = dd[dup], cc[dup]
        dorder = np.argsort(dsel, kind="stable")
        dsel, csel = dsel[dorder], csel[dorder]
        dstarts = np.flatnonzero(
            np.concatenate(([True], dsel[1:] != dsel[:-1])))
        dups = pa.table({
            "doc_id": pa.array(dsel[dstarts].astype(np.int64)),
            "n_chunks": pa.array(np.zeros(len(dstarts), dtype=np.int64)),
            "n_shared": pa.array(
                np.add.reduceat(csel, dstarts).astype(np.int64)),
        })
        return pa.concat_tables([passthrough, dups])

    def doc_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate(
            [("n_chunks", "sum"), ("n_shared", "sum")])
        return g.rename_columns(["doc_id", "n_chunks", "n_shared"])

    dups = parts.repartition(
        num_blocks=num_partitions, keys=["h"]
    ).map_batches(dup_block, batch_format="pyarrow", batch_size=None)
    return dups.repartition(
        num_blocks=max(2, num_partitions // 4), keys=["doc_id"]
    ).map_batches(doc_merge, batch_format="pyarrow", batch_size=None)


def _modinv64(a: np.uint64) -> np.uint64:
    """Multiplicative inverse of an ODD a mod 2^64 (Newton iteration:
    x *= 2 - a*x doubles correct bits; 6 rounds from a 3-bit seed)."""
    a = np.uint64(a)
    with np.errstate(over="ignore"):
        x = a  # a*a == 1 mod 8 for odd a -> x correct to 3 bits
        for _ in range(6):
            x = x * (np.uint64(2) - a * x)
    return np.uint64(x)


WINNOW_K = 3          # token k-gram size (NGRAM_MIX supports up to 4)
WINNOW_W = 4          # winnowing window: one fingerprint per w grams
WINNOW_FP_MOD = 1 << 61  # output fold: BIGINT-safe on both sides


def winnowing_fingerprints(
    ds: ray.data.Dataset,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """WINNOWING document fingerprint selection (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003 — the MOSS local fingerprinting algorithm): over
    each document's token k-gram hash sequence, every window of ``w``
    consecutive grams selects its MINIMUM hash (ties to the RIGHTMOST
    position — the robust-winnowing rule), and the distinct (position,
    hash) selections are the document's fingerprints.  Guarantees: any
    shared substring of at least k + w - 1 tokens yields a shared
    fingerprint (the coverage bound of the paper), while storing ~2/(w
    + 1) of all gram hashes — the storage/recall dial minhash doesn't
    offer (minhash is per-document global; winnowing is positional, so
    fingerprints localize WHERE the overlap is).

    Exchange-free: one vectorized map pass (token hashes -> NGRAM_MIX
    k-gram combine -> sliding-window min via a stride view; windows
    never cross document boundaries).  Output (doc_id, pos, fp): pos =
    0-based gram index of the selected hash, fp = hash mod 2^61 (the
    BIGINT-safe fold; window minima compare on the FULL uint64 on both
    engine and SQL sides before folding).  ASCII-exact oracle domain
    (the SQL twin refolds the token hash per character).
    """
    from numpy.lib.stride_tricks import sliding_window_view

    from luzzu_ray import constants as C
    from luzzu_ray.ops.textstats import token_hashes_for_rows

    if k > len(C.NGRAM_MIX):
        raise ValueError(f"k={k} exceeds NGRAM_MIX size {len(C.NGRAM_MIX)}")

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "fp": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        tt = t.select([id_col, text_col]).rename_columns(
            ["doc_id", "text"])
        th, tr = token_hashes_for_rows(tt)
        if len(th) < k:
            return empty
        m = len(th) - k + 1
        g = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            g += th[j: j + m] * C.NGRAM_MIX[j]
        valid = tr[:m] == tr[k - 1:]
        rid_g = tr[:m]
        # gram index within its document (0-based over the doc's grams)
        starts = np.r_[0, np.flatnonzero(rid_g[1:] != rid_g[:-1]) + 1]
        gidx = np.searchsorted(starts, np.arange(m), "right") - 1
        pos_in_doc = np.arange(m, dtype=np.int64) - starts[gidx]
        if m >= w:
            sw = sliding_window_view(g, w)           # (m-w+1, w)
            # rightmost argmin: first min of the reversed window
            rpos = w - 1 - np.argmin(sw[:, ::-1], axis=1)
            wstart = np.arange(m - w + 1, dtype=np.int64)
            inside = (rid_g[wstart] == rid_g[wstart + w - 1]) & \
                valid[wstart] & valid[wstart + w - 1]
            sel = np.flatnonzero(inside)
            if len(sel) == 0:
                return empty
            abs_pos = wstart[sel] + rpos[sel]
            key = rid_g[abs_pos].astype(np.int64) * np.int64(m + 1) \
                + abs_pos
            _, first = np.unique(key, return_index=True)
            abs_u = abs_pos[first]
            ids = tt["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                id_col: pa.array(ids[rid_g[abs_u]].astype(np.int64)),
                "pos": pa.array(pos_in_doc[abs_u]),
                "fp": pa.array(
                    (g[abs_u] % np.uint64(WINNOW_FP_MOD)).astype(np.int64)),
            })
        return empty

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True)


WINNOW_DF_CAP = 50      # drop fingerprints shared by more docs (MOSS
                        # boilerplate suppression; identical on both
                        # engine and SQL sides, so still a hard oracle)
WINNOW_MIN_SHARED = 2   # pairs need >= this many shared fingerprints


def winnow_candidate_pairs(
    ds: ray.data.Dataset,
    min_shared: int = WINNOW_MIN_SHARED,
    df_cap: int = WINNOW_DF_CAP,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """MOSS-style overlap candidates from winnowing fingerprints
    (Schleimer et al. 2003 §4: documents sharing selected fingerprints
    are plagiarism/overlap candidates; sharing is POSITIONAL, so this
    catches partial overlap minhash's whole-document Jaccard dilutes):
    (a, b, n_shared) for every doc pair sharing at least ``min_shared``
    distinct fingerprint values, after dropping fingerprints present
    in more than ``df_cap`` docs (boilerplate suppression — applied
    identically by the SQL twin, so the oracle stays hard).

    Scale shape: distinct (doc, fp) rows (block-local — a doc never
    splits across batches) flow through ONE fp-keyed exchange;
    per-fp doc lists are <= df_cap by construction, pair expansion is
    vectorized per distinct group SIZE (one triu template per size,
    broadcast over all groups of that size); the (a, b) partials
    collapse through one narrow pair-keyed grouped sum.
    """
    from luzzu_ray.ops.relational import grouped_sum_q
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    from luzzu_ray.ops.dedup import auto_partitions  # self-import ok

    width = auto_partitions(ds, num_partitions)

    def distinct_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "fp": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
            })
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = t["fp"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, f))
        ds_, fs_ = d[order], f[order]
        first = np.ones(len(ds_), dtype=bool)
        first[1:] = (ds_[1:] != ds_[:-1]) | (fs_[1:] != fs_[:-1])
        return pa.table({
            "fp": pa.array(fs_[first]), "doc_id": pa.array(ds_[first])})

    part = ds.map_batches(
        distinct_block, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=width, keys=["fp"])

    def pair_block(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "n_shared": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        f = t["fp"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, f))
        fs_, ds_ = f[order], d[order]
        # re-establish per-fp DISTINCT docs: the block-local distinct
        # upstream cannot see (fp, doc) rows split across blocks —
        # without this, a split doc self-pairs and inflates n_shared
        # (review r05 finding); fp groups are fully co-located here
        uniq = np.ones(len(fs_), dtype=bool)
        uniq[1:] = (fs_[1:] != fs_[:-1]) | (ds_[1:] != ds_[:-1])
        fs_, ds_ = fs_[uniq], ds_[uniq]
        if len(fs_) == 0:
            return empty
        starts = np.r_[0, np.flatnonzero(fs_[1:] != fs_[:-1]) + 1]
        sizes = np.diff(np.append(starts, len(fs_)))
        keep = sizes <= df_cap
        out_a, out_b = [], []
        for s in np.unique(sizes[keep & (sizes > 1)]):
            ii, jj = np.triu_indices(int(s), 1)
            g0 = starts[keep & (sizes == s)]
            # (n_groups, n_pairs) absolute indices via broadcasting
            ai = (g0[:, None] + ii[None, :]).reshape(-1)
            bi = (g0[:, None] + jj[None, :]).reshape(-1)
            out_a.append(ds_[ai])
            out_b.append(ds_[bi])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({
            "a": pa.array(lo), "b": pa.array(hi),
            "n_shared": pa.array(np.ones(len(lo), dtype=np.int64)),
        })

    sums = grouped_sum_q(
        part.map_batches(pair_block, batch_format="pyarrow",
                         batch_size=None),
        ["a", "b"], float_cols={}, int_cols={"n_shared": "n_shared"},
        num_partitions=num_partitions,
    )
    return sums.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_shared"], min_shared)),
        batch_format="pyarrow",
    )


def cluster_safe_split(
    ds: ray.data.Dataset,
    labels: "pa.Table | ray.data.Dataset",
    hash_a: int,
    hash_b: int,
    id_col: str = "doc_id",
    train_bp: int = 8000,
    val_bp: int = 9000,
) -> ray.data.Dataset:
    """Near-dup-SAFE train/val/test split — the enforcement side of the
    split-leakage audit: the split key is the doc's near-dup CLUSTER id
    (component minimum from ``minhash_dedup``) when it has one, else
    its own id, so every member of a near-dup cluster lands in the
    SAME split and eval contamination by near-duplicates is
    structurally impossible (Lee et al. 2022's dedup-before-split
    lesson, applied to the split itself).  Buckets: ``((key * A + B)
    mod 2^64) mod 10^4`` against basis-point thresholds.
    Output: (id, split) with split in {train, val, test}.

    Scale shape: the label table is narrow (clustered docs only); one
    LEFT union-exchange hash join attaches cluster ids, then the split
    is an exchange-free keyed-hash map.
    """
    import ray.data as _rd

    from luzzu_ray.ops.relational import outer_hash_join

    if isinstance(labels, pa.Table):
        labels = _rd.from_arrow(labels)
    lab = labels.map_batches(
        lambda t: pa.table({"_lid": t["doc_id"], "cluster": t["cluster"]}),
        batch_format="pyarrow",
    )
    j = outer_hash_join(
        ds.select_columns([id_col]), lab, id_col, "_lid",
        [], ["cluster"], how="left",
    )

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "split": pa.array([], pa.string()),
            })
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl_arr = t["cluster"].combine_chunks()
        null_mask = (cl_arr.is_null().to_numpy(zero_copy_only=False)
                     if cl_arr.null_count else
                     np.zeros(t.num_rows, dtype=bool))
        cl = np.nan_to_num(
            cl_arr.to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        key = np.where(null_mask, ids, cl).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = ((key * np.uint64(hash_a) + np.uint64(hash_b))
                 % np.uint64(10000)).astype(np.int64)
        split = np.where(b < train_bp, "train",
                         np.where(b < val_bp, "val", "test"))
        return pa.table({
            id_col: pa.array(ids),
            "split": pa.array(split.tolist(), pa.string()),
        })

    return j.map_batches(assign, batch_format="pyarrow")
