"""Deduplication operators (D1 family + training-data-pipeline extensions).

Luzzu's extensional-conciseness metric flags duplicate records `[paper]`
(/root/reference/README.md:7); at training-data scale the same capability
splits into:

- exact dedup            hash-partition + per-group keep-first
- MinHash + LSH near-dup shingle -> minhash sig -> band buckets -> groupby
- SimHash near-dup       64-bit sign fingerprint -> band buckets -> hamming
- n-gram Jaccard verify  exact set Jaccard on LSH candidate pairs

All are Ray-Data compositions: vectorized ``map_batches`` to compute
signatures, ONE hash shuffle on the bucket/content key, NumPy segmented
ops inside whole-block functions.  The candidate-pair merge (union-find)
runs on the driver over the candidate-pair table only — pair volume
scales with near-dup density, not corpus size (documented assumption;
salting/partitioned union-find is the 100TB escalation path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from luzzu_ray.ops.textstats import token_hashes_for_rows

# ---------------------------------------------------------------------------
# deterministic hash families (seeded once, shared by engine + tests)
# ---------------------------------------------------------------------------
_rng = np.random.Generator(np.random.PCG64(20260817))
N_PERM = 64          # minhash permutations
N_BANDS = 16         # bands of r = N_PERM // N_BANDS rows
BAND_R = N_PERM // N_BANDS
SHINGLE_K = 3        # word-shingle width
_MH_A = _rng.integers(1, 2**63, size=N_PERM, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
_MH_B = _rng.integers(0, 2**63, size=N_PERM, dtype=np.uint64)
_BAND_SALT = _rng.integers(1, 2**63, size=N_BANDS, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
SIMHASH_BANDS = 4    # 4 x 16-bit chunks
SIMHASH_HAMMING_MAX = 3


def _hash_shuffle_ctx() -> None:
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(ds: ray.data.Dataset, num_partitions: int | None = None) -> ray.data.Dataset:
    """(doc_id, is_dup): is_dup iff a smaller doc_id has identical text.

    Hash-partition on the text content key, then per-block group-min —
    the keep-first idiom.  Shuffles (doc_id, text) rows exactly once.
    """
    from luzzu_ray.pipelines.filter_pipeline import default_num_partitions

    _hash_shuffle_ctx()
    if num_partitions is None:
        num_partitions = default_num_partitions()

    picked = ds.select_columns(["doc_id", "text"])
    part = picked.repartition(num_blocks=num_partitions, keys=["text"])

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "is_dup": pa.array([], pa.bool_())}
            )
        mins = t.group_by("text").aggregate([("doc_id", "min")])
        joined = t.join(mins, keys=["text"], join_type="inner")
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
# LSH banding -> candidate pairs -> driver-side union-find
# ---------------------------------------------------------------------------

def _minhash_band_rows(t: pa.Table) -> pa.Table:
    """Explode each doc into N_BANDS (band, bucket) rows."""
    sig, has = minhash_signatures(t)
    doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(has)
    with np.errstate(over="ignore"):
        bands = sig[idx].reshape(len(idx), N_BANDS, BAND_R)
        bucket = np.zeros((len(idx), N_BANDS), dtype=np.uint64)
        for j in range(BAND_R):
            bucket = bucket * np.uint64(1099511628211) + bands[:, :, j]
        bucket = bucket * _BAND_SALT[None, :]
    n_out = len(idx) * N_BANDS
    return pa.table(
        {
            "band": pa.array(
                np.tile(np.arange(N_BANDS, dtype=np.int32), len(idx))
            ),
            "bucket": pa.array(bucket.reshape(-1).view(np.int64)),
            "doc_id": pa.array(np.repeat(doc[idx], N_BANDS)),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.repeat(sig[idx], N_BANDS, axis=0).reshape(-1).view(np.int64)
                ),
                N_PERM,
            ),
        }
    ) if n_out else pa.table(
        {
            "band": pa.array([], pa.int32()),
            "bucket": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "sig": pa.array([], pa.list_(pa.int64(), N_PERM)),
        }
    )


def _candidate_pairs_block(t: pa.Table, sim_threshold: float) -> pa.Table:
    """Within one hash-partitioned block: pairs sharing a (band,bucket)
    whose signature agreement >= threshold.  Emits (a, b, est_sim)."""
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
    sig = np.stack(t["sig"].combine_chunks().to_numpy(zero_copy_only=False))
    key_change = np.concatenate(
        ([True], (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1]))
    )
    gid = np.cumsum(key_change) - 1
    counts = np.bincount(gid)
    out_a, out_b, out_s = [], [], []
    for g in np.flatnonzero(counts > 1):
        members = np.flatnonzero(gid == g)
        d = doc[members]
        s = sig[members]
        for i in range(len(members)):
            agree = (s[i + 1 :] == s[i]).mean(axis=1)
            ok = agree >= sim_threshold
            for j in np.flatnonzero(ok):
                out_a.append(min(d[i], d[i + 1 + j]))
                out_b.append(max(d[i], d[i + 1 + j]))
                out_s.append(float(agree[j]))
    if not out_a:
        return empty
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
         "est_sim": pa.array(out_s, pa.float64())}
    )


def minhash_candidate_pairs(
    ds: ray.data.Dataset,
    sim_threshold: float = 0.7,
    num_partitions: int | None = None,
) -> pa.Table:
    """Distinct candidate (a, b, est_sim) pairs, a < b (small table)."""
    from luzzu_ray.pipelines.filter_pipeline import default_num_partitions

    _hash_shuffle_ctx()
    if num_partitions is None:
        num_partitions = default_num_partitions()
    bands = ds.select_columns(["doc_id", "text"]).map_batches(
        _minhash_band_rows, batch_format="pyarrow"
    )
    part = bands.repartition(num_blocks=num_partitions, keys=["band", "bucket"])
    pairs = part.map_batches(
        _candidate_pairs_block,
        fn_kwargs={"sim_threshold": sim_threshold},
        batch_format="pyarrow",
        batch_size=None,
    )
    tbl = pa.Table.from_pylist(
        pairs.take_all(),
        schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("est_sim", pa.float64())]
        ),
    )
    if tbl.num_rows == 0:
        return tbl
    # same pair can surface from multiple bands — keep max est_sim
    return tbl.group_by(["a", "b"]).aggregate([("est_sim", "max")]).rename_columns(
        ["a", "b", "est_sim"]
    )


def _union_find_clusters(pairs: pa.Table) -> dict[int, int]:
    """doc_id -> cluster representative (min doc_id in component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def minhash_dedup(
    ds: ray.data.Dataset, sim_threshold: float = 0.7
) -> pa.Table:
    """(doc_id, cluster, is_dup) for every doc in a near-dup cluster."""
    pairs = minhash_candidate_pairs(ds, sim_threshold)
    clusters = _union_find_clusters(pairs)
    if not clusters:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64()),
             "is_dup": pa.array([], pa.bool_())}
        )
    docs = sorted(clusters)
    reps = [clusters[d] for d in docs]
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "cluster": pa.array(reps, pa.int64()),
            "is_dup": pa.array([d != r for d, r in zip(docs, reps)]),
        }
    )


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


def _simhash_pairs_block(t: pa.Table) -> pa.Table:
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "hamming": pa.array([], pa.int32())}
    )
    if t.num_rows == 0:
        return empty
    t = t.sort_by([("band", "ascending"), ("bucket", "ascending"),
                   ("doc_id", "ascending")])
    band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    sim = t["sim"].to_numpy(zero_copy_only=False).view(np.uint64)
    key_change = np.concatenate(
        ([True], (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1]))
    )
    gid = np.cumsum(key_change) - 1
    counts = np.bincount(gid)
    out_a, out_b, out_h = [], [], []
    for g in np.flatnonzero(counts > 1):
        members = np.flatnonzero(gid == g)
        d, s = doc[members], sim[members]
        for i in range(len(members)):
            x = s[i + 1 :] ^ s[i]
            ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int32)
            for j in np.flatnonzero(ham <= SIMHASH_HAMMING_MAX):
                out_a.append(min(d[i], d[i + 1 + j]))
                out_b.append(max(d[i], d[i + 1 + j]))
                out_h.append(int(ham[j]))
    if not out_a:
        return empty
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
         "hamming": pa.array(out_h, pa.int32())}
    )


def simhash_dedup(ds: ray.data.Dataset, num_partitions: int | None = None) -> pa.Table:
    """(doc_id, cluster, is_dup) via simhash banding + hamming verify."""
    from luzzu_ray.pipelines.filter_pipeline import default_num_partitions

    _hash_shuffle_ctx()
    if num_partitions is None:
        num_partitions = default_num_partitions()
    bands = ds.select_columns(["doc_id", "text"]).map_batches(
        simhash_band_rows, batch_format="pyarrow"
    )
    part = bands.repartition(num_blocks=num_partitions, keys=["band", "bucket"])
    pairs_ds = part.map_batches(
        _simhash_pairs_block, batch_format="pyarrow", batch_size=None
    )
    pairs = pa.Table.from_pylist(
        pairs_ds.take_all(),
        schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int32())]
        ),
    )
    if pairs.num_rows:
        pairs = pairs.group_by(["a", "b"]).aggregate([("hamming", "min")])
        pairs = pairs.rename_columns(["a", "b", "hamming"])
    clusters = _union_find_clusters(pairs)
    docs = sorted(clusters)
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "cluster": pa.array([clusters[d] for d in docs], pa.int64()),
            "is_dup": pa.array([d != clusters[d] for d in docs]),
        }
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification of LSH candidates
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    jaccard_threshold: float = 0.6,
    sim_threshold: float = 0.5,
) -> pa.Table:
    """(a, b, jaccard_q6) for LSH candidate pairs verified by EXACT
    word-shingle Jaccard >= threshold.

    Two passes: (1) minhash-LSH candidates; (2) broadcast the candidate
    doc-id set, re-scan only those docs' shingle sets (column-pruned,
    filtered at the batch level), exact Jaccard on the driver for the
    candidate pairs (pair count << corpus size).
    """
    cand = minhash_candidate_pairs(ds, sim_threshold)
    if cand.num_rows == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard_q6": pa.array([], pa.int64())}
        )
    need = pa.array(
        sorted(set(cand["a"].to_pylist()) | set(cand["b"].to_pylist())),
        pa.int64(),
    )

    def shingles_of(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["doc_id"], value_set=need))
        sh, rid = _shingle_hashes(t)
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc[rid] if len(rid) else np.zeros(0, np.int64)),
                "shingle": pa.array(sh.view(np.int64)),
            }
        )

    rows = ds.select_columns(["doc_id", "text"]).map_batches(
        shingles_of, batch_format="pyarrow"
    ).take_all()
    sets: dict[int, set] = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    out_a, out_b, out_j = [], [], []
    for a, b in zip(cand["a"].to_pylist(), cand["b"].to_pylist()):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= jaccard_threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(int(j * 1e6))
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
         "jaccard_q6": pa.array(out_j, pa.int64())}
    )
