"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), every batch does one NumPy matmul and keeps only its
local top-k (partial top-k), and a tiny final merge reduces
#batches x k rows per query.  Bytes leaving a worker are O(k), never
O(rows) — the pattern that still works when the corpus is 10^12 rows.

Scale path: random-hyperplane LSH bucketing — embeddings are bucketed
by sign-pattern; only buckets matching the query's pattern (within
hamming radius) are searched.  Documented trade-off: recall < 1.0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

LSH_SEED = 7071
LSH_PLANES = 12  # 4096 buckets


def lsh_planes(dim: int, n_planes: int = LSH_PLANES, seed: int = LSH_SEED) -> np.ndarray:
    """Deterministic random-hyperplane matrix — a FRESH generator per call
    so results never depend on how many times any LSH function ran earlier
    in the process (every other seeded component in the repo behaves so)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, zero-copy-ish."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Actor-pool stage: per-batch cosine top-k against broadcast queries.

    ``__init__`` resolves the query matrix ONCE per actor (object-store
    ref -> zero-copy numpy view); ``__call__`` is one matmul + argpartition.
    """

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qids = np.asarray(q["qids"], dtype=np.int64)
        self.Q = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        vec_id = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        E = _normalize(_as_matrix(t["embedding"]))
        if E.size == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        sims = E @ self.Q.T  # (n, q)
        k = min(self.k, sims.shape[0])
        out_q, out_v, out_c = [], [], []
        top = np.argpartition(-sims, kth=k - 1, axis=0)[:k]  # (k, q)
        for qi in range(sims.shape[1]):
            idx = top[:, qi]
            out_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            out_v.append(vec_id[idx])
            out_c.append(sims[idx, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos": pa.array(np.concatenate(out_c)),
            }
        )


def _final_topk(partials: pa.Table, k: int) -> pa.Table:
    """Merge per-batch partial top-k lists -> global (query_id, rank, vec_id)."""
    t = partials.sort_by(
        [("query_id", "ascending"), ("cos", "descending"), ("vec_id", "ascending")]
    )
    q = t["query_id"].to_numpy(zero_copy_only=False)
    new_q = np.concatenate(([True], q[1:] != q[:-1]))
    gid = np.cumsum(new_q) - 1
    starts = np.flatnonzero(new_q)
    pos = np.arange(len(q)) - starts[gid]
    mask = pos < k
    kept = t.filter(pa.array(mask))
    return pa.table(
        {
            "query_id": kept["query_id"],
            "rank": pa.array((pos[mask] + 1).astype(np.int64)),
            "vec_id": kept["vec_id"],
        }
    )


def ann_topk(
    ds: ray.data.Dataset,
    query_matrix: np.ndarray,
    query_ids: list[int],
    k: int = 10,
) -> pa.Table:
    """Exact cosine top-k per query vector.  Returns (query_id, rank, vec_id)."""
    ref = ray.put({"qids": list(query_ids), "matrix": np.asarray(query_matrix)})
    partials = ds.map_batches(
        BruteForceTopK,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
    )
    tbl = pa.Table.from_pylist(
        partials.take_all(),
        schema=pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("cos", pa.float64())]
        ),
    )
    return _final_topk(tbl, k)


# ---------------------------------------------------------------------------
# LSH-bucketed variant (the 100TB path: search only matching buckets)
# ---------------------------------------------------------------------------

def lsh_ann_topk(
    ds: ray.data.Dataset,
    query_matrix: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    hamming_radius: int = 1,
    seed: int = LSH_SEED,
) -> pa.Table:
    """Approximate top-k: random-hyperplane bucket filter, then exact
    cosine within candidate buckets only.  Recall < 1.0 by design."""
    planes = lsh_planes(dim, LSH_PLANES, seed)
    Q = np.asarray(query_matrix, dtype=np.float64)
    qsig = (Q @ planes.T > 0).astype(np.uint32)
    qcodes = (qsig << np.arange(LSH_PLANES, dtype=np.uint32)[None, :]).sum(axis=1)
    # buckets within hamming radius of any query code
    want: set[int] = set()
    for c in qcodes.tolist():
        want.add(c)
        if hamming_radius >= 1:
            for b in range(LSH_PLANES):
                want.add(c ^ (1 << b))
    want_arr = pa.array(sorted(want), pa.int64())

    # planes are tiny (LSH_PLANES x dim floats) — close over them directly;
    # Ray ships them once per task in the serialized closure, no per-batch get
    def bucket_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        E = _as_matrix(t["embedding"])
        if E.size == 0:
            return t
        sig = (E @ planes.T > 0).astype(np.uint32)
        codes = (sig << np.arange(LSH_PLANES, dtype=np.uint32)[None, :]).sum(axis=1)
        keep = pc.is_in(pa.array(codes.astype(np.int64)), value_set=want_arr)
        return t.filter(keep)

    filtered = ds.map_batches(bucket_filter, batch_format="pyarrow")
    return ann_topk(filtered, query_matrix, query_ids, k)
