"""Distributed graph analytics over co-occurrence edges.

Luzzu's quality-metric family includes interlinking/connectedness-style
metrics computed over the dataset-as-graph (reference README.md:7 —
"quality assessment ... in a scalable manner"); here that capability is
rebuilt Ray-Data-first over an edge list derived from a fact table:

- ``cooccurrence_edges``: DISTINCT undirected item pairs that share a
  group (e.g. parts appearing in the same order).  Pair generation is
  fully vectorized per co-located block (segment-arange over group run
  lengths, no Python loop over groups); the distinct step shuffles only
  the 16-byte (a, b) pairs.
- ``triangle_counts``: exact triangle count via the standard
  wedge-then-close plan: one native hash join builds wedges
  (a<b<c from two id-oriented edges sharing the middle node), then a
  composite-key SEMI join against the edge set closes them.  Every
  triangle is counted exactly once because edges are id-oriented
  (a < b) and wedges enforce a < b < c.

Scale posture: edge generation and the distinct step are narrow
key-hash exchanges.  The wedge join is the classical heavy step
(SUM(deg^2) rows); the documented refinement at web scale is
degree-orientation (orient each edge toward the higher-degree endpoint,
bounding wedges by SUM over nodes of min(deg, sqrt(m))^2 — the
"compact-forward" algorithm).  The triangle COUNT is invariant to the
orientation chosen, so the oracle stays valid; id-orientation is used
here and the degree-oriented variant only changes the two pre-joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# composite (a, c) semi-join keys pack two node ids into one int64
_PACK_BITS = 31


def _segment_arange(starts: np.ndarray, reps: np.ndarray) -> np.ndarray:
    """Concatenate ``arange(starts[i], starts[i] + reps[i])`` for all i."""
    total = int(reps.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    cum0 = np.zeros(len(reps), dtype=np.int64)
    np.cumsum(reps[:-1], out=cum0[1:])
    return (
        np.arange(total, dtype=np.int64)
        - np.repeat(cum0, reps)
        + np.repeat(starts, reps)
    )


def _pairs_block(t: pa.Table, group_col: str, item_col: str) -> pa.Table:
    """All distinct within-group item pairs (a < b) for a block holding
    complete groups (co-located by the upstream key exchange)."""
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    g = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
    it = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((it, g))
    g, it = g[order], it[order]
    # distinct (group, item)
    keep = np.ones(len(g), dtype=bool)
    keep[1:] = (g[1:] != g[:-1]) | (it[1:] != it[:-1])
    g, it = g[keep], it[keep]
    # group run lengths over the deduped rows
    starts_mask = np.ones(len(g), dtype=bool)
    starts_mask[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(starts_mask)
    sizes = np.diff(np.append(starts, len(g)))
    # element at global sorted position p (local index i in a group of
    # size s) pairs with the (s - 1 - i) elements after it
    local = np.arange(len(g), dtype=np.int64) - np.repeat(starts, sizes)
    reps = np.repeat(sizes, sizes) - 1 - local
    left = np.repeat(np.arange(len(g), dtype=np.int64), reps)
    right = _segment_arange(np.arange(len(g), dtype=np.int64) + 1, reps)
    if len(left) == 0:
        return empty
    return pa.table({"a": pa.array(it[left]), "b": pa.array(it[right])})


def cooccurrence_edges(
    ds: ray.data.Dataset,
    group_col: str,
    item_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """DISTINCT undirected co-occurrence edges (a < b, both int64).

    One key exchange co-locates groups, pair generation is vectorized
    per block, and a second narrow exchange on (a, b) dedups pairs that
    arise from different groups.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    ds = ds.select_columns([group_col, item_col])
    width = auto_partitions(ds, num_partitions)
    by_group = ds.repartition(num_blocks=width, keys=[group_col])
    pairs = by_group.map_batches(
        lambda t: _pairs_block(t, group_col, item_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )

    def distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return pairs.repartition(num_blocks=width, keys=["a", "b"]).map_batches(
        distinct, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )


def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) and (a.max() >= (1 << _PACK_BITS) or b.max() >= (1 << _PACK_BITS)):
        raise ValueError(
            f"node ids must fit {_PACK_BITS} bits for the composite "
            "semi-join key; widen _PACK_BITS or switch the close step "
            "to a two-column exchange"
        )
    return (a << np.int64(_PACK_BITS)) | b


# above this many distinct edges the packed-edge broadcast (8 bytes per
# edge; 20M -> 160 MB in each actor) stops being a "small side" and the
# wedge-join path takes over
TRIANGLE_BROADCAST_MAX_EDGES = 20_000_000


class _TriangleEdgeCounter:
    """Edge-iterator triangle partials against a broadcast packed edge
    set: for each edge (a, b) count common higher neighbors
    |{c > b : (a,c) and (b,c) edges}| — two searchsorted range lookups
    plus one batched sorted-merge membership test, all vectorized (the
    classic compact-forward algorithm; total work = wedge count as
    in-task numpy ops instead of shuffled rows)."""

    def __init__(self, packed_ref):
        self.packed = (
            ray.get(packed_ref)
            if isinstance(packed_ref, ray.ObjectRef) else packed_ref
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        p = self.packed
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            return pa.table({"n_tri": pa.array([], pa.int64())})
        # N+(a) restricted to values > b  (CSR == the globally sorted
        # packed array, so range bounds are two searchsorted calls)
        la = np.searchsorted(p, (a << _PACK_BITS) + b + 1)
        ra = np.searchsorted(p, (a + 1) << _PACK_BITS)
        lb = np.searchsorted(p, b << _PACK_BITS)
        rb = np.searchsorted(p, (b + 1) << _PACK_BITS)
        eid_a = np.repeat(np.arange(len(a), dtype=np.int64), ra - la)
        val_a = p[_segment_arange(la, ra - la)] & ((1 << _PACK_BITS) - 1)
        eid_b = np.repeat(np.arange(len(a), dtype=np.int64), rb - lb)
        val_b = p[_segment_arange(lb, rb - lb)] & ((1 << _PACK_BITS) - 1)
        keys_a = (eid_a << _PACK_BITS) | val_a
        keys_b = (eid_b << _PACK_BITS) | val_b  # globally sorted
        pos = np.searchsorted(keys_b, keys_a)
        pos_c = np.minimum(pos, max(len(keys_b) - 1, 0))
        hit = (pos < len(keys_b)) & (
            keys_b[pos_c] == keys_a if len(keys_b) else False
        )
        return pa.table({
            "n_tri": pa.array([int(np.count_nonzero(hit))], pa.int64())
        })


def triangle_counts(
    edges: ray.data.Dataset,
    num_partitions: int | None = None,
    broadcast_max_edges: int = TRIANGLE_BROADCAST_MAX_EDGES,
) -> pa.Table:
    """Exact (n_edges, n_triangles) over an id-oriented edge list.

    Two plans, selected by the distinct-edge count:

    - **broadcast edge-iterator** (edges fit a worker): the packed
      int64 edge set ships once via ``ray.put``; each task counts the
      closing neighbors of its edge batch with vectorized searchsorted
      kernels.  The wedge volume is paid as in-task numpy ops, never
      as shuffled rows — at sf0.1 this is ~50x faster than the join
      plan (49M wedge rows vs zero exchange).
    - **wedge join** (graph too big to broadcast): one native hash
      join builds wedges (a<b<c from two id-oriented edges sharing the
      middle node), then a composite-key SEMI join against the edge
      set closes them.  Both count() calls are metadata reductions.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.ops.relational import semi_join

    width = auto_partitions(edges, num_partitions)
    # repack key-repartitioned blocks before Acero (schema-less empties)
    e1 = edges.repartition(num_blocks=width).materialize()
    n_edges = e1.count()
    if n_edges <= broadcast_max_edges:
        def pack_block(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"p": pa.array(_pack(a, b))})

        packed = np.sort(
            e1.map_batches(pack_block, batch_format="pyarrow")
            .to_pandas()["p"].to_numpy()
        )
        from luzzu_ray.pipelines.filter_pipeline import default_actor_pool

        packed_ref = ray.put(packed)
        parts = e1.map_batches(
            _TriangleEdgeCounter,
            fn_constructor_args=(packed_ref,),
            batch_format="pyarrow", zero_copy_batch=True,
            # bounded batches keep the wedge expansion (~2*avg_deg rows
            # per edge) within a worker heap regardless of block size
            batch_size=65536,
            concurrency=default_actor_pool(),
        )
        n_tri = int(parts.sum("n_tri") or 0)
        return pa.table(
            {"n_edges": pa.array([n_edges], pa.int64()),
             "n_triangles": pa.array([n_tri], pa.int64())}
        )
    e2 = e1.map_batches(
        lambda t: t.rename_columns(["m", "c"]), batch_format="pyarrow"
    ).materialize()
    wedges = e1.join(
        e2, join_type="inner", on=("b",), right_on=("m",),
        num_partitions=width,
    )

    def pack_wedge(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ac": pa.array(_pack(a, c))})

    def pack_edge(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ab": pa.array(_pack(a, b))})

    closed = semi_join(
        wedges.map_batches(pack_wedge, batch_format="pyarrow"),
        e1.map_batches(pack_edge, batch_format="pyarrow"),
        left_key="ac", right_key="ab", carry_cols=[],
        num_partitions=width,
    )
    n_tri = closed.count()
    return pa.table(
        {"n_edges": pa.array([n_edges], pa.int64()),
         "n_triangles": pa.array([n_tri], pa.int64())}
    )
