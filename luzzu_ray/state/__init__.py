"""Shared mutable state — the raw-actor escape hatch (SURVEY.md §2.3 T3).

Most of the engine is pure Dataset transforms; the ONE place the Dataset
API genuinely cannot express the semantics is a shared mutable index
consulted and updated across concurrent batches (e.g. streaming-ingest
dedup against everything seen so far).  ``BloomDedupIndex`` is that
escape hatch: a single ``@ray.remote`` actor holding a Bloom filter,
with batched vectorized membership-test-and-insert.

Scale notes (documented per the custom-operator rule): one actor is a
serialization point — size batches large (>=4096) so the per-batch
round-trip amortizes; shard by key hash across K actors
(``ShardedBloom``) when one actor's throughput or memory is exceeded.
False positives drop unique rows at the configured rate; for exact
semantics use the shuffle-based ``ops.dedup.exact_duplicates`` instead.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams from uint64 keys."""
    with np.errstate(over="ignore"):
        h1 = keys * _MIX
        h1 ^= h1 >> np.uint64(29)
        h2 = (keys ^ (keys >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F)
        h2 |= np.uint64(1)
    return h1, h2


class _BloomCore:
    """The in-process Bloom filter: test-and-insert per key batch.

    Plain class so BOTH the shared remote actor (``BloomDedupIndex``)
    and the sequential deterministic consumer (``_SequentialMarker``)
    reuse the identical probe/insert kernel."""

    def __init__(self, n_bits_log2: int = 30, k: int = 6):
        self.mask = np.uint64((1 << n_bits_log2) - 1)
        self.k = k
        self.bits = np.zeros(1 << (n_bits_log2 - 3), dtype=np.uint8)
        self.n_inserted = 0

    def seen_and_add(self, keys: np.ndarray) -> np.ndarray:
        """For each key: True if (probably) seen before this call.

        Duplicates WITHIN the batch are resolved first-occurrence-wins,
        deterministically by position.
        """
        keys = np.asarray(keys, dtype=np.uint64)
        h1, h2 = _hash2(keys)
        seen = np.ones(len(keys), dtype=bool)
        idx_cache = []
        with np.errstate(over="ignore"):
            for i in range(self.k):
                pos = (h1 + np.uint64(i) * h2) & self.mask
                byte_i = (pos >> np.uint64(3)).astype(np.int64)
                bit_i = (pos & np.uint64(7)).astype(np.uint8)
                idx_cache.append((byte_i, bit_i))
                seen &= (self.bits[byte_i] >> bit_i) & 1 == 1
        # in-batch repeats count as seen (first occurrence wins)
        _, first_idx = np.unique(keys, return_index=True)
        is_first = np.zeros(len(keys), dtype=bool)
        is_first[first_idx] = True
        seen |= ~is_first
        for byte_i, bit_i in idx_cache:
            np.bitwise_or.at(self.bits, byte_i, np.uint8(1) << bit_i)
        self.n_inserted += int((~seen).sum())
        return seen

    def stats(self) -> dict:
        return {"n_inserted": self.n_inserted,
                "fill": float((self.bits != 0).mean())}


@ray.remote(num_cpus=0.5)
class BloomDedupIndex(_BloomCore):
    """Bloom-filter membership actor: test-and-insert per batch."""

    def __init__(self, n_bits_log2: int = 30, k: int = 6,
                 state_path: str | None = None):
        """``state_path`` resumes a filter persisted by :meth:`save`
        (cross-run streaming dedup: yesterday's keys still mark as
        duplicates); n_bits_log2/k are then taken from the state file
        and validated, never trusted from the caller."""
        if state_path is not None:
            import pyarrow.parquet as pq

            t = pq.read_table(state_path)
            mask = int(t["mask"][0].as_py())
            n_bits_log2 = mask.bit_length()
            if (1 << n_bits_log2) - 1 != mask:
                raise ValueError(f"corrupt bloom state: mask {mask:#x}")
            self.mask = np.uint64(mask)
            self.k = int(t["k"][0].as_py())
            if not 1 <= self.k <= 64:
                # k=0 would mark EVERY key as seen (the probe loop
                # never runs) — silent total data loss on resume
                raise ValueError(f"corrupt bloom state: k={self.k}")
            bits = np.frombuffer(t["bits"][0].as_py(), dtype=np.uint8)
            if len(bits) != 1 << (n_bits_log2 - 3):
                raise ValueError(
                    f"corrupt bloom state: {len(bits)} bytes for "
                    f"2^{n_bits_log2} bits")
            self.bits = bits.copy()
            self.n_inserted = int(t["n_inserted"][0].as_py())
            return
        super().__init__(n_bits_log2, k)

    # -- persistence: cross-run streaming dedup -------------------------
    # A pipeline rerun (append-mode ingest) reloads yesterday's filter
    # (constructor ``state_path``) so previously-seen keys still mark
    # as duplicates.  The bit array rides in ONE parquet binary cell;
    # params are validated on load, never trusted from the caller.

    def save(self, path: str) -> None:
        import pyarrow.parquet as pq

        t = pa.table(
            {"mask": pa.array([int(self.mask)], pa.uint64()),
             "k": pa.array([self.k], pa.int64()),
             "n_inserted": pa.array([self.n_inserted], pa.int64()),
             "bits": pa.array([self.bits.tobytes()], pa.binary())}
        )
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)


class ShardedBloom:
    """K Bloom actors sharded by key hash — the scale path when one
    actor's throughput or memory is exceeded.

    Each shard owns a disjoint key subspace (shard = mix(key) % K), so
    shards never need coordination; a batch is split into per-shard key
    groups, all K ``seen_and_add`` calls are issued CONCURRENTLY and the
    results scattered back in order.  Aggregate memory and round-trip
    throughput scale linearly in K.
    """

    def __init__(self, n_shards: int = 4, n_bits_log2: int = 28, k: int = 6,
                 num_cpus: float = 0.25):
        self.n_shards = n_shards
        self.shards = [
            BloomDedupIndex.options(num_cpus=num_cpus).remote(
                n_bits_log2=n_bits_log2, k=k
            )
            for _ in range(n_shards)
        ]

    def shard_of(self, keys: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (keys.astype(np.uint64) * np.uint64(0xD6E8FEB86659FD93))
        return ((h >> np.uint64(35)) % np.uint64(self.n_shards)).astype(np.int64)

    def seen_and_add(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        sh = self.shard_of(keys)
        out = np.zeros(len(keys), dtype=bool)
        refs, idxs = [], []
        for s in range(self.n_shards):
            idx = np.flatnonzero(sh == s)
            if len(idx):
                refs.append(self.shards[s].seen_and_add.remote(keys[idx]))
                idxs.append(idx)
        for idx, res in zip(idxs, ray.get(refs)):
            out[idx] = res
        return out

    def stats(self) -> dict:
        per = ray.get([s.stats.remote() for s in self.shards])
        return {"n_inserted": sum(p["n_inserted"] for p in per),
                "shards": per}


class StreamingDedupMarker:
    """Actor-pool stage marking rows whose content key was seen before.

    Holds a handle to the shared Bloom index — a single
    ``BloomDedupIndex`` actor or a ``ShardedBloom`` fan-out; batches are
    hashed locally (vectorized) and tested/inserted in one round-trip
    per (shard-)actor.
    """

    def __init__(self, index_handle, key_col: str = "text"):
        self.index = index_handle
        self.key_col = key_col

    def _seen(self, fp: np.ndarray) -> np.ndarray:
        if isinstance(self.index, ShardedBloom):
            return self.index.seen_and_add(fp)
        return ray.get(self.index.seen_and_add.remote(fp))

    def __call__(self, t: pa.Table) -> pa.Table:
        from luzzu_ray.ops.textstats import fingerprint_batch

        fp = fingerprint_batch(
            pa.table({"doc_id": pa.array(np.zeros(t.num_rows, np.int64)),
                      "text": t[self.key_col]})
        )["fingerprint"].to_numpy(zero_copy_only=False).view(np.uint64)
        seen = self._seen(fp)
        return t.append_column("seen_before", pa.array(seen))


@ray.remote(num_cpus=1)
class _SequentialMarker:
    """The deterministic streaming consumer: ONE actor whose mailbox
    preserves submission order, so block i is fully marked before block
    i+1 — the total processing order IS the semantics."""

    def __init__(self, n_bits_log2: int, k: int, key_col: str):
        self.core = _BloomCore(n_bits_log2, k)
        self.key_col = key_col

    def mark(self, t: pa.Table) -> pa.Table:
        from luzzu_ray.ops.textstats import fingerprint_batch

        if t.num_rows == 0:
            # empty (possibly schema-less) exchange block: no state
            # change; preserve whatever schema it carries
            return t.append_column("seen_before", pa.array([], pa.bool_()))
        fp = fingerprint_batch(
            pa.table({"doc_id": pa.array(np.zeros(t.num_rows, np.int64)),
                      "text": t[self.key_col]})
        )["fingerprint"].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "seen_before", pa.array(self.core.seen_and_add(fp))
        )


def deterministic_streaming_dedup(
    ds,
    order_col: str = "doc_id",
    key_col: str = "text",
    n_bits_log2: int = 22,
    k: int = 6,
):
    """Streaming Bloom dedup with a REPRODUCIBLE processing order:
    rows are range-sorted on ``order_col`` and streamed block-by-block
    through ONE consumer actor, so ``seen_before`` means "a row with an
    equal content fingerprint and smaller ``order_col`` exists" — marks
    a SQL window function reproduces exactly (modulo the Bloom
    false-positive rate, which is deterministic given the order and ~0
    at any filter sizing that isn't overloaded).  This gives the
    streaming T3 op a HARD oracle (VERDICT r03 next-round #5), where
    the free-order ShardedBloom marker is only rows-only checkable.

    Shape: the sort is one range exchange; the consumer is pipelined
    (all block submissions in flight at once — the driver holds block
    REFS, never rows) but inherently SERIAL because a total processing
    order is the contract.  When arrival order doesn't matter, use
    ``StreamingDedupMarker``/``ShardedBloom`` (parallel, order-free);
    when exact first-by-key semantics matter without an order,
    ``ops.dedup.exact_duplicates`` is the shuffle path.
    """
    import ray.data

    marker = _SequentialMarker.remote(n_bits_log2, k, key_col)
    # a sorted Dataset's blocks are range-ordered; submission order ==
    # block order, and the actor mailbox preserves it.  Skip empty
    # blocks via their METADATA (the range exchange emits schema-less
    # empties that would poison the output schema) — the driver never
    # touches rows, only refs.
    mat = ds.sort(order_col).materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, md in bundle.blocks:
            if md.num_rows is None or md.num_rows > 0:
                refs.append(ref)
    return ray.data.from_arrow_refs([marker.mark.remote(r) for r in refs])
