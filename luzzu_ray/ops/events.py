"""Event-stream reassembly: the conversation-reassembly pattern (G1)
applied to the events table — hash-partition on user_id, whole-block
sort, NumPy segmented sessionization.  Mirrors
``luzzu_ray.stages.conversation`` on a second schema, proving the
operator generalizes (SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _session_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "n_events": pa.array([], pa.int64()),
             "n_sessions": pa.array([], pa.int64())}
        )
    t = t.sort_by(
        [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
    )
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    new_u = np.concatenate(([True], uid[1:] != uid[:-1]))
    gap = np.concatenate(([0], ts[1:] - ts[:-1]))
    new_sess = new_u | (gap > SESSION_GAP_US)
    gid = np.cumsum(new_u) - 1
    n_groups = int(gid[-1]) + 1
    n_events = np.bincount(gid, minlength=n_groups)
    n_sessions = np.bincount(gid, weights=new_sess.astype(np.float64),
                             minlength=n_groups).astype(np.int64)
    starts = np.flatnonzero(new_u)
    return pa.table(
        {
            "user_id": pa.array(uid[starts]),
            "n_events": pa.array(n_events.astype(np.int64)),
            "n_sessions": pa.array(n_sessions),
        }
    )


def sessionize(ds: ray.data.Dataset, num_partitions: int | None = None) -> ray.data.Dataset:
    """Per-user (n_events, n_sessions) with a 30-min inactivity gap."""
    from luzzu_ray.pipelines.filter_pipeline import (
        _ensure_hash_shuffle,
        default_num_partitions,
    )

    _ensure_hash_shuffle()
    if num_partitions is None:
        from luzzu_ray.ops.dedup import _size_partitions

        try:  # metadata-cheap on plain file reads
            n_rows = ds.count()
        except Exception:  # pragma: no cover - exotic inputs
            n_rows = None
        cap = default_num_partitions()
        num_partitions = (
            _size_partitions(n_rows, cap) if n_rows is not None else cap
        )
    picked = ds.select_columns(["user_id", "ts", "event_id"])
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    return part.map_batches(_session_block, batch_format="pyarrow", batch_size=None)
