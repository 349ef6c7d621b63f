"""Event-stream reassembly: the conversation-reassembly pattern (G1)
applied to the events table — hash-partition on user_id, whole-block
sort, NumPy segmented sessionization.  Mirrors
``luzzu_ray.stages.conversation`` on a second schema, proving the
operator generalizes (SURVEY.md §2.5).

Also hosts the AS-OF JOIN custom operator (a composition Ray Data lacks
natively): both sides hash-partitioned on the equality key so each
block holds complete per-key history, then a vectorized composite-key
``searchsorted`` finds the latest right row with ts <= left ts.
PARTITIONING ASSUMPTION (documented per the custom-operator rule): all
rows of one key must fit one reduce block — the same assumption as
conversation reassembly, with the same salting escape hatch available.
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
    from luzzu_ray.ops.dedup import auto_partitions

    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["user_id", "ts", "event_id"])
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    return part.map_batches(_session_block, batch_format="pyarrow", batch_size=None)


_TS_SHIFT = 46  # composite key = user_code << 46 | (ts - block_min)


def _asof_block(t: pa.Table, left_type: str, right_type: str) -> pa.Table:
    """Latest right-type event with ts <= each left-type event's ts,
    per user.  Fully vectorized: one lexsort + one searchsorted over a
    composite (dense user code, normalized ts) int64 key."""
    empty = pa.table(
        {"event_id": pa.array([], pa.int64()),
         "user_id": pa.array([], pa.int64()),
         "prior_ts": pa.array([], pa.timestamp("us")),
         "wait_us": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    etype = t["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
    left = etype == left_type
    right = etype == right_type
    if not left.any():
        return empty
    if not right.any():
        # no right-side rows in this block: every left row joins null
        n_l = int(left.sum())
        return pa.table(
            {
                "event_id": pa.array(eid[left]),
                "user_id": pa.array(uid[left]),
                "prior_ts": pa.nulls(n_l, pa.timestamp("us")),
                "wait_us": pa.nulls(n_l, pa.int64()),
            }
        )
    # dense user codes + normalized ts so the composite fits int64
    _, ucode = np.unique(uid, return_inverse=True)
    ts_n = ts - ts.min()
    if ts_n.max(initial=0) >= (1 << _TS_SHIFT) or ucode.max(initial=0) >= (
        1 << (63 - _TS_SHIFT)
    ):  # pragma: no cover - ~2-year block span or 10^5 users per block
        raise ValueError("asof composite key overflow; raise num_partitions")
    key = (ucode.astype(np.int64) << _TS_SHIFT) | ts_n
    rk = np.sort(key[right])
    r_idx_sorted = np.argsort(key[right], kind="stable")
    pos = np.searchsorted(rk, key[left], side="right") - 1
    lu = ucode[left]
    ok = pos >= 0
    # candidate must belong to the SAME user
    ru_sorted = ucode[right][r_idx_sorted]
    cand_user = np.where(ok, ru_sorted[np.maximum(pos, 0)], -1)
    ok &= cand_user == lu
    rts_sorted = ts[right][r_idx_sorted]
    prior = np.where(ok, rts_sorted[np.maximum(pos, 0)], 0)
    wait = ts[left] - prior
    return pa.table(
        {
            "event_id": pa.array(eid[left]),
            "user_id": pa.array(uid[left]),
            "prior_ts": pa.array(prior.view("datetime64[us]"), mask=~ok),
            "wait_us": pa.array(wait, mask=~ok),
        }
    )


def asof_prior_event(
    ds: ray.data.Dataset,
    left_type: str = "purchase",
    right_type: str = "click",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """AS-OF LEFT JOIN of events to the same user's latest prior (or
    simultaneous) event of another type: (event_id, user_id, prior_ts,
    wait_us), prior_ts/wait_us null when no prior right event exists.
    One hash shuffle on user_id; tie-proof outputs (timestamps, not row
    ids, so simultaneous right rows cannot make the result ambiguous).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    import pyarrow.compute as pc

    both = pa.array([left_type, right_type])
    picked = ds.select_columns(
        ["event_id", "ts", "user_id", "event_type"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"], value_set=both)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    return part.map_batches(
        _asof_block,
        fn_kwargs={"left_type": left_type, "right_type": right_type},
        batch_format="pyarrow",
        batch_size=None,
    )


def _session_chunk_block(t: pa.Table) -> pa.Table:
    """Per (user_id, time-chunk): n_events, n_sessions, first/last ts —
    the salted-path partial (exact within its chunk)."""
    if t.num_rows == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "chunk": pa.array([], pa.int64()),
             "n_events": pa.array([], pa.int64()),
             "n_sessions": pa.array([], pa.int64()),
             "first_ts": pa.array([], pa.int64()),
             "last_ts": pa.array([], pa.int64())}
        )
    t = t.sort_by([("user_id", "ascending"), ("chunk", "ascending"),
                   ("ts", "ascending"), ("event_id", "ascending")])
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    chunk = t["chunk"].to_numpy(zero_copy_only=False)
    ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    new_g = np.concatenate(
        ([True], (uid[1:] != uid[:-1]) | (chunk[1:] != chunk[:-1]))
    )
    gap = np.concatenate(([0], ts[1:] - ts[:-1]))
    new_sess = new_g | (gap > SESSION_GAP_US)
    gid = np.cumsum(new_g) - 1
    n_groups = int(gid[-1]) + 1
    starts = np.flatnonzero(new_g)
    ends = np.concatenate((starts[1:], [len(uid)])) - 1
    return pa.table(
        {
            "user_id": pa.array(uid[starts]),
            "chunk": pa.array(chunk[starts]),
            "n_events": pa.array(np.bincount(gid, minlength=n_groups).astype(np.int64)),
            "n_sessions": pa.array(
                np.bincount(gid, weights=new_sess.astype(np.float64),
                            minlength=n_groups).astype(np.int64)
            ),
            "first_ts": pa.array(ts[starts]),
            "last_ts": pa.array(ts[ends]),
        }
    )


def _session_merge_block(t: pa.Table) -> pa.Table:
    """Merge per-chunk partials of the users in this block: sessions
    split at a chunk boundary whose real gap <= SESSION_GAP_US collapse
    back into one (subtract one per such adjacent-present-chunk pair)."""
    if t.num_rows == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "n_events": pa.array([], pa.int64()),
             "n_sessions": pa.array([], pa.int64())}
        )
    t = t.sort_by([("user_id", "ascending"), ("first_ts", "ascending")])
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    ne = t["n_events"].to_numpy(zero_copy_only=False)
    ns = t["n_sessions"].to_numpy(zero_copy_only=False)
    fts = t["first_ts"].to_numpy(zero_copy_only=False)
    lts = t["last_ts"].to_numpy(zero_copy_only=False)
    same_user = uid[1:] == uid[:-1]
    boundary_gap = fts[1:] - lts[:-1]
    merged = same_user & (boundary_gap <= SESSION_GAP_US)
    new_u = np.concatenate(([True], ~same_user))
    gid = np.cumsum(new_u) - 1
    n_groups = int(gid[-1]) + 1
    starts = np.flatnonzero(new_u)
    tot_e = np.bincount(gid, weights=ne.astype(np.float64), minlength=n_groups)
    tot_s = np.bincount(gid, weights=ns.astype(np.float64), minlength=n_groups)
    tot_m = np.bincount(gid[1:][merged], minlength=n_groups)
    return pa.table(
        {
            "user_id": pa.array(uid[starts]),
            "n_events": pa.array(tot_e.astype(np.int64)),
            "n_sessions": pa.array((tot_s - tot_m).astype(np.int64)),
        }
    )


def sessionize_salted(
    ds: ray.data.Dataset,
    num_partitions: int | None = None,
    chunk_span_us: int = 6 * 3_600_000_000,
) -> ray.data.Dataset:
    """Skew-proof sessionization: the conversation stage's salted-giant
    protocol generalized to events.  Events are keyed by (user_id,
    ts // chunk_span) so NO single reduce block ever holds one hot
    user's full history; per-chunk partials (exact within the chunk)
    are merged in a second tiny pass that collapses sessions split at
    chunk boundaries whose real gap <= SESSION_GAP_US.  Exactly equal
    to :func:`sessionize` for any chunk span (property-tested)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    import pyarrow.compute as pc

    def add_chunk(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        chunk = pc.cast(
            pc.floor(pc.divide(pc.cast(ts, pa.float64()), float(chunk_span_us))),
            pa.int64(),
        )
        return t.append_column("chunk", chunk)

    picked = ds.select_columns(["user_id", "ts", "event_id"]).map_batches(
        add_chunk, batch_format="pyarrow", zero_copy_batch=True
    )
    part = picked.repartition(
        num_blocks=num_partitions, keys=["user_id", "chunk"]
    )
    partials = part.map_batches(
        _session_chunk_block, batch_format="pyarrow", batch_size=None
    )
    # partials: one row per (user, chunk) — tiny; second exchange by user
    merged = partials.repartition(
        num_blocks=max(4, num_partitions // 8), keys=["user_id"]
    )
    return merged.map_batches(
        _session_merge_block, batch_format="pyarrow", batch_size=None
    )
