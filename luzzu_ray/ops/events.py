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
import pyarrow.compute as pc
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
    # dense user codes + normalized ts so the composite fits int64; the
    # shift adapts to the data (a fixed split needed BOTH a ~2-year span
    # and 10^5 users to overflow, but raised on either alone)
    _, ucode = np.unique(uid, return_inverse=True)
    ts_n = ts - ts.min()
    shift = max(_TS_SHIFT, int(ts_n.max(initial=0)).bit_length())
    if ucode.max(initial=0) >= (1 << (63 - shift)):  # pragma: no cover
        raise ValueError(
            "asof composite key overflow; raise num_partitions or use "
            "asof_prior_event_salted (no per-block key-span assumption)"
        )
    key = (ucode.astype(np.int64) << shift) | ts_n
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


# ---------------------------------------------------------------------------
# salted AS-OF join: the sessionize_salted chunk-partial protocol applied
# to asof_prior_event, so no reduce block ever holds one hot user's full
# history and no per-block key-span assumption remains
# ---------------------------------------------------------------------------

_TAG_RESOLVED, _TAG_LEFT, _TAG_RSUM = 0, 1, 2


def _asof_chunk_block(
    t: pa.Table, left_type: str, right_type: str, chunk_span_us: int
) -> pa.Table:
    """Pass-A block over a (user_id, chunk) partition.  Emits a tagged
    union: tag 0 = left rows resolved by an in-chunk prior right event;
    tag 1 = unresolved left rows (need an earlier chunk); tag 2 = per
    (user, chunk) summary rows carrying the chunk's max right-event ts.
    In-chunk resolution NEVER crosses a chunk boundary (even when two
    chunks of one user land in the same block), so the result is
    independent of block co-assignment."""
    empty = pa.table(
        {"tag": pa.array([], pa.int8()),
         "event_id": pa.array([], pa.int64()),
         "user_id": pa.array([], pa.int64()),
         "prior_us": pa.array([], pa.int64()),
         "wait_us": pa.array([], pa.int64()),
         "ts_us": pa.array([], pa.int64()),
         "chunk": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    etype = t["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
    chunk = t["chunk"].to_numpy(zero_copy_only=False)  # the partition key
    left = etype == left_type
    right = etype == right_type
    parts: list[pa.Table] = []

    def tagged(tag, eids, uids, prior, wait, tss, chunks) -> pa.Table:
        n = len(uids)
        return pa.table(
            {"tag": pa.array(np.full(n, tag, dtype=np.int8)),
             "event_id": eids if eids is not None else pa.nulls(n, pa.int64()),
             "user_id": pa.array(uids),
             "prior_us": prior if prior is not None else pa.nulls(n, pa.int64()),
             "wait_us": wait if wait is not None else pa.nulls(n, pa.int64()),
             "ts_us": tss if tss is not None else pa.nulls(n, pa.int64()),
             "chunk": chunks if chunks is not None else pa.nulls(n, pa.int64())}
        )

    if right.any():
        # dense (user, chunk) group codes; in-chunk ts offset is bounded
        # by the chunk span, so the composite key can never overflow
        _, ucode = np.unique(uid, return_inverse=True)
        chunk_n = chunk - chunk.min()
        gkey = ucode.astype(np.int64) * (int(chunk_n.max()) + 1) + chunk_n
        _, gcode = np.unique(gkey, return_inverse=True)
        shift = int(chunk_span_us).bit_length()
        key = (gcode.astype(np.int64) << shift) | (ts - chunk * chunk_span_us)
        r_order = np.argsort(key[right], kind="stable")
        rk = key[right][r_order]
        rg = gcode[right][r_order]
        rts = ts[right][r_order]
        if left.any():
            pos = np.searchsorted(rk, key[left], side="right") - 1
            ok = pos >= 0
            ok &= rg[np.maximum(pos, 0)] == gcode[left]
            prior = rts[np.maximum(pos, 0)]
            l_eid, l_uid, l_ts, l_chunk = (
                eid[left], uid[left], ts[left], chunk[left]
            )
            if ok.any():
                parts.append(tagged(
                    _TAG_RESOLVED, pa.array(l_eid[ok]), l_uid[ok],
                    pa.array(prior[ok]), pa.array(l_ts[ok] - prior[ok]),
                    None, None,
                ))
            if (~ok).any():
                parts.append(tagged(
                    _TAG_LEFT, pa.array(l_eid[~ok]), l_uid[~ok], None, None,
                    pa.array(l_ts[~ok]), pa.array(l_chunk[~ok]),
                ))
        # per-(user, chunk) max right ts = last element of each sorted group
        last = np.concatenate((rg[1:] != rg[:-1], [True]))
        parts.append(tagged(
            _TAG_RSUM, None, uid[right][r_order][last],
            pa.array(rts[last]), None, None,
            pa.array(chunk[right][r_order][last]),
        ))
    elif left.any():
        parts.append(tagged(
            _TAG_LEFT, pa.array(eid[left]), uid[left], None, None,
            pa.array(ts[left]), pa.array(chunk[left]),
        ))
    return pa.concat_tables(parts) if parts else empty


def _asof_final_schema(n: int = 0) -> pa.Table:
    return pa.table(
        {"event_id": pa.array([], pa.int64()),
         "user_id": pa.array([], pa.int64()),
         "prior_ts": pa.array([], pa.timestamp("us")),
         "wait_us": pa.array([], pa.int64())}
    )


def _asof_merge_block(t: pa.Table) -> pa.Table:
    """Pass-C block over a user_id partition of unresolved lefts + chunk
    summaries: each left's prior is the max right ts of the user's
    LATEST summary chunk strictly before the left's chunk (chunk maxima
    are strictly increasing in time, so latest == overall max)."""
    if t.num_rows == 0:
        return _asof_final_schema()
    tag = t["tag"].to_numpy(zero_copy_only=False)
    is_l = tag == _TAG_LEFT
    is_r = tag == _TAG_RSUM
    if not is_l.any():
        return _asof_final_schema()
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    chunk = t["chunk"].to_numpy(zero_copy_only=False)
    _, ucode = np.unique(uid, return_inverse=True)
    l_eid = t["event_id"].to_numpy(zero_copy_only=False)[is_l]
    l_uid = uid[is_l]
    l_ts = t["ts_us"].to_numpy(zero_copy_only=False)[is_l]
    if not is_r.any():
        n = len(l_uid)
        return pa.table(
            {"event_id": pa.array(l_eid.astype(np.int64)),
             "user_id": pa.array(l_uid),
             "prior_ts": pa.nulls(n, pa.timestamp("us")),
             "wait_us": pa.nulls(n, pa.int64())}
        )
    cmin = int(chunk.min())
    chunk_n = chunk - cmin
    shift = int(chunk_n.max()).bit_length() + 1
    key = (ucode.astype(np.int64) << shift) | chunk_n
    r_order = np.argsort(key[is_r], kind="stable")
    rk = key[is_r][r_order]
    ru = ucode[is_r][r_order]
    rmax = t["prior_us"].to_numpy(zero_copy_only=False)[is_r][r_order]
    # first summary >= (user, left chunk), minus one -> latest summary
    # chunk strictly before the left's chunk (same user checked after)
    pos = np.searchsorted(rk, key[is_l], side="left") - 1
    ok = pos >= 0
    ok &= ru[np.maximum(pos, 0)] == ucode[is_l]
    prior = np.where(ok, rmax[np.maximum(pos, 0)].astype(np.int64), 0)
    wait = l_ts - prior
    return pa.table(
        {"event_id": pa.array(l_eid.astype(np.int64)),
         "user_id": pa.array(l_uid),
         "prior_ts": pa.array(prior.view("datetime64[us]"), mask=~ok),
         "wait_us": pa.array(wait, mask=~ok)}
    )


def asof_prior_event_salted(
    ds: ray.data.Dataset,
    left_type: str = "purchase",
    right_type: str = "click",
    num_partitions: int | None = None,
    chunk_span_us: int = 6 * 3_600_000_000,
) -> ray.data.Dataset:
    """Skew-proof AS-OF join, same semantics as :func:`asof_prior_event`
    (property-tested equal).  Events are exchanged on (user_id,
    ts // chunk_span): pass A resolves lefts against in-chunk rights and
    emits per-chunk right summaries; unresolved lefts + the summaries
    (both NARROW — never the event history) take a second exchange on
    user_id where the latest earlier summary chunk supplies the prior.
    The pass-A output is materialized once (it is O(result) + O(active
    user-chunks) rows, not O(input)) so its two consumers don't recompute
    the wide pass."""
    import pyarrow.compute as pc

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    both = pa.array([left_type, right_type])

    def add_chunk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=both))
        # INTEGER division (ts is non-negative epoch-us): the exact same
        # chunk id is used as the partition key here and for the in-chunk
        # grouping in pass A (carried as a column, never recomputed), so
        # one (user, chunk) can never straddle two partitions
        chunk = pc.divide(pc.cast(t["ts"], pa.int64()),
                          pa.scalar(chunk_span_us, pa.int64()))
        return t.append_column("chunk", chunk)

    picked = ds.select_columns(
        ["event_id", "ts", "user_id", "event_type"]
    ).map_batches(add_chunk, batch_format="pyarrow", zero_copy_batch=True)
    part = picked.repartition(num_blocks=num_partitions,
                              keys=["user_id", "chunk"])
    tagged = part.map_batches(
        _asof_chunk_block,
        fn_kwargs={"left_type": left_type, "right_type": right_type,
                   "chunk_span_us": chunk_span_us},
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    def finish_resolved(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["tag"], _TAG_RESOLVED))
        return pa.table(
            {"event_id": t["event_id"].cast(pa.int64()),
             "user_id": t["user_id"],
             "prior_ts": t["prior_us"].cast(pa.timestamp("us")),
             "wait_us": t["wait_us"]}
        )

    resolved = tagged.map_batches(finish_resolved, batch_format="pyarrow")
    rest = tagged.map_batches(
        lambda t: t.filter(pc.not_equal(t["tag"], _TAG_RESOLVED)),
        batch_format="pyarrow",
    )
    merged = rest.repartition(
        num_blocks=max(4, num_partitions // 8), keys=["user_id"]
    ).map_batches(_asof_merge_block, batch_format="pyarrow", batch_size=None)
    return resolved.union(merged)


# ---------------------------------------------------------------------------
# ordered per-key rolling window: a row-window aggregate (SQL
# "ROWS BETWEEN W-1 PRECEDING AND CURRENT ROW"), the one window shape
# the tumbling/hopping/session operators don't cover
# ---------------------------------------------------------------------------

def _rolling_block(t: pa.Table, window: int) -> pa.Table:
    """Per user, ordered by (ts, event_id): integer window sum + count
    of the last ``window`` rows' q4-quantized values.  Vectorized:
    one sort, one cumsum, per-row clamped segment subtraction."""
    empty = pa.table(
        {"event_id": pa.array([], pa.int64()),
         "user_id": pa.array([], pa.int64()),
         "wsum_q4": pa.array([], pa.int64()),
         "wn": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    t = t.sort_by(
        [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
    )
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    vq4 = t["value_q4"].to_numpy(zero_copy_only=False)
    n = len(uid)
    new_u = np.concatenate(([True], uid[1:] != uid[:-1]))
    seg_start = np.flatnonzero(new_u)
    gid = np.cumsum(new_u) - 1
    s = seg_start[gid]                       # segment start per row
    i = np.arange(n, dtype=np.int64)
    p = i - s                                # position within segment
    lo = i - np.minimum(p, window - 1)       # first row of the window
    cs = np.cumsum(vq4)
    wsum = cs[i] - cs[lo] + vq4[lo]
    wn = np.minimum(p + 1, window)
    return pa.table(
        {"event_id": t["event_id"],
         "user_id": t["user_id"],
         "wsum_q4": pa.array(wsum.astype(np.int64)),
         "wn": pa.array(wn.astype(np.int64))}
    )


def rolling_user_window(
    ds: ray.data.Dataset,
    window: int = 3,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(event_id, user_id, wsum_q4, wn): sum/count of the last
    ``window`` q4-quantized values per user in (ts, event_id) order —
    SQL's ``SUM(...) OVER (PARTITION BY user ORDER BY ts, event_id
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``, emitted as
    exact integers.  One hash exchange on user_id; PARTITIONING
    ASSUMPTION: one user's history per reduce block (same as
    sessionize; the chunked-salt protocol applies if ever needed —
    a chunk boundary would carry the previous window-1 rows)."""
    import pyarrow.compute as pc

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def quantize(t: pa.Table) -> pa.Table:
        vq4 = pc.cast(
            pc.floor(pc.multiply(pc.cast(t["value"], pa.float64()), 10_000.0)),
            pa.int64(),
        )
        return pa.table(
            {"event_id": t["event_id"], "user_id": t["user_id"],
             "ts": t["ts"], "value_q4": vq4}
        )

    picked = ds.select_columns(
        ["event_id", "user_id", "ts", "value"]
    ).map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    return part.map_batches(
        _rolling_block, fn_kwargs={"window": window},
        batch_format="pyarrow", batch_size=None,
    )


# ---------------------------------------------------------------------------
# ordered per-key transcript rendering: the "format a conversation for
# tokenization" step of an SFT pipeline, expressed as a vectorized
# per-group ordered string aggregation (SQL string_agg ... ORDER BY)
# ---------------------------------------------------------------------------

def _render_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()),
             "transcript": pa.array([], pa.string()),
             "n_lines": pa.array([], pa.int64())}
        )
    t = t.sort_by(
        [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
    )
    lines = t["line"].combine_chunks()
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    new_u = np.concatenate(([True], uid[1:] != uid[:-1]))
    starts = np.flatnonzero(new_u)
    offsets = np.concatenate((starts, [len(uid)])).astype(np.int32)
    groups = pa.ListArray.from_arrays(pa.array(offsets), lines)
    joined = pc.binary_join(groups, "\n")
    return pa.table(
        {"user_id": pa.array(uid[starts]),
         "transcript": joined,
         "n_lines": pa.array(np.diff(offsets).astype(np.int64))}
    )


def render_user_streams(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(user_id, transcript, n_lines): every user's events rendered to
    one newline-joined string in (ts, event_id) order — per-row line
    formatting and per-group joins are BOTH Arrow kernels
    (binary_join_element_wise, then ListArray offsets + binary_join),
    no Python row loop.  One hash exchange on user_id; same
    one-key-per-block assumption as sessionize (the salted-chunk
    protocol applies if a single user's history outgrows a block)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def fmt(t: pa.Table) -> pa.Table:
        vq4 = pc.cast(
            pc.floor(pc.multiply(pc.cast(t["value"], pa.float64()), 10_000.0)),
            pa.int64(),
        )
        line = pc.binary_join_element_wise(
            t["event_type"], pc.cast(vq4, pa.string()), ":"
        )
        return pa.table(
            {"event_id": t["event_id"], "user_id": t["user_id"],
             "ts": t["ts"], "line": line}
        )

    picked = ds.select_columns(
        ["event_id", "user_id", "ts", "event_type", "value"]
    ).map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    return part.map_batches(
        _render_block, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# per-key LAG delta: value - lag(value) OVER (PARTITION BY user ORDER BY
# ts, event_id) — the windowed feature-engineering primitive
# ---------------------------------------------------------------------------

def _lag_delta_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "delta_q4": pa.array([], pa.int64())}
        )
    t = t.sort_by(
        [("user_id", "ascending"), ("ts", "ascending"),
         ("event_id", "ascending")]
    )
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    val = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    first = np.concatenate(([True], uid[1:] != uid[:-1]))
    delta = np.empty(len(val), dtype=np.float64)
    delta[1:] = val[1:] - val[:-1]
    delta[0] = np.nan
    dq = np.floor(delta * 10_000.0)
    return pa.table(
        {"event_id": t["event_id"],
         "user_id": t["user_id"],
         "delta_q4": pa.array(
             np.where(first, 0, dq).astype(np.int64),
             mask=first,
         )}
    )


def per_key_lag_delta(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """(event_id, user_id, delta_q4): fixed-point (floor x 10^4)
    difference to the SAME USER's previous event in (ts, event_id)
    order; NULL on each user's first event — SQL
    ``value - lag(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)``.  One hash exchange + whole-block sort + one shifted
    subtraction; same one-key-per-block assumption (and salted escape
    hatch) as sessionize."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["event_id", "user_id", "ts", "value"])
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    return part.map_batches(
        _lag_delta_block, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# RANGE (time-interval) window: sum/count over the user's trailing time
# window — SQL RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW
# ---------------------------------------------------------------------------

def _range_window_block(t: pa.Table, width_us: int) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {"event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "wsum_q4": pa.array([], pa.int64()),
             "wn": pa.array([], pa.int64())}
        )
    t = t.sort_by(
        [("user_id", "ascending"), ("ts", "ascending"),
         ("event_id", "ascending")]
    )
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    vq = t["value_q4"].to_numpy(zero_copy_only=False)
    first = np.concatenate(([True], uid[1:] != uid[:-1]))
    starts = np.flatnonzero(first)
    seg = np.cumsum(first) - 1
    seg_start = starts[seg]
    # trailing-window start index per row: first event of the SAME user
    # with ts >= ts_i - width — searchsorted within each user segment
    cum = np.concatenate(([0], np.cumsum(vq)))
    lo = np.empty(len(ts), dtype=np.int64)
    for s, e in zip(starts, np.concatenate((starts[1:], [len(ts)]))):
        lo[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - width_us,
                                      side="left")
    idx = np.arange(len(ts))
    wsum = cum[idx + 1] - cum[lo]
    wn = idx - lo + 1
    return pa.table(
        {"event_id": t["event_id"],
         "user_id": t["user_id"],
         "wsum_q4": pa.array(wsum.astype(np.int64)),
         "wn": pa.array(wn.astype(np.int64))}
    )


def range_user_window(
    ds: ray.data.Dataset,
    width_us: int = 3_600_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(event_id, user_id, wsum_q4, wn): sum/count of the SAME user's
    q4-quantized values within the trailing ``width_us`` microseconds,
    inclusive of the current row — SQL ``SUM(v) OVER (PARTITION BY
    user ORDER BY ts RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT
    ROW)``.  Exact integers; one hash exchange; per-user prefix sums +
    one segment ``searchsorted``, no per-row Python beyond the per-user
    segment loop (O(#users) iterations on index arithmetic).

    TIE SEMANTICS: SQL RANGE treats equal-ts rows as PEERS (they all
    share the window of the last peer); this kernel matches that only
    when (user_id, ts) pairs are unique — the events table guarantees
    it (event_id tie-break exists for determinism, and the oracle
    compares under the same uniqueness).  Same one-key-per-block
    assumption as sessionize."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def quantize(t: pa.Table) -> pa.Table:
        vq4 = pc.cast(
            pc.floor(pc.multiply(pc.cast(t["value"], pa.float64()),
                                 10_000.0)),
            pa.int64(),
        )
        return pa.table(
            {"event_id": t["event_id"], "user_id": t["user_id"],
             "ts": t["ts"], "value_q4": vq4}
        )

    picked = ds.select_columns(
        ["event_id", "user_id", "ts", "value"]
    ).map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    return part.map_batches(
        _range_window_block, fn_kwargs={"width_us": width_us},
        batch_format="pyarrow", batch_size=None,
    )


# ---------------------------------------------------------------------------
# two-step FUNNEL: first step-A event, then the first step-B event at or
# after it; conversion = B within the window
# ---------------------------------------------------------------------------

def funnel_users(
    ds: ray.data.Dataset,
    step_a: str = "click",
    step_b: str = "purchase",
    window_us: int = 3_600_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-user two-step funnel: ``ts_a`` = the user's FIRST ``step_a``
    event, ``ts_b`` = their first ``step_b`` event with ts >= ts_a;
    ``converted`` iff ts_b - ts_a <= window.  Users with no ``step_a``
    are dropped (they never entered the funnel); ts_b is NULL when no
    qualifying B exists.  One hash exchange on user_id, whole-block
    vectorized segment mins — the product-analytics conversion
    primitive over the same co-location machinery as sessionize.

    Output: (user_id, ts_a, ts_b, converted).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array([step_a, step_b])
        )
        t = t.filter(keep)
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "is_a": pc.equal(t["event_type"], step_a)}
        )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "ts_a": pa.array([], pa.timestamp("us")),
                 "ts_b": pa.array([], pa.timestamp("us")),
                 "converted": pa.array([], pa.bool_())}
            )
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        isa = t["is_a"].combine_chunks().to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        seg = np.cumsum(first) - 1
        n_seg = int(seg[-1]) + 1
        big = np.iinfo(np.int64).max
        ts_a = np.full(n_seg, big, dtype=np.int64)
        np.minimum.at(ts_a, seg[isa], ts[isa])
        isb = ~isa
        after = isb & (ts >= ts_a[seg])
        ts_b = np.full(n_seg, big, dtype=np.int64)
        np.minimum.at(ts_b, seg[after], ts[after])
        entered = ts_a != big
        has_b = ts_b != big
        conv = entered & has_b & (ts_b - ts_a <= window_us)
        starts = np.flatnonzero(first)
        out_uid = uid[starts][entered]
        return pa.table(
            {"user_id": pa.array(out_uid),
             "ts_a": pa.array(ts_a[entered], pa.timestamp("us")),
             "ts_b": pa.array(
                 np.where(has_b, ts_b, 0)[entered], pa.timestamp("us"),
                 mask=~has_b[entered],
             ),
             "converted": pa.array(conv[entered])}
        )

    picked = ds.select_columns(["user_id", "ts", "event_type"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    return part.map_batches(block, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Cohort retention: first-seen day x activity-day offset distinct-user
# counts — SQL: min(day) per user joined back to DISTINCT (user, day)
# ---------------------------------------------------------------------------

DAY_US = 86_400_000_000


def cohort_retention(
    ds: ray.data.Dataset,
    bucket_us: int = DAY_US,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Cohort retention matrix: (cohort_day, offset_days, n_users) where
    cohort_day = a user's first active day and n_users counts DISTINCT
    users of that cohort active offset_days later.

    Scale shape: ONE hash exchange on user_id co-locates each user's
    full history (the sessionize assumption — salt via the chunked
    protocol if a single user exceeds a block), then each block derives
    its users' (cohort, offset) pairs and pre-aggregates them to partial
    counts, so the second exchange carries at most
    #cohorts x #offsets rows per block (~31 x 31 at a month of data),
    never per-user rows.  Distinct-user semantics are exact because a
    user lives in exactly one block and contributes <= 1 per pair there.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle
    from ray.data.aggregate import Sum

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"cohort_day": pa.array([], pa.int64()),
                 "offset_days": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = (
            t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ) // bucket_us
        )
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        first_pair = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (d[1:] != d[:-1]))
        )
        u, d = u[first_pair], d[first_pair]
        new_u = np.concatenate(([True], u[1:] != u[:-1]))
        d0 = d[np.maximum.accumulate(np.where(new_u, np.arange(len(u)), 0))]
        cohort, off = d0, d - d0
        key = cohort * (off.max() + 1) + off if len(off) else cohort
        uk, n = np.unique(key, return_counts=True)
        w = int(off.max() + 1) if len(off) else 1
        return pa.table(
            {"cohort_day": pa.array((uk // w).astype(np.int64)),
             "offset_days": pa.array((uk % w).astype(np.int64)),
             "n": pa.array(n.astype(np.int64))}
        )

    picked = ds.select_columns(["user_id", "ts"])
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    parts = part.map_batches(
        block, batch_format="pyarrow", batch_size=None
    ).materialize()  # narrow partials size the final combine
    return parts.groupby(
        ["cohort_day", "offset_days"],
        num_partitions=auto_partitions(parts, None),
    ).aggregate(Sum("n", alias_name="n_users"))


def type_transitions(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Markov transition profile: counts of consecutive event-type
    pairs within each user's (ts, event_id)-ordered stream — SQL
    ``lag(event_type) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` + GROUP BY (prev, cur).

    Scale shape: one user_id co-location exchange (sessionize
    assumption), per block ONE lexsort + ONE shifted dictionary-code
    compare + np.unique — the second exchange carries at most
    |types|^2 rows per block.  Output: (from_type, to_type, n_pairs).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle
    from ray.data.aggregate import Sum

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"from_type": pa.array([], pa.string()),
                 "to_type": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], code[order]
        same = u[1:] == u[:-1]
        v = len(enc.dictionary)
        pair = c[:-1][same] * v + c[1:][same]
        up, n = np.unique(pair, return_counts=True)
        return pa.table(
            {"from_type": pc.take(enc.dictionary, pa.array(up // v)),
             "to_type": pc.take(enc.dictionary, pa.array(up % v)),
             "n": pa.array(n.astype(np.int64))}
        )

    picked = ds.select_columns(["user_id", "ts", "event_id", "event_type"])
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    parts = part.map_batches(
        block, batch_format="pyarrow", batch_size=None
    ).materialize()
    return parts.groupby(
        ["from_type", "to_type"],
        num_partitions=auto_partitions(parts, None),
    ).aggregate(Sum("n", alias_name="n_pairs"))


def preceding_count_join(
    ds: ray.data.Dataset,
    left_type: str = "click",
    right_type: str = "view",
    window_us: int = 300_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Stream-stream TRAILING INTERVAL JOIN, aggregated: for every
    ``left_type`` event, the count of the same user's ``right_type``
    events with ``ts in (left.ts - window, left.ts]`` — the
    "views before this click" attribution shape, SQL's correlated
    range self-join.

    Both "sides" are the same stream, so ONE user_id co-location
    exchange suffices (sessionize assumption; salt when a single user
    outgrows a block).  Per block: one sort, one prefix-sum of the
    right-type indicator, two ``searchsorted`` per user segment —
    position-independent, so same-timestamp ties need no ordering rule
    beyond the SQL predicate itself.  Output:
    (event_id, user_id, n_prior).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array([left_type, right_type])
        )
        return t.filter(keep)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "n_prior": pa.array([], pa.int64())}
            )
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        is_r = pc.equal(
            t["event_type"], right_type
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        is_l = pc.equal(
            t["event_type"], left_type
        ).to_numpy(zero_copy_only=False).astype(bool)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(first)
        bounds = np.concatenate((starts, [len(uid)]))
        out_e, out_u, out_n = [], [], []
        for i in range(len(starts)):
            s, e = bounds[i], bounds[i + 1]
            l_idx = np.flatnonzero(is_l[s:e]) + s
            if len(l_idx) == 0:
                continue
            cum = np.concatenate(([0], np.cumsum(is_r[s:e])))
            hi = np.searchsorted(ts[s:e], ts[l_idx], side="right")
            lo = np.searchsorted(ts[s:e], ts[l_idx] - window_us,
                                 side="right")
            out_e.append(eid[l_idx])
            out_u.append(uid[l_idx])
            out_n.append(cum[hi] - cum[lo])
        if not out_e:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "n_prior": pa.array([], pa.int64())}
            )
        return pa.table(
            {"event_id": pa.array(np.concatenate(out_e)),
             "user_id": pa.array(np.concatenate(out_u)),
             "n_prior": pa.array(
                 np.concatenate(out_n).astype(np.int64)
             )}
        )

    picked = ds.select_columns(
        ["event_id", "user_id", "ts", "event_type"]
    ).map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])
    return part.map_batches(block, batch_format="pyarrow", batch_size=None)


def hourly_dense(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Dense per-type hourly counts with GAP FILLING: every hour from a
    type's first to its last event emits a row, zero where no events
    fell — the time-series conformance step downstream dashboards and
    anomaly detectors assume (sparse groupby output silently hides
    dead hours).

    Scale shape: per-block (type, hour, n) partials collapse rows
    before the ONE exchange on ``type_col``; the final block merges a
    type's partials and materializes its dense hour range with pure
    arange/scatter NumPy — output size is bounded by the time span
    (hours), not the event count.  A type spanning years costs ~10^4
    rows; a type with 10^12 events costs the same.

    Output: (type_col, hour_bucket, n)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def partial(t: pa.Table) -> pa.Table:
        # null ts rows carry no hour and are excluded (the SQL twin's
        # dense LEFT JOIN can never match a NULL hr either)
        t = t.filter(pc.is_valid(t[ts_col]))
        hour = pc.divide(  # int64 division == SQL // on positive epochs
            pc.cast(t[ts_col], pa.int64()),
            pa.scalar(3_600_000_000, pa.int64()),
        )
        tt = pa.table({type_col: t[type_col], "hour_bucket": hour})
        g = tt.group_by([type_col, "hour_bucket"]).aggregate(
            [("hour_bucket", "count")])
        return pa.table(
            {type_col: g[type_col], "hour_bucket": g["hour_bucket"],
             "n": pc.cast(g["hour_bucket_count"], pa.int64())}
        )

    parts = ds.select_columns([type_col, ts_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    width = auto_partitions(parts, num_partitions)
    psch = parts.schema()
    type_t = psch.types[psch.names.index(type_col)]

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {type_col: pa.array([], type_t),
                 "hour_bucket": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        from luzzu_ray.ops.relational import _codes_with_null

        tc, td = _codes_with_null(t[type_col].combine_chunks())
        hr = t["hour_bucket"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # merge partials: unique (type, hour) with summed counts
        span = hr.max() - hr.min() + 1
        comb = tc * span + (hr - hr.min())
        uniq, inv = np.unique(comb, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, n)
        ut, uh = uniq // span, uniq % span + hr.min()
        # per-type [mn, mx] dense ranges (uniq sorted -> types contiguous)
        newt = np.concatenate(([True], ut[1:] != ut[:-1]))
        starts = np.flatnonzero(newt)
        ends = np.concatenate((starts[1:], [len(ut)]))
        mn = uh[starts]
        mx = uh[ends - 1]
        widths = (mx - mn + 1).astype(np.int64)
        out_starts = np.concatenate(([0], np.cumsum(widths[:-1])))
        total = int(widths.sum())
        out_type = np.repeat(ut[starts], widths)
        out_hr = (np.arange(total, dtype=np.int64)
                  - np.repeat(out_starts, widths)
                  + np.repeat(mn, widths))
        out_n = np.zeros(total, dtype=np.int64)
        # scatter each sparse entry to its dense slot
        type_seg = np.repeat(np.arange(len(starts)), ends - starts)
        out_n[out_starts[type_seg] + (uh - mn[type_seg])] = tot
        return pa.table(
            {type_col: td.take(pa.array(out_type)),
             "hour_bucket": pa.array(out_hr),
             "n": pa.array(out_n)}
        )

    return parts.repartition(
        num_blocks=width, keys=[type_col]
    ).map_batches(finalize, batch_format="pyarrow", batch_size=None)


def user_growth(
    ds: ray.data.Dataset,
    bucket_us: int = DAY_US,
    num_partitions: int | None = None,
) -> pa.Table:
    """Daily new-user counts and the cumulative user-growth curve:
    (day, n_new, n_cum), day = floor(ts / bucket) of a user's FIRST
    event.

    Scale shape: map-side partial min-day per user collapses each
    block to distinct users BEFORE the one keyed exchange; the reduce
    block finalizes each user's first day and pre-aggregates to
    (day, count) partials, so the driver sees only the #days-row
    series — the running sum over it is O(#days), never a distributed
    scan.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    width = auto_partitions(ds, num_partitions)

    def partial_min(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
            })
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False) // bucket_us
        )
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        first = np.concatenate(([True], u[1:] != u[:-1]))
        return pa.table({
            "user_id": pa.array(u[first]), "day": pa.array(d[first]),
        })

    def day_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        # co-located: every (user, partial-min-day) row for a user is
        # here; per-user global min, then per-day counts
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        d = t["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, uid))
        us, ds_ = uid[order], d[order]
        first = np.concatenate(([True], us[1:] != us[:-1]))
        u, cnt = np.unique(ds_[first], return_counts=True)
        return pa.table({
            "day": pa.array(u), "n": pa.array(cnt.astype(np.int64)),
        })

    parts = ds.select_columns(["user_id", "ts"]).map_batches(
        partial_min, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=width, keys=["user_id"]).map_batches(
        day_counts, batch_format="pyarrow", batch_size=None,
    )
    rows = [t for t in ray.get(list(parts.to_arrow_refs()))
            if t.num_rows]
    if not rows:
        return pa.table({
            "day": pa.array([], pa.int64()),
            "n_new": pa.array([], pa.int64()),
            "n_cum": pa.array([], pa.int64()),
        })
    merged = pa.concat_tables(rows)
    day = merged["day"].to_numpy(zero_copy_only=False)
    n = merged["n"].to_numpy(zero_copy_only=False)
    u, inv = np.unique(day, return_inverse=True)
    tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
    return pa.table({
        "day": pa.array(u),
        "n_new": pa.array(tot),
        "n_cum": pa.array(np.cumsum(tot)),
    })


def funnel_k_steps(
    ds: ray.data.Dataset,
    steps: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-user ORDERED k-step funnel: ts_1 = the user's first
    ``steps[0]`` event; ts_i = their first ``steps[i-1]`` event with
    ts >= ts_{i-1}.  Users who never performed step 1 are dropped;
    later steps are NULL once the chain breaks.  One hash exchange on
    user_id; per block, ONE sort + k vectorized threshold-gated
    segment mins (``np.minimum.reduceat``) — no per-user Python, k is
    the funnel length (constant), not data-sized.

    Output: (user_id, ts_1..ts_k, n_completed).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    step_arr = pa.array(steps)
    big = np.iinfo(np.int64).max

    def pick(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=step_arr))
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_type": t["event_type"]})

    def block(t: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64())}
        for i in range(len(steps)):
            cols[f"ts_{i + 1}"] = pa.array([], pa.timestamp("us"))
        cols["n_completed"] = pa.array([], pa.int64())
        if t.num_rows == 0:
            return pa.table(cols)
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ety = t["event_type"].combine_chunks()
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(first)
        seg = np.cumsum(first) - 1
        masks = [
            pc.equal(ety, s).to_numpy(zero_copy_only=False).astype(bool)
            for s in steps
        ]
        thr = np.zeros(len(starts), dtype=np.int64)  # ts are positive us
        step_ts = []
        n_completed = np.zeros(len(starts), dtype=np.int64)
        for m in masks:
            vals = np.where(m & (ts >= thr[seg]), ts, big)
            t_i = np.minimum.reduceat(vals, starts)
            step_ts.append(t_i)
            n_completed += (t_i != big).astype(np.int64)
            thr = t_i  # big threshold blocks all later steps
        entered = step_ts[0] != big
        out = {"user_id": pa.array(uid[starts][entered])}
        for i, t_i in enumerate(step_ts):
            col = t_i[entered]
            out[f"ts_{i + 1}"] = pa.Array.from_pandas(
                np.where(col == big, None, col), type=pa.int64()
            ).cast(pa.timestamp("us"))
        out["n_completed"] = pa.array(n_completed[entered])
        return pa.table(out)

    return ds.select_columns(["user_id", "ts", "event_type"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(
        num_blocks=num_partitions, keys=["user_id"]
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


def running_user_total(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Unbounded-preceding running total per user: for every event the
    cumulative quantized value sum and running row count in (ts,
    event_id) order — SQL ``SUM(...) OVER (PARTITION BY user_id ORDER
    BY ts, event_id ROWS UNBOUNDED PRECEDING)``, exact int64.

    One user co-location exchange, per block one lexsort + one cumsum
    with vectorized segment resets.  Output: (event_id, user_id,
    run_sum_q4, run_n)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "run_sum_q4": pa.array([], pa.int64()),
                 "run_n": pa.array([], pa.int64())}
            )
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        vq = np.floor(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 10_000.0
        ).astype(np.int64)
        n = len(uid)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        cs = np.cumsum(vq)
        base = np.where(starts > 0, cs[starts - 1], 0)
        run = cs - base[gid]
        pos = np.arange(n, dtype=np.int64) - starts[gid] + 1
        return pa.table(
            {"event_id": t["event_id"],
             "user_id": t["user_id"],
             "run_sum_q4": pa.array(run),
             "run_n": pa.array(pos)}
        )

    return ds.select_columns(["event_id", "user_id", "ts", "value"]).repartition(
        num_blocks=num_partitions, keys=["user_id"]
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


def session_hours(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Interval-to-bucket attribution: each user session (30-min gap
    rule, as :func:`sessionize`) unnested to every HOUR bucket its
    [first_event, last_event] interval overlaps — the session-hour
    attribution join (billing/usage attribution).  Output:
    (user_id, session_idx, hour_us) with hour_us = hour-start epoch
    microseconds; rows are bounded by total session-span hours, not by
    event count.

    One user co-location exchange; per block one lexsort, session
    boundary detection, then a vectorized repeat/arange expansion of
    each session's hour range — no per-session Python."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    HOUR = 3_600_000_000

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "session_idx": pa.array([], pa.int64()),
                 "hour_us": pa.array([], pa.int64())}
            )
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        new_u = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        new_sess = new_u | (gap > SESSION_GAP_US)
        s_starts = np.flatnonzero(new_sess)
        s_ends = np.concatenate((s_starts[1:] - 1, [len(ts) - 1]))
        # session index within its user (0-based)
        sid = np.cumsum(new_sess) - 1
        user_first_sid = sid[np.flatnonzero(new_u)]
        ug = np.cumsum(new_u) - 1
        sidx_all = sid - user_first_sid[ug]
        h0 = ts[s_starts] // HOUR
        h1 = ts[s_ends] // HOUR
        counts = (h1 - h0 + 1).astype(np.int64)
        total = int(counts.sum())
        rep = np.repeat(np.arange(len(s_starts)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        step = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        return pa.table(
            {"user_id": pa.array(uid[s_starts][rep]),
             "session_idx": pa.array(sidx_all[s_starts][rep]),
             "hour_us": pa.array((h0[rep] + step) * HOUR)}
        )

    picked = ds.select_columns(["user_id", "ts", "event_id"])
    return picked.repartition(
        num_blocks=num_partitions, keys=["user_id"]
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


CENTER_WINDOW = 3


def centered_user_window(
    ds: ray.data.Dataset,
    w: int = CENTER_WINDOW,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """CENTERED rolling window per user: for every event the quantized
    value sum and row count over ``ROWS BETWEEN w PRECEDING AND w
    FOLLOWING`` in (ts, event_id) order — the smoothing frame that
    needs FUTURE rows, which the co-located per-user block supplies
    for free (prefix sums + clamped segment bounds; exact int64).
    Output: (event_id, user_id, cwsum_q4, cwn)."""
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "cwsum_q4": pa.array([], pa.int64()),
                 "cwn": pa.array([], pa.int64())}
            )
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        vq = np.floor(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 10_000.0
        ).astype(np.int64)
        n = len(uid)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        seg_start = starts[gid]
        seg_end = np.concatenate((starts[1:], [n]))[gid]  # exclusive
        i = np.arange(n, dtype=np.int64)
        lo = np.maximum(i - w, seg_start)
        hi = np.minimum(i + w + 1, seg_end)  # exclusive
        cs = np.concatenate(([0], np.cumsum(vq)))
        return pa.table(
            {"event_id": t["event_id"],
             "user_id": t["user_id"],
             "cwsum_q4": pa.array(cs[hi] - cs[lo]),
             "cwn": pa.array(hi - lo)}
        )

    return ds.select_columns(
        ["event_id", "user_id", "ts", "value"]
    ).repartition(
        num_blocks=num_partitions, keys=["user_id"]
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


US_PER_DAY = 86_400_000_000


def daily_span_window_overlap(
    ds: ray.data.Dataset,
    windows: list[tuple[int, int]],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """INTERVAL-OVERLAP join of per-(user, day) activity spans against
    a small broadcast window table — the incident-attribution /
    ad-window shape a stream pipeline runs ("which maintenance windows
    did each user's session overlap, and for how long").

    Left intervals are derived: span = [min(ts), max(ts)] per
    (user_id, day = epoch_us // US_PER_DAY), built from per-block
    min/max partials through ONE keyed exchange.  The window table
    (microsecond [ws, we] pairs) rides the task closure — it is a
    constant-sized reference list, never a shuffle side.  Overlap uses
    closed intervals (touching endpoints match with 0 duration):
    ws <= max AND min <= we; overlap_us = least(max, we) -
    greatest(min, ws).  Returns (user_id, day, window_id, overlap_us).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    W = [(int(a), int(b)) for a, b in windows]

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        day = pc.divide(us, US_PER_DAY)  # ts >= epoch: floor == trunc
        g = pa.table({
            "user_id": t["user_id"], "day": day, "lo": us, "hi": us,
        }).group_by(["user_id", "day"]).aggregate(
            [("lo", "min"), ("hi", "max")])
        return g.rename_columns(["user_id", "day", "lo", "hi"])

    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "day": pa.array([], pa.int64()),
        "window_id": pa.array([], pa.int64()),
        "overlap_us": pa.array([], pa.int64()),
    })

    def overlap_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        g = t.group_by(["user_id", "day"]).aggregate(
            [("lo", "min"), ("hi", "max")]
        ).rename_columns(["user_id", "day", "lo", "hi"])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        lo = g["lo"].to_numpy(zero_copy_only=False)
        hi = g["hi"].to_numpy(zero_copy_only=False)
        out = []
        for wi, (ws, we) in enumerate(W):
            m = (ws <= hi) & (lo <= we)
            if not m.any():
                continue
            out.append(pa.table({
                "user_id": pa.array(uid[m]),
                "day": pa.array(day[m]),
                "window_id": pa.array(
                    np.full(int(m.sum()), wi, dtype=np.int64)),
                "overlap_us": pa.array(
                    np.minimum(hi[m], we) - np.maximum(lo[m], ws)),
            }))
        return pa.concat_tables(out) if out else empty

    parts = ds.select_columns(["user_id", "ts"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.repartition(
        num_blocks=num_partitions, keys=["user_id", "day"]
    ).map_batches(overlap_block, batch_format="pyarrow", batch_size=None)


DECAY_HORIZON_DAYS = 30


def decayed_user_value(
    ds: ray.data.Dataset,
    horizon_days: int = DECAY_HORIZON_DAYS,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Recency-weighted per-user engagement: each event contributes
    ``vq2 * 2^(H - age_days)`` (vq2 = ``floor(value*100)``, age
    relative to the corpus's LAST day, events older than ``H`` days
    contribute 0) — exponential half-life-per-day decay as EXACT
    integer powers of two, the freshness signal data-curation
    recency weighting needs without IEEE-order-dependent ``exp()``.

    Output per user: ``(user_id, decayed_q2, n_recent)``.  A-priori
    int64 bound: ``2^H * max_vq2 * events_per_user`` — with H = 30 and
    2-decimal values below ~10^4 that is safe to ~10^5 events/user;
    larger horizons must shrink the per-day factor (documented, not
    guarded: the bound is a DESIGN parameter like the PageRank base).

    Scale shape: one streamed pass computes the corpus max day (narrow
    ``max`` aggregate), then one map pass emits per-block (user,
    partial-sum, n) rows into a user-keyed grouped sum — no event-row
    exchange, no driver materialization.
    """
    from luzzu_ray.ops.relational import grouped_sum_q

    H = horizon_days

    def to_day(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"day": pc.divide(us, US_PER_DAY)})

    raw_max = (
        ds.select_columns(["ts"])
        .map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)
        .max("day")
    )
    if raw_max is None:  # empty input: Dataset.max returns None
        return ray.data.from_arrow(pa.table({
            "user_id": pa.array([], pa.int64()),
            "decayed_q2": pa.array([], pa.int64()),
            "n_recent": pa.array([], pa.int64()),
        }))
    max_day = int(raw_max)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "decayed_q2": pa.array([], pa.int64()),
                             "n_recent": pa.array([], pa.int64())})
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        age = max_day - us // US_PER_DAY
        recent = age <= H
        # clip BEFORE the shift: numpy evaluates both where-branches,
        # and a negative shift count is undefined behaviour
        shift = np.clip(H - age, 0, H)
        w = np.where(recent, np.int64(1) << shift, np.int64(0))
        vq2 = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        # per-event rows: grouped_sum_q partial-sums each block before
        # the exchange anyway, so pre-aggregating here would do the
        # identical hash aggregation twice
        return pa.table({
            "user_id": t["user_id"],
            "decayed_q2": pa.array(w * vq2),
            "n_recent": pa.array(recent.astype(np.int64)),
        })

    return grouped_sum_q(
        ds.select_columns(["user_id", "ts", "value"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], float_cols={},
        int_cols={"decayed_q2": "decayed_q2", "n_recent": "n_recent"},
        num_partitions=num_partitions,
    )


def interarrival_histogram(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Corpus-level log2 histogram of per-user inter-arrival times:
    bucket = ``floor(log2(gap_us)) + 1`` for positive gaps (== the
    gap's BIT LENGTH, computed exactly via ``frexp`` — valid to 2^53
    microseconds, ~285 years), bucket 0 for zero gaps; each user's
    first event contributes nothing.  Output ``(bucket, n)`` — the
    burstiness / session-boundary diagnostic behind sessionization
    gap thresholds.

    SQL twin: ``length(bin(gap))`` over ``ts - lag(ts) OVER (PARTITION
    BY user_id ORDER BY ts, event_id)`` with a CASE for gap = 0.

    Scale shape: one user co-location exchange (the sessionize
    assumption), per block one sort + shifted subtraction + bincount;
    <= 64 partial rows per block through a tiny final combine.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.ops.relational import grouped_sum_q
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["event_id", "user_id", "ts"])
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        if not len(gaps):
            return empty
        # exact bit length: frexp exponent of a positive int < 2^53 is
        # floor(log2) + 1 with no float-boundary risk
        bucket = np.where(
            gaps > 0, np.frexp(gaps.astype(np.float64))[1], 0
        ).astype(np.int64)
        cnt = np.bincount(bucket)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    return grouped_sum_q(
        part.map_batches(block, batch_format="pyarrow", batch_size=None),
        ["bucket"], float_cols={}, int_cols={"n": "n"}, num_partitions=2,
    )


DUP_SUPPRESS_WINDOW_US = 3_600_000_000  # 1 hour


def window_dup_events(
    ds: ray.data.Dataset,
    window_us: int = DUP_SUPPRESS_WINDOW_US,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Streaming duplicate-event suppression: an event is a DUP if the
    same user produced an event with the same (event_type, floor(value
    *100)) within the trailing ``window_us`` — the at-least-once
    ingestion / double-click artifact filter every event pipeline runs
    before aggregation.  Emits ``(event_id, is_dup)`` for every event.

    SQL twin: ``ts - lag(ts) OVER (PARTITION BY user_id, event_type,
    vq2 ORDER BY ts, event_id) <= window``.

    LAG SEMANTICS (intended contract, ADVICE r04): dup marks compare
    each event to the IMMEDIATELY PRECEDING event of its key, so marks
    CHAIN — with a 60-min window, events at t=0, t=50min, t=110min
    flag BOTH later events (each is within the window of its
    predecessor, itself possibly a dup).  This matches the SQL lag
    twin and treats a steady duplicate stream as one burst.  It is NOT
    suppress-against-last-KEPT-event semantics (under which t=110min
    would survive, being 110min from the kept t=0); a consumer that
    wants kept-event suppression needs the sequential rescan, which is
    inherently order-dependent and not SQL-window-expressible.

    Scale shape: one user co-location exchange, per block one lexsort
    over (user, type, vq2, ts, event_id) + one shifted compare — the
    sessionize skew contract (a user outgrowing a block takes the
    salted-chunk protocol; boundary merge = last ts per (user, type,
    vq2) chunk edge, the sessionize_salted pattern).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(
        ["event_id", "user_id", "event_type", "ts", "value"])
    part = picked.repartition(num_blocks=num_partitions, keys=["user_id"])

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "is_dup": pa.array([], pa.bool_())})
        if t.num_rows == 0:
            return empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ty = pc.dictionary_encode(t["event_type"].combine_chunks())
        tyc = ty.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        vq2 = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.lexsort((eid, ts, vq2, tyc, uid))
        u, c, v, s = uid[order], tyc[order], vq2[order], ts[order]
        same = (u[1:] == u[:-1]) & (c[1:] == c[:-1]) & (v[1:] == v[:-1])
        dup = np.zeros(len(u), dtype=bool)
        dup[1:] = same & (s[1:] - s[:-1] <= window_us)
        return pa.table({
            "event_id": pa.array(eid[order]),
            "is_dup": pa.array(dup),
        })

    return part.map_batches(block, batch_format="pyarrow", batch_size=None)


def event_type_bigrams(
    ds: ray.data.Dataset,
    k: int = 20,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Top-k sequential event-type BIGRAMS across users (the simplest
    sequential-pattern-mining primitive — "what follows what" over the
    event stream; funnel discovery starts here): for every user's
    ts-ordered stream, count adjacent (type_a -> type_b) transitions,
    sum corpus-wide, return the k most frequent as
    ``(pair, n)`` with ``pair = type_a || '>' || type_b``.

    SQL twin: ``lead(event_type) OVER (PARTITION BY user_id ORDER BY
    ts, event_id)`` pair counts.

    Scale shape: one user-keyed exchange (narrow projection), per-block
    lexsort + shifted compare collapses each block to its distinct
    pairs BEFORE a tiny pair-keyed grouped sum; top-k is a narrow sort
    over distinct pairs (bounded by #type^2).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.ops.relational import grouped_sum_q, topk
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    width = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["user_id", "event_id", "ts", "event_type"])
    part = picked.repartition(num_blocks=width, keys=["user_id"])

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "pair": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        ty = t["event_type"].combine_chunks()
        enc = pc.dictionary_encode(ty)
        idx = enc.indices
        # NULL types stay IN the sequence (SQL lead() skips nothing)
        # but any transition touching a NULL is dropped, matching the
        # twin's NULL-concat semantics (review r05 finding)
        code = idx.to_numpy(zero_copy_only=False)
        code = (np.where(np.isnan(code), -1, code).astype(np.int64)
                if code.dtype.kind == "f" else code.astype(np.int64))
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], code[order]
        same_user = (u[1:] == u[:-1]) & (c[1:] >= 0) & (c[:-1] >= 0)
        a, b = c[:-1][same_user], c[1:][same_user]
        if len(a) == 0:
            return empty
        nt = len(enc.dictionary)
        key, cnt = np.unique(a * nt + b, return_counts=True)
        names = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        pair = pa.array(
            [f"{names[kk // nt]}>{names[kk % nt]}" for kk in key],
            pa.string())  # bounded by #type^2 distinct pairs, not rows
        return pa.table({"pair": pair, "n": pa.array(
            cnt.astype(np.int64))})

    totals = grouped_sum_q(
        part.map_batches(block, batch_format="pyarrow", batch_size=None),
        ["pair"], float_cols={}, int_cols={"n": "n"}, num_partitions=2,
    )
    return topk(totals, "n", k, "pair")
