"""Conversation reassembly (G1): salted hash-partitioning + vectorized
multi-group block processing.

Luzzu assesses per-dataset by accumulating over its quads `[paper]`
(/root/reference/README.md:7); here the "dataset" is a conversation
(`conv_id` group) and the reassembly is the pipeline's ONE wide shuffle:

    ds.map_batches(add_group_key)                 # salt giants per chunk
      .repartition(P, keys=["group_key"])         # hash exchange
      .map_batches(conv_block_fn, batch_size=None)  # whole blocks

Instead of ``groupby().map_groups`` (one Python call per conversation —
per-group overhead dominates with ~10-turn convs), each *block* after hash
partitioning holds complete groups; ``conv_block_fn`` sorts the block once
(Arrow C++) and applies duplicate-turn detection and conversation rules to
ALL groups in the block with NumPy segmented ops.

Ordering contract (O2): the first thing done per block is a sort by
(group, turn_idx, ts, text) — arrival order never matters.  Skew: giant
conversations (>= GIANT_MIN_TURNS, detected in a cheap pre-pass) get
``group_key = conv_id + "#" + chunk`` so no single reduce task receives an
unbounded group; their conversation-level rules are merged from per-chunk
partials in a tiny second pass (two-level aggregation, SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from luzzu_ray import constants as C

_I64_MIN = -(2**63)

_HELPER_COLS = ("group_key", "salted", "__gcode", "__turn_f", "__ts_i", "__text_f")


def add_group_key(batch: pa.Table, giant_ids: pa.Array | None = None) -> pa.Table:
    """Append ``group_key`` (salted for giants) and ``salted`` columns."""
    conv = batch["conv_id"]
    conv_f = pc.fill_null(conv, "")
    if giant_ids is None or len(giant_ids) == 0:
        gk = conv_f
        salted = pa.array(np.zeros(batch.num_rows, dtype=bool))
    else:
        salted = pc.fill_null(pc.is_in(conv, value_set=giant_ids), False)
        turn_f = pc.fill_null(pc.cast(batch["turn_idx"], pa.int64()), -1)
        chunk = pc.cast(
            pc.floor(pc.divide(pc.cast(turn_f, pa.float64()), C.SALT_CHUNK)),
            pa.int64(),
        )
        salted_key = pc.binary_join_element_wise(
            conv_f, pc.cast(chunk, pa.string()), "#"
        )
        gk = pc.if_else(salted, salted_key, conv_f)
    return batch.append_column("group_key", gk).append_column("salted", salted)


def _sorted_block(batch: pa.Table) -> pa.Table:
    """Sort a block by (group, turn_idx, ts, text) with null-safe keys."""
    gcode = pc.dictionary_encode(batch["group_key"].combine_chunks()).indices
    turn_f = pc.fill_null(pc.cast(batch["turn_idx"], pa.int64()), -1)
    ts_i = pc.fill_null(pc.cast(batch["ts"], pa.int64()), _I64_MIN)
    text_f = pc.fill_null(batch["text"], "")
    t = (
        batch.append_column("__gcode", gcode)
        .append_column("__turn_f", turn_f)
        .append_column("__ts_i", ts_i)
        .append_column("__text_f", text_f)
    )
    return t.sort_by(
        [("__gcode", "ascending"), ("__turn_f", "ascending"),
         ("__ts_i", "ascending"), ("__text_f", "ascending")]
    )


def conv_block_fn(
    batch: pa.Table,
    giant_verdicts: dict[str, str] | None = None,
    emit: str = "turns",
    conv_min_turns: int = C.CONV_MIN_TURNS,
    conv_min_keep_ratio: float = C.CONV_MIN_KEEP_RATIO,
) -> pa.Table:
    """Process all complete groups inside one hash-partitioned block.

    emit="turns":    return the turn rows with final drop_reason + keep.
    emit="partials": return one row per group (conv_id, valid, total) —
                     used by the giant-conversation verdict pre-pass.
    """
    if batch.num_rows == 0:
        if emit == "partials":
            return pa.table(
                {"conv_id": pa.array([], pa.string()),
                 "valid": pa.array([], pa.int64()),
                 "total": pa.array([], pa.int64())}
            )
        out = batch.append_column("keep", pa.array([], pa.bool_()))
        return out.drop_columns([c for c in _HELPER_COLS if c in out.column_names])

    t = _sorted_block(batch)
    g = t["__gcode"].to_numpy(zero_copy_only=False).astype(np.int64)
    turn = t["__turn_f"].to_numpy(zero_copy_only=False)
    reason = t["drop_reason"].combine_chunks().to_numpy(zero_copy_only=False)
    salted = t["salted"].to_numpy(zero_copy_only=False)
    n = len(g)

    new_g = np.empty(n, dtype=bool)
    new_g[0] = True
    new_g[1:] = g[1:] != g[:-1]
    prev_turn = np.empty(n, dtype=np.int64)
    prev_turn[0] = -2
    prev_turn[1:] = turn[:-1]
    dup = (~new_g) & (turn == prev_turn) & (turn != -1)

    is_pass = np.array([r is None for r in reason], dtype=bool)
    set_dup = is_pass & dup
    reason = reason.copy()
    reason[set_dup] = C.R_DUPLICATE_TURN
    is_pass &= ~dup

    gid = np.cumsum(new_g) - 1
    n_groups = int(gid[-1]) + 1
    valid = np.bincount(gid, weights=is_pass.astype(np.float64), minlength=n_groups)
    total = np.bincount(gid, minlength=n_groups)
    group_starts = np.flatnonzero(new_g)
    salted_g = salted[group_starts]

    if emit == "partials":
        conv_first = t["conv_id"].combine_chunks().take(
            pa.array(group_starts)
        )
        return pa.table(
            {
                "conv_id": conv_first,
                "valid": pa.array(valid.astype(np.int64)),
                "total": pa.array(total.astype(np.int64)),
            }
        )

    # conversation-level rules for whole (unsalted) groups
    conv_short_g = (~salted_g) & (valid < conv_min_turns)
    conv_lowq_g = (
        (~salted_g) & ~conv_short_g & (valid / total < conv_min_keep_ratio)
    )
    set_short = is_pass & conv_short_g[gid]
    set_lowq = is_pass & conv_lowq_g[gid]
    reason[set_short] = C.R_CONV_TOO_SHORT
    reason[set_lowq] = C.R_CONV_LOW_QUALITY
    is_pass &= ~(conv_short_g[gid] | conv_lowq_g[gid])

    # giant conversations: apply precomputed two-level verdicts
    if giant_verdicts and salted_g.any():
        conv_np = t["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        giant_reason_g = np.full(n_groups, None, dtype=object)
        for gi in np.flatnonzero(salted_g):
            r = giant_verdicts.get(conv_np[group_starts[gi]])
            if r is not None:
                giant_reason_g[gi] = r
        has_gr = np.array([r is not None for r in giant_reason_g], dtype=bool)
        set_giant = is_pass & has_gr[gid]
        reason[set_giant] = giant_reason_g[gid][set_giant]
        is_pass &= ~has_gr[gid]

    out = t.set_column(
        t.schema.get_field_index("drop_reason"),
        "drop_reason",
        pa.array(reason, type=pa.string(), from_pandas=True),
    ).append_column("keep", pa.array(is_pass))
    return out.drop_columns([c for c in _HELPER_COLS if c in out.column_names])


def reduce_giant_partials(
    partials: pa.Table,
    conv_min_turns: int = C.CONV_MIN_TURNS,
    conv_min_keep_ratio: float = C.CONV_MIN_KEEP_RATIO,
) -> dict[str, str]:
    """Driver-side merge of per-chunk partials -> conv-level verdicts.

    Tiny input (one row per giant chunk).  Returns only failing convs.
    Thresholds are parameters (mirroring ``conv_block_fn``) so the salted
    giant path judges conversations with the same rules as the one-pass
    path when callers override the defaults.
    """
    agg = partials.group_by("conv_id").aggregate(
        [("valid", "sum"), ("total", "sum")]
    )
    verdicts: dict[str, str] = {}
    for conv, v, tot in zip(
        agg["conv_id"].to_pylist(),
        agg["valid_sum"].to_pylist(),
        agg["total_sum"].to_pylist(),
    ):
        if v < conv_min_turns:
            verdicts[conv] = C.R_CONV_TOO_SHORT
        elif v / tot < conv_min_keep_ratio:
            verdicts[conv] = C.R_CONV_LOW_QUALITY
    return verdicts
