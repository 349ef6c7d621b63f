"""Conversation-structure operators over multi-turn transcript tables.

Luzzu's syntactic-validity / consistency metrics flag records whose
structure violates the schema contract (README.md:7 ``[paper]``); the
transcript analogue is CONVERSATION-level structure: roles must
alternate, a conversation opens with ``user`` or ``system``, and a
``tool`` turn only makes sense directly after an ``assistant`` turn
(the turn that issued the call).  These are the rules an agent-
transcript quality filter runs before any content heuristic.

Scale shape: ONE conv_id co-location exchange (the flagship's
conversation-reassembly assumption), then each block audits its
conversations with one lexsort + shifted compares — no per-group
Python, no second exchange; output is one narrow row per conversation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

AUDIT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("n_role_repeats", pa.int64()),
        ("n_bad_tool", pa.int64()),
        ("starts_ok", pa.bool_()),
        ("structure_ok", pa.bool_()),
    ]
)


def _audit_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return AUDIT_SCHEMA.empty_table()
    conv = pc.dictionary_encode(t["conv_id"].combine_chunks())
    c = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ti = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    role = pc.dictionary_encode(t["role"].combine_chunks())
    r = role.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    rdict = role.dictionary.to_pylist()

    def rcode(name: str) -> int:
        return rdict.index(name) if name in rdict else -1

    tool_c, asst_c = rcode("tool"), rcode("assistant")
    user_c, sys_c = rcode("user"), rcode("system")

    order = np.lexsort((ti, c))
    c, r = c[order], r[order]
    first = np.concatenate(([True], c[1:] != c[:-1]))
    gid = np.cumsum(first) - 1
    n_groups = int(gid[-1]) + 1

    n_turns = np.bincount(gid, minlength=n_groups)
    # consecutive same-role turns within a conversation
    rep_pos = (~first[1:]) & (r[1:] == r[:-1])
    n_rep = np.bincount(gid[1:][rep_pos], minlength=n_groups)
    # tool turns whose previous turn is not an assistant turn
    prev_r = np.concatenate(([-1], r[:-1]))
    bad_tool_pos = (r == tool_c) & (first | (prev_r != asst_c))
    n_bad = np.bincount(gid[bad_tool_pos], minlength=n_groups)
    first_role = r[first]
    starts_ok = (first_role == user_c) | (first_role == sys_c)
    ok = starts_ok & (n_rep == 0) & (n_bad == 0)

    return pa.table(
        {
            "conv_id": pc.take(conv.dictionary, pa.array(c[first])),
            "n_turns": pa.array(n_turns.astype(np.int64)),
            "n_role_repeats": pa.array(n_rep.astype(np.int64)),
            "n_bad_tool": pa.array(n_bad.astype(np.int64)),
            "starts_ok": pa.array(starts_ok),
            "structure_ok": pa.array(ok),
        }
    )


STATS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("n_user", pa.int64()),
        ("n_assistant", pa.int64()),
        ("n_tool", pa.int64()),
        ("sum_chars", pa.int64()),
        ("max_turn_chars", pa.int64()),
    ]
)


def _turn_stats_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return STATS_SCHEMA.empty_table()
    conv = pc.dictionary_encode(t["conv_id"].combine_chunks())
    c = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    role = t["role"].combine_chunks()
    nch = pc.fill_null(
        pc.utf8_length(t["text"].combine_chunks()), 0
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    n_groups = int(c.max()) + 1
    n_turns = np.bincount(c, minlength=n_groups)
    out = {"n_turns": n_turns}
    for name in ("user", "assistant", "tool"):
        mask = pc.equal(role, name).to_numpy(zero_copy_only=False)
        out[f"n_{name}"] = np.bincount(
            c, weights=mask.astype(np.float64), minlength=n_groups
        ).astype(np.int64)
    sum_chars = np.zeros(n_groups, dtype=np.int64)
    np.add.at(sum_chars, c, nch)
    max_chars = np.zeros(n_groups, dtype=np.int64)
    np.maximum.at(max_chars, c, nch)
    # dictionary order == group index order (indices index the dict)
    return pa.table(
        {
            "conv_id": conv.dictionary,
            "n_turns": pa.array(out["n_turns"].astype(np.int64)),
            "n_user": pa.array(out["n_user"]),
            "n_assistant": pa.array(out["n_assistant"]),
            "n_tool": pa.array(out["n_tool"]),
            "sum_chars": pa.array(sum_chars),
            "max_turn_chars": pa.array(max_chars),
        }
    )


def conv_turn_stats(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-conversation content statistics: turn count, per-role turn
    counts, total and max turn length (chars) — the conversation-level
    completeness metrics (Luzzu's per-dataset observations over the
    record stream).  One conv_id exchange; per block pure
    bincount/scatter kernels keyed on the dictionary codes, order-free
    (no sort needed — all statistics are commutative).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["conv_id", "role", "text"])
    part = picked.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return part.map_batches(
        _turn_stats_block, batch_format="pyarrow", batch_size=None
    )


RENDER_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("transcript", pa.string()),
        ("n_turns", pa.int64()),
    ]
)


def _render_conv_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return RENDER_SCHEMA.empty_table()
    conv = pc.dictionary_encode(t["conv_id"].combine_chunks())
    c = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ti = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((ti, c))
    c = c[order]
    lines = t["line"].combine_chunks().take(pa.array(order))
    first = np.concatenate(([True], c[1:] != c[:-1]))
    starts = np.flatnonzero(first)
    offsets = np.concatenate((starts, [len(c)])).astype(np.int32)
    groups = pa.ListArray.from_arrays(pa.array(offsets), lines)
    return pa.table(
        {
            "conv_id": pc.take(conv.dictionary, pa.array(c[starts])),
            "transcript": pc.binary_join(groups, "\n"),
            "n_turns": pa.array(np.diff(offsets).astype(np.int64)),
        }
    )


def render_conversations(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Render each conversation to ONE model-ready training string:
    ``role: text`` lines joined with newlines in ``turn_idx`` order —
    the step that turns a flat turn table into SFT corpus documents.
    NULL turn text renders as the empty string (SQL ``coalesce``).

    Per-row formatting and per-group joins are both Arrow kernels
    (``binary_join_element_wise`` then ListArray offsets +
    ``binary_join``); one conv_id exchange, no per-group Python.  SQL
    twin: ``string_agg(role || ': ' || coalesce(text, ''), chr(10)
    ORDER BY turn_idx) GROUP BY conv_id``.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def fmt(t: pa.Table) -> pa.Table:
        line = pc.binary_join_element_wise(
            t["role"], pc.fill_null(t["text"], ""), ": "
        )
        return pa.table(
            {"conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
             "line": line}
        )

    picked = ds.select_columns(["conv_id", "turn_idx", "role", "text"])
    part = picked.map_batches(
        fmt, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(num_blocks=num_partitions, keys=["conv_id"])
    return part.map_batches(
        _render_conv_block, batch_format="pyarrow", batch_size=None
    )


def conv_structure_audit(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-conversation role-structure audit.

    Output per ``conv_id``: ``n_turns``, ``n_role_repeats`` (consecutive
    same-role turn pairs under ``turn_idx`` order), ``n_bad_tool``
    (``tool`` turns not directly preceded by an ``assistant`` turn),
    ``starts_ok`` (opener is ``user`` or ``system``) and the combined
    ``structure_ok`` verdict.  SQL twin: ``lag(role) OVER (PARTITION BY
    conv_id ORDER BY turn_idx)`` + one grouped aggregate.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["conv_id", "turn_idx", "role"])
    part = picked.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return part.map_batches(
        _audit_block, batch_format="pyarrow", batch_size=None
    )
