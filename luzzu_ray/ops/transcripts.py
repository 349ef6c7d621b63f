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

Skew contract (all ops in this module): one conversation lands in one
reduce block.  A conversation that outgrows a block takes the repo's
salted-chunk protocol (chunked partials + boundary merge, as the
flagship's giant-conversation path and sessionize_salted do) — the
audit's shifted compares and the renderer's ordered join both
decompose the same way (per-chunk partials + one boundary row per
chunk).  Not wired here because the target corpus's conversations are
bounded (FIXTURES.md); the flagship path is the precedent to follow.
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



def _conv_sorted(t: pa.Table):
    """Shared per-block scaffolding: dictionary-encode ``conv_id`` and
    lexsort rows by (conversation, turn_idx).  Returns (conv_dictarray,
    cs, order, first) where ``cs = codes[order]`` and ``first`` marks
    each conversation's opening row in sorted order."""
    conv = pc.dictionary_encode(t["conv_id"].combine_chunks())
    c = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ti = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((ti, c))
    cs = c[order]
    first = np.concatenate(([True], cs[1:] != cs[:-1]))
    return conv, cs, order, first


def _audit_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return AUDIT_SCHEMA.empty_table()
    conv, c, order, first = _conv_sorted(t)
    role = pc.dictionary_encode(t["role"].combine_chunks())
    r = role.indices.to_numpy(zero_copy_only=False).astype(np.int64)[order]
    rdict = role.dictionary.to_pylist()

    def rcode(name: str) -> int:
        return rdict.index(name) if name in rdict else -1

    tool_c, asst_c = rcode("tool"), rcode("assistant")
    user_c, sys_c = rcode("user"), rcode("system")

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
    # a dictionary-typed input passes through dictionary_encode as-is
    # and may carry UNUSED dictionary entries: size by the dictionary
    # and emit only the groups with rows (n_turns > 0)
    n_groups = len(conv.dictionary)
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
    present = np.flatnonzero(n_turns > 0)
    return pa.table(
        {
            "conv_id": pc.take(conv.dictionary, pa.array(present)),
            "n_turns": pa.array(n_turns[present].astype(np.int64)),
            "n_user": pa.array(out["n_user"][present]),
            "n_assistant": pa.array(out["n_assistant"][present]),
            "n_tool": pa.array(out["n_tool"][present]),
            "sum_chars": pa.array(sum_chars[present]),
            "max_turn_chars": pa.array(max_chars[present]),
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


def conv_structure_audit_salted(
    ds: ray.data.Dataset,
    chunk_turns: int = 512,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Skew-proof structure audit: identical semantics to
    :func:`conv_structure_audit`, but no reduce block ever holds one
    giant conversation's full history — the repo's salted-chunk
    protocol (sessionize_salted / giant-verdict precedent) applied to
    the role-structure rules.

    Phase A keys on (conv_id, turn_idx // chunk_turns): each chunk
    emits ONE partial row (within-chunk repeat / misplaced-tool counts
    over non-first positions, first/last role, turn count).  Phase B
    co-locates the narrow per-chunk rows per conversation and adds the
    boundary terms: a repeat when a chunk's first role equals the
    previous chunk's last role, a misplaced tool when a chunk opens
    with a tool turn whose previous chunk did not end in an assistant
    turn (the conversation opener counts as having no previous turn).
    Property-tested equal to the unsalted audit including tiny chunks.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def chunk_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"conv_id": pa.array([], pa.string()),
                 "chunk_id": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "rep_in": pa.array([], pa.int64()),
                 "bad_in": pa.array([], pa.int64()),
                 "first_role": pa.array([], pa.string()),
                 "last_role": pa.array([], pa.string())}
            )
        conv = pc.dictionary_encode(t["conv_id"].combine_chunks())
        c = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ti = t["turn_idx"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # per-block dictionary codes keep DISTINCT unknown roles
        # distinct (a fixed code table would conflate them); the codes
        # never cross the exchange — boundary roles travel as STRINGS
        role = pc.dictionary_encode(t["role"].combine_chunks())
        r = role.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rdict = role.dictionary.to_pylist()
        tool_c = rdict.index("tool") if "tool" in rdict else -2
        asst_c = rdict.index("assistant") if "assistant" in rdict else -3
        ch = ti // chunk_turns
        order = np.lexsort((ti, ch, c))
        c, ch, r = c[order], ch[order], r[order]
        first = np.concatenate(
            ([True], (c[1:] != c[:-1]) | (ch[1:] != ch[:-1]))
        )
        gid = np.cumsum(first) - 1
        n_g = int(gid[-1]) + 1
        n = np.bincount(gid, minlength=n_g)
        rep = (~first[1:]) & (r[1:] == r[:-1])
        rep_in = np.bincount(gid[1:][rep], minlength=n_g)
        prev_r = np.concatenate(([-9], r[:-1]))
        bad = (~first) & (r == tool_c) & (prev_r != asst_c)
        bad_in = np.bincount(gid[bad], minlength=n_g)
        starts = np.flatnonzero(first)
        ends = np.concatenate((starts[1:] - 1, [len(c) - 1]))
        return pa.table(
            {"conv_id": pc.take(conv.dictionary, pa.array(c[starts])),
             "chunk_id": pa.array(ch[starts]),
             "n": pa.array(n.astype(np.int64)),
             "rep_in": pa.array(rep_in.astype(np.int64)),
             "bad_in": pa.array(bad_in.astype(np.int64)),
             "first_role": pc.take(role.dictionary, pa.array(r[starts])),
             "last_role": pc.take(role.dictionary, pa.array(r[ends]))}
        )

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return AUDIT_SCHEMA.empty_table()
        conv = pc.dictionary_encode(t["conv_id"].combine_chunks())
        c = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ch = t["chunk_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ch, c))
        c, ch = c[order], ch[order]
        take = pa.array(order)
        n = t["n"].take(take).to_numpy(zero_copy_only=False)
        rep_in = t["rep_in"].take(take).to_numpy(zero_copy_only=False)
        bad_in = t["bad_in"].take(take).to_numpy(zero_copy_only=False)
        # roles crossed the exchange as strings: dictionary-encode the
        # two columns TOGETHER so equal strings share one code
        both = pa.chunked_array(
            [t["first_role"].take(take).combine_chunks(),
             t["last_role"].take(take).combine_chunks()]
        ).combine_chunks()  # ONE array -> one shared dictionary
        benc = pc.dictionary_encode(both)
        codes = benc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        m = len(c)
        fr, lr = codes[:m], codes[m:]
        bdict = benc.dictionary.to_pylist()
        tool_c = bdict.index("tool") if "tool" in bdict else -2
        asst_c = bdict.index("assistant") if "assistant" in bdict else -3
        user_c = bdict.index("user") if "user" in bdict else -4
        sys_c = bdict.index("system") if "system" in bdict else -5
        first = np.concatenate(([True], c[1:] != c[:-1]))
        gid = np.cumsum(first) - 1
        n_g = int(gid[-1]) + 1
        n_turns = np.zeros(n_g, dtype=np.int64)
        np.add.at(n_turns, gid, n)
        n_rep = np.zeros(n_g, dtype=np.int64)
        np.add.at(n_rep, gid, rep_in)
        n_bad = np.zeros(n_g, dtype=np.int64)
        np.add.at(n_bad, gid, bad_in)
        # boundary terms between consecutive chunks of one conversation
        prev_last = np.concatenate(([-9], lr[:-1]))
        brep = (~first) & (fr == prev_last)
        np.add.at(n_rep, gid[brep], 1)
        bbad = (~first) & (fr == tool_c) & (prev_last != asst_c)
        # conversation opener: tool-first is misplaced by definition
        obad = first & (fr == tool_c)
        np.add.at(n_bad, gid[bbad | obad], 1)
        first_role = fr[first]
        starts_ok = (first_role == user_c) | (first_role == sys_c)
        ok = starts_ok & (n_rep == 0) & (n_bad == 0)
        starts = np.flatnonzero(first)
        return pa.table(
            {"conv_id": pc.take(conv.dictionary, pa.array(c[starts])),
             "n_turns": pa.array(n_turns),
             "n_role_repeats": pa.array(n_rep),
             "n_bad_tool": pa.array(n_bad),
             "starts_ok": pa.array(starts_ok),
             "structure_ok": pa.array(ok)}
        )

    picked = ds.select_columns(["conv_id", "turn_idx", "role"])

    def add_chunk_key(t: pa.Table) -> pa.Table:
        ck = pc.binary_join_element_wise(
            t["conv_id"],
            pc.cast(
                pc.divide(
                    pc.cast(t["turn_idx"], pa.int64()),
                    pa.scalar(chunk_turns, pa.int64()),
                ),
                pa.string(),
            ),
            "#",
        )
        return t.append_column("_ck", ck)

    partials = picked.map_batches(
        add_chunk_key, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(
        num_blocks=num_partitions, keys=["_ck"]
    ).map_batches(chunk_partial, batch_format="pyarrow", batch_size=None)
    return partials.repartition(
        num_blocks=num_partitions, keys=["conv_id"]
    ).map_batches(merge_block, batch_format="pyarrow", batch_size=None)


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


def _transition_block(t: pa.Table) -> pa.Table:
    """Per-block (prev_role, role, n) partial counts; turn 0 of each
    conversation counts as a '<start>' -> role transition."""
    empty = pa.table({"prev_role": pa.array([], pa.string()),
                      "role": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    conv, cs, order, first = _conv_sorted(t)
    role = pc.dictionary_encode(t["role"].combine_chunks())
    rs = role.indices.to_numpy(zero_copy_only=False).astype(np.int64)[order]
    prev = np.where(first, np.int64(-1),
                    np.concatenate(([np.int64(-1)], rs[:-1])))
    key = (prev + 1) * (len(role.dictionary) + 1) + rs
    uk, cnt = np.unique(key, return_counts=True)
    names = ["<start>"] + role.dictionary.to_pylist()
    base = len(role.dictionary) + 1
    return pa.table({
        "prev_role": pa.array([names[int(k) // base] for k in uk]),
        "role": pa.array(
            [role.dictionary[int(k) % base].as_py() for k in uk]),
        "n": pa.array(cnt.astype(np.int64)),
    })


def role_transition_counts(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Corpus-level role-transition matrix: (prev_role, role, n) counts
    under ``turn_idx`` order, with ``prev_role = '<start>'`` for each
    conversation's opening turn — the structure fingerprint of an
    agent-transcript corpus ("how often does tool follow assistant?").

    Scale shape: one conv_id exchange (conversations co-located), per
    block a lexsort + shifted compare emits <= (R+1)*R partial rows (R
    = role-vocabulary size, ~4), then a trivially narrow grouped sum.
    SQL twin: ``lag(role) OVER (PARTITION BY conv_id ORDER BY
    turn_idx)`` + group count.
    """
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["conv_id", "turn_idx", "role"])
    part = picked.repartition(num_blocks=num_partitions, keys=["conv_id"])
    parts = part.map_batches(
        _transition_block, batch_format="pyarrow", batch_size=None
    )
    agg = parts.groupby(["prev_role", "role"], num_partitions=4).aggregate(
        Sum("n", alias_name="n"))

    def cast_block(t: pa.Table) -> pa.Table:
        return pa.table({
            "prev_role": pc.cast(t["prev_role"], pa.string()),
            "role": pc.cast(t["role"], pa.string()),
            "n": pc.cast(t["n"], pa.int64()),
        })

    return agg.map_batches(cast_block, batch_format="pyarrow")


def _tool_stats_block(t: pa.Table) -> pa.Table:
    """Per-block per-tool partials: call count, distinct-conv count
    (exact — a conversation lives in one block), well-placed count
    (directly after an ``assistant`` turn)."""
    empty = pa.table({"tool": pa.array([], pa.string()),
                      "n_calls": pa.array([], pa.int64()),
                      "n_convs": pa.array([], pa.int64()),
                      "n_well_placed": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    conv, cs, order, first = _conv_sorted(t)
    role = pc.dictionary_encode(t["role"].combine_chunks())
    rs = role.indices.to_numpy(zero_copy_only=False).astype(np.int64)[order]
    rdict = role.dictionary.to_pylist()
    asst_c = rdict.index("assistant") if "assistant" in rdict else -2
    prev = np.where(first, np.int64(-1),
                    np.concatenate(([np.int64(-1)], rs[:-1])))
    tool = pc.dictionary_encode(
        t["tool"].combine_chunks().take(pa.array(order)))
    valid = np.asarray(tool.indices.is_valid())
    tl = pc.fill_null(tool.indices, -1).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_tools = len(tool.dictionary)
    if n_tools == 0 or not valid.any():
        return empty
    n_calls = np.bincount(tl[valid], minlength=n_tools)
    well = np.bincount(
        tl[valid & (prev == asst_c)], minlength=n_tools
    ) if asst_c >= 0 else np.zeros(n_tools, dtype=np.int64)
    uc = np.unique(
        cs[valid] * np.int64(n_tools) + tl[valid])
    n_convs = np.bincount(
        (uc % n_tools).astype(np.int64), minlength=n_tools)
    return pa.table({
        "tool": pc.cast(tool.dictionary, pa.string()),
        "n_calls": pa.array(n_calls.astype(np.int64)),
        "n_convs": pa.array(n_convs.astype(np.int64)),
        "n_well_placed": pa.array(well.astype(np.int64)),
    })


def tool_usage_stats(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-tool usage statistics over an agent-transcript corpus:
    ``n_calls`` (turns naming the tool), ``n_convs`` (distinct
    conversations using it — exact because the conv_id exchange
    co-locates each conversation in one block, so per-block distincts
    sum), and ``n_well_placed`` (calls directly after an ``assistant``
    turn, the only structurally valid position).

    Scale shape: one conv_id exchange, per-block bincount kernels,
    then a grouped sum over the tiny tool vocabulary.
    """
    from ray.data.aggregate import Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["conv_id", "turn_idx", "role", "tool"])
    part = picked.repartition(num_blocks=num_partitions, keys=["conv_id"])
    parts = part.map_batches(
        _tool_stats_block, batch_format="pyarrow", batch_size=None
    )
    agg = parts.groupby("tool", num_partitions=4).aggregate(
        Sum("n_calls", alias_name="n_calls"),
        Sum("n_convs", alias_name="n_convs"),
        Sum("n_well_placed", alias_name="n_well_placed"),
    )

    def cast_block(t: pa.Table) -> pa.Table:
        return pa.table({
            "tool": pc.cast(t["tool"], pa.string()),
            "n_calls": pc.cast(t["n_calls"], pa.int64()),
            "n_convs": pc.cast(t["n_convs"], pa.int64()),
            "n_well_placed": pc.cast(t["n_well_placed"], pa.int64()),
        })

    return agg.map_batches(cast_block, batch_format="pyarrow")


def _truncate_block(t: pa.Table, budget: int) -> pa.Table:
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "turn_idx": pa.array([], pa.int32()),
                      "n_tokens": pa.array([], pa.int64()),
                      "kept": pa.array([], pa.bool_())})
    if t.num_rows == 0:
        return empty
    from luzzu_ray.functions.text import token_segments, utf8_view

    conv = pc.dictionary_encode(t["conv_id"].combine_chunks())
    c = conv.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ti = t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    data, offs = utf8_view(
        pc.fill_null(pc.cast(t["text"], pa.string()), "").combine_chunks())
    _, _, rid = token_segments(data, offs)
    n_tok = np.bincount(rid, minlength=t.num_rows).astype(np.int64)
    # reverse order within each conversation: descending turn_idx
    order = np.lexsort((-ti, c))
    cs = c[order]
    seg_start = np.concatenate(([True], cs[1:] != cs[:-1]))
    csum = np.cumsum(n_tok[order])
    base = np.zeros(len(cs), dtype=np.int64)
    starts = np.flatnonzero(seg_start)
    # subtract the cumsum just before each segment start (segment reset)
    offs_before = np.where(starts > 0, csum[starts - 1], 0)
    base[starts] = offs_before
    np.maximum.accumulate(base, out=base)
    rcum = csum - base
    kept_sorted = rcum <= budget
    kept = np.empty(len(cs), dtype=bool)
    kept[order] = kept_sorted
    return pa.table({
        "conv_id": pc.cast(t["conv_id"], pa.string()),
        "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
        "n_tokens": pa.array(n_tok),
        "kept": pa.array(kept),
    })


def truncate_conversations(
    ds: ray.data.Dataset, token_budget: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Context-window truncation: per conversation, mark the LONGEST
    SUFFIX of turns whose total word-token count fits ``token_budget``
    (keep the most recent history — the standard chat-training
    truncation).  A turn is kept iff the inclusive reverse-cumulative
    token sum from the conversation's end is <= budget; a suffix turn
    longer than the whole budget therefore drops everything before it
    too.  Output one row per turn: (conv_id, turn_idx, n_tokens, kept).

    Scale shape: one conv_id exchange, per block one lexsort +
    segment-reset reverse cumsum (no per-group Python).  SQL twin:
    ``sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
    ROWS UNBOUNDED PRECEDING) <= budget``.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["conv_id", "turn_idx", "text"])
    part = picked.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return part.map_batches(
        _truncate_block, fn_kwargs={"budget": token_budget},
        batch_format="pyarrow", batch_size=None,
    )


def top_duplicate_turns(
    ds: ray.data.Dataset, k: int = 20, role: str | None = "assistant",
    num_partitions: int | None = None,
) -> pa.Table:
    """The k most-duplicated exact turn texts across conversations —
    boilerplate detection ("which canned replies does the corpus
    repeat?").  Output: (text, n_turns, n_convs) by descending
    n_turns, ties broken by text ascending.

    Scale shape: per-block (text, n, conv-set-size) partials are NOT
    enough for exact distinct-conv counts, so the exchange is keyed on
    the TURN TEXT (bounded by distinct turn texts, the dedup-exchange
    bound) with (text, conv_id) pre-distincted per block; the final
    top-k is a driver-side k-row selection over per-block winners.
    """
    from ray.data.aggregate import Count, Sum

    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"text": pa.array([], pa.string()),
                          "conv_id": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        if role is not None:
            t = t.filter(pc.equal(t["role"], role))
        if t.num_rows == 0:
            return empty
        g = t.group_by(["text", "conv_id"]).aggregate([("turn_idx", "count")])
        return pa.table({
            "text": pc.cast(g["text"], pa.string()),
            "conv_id": pc.cast(g["conv_id"], pa.string()),
            "n": pc.cast(g["turn_idx_count"], pa.int64()),
        })

    cols = ["conv_id", "turn_idx", "role", "text"]
    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    # (text, conv) partials are distinct only WITHIN a block — the same
    # pair recurs across input blocks, so distinct-conv counting needs
    # a (text, conv)-keyed reduce FIRST, then the text-keyed rollup
    width = auto_partitions(parts, num_partitions)
    pairs = parts.groupby(
        ["text", "conv_id"], num_partitions=width,
    ).aggregate(Sum("n", alias_name="n")).materialize()
    agg = pairs.groupby(
        "text", num_partitions=width,
    ).aggregate(Sum("n", alias_name="n_turns"),
                Count(alias_name="n_convs"))

    def top_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"text": pa.array([], pa.string()),
                             "n_turns": pa.array([], pa.int64()),
                             "n_convs": pa.array([], pa.int64())})
        t = pa.table({
            "text": pc.cast(t["text"], pa.string()),
            "n_turns": pc.cast(t["n_turns"], pa.int64()),
            "n_convs": pc.cast(t["n_convs"], pa.int64()),
        })
        idx = pc.select_k_unstable(
            t, k, [("n_turns", "descending"), ("text", "ascending")])
        return t.take(idx)

    winners = agg.map_batches(
        top_block, batch_format="pyarrow", batch_size=None
    ).take_all()  # <= k rows per reduce block
    tbl = pa.Table.from_pylist(
        winners,
        schema=pa.schema([("text", pa.string()), ("n_turns", pa.int64()),
                          ("n_convs", pa.int64())]),
    )
    idx = pc.select_k_unstable(
        tbl, k, [("n_turns", "descending"), ("text", "ascending")])
    out = tbl.take(idx)
    return out.sort_by([("n_turns", "descending"), ("text", "ascending")])


TIME_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("duration_us", pa.int64()),
        ("max_gap_us", pa.int64()),
        ("n_ts_ooo", pa.int64()),
    ]
)


def _time_stats_block(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return TIME_SCHEMA.empty_table()
    conv, cs, order, first = _conv_sorted(t)
    tss = pc.cast(t["ts"].combine_chunks(), pa.int64()).to_numpy(
        zero_copy_only=False)[order]
    gid = np.cumsum(first) - 1
    n_groups = int(gid[-1]) + 1
    n_turns = np.bincount(gid, minlength=n_groups)
    tmin = np.full(n_groups, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(tmin, gid, tss)
    tmax = np.full(n_groups, np.iinfo(np.int64).min, dtype=np.int64)
    np.maximum.at(tmax, gid, tss)
    gaps = np.where(first, np.int64(0), tss - np.concatenate(([0], tss[:-1])))
    max_gap = np.zeros(n_groups, dtype=np.int64)
    np.maximum.at(max_gap, gid, gaps)
    # a turn whose ts precedes its predecessor's (in turn_idx order) is
    # out-of-order — a lineage/clock-skew quality signal
    ooo = (~first) & (gaps < 0)
    n_ooo = np.bincount(gid[ooo], minlength=n_groups)
    return pa.table(
        {
            "conv_id": pc.take(conv.dictionary, pa.array(cs[first])),
            "n_turns": pa.array(n_turns.astype(np.int64)),
            "duration_us": pa.array(tmax - tmin),
            "max_gap_us": pa.array(max_gap),
            "n_ts_ooo": pa.array(n_ooo.astype(np.int64)),
        }
    )


def conv_time_stats(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-conversation timing statistics: turn count, wall duration
    (max-min ts), the largest inter-turn gap under ``turn_idx`` order
    (clamped at 0 for backwards steps), and the count of out-of-order
    timestamps (a turn earlier than its predecessor — clock skew or
    broken lineage, a transcript-quality signal).  Exact microsecond
    int64 arithmetic; one conv_id exchange, lexsort + segment kernels.
    SQL twin: ``lag(ts) OVER (PARTITION BY conv_id ORDER BY
    turn_idx)`` + grouped max/count.
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["conv_id", "turn_idx", "ts"])
    part = picked.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return part.map_batches(
        _time_stats_block, batch_format="pyarrow", batch_size=None
    )


def preference_pairs(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Per-conversation (chosen, rejected) PREFERENCE-PAIR construction
    — the DPO/RLHF data-prep step: among a conversation's ASSISTANT
    turns, chosen = highest score (ties to lowest turn_idx), rejected =
    lowest score (ties to HIGHEST turn_idx, so an all-tied conversation
    still yields a distinct pair); conversations whose chosen and
    rejected coincide (a single assistant turn) emit nothing.

    The stand-in score is the exact integer word count (0 for
    NULL/empty text) — swap in any per-turn quality signal column.
    One conv_id exchange; block kernel is two lexsorts, no per-group
    Python.  Returns (conv_id, chosen_idx, rejected_idx, chosen_score,
    rejected_score).
    """
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["role"], "assistant"))
        tx = pc.fill_null(t["text"], "")
        nw = pc.add(pc.count_substring(tx, " "), 1)
        nw = pc.if_else(
            pc.equal(pc.binary_length(tx), 0), pa.scalar(0, pa.int32()), nw)
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "score": pc.cast(nw, pa.int64()),
        })

    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "chosen_idx": pa.array([], pa.int64()),
        "rejected_idx": pa.array([], pa.int64()),
        "chosen_score": pa.array([], pa.int64()),
        "rejected_score": pa.array([], pa.int64()),
    })

    def pairs_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        conv = t["conv_id"].combine_chunks()
        code = pc.dictionary_encode(conv)
        if isinstance(code, pa.ChunkedArray):
            code = code.combine_chunks()
        cd = code.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = t["turn_idx"].to_numpy(zero_copy_only=False)
        sc = t["score"].to_numpy(zero_copy_only=False)
        # chosen: (score DESC, idx ASC) first per conv
        oc = np.lexsort((idx, -sc, cd))
        fc = oc[np.flatnonzero(np.diff(cd[oc], prepend=-1))]
        # rejected: (score ASC, idx DESC) first per conv
        orj = np.lexsort((-idx, sc, cd))
        fr = orj[np.flatnonzero(np.diff(cd[orj], prepend=-1))]
        keep = idx[fc] != idx[fr]
        fc, fr = fc[keep], fr[keep]
        return pa.table({
            "conv_id": conv.take(pa.array(fc)),
            "chosen_idx": pa.array(idx[fc]),
            "rejected_idx": pa.array(idx[fr]),
            "chosen_score": pa.array(sc[fc]),
            "rejected_score": pa.array(sc[fr]),
        })

    scored = ds.select_columns(["conv_id", "turn_idx", "role", "text"]) \
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    part = scored.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return part.map_batches(
        pairs_block, batch_format="pyarrow", batch_size=None
    )


RETRY_J_NUM = 1
RETRY_J_DEN = 2


def conv_retry_stats(
    ds: ray.data.Dataset,
    retry_num: int = RETRY_J_NUM,
    retry_den: int = RETRY_J_DEN,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-conversation RETRY/REPHRASE signal: among adjacent turn
    pairs, how many have the SAME role and word-trigram Jaccard >=
    RETRY_J_NUM/RETRY_J_DEN — the "user repeats themself after a
    failed answer / assistant resends its message" pattern that
    agent-transcript quality filters score conversations down for.
    Output: (conv_id, n_pairs, n_same_role, n_retry).

    One conv_id exchange; per block the turn shingle sets come from
    the vectorized shingle kernel (same 64-bit gram-hash identity
    contract as the dedup family — the SQL twin intersects STRING
    trigram lists, so a collision surfaces as a hash mismatch), and
    ALL candidate pairs' intersections are counted in one lexsort over
    (pair, hash, side) tagged rows — no per-pair Python.  The Jaccard
    test is exact-integer (2*|A∩B| >= |A∪B| at the default 1/2); two
    EMPTY shingle sets (turns under SHINGLE_K tokens) count as a retry
    — identical-and-empty is still identical, matching the SQL twin's
    0 >= 0.

    Partitioning assumption: a conversation's turns co-locate in one
    reduce block (the conv-sort contract shared with
    conv_turn_stats); for giant conversations compose with the salted
    chunk protocol of conv_structure_audit_salted — adjacency crosses
    chunk bounds only at the single boundary pair per chunk."""
    from luzzu_ray.ops.dedup import _shingle_hashes, auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["conv_id", "turn_idx", "role", "text"])

    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "n_pairs": pa.array([], pa.int64()),
        "n_same_role": pa.array([], pa.int64()),
        "n_retry": pa.array([], pa.int64()),
    })

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        n = t.num_rows
        sh, rid = _shingle_hashes(t)
        # distinct shingles per row
        if len(sh):
            order = np.lexsort((sh, rid))
            rs, ss = rid[order], sh[order]
            keep = np.concatenate(
                ([True], (rs[1:] != rs[:-1]) | (ss[1:] != ss[:-1])))
            rs, ss = rs[keep], ss[keep]
        else:
            rs = np.zeros(0, dtype=np.int64)
            ss = np.zeros(0, dtype=np.uint64)
        cnt = np.bincount(rs, minlength=n).astype(np.int64)
        row_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cnt, out=row_start[1:])

        conv = t["conv_id"].combine_chunks()
        code = pc.dictionary_encode(conv)
        if isinstance(code, pa.ChunkedArray):
            code = code.combine_chunks()
        cd = code.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        role = t["role"].combine_chunks()
        same_conv = cd[1:] == cd[:-1]
        la = np.flatnonzero(same_conv)      # left row of each pair
        same_role = pc.equal(
            role.slice(0, n - 1), role.slice(1, n - 1)
        ).to_numpy(zero_copy_only=False)[la]
        cand = la[same_role]                # pairs needing a Jaccard

        inter = np.zeros(len(la), dtype=np.int64)
        if len(cand) and len(ss):
            # tag each candidate pair's two rows' shingles with pair id
            reps_a, reps_b = cnt[cand], cnt[cand + 1]
            tag = np.concatenate(
                (np.repeat(np.arange(len(cand)), reps_a),
                 np.repeat(np.arange(len(cand)), reps_b)))

            # vectorized range-gather of each row's shingle slice
            def _ranges(rows, reps):
                if not len(rows):
                    return np.zeros(0, dtype=np.int64)
                out = np.repeat(row_start[rows], reps)
                bump = np.arange(int(reps.sum())) - np.repeat(
                    np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
                return out + bump
            idxs = np.concatenate(
                (_ranges(cand, reps_a), _ranges(cand + 1, reps_b)))
            hv = ss[idxs]
            o2 = np.lexsort((hv, tag))
            tg, hh = tag[o2], hv[o2]
            both = (tg[1:] == tg[:-1]) & (hh[1:] == hh[:-1])
            icnt = np.bincount(tg[1:][both], minlength=len(cand))
            cpos = np.searchsorted(la, cand)
            inter[cpos] = icnt
        uni = cnt[la] + cnt[la + 1] - inter
        sr = np.zeros(len(la), dtype=bool)
        sr[np.searchsorted(la, cand)] = True
        retry = sr & (retry_den * inter >= retry_num * uni)

        pconv = cd[la]
        nconv = int(cd.max()) + 1
        n_pairs = np.bincount(pconv, minlength=nconv)
        n_same = np.bincount(pconv[sr], minlength=nconv)
        n_retry = np.bincount(pconv[retry], minlength=nconv)
        has = n_pairs > 0
        conv_keys = code.dictionary.take(
            pa.array(np.flatnonzero(has), pa.int64()))
        return pa.table({
            "conv_id": conv_keys,
            "n_pairs": pa.array(n_pairs[has].astype(np.int64)),
            "n_same_role": pa.array(n_same[has].astype(np.int64)),
            "n_retry": pa.array(n_retry[has].astype(np.int64)),
        })

    part = picked.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return part.map_batches(block, batch_format="pyarrow", batch_size=None)


PII_PROP_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("pii_literal", pa.string()),
        ("text_pii", pa.string()),
    ]
)


def _pii_block(t: pa.Table, pat: str, repl: str) -> pa.Table:
    if t.num_rows == 0:
        return PII_PROP_SCHEMA.empty_table()
    conv, cs, order, first = _conv_sorted(t)
    oa = pa.array(order)
    conv_s = pc.take(t["conv_id"].combine_chunks(), oa)
    ti_s = pc.take(t["turn_idx"].combine_chunks(), oa)
    text = pc.take(t["text"].combine_chunks(), oa)
    filled = pc.fill_null(text, "")
    # leftmost first match per turn (RE2, same engine as the SQL twin)
    m = pc.struct_field(pc.extract_regex(filled, pattern=f"(?P<m>{pat})"), "m")
    md = pc.dictionary_encode(m)
    n_dic = len(md.dictionary)
    sent = np.int64(n_dic)
    codes = md.indices.fill_null(-1).to_numpy(zero_copy_only=False)
    codes = codes.astype(np.int64)
    if n_dic:
        sort_idx = pc.array_sort_indices(md.dictionary).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        rank_of = np.empty(n_dic, dtype=np.int64)
        rank_of[sort_idx] = np.arange(n_dic, dtype=np.int64)
        rank = np.where(codes >= 0, rank_of[np.maximum(codes, 0)], sent)
    else:
        sort_idx = np.zeros(0, dtype=np.int64)
        rank = np.full(len(codes), sent)
    starts = np.flatnonzero(first)
    gmin = np.minimum.reduceat(rank, starts)
    row_min = np.repeat(gmin, np.diff(np.concatenate((starts, [len(rank)]))))

    out_text = text.to_numpy(zero_copy_only=False).copy()
    out_lit = np.full(t.num_rows, None, dtype=object)
    for rk in np.unique(gmin):
        if rk == sent:
            continue
        lit = md.dictionary[int(sort_idx[int(rk)])].as_py()
        idx = np.flatnonzero(row_min == rk)
        sub = pc.replace_substring(
            pc.take(text, pa.array(idx)), pattern=lit, replacement=repl
        )
        out_text[idx] = sub.to_numpy(zero_copy_only=False)
        out_lit[idx] = lit
    return pa.table(
        {
            "conv_id": conv_s,
            "turn_idx": pc.cast(ti_s, pa.int32()),
            "pii_literal": pa.array(out_lit, pa.string()),
            "text_pii": pa.array(out_text, pa.string()),
        }
    )


def conv_pii_propagate(
    ds: ray.data.Dataset,
    pattern: str | None = None,
    replacement: str = "<EMAIL>",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Cross-turn PII propagation scrub: within each conversation, the
    lexicographically-first PII literal matched anywhere (leftmost first
    match per turn, RE2) is redacted from EVERY turn as an exact-literal
    replace — the "a name/address introduced once keeps leaking in later
    turns" case a per-turn regex scrub cannot express, because the
    replacement target is a per-conversation VALUE, not a pattern.

    Emits one row per turn: ``(conv_id, turn_idx, pii_literal,
    text_pii)`` with ``pii_literal`` null (and text unchanged) for
    conversations without a match.  SQL twin: grouped
    ``min(nullif(regexp_extract(text, pat), ''))`` joined back +
    ``replace(text, lit, repl)``.

    Scale shape: ONE conv_id co-location exchange (the flagship's
    reassembly assumption); per block one vectorized RE2 extract pass,
    then a loop over DISTINCT propagated literals (bounded by
    conversations-with-PII per block, not rows) whose body is a
    vectorized literal replace over only that conversation's rows.
    Row-count preserving; NULL text stays NULL.
    """
    from luzzu_ray import constants as C
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle

    if pattern is None:
        pattern = dict((n, p) for n, p, _ in C.SCRUB_PACK)["email"]
    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    picked = ds.select_columns(["conv_id", "turn_idx", "text"])
    part = picked.repartition(num_blocks=num_partitions, keys=["conv_id"])
    return part.map_batches(
        lambda t: _pii_block(t, pattern, replacement),
        batch_format="pyarrow",
        batch_size=None,
    )


LANG_SWITCH_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("n_switches", pa.int64()),
    ]
)


def conv_lang_switches(
    ds: ray.data.Dataset,
    model_ref=None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-conversation code-switching count through the REAL langid
    actor chain: every turn is labeled by the stateful ``LangIdScorer``
    pool, conversations co-locate on one exchange, and adjacent turns
    with different predicted languages count as switches — the
    multilingual-contamination signal for conversation corpora
    (Luzzu versatility-metric analogue, README.md:7 ``[paper]``).

    Output per ``conv_id``: ``(n_turns, n_switches)``.  Oracle: a
    committed fixture from the row-at-a-time scalar twin
    (``tools/make_fixtures.make_conv_turn_langs``) + a LAG compare in
    SQL.  Scale shape: actor-pool map (model built once per actor) +
    one conv exchange + shifted dictionary-code compare per block.
    """
    from luzzu_ray.ops.common import pool as default_actor_pool
    from luzzu_ray.ops.dedup import auto_partitions
    from luzzu_ray.pipelines.filter_pipeline import _ensure_hash_shuffle
    from luzzu_ray.stages.actors import LangIdScorer

    _ensure_hash_shuffle()
    num_partitions = auto_partitions(ds, num_partitions)
    scored = ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        LangIdScorer,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=default_actor_pool(),
        fn_constructor_kwargs={"model_ref": model_ref},
    ).select_columns(["conv_id", "turn_idx", "lang"])
    part = scored.repartition(num_blocks=num_partitions, keys=["conv_id"])

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return LANG_SWITCH_SCHEMA.empty_table()
        conv, c, order, first = _conv_sorted(t)
        lang = pc.dictionary_encode(t["lang"].combine_chunks())
        lc = lang.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)[order]
        gid = np.cumsum(first) - 1
        n_groups = int(gid[-1]) + 1
        n_turns = np.bincount(gid, minlength=n_groups)
        sw_pos = (~first[1:]) & (lc[1:] != lc[:-1])
        n_sw = np.bincount(gid[1:][sw_pos], minlength=n_groups)
        return pa.table({
            "conv_id": pc.take(conv.dictionary, pa.array(c[first])),
            "n_turns": pa.array(n_turns.astype(np.int64)),
            "n_switches": pa.array(n_sw.astype(np.int64)),
        })

    return part.map_batches(block, batch_format="pyarrow", batch_size=None)


def canned_phrase_stats(
    ds: ray.data.Dataset,
    phrases: list[str],
    role: str = "assistant",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-conversation CANNED-RESPONSE detection: count ``role`` turns
    whose text contains ANY of the literal ``phrases`` (exact substring
    — the boilerplate/refusal screen of transcript curation: template
    answers and stock refusals add no training signal and skew reward
    stats).  Output ``(conv_id, n_role_turns, n_canned)``.

    SQL twin: ``count(*) FILTER (role = r AND (position(p1 IN text) > 0
    OR ...))`` — literal ``position`` avoids LIKE-escaping semantics.

    Scale shape: counts are commutative, so per-block partials
    (vectorized ``match_substring`` per phrase — a handful — OR-folded)
    collapse each block to its conversation rows BEFORE one narrow
    grouped-sum exchange; the turn payload never shuffles.
    """
    from luzzu_ray.ops.relational import grouped_sum_q

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "n_role_turns": pa.array([], pa.int64()),
                "n_canned": pa.array([], pa.int64()),
            })
        tx = pc.fill_null(t["text"], "")
        is_role = pc.equal(t["role"], role)
        hit = pa.array(np.zeros(t.num_rows, dtype=bool))  # [] phrases
        for p in phrases:
            hit = pc.or_(hit, pc.match_substring(tx, p))
        canned = pc.and_(is_role, hit)
        return pa.table({
            "conv_id": t["conv_id"],
            "n_role_turns": pc.cast(is_role, pa.int64()),
            "n_canned": pc.cast(canned, pa.int64()),
        })

    return grouped_sum_q(
        ds.select_columns(["conv_id", "role", "text"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        ["conv_id"], float_cols={},
        int_cols={"n_role_turns": "n_role_turns", "n_canned": "n_canned"},
        num_partitions=num_partitions,
    )
