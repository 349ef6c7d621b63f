"""Conversation-structure audit: hand-built verdicts + layout invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _tbl(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
        }
    )


CASES = [
    # clean user/assistant alternation
    ("a", [(0, "user"), (1, "assistant"), (2, "user")],
     dict(n_role_repeats=0, n_bad_tool=0, starts_ok=True, structure_ok=True)),
    # system opener then alternation
    ("b", [(0, "system"), (1, "user"), (2, "assistant")],
     dict(n_role_repeats=0, n_bad_tool=0, starts_ok=True, structure_ok=True)),
    # double user turn
    ("c", [(0, "user"), (1, "user"), (2, "assistant")],
     dict(n_role_repeats=1, n_bad_tool=0, starts_ok=True, structure_ok=False)),
    # tool turn correctly after assistant
    ("d", [(0, "user"), (1, "assistant"), (2, "tool"), (3, "assistant")],
     dict(n_role_repeats=0, n_bad_tool=0, starts_ok=True, structure_ok=True)),
    # tool turn after user = misplaced; also opener is assistant
    ("e", [(0, "assistant"), (1, "user"), (2, "tool")],
     dict(n_role_repeats=0, n_bad_tool=1, starts_ok=False,
          structure_ok=False)),
    # tool turn opens the conversation = misplaced
    ("f", [(0, "tool"), (1, "assistant")],
     dict(n_role_repeats=0, n_bad_tool=1, starts_ok=False,
          structure_ok=False)),
    # consecutive tool turns: second lacks a directly-preceding assistant
    ("g", [(0, "user"), (1, "assistant"), (2, "tool"), (3, "tool")],
     dict(n_role_repeats=1, n_bad_tool=1, starts_ok=True,
          structure_ok=False)),
]


def _rows():
    rows = []
    for conv, turns, _ in CASES:
        rows += [(conv, i, r) for i, r in turns]
    return rows


def test_audit_block_verdicts():
    from luzzu_ray.ops.transcripts import _audit_block

    out = _audit_block(_tbl(_rows())).to_pandas().set_index("conv_id")
    for conv, turns, want in CASES:
        row = out.loc[conv]
        assert row["n_turns"] == len(turns), conv
        for k, v in want.items():
            assert row[k] == v, (conv, k, row[k], v)


def test_audit_block_layout_invariance():
    from luzzu_ray.ops.transcripts import _audit_block

    rows = _rows()
    base = (
        _audit_block(_tbl(rows)).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    rng = np.random.Generator(np.random.PCG64(7))
    for _ in range(5):
        perm = rng.permutation(len(rows))
        shuf = _audit_block(_tbl([rows[i] for i in perm])).to_pandas()
        shuf = shuf.sort_values("conv_id").reset_index(drop=True)
        assert shuf.equals(base)


def test_audit_distributed_matches_block(ray_session):
    import ray.data

    from luzzu_ray.ops.transcripts import _audit_block, conv_structure_audit

    rows = _rows()
    t = _tbl(rows)
    ds = ray.data.from_arrow(t).repartition(5)
    got = (
        conv_structure_audit(ds, num_partitions=3).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    want = (
        _audit_block(t).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    assert got.equals(want)


def test_multiturn_adapter_role_rules(ray_session, tmp_path):
    """The adapter's derivation obeys its documented pure-function rules."""
    import pyarrow.parquet as pq

    from luzzu_ray.sources import documents_as_multiturn

    ids = list(range(100))
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "text": pa.array(["x" * 200 for _ in ids])}
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = documents_as_multiturn(str(tmp_path)).to_pandas()
    out["doc_id"] = out["conv_id"].astype(int)
    for did, grp in out.groupby("doc_id"):
        grp = grp.sort_values("turn_idx")
        assert len(grp) == 2 + did % 3
        roles = list(grp["role"])
        if did % 5 == 0:
            assert roles[0] == "system"
        else:
            assert roles[0] == "user"
        if len(roles) >= 3 and did % 11 == 0:
            assert roles[2] == "tool"
            assert grp["tool"].iloc[2] == "search"
        elif len(roles) >= 3 and did % 7 == 0:
            assert roles[2] == roles[1]
        assert grp["tool"].drop(
            grp.index[[2]] if len(roles) >= 3 else []
        ).isna().all()


def test_render_conversations_layout_invariance(ray_session):
    import ray.data

    from luzzu_ray.ops.transcripts import render_conversations

    rows = _rows()
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array(
                [None if i % 9 == 0 else f"t{i}" for i in range(len(rows))]
            ),
        }
    )
    outs = []
    for parts in (1, 6):
        got = (
            render_conversations(
                ray.data.from_arrow(t).repartition(parts), num_partitions=3
            )
            .to_pandas().sort_values("conv_id").reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    row_a = outs[0][outs[0]["conv_id"] == "a"].iloc[0]
    assert row_a["n_turns"] == 3
    assert row_a["transcript"].count("\n") == 2
    # null text renders as empty string after the role prefix
    assert any(
        line.endswith(": ")
        for out_row in outs[0].itertuples()
        for line in out_row.transcript.split("\n")
    )


def test_conv_turn_stats_matches_pandas_twin(ray_session):
    import pandas as pd
    import ray.data

    from luzzu_ray.ops.transcripts import conv_turn_stats

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame({
        "conv_id": [f"c{int(x)}" for x in rng.integers(0, 60, size=n)],
        "role": rng.choice(["user", "assistant", "tool", "system"], size=n),
        "text": [
            None if i % 17 == 0 else "x" * int(rng.integers(0, 50))
            for i in range(n)
        ],
    })
    nch = df["text"].str.len().fillna(0).astype(int)
    want = (
        df.assign(nch=nch)
        .groupby("conv_id")
        .agg(
            n_turns=("role", "size"),
            n_user=("role", lambda r: (r == "user").sum()),
            n_assistant=("role", lambda r: (r == "assistant").sum()),
            n_tool=("role", lambda r: (r == "tool").sum()),
            sum_chars=("nch", "sum"),
            max_turn_chars=("nch", "max"),
        )
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    for parts in (1, 7):
        got = (
            conv_turn_stats(
                ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                num_partitions=4,
            )
            .to_pandas().sort_values("conv_id").reset_index(drop=True)
        )
        for col in want.columns:
            assert list(got[col]) == list(want[col]), (parts, col)


def test_salted_audit_equals_unsalted(ray_session):
    """conv_structure_audit_salted == conv_structure_audit on random
    conversations over the canonical role domain, including
    chunk_turns far below conversation length (many boundaries)."""
    import ray.data

    from luzzu_ray.ops.transcripts import (
        conv_structure_audit,
        conv_structure_audit_salted,
    )

    rng = np.random.Generator(np.random.PCG64(31))
    rows = []
    for conv in range(40):
        n = int(rng.integers(1, 30))
        for i in range(n):
            role = ["user", "assistant", "system", "tool"][
                int(rng.integers(0, 4))
            ]
            rows.append((f"c{conv}", i, role))
    t = _tbl(rows)
    base = (
        conv_structure_audit(
            ray.data.from_arrow(t).repartition(4), num_partitions=3
        )
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    for chunk in (512, 4, 1):
        salted = (
            conv_structure_audit_salted(
                ray.data.from_arrow(t).repartition(4),
                chunk_turns=chunk, num_partitions=3,
            )
            .to_pandas().sort_values("conv_id").reset_index(drop=True)
        )
        assert salted.equals(base), chunk


def test_salted_audit_distinct_unknown_roles(ray_session):
    """Two consecutive DISTINCT unknown roles are NOT a repeat — the
    salted path must not conflate unknown roles into one class."""
    import ray.data

    from luzzu_ray.ops.transcripts import (
        conv_structure_audit,
        conv_structure_audit_salted,
    )

    rows = [("z", 0, "user"), ("z", 1, "foo"), ("z", 2, "bar"),
            ("z", 3, "foo"), ("y", 0, "user"), ("y", 1, "foo"),
            ("y", 2, "foo")]
    t = _tbl(rows)
    base = (
        conv_structure_audit(
            ray.data.from_arrow(t).repartition(2), num_partitions=2
        ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert base.loc[base["conv_id"] == "z", "n_role_repeats"].iloc[0] == 0
    assert base.loc[base["conv_id"] == "y", "n_role_repeats"].iloc[0] == 1
    for chunk in (2, 1):
        salted = (
            conv_structure_audit_salted(
                ray.data.from_arrow(t).repartition(2),
                chunk_turns=chunk, num_partitions=2,
            ).to_pandas().sort_values("conv_id").reset_index(drop=True)
        )
        assert salted.equals(base), chunk


def test_conv_turn_stats_dictionary_input(ray_session):
    """A dictionary-typed conv_id with unused dictionary entries must
    not crash or emit phantom rows."""
    import ray.data

    from luzzu_ray.ops.transcripts import _turn_stats_block

    dict_arr = pa.DictionaryArray.from_arrays(
        pa.array([0, 0], pa.int32()),
        pa.array(["a", "unused"], pa.string()),
    )
    t = pa.table({
        "conv_id": dict_arr,
        "role": pa.array(["user", "assistant"]),
        "text": pa.array(["hi", "yo"]),
    })
    out = _turn_stats_block(t).to_pandas()
    assert list(out["conv_id"]) == ["a"]
    assert list(out["n_turns"]) == [2]


def test_role_transition_counts_matches_bruteforce(ray_session):
    """Transition matrix equals a per-conversation Python sweep
    (openers counted as '<start>' -> role), layout invariant."""
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.transcripts import role_transition_counts

    convs = {
        "c1": ["user", "assistant", "tool", "assistant"],
        "c2": ["system", "user", "assistant"],
        "c3": ["user", "user", "assistant"],   # repeat violation
        "c4": ["assistant"],
        "c5": ["user", "assistant", "user", "assistant", "tool"],
    }
    rows = [(cid, i, r) for cid, roles in convs.items()
            for i, r in enumerate(roles)]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
    })
    want: dict = {}
    for roles in convs.values():
        seq = ["<start>"] + roles
        for a, b in zip(seq, seq[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    outs = []
    for parts in (1, 6):
        got = (
            role_transition_counts(
                ray.data.from_arrow(t).repartition(parts),
                num_partitions=3)
            .to_pandas()
            .sort_values(["prev_role", "role"]).reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got_map = {(r["prev_role"], r["role"]): r["n"]
               for _, r in outs[0].iterrows()}
    assert got_map == want


def test_tool_usage_stats_matches_bruteforce(ray_session):
    """Per-tool calls / distinct convs / well-placed counts equal a
    Python sweep on a multi-tool corpus; distinct-conv exactness
    survives input-block splits (the conv exchange co-locates)."""
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.transcripts import tool_usage_stats

    # (conv, [(role, tool)...]): search appears twice in c1 (one conv),
    # calc is well-placed once and misplaced once across two convs
    convs = {
        "c1": [("user", None), ("assistant", None), ("tool", "search"),
               ("assistant", None), ("tool", "search")],
        "c2": [("user", None), ("tool", "calc"), ("assistant", None)],
        "c3": [("user", None), ("assistant", None), ("tool", "calc")],
        "c4": [("user", None), ("assistant", None)],
    }
    rows = [(cid, i, r, tl) for cid, turns in convs.items()
            for i, (r, tl) in enumerate(turns)]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "tool": pa.array([r[3] for r in rows], pa.string()),
    })
    want = {
        "search": {"n_calls": 2, "n_convs": 1, "n_well_placed": 2},
        "calc": {"n_calls": 2, "n_convs": 2, "n_well_placed": 1},
    }
    outs = []
    for parts in (1, 8):
        got = (
            tool_usage_stats(
                ray.data.from_arrow(t).repartition(parts),
                num_partitions=3)
            .to_pandas().sort_values("tool").reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got_map = {
        r["tool"]: {"n_calls": r["n_calls"], "n_convs": r["n_convs"],
                    "n_well_placed": r["n_well_placed"]}
        for _, r in outs[0].iterrows()
    }
    assert got_map == want


def test_truncate_conversations_longest_suffix(ray_session):
    """Kept turns form the longest suffix fitting the budget; an
    oversized turn mid-suffix blocks everything before it; layout
    invariant."""
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.transcripts import truncate_conversations

    convs = {
        # token counts per turn: 3, 4, 5 -> budget 10 keeps idx 1, 2
        "c1": ["a b c", "a b c d", "a b c d e"],
        # a 12-token turn at idx 1 blocks idx 0; idx 1 itself > budget
        # so only idx 2 (2 tokens) survives
        "c2": ["a b", " ".join(["w"] * 12), "x y"],
        # everything fits
        "c3": ["one", "two three"],
        # empty text counts 0 tokens
        "c4": ["", "a", ""],
    }
    want_kept = {
        ("c1", 0): False, ("c1", 1): True, ("c1", 2): True,
        ("c2", 0): False, ("c2", 1): False, ("c2", 2): True,
        ("c3", 0): True, ("c3", 1): True,
        ("c4", 0): True, ("c4", 1): True, ("c4", 2): True,
    }
    rows = [(cid, i, s) for cid, turns in convs.items()
            for i, s in enumerate(turns)]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows]),
    })
    outs = []
    for parts in (1, 5):
        got = (
            truncate_conversations(
                ray.data.from_arrow(t).repartition(parts), 10,
                num_partitions=3)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got_map = {(r["conv_id"], r["turn_idx"]): bool(r["kept"])
               for _, r in outs[0].iterrows()}
    assert got_map == want_kept
    ntok = {(r["conv_id"], r["turn_idx"]): r["n_tokens"]
            for _, r in outs[0].iterrows()}
    assert ntok[("c2", 1)] == 12 and ntok[("c4", 0)] == 0


def test_top_duplicate_turns_distinct_convs_across_blocks(ray_session):
    """n_convs is an exact distinct count even when one conversation's
    duplicate turns are split across many input blocks (the (text,
    conv)-keyed reduce must precede the rollup)."""
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.transcripts import top_duplicate_turns

    rows = []
    # "canned" appears 6x in conv A and 1x in conv B -> n_convs must
    # be 2 no matter how blocks split conv A
    for i in range(6):
        rows.append(("A", i, "assistant", "canned"))
    rows.append(("B", 0, "assistant", "canned"))
    rows.append(("B", 1, "assistant", "unique reply"))
    rows.append(("C", 0, "user", "canned"))  # wrong role: excluded
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
    })
    for parts in (1, 9):
        got = top_duplicate_turns(
            ray.data.from_arrow(t).repartition(parts), k=5,
            role="assistant", num_partitions=3,
        ).to_pandas()
        assert list(got["text"]) == ["canned", "unique reply"]
        assert list(got["n_turns"]) == [7, 1]
        assert list(got["n_convs"]) == [2, 1]


def test_conv_time_stats_gaps_and_out_of_order(ray_session):
    """Duration, max positive gap and out-of-order counts equal hand
    arithmetic, including a conversation whose timestamps go backwards
    (negative gaps never inflate max_gap_us); layout invariant."""
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.transcripts import conv_time_stats

    US = 1_000_000
    convs = {
        "a": [0, 60 * US, 600 * US],          # gaps 60s, 540s
        "b": [100 * US, 40 * US, 50 * US],    # ooo at idx 1; gap +10s
        "c": [5 * US],                        # single turn
    }
    rows = [(cid, i, ts) for cid, tss in convs.items()
            for i, ts in enumerate(tss)]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    want = {
        "a": (3, 600 * US, 540 * US, 0),
        "b": (3, 60 * US, 10 * US, 1),
        "c": (1, 0, 0, 0),
    }
    outs = []
    for parts in (1, 4):
        got = (
            conv_time_stats(
                ray.data.from_arrow(t).repartition(parts),
                num_partitions=3)
            .to_pandas().sort_values("conv_id").reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got_map = {
        r["conv_id"]: (r["n_turns"], r["duration_us"], r["max_gap_us"],
                       r["n_ts_ooo"])
        for _, r in outs[0].iterrows()
    }
    assert got_map == want


def test_conv_pii_propagate_cross_turn(ray_session):
    """The conversation's lexicographically-first email is replaced in
    EVERY turn (cross-turn propagation); other emails are untouched;
    no-match conversations pass through with null literal; NULL text
    stays NULL; layout-invariant."""
    import ray.data

    from luzzu_ray.ops.transcripts import conv_pii_propagate

    t = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b", "c", "c"]),
        "turn_idx": pa.array([0, 1, 2, 0, 0, 1], pa.int32()),
        "text": pa.array([
            "hi, mail zz@x.com or aa@x.com",   # first match zz, min is aa
            "later aa@x.com again",
            None,
            "no pii here",
            "only bb@y.org once",
            "plain turn",
        ]),
    })
    # conv a: per-turn FIRST matches are zz@x.com (turn0), aa@x.com
    # (turn1); min literal = aa@x.com -> replaced in both turns where it
    # appears; zz@x.com survives.
    want = {
        ("a", 0): ("aa@x.com", "hi, mail zz@x.com or <EMAIL>"),
        ("a", 1): ("aa@x.com", "later <EMAIL> again"),
        ("a", 2): ("aa@x.com", None),
        ("b", 0): (None, "no pii here"),
        ("c", 0): ("bb@y.org", "only <EMAIL> once"),
        ("c", 1): ("bb@y.org", "plain turn"),
    }
    outs = []
    for parts in (1, 4):
        got = (
            conv_pii_propagate(
                ray.data.from_arrow(t).repartition(parts), num_partitions=2)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got_map = {
        (r["conv_id"], r["turn_idx"]):
            (r["pii_literal"], r["text_pii"])
        for _, r in outs[0].iterrows()
    }
    want_norm = {k: v for k, v in want.items()}
    for k, (lit, txt) in want_norm.items():
        glit, gtxt = got_map[k]
        assert (glit if glit is not None else None) == lit, k
        assert (gtxt if isinstance(gtxt, str) else None) == txt, k


def test_conv_lang_switches_twin(ray_session):
    """Engine lang-switch counts over a crafted corpus == a twin using
    the scalar langid on the same turns; layout-invariant."""
    import ray.data

    from luzzu_ray import models
    from luzzu_ray.ops.transcripts import conv_lang_switches

    texts = {
        "a": ["the quick brown fox jumps over the lazy dog today",
              "le renard brun rapide saute par dessus le chien",
              "the dog sleeps under the warm summer sun all day"],
        "b": ["der schnelle braune fuchs springt heute sehr hoch",
              "der hund schlaeft unter der warmen sommer sonne"],
    }
    rows = [(c, i, t) for c, ts in texts.items() for i, t in enumerate(ts)]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows]),
    })
    want = {}
    for c, ts in texts.items():
        langs = [models.langid_row(x)[0] for x in ts]
        want[c] = (len(ts), sum(1 for a, b in zip(langs, langs[1:])
                                if a != b))
    for parts in (1, 3):
        got = conv_lang_switches(
            ray.data.from_arrow(t).repartition(parts), num_partitions=2
        ).to_pandas()
        gm = {r["conv_id"]: (int(r["n_turns"]), int(r["n_switches"]))
              for _, r in got.iterrows()}
        assert gm == want, parts
