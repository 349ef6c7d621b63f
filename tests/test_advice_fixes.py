"""Regression tests for the round-3 ADVICE findings.

Each test pins one fixed failure mode:
- grouped regression: intercept reported in component form so no
  n^3-scale int64 product is ever materialized (medium);
- PageRank damping: 85x multiply guarded against silent int64 wrap;
- quality classifier: tokens longer than the power-table cap are
  scored, not fatal;
- auto_partitions: expanding=True forces the cluster-cap fallback and
  FlatMap is a hard stop for the metadata bound;
- _lines_block: NULL/empty text yields zero lines without caller
  pre-filtering;
- outer_hash_join: exchange width comes from the WALKED row-count
  bound, so filtered sides don't trigger the cluster-cap fallback.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_regr_component_form_survives_overflow_scale(ray_session, tmp_path):
    """A single group big enough that the old icept_num (= sy*den -
    slope_num*sx, ~n^3 * var(hod) * E[vq2]) exceeds int64 must now run
    clean and hash-match the DuckDB twin."""
    import duckdb

    import __ray_entry__ as E

    n = 40_000
    rng = np.random.default_rng(7)
    hod = rng.integers(0, 24, size=n)
    # ts chosen so (epoch_us // 3_600_000_000) % 24 == hod
    ts = (hod + 24 * rng.integers(0, 1000, size=n)) * 3_600_000_000
    value = rng.uniform(0, 10_000.0, size=n)
    t = pa.table({
        "event_type": pa.array(["click"] * n),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "value": pa.array(value, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    # the OLD formulation provably overflows at this size
    vq2 = np.floor(value * 100.0).astype(object)
    h = hod.astype(object)
    sy, sx = int(sum(vq2)), int(sum(h))
    sxx, sxy = int(sum(h * h)), int(sum(h * vq2))
    den = n * sxx - sx * sx
    slope_num = n * sxy - sx * sy
    assert abs(sy * den - slope_num * sx) >= 2**63  # old icept_num wraps

    got = pa.Table.from_pylist(
        E.q_events_value_hour_regr(str(tmp_path)).take_all()
    )
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute(E.oracle_sql()["events_value_hour_regr"]).arrow()
    g = {r["event_type"]: r for r in got.to_pylist()}
    w = {r["event_type"]: r for r in want.to_pylist()}
    assert g == w
    r = g["click"]
    assert (r["n"], r["sx"], r["sy"], r["slope_num"], r["den"]) == (
        n, sx, sy, slope_num, den)


def test_pagerank_damp_guard_matches_bigints():
    from luzzu_ray.ops.graph import _DAMP_SUM_MAX, PAGERANK_BASE, _damp_q

    # below the guard: plain vectorized path
    small = np.array([0, 1, 10**12, _DAMP_SUM_MAX], dtype=np.int64)
    got = _damp_q(small)
    want = np.array(
        [PAGERANK_BASE + (85 * int(s)) // 100 for s in small], dtype=np.int64
    )
    assert (got == want).all()
    # above the guard: 85 * s wraps int64; the bigint path must not
    big = np.array([_DAMP_SUM_MAX + 1, 2**62, 2**63 - 1], dtype=np.int64)
    with np.errstate(over="ignore"):
        wrapped = PAGERANK_BASE + (85 * big) // 100
    exact = np.array(
        [PAGERANK_BASE + (85 * int(s)) // 100 for s in big], dtype=np.int64
    )
    assert (wrapped != exact).any()  # the bug this guards against
    got_big = _damp_q(big)
    assert got_big.dtype == np.int64
    assert (got_big == exact).all()


def test_classifier_scores_arbitrarily_long_tokens():
    from luzzu_ray.ops.classifier import QualityClassifierStage, classify_row

    long_tok = "Q" * 700  # > the 256-byte initial pows table
    url = "https://example.com/" + "x" * 300
    texts = [
        "plain words here",
        long_tok,
        f"lead {long_tok} tail words",
        url + " trailing",
        "",
        None,
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    stage = QualityClassifierStage()
    out = stage(t)
    want = [classify_row(x) for x in texts]
    assert out["clf_score"].to_pylist() == [s for s, _ in want]
    assert out["clf_keep"].to_pylist() == [k for _, k in want]
    # table grew to cover the longest token and stays grown
    assert stage.max_len >= 700


def test_auto_partitions_expanding_contract(ray_session, tmp_path):
    import ray.data

    from luzzu_ray.ops.dedup import (
        _default_parts,
        auto_partitions,
        count_upper_bound_if_cheap,
    )

    p = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"x": pa.array(range(50), pa.int64())}), p
    )
    ds = ray.data.read_parquet(p)
    cap = _default_parts(None)
    # small read: data-sized width, NOT the cap
    assert auto_partitions(ds, None) == 4
    # declared expanding: the bound is skipped, cap wins
    assert auto_partitions(ds, None, expanding=True) == cap
    # explicit width always wins, even with the flag
    assert auto_partitions(ds, 7, expanding=True) == 7
    # FlatMap is a hard stop for the metadata bound
    fm = ds.flat_map(lambda row: [row, row])
    assert count_upper_bound_if_cheap(fm) is None
    assert auto_partitions(fm, None) == cap


def test_lines_block_empty_and_null_rows_yield_no_lines():
    from luzzu_ray.ops.lines import _lines_block

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c d e f g h i", "", None, "j k"], pa.string()),
    })
    lines, line_doc, line_idx = _lines_block(t, "text", "doc_id", 4)
    # doc 1 -> 3 lines of <=4 words, doc 4 -> 1 line; docs 2/3 -> none
    assert lines.to_pylist() == ["a b c d", "e f g h", "i", "j k"]
    assert line_doc.tolist() == [0, 0, 0, 3]
    assert line_idx.tolist() == [0, 1, 2, 0]
    # all-empty batch: zero lines, not one per row
    t2 = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["", None], pa.string()),
    })
    lines2, d2, i2 = _lines_block(t2, "text", "doc_id", 4)
    assert len(lines2) == 0 and len(d2) == 0 and len(i2) == 0


def test_outer_join_width_walks_filtered_sides(ray_session, tmp_path):
    """outer_hash_join must size its unioned exchange from the WALKED
    row-count bound: a read -> filter-map right side resolves to the
    parquet footer count instead of falling back to the cluster cap
    (which cost tpch_q13 ~128 partitions of fixed shuffle overhead on
    a 165k-row join)."""
    import ray.data

    from luzzu_ray.ops.dedup import count_upper_bound_if_cheap

    p = str(tmp_path / "r.parquet")
    pq.write_table(
        pa.table({"k": pa.array(range(200), pa.int64()),
                  "v": pa.array(range(200), pa.int64())}), p
    )
    filtered = ray.data.read_parquet(p).map_batches(
        lambda t: t.filter(pa.compute.greater(t["v"], 100)),
        batch_format="pyarrow",
    )
    # the walked bound survives the filter map (over-counts, never None)
    assert count_upper_bound_if_cheap(filtered) == 200

    from luzzu_ray.ops.relational import outer_hash_join

    left = ray.data.read_parquet(p)
    out = outer_hash_join(
        left, filtered, left_key="k", right_key="k",
        left_cols=[], right_cols=["v"], how="left",
    ).materialize()
    # correctness unchanged: every left row survives; matches carry v
    rows = out.take_all()
    assert len(rows) == 200
    n_matched = sum(r["v"] is not None for r in rows)
    assert n_matched == 99  # v in 101..199
    # the exchange was data-sized: a 400-row join never needs the cap
    assert out.num_blocks() <= 8


def test_decayed_value_empty_input_returns_empty_schema(ray_session):
    """ADVICE r05: decayed_user_value on an EMPTY events dataset
    returns the typed empty (user_id, decayed_q2, n_recent) table
    instead of crashing on Dataset.max(...) -> None."""
    import ray.data

    from luzzu_ray.ops.events import decayed_user_value

    empty = ray.data.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    }))
    out = decayed_user_value(empty)
    t = pa.Table.from_pylist(out.take_all(), schema=pa.schema([
        ("user_id", pa.int64()), ("decayed_q2", pa.int64()),
        ("n_recent", pa.int64())]))
    assert t.num_rows == 0
    assert set(out.schema().names) == {"user_id", "decayed_q2", "n_recent"}


def test_review_r05_edge_input_fixes(ray_session):
    """Round-5 inline-review pins: (a) winnow pair dedup survives a
    doc's fp rows split across blocks (no self-pairs, no inflated
    n_shared); (b) sq8 LSH on an empty dataset returns no pairs
    instead of crashing; (c) rdf_conciseness excludes malformed rows
    and counts each triple once; (d) event_type_bigrams tolerates
    NULL event_type with SQL lead() semantics; (e) borda_rank_fusion
    and (f) canned_phrase_stats degrade to typed empties on empty
    input / empty phrase list."""
    import ray.data

    from luzzu_ray.ops.dedup import winnow_candidate_pairs
    from luzzu_ray.ops.events import event_type_bigrams
    from luzzu_ray.ops.rdf import parse_ntriples_batch, rdf_conciseness
    from luzzu_ray.ops.relational import borda_rank_fusion
    from luzzu_ray.ops.similarity import lsh_neardup_pairs
    from luzzu_ray.ops.transcripts import canned_phrase_stats

    # (a) one doc's (fp, doc) rows deliberately split across blocks
    fps = pa.table({
        "doc_id": pa.array([1, 1, 2, 2], pa.int64()),
        "pos": pa.array([0, 9, 0, 3], pa.int64()),
        "fp": pa.array([42, 42, 42, 77], pa.int64()),
    })
    got = pa.Table.from_pylist(winnow_candidate_pairs(
        ray.data.from_arrow(fps).repartition(4),
        min_shared=1).take_all())
    pairs = {(a, b): n for a, b, n in zip(
        got["a"].to_pylist(), got["b"].to_pylist(),
        got["n_shared"].to_pylist())}
    assert pairs == {(1, 2): 1}

    # (b) empty input through the compressed path
    empty_emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    out = lsh_neardup_pairs(empty_emb, payload="sq8")
    assert out.count() == 0

    # (c) malformed rows are not triples; duplicates counted once
    parsed = parse_ntriples_batch(pa.table({"line": pa.array([
        '<http://e/a> <http://e/p> "v" .',
        '<http://e/a> <http://e/p> "v" .',
        "garbage", "more garbage",
        '<http://e/a> <http://e/q> <http://e/b> .',
    ])}))
    c = rdf_conciseness(ray.data.from_arrow(parsed).repartition(2))
    assert c.to_pydict() == {
        "n_triples": [3], "n_distinct": [2], "n_dup": [1]}

    # (d) NULL event_type: transitions touching NULL drop, sequence
    # positions are preserved (lead semantics)
    ev = pa.table({
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([10, 20, 30], pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(["a", None, "b"], pa.string()),
    })
    bg = pa.Table.from_pylist(event_type_bigrams(
        ray.data.from_arrow(ev), k=5).take_all())
    assert bg.num_rows == 0  # a>NULL and NULL>b both drop; no a>b

    # (e) empty input -> typed empty fusion result
    be = borda_rank_fusion(ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "s": pa.array([], pa.int64())})), "doc_id", ["s"], 5)
    assert be.num_rows == 0
    assert be.schema.names == ["doc_id", "rnk_s", "borda"]

    # (f) empty phrase list -> zero canned counts, no crash
    cv = pa.table({
        "conv_id": pa.array(["c"], pa.string()),
        "role": pa.array(["assistant"], pa.string()),
        "text": pa.array(["hello"], pa.string()),
    })
    cs = pa.Table.from_pylist(canned_phrase_stats(
        ray.data.from_arrow(cv), []).take_all())
    assert cs.to_pylist() == [
        {"conv_id": "c", "n_role_turns": 1, "n_canned": 0}]
