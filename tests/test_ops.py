"""Value tests for the extended operators (dedup / similarity / text
stats) against brute-force pure-Python twins — the rows-only queries'
correctness gate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs_table():
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while birds sing in the morning light and wind moves the tall grass"
    )
    variant = base.replace("morning", "evening")  # near-dup of base
    other = (
        "completely different content about database engines columnar "
        "storage vectorized execution and distributed shuffle strategies"
    )
    rows = [
        (0, base),
        (1, base),                      # exact dup of 0
        (2, variant),                   # near dup of 0
        (3, other),
        (4, "tiny"),                    # too short for shingles
        (5, other + " with a small suffix appended here"),  # near dup of 3
    ]
    return pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows])}
    )


def _shingle_set(text: str, k: int = 3):
    import re

    from luzzu_ray import constants as C
    from luzzu_ray.functions.text import token_hash_py

    toks = [token_hash_py(t.encode()) for t in re.findall(C.TOKEN_PATTERN, text)]
    out = set()
    for i in range(len(toks) - k + 1):
        h = 0
        for j in range(k):
            h = (h * 1099511628211 + toks[i + j]) & 0xFFFFFFFFFFFFFFFF
        out.add(h)
    return out


def test_exact_duplicates(ray_session):
    import ray.data

    from luzzu_ray.ops.dedup import exact_duplicates

    ds = ray.data.from_arrow(_docs_table())
    res = {r["doc_id"]: r["is_dup"] for r in exact_duplicates(ds, 4).take_all()}
    assert res == {0: False, 1: True, 2: False, 3: False, 4: False, 5: False}


def test_minhash_dedup_finds_near_dups(ray_session):
    import ray.data

    from luzzu_ray.ops.dedup import minhash_dedup

    ds = ray.data.from_arrow(_docs_table())
    res = minhash_dedup(ds, jaccard_threshold=0.5).to_pylist()
    clusters = {r["doc_id"]: r["cluster"] for r in res}
    # 0,1 exact dups; 2 near-dup of 0 -> one cluster rooted at 0
    assert clusters.get(1) == 0 and clusters.get(2) == 0
    # 4 (no shingles) and 3/5 pair allowed but 3 must root its own cluster
    assert clusters.get(3, 3) == 3
    assert 4 not in clusters


def test_ngram_jaccard_matches_bruteforce(ray_session):
    import ray.data

    from luzzu_ray.ops.dedup import ngram_jaccard_pairs

    t = _docs_table()
    ds = ray.data.from_arrow(t)
    got = {
        (r["a"], r["b"]): r["jaccard_q6"]
        for r in ngram_jaccard_pairs(ds, jaccard_threshold=0.3).take_all()
    }
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    for (a, b), jq6 in got.items():
        sa, sb = _shingle_set(texts[a]), _shingle_set(texts[b])
        want = int(len(sa & sb) / len(sa | sb) * 1e6)
        assert jq6 == want, (a, b)
    assert (0, 1) in got and got[(0, 1)] == 1_000_000  # exact dup pair
    assert (0, 2) in got  # near-dup pair survives verification


def test_simhash_identical_docs_cluster(ray_session):
    import ray.data

    from luzzu_ray.ops.dedup import simhash_dedup, simhash_signatures

    ds = ray.data.from_arrow(_docs_table())
    res = {r["doc_id"]: r["cluster"] for r in simhash_dedup(ds, 4).to_pylist()}
    assert res.get(1) == 0  # identical text -> hamming 0
    sig, has = simhash_signatures(_docs_table())
    assert has.all() or not has[4]  # "tiny" has one token -> still has sig
    assert sig[0] == sig[1]


def test_ann_topk_matches_bruteforce(ray_session):
    import ray.data

    from luzzu_ray.ops.similarity import ann_topk

    rng = np.random.default_rng(5)
    E = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(E.reshape(-1)), 16
            ).cast(pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    qids = [0, 7]
    Q = E[qids].astype(np.float64)
    got = ann_topk(ds, Q, qids, k=5).to_pylist()
    En = E.astype(np.float64)
    En = En / np.linalg.norm(En, axis=1, keepdims=True)
    for qi, qv in zip(qids, Q):
        qn = qv / np.linalg.norm(qv)
        sims = En @ qn
        order = np.lexsort((np.arange(len(sims)), -sims))[:5]
        want = list(order)
        mine = [r["vec_id"] for r in sorted(
            (r for r in got if r["query_id"] == qi), key=lambda r: r["rank"]
        )]
        assert mine == want, qi


def test_lsh_ann_self_hit(ray_session):
    import ray.data

    from luzzu_ray.ops.similarity import lsh_ann_topk

    rng = np.random.default_rng(6)
    E = rng.standard_normal((300, 32)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(E.reshape(-1)), 32
            ).cast(pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    got = lsh_ann_topk(ds, E[[3]].astype(np.float64), [3], k=3, dim=32).to_pylist()
    top1 = [r for r in got if r["rank"] == 1]
    assert top1 and top1[0]["vec_id"] == 3  # the query itself survives bucketing


def test_fingerprint_parity():
    from luzzu_ray.ops.textstats import fingerprint_batch, fingerprint_py

    texts = ["", "one", "hello world hello world", "a-b c_d e.f",
             "tüv naïve élève", "x " * 300]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    got = fingerprint_batch(t)["fingerprint"].to_pylist()
    assert got == [fingerprint_py(x) for x in texts]


def test_lexical_stats_parity():
    from luzzu_ray.ops.textstats import lexical_stats_batch, lexical_stats_py

    texts = ["the quick brown fox", "a1b2  c3!", "", None, "  \t\n",
             "don't stop, believing!!", "The THE the tHe",
             "héllo wörld €5", "\x0btab\x0b v", "a-b_c.d",
             "12 34 5, and the end.", "it is in of to -- THE A An"]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = lexical_stats_batch(t).to_pylist()
    for row, txt in zip(out, texts):
        want = lexical_stats_py(txt)
        assert {k: row[k] for k in want} == want, repr(txt)


def test_sessionize(ray_session):
    import ray.data

    from luzzu_ray.ops.events import sessionize

    us = 1_000_000
    rows = [
        # user 1: two sessions (gap 31 min), 3 events
        (1, 0 * us, 10), (1, 60 * us * 60, 11),  # wait: compute below
    ]
    ts = [0, 10 * 60 * us, 50 * 60 * us]  # 0, +10min, +40min gap -> 2 sessions
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(ts + [0], pa.timestamp("us")),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    res = {r["user_id"]: (r["n_events"], r["n_sessions"])
           for r in sessionize(ray.data.from_arrow(t), 4).take_all()}
    assert res == {1: (3, 2), 2: (1, 1)}


def test_popcount_u64():
    from luzzu_ray.ops.dedup import popcount_u64

    rng = np.random.default_rng(11)
    x = rng.integers(0, 2**63, size=(7, 5), dtype=np.uint64) * 2 + 1
    want = np.vectorize(lambda v: bin(int(v)).count("1"))(x)
    assert (popcount_u64(x) == want).all()
    assert (popcount_u64(np.array([0, 1, 2**63], dtype=np.uint64))
            == np.array([0, 1, 1])).all()


def test_content_key_collision_free_and_exact(ray_session):
    """content_key_batch distinguishes permuted/shifted byte patterns the
    old positional-weight scheme could alias, and exact_duplicates stays
    exact while shuffling only (doc_id, k1, k2)."""
    import pyarrow as pa

    from luzzu_ray.ops.dedup import content_key_batch

    texts = ["ab", "ba", "a" * 300 + "b", "b" + "a" * 300, "", " ", "x"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    keys = content_key_batch(t)
    seen = set(zip(keys["k1"].to_pylist(), keys["k2"].to_pylist()))
    assert len(seen) == len(texts)
    # identical text -> identical key regardless of batch split
    t2 = pa.table({"doc_id": pa.array([9], pa.int64()),
                   "text": pa.array(["ab"])})
    k2 = content_key_batch(t2)
    assert (k2["k1"][0].as_py(), k2["k2"][0].as_py()) == (
        keys["k1"][0].as_py(), keys["k2"][0].as_py())


def _pairs_ds(edges):
    import ray.data

    return ray.data.from_arrow(pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())}
    ))


def test_star_contraction_matches_union_find(ray_session):
    """Distributed star contraction == driver union-find on a graph with
    >= 1000 components of mixed shapes (chains, cliques, stars)."""
    from luzzu_ray.ops.dedup import (
        _union_find_clusters, star_contraction,
    )

    rng = np.random.default_rng(7)
    edges = []
    base = 0
    for c in range(1200):
        size = int(rng.integers(2, 7))
        nodes = list(range(base, base + size))
        shape = c % 3
        if shape == 0:  # chain
            edges += [(nodes[i], nodes[i + 1]) for i in range(size - 1)]
        elif shape == 1:  # star from the LARGEST id (worst case for min)
            edges += [(nodes[-1], v) for v in nodes[:-1]]
        else:  # clique-ish
            edges += [(nodes[i], nodes[j]) for i in range(size)
                      for j in range(i + 1, size)]
        base += size
    rng.shuffle(edges)
    want = _union_find_clusters(pa.table(
        {"a": pa.array([min(e) for e in edges], pa.int64()),
         "b": pa.array([max(e) for e in edges], pa.int64())}
    ))
    got_rows = star_contraction(_pairs_ds(edges), num_partitions=8).take_all()
    got = {r["doc_id"]: r["cluster"] for r in got_rows}
    assert got == want
    assert len({v for v in got.values()}) == 1200


def test_cluster_pairs_auto_routes(ray_session):
    from luzzu_ray.ops.dedup import cluster_pairs

    edges = [(0, 1), (1, 2), (5, 6)]
    small = cluster_pairs(_pairs_ds(edges))  # driver path -> pa.Table
    assert isinstance(small, pa.Table)
    forced = cluster_pairs(_pairs_ds(edges), driver_max=0)  # distributed
    got = {r["doc_id"]: r["cluster"] for r in forced.take_all()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_oversized_bucket_salt_split(ray_session):
    """A degenerate bucket (1000 identical docs) completes fast and still
    clusters everything into one component (other bands recover pairs
    split by the per-band salts)."""
    import time

    import ray.data

    from luzzu_ray.ops.dedup import minhash_dedup

    text = ("identical content repeated across many documents to force "
            "every row into the same lsh bucket in every band")
    n = 1000
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array([text] * n)})
    t0 = time.monotonic()
    res = minhash_dedup(
        ray.data.from_arrow(t), jaccard_threshold=0.9,
    )
    rows = res.to_pylist() if isinstance(res, pa.Table) else res.take_all()
    took = time.monotonic() - t0
    clusters = {r["doc_id"]: r["cluster"] for r in rows}
    assert len(clusters) == n
    assert set(clusters.values()) == {0}
    assert took < 120, took  # the old per-bucket Python loop would blow up


def test_jaccard_verify_join_path_matches_broadcast(ray_session):
    """The join-based fallback (broadcast_max=0) must produce exactly the
    broadcast map-join path's verified pairs."""
    import ray.data

    from luzzu_ray.ops.dedup import (
        exact_jaccard_pairs, minhash_candidate_pairs,
    )

    ds = ray.data.from_arrow(_docs_table())
    cand = minhash_candidate_pairs(
        ds, sim_threshold=0.0, n_bands=32, band_r=2
    ).materialize()
    want = sorted(
        (r["a"], r["b"], r["jaccard_q6"])
        for r in exact_jaccard_pairs(ds, cand, 0.5).take_all()
    )
    got = sorted(
        (r["a"], r["b"], r["jaccard_q6"])
        for r in exact_jaccard_pairs(ds, cand, 0.5, broadcast_max=0).take_all()
    )
    assert got == want and len(want) >= 3


def test_embedding_neardup_tiled_matches_bruteforce(ray_session):
    import ray.data

    from luzzu_ray.ops.similarity import embedding_neardup_pairs

    rng = np.random.default_rng(13)
    E = rng.standard_normal((150, 16)).astype(np.float32)
    E[7] = E[3] + 0.01 * rng.standard_normal(16)  # planted near-dup
    E[42] = 0.0  # zero vector must not produce NaN pairs
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(150, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(E.reshape(-1)), 16
            ).cast(pa.list_(pa.float32())),
        }
    )
    got = sorted(
        (r["a"], r["b"])
        for r in embedding_neardup_pairs(
            ray.data.from_arrow(t), threshold=0.4, num_tiles=4
        ).take_all()
    )
    En = E.astype(np.float64)
    norms = np.linalg.norm(En, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    En = En / norms
    sims = En @ En.T
    want = sorted(
        (i, j) for i in range(150) for j in range(i + 1, 150)
        if sims[i, j] >= 0.4
    )
    assert got == want
    assert (3, 7) in got
    assert not any(42 in p for p in got)


def test_asof_prior_event(ray_session):
    import datetime as dt

    import ray.data

    from luzzu_ray.ops.events import asof_prior_event

    T0 = dt.datetime(2024, 1, 1)
    us = dt.timedelta(microseconds=1)

    def row(eid, t_us, uid, typ):
        return {"event_id": eid, "ts": T0 + t_us * us, "user_id": uid,
                "event_type": typ}

    rows = [
        row(0, 100, 1, "click"),
        row(1, 200, 1, "purchase"),   # prior click at 100
        row(2, 200, 2, "purchase"),   # user 2 has no click -> null
        row(3, 300, 1, "click"),
        row(4, 300, 1, "purchase"),   # simultaneous click counts (>=)
        row(5, 50, 2, "view"),        # other types ignored
    ]
    t = pa.Table.from_pylist(rows).set_column(
        1, "ts", pa.Table.from_pylist(rows)["ts"].cast(pa.timestamp("us"))
    )
    got = {r["event_id"]: (r["prior_ts"], r["wait_us"])
           for r in asof_prior_event(ray.data.from_arrow(t),
                                     num_partitions=4).take_all()}
    assert set(got) == {1, 2, 4}
    assert got[1][1] == 100
    assert got[2] == (None, None)
    assert got[4][1] == 0  # simultaneous click matched


def test_grouped_quantiles_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import grouped_quantiles_q

    rng = np.random.default_rng(31)
    n = 5000
    t = pa.table(
        {"user_id": pa.array(rng.integers(0, 37, n), type=pa.int64()),
         "value": pa.array(np.round(rng.uniform(0, 100, n), 2))}
    )
    got = {
        r["user_id"]: (r["median_q4"], r["p90_q4"], r["n"])
        for r in grouped_quantiles_q(
            ray.data.from_arrow(t), "user_id", "value", num_partitions=8
        ).take_all()
    }
    want_rows = duckdb.arrow(t).query(
        "t",
        "SELECT user_id, "
        "quantile_disc(CAST(floor(value*10000.0) AS BIGINT), 0.5) AS m, "
        "quantile_disc(CAST(floor(value*10000.0) AS BIGINT), 0.9) AS p, "
        "CAST(count(*) AS BIGINT) AS n FROM t GROUP BY user_id",
    ).fetchall()
    want = {u: (m, p, c) for u, m, p, c in want_rows}
    assert got == want


def test_bottom_k_by_hash_layout_invariant(ray_session):
    import ray.data

    from luzzu_ray.ops.relational import bottom_k_by_hash

    t = pa.table(
        {"doc_id": pa.array(np.arange(1000, dtype=np.int64)),
         "lang": pa.array(["en"] * 1000)}
    )
    a = bottom_k_by_hash(ray.data.from_arrow(t), "doc_id", 25, ["lang"],
                         6364136223846793005, 1442695040888963407)
    b = bottom_k_by_hash(
        ray.data.from_arrow(t).repartition(13), "doc_id", 25, ["lang"],
        6364136223846793005, 1442695040888963407,
    )
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert len(a) == 25


def test_ivf_ann_self_hit_and_kmeans_recall(ray_session):
    import ray.data

    from luzzu_ray.ops.similarity import (
        ann_topk, ivf_ann_topk, kmeans_centroids,
    )

    rng = np.random.default_rng(17)
    # clustered data so kmeans cells are meaningful
    centers = rng.standard_normal((5, 32)) * 4
    E = np.concatenate(
        [centers[i] + rng.standard_normal((80, 32)) for i in range(5)]
    ).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(E), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(E.reshape(-1)), 32
            ).cast(pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    Q = E[[3, 200]].astype(np.float64)
    got = ivf_ann_topk(ds, Q, [3, 200], k=3, dim=32).to_pylist()
    top1 = {r["query_id"]: r["vec_id"] for r in got if r["rank"] == 1}
    assert top1 == {3: 3, 200: 200}  # queries survive cell probing

    # kmeans-adapted cells: recall@5 vs exact on clustered data
    km = kmeans_centroids(E[rng.choice(len(E), 200, replace=False)], k=8)
    approx = ivf_ann_topk(ds, Q, [3, 200], k=5, dim=32, n_probe=2,
                          centroids=km).to_pylist()
    exact = ann_topk(ds, Q, [3, 200], k=5).to_pylist()
    for qid in (3, 200):
        a = {r["vec_id"] for r in approx if r["query_id"] == qid}
        e = {r["vec_id"] for r in exact if r["query_id"] == qid}
        assert len(a & e) >= 4, (qid, a, e)  # recall >= 0.8 on easy data


def test_asof_no_right_rows(ray_session):
    """A block containing purchases but ZERO clicks must emit all-null
    matches, not crash (empty right side)."""
    import datetime as dt

    import ray.data

    from luzzu_ray.ops.events import asof_prior_event

    T0 = dt.datetime(2024, 1, 1)
    rows = [
        {"event_id": i, "ts": T0 + dt.timedelta(seconds=i), "user_id": i % 3,
         "event_type": "purchase"}
        for i in range(6)
    ]
    t = pa.Table.from_pylist(rows).set_column(
        1, "ts", pa.Table.from_pylist(rows)["ts"].cast(pa.timestamp("us"))
    )
    got = asof_prior_event(ray.data.from_arrow(t), num_partitions=4).take_all()
    assert len(got) == 6
    assert all(r["prior_ts"] is None and r["wait_us"] is None for r in got)


def test_approx_quantiles_sketch(ray_session):
    """Log-binned histogram sketch: relative error <= ~eps vs the exact
    per-group quantiles, and block-layout invariant."""
    import ray.data

    from luzzu_ray.ops.sketch import approx_quantiles

    rng = np.random.default_rng(41)
    n = 20000
    t = pa.table(
        {"user_id": pa.array(rng.integers(0, 11, n), type=pa.int64()),
         "value": pa.array(np.exp(rng.normal(3, 1.5, n)))}  # skewed
    )
    got = {
        r["user_id"]: (r["median_approx"], r["p90_approx"], r["n"])
        for r in approx_quantiles(
            ray.data.from_arrow(t), "user_id", "value", eps=0.01,
            num_partitions=8,
        ).take_all()
    }
    uid = t["user_id"].to_numpy()
    val = t["value"].to_numpy()
    for u in np.unique(uid):
        vs = np.sort(val[uid == u])
        for got_v, frac in ((got[u][0], 0.5), (got[u][1], 0.9)):
            exact = vs[max(0, int(np.ceil(frac * len(vs))) - 1)]
            assert abs(got_v - exact) / exact < 0.02, (u, frac, got_v, exact)
        assert got[u][2] == len(vs)

    # layout invariance: different block structure, identical sketch
    again = {
        r["user_id"]: (r["median_approx"], r["p90_approx"], r["n"])
        for r in approx_quantiles(
            ray.data.from_arrow(t).repartition(17), "user_id", "value",
            eps=0.01, num_partitions=8,
        ).take_all()
    }
    assert again == got


def test_salt_subgroups_and_tiling_unit():
    """Direct unit coverage of the oversized-bucket machinery: the
    salt-split actually splits above the cap (deterministically, with
    band-dependent assignment) and tiled pair emission equals the naive
    upper triangle even with a tiny tile budget."""
    from luzzu_ray.ops.dedup import (
        _BAND_SALT, _pairs_from_tiles, _salt_subgroups,
    )

    docs = np.arange(100, dtype=np.int64)
    subs0 = [m for m in _salt_subgroups(docs, _BAND_SALT[0], 16)]
    assert sum(len(m) for m in subs0) <= 100  # singletons skipped
    assert all(len(m) <= 2 * 16 for m in subs0)  # hash split ~ balanced
    assert len(subs0) >= 4
    subs1 = [m for m in _salt_subgroups(docs, _BAND_SALT[1], 16)]
    # a different band salt splits differently (recovers cross pairs)
    assert [m.tolist() for m in subs0] != [m.tolist() for m in subs1]
    below = [m for m in _salt_subgroups(docs, _BAND_SALT[0], 128)]
    assert len(below) == 1 and len(below[0]) == 100  # under cap: no split

    d = np.array([7, 3, 9, 1, 5], dtype=np.int64)
    res = _pairs_from_tiles(
        d, lambda i0, i1: np.ones((i1 - i0, len(d))), lambda x: x > 0,
        tile_elems=7,  # forces many tiny tiles
    )
    got = sorted(zip(res[0].tolist(), res[1].tolist()))
    want = sorted(
        (min(d[i], d[j]), max(d[i], d[j]))
        for i in range(5) for j in range(i + 1, 5)
    )
    assert got == want


def test_oversized_bucket_actually_splits(ray_session):
    """End-to-end salt-split: 200 identical docs with bucket_cap=32
    force >= 7 subgroups per band, and the cluster still connects into
    one component through the per-band salts."""
    import ray.data

    from luzzu_ray.ops.dedup import (
        cluster_pairs, exact_jaccard_pairs, minhash_candidate_pairs,
    )

    text = ("identical content repeated to force a single giant bucket "
            "for the salt splitting machinery to carve up")
    n = 200
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array([text] * n)})
    ds = ray.data.from_arrow(t)
    cand = minhash_candidate_pairs(
        ds, sim_threshold=0.0, n_bands=32, band_r=2, bucket_cap=32,
    ).materialize()
    n_pairs = cand.count()
    assert 0 < n_pairs < n * (n - 1) // 2 * 32  # split bounded the blowup
    verified = exact_jaccard_pairs(ds, cand, 0.9)
    labels = cluster_pairs(verified)
    rows = labels.to_pylist() if isinstance(labels, pa.Table) else labels.take_all()
    clusters = {r["doc_id"]: r["cluster"] for r in rows}
    assert len(clusters) == n and set(clusters.values()) == {0}


def test_exact_dedup_null_vs_empty(ray_session):
    """NULL text and empty-string text are DIFFERENT content groups
    (matching SQL window partitioning, where NULLs group together but
    apart from '')."""
    import ray.data

    from luzzu_ray.ops.dedup import exact_duplicates

    t = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
         "text": pa.array(["", None, "", None], pa.string())}
    )
    res = {r["doc_id"]: r["is_dup"]
           for r in exact_duplicates(ray.data.from_arrow(t), 4).take_all()}
    assert res == {0: False, 1: False, 2: True, 3: True}


def test_exact_dedup_null_vs_empty_mixed_batch(ray_session):
    """Same NULL != '' semantics when the batch ALSO contains non-empty
    text (a regression: the null-key XOR used to be erased by the
    polynomial overwrite whenever any batch row had text bytes), and
    null keys must not depend on block layout."""
    import ray.data

    from luzzu_ray.ops.dedup import content_key_batch, exact_duplicates

    t = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
         "text": pa.array(["", None, "x", "", None, "x"], pa.string())}
    )
    res = {r["doc_id"]: r["is_dup"]
           for r in exact_duplicates(ray.data.from_arrow(t), 4).take_all()}
    assert res == {0: False, 1: False, 2: False, 3: True, 4: True, 5: True}
    # layout invariance: a null row keys identically in an all-empty
    # batch and in a batch mixed with non-empty text
    mixed = content_key_batch(t)
    solo = content_key_batch(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([None], pa.string())})
    )
    assert mixed["k1"][1].as_py() == solo["k1"][0].as_py()
    assert mixed["k2"][1].as_py() == solo["k2"][0].as_py()
    # and NULL != '' within the mixed batch
    assert (mixed["k1"][0].as_py(), mixed["k2"][0].as_py()) != (
        mixed["k1"][1].as_py(), mixed["k2"][1].as_py())


def test_sessionize_salted_equals_unsalted(ray_session):
    """The salted (time-chunked + boundary-merge) sessionization equals
    the one-pass result on random data, including sessions that span
    multiple chunk boundaries."""
    import ray.data

    from luzzu_ray.ops.events import sessionize, sessionize_salted

    rng = np.random.default_rng(47)
    n = 4000
    us = 1_000_000
    # inter-event gaps: mostly minutes, some >30min, some hours
    gaps = rng.choice(
        [60 * us, 10 * 60 * us, 29 * 60 * us, 31 * 60 * us, 3 * 3600 * us],
        size=n, p=[0.4, 0.3, 0.1, 0.1, 0.1],
    )
    uid = rng.integers(0, 25, n)
    ts = np.zeros(n, dtype=np.int64)
    last: dict[int, int] = {}
    for i in range(n):
        last[uid[i]] = last.get(uid[i], 0) + int(gaps[i])
        ts[i] = last[uid[i]]
    t = pa.table(
        {"user_id": pa.array(uid, type=pa.int64()),
         "ts": pa.array(ts, pa.timestamp("us")),
         "event_id": pa.array(np.arange(n, dtype=np.int64))}
    )
    base = {r["user_id"]: (r["n_events"], r["n_sessions"])
            for r in sessionize(ray.data.from_arrow(t), 8).take_all()}
    # 1-hour chunks force many boundary merges
    salted = {r["user_id"]: (r["n_events"], r["n_sessions"])
              for r in sessionize_salted(
                  ray.data.from_arrow(t), num_partitions=8,
                  chunk_span_us=3_600_000_000,
              ).take_all()}
    assert salted == base


def test_pairwise_intersect_counts_matches_per_pair():
    """The batched lexsort-adjacency intersection kernel equals a
    per-pair np.intersect1d reference on random packed buffers."""
    from luzzu_ray.ops.dedup import _pairwise_intersect_counts

    rng = np.random.default_rng(321)
    bufs_a, bufs_b, expect = [], [], []
    for _ in range(200):
        na, nb = rng.integers(0, 40, 2)
        va = np.unique(rng.integers(0, 60, na).astype(np.uint64))
        vb = np.unique(rng.integers(0, 60, nb).astype(np.uint64))
        bufs_a.append(np.sort(va).astype("<u8").tobytes())
        bufs_b.append(np.sort(vb).astype("<u8").tobytes())
        expect.append(len(np.intersect1d(va, vb, assume_unique=True)))
    inter, na_out, nb_out = _pairwise_intersect_counts(
        bufs_a, bufs_b, len(bufs_a)
    )
    assert inter.tolist() == expect
    assert na_out.tolist() == [len(x) // 8 for x in bufs_a]
    # empty batch edge
    i0, a0, b0 = _pairwise_intersect_counts([b"", b""], [b"", b""], 2)
    assert i0.tolist() == [0, 0]


def test_asof_salted_equals_unsalted(ray_session):
    """asof_prior_event_salted == asof_prior_event row-for-row on random
    data, including lefts whose prior right is many chunks back, lefts
    with no prior at all, and simultaneous (tied) timestamps."""
    import ray.data

    from luzzu_ray.ops.events import asof_prior_event, asof_prior_event_salted

    rng = np.random.default_rng(99)
    n = 6000
    us = 1_000_000
    uid = rng.integers(0, 30, n)
    # ts spread over ~20 days so 6h chunks give many boundaries; ties
    # forced by quantizing to whole minutes
    ts = rng.integers(0, 20 * 24 * 3600, n) * us
    ts = (ts // (60 * us)) * (60 * us) + 1_700_000_000_000_000
    et = rng.choice(["purchase", "click", "view"], n, p=[0.3, 0.4, 0.3])
    t = pa.table(
        {"event_id": pa.array(np.arange(n, dtype=np.int64)),
         "user_id": pa.array(uid, pa.int64()),
         "ts": pa.array(ts, pa.timestamp("us")),
         "event_type": pa.array(et)}
    )

    def norm(rows):
        return sorted(
            (r["event_id"], r["user_id"], r["prior_ts"], r["wait_us"])
            for r in rows
        )

    base = norm(asof_prior_event(ray.data.from_arrow(t), num_partitions=8).take_all())
    salted = norm(
        asof_prior_event_salted(
            ray.data.from_arrow(t), num_partitions=8,
            chunk_span_us=6 * 3_600_000_000,
        ).take_all()
    )
    assert salted == base
    assert any(r[2] is None for r in base)  # nulls exercised
    # a tiny chunk span forces nearly every prior across a boundary
    tiny = norm(
        asof_prior_event_salted(
            ray.data.from_arrow(t), num_partitions=8,
            chunk_span_us=30 * 60 * 1_000_000,
        ).take_all()
    )
    assert tiny == base


def test_rolling_user_window_matches_bruteforce(ray_session):
    """Per-user ordered row-window sums equal a brute-force per-row
    twin, across block layouts."""
    import ray.data

    from luzzu_ray.ops.events import rolling_user_window

    rng = np.random.default_rng(31)
    n = 2000
    uid = rng.integers(0, 20, n)
    ts = rng.integers(0, 10**6, n) * 1_000_000
    val = rng.random(n)
    t = pa.table(
        {"event_id": pa.array(np.arange(n, dtype=np.int64)),
         "user_id": pa.array(uid, pa.int64()),
         "ts": pa.array(ts, pa.timestamp("us")),
         "value": pa.array(val, pa.float64())}
    )
    W = 3
    got = {r["event_id"]: (r["wsum_q4"], r["wn"]) for r in
           rolling_user_window(ray.data.from_arrow(t), W, 8).take_all()}
    # brute force
    vq4 = np.floor(val * 10_000.0).astype(np.int64)
    order = np.lexsort((np.arange(n), ts, uid))
    want = {}
    hist: dict[int, list[int]] = {}
    for i in order:
        u = uid[i]
        hist.setdefault(u, []).append(vq4[i])
        tail = hist[u][-W:]
        want[i] = (sum(tail), len(tail))
    assert got == want
    # layout invariance: 2 partitions == 8
    got2 = {r["event_id"]: (r["wsum_q4"], r["wn"]) for r in
            rolling_user_window(ray.data.from_arrow(t), W, 2).take_all()}
    assert got2 == want


def test_stratified_bottom_k_layout_invariant(ray_session):
    """Per-group bottom-k: exactly k per (sufficiently large) group,
    identical across block layouts, and equal to a per-group sort twin."""
    import ray.data

    from luzzu_ray.ops.relational import stratified_bottom_k

    rng = np.random.default_rng(33)
    n = 3000
    langs = rng.choice(["en", "de", "fr", "zz"], n, p=[0.6, 0.2, 0.15, 0.05])
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table(
        {"doc_id": pa.array(ids), "lang": pa.array(langs)}
    )
    A, B = 0x9E3779B97F4A7C15, 0x1234567
    got = sorted(
        (r["lang"], r["doc_id"]) for r in stratified_bottom_k(
            ray.data.from_arrow(t), "lang", "doc_id", 7, A, B,
        ).take_all()
    )
    # twin: per group, sort by (hash, id), first 7
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * np.uint64(A) + np.uint64(B)
    want = []
    for lang in np.unique(langs):
        m = langs == lang
        order = np.lexsort((ids[m], h[m]))[:7]
        want.extend((lang, int(d)) for d in ids[m][order])
    assert got == sorted(want)
    got2 = sorted(
        (r["lang"], r["doc_id"]) for r in stratified_bottom_k(
            ray.data.from_arrow(t).repartition(13), "lang", "doc_id", 7, A, B,
        ).take_all()
    )
    assert got2 == got


def test_top_fraction_by_score_exact(ray_session):
    """Global top-P% selection equals the sort-everything twin,
    including a tie-heavy score distribution, across block layouts."""
    import ray.data

    from luzzu_ray.ops.relational import top_fraction_by_score

    rng = np.random.default_rng(41)
    n = 5000
    ids = rng.permutation(n).astype(np.int64)
    # tie-heavy: only 9 distinct scores, so the threshold lands mid-tie
    score = rng.integers(0, 9, n).astype(np.int64) * 1000
    t = pa.table({"doc_id": pa.array(ids), "score_q6": pa.array(score)})

    for numer, denom in [(1, 10), (1, 3), (9, 10)]:
        got = sorted(
            (r["score_q6"], r["doc_id"]) for r in top_fraction_by_score(
                ray.data.from_arrow(t).repartition(7),
                "score_q6", "doc_id", numer, denom,
            ).take_all()
        )
        k = (numer * n + denom - 1) // denom
        order = np.lexsort((ids, -score))[:k]
        want = sorted(zip(score[order].tolist(), ids[order].tolist()))
        assert got == want, (numer, denom)


def test_top_fraction_single_score_degenerate(ray_session):
    """All rows share one score: decays to exact bottom-K by id."""
    import ray.data

    from luzzu_ray.ops.relational import top_fraction_by_score

    t = pa.table(
        {"doc_id": pa.array(np.arange(100, 0, -1, dtype=np.int64)),
         "score_q6": pa.array(np.full(100, 7, dtype=np.int64))}
    )
    got = sorted(
        r["doc_id"] for r in top_fraction_by_score(
            ray.data.from_arrow(t).repartition(5),
            "score_q6", "doc_id", 1, 4,
        ).take_all()
    )
    assert got == list(range(1, 26))


def test_decontaminate_matches_set_twin(ray_session):
    """n_overlap equals a per-doc Python set intersection against the
    eval corpus's shingle set; clean docs report 0."""
    import ray.data

    from luzzu_ray.ops.dedup import SHINGLE_K, decontaminate

    rng = np.random.default_rng(43)
    vocab = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    for i in range(300):
        nw = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(vocab, nw)))
        ids.append(i)
    t = pa.table(
        {"doc_id": pa.array(np.array(ids, dtype=np.int64)),
         "text": pa.array(texts)}
    )
    ev_mask = np.array(ids) % 5 == 0
    ev = ray.data.from_arrow(t.filter(pa.array(ev_mask)))
    tgt = ray.data.from_arrow(t.filter(pa.array(~ev_mask)))
    got = {r["doc_id"]: (r["n_overlap"], r["contaminated"]) for r in
           decontaminate(tgt, ev).take_all()}

    def shingles(s: str) -> set:
        w = s.split()
        return {tuple(w[i:i + SHINGLE_K])
                for i in range(len(w) - SHINGLE_K + 1)}

    ev_sh = set().union(*(shingles(texts[i]) for i in range(300)
                          if ev_mask[i])) if ev_mask.any() else set()
    want = {}
    for i in range(300):
        if ev_mask[i]:
            continue
        n = len(shingles(texts[i]) & ev_sh)
        want[i] = (n, n > 0)
    assert got == want
    assert any(v[0] > 0 for v in got.values())  # fixture hits both sides
    assert any(v[0] == 0 for v in got.values())


def test_ordered_prefix_pack_matches_scan_twin(ray_session):
    """Distributed prefix-sum packing equals the sequential scan, with
    sparse non-contiguous ids, across block layouts."""
    import ray.data

    from luzzu_ray.ops.relational import ordered_prefix_pack

    rng = np.random.default_rng(47)
    n = 4000
    ids = np.sort(rng.choice(10**9, n, replace=False)).astype(np.int64)
    w = rng.integers(0, 900, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(rng.permutation(ids)),
                  "n_words": pa.array(w)})
    budget = 512
    got = {r["doc_id"]: (r["n_tokens"], r["pack_id"]) for r in
           ordered_prefix_pack(
               ray.data.from_arrow(t).repartition(9),
               "doc_id", "n_words", budget, num_buckets=32,
           ).take_all()}
    assert len(got) == n
    # sequential twin over doc_id order
    order = np.argsort(t["doc_id"].to_numpy())
    oid = t["doc_id"].to_numpy()[order]
    ow = t["n_words"].to_numpy()[order]
    excl = np.cumsum(ow) - ow
    want = {int(i): (int(wt), int(e // budget))
            for i, wt, e in zip(oid, ow, excl)}
    assert got == want
    got2 = {r["doc_id"]: (r["n_tokens"], r["pack_id"]) for r in
            ordered_prefix_pack(
                ray.data.from_arrow(t).repartition(2),
                "doc_id", "n_words", budget, num_buckets=8,
            ).take_all()}
    assert got2 == want


def test_anti_join_matches_set_twin(ray_session):
    """Distributed anti-join equals Python set difference, with right
    duplicates, null right keys, and empty-right behavior."""
    import ray.data

    from luzzu_ray.ops.relational import anti_join

    rng = np.random.default_rng(53)
    lk = rng.permutation(np.arange(500, dtype=np.int64))
    left = pa.table(
        {"k": pa.array(lk), "name": pa.array([f"n{i}" for i in lk])}
    )
    rk = rng.choice(800, 900, replace=True).astype(np.int64)
    right = pa.table(
        {"rk": pa.array(rk.tolist() + [None], pa.int64())}
    )
    got = sorted(
        (r["k"], r["name"]) for r in anti_join(
            ray.data.from_arrow(left).repartition(6),
            ray.data.from_arrow(right).repartition(4),
            "k", "rk", ["name"],
        ).take_all()
    )
    rset = set(rk.tolist())
    want = sorted((int(i), f"n{i}") for i in lk if int(i) not in rset)
    assert got == want and 0 < len(got) < 500
    # empty right side: everything survives
    got_all = anti_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right.slice(0, 0)),
        "k", "rk", ["name"],
    ).count()
    assert got_all == 500


def test_semi_join_matches_set_twin(ray_session):
    """Distributed semi-join equals Python set intersection — one row
    per matching left row regardless of right-side duplicate count —
    and is the exact complement of the anti-join."""
    import ray.data

    from luzzu_ray.ops.relational import anti_join, semi_join

    rng = np.random.default_rng(59)
    lk = rng.permutation(np.arange(500, dtype=np.int64))
    left = pa.table(
        {"k": pa.array(lk), "name": pa.array([f"n{i}" for i in lk])}
    )
    rk = rng.choice(800, 900, replace=True).astype(np.int64)
    right = pa.table({"rk": pa.array(rk.tolist() + [None], pa.int64())})
    got = sorted(
        (r["k"], r["name"]) for r in semi_join(
            ray.data.from_arrow(left).repartition(6),
            ray.data.from_arrow(right).repartition(4),
            "k", "rk", ["name"],
        ).take_all()
    )
    rset = set(rk.tolist())
    want = sorted((int(i), f"n{i}") for i in lk if int(i) in rset)
    assert got == want and 0 < len(got) < 500
    n_anti = anti_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        "k", "rk", ["name"],
    ).count()
    assert n_anti + len(got) == 500
    # empty right side: nothing survives
    assert semi_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right.slice(0, 0)),
        "k", "rk", ["name"],
    ).count() == 0


def test_shingle_df_profile_matches_set_twin(ray_session):
    """(df, n_shingles) distribution equals a Python dict twin, across
    block layouts."""
    import collections

    import ray.data

    from luzzu_ray.ops.dedup import SHINGLE_K, shingle_df_profile

    rng = np.random.default_rng(59)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 25))))
             for _ in range(400)]
    t = pa.table(
        {"doc_id": pa.array(np.arange(400, dtype=np.int64)),
         "text": pa.array(texts)}
    )
    df = collections.Counter()
    for s in texts:
        w = s.split()
        for g in {tuple(w[i:i + SHINGLE_K])
                  for i in range(len(w) - SHINGLE_K + 1)}:
            df[g] += 1
    want = collections.Counter(c for c in df.values() if c >= 2)
    for parts in (3, 11):
        got = {r["df"]: r["n_shingles"] for r in shingle_df_profile(
            ray.data.from_arrow(t).repartition(parts), min_df=2, num_partitions=8,
        ).take_all()}
        assert got == dict(want), parts
    assert len(want) >= 3


def test_label_prototypicality_matches_duckdb(ray_session):
    """Prototype-cosine scores equal the SQL twin across layouts —
    both the int64 fast path and the object-dtype overflow fallback
    (huge coordinates force d * 10^q * max|s| past 2^62); zero vectors
    score 0."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.similarity import label_prototypicality

    rng = np.random.default_rng(73)

    def run_case(mag: float):
        n, d = 220, 8
        V = (rng.random((n, d)) * 2 - 1) * mag
        V[3] = 0.0  # zero vector -> proto_q6 = 0
        lab = rng.integers(0, 4, n).astype(np.int32)
        t = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "label": pa.array(lab),
            "embedding": pa.array(
                [row.tolist() for row in V.astype(np.float32)],
                pa.list_(pa.float32())),
        })
        con = duckdb.connect()
        con.register("embeddings", t)
        want = con.execute("""
WITH x AS (
  SELECT vec_id, label,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0)
              AS BIGINT) AS vq,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings),
s AS (SELECT label, i, sum(CAST(vq AS HUGEINT)) AS sv FROM x GROUP BY 1, 2),
ns AS (SELECT label, CAST(sum(sv * sv) AS DOUBLE) AS nsf FROM s GROUP BY 1),
dv AS (SELECT x.vec_id, x.label, sum(CAST(x.vq AS HUGEINT) * s.sv) AS dot,
              sum(CAST(x.vq AS HUGEINT) * x.vq) AS nv
       FROM x JOIN s ON x.label = s.label AND x.i = s.i GROUP BY 1, 2)
SELECT dv.vec_id,
       CAST(CASE WHEN CAST(dv.nv AS DOUBLE) * ns.nsf = 0.0 THEN 0
            ELSE floor((CAST(dv.dot AS DOUBLE) * 1000000.0)
                       / sqrt(CAST(dv.nv AS DOUBLE) * ns.nsf)) END
            AS BIGINT) AS proto_q6
FROM dv JOIN ns ON dv.label = ns.label ORDER BY 1
        """).df()
        for parts in (1, 6):
            got = label_prototypicality(
                ray.data.from_arrow(t).repartition(parts)
            ).to_pandas().sort_values("vec_id").reset_index(drop=True)
            assert (got["proto_q6"].to_numpy()
                    == want["proto_q6"].to_numpy()).all(), (mag, parts)
            assert got.loc[3, "proto_q6"] == 0

    run_case(1.0)    # int64 fast path
    run_case(1e9)    # object-dtype fallback (a-priori bound exceeded)


def test_label_second_moments_matches_numpy_twin(ray_session):
    """Per-label integer Gram moments equal a NumPy twin across block
    layouts; the per-block overflow guard trips loudly on huge
    coordinates."""
    import pytest
    import ray.data

    from luzzu_ray.ops.similarity import label_second_moments

    rng = np.random.default_rng(79)
    n, d = 180, 6
    V = (rng.random((n, d)) * 2 - 1).astype(np.float32)
    lab = rng.integers(0, 3, n).astype(np.int32)
    t = pa.table({
        "label": pa.array(lab),
        "embedding": pa.array([r.tolist() for r in V],
                              pa.list_(pa.float32())),
    })
    Vq = np.floor(V.astype(np.float64) * 10000.0).astype(np.int64)
    want = {}
    for lb in np.unique(lab):
        G = Vq[lab == lb].T @ Vq[lab == lb]
        for i in range(d):
            for j in range(i, d):
                want[(int(lb), i + 1, j + 1)] = int(G[i, j])
    for parts in (1, 7):
        got = {
            (r["label"], r["di"], r["dj"]): r["s2"]
            for r in label_second_moments(
                ray.data.from_arrow(t).repartition(parts),
                num_partitions=3,
            ).take_all()
        }
        assert got == want, parts
    big = pa.table({
        "label": pa.array([0, 0], pa.int32()),
        "embedding": pa.array([[1e12] * d, [1e12] * d],
                              pa.list_(pa.float32())),
    })
    with pytest.raises(Exception, match="exceed int64"):
        label_second_moments(ray.data.from_arrow(big)).take_all()


def test_dsir_importance_matches_scalar_twin(ray_session):
    """DSIR scores equal a row-at-a-time Python twin (independent hash
    fold + integer weight arithmetic) across block layouts, including
    tokens far beyond 256 bytes (the classifier cap bug class) and
    empty/NULL text."""
    import ray.data

    from luzzu_ray.ops.vocab import dsir_importance

    NB = 64
    B, M = 1099511628211, 1 << 64

    def bucket(tok: str) -> int:
        h = 0
        for by in tok.encode():
            h = (h * B + by) % M
        return h % NB

    rng = np.random.default_rng(71)
    vocab = [f"w{i}" for i in range(50)] + ["x" * 700]  # a >256B token
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 15))))
             for _ in range(240)]
    texts[0] = ""
    texts[1] = None
    src = [f"s{i % 4}" for i in range(240)]
    t = pa.table({
        "doc_id": pa.array(np.arange(240, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(src),
    })
    # twin: counts, weights, scores
    tc = [0] * NB
    rc = [0] * NB
    toks_per_doc = []
    for s, so in zip(texts, src):
        toks = (s or "").split(" ")
        toks_per_doc.append(toks)
        for tok in toks:
            b = bucket(tok)
            rc[b] += 1
            if so == "s1":
                tc[b] += 1
    T, R = sum(tc), sum(rc)
    w = [1_000_000 * (tc[b] + 1) * (R + NB)
         // ((rc[b] + 1) * (T + NB)) for b in range(NB)]
    want = {
        d: (len(toks), sum(w[bucket(tok)] for tok in toks))
        for d, toks in enumerate(toks_per_doc)
    }
    for parts in (1, 8):
        got = {
            r["doc_id"]: (r["n_tokens"], r["dsir_score"])
            for r in dsir_importance(
                ray.data.from_arrow(t).repartition(parts),
                target_source="s1", n_buckets=NB,
            ).take_all()
        }
        assert got == want, parts
    # empty text = one empty token, per the string_split convention
    assert want[0][0] == 1 and want[1][0] == 1
    # target docs score higher on average than non-target
    tgt = np.mean([want[d][1] for d in range(240) if src[d] == "s1"])
    oth = np.mean([want[d][1] for d in range(240) if src[d] != "s1"])
    assert tgt > oth


def test_dup_span_docs_matches_set_twin(ray_session):
    """Per-doc duplicated-gram position counts equal a Python dict
    twin across block layouts; short/empty docs report zero grams."""
    import collections

    import ray.data

    from luzzu_ray.ops.dedup import SHINGLE_K, dup_span_docs

    rng = np.random.default_rng(67)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 20))))
             for _ in range(300)]
    texts[5] = ""           # zero-gram doc
    texts[6] = "w0 w1"      # below SHINGLE_K tokens
    # guaranteed cross-doc duplicate span (and an in-doc repeat in 8)
    texts[7] = "w2 w3 w4 w5 w6"
    texts[8] = "w2 w3 w4 w5 w6 w2 w3 w4 w5 w6"
    t = pa.table(
        {"doc_id": pa.array(np.arange(300, dtype=np.int64)),
         "text": pa.array(texts)}
    )
    df = collections.Counter()
    grams: dict[int, list[tuple]] = {}
    for d, s in enumerate(texts):
        w = s.split()
        gs = [tuple(w[i:i + SHINGLE_K])
              for i in range(max(len(w) - SHINGLE_K + 1, 0))]
        grams[d] = gs
        for g in set(gs):
            df[g] += 1
    want = {
        d: (len(gs), sum(1 for g in gs if df[g] >= 2))
        for d, gs in grams.items()
    }
    for parts in (2, 9):
        got = {
            r["doc_id"]: (r["n_grams"], r["n_dup_pos"])
            for r in dup_span_docs(
                ray.data.from_arrow(t).repartition(parts),
                min_df=2, num_partitions=6,
            ).take_all()
        }
        assert got == want, parts
    assert want[5] == (0, 0) and want[6] == (0, 0)
    assert want[7][1] > 0  # the planted duplicate binds


def test_render_user_streams_matches_twin(ray_session):
    """Rendered transcripts equal a per-row Python twin, layout-invariant."""
    import ray.data

    from luzzu_ray.ops.events import render_user_streams

    rng = np.random.default_rng(61)
    n = 1500
    uid = rng.integers(0, 25, n)
    ts = rng.integers(0, 10**6, n) * 1_000_000
    et = rng.choice(["click", "view", "error"], n)
    val = rng.random(n) * 20
    t = pa.table(
        {"event_id": pa.array(np.arange(n, dtype=np.int64)),
         "user_id": pa.array(uid, pa.int64()),
         "ts": pa.array(ts, pa.timestamp("us")),
         "event_type": pa.array(et),
         "value": pa.array(val, pa.float64())}
    )
    lines: dict[int, list[str]] = {}
    for i in np.lexsort((np.arange(n), ts, uid)):
        lines.setdefault(int(uid[i]), []).append(
            f"{et[i]}:{int(np.floor(val[i] * 10000.0))}"
        )
    want = {u: ("\n".join(ls), len(ls)) for u, ls in lines.items()}
    for parts in (2, 10):
        got = {r["user_id"]: (r["transcript"], r["n_lines"]) for r in
               render_user_streams(
                   ray.data.from_arrow(t).repartition(parts), 6,
               ).take_all()}
        assert got == want, parts


def test_word_stats_topv_matches_twin(ray_session):
    """Top-V vocabulary equals a Python counter twin, layout-invariant."""
    import collections

    import ray.data

    from luzzu_ray.ops.vocab import word_stats_topv

    rng = np.random.default_rng(71)
    words = ["alpha", "beta", "gamma", "delta", "eps", ""]
    docs = [" ".join(rng.choice(words, rng.integers(0, 9)))
            for _ in range(400)]
    t = pa.table({"text": pa.array(docs)})
    tf: collections.Counter = collections.Counter()
    df: collections.Counter = collections.Counter()
    for d in docs:
        toks = d.split(" ")  # '' -> [''] like string_split
        tf.update(toks)
        df.update(set(toks))
    want = sorted(
        ((w, tf[w], df[w]) for w in tf), key=lambda x: (-x[1], x[0])
    )[:4]
    for parts in (1, 7):
        got = [(r["word"], r["tf"], r["df"]) for r in
               word_stats_topv(
                   ray.data.from_arrow(t).repartition(parts), 4,
               ).take_all()]
        assert got == want, parts


def test_preceding_count_join_matches_twin(ray_session):
    """Trailing interval-join counts equal a brute-force twin across
    layouts, with same-timestamp ties included regardless of order."""
    import ray.data

    from luzzu_ray.ops.events import preceding_count_join

    rng = np.random.default_rng(67)
    n = 500
    uid = rng.integers(0, 25, n).astype(np.int64)
    ts = rng.integers(0, 3_000_000_000, n).astype(np.int64)
    ts[::9] = ts[1::9][: len(ts[::9])]  # plant exact ties
    eid = np.arange(n, dtype=np.int64)
    typ = np.array(["click", "view", "other"])[rng.integers(0, 3, n)]
    W = 300_000_000
    want = {}
    for i in range(n):
        if typ[i] != "click":
            continue
        m = (
            (uid == uid[i]) & (typ == "view")
            & (ts <= ts[i]) & (ts > ts[i] - W)
        )
        want[int(eid[i])] = (int(uid[i]), int(m.sum()))
    assert any(v[1] > 0 for v in want.values())
    t = pa.table(
        {"event_id": pa.array(eid),
         "user_id": pa.array(uid),
         "ts": pa.array(ts, pa.timestamp("us")),
         "event_type": pa.array(typ)}
    )
    for parts in (1, 8):
        got = {
            r["event_id"]: (r["user_id"], r["n_prior"])
            for r in preceding_count_join(
                ray.data.from_arrow(t).repartition(parts),
                num_partitions=4,
            ).take_all()
        }
        assert got == want, parts


def test_bloom_semi_join_equals_plain(ray_session):
    """Bloom pruning never changes the result (no false negatives) —
    byte-equal to the plain semi-join across layouts — and a tiny
    bitmap (high FP rate) still yields the exact answer."""
    import ray.data

    from luzzu_ray.ops.relational import bloom_semi_join, semi_join

    rng = np.random.default_rng(11)
    lk = rng.integers(0, 2000, 800).astype(np.int64)
    left = pa.table(
        {"k": pa.array(lk),
         "v": pa.array(rng.integers(0, 9, 800).astype(np.int64))}
    )
    right = pa.table(
        {"rk": pa.array(rng.integers(0, 2000, 300).astype(np.int64))}
    )
    want = sorted(
        (r["k"], r["v"]) for r in semi_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            "k", "rk", ["v"],
        ).take_all()
    )
    assert 0 < len(want) < 800
    for m_bits in (1 << 20, 256):  # 256 bits: mostly false positives
        got = sorted(
            (r["k"], r["v"]) for r in bloom_semi_join(
                ray.data.from_arrow(left).repartition(5),
                ray.data.from_arrow(right).repartition(3),
                "k", "rk", ["v"], m_bits=m_bits,
            ).take_all()
        )
        assert got == want, m_bits


def test_ssjoin_exact_recall_and_values(ray_session):
    """Prefix-filtered set-similarity join equals the ALL-PAIRS twin
    exactly — recall 1 (the property the banded minhash path cannot
    guarantee) and exact q6 values — across layouts and with a tiny
    hot_df so the hot-tier ordering path is exercised."""
    import itertools

    import ray.data

    from luzzu_ray.ops.dedup import ssjoin_pairs

    rng = np.random.default_rng(73)
    vocab = [f"w{i}" for i in range(60)]
    base = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    docs = list(base)
    for i in range(0, 40, 4):  # planted near-dups: swap a few words
        toks = base[i].split(" ")
        for j in rng.integers(0, 30, 3):
            toks[j] = str(rng.choice(vocab))
        docs.append(" ".join(toks))
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
         "text": pa.array(docs)}
    )
    thr = 0.5
    sets = {i: _shingle_set(d) for i, d in enumerate(docs)}
    want = {}
    for a, b in itertools.combinations(range(len(docs)), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        q6 = int(np.floor(j * 1e6))
        if q6 >= int(thr * 1e6):
            want[(a, b)] = q6
    assert want, "corpus must contain near-dup pairs"
    for parts, hot in ((1, 4), (6, 256)):
        got = {
            (r["a"], r["b"]): r["jaccard_q6"]
            for r in ssjoin_pairs(
                ray.data.from_arrow(t).repartition(parts), thr,
                hot_df=hot,
            ).take_all()
        }
        assert got == want, (parts, hot)


def test_inverted_postings_matches_twin(ray_session):
    """Posting pairs equal a Python set twin across layouts, with the
    (tf DESC, word) vocab tie rule at the V boundary."""
    import collections

    import ray.data

    from luzzu_ray.ops.vocab import inverted_postings

    rng = np.random.default_rng(23)
    pool = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = [" ".join(rng.choice(pool, rng.integers(1, 9)))
            for _ in range(250)]
    tf: collections.Counter = collections.Counter()
    for d in docs:
        tf.update(d.split(" "))
    vocab = {w for w, _ in sorted(
        tf.items(), key=lambda x: (-x[1], x[0]))[:3]}
    want = sorted(
        {(w, i) for i, d in enumerate(docs)
         for w in set(d.split(" ")) if w in vocab}
    )
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
         "text": pa.array(docs)}
    )
    for parts in (1, 6):
        got = sorted(
            (r["word"], r["doc_id"]) for r in inverted_postings(
                ray.data.from_arrow(t).repartition(parts), 3,
            ).take_all()
        )
        assert got == want, parts


def test_cube_counts_matches_twin(ray_session):
    """CUBE over three keys equals the per-subset Counter twin (2^3
    grains) across layouts."""
    import collections
    import itertools

    import ray.data

    from luzzu_ray.ops.relational import cube_counts

    rng = np.random.default_rng(43)
    n = 400
    a = np.array(["p", "q"])[rng.integers(0, 2, n)]
    b = rng.integers(0, 3, n).astype(np.int64)
    c = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    keys = ["a", "b", "c"]
    vals = {"a": a, "b": b, "c": c}
    want: collections.Counter = collections.Counter()
    for r in range(4):
        for subset in itertools.combinations(keys, r):
            for i in range(n):
                kt = tuple(
                    vals[k][i].item() if k in subset else None
                    for k in keys
                )
                want[kt] += 1
    t = pa.table({"a": pa.array(a), "b": pa.array(b), "c": pa.array(c)})
    for parts in (1, 6):
        got: collections.Counter = collections.Counter()
        for r in cube_counts(
            ray.data.from_arrow(t).repartition(parts), keys
        ).take_all():
            got[(r["a"], r["b"], r["c"])] += r["n"]
        assert got == want, parts


def test_fuzzy_prefix_pairs_matches_twin(ray_session):
    """Deletion-neighborhood pair mining equals a brute-force byte
    Levenshtein<=1 twin: substitutions, indels, equal prefixes,
    multi-byte chars, and short/empty strings all covered."""
    import itertools

    import ray.data

    from luzzu_ray.ops.dedup import fuzzy_prefix_pairs

    docs = [
        "the quick brown fox jumps",     # base
        "the quick brown fox leaps",     # same 16-prefix
        "the quick crown fox",           # substitution inside prefix
        "the quick browwn fox",          # insertion
        "the quik brown fox",            # deletion
        "THE QUICK BROWN FOX",           # case-folded equal
        "a completely different doc",
        "x",
        "y",
        "",
        "",                              # empty pair
        "héllo wörld padding text",      # multi-byte
        "héllo wörld padding text",
        "hello wörld padding text",      # 2 bytes from héllo: NOT a pair
    ]

    def lev(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    pref = [d.lower()[:16].encode() for d in docs]
    want = sorted(
        (i, j) for i, j in itertools.combinations(range(len(docs)), 2)
        if lev(pref[i], pref[j]) <= 1
    )
    assert (0, 1) in want and (11, 12) in want and (11, 13) not in want
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
         "text": pa.array(docs)}
    )
    for parts in (1, 5):
        got = sorted(
            (r["d1"], r["d2"]) for r in fuzzy_prefix_pairs(
                ray.data.from_arrow(t).repartition(parts), 16,
                num_partitions=4,
            ).take_all()
        )
        assert got == want, parts


def test_grouped_sigma_outliers_matches_twin(ray_session):
    """Flag set equals the bigint twin across layouts; constant group
    flags nothing; planted extremes are flagged."""
    import math

    import ray.data

    from luzzu_ray.ops.relational import grouped_sigma_outliers

    rng = np.random.default_rng(17)
    n = 600
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    x = rng.normal(50, 5, n)
    x[g == "c"] = 7.25  # constant group
    x[:4] = [500.0, -400.0, 51.0, 49.0]
    g[:4] = "a"
    ids = np.arange(n, dtype=np.int64)
    want = set()
    for grp in ("a", "b", "c"):
        m = g == grp
        xq = np.floor(x[m] * 10000.0).astype(np.int64)
        nn = int(m.sum()); sx = int(xq.sum())
        sxx = int(sum(int(v) * int(v) for v in xq))
        b = int(math.floor(math.sqrt(float(9 * (nn * sxx - sx * sx)))))
        for i, v in zip(ids[m], xq):
            if int(v) * nn > sx + b or int(v) * nn < sx - b:
                want.add((int(i), grp, int(v)))
    assert any(w[0] < 2 for w in want) and len(want) >= 2
    t = pa.table(
        {"event_id": pa.array(ids), "k": pa.array(g),
         "x": pa.array(x)}
    )
    for parts in (1, 7):
        got = {
            (r["event_id"], r["k"], r["xq"])
            for r in grouped_sigma_outliers(
                ray.data.from_arrow(t).repartition(parts),
                key="k", id_col="event_id", x_col="x",
            ).take_all()
        }
        assert got == want, parts


def test_grouped_corr_matches_twin(ray_session):
    """Integer-moment Pearson equals a Python bigint twin bit-for-bit
    across layouts; constant-y group yields NULL corr."""
    import math

    import ray.data

    from luzzu_ray.ops.relational import grouped_corr_q

    rng = np.random.default_rng(91)
    n = 500
    g = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    x = rng.uniform(0, 100, n)
    y = rng.integers(0, 24, n).astype(np.int64)
    y[g == "c"] = 7  # constant within group -> NULL corr
    want = {}
    for grp in ("a", "b", "c"):
        m = g == grp
        xq = np.floor(x[m] * 10000.0).astype(object)
        yy = y[m].astype(object)
        nn = int(m.sum())
        sx, sy = int(sum(xq)), int(sum(yy))
        sxx = int(sum(xq * xq)); syy = int(sum(yy * yy))
        sxy = int(sum(xq * yy))
        d1, d2 = nn * sxx - sx * sx, nn * syy - sy * sy
        c = (float(nn * sxy - sx * sy) / math.sqrt(float(d1) * float(d2))
             if d1 > 0 and d2 > 0 else None)
        want[grp] = (nn, sx, sy, sxx, syy, sxy, c)
    t = pa.table(
        {"k": pa.array(g), "x": pa.array(x), "y": pa.array(y)}
    )
    for parts in (1, 7):
        got = {
            r["k"]: (r["n"], r["sx"], r["sy"], r["sxx"], r["syy"],
                     r["sxy"], r["corr_xy"])
            for r in grouped_corr_q(
                ray.data.from_arrow(t).repartition(parts), "k", "x", "y",
            ).take_all()
        }
        assert got == want, parts
    assert want["c"][-1] is None


def test_sq8_ann_topk_matches_twin(ray_session):
    """SQ8 quantized top-k equals the numpy twin (same quantizer
    formula, exact integer dots, ties by vec_id) across layouts."""
    import ray.data

    from luzzu_ray.ops.similarity import _sq8_codes, sq8_ann_topk

    rng = np.random.default_rng(61)
    n, d, k = 300, 16, 5
    E = rng.standard_normal((n, d)).astype(np.float32)
    E[:, 3] = 0.25  # a constant dim: mx == mn branch
    ids = np.arange(n, dtype=np.int64)
    Q = E[:3].astype(np.float64)
    mn = E.astype(np.float64).min(axis=0)
    mx = E.astype(np.float64).max(axis=0)
    codes = _sq8_codes(E.astype(np.float64), mn, mx)
    qc = _sq8_codes(Q, mn, mx)
    dots = codes @ qc.T
    want = []
    for qi in range(3):
        order = np.lexsort((ids, -dots[:, qi]))[:k]
        want += [(qi, r + 1, int(ids[v])) for r, v in enumerate(order)]
    t = pa.table(
        {"vec_id": pa.array(ids),
         "embedding": pa.array(E.tolist(), pa.list_(pa.float32()))}
    )
    for parts in (1, 6):
        got = [
            (r["query_id"], r["rank"], r["vec_id"])
            for r in sq8_ann_topk(
                ray.data.from_arrow(t).repartition(parts),
                Q, [0, 1, 2], k=k,
            ).to_pylist()
        ]
        assert got == want, parts


def test_pivot_count_matches_twin(ray_session):
    """Wide pivot counts equal a Python twin across layouts; null pivot
    values count toward no column but keep the row present."""
    import collections

    import ray.data

    from luzzu_ray.ops.relational import pivot_count

    rng = np.random.default_rng(37)
    n = 400
    row = rng.integers(0, 6, n).astype(np.int64)
    piv = np.array(["x", "y", "z"])[rng.integers(0, 3, n)].astype(object)
    piv[::17] = None  # nulls
    want: collections.Counter = collections.Counter()
    rows_present = set()
    for r, p in zip(row, piv):
        rows_present.add(int(r))
        if p is not None:
            want[(int(r), p)] += 1
    t = pa.table({"r": pa.array(row), "p": pa.array(piv, pa.string())})
    for parts in (1, 7):
        out = pivot_count(
            ray.data.from_arrow(t).repartition(parts), "r", "p"
        ).take_all()
        assert {r["r"] for r in out} == rows_present, parts
        got = {
            (r["r"], v): r[f"n_{v}"] for r in out for v in ("x", "y", "z")
        }
        full = {(r, v): want.get((r, v), 0)
                for r in rows_present for v in ("x", "y", "z")}
        assert got == full, parts


def test_type_transitions_matches_twin(ray_session):
    """Transition counts equal a Python twin across layouts, with
    ts ties broken by event_id and single-event users contributing
    nothing."""
    import collections

    import ray.data

    from luzzu_ray.ops.events import type_transitions

    rng = np.random.default_rng(47)
    n = 500
    uid = rng.integers(0, 30, n).astype(np.int64)
    ts = rng.integers(0, 50, n).astype(np.int64)  # many ties
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)]
    rows = sorted(zip(uid, ts, eid, types))
    want: collections.Counter = collections.Counter()
    for (u0, _, _, c0), (u1, _, _, c1) in zip(rows, rows[1:]):
        if u0 == u1:
            want[(c0, c1)] += 1
    t = pa.table(
        {"user_id": pa.array(uid),
         "ts": pa.array(ts, pa.timestamp("us")),
         "event_id": pa.array(eid),
         "event_type": pa.array(types)}
    )
    for parts in (1, 8):
        got = {
            (r["from_type"], r["to_type"]): r["n_pairs"]
            for r in type_transitions(
                ray.data.from_arrow(t).repartition(parts),
                num_partitions=4,
            ).take_all()
        }
        assert got == dict(want), parts


def test_cohort_retention_matches_twin(ray_session):
    """Retention matrix equals a Python dict twin across layouts,
    including users whose events span many days and duplicate
    same-day events (distinct semantics)."""
    import collections

    import ray.data

    from luzzu_ray.ops.events import DAY_US, cohort_retention

    rng = np.random.default_rng(29)
    n = 600
    uid = rng.integers(0, 40, n)
    day = rng.integers(0, 12, n)
    ts = day * DAY_US + rng.integers(0, DAY_US, n)
    first = {}
    active = set()
    for u, d in zip(uid, day):
        first[u] = min(first.get(u, 10**9), d)
        active.add((int(u), int(d)))
    want: collections.Counter = collections.Counter()
    for u, d in active:
        want[(first[u], d - first[u])] += 1
    t = pa.table(
        {"user_id": pa.array(uid.astype(np.int64)),
         "ts": pa.array(ts.astype(np.int64), pa.timestamp("us"))}
    )
    for parts in (1, 8):
        got = {
            (r["cohort_day"], r["offset_days"]): r["n_users"]
            for r in cohort_retention(
                ray.data.from_arrow(t).repartition(parts),
                num_partitions=4,
            ).take_all()
        }
        assert got == dict(want), parts


def test_frequent_words_matches_twin(ray_session):
    """Two-pass heavy hitters equal the exact-counter twin (recall 1
    AND precision 1 at the threshold), across block layouts — including
    a word spread thinly over blocks so no single block keeps it
    locally (the case a union-of-block-top-k would miss)."""
    import collections

    import ray.data

    from luzzu_ray.ops.sketch import frequent_words

    rng = np.random.default_rng(83)
    pool = [f"w{i}" for i in range(40)]
    probs = np.array([1.0 / (i + 1) ** 1.3 for i in range(40)])
    probs /= probs.sum()
    docs = [" ".join(rng.choice(pool, rng.integers(1, 12), p=probs))
            for _ in range(300)]
    # a word just at the global threshold but diluted per-block
    spread = ["rare_but_frequent"] * 260
    docs = [d + " " + s for d, s in zip(docs[:260], spread)] + docs[260:]
    cnt: collections.Counter = collections.Counter()
    for d in docs:
        cnt.update(d.split(" "))
    n = sum(cnt.values())
    denom, cap = 10, 19
    thresh = (n + denom - 1) // denom
    want = sorted((w, c) for w, c in cnt.items() if c >= thresh)
    assert want, "test corpus must produce at least one heavy hitter"
    t = pa.table({"text": pa.array(docs)})
    for parts in (1, 9):
        got = sorted(
            (r["word"], r["n_occ"])
            for r in frequent_words(
                ray.data.from_arrow(t).repartition(parts),
                denom, cap,
            ).take_all()
        )
        assert got == want, parts


def test_global_rank_matches_twin(ray_session):
    """row_number + NTILE equal the sort-based twin under heavy score
    ties and across block layouts / shuffle widths."""
    import ray.data

    from luzzu_ray.ops.relational import global_rank

    rng = np.random.default_rng(72)
    n = 3000
    ids = rng.permutation(n).astype(np.int64)
    scores = rng.integers(0, 40, n).astype(np.int64)  # heavy ties
    t = pa.table({"doc_id": pa.array(ids), "s": pa.array(scores)})
    order = np.lexsort((ids, -scores))
    rnk = np.empty(n, dtype=np.int64)
    rnk[order] = np.arange(1, n + 1)
    k = 7
    q, r = divmod(n, k)
    edge = r * (q + 1)
    tile = np.where(
        rnk <= edge, (rnk - 1) // (q + 1), r + (rnk - 1 - edge) // max(q, 1)
    ) + 1
    want = {int(i): (int(a), int(b)) for i, a, b in zip(ids, rnk, tile)}
    for parts, width in ((2, None), (9, 5)):
        got = {r2["doc_id"]: (r2["rnk"], r2["tile"]) for r2 in
               global_rank(
                   ray.data.from_arrow(t).repartition(parts),
                   "s", "doc_id", ntile=k, num_partitions=width,
               ).take_all()}
        assert got == want, (parts, width)


def test_collapse_repeat_tokens_matches_twin(ray_session):
    """Consecutive-dup collapse equals an itertools.groupby twin,
    including empty tokens from double spaces and empty text."""
    import itertools

    import ray.data

    from luzzu_ray.ops.vocab import collapse_repeat_tokens

    rng = np.random.default_rng(73)
    vocab = ["a", "bb", "a", "", "ccc"]
    docs = [" ".join(rng.choice(vocab, rng.integers(0, 12)))
            for _ in range(300)]
    docs[0] = ""
    docs[1] = "x x x"
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(docs)})
    want = {}
    for i, d in enumerate(docs):
        toks = d.split(" ")
        kept = [k for k, _ in itertools.groupby(toks)]
        want[i] = (" ".join(kept), len(toks) - len(kept))
    for parts in (1, 8):
        got = {r["doc_id"]: (r["text_collapsed"], r["n_removed"]) for r in
               collapse_repeat_tokens(
                   ray.data.from_arrow(t).repartition(parts)
               ).take_all()}
        assert got == want, parts


def test_kmv_distinct_layout_invariant(ray_session):
    """KMV estimate is exact below k, matches the integer formula at or
    above k, and is identical across block layouts."""
    import ray.data

    from luzzu_ray.ops.sketch import KMV_HASH_A, KMV_HASH_B, kmv_distinct

    rng = np.random.default_rng(74)
    vals = rng.integers(0, 5000, 20000).astype(np.int64)
    t = pa.table({"qv": pa.array(vals)})
    uniq = np.unique(vals.astype(np.uint64))
    with np.errstate(over="ignore"):
        h = np.unique(uniq * np.uint64(KMV_HASH_A) + np.uint64(KMV_HASH_B))
    for k in (64, 100000):
        if len(h) < k:
            want = len(h)
        else:
            want = (k - 1) * (1 << 64) // int(np.sort(h)[k - 1])
        outs = set()
        for parts in (1, 16):
            r = kmv_distinct(
                ray.data.from_arrow(t).repartition(parts), "qv", k
            ).take_all()
            assert len(r) == 1
            assert r[0]["n_distinct_est"] == want, (k, parts)
            outs.add((r[0]["k"], r[0]["n_distinct_est"]))
        assert len(outs) == 1
    # sanity: estimate within 20% of truth at k=64
    est = kmv_distinct(ray.data.from_arrow(t), "qv", 64).take_all()[0]
    assert abs(est["n_distinct_est"] - len(uniq)) / len(uniq) < 0.2


def test_rebalance_mixture_matches_twin(ray_session):
    """Mixture sampler equals the per-row threshold twin and hits the
    requested proportions on a skewed corpus."""
    import ray.data

    from luzzu_ray.ops.relational import rebalance_mixture

    rng = np.random.default_rng(75)
    n = 6000
    src = np.where(rng.random(n) < 0.7, "big",
                   np.where(rng.random(n) < 0.5, "mid", "small"))
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "source": pa.array(src)})
    shares = {"big": 0.2, "mid": 0.4, "small": 0.4}
    A, B = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    counts = {s: int((src == s).sum()) for s in np.unique(src)}
    target = float(int(0.3 * n))
    keep = np.zeros(n, dtype=bool)
    for s, c in counts.items():
        thr = int(np.floor(min(1.0, shares[s] * target / c) * 4294967296.0))
        with np.errstate(over="ignore"):
            hv = (ids.astype(np.uint64) * np.uint64(A) + np.uint64(B)) \
                >> np.uint64(32)
        keep |= (src == s) & (hv < np.uint64(thr))
    want = set(ids[keep].tolist())
    for parts in (1, 9):
        got = {r["doc_id"] for r in rebalance_mixture(
            ray.data.from_arrow(t).repartition(parts),
            "source", "doc_id", shares, 0.3, A, B,
        ).take_all()}
        assert got == want, parts
    # proportions: each source's kept count near share * target
    kept_src = src[keep]
    for s in ("mid", "small"):
        assert abs((kept_src == s).sum() - shares[s] * target) \
            < 0.1 * shares[s] * target


def test_grouped_topk_matches_twin(ray_session):
    """Per-group top-k + rank equals the sort twin across layouts,
    including groups smaller than k."""
    import ray.data

    from luzzu_ray.ops.relational import grouped_topk

    rng = np.random.default_rng(76)
    n = 2500
    grp = rng.choice(["g0", "g1", "g2", "tiny"], n, p=[0.45, 0.3, 0.249, 0.001])
    score = rng.integers(0, 50, n).astype(np.int64)  # ties
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"g": pa.array(grp), "s": pa.array(score),
                  "doc_id": pa.array(ids)})
    want = set()
    for g in np.unique(grp):
        m = grp == g
        order = np.lexsort((ids[m], -score[m]))
        for r, i in enumerate(order[:4]):
            want.add((g, int(score[m][i]), int(ids[m][i]), r + 1))
    for parts, width in ((1, None), (11, 5)):
        got = {(r["g"], r["s"], r["doc_id"], r["rnk"]) for r in grouped_topk(
            ray.data.from_arrow(t).repartition(parts),
            "g", "s", "doc_id", 4, num_partitions=width,
        ).take_all()}
        assert got == want, (parts, width)


def test_per_key_lag_delta_matches_twin(ray_session):
    """LAG delta equals the per-user Python twin; firsts are NULL."""
    import ray.data

    from luzzu_ray.ops.events import per_key_lag_delta

    rng = np.random.default_rng(77)
    n = 2000
    uid = rng.integers(0, 40, n).astype(np.int64)
    ts = rng.integers(0, 10**6, n).astype(np.int64) * 1_000_000
    val = rng.random(n) * 100 - 50
    t = pa.table(
        {"event_id": pa.array(np.arange(n, dtype=np.int64)),
         "user_id": pa.array(uid),
         "ts": pa.array(ts, pa.timestamp("us")),
         "value": pa.array(val, pa.float64())}
    )
    want = {}
    for u in np.unique(uid):
        idx = np.flatnonzero(uid == u)
        idx = idx[np.lexsort((idx, ts[idx]))]
        prev = None
        for i in idx:
            want[int(i)] = (None if prev is None
                            else int(np.floor((val[i] - prev) * 10_000.0)))
            prev = val[i]
    for parts in (1, 7):
        got = {r["event_id"]: r["delta_q4"] for r in per_key_lag_delta(
            ray.data.from_arrow(t).repartition(parts), 6,
        ).take_all()}
        assert got == want, parts


def test_tfidf_top_terms_matches_twin(ray_session):
    """Per-doc top-k rational tf-idf equals the Counter twin across
    layouts, ties broken by term byte-order."""
    import collections

    import ray.data

    from luzzu_ray.ops.vocab import tfidf_top_terms

    rng = np.random.default_rng(78)
    vocab = ["w%d" % i for i in range(12)]
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 20)))
            for _ in range(250)]
    n = len(docs)
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(docs)})
    df: collections.Counter = collections.Counter()
    for d in docs:
        df.update(set(d.split(" ")))
    want = set()
    for i, d in enumerate(docs):
        tf = collections.Counter(d.split(" "))
        scored = sorted(
            ((term, (c * n * 10_000) // df[term]) for term, c in tf.items()),
            key=lambda x: (-x[1], x[0]),
        )
        for r, (term, s) in enumerate(scored[:2]):
            want.add((i, term, s, r + 1))
    for parts in (1, 6):
        got = {(r["doc_id"], r["term"], r["tfidf_score"], r["rnk"])
               for r in tfidf_top_terms(
                   ray.data.from_arrow(t).repartition(parts), 2,
               ).take_all()}
        assert got == want, parts


def test_grouped_vector_sums_matches_twin(ray_session):
    """Per-label coordinate sums equal the NumPy twin, layout-invariant,
    including negatives (floor, not truncate)."""
    import ray.data

    from luzzu_ray.ops.similarity import grouped_vector_sums

    rng = np.random.default_rng(79)
    n, d = 600, 8
    lab = rng.integers(0, 5, n).astype(np.int32)
    emb = (rng.random((n, d)).astype(np.float32) - 0.5) * 3
    t = pa.table({
        "label": pa.array(lab),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.ravel()), d
        ).cast(pa.list_(pa.float32())),
    })
    qv = np.floor(emb.astype(np.float64) * 1e6).astype(np.int64)
    want = {}
    for g in np.unique(lab):
        m = lab == g
        s = qv[m].sum(axis=0)
        for j in range(d):
            want[(int(g), j + 1)] = (int(s[j]), int(m.sum()))
    for parts in (1, 6):
        got = {(r["label"], r["dim"]): (r["s"], r["n"])
               for r in grouped_vector_sums(
                   ray.data.from_arrow(t).repartition(parts)
               ).take_all()}
        assert got == want, parts


def test_kmv_distinct_by_matches_twin(ray_session):
    """Grouped KMV equals the per-group integer-formula twin,
    layout-invariant, with both exact (<k) and estimator branches."""
    import ray.data

    from luzzu_ray.ops.sketch import KMV_HASH_A, KMV_HASH_B, kmv_distinct_by

    rng = np.random.default_rng(80)
    n = 8000
    grp = rng.choice(["dense", "sparse"], n, p=[0.9, 0.1])
    key = np.where(grp == "dense",
                   rng.integers(0, 3000, n), rng.integers(0, 10, n))
    t = pa.table({"g": pa.array(grp), "uid": pa.array(key.astype(np.int64))})
    k = 32
    want = {}
    for g in ("dense", "sparse"):
        u = np.unique(key[grp == g].astype(np.uint64))
        with np.errstate(over="ignore"):
            h = np.unique(u * np.uint64(KMV_HASH_A) + np.uint64(KMV_HASH_B))
        want[g] = (len(h) if len(h) < k
                   else (k - 1) * (1 << 64) // int(np.sort(h)[k - 1]))
    assert want["sparse"] == 10  # exact branch exercised
    for parts in (1, 12):
        got = {r["g"]: r["n_distinct_est"] for r in kmv_distinct_by(
            ray.data.from_arrow(t).repartition(parts), "g", "uid", k, 3,
        ).take_all()}
        assert got == want, parts


def test_broadcast_interval_join_matches_twin(ray_session):
    """Range join assigns the right band and drops out-of-range rows."""
    import ray.data

    from luzzu_ray.ops.relational import broadcast_interval_join

    rng = np.random.default_rng(81)
    n = 3000
    v = rng.random(n) * 120 - 10  # includes < 0 (outside all bands)
    t = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                  "value": pa.array(v, pa.float64())})
    bands = pa.table({"band": pa.array(["a", "b", "c"]),
                      "lo": pa.array([0.0, 30.0, 90.0]),
                      "hi": pa.array([30.0, 90.0, 100.0])})
    want = {}
    for i, x in enumerate(v):
        for b, lo, hi in (("a", 0, 30), ("b", 30, 90), ("c", 90, 100)):
            if lo <= x < hi:
                want[i] = b
    for parts in (1, 5):
        got = {r["event_id"]: r["band"] for r in broadcast_interval_join(
            ray.data.from_arrow(t).repartition(parts), "value", bands,
        ).take_all()}
        assert got == want, parts


def test_rollup_counts_matches_twin(ray_session):
    """ROLLUP grains equal the nested-Counter twin, layout-invariant."""
    import collections

    import ray.data

    from luzzu_ray.ops.relational import rollup_counts

    rng = np.random.default_rng(82)
    n = 2000
    a = rng.choice(["x", "y", "z"], n)
    b = rng.choice(["p", "q"], n)
    t = pa.table({"a": pa.array(a), "b": pa.array(b)})
    want: collections.Counter = collections.Counter()
    for ai, bi in zip(a, b):
        want[(ai, bi)] += 1
        want[(ai, None)] += 1
        want[(None, None)] += 1
    for parts in (1, 6):
        rows = rollup_counts(
            ray.data.from_arrow(t).repartition(parts), ["a", "b"], 3
        ).take_all()
        got = {(r["a"], r["b"]): r["n"] for r in rows}
        assert got == dict(want), parts
        assert len(rows) == len(want)  # no duplicate grain rows


def test_range_user_window_matches_twin(ray_session):
    """Trailing time-range window equals the per-user quadratic twin,
    layout-invariant."""
    import ray.data

    from luzzu_ray.ops.events import range_user_window

    rng = np.random.default_rng(83)
    n = 1500
    uid = rng.integers(0, 20, n).astype(np.int64)
    ts = rng.choice(10**6, n, replace=False).astype(np.int64) * 1_000_000
    val = rng.random(n) * 40 - 10
    t = pa.table(
        {"event_id": pa.array(np.arange(n, dtype=np.int64)),
         "user_id": pa.array(uid),
         "ts": pa.array(ts, pa.timestamp("us")),
         "value": pa.array(val, pa.float64())}
    )
    width = 50_000 * 1_000_000
    vq = np.floor(val * 10_000.0).astype(np.int64)
    want = {}
    for u in np.unique(uid):
        idx = np.flatnonzero(uid == u)
        idx = idx[np.argsort(ts[idx])]
        for j, i in enumerate(idx):
            m = idx[(ts[idx] >= ts[i] - width) & (ts[idx] <= ts[i])]
            want[int(i)] = (int(vq[m].sum()), len(m))
    for parts in (1, 8):
        got = {r["event_id"]: (r["wsum_q4"], r["wn"])
               for r in range_user_window(
                   ray.data.from_arrow(t).repartition(parts), width, 5,
               ).take_all()}
        assert got == want, parts


def test_funnel_users_matches_twin(ray_session):
    """Funnel equals the per-user Python twin: entered users only,
    NULL ts_b when no qualifying B, conversion window respected."""
    import ray.data

    from luzzu_ray.ops.events import funnel_users

    rng = np.random.default_rng(84)
    n = 3000
    uid = rng.integers(0, 60, n).astype(np.int64)
    ts = rng.choice(10**6, n, replace=False).astype(np.int64) * 1_000_000
    et = rng.choice(["A", "B", "other"], n, p=[0.3, 0.3, 0.4])
    t = pa.table(
        {"user_id": pa.array(uid),
         "ts": pa.array(ts, pa.timestamp("us")),
         "event_type": pa.array(et)}
    )
    W = 40_000 * 1_000_000
    want = {}
    for u in np.unique(uid):
        m = uid == u
        a = ts[m & (et == "A")]
        if not len(a):
            continue
        ta = a.min()
        b = ts[m & (et == "B") & (ts >= ta)]
        tb = int(b.min()) if len(b) else None
        want[int(u)] = (int(ta), tb,
                        tb is not None and tb - ta <= W)
    for parts in (1, 7):
        got = {r["user_id"]: (
                   int(r["ts_a"].timestamp() * 1e6) if hasattr(r["ts_a"], "timestamp") else r["ts_a"],
                   None if r["ts_b"] is None else int(r["ts_b"].timestamp() * 1e6),
                   r["converted"])
               for r in funnel_users(
                   ray.data.from_arrow(t).repartition(parts),
                   "A", "B", W, 5,
               ).take_all()}
        assert got == want, parts


def test_chunk_documents_matches_twin(ray_session):
    """Sliding-window chunks equal the Python slicing twin: overlap,
    short tails, single-chunk docs, empty text."""
    import ray.data

    from luzzu_ray.ops.vocab import chunk_documents

    rng = np.random.default_rng(85)
    vocab = ["t%d" % i for i in range(30)]
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 40)))
            for _ in range(200)]
    docs[0] = ""
    docs[1] = " ".join(["x"] * 7)  # exactly one stride over window=5
    t = pa.table({"doc_id": pa.array(np.arange(200, dtype=np.int64)),
                  "text": pa.array(docs)})
    W, S = 5, 3
    want = set()
    for i, d in enumerate(docs):
        toks = d.split(" ")
        T = len(toks)
        nk = 1 + max(0, (max(T - W, 0) + S - 1) // S)
        for ci in range(nk):
            seg = toks[ci * S: min(ci * S + W, T)]
            want.add((i, ci, " ".join(seg), len(seg)))
    for parts in (1, 6):
        got = {(r["doc_id"], r["chunk_idx"], r["chunk_text"],
                r["n_tokens"])
               for r in chunk_documents(
                   ray.data.from_arrow(t).repartition(parts), W, S,
               ).take_all()}
        assert got == want, parts


def test_outer_hash_join_matches_duckdb(ray_session):
    """LEFT and FULL outer hash joins equal DuckDB on a corpus with
    null keys on both sides, 1:N duplication, unmatched rows in both
    directions, and (separately) string keys."""
    import duckdb
    import pandas as pd
    import ray.data

    from luzzu_ray.ops.relational import outer_hash_join

    rng = np.random.default_rng(7)
    n_l, n_r = 3000, 4000
    lk = rng.integers(0, 500, n_l).astype(object)
    lk[rng.random(n_l) < 0.03] = None
    rk = rng.integers(200, 700, n_r).astype(object)
    rk[rng.random(n_r) < 0.03] = None
    lt = pa.table({"k": pa.array(list(lk), pa.int64()),
                   "lv": pa.array(np.arange(n_l, dtype=np.int64))})
    rt = pa.table({"rk": pa.array(list(rk), pa.int64()),
                   "rv": pa.array(np.arange(n_r, dtype=np.int64) * 10)})
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)

    def canon(df):
        df = df.astype({c: "Int64" for c in df.columns})
        return (df.sort_values(list(df.columns), na_position="first")
                  .reset_index(drop=True))

    for how, sql in [
        ("left", "SELECT l.k, l.lv, r.rv FROM l LEFT JOIN r ON l.k = r.rk"),
        ("full", "SELECT coalesce(l.k, r.rk) AS k, l.lv, r.rv "
                 "FROM l FULL JOIN r ON l.k = r.rk"),
    ]:
        got = canon(outer_hash_join(
            ray.data.from_arrow(lt).repartition(5),
            ray.data.from_arrow(rt).repartition(7),
            "k", "rk", ["lv"], ["rv"], how=how, num_partitions=6,
        ).to_pandas())
        want = canon(con.execute(sql).df())
        assert got.equals(want), how

    # string keys exercise the dictionary-encoded code path
    ls = pa.table({"k": pa.array(
        [f"s{i % 40}" if i % 11 else None for i in range(300)]),
        "lv": pa.array(np.arange(300, dtype=np.int64))})
    rs = pa.table({"rk": pa.array(
        [f"s{i % 60}" if i % 13 else None for i in range(250)]),
        "rv": pa.array(np.arange(250, dtype=np.int64) * 2)})
    con.register("ls", ls)
    con.register("rs", rs)
    got = outer_hash_join(
        ray.data.from_arrow(ls), ray.data.from_arrow(rs),
        "k", "rk", ["lv"], ["rv"], how="full", num_partitions=4,
    ).to_pandas()
    want = con.execute(
        "SELECT coalesce(ls.k, rs.rk) AS k, ls.lv, rs.rv "
        "FROM ls FULL JOIN rs ON ls.k = rs.rk").df()
    gi = got.astype({"lv": "Int64", "rv": "Int64"}).sort_values(
        ["k", "lv", "rv"], na_position="first").reset_index(drop=True)
    wi = want.astype({"lv": "Int64", "rv": "Int64"}).sort_values(
        ["k", "lv", "rv"], na_position="first").reset_index(drop=True)
    assert gi.equals(wi)


def test_bigram_next_topk_matches_duckdb(ray_session):
    """Bigram LM table equals the SQL window twin across block layouts;
    edge cases: empty text, single-token docs, heavy tie-breaking."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.vocab import bigram_next_topk

    rng = np.random.default_rng(31)
    vocab = ["a", "b", "c", "dd", "e5"]
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 30)))
            for _ in range(400)]
    docs[0] = ""          # -> [""] single token, no pair
    docs[1] = "solo"
    docs[2] = "a a a a"   # self-bigrams
    t = pa.table({"doc_id": pa.array(np.arange(400, dtype=np.int64)),
                  "text": pa.array(docs)})
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) w,
                        generate_subscripts(string_split(text,' '),1) i
                      FROM t),
             big AS (SELECT w AS w1, lead(w) OVER (
                       PARTITION BY doc_id ORDER BY i) w2 FROM toks),
             cnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) n FROM big
                     WHERE w2 IS NOT NULL GROUP BY 1,2)
        SELECT w1, w2, n, CAST(row_number() OVER (
          PARTITION BY w1 ORDER BY n DESC, w2) AS BIGINT) rk
        FROM cnt QUALIFY rk <= 2
        ORDER BY w1, rk
    """).df()
    for parts in (1, 7):
        got = bigram_next_topk(
            ray.data.from_arrow(t).repartition(parts), k=2,
        ).to_pandas().sort_values(["w1", "rk"]).reset_index(drop=True)
        assert got.equals(want), parts


def test_profile_table_matches_duckdb(ray_session):
    """Column profiler equals the SQL UNION ALL twin across layouts;
    traps covered: numeric min/max over values whose STRING order
    differs ("9" vs "10"), nulls in both int and string columns, an
    all-null column, duplicate values across blocks."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.profile import profile_table

    rng = np.random.default_rng(11)
    n = 2000
    iv = rng.integers(5, 1500, n).astype(object)   # "9" < "10" trap
    iv[rng.random(n) < 0.1] = None
    sv = np.array([f"v{int(x)}" for x in rng.integers(0, 80, n)],
                  dtype=object)
    sv[rng.random(n) < 0.05] = None
    t = pa.table({
        "iv": pa.array(list(iv), pa.int64()),
        "sv": pa.array(list(sv), pa.string()),
        "nil": pa.nulls(n, pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    one = ("SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) n_rows, "
           "CAST(count(*) - count({c}) AS BIGINT) n_nulls, "
           "CAST(count(DISTINCT {c}) AS BIGINT) n_distinct, "
           "CAST(min({c}) AS VARCHAR) min_val, "
           "CAST(max({c}) AS VARCHAR) max_val FROM t")
    want = con.execute(
        " UNION ALL ".join(one.format(c=c) for c in ("iv", "sv", "nil"))
        + " ORDER BY col_name"
    ).df()
    for parts in (1, 9):
        got = profile_table(
            ray.data.from_arrow(t).repartition(parts),
            ["iv", "sv", "nil"],
        ).to_pandas().sort_values("col_name").reset_index(drop=True)
        got = got[list(want.columns)]
        assert got.equals(want), parts


def test_dataset_diff_matches_duckdb(ray_session):
    """Per-key diff status equals the SQL FULL JOIN twin, including
    null-text rows on either side (null == null is 'same') and keys
    present only once on either side."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import dataset_diff

    rng = np.random.default_rng(23)
    o_ids = np.arange(0, 900, dtype=np.int64)
    n_ids = np.arange(300, 1200, dtype=np.int64)
    def txt(ids, flip):
        out = np.array([f"t{i % 37}" for i in ids], dtype=object)
        out[rng.random(len(ids)) < 0.05] = None
        if flip:
            m = ids % 5 == 0
            out[m] = [f"x{i}" for i in ids[m]]
        return out
    ot, nt = txt(o_ids, False), txt(n_ids, True)
    old = pa.table({"doc_id": pa.array(o_ids), "text": pa.array(list(ot))})
    new = pa.table({"doc_id": pa.array(n_ids), "text": pa.array(list(nt))})
    con = duckdb.connect()
    con.register("o", old)
    con.register("n", new)
    want = con.execute("""
      SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, CASE
        WHEN o.doc_id IS NULL THEN 'added'
        WHEN n.doc_id IS NULL THEN 'removed'
        WHEN o.text IS NOT DISTINCT FROM n.text THEN 'same'
        ELSE 'changed' END AS status
      FROM o FULL JOIN n ON o.doc_id = n.doc_id ORDER BY doc_id
    """).df()
    got = dataset_diff(
        ray.data.from_arrow(old).repartition(4),
        ray.data.from_arrow(new).repartition(3),
        "doc_id", "doc_id", "text", "text", num_partitions=5,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)


def test_bpe_pair_counts_matches_duckdb(ray_session):
    """Byte-pair statistic equals the SQL character twin on an ASCII
    corpus across block layouts; edge cases: 1-byte words (no pair),
    empty text, repeated chars."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.vocab import bpe_pair_counts

    rng = np.random.default_rng(41)
    alpha = list("abcdez019")
    docs = [" ".join("".join(rng.choice(alpha, rng.integers(1, 9)))
                     for _ in range(rng.integers(1, 15)))
            for _ in range(300)]
    docs[0] = ""
    docs[1] = "a b c"      # only 1-byte words
    docs[2] = "aaaa"       # overlapping identical pairs
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(docs)})
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
      WITH words AS (SELECT doc_id, unnest(string_split(text,' ')) w,
                       generate_subscripts(string_split(text,' '),1) wi
                     FROM t),
           ch AS (SELECT doc_id, wi, unnest(regexp_extract_all(w,'.')) c,
                    generate_subscripts(regexp_extract_all(w,'.'),1) ci
                  FROM words),
           p AS (SELECT c || lead(c) OVER (
                   PARTITION BY doc_id, wi ORDER BY ci) AS pair FROM ch)
      SELECT pair, CAST(count(*) AS BIGINT) n FROM p
      WHERE pair IS NOT NULL GROUP BY pair
      ORDER BY n DESC, pair LIMIT 10
    """).df()
    for parts in (1, 6):
        got = bpe_pair_counts(
            ray.data.from_arrow(t).repartition(parts), k=10,
        ).to_pandas().reset_index(drop=True)
        assert got.equals(want), parts


def test_embedding_gram_matches_numpy(ray_session):
    """Fixed-point Gram matrix equals the quantized NumPy product
    exactly, independent of block layout."""
    import ray.data

    from luzzu_ray.ops.similarity import embedding_gram

    rng = np.random.default_rng(5)
    n, d = 400, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(x), pa.list_(pa.float32()))})
    qv = np.floor(x.astype(np.float64) * 1000.0).astype(np.int64)
    g = qv.T @ qv
    iu, ju = np.triu_indices(d)
    want = {(int(i) + 1, int(j) + 1): int(g[i, j]) for i, j in zip(iu, ju)}
    for parts in (1, 7):
        rows = embedding_gram(
            ray.data.from_arrow(t).repartition(parts), q=3,
        ).take_all()
        got = {(r["i"], r["j"]): r["s"] for r in rows}
        assert got == want, parts


def test_grouped_argmax_matches_duckdb(ray_session):
    """Mergeable per-group argmax equals the SQL QUALIFY twin across
    layouts, including single-row groups and heavy ties on order_col."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import grouped_argmax

    rng = np.random.default_rng(17)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.integers(0, 300, n).astype(np.int64)),
        "o": pa.array(rng.integers(0, 50, n).astype(np.int64)),  # ties
        "tid": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array([f"p{i % 13}" for i in range(n)]),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
      SELECT k, o, tid, payload FROM t
      QUALIFY row_number() OVER (PARTITION BY k ORDER BY o DESC, tid) = 1
      ORDER BY k
    """).df()
    for parts in (1, 8):
        got = grouped_argmax(
            ray.data.from_arrow(t).repartition(parts),
            "k", "o", "tid", ["payload"], num_partitions=5,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        assert got.equals(want), parts


def test_pca_project_exact_and_layout_invariant(ray_session):
    """Integer PCA projection equals the NumPy twin exactly and is
    invariant to block layout; components are sign-canonical."""
    import ray.data

    from luzzu_ray.ops.similarity import (
        pca_components_from_gram,
        pca_project,
    )

    rng = np.random.default_rng(3)
    n, d = 300, 6
    x = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(x), pa.list_(pa.float32()))})
    qe = np.floor(x.astype(np.float64) * 1000.0).astype(np.int64)
    comp = pca_components_from_gram(qe.T @ qe, k=2, qv=6)
    want = qe @ comp
    for parts in (1, 5):
        rows = pca_project(
            ray.data.from_arrow(t).repartition(parts), k=2,
        ).take_all()
        got = {r["vec_id"]: (r["p1"], r["p2"]) for r in rows}
        assert len(got) == n
        for i in range(n):
            assert got[i] == (int(want[i, 0]), int(want[i, 1])), (parts, i)
    # sign canon: flipping input rows' order must not flip components
    comp2 = pca_components_from_gram(qe[::-1].T @ qe[::-1], k=2, qv=6)
    assert (comp == comp2).all()


def test_grouped_argmax_null_and_unsigned_order(ray_session):
    """Null order values (NaT / null ints) LOSE their group (SQL ORDER
    BY o DESC NULLS LAST), and uint64 order columns don't wrap under
    the descending transform."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import grouped_argmax

    # timestamps with NaT: the null-ts row must never win unless alone
    ts = pa.array(
        [1_000, None, 2_000, None, 500, None],
        pa.timestamp("ms"),
    )
    t = pa.table({
        "k": pa.array([0, 0, 0, 1, 1, 2], pa.int64()),
        "o": ts,
        "tid": pa.array(np.arange(6, dtype=np.int64)),
        "payload": pa.array([f"p{i}" for i in range(6)]),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
      SELECT k, o, tid, payload FROM t
      QUALIFY row_number() OVER (PARTITION BY k ORDER BY o DESC, tid) = 1
      ORDER BY k
    """).df()
    for parts in (1, 3):
        got = grouped_argmax(
            ray.data.from_arrow(t).repartition(parts),
            "k", "o", "tid", ["payload"], num_partitions=2,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        assert got.equals(want), parts

    # uint64 order col: 0 must not beat the max via negation wrap
    u = pa.table({
        "k": pa.array([0, 0], pa.int64()),
        "o": pa.array([0, np.iinfo(np.uint64).max], pa.uint64()),
        "tid": pa.array([0, 1], pa.int64()),
    })
    rows = grouped_argmax(
        ray.data.from_arrow(u), "k", "o", "tid", [], num_partitions=1,
    ).take_all()
    assert len(rows) == 1 and rows[0]["tid"] == 1


def test_dataset_diff_null_keys_excluded(ray_session):
    """NULL keys identify nothing: rows with a null key on either side
    are excluded from the diff (pinned against the SQL twin with
    explicit IS NOT NULL guards)."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import dataset_diff

    old = pa.table({
        "doc_id": pa.array([1, 2, None, 4], pa.int64()),
        "text": pa.array(["a", "b", "null-key-old", "d"]),
    })
    new = pa.table({
        "doc_id": pa.array([2, None, 5], pa.int64()),
        "text": pa.array(["B", "null-key-new", "e"]),
    })
    con = duckdb.connect()
    con.register("o", old)
    con.register("n", new)
    want = con.execute("""
      WITH oo AS (SELECT * FROM o WHERE doc_id IS NOT NULL),
           nn AS (SELECT * FROM n WHERE doc_id IS NOT NULL)
      SELECT coalesce(oo.doc_id, nn.doc_id) AS doc_id, CASE
        WHEN oo.doc_id IS NULL THEN 'added'
        WHEN nn.doc_id IS NULL THEN 'removed'
        WHEN oo.text IS NOT DISTINCT FROM nn.text THEN 'same'
        ELSE 'changed' END AS status
      FROM oo FULL JOIN nn ON oo.doc_id = nn.doc_id ORDER BY doc_id
    """).df()
    got = dataset_diff(
        ray.data.from_arrow(old), ray.data.from_arrow(new),
        "doc_id", "doc_id", "text", "text", num_partitions=2,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)


def test_pca_project_empty_input_raises(ray_session):
    """An empty embeddings input fails with a clear op-named error, not
    a bare max()-of-empty ValueError."""
    import ray.data

    from luzzu_ray.ops.similarity import pca_project

    t = pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="pca_project"):
        pca_project(ray.data.from_arrow(t), k=2)


def test_oracle_sql_missing_corpus_degrades(tmp_path, monkeypatch):
    """Data-derived oracles (PCA / k-means IVF literals) degrade to
    rows-only — the entries are OMITTED — when the oracle corpus is
    absent, instead of crashing oracle_sql() for all queries."""
    import __ray_entry__ as E

    monkeypatch.setenv("GRAFT_ORACLE_SF_DIR", str(tmp_path))
    sqls = E.oracle_sql()
    assert "pca_project2" not in sqls
    assert "ivf_kmeans_ann_topk" not in sqls
    assert "doc_stats" in sqls  # everything else intact


def test_token_cooccurrence_matches_duckdb(ray_session):
    """Within-doc distinct-pair counts equal the SQL twin across block
    layouts; the per-doc cap is part of the spec (mirrored via
    QUALIFY row_number <= cap)."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.vocab import token_cooccurrence

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 25)))
        for _ in range(400)
    ]
    texts += ["", "solo", "a a a a"]  # empty, single, all-same
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    con = duckdb.connect()
    con.register("documents", t)
    for cap in (512, 4):  # no-op cap and a binding cap
        want = con.execute(f"""
          WITH toks AS (SELECT DISTINCT doc_id,
                 unnest(string_split(text, ' ')) AS tok FROM documents),
          capped AS (SELECT doc_id, tok FROM toks QUALIFY
                 row_number() OVER (PARTITION BY doc_id ORDER BY tok)
                 <= {cap}),
          pairs AS (SELECT a.tok AS w1, b.tok AS w2 FROM capped a
                 JOIN capped b ON a.doc_id = b.doc_id AND a.tok < b.tok)
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM pairs
          GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 40
        """).df()
        for parts in (1, 7):
            got = token_cooccurrence(
                ray.data.from_arrow(t).repartition(parts), k=40, cap=cap,
            ).to_pandas().reset_index(drop=True)
            assert got.equals(want), (cap, parts)


def test_grouped_count_share_matches_duckdb(ray_session):
    """Ratio-to-report integers (n, key_total) equal the SQL window
    twin across layouts, including single-subkey keys."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import grouped_count_share

    rng = np.random.default_rng(7)
    n = 4000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 120, n).astype(np.int64)),
        "event_type": pa.array(
            [f"t{i}" for i in rng.integers(0, 6, n)]),
    })
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(count(*)) OVER (PARTITION BY user_id) AS BIGINT)
               AS key_total
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type
    """).df()
    for parts in (1, 9):
        got = grouped_count_share(
            ray.data.from_arrow(t).repartition(parts),
            "user_id", "event_type", num_partitions=4,
        ).to_pandas().sort_values(
            ["user_id", "event_type"]).reset_index(drop=True)
        assert got.equals(want), parts


def test_grouped_distinct_count_and_division(ray_session):
    """Exact grouped distinct count equals SQL count(DISTINCT) across
    layouts (null values ignored), and relational division (== global
    distinct count) actually filters."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import grouped_distinct_count

    rng = np.random.default_rng(11)
    n = 1500
    n_types_gen = 12
    vals = np.array([f"t{i:02d}" for i in rng.integers(0, n_types_gen, n)],
                    dtype=object)
    vals[rng.random(n) < 0.03] = None  # nulls ignored by COUNT
    users = rng.integers(0, 60, n).astype(np.int64)
    # users 0-4 get one row of EVERY type -> guaranteed "full" users;
    # the random bulk (~25 rows/user over 12 types) leaves others short
    full_u = np.repeat(np.arange(5, dtype=np.int64), n_types_gen)
    full_v = np.array(
        [f"t{i:02d}" for _ in range(5) for i in range(n_types_gen)],
        dtype=object)
    t = pa.table({
        "user_id": pa.array(np.concatenate([users, full_u])),
        "event_type": pa.array(list(vals) + list(full_v)),
    })
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
      SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT)
        AS n_distinct FROM events GROUP BY user_id ORDER BY user_id
    """).df()
    for parts in (1, 6):
        got = grouped_distinct_count(
            ray.data.from_arrow(t).repartition(parts),
            "user_id", "event_type", num_partitions=3,
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        assert got.equals(want), parts
    # division discriminates: some users lack some types
    full = set(
        con.execute("""
          SELECT user_id FROM events GROUP BY user_id
          HAVING count(DISTINCT event_type) =
            (SELECT count(DISTINCT event_type) FROM events)
        """).df()["user_id"]
    )
    assert 0 < len(full) < 60  # the filter must actually bind
    n_types = len(set(v for v in vals if v is not None))
    got_ids = {
        r["user_id"]
        for r in grouped_distinct_count(
            ray.data.from_arrow(t), "user_id", "event_type",
        ).take_all()
        if r["n_distinct"] == n_types
    }
    assert got_ids == full


def test_grouped_distinct_count_composite_key(ray_session):
    """Composite (multi-column) group keys equal SQL count(DISTINCT v)
    GROUP BY k1, k2 across block layouts — the TPC-H Q16 shape."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import grouped_distinct_count

    rng = np.random.default_rng(23)
    n = 2000
    t = pa.table({
        "brand": pa.array([f"B{i}" for i in rng.integers(0, 7, n)]),
        "size": pa.array(rng.integers(1, 6, n).astype(np.int64)),
        "supp": pa.array(rng.integers(0, 40, n).astype(np.int64)),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
      SELECT brand, size, CAST(count(DISTINCT supp) AS BIGINT)
        AS n_distinct FROM t GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    for parts in (1, 7):
        got = grouped_distinct_count(
            ray.data.from_arrow(t).repartition(parts),
            ["brand", "size"], "supp", num_partitions=3,
        ).to_pandas().sort_values(["brand", "size"]).reset_index(drop=True)
        assert got.equals(want), parts


def test_grouped_mad_matches_duckdb(ray_session):
    """Two-pass exact MAD equals the SQL quantile_disc twin across
    layouts, including negative values and single-row groups."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import grouped_mad_q

    rng = np.random.default_rng(13)
    n = 2500
    t = pa.table({
        "user_id": pa.array(
            np.concatenate([rng.integers(0, 50, n - 1), [999]])
            .astype(np.int64)),  # 999: single-row group
        "value": pa.array(rng.normal(0, 40, n)),
    })
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
      WITH v AS (SELECT user_id,
             CAST(floor(value * 10000.0) AS BIGINT) AS vq FROM events),
      m AS (SELECT user_id, quantile_disc(vq, 0.5) AS med
            FROM v GROUP BY user_id)
      SELECT v.user_id,
             quantile_disc(CAST(abs(v.vq - m.med) AS BIGINT), 0.5)
               AS mad_q0,
             CAST(count(*) AS BIGINT) AS n
      FROM v JOIN m USING (user_id) GROUP BY v.user_id ORDER BY v.user_id
    """).df()
    for parts in (1, 5):
        got = grouped_mad_q(
            ray.data.from_arrow(t).repartition(parts),
            "user_id", "value", num_partitions=4,
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        assert got.equals(want), parts


def test_cms_token_counts_exact_and_one_sided(ray_session):
    """Count-min estimates are layout-invariant, one-sided
    (est >= true occurrence count for every probe), and exact for
    tokens whose cells suffer no collisions (checked via true counts)."""
    import re

    import ray.data

    from luzzu_ray.ops.sketch import cms_token_counts

    rng = np.random.default_rng(29)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(300)
    ] + ["", "tok0 tok0 tok0"]
    t = pa.table({"text": pa.array(texts)})
    true = {}
    for s in texts:
        for w in re.findall(r"[a-z0-9]+", s.lower()):
            true[w] = true.get(w, 0) + 1
    probes = vocab[:10] + ["absenttoken"]
    first = None
    for parts in (1, 6):
        got = cms_token_counts(
            ray.data.from_arrow(t).repartition(parts), probes,
        ).to_pydict()
        ests = dict(zip(got["token"], got["est"]))
        if first is None:
            first = ests
        assert ests == first, parts  # layout-invariant
        for p in probes:
            assert ests[p] >= true.get(p, 0), p  # one-sided error
    # with 40 tokens in 1024 cells x 4 rows, collisions are rare:
    # at least 8 of the 10 present probes must be exact
    exact = sum(1 for p in probes[:10] if first[p] == true[p])
    assert exact >= 8, first


def test_compression_ratio_matches_scalar_twin(ray_session):
    """Batched zlib kernel equals the row-at-a-time twin, including
    null and empty text."""
    import ray.data

    from luzzu_ray.ops.textstats import (
        compression_ratio_batch,
        compression_ratio_py,
    )

    texts = ["hello world " * 50, "", None, "abc", "a" * 10_000,
             "the quick brown fox"]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    got = ray.data.from_arrow(t).repartition(3).map_batches(
        compression_ratio_batch, batch_format="pyarrow",
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(texts):
        raw, comp, ratio = compression_ratio_py(s)
        assert got.loc[i, "raw_len"] == raw
        assert got.loc[i, "comp_len"] == comp
        assert got.loc[i, "ratio_q4"] == ratio
        assert bool(got.loc[i, "is_null_text"]) == (s is None)


def test_prefix_contained_matches_duckdb(ray_session):
    """Prefix-containment flags equal the correlated-EXISTS twin across
    layouts, exercising all three engine paths: long bucketed docs,
    short broadcast docs (incl. empty string), null text, equal texts,
    and prefixes that are NOT immediate sorted neighbors globally."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.dedup import prefix_contained

    texts = [
        "the quick brown fox jumps",      # container
        "the quick brown",                 # long prefix of 0
        "the quick brillig",               # same bucket, not a prefix
        "the quick brown fox jumps",      # equal text -> both contained
        "zebra crossing ahead",            # unique long
        "the",                             # short: prefix of 0,1,2,3
        "zzz",                             # short: prefix of nothing
        "",                                # empty: prefix of everything
        None,                              # null: never contained
        "zebra",                           # short: prefix of 4
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
      SELECT a.doc_id, EXISTS(SELECT 1 FROM documents b
        WHERE b.doc_id <> a.doc_id AND b.text IS NOT NULL
        AND a.text IS NOT NULL AND starts_with(b.text, a.text))
        AS is_prefix_dup
      FROM documents a ORDER BY a.doc_id
    """).df()
    for parts in (1, 4):
        got = prefix_contained(
            ray.data.from_arrow(t).repartition(parts), num_partitions=3,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want), parts


def test_hourly_dense_gap_fill_matches_duckdb(ray_session):
    """Dense hourly counts equal the generate_series twin across
    layouts: gaps zero-filled, ranges per type independent."""
    import duckdb
    import ray.data

    rng = np.random.default_rng(31)
    base = 1_700_000_000_000_000  # epoch us
    n = 2000
    ts = base + rng.integers(0, 72, n) * 3_600_000_000 \
        + rng.integers(0, 3_600_000_000, n)
    # type 'b' gets a sparse far-apart pair -> long gap to fill
    extra_ts = np.array([base, base + 50 * 3_600_000_000])
    t = pa.table({
        "event_type": pa.array(
            [f"e{i}" for i in rng.integers(0, 3, n)] + ["gappy"] * 2),
        "ts": pa.array(
            np.concatenate([ts, extra_ts]), pa.timestamp("us")),
    })
    from luzzu_ray.ops.events import hourly_dense

    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
      WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             count(*) AS n FROM events GROUP BY 1, 2),
      b AS (SELECT event_type, min(hr) AS mn, max(hr) AS mx
            FROM h GROUP BY 1),
      d AS (SELECT b.event_type, unnest(generate_series(b.mn, b.mx))
            AS hr FROM b)
      SELECT d.event_type, d.hr AS hour_bucket,
             CAST(coalesce(h.n, 0) AS BIGINT) AS n
      FROM d LEFT JOIN h ON d.event_type = h.event_type AND d.hr = h.hr
      ORDER BY d.event_type, hour_bucket
    """).df()
    for parts in (1, 5):
        got = hourly_dense(
            ray.data.from_arrow(t).repartition(parts), num_partitions=3,
        ).to_pandas().sort_values(
            ["event_type", "hour_bucket"]).reset_index(drop=True)
        assert got.equals(want), parts
    # the gap really was filled with zeros
    gappy = want[want.event_type == "gappy"]
    assert len(gappy) == 51 and (gappy.n == 0).sum() == 49


def test_split_by_source_deterministic_and_grouped(ray_session):
    """Split labels are a pure function of source (leakage-safe), match
    the SQL hash twin, and are layout-invariant."""
    import duckdb
    import ray.data

    import __ray_entry__ as E

    t = pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.int64)),
        "source": pa.array([f"s{i % 23}" for i in range(200)]),
    })
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = E.q_docs_split_by_source(d).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(
        E.oracle_sql()["docs_split_by_source"] + " ORDER BY doc_id"
    ).df()
    assert got.equals(want)
    # grouped: one split label per source
    assert (got.groupby("source")["split"].nunique() == 1).all()


def test_grouped_winsorize_matches_duckdb(ray_session):
    """Per-group winsorized values equal the SQL quantile_disc clip
    twin across layouts, including single-row groups (clip is a
    no-op there)."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import grouped_winsorize_q

    rng = np.random.default_rng(37)
    n = 3000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(
            np.concatenate([rng.integers(0, 40, n - 1), [888]])
            .astype(np.int64)),
        "value": pa.array(rng.normal(0, 25, n)),
    })
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
      WITH v AS (SELECT event_id, user_id,
             CAST(floor(value * 10000.0) AS BIGINT) AS value_q4
             FROM events),
      c AS (SELECT user_id, quantile_disc(value_q4, 0.05) AS lo,
            quantile_disc(value_q4, 0.95) AS hi FROM v GROUP BY user_id)
      SELECT v.event_id, v.user_id, v.value_q4,
             CAST(least(greatest(v.value_q4, c.lo), c.hi) AS BIGINT)
               AS value_wins_q4
      FROM v JOIN c USING (user_id) ORDER BY v.event_id
    """).df()
    for parts in (1, 6):
        got = grouped_winsorize_q(
            ray.data.from_arrow(t).repartition(parts),
            "user_id", "value", "event_id", num_partitions=4,
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        assert got.equals(want), parts


def test_csv_roundtrip_quoting(ray_session, tmp_path):
    """CSV source handles commas, quotes and unicode in text: the
    roundtripped stats equal the parquet-side truth."""
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    texts = ['plain text', 'with, comma', 'with "quotes" inside',
             "trailing space ", "unicode éè", "a,b,\"c\",d"]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s0"] * len(texts)),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = E.q_documents_csv_roundtrip(str(tmp_path)).to_pandas(
    ).sort_values("doc_id").reset_index(drop=True)
    assert list(got["n_chars"]) == [len(s) for s in texts]
    assert (got["lang"] == "en").all() and (got["source"] == "s0").all()


def test_salted_join_equals_plain(ray_session):
    """Salted inner join returns EXACTLY the plain join's multiset on
    heavily skewed keys (one key holding half the left side), and on
    threshold settings where no key is hot (salting a no-op)."""
    import ray.data

    from luzzu_ray.ops.relational import salted_inner_join

    rng = np.random.default_rng(43)
    n = 4000
    k = np.where(rng.random(n) < 0.5, 7,
                 rng.integers(0, 200, n)).astype(np.int64)
    left = pa.table({
        "k": pa.array(k),
        "lv": pa.array(np.arange(n, dtype=np.int64)),
    })
    right = pa.table({
        "k": pa.array(np.arange(0, 200, dtype=np.int64)),
        "rv": pa.array(np.arange(0, 200, dtype=np.int64) * 10),
    })
    lds = ray.data.from_arrow(left).repartition(5)
    rds = ray.data.from_arrow(right).repartition(2)
    plain = lds.join(rds, join_type="inner", on=("k",), num_partitions=4
                     ).to_pandas().sort_values(["k", "lv"]).reset_index(
        drop=True)
    for thr in (100, 10**9):  # hot path bites / salting a no-op
        got = salted_inner_join(
            ray.data.from_arrow(left).repartition(5),
            ray.data.from_arrow(right).repartition(2),
            "k", hot_threshold=thr, n_salt=4, num_partitions=4,
        ).to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
        assert got[plain.columns.tolist()].equals(plain), thr


def test_dup_trigram_positions_matches_duckdb(ray_session):
    """Duplicate-trigram coverage equals the SQL window twin across
    layouts: overlapping duplicated trigrams count positions once,
    short docs (<3 tokens) are zero, null text is (0, 0)."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.vocab import dup_trigram_positions

    rng = np.random.default_rng(47)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab -> many dup trigrams
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 40)))
        for _ in range(300)
    ] + ["a b a b a b a b", "x y z", "one two", "solo", "", None]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    con = duckdb.connect()
    con.register("documents", t)
    import __ray_entry__ as E

    want = con.execute(
        E.oracle_sql()["doc_dup_trigram_frac"] + " ORDER BY d.doc_id"
    ).df()
    for parts in (1, 5):
        got = dup_trigram_positions(
            ray.data.from_arrow(t).repartition(parts),
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want), parts


def test_count_share_and_hourly_dense_null_safe(ray_session):
    """Null keys/subkeys form their own SQL groups in count_share; null
    ts rows are excluded and null event_type keeps its own dense range
    in hourly_dense (dict-index NaN -> INT64_MIN garbage pinned)."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.events import hourly_dense
    from luzzu_ray.ops.relational import grouped_count_share

    t = pa.table({
        "user_id": pa.array([1, 1, None, 2, None], pa.int64()),
        "event_type": pa.array(["a", None, "a", "b", None]),
    })
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(count(*)) OVER (PARTITION BY user_id) AS BIGINT)
               AS key_total
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id NULLS LAST, event_type NULLS LAST
    """).df()
    got = grouped_count_share(
        ray.data.from_arrow(t), "user_id", "event_type",
        num_partitions=2,
    ).to_pandas().sort_values(
        ["user_id", "event_type"], na_position="last"
    ).reset_index(drop=True)
    assert got.equals(want)

    base = 1_700_000_000_000_000
    e = pa.table({
        "event_type": pa.array(["a", "a", None, "b", None]),
        "ts": pa.array(
            [base, base + 7_200_000_000, base, None, base + 3_600_000_000],
            pa.timestamp("us")),
    })
    con2 = duckdb.connect()
    con2.register("events", e)
    want2 = con2.execute("""
      WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             count(*) AS n FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      b AS (SELECT event_type, min(hr) AS mn, max(hr) AS mx
            FROM h GROUP BY 1),
      d AS (SELECT b.event_type, unnest(generate_series(b.mn, b.mx))
            AS hr FROM b)
      SELECT d.event_type, d.hr AS hour_bucket,
             CAST(coalesce(h.n, 0) AS BIGINT) AS n
      FROM d LEFT JOIN h ON d.event_type IS NOT DISTINCT FROM
        h.event_type AND d.hr = h.hr
      ORDER BY d.event_type NULLS LAST, hour_bucket
    """).df()
    got2 = hourly_dense(
        ray.data.from_arrow(e), num_partitions=2,
    ).to_pandas().sort_values(
        ["event_type", "hour_bucket"], na_position="last"
    ).reset_index(drop=True)
    assert got2.equals(want2)


def test_salted_join_string_key(ray_session):
    """Salted join works on STRING keys (typed Arrow hot set, no int64
    assumption) with a hot key present."""
    import ray.data

    from luzzu_ray.ops.relational import salted_inner_join

    left = pa.table({
        "k": pa.array(["hot"] * 500 + [f"c{i}" for i in range(50)]),
        "lv": pa.array(np.arange(550, dtype=np.int64)),
    })
    right = pa.table({
        "k": pa.array(["hot"] + [f"c{i}" for i in range(50)]),
        "rv": pa.array(np.arange(51, dtype=np.int64)),
    })
    plain = ray.data.from_arrow(left).join(
        ray.data.from_arrow(right), join_type="inner", on=("k",),
        num_partitions=3,
    ).to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    got = salted_inner_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right),
        "k", hot_threshold=100, n_salt=3, num_partitions=3,
    ).to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    assert got[plain.columns.tolist()].equals(plain)


def test_cooccurrence_pairs_block_matches_bruteforce():
    import itertools

    import numpy as np
    import pyarrow as pa

    from luzzu_ray.ops.graph import _pairs_block

    rng = np.random.default_rng(7)
    g = rng.integers(0, 12, 400)
    it = rng.integers(0, 30, 400)
    t = pa.table({"g": pa.array(g, pa.int64()), "i": pa.array(it, pa.int64())})
    got = _pairs_block(t, "g", "i")
    got_pairs = sorted(zip(got["a"].to_pylist(), got["b"].to_pylist()))
    want = []
    for grp in np.unique(g):
        items = sorted(set(it[g == grp].tolist()))
        want.extend(itertools.combinations(items, 2))
    assert got_pairs == sorted(want)
    # empty block and single-item groups produce no pairs
    empty = _pairs_block(t.slice(0, 0), "g", "i")
    assert empty.num_rows == 0 and empty.column_names == ["a", "b"]


def test_kcore_matches_peel_twin(ray_session):
    """Distributed k-core peel equals a Python peel twin on a crafted
    clique+chain+random graph across layouts; over-tight max_rounds
    raises loudly; fully-dissolving graphs return an empty core."""
    import collections

    import pytest
    import ray.data

    from luzzu_ray.ops.graph import kcore_nodes

    rng = np.random.default_rng(83)
    edges = set()
    for i in range(12):            # 12-clique: the 4-core survivor
        for j in range(i + 1, 12):
            edges.add((i, j))
    for i in range(12, 40):        # pendant chain: peels over many rounds
        edges.add((i - 1, i))
    for _ in range(60):            # random sparse noise
        a, b = sorted(rng.integers(40, 90, 2).tolist())
        if a != b:
            edges.add((a, b))

    def peel(es, k):
        es = set(es)
        rounds = 0
        while True:
            deg = collections.Counter()
            for a, b in es:
                deg[a] += 1
                deg[b] += 1
            dead = {v for v, d in deg.items() if d < k}
            if not dead:
                return deg, rounds
            es = {(a, b) for a, b in es
                  if a not in dead and b not in dead}
            rounds += 1

    want, rounds = peel(edges, 4)
    assert rounds >= 2 and len(want) >= 12
    ea = np.array(sorted(edges), dtype=np.int64)
    t = pa.table({"a": pa.array(ea[:, 0]), "b": pa.array(ea[:, 1])})
    for parts in (1, 5):
        got = {
            r["node"]: r["core_deg"]
            for r in kcore_nodes(
                ray.data.from_arrow(t).repartition(parts),
                k=4, max_rounds=rounds + 2, num_partitions=3,
            ).take_all()
        }
        assert got == dict(want), parts
    with pytest.raises(ValueError, match="not converged"):
        kcore_nodes(ray.data.from_arrow(t), k=4, max_rounds=1,
                    num_partitions=3).take_all()
    # a graph that dissolves completely returns an empty table
    chain = pa.table({
        "a": pa.array(np.arange(0, 9, dtype=np.int64)),
        "b": pa.array(np.arange(1, 10, dtype=np.int64)),
    })
    assert kcore_nodes(ray.data.from_arrow(chain), k=3,
                       max_rounds=10, num_partitions=2).count() == 0


def test_triangle_counts_crafted_graph(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles) + pendant edge (4,5) + disjoint
    # triangle {6,7,8} -> 5 triangles, 10 edges
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
             (6, 7), (6, 8), (7, 8)]
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([a for a, _ in edges], pa.int64()),
        "b": pa.array([b for _, b in edges], pa.int64()),
    })).repartition(num_blocks=3)
    out = triangle_counts(ds, num_partitions=2)
    assert out["n_edges"][0].as_py() == 10
    assert out["n_triangles"][0].as_py() == 5
    # the wedge-join fallback plan (forced by a zero broadcast budget)
    # must agree with the broadcast edge-iterator plan exactly
    out_join = triangle_counts(ds, num_partitions=2, broadcast_max_edges=0)
    assert out_join["n_edges"][0].as_py() == 10
    assert out_join["n_triangles"][0].as_py() == 5


def test_triangle_plans_agree_random_graph(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.graph import triangle_counts

    # seeded G(n, m)-ish graph: 600 distinct oriented edges on 80 nodes
    rng = np.random.default_rng(7)
    a = rng.integers(0, 80, size=1200)
    b = rng.integers(0, 80, size=1200)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    mask = lo != hi
    packed = np.unique((lo[mask].astype(np.int64) << 8) | hi[mask])
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(packed >> 8, pa.int64()),
        "b": pa.array(packed & 255, pa.int64()),
    })).repartition(num_blocks=4)
    fast = triangle_counts(ds, num_partitions=3)
    slow = triangle_counts(ds, num_partitions=3, broadcast_max_edges=0)
    assert fast["n_edges"][0].as_py() == slow["n_edges"][0].as_py() == len(packed)
    assert fast["n_triangles"][0].as_py() == slow["n_triangles"][0].as_py()
    assert fast["n_triangles"][0].as_py() > 0


def test_pack_rejects_wide_ids():
    import numpy as np
    import pytest as _pytest

    from luzzu_ray.ops.graph import _pack

    with _pytest.raises(ValueError):
        _pack(np.array([1 << 40], np.int64), np.array([1], np.int64))


def test_line_dedup_crafted_and_layout_invariant(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.lines import line_dedup

    boiler = "the quick brown fox"
    docs = [
        f"{boiler} alpha beta",          # line0 = boiler+alpha? depends on W
        f"{boiler} gamma delta",
        f"{boiler} epsilon zeta",
        "unique words only here",
    ]
    t = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(docs),
    })
    # W=4: line 0 of docs 0-2 is exactly the boiler phrase -> DF 3 > 2
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(num_blocks=blocks)
        out = (
            line_dedup(ds, words_per_line=4, max_docs=2, num_partitions=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert out["n_removed"].tolist() == [1, 1, 1, 0]
        assert out["n_lines"].tolist() == [2, 2, 2, 1]
        assert out["text_clean"].tolist() == [
            "alpha beta", "gamma delta", "epsilon zeta",
            "unique words only here",
        ]


def test_line_dedup_all_boilerplate_doc_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.lines import line_dedup

    t = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["a b", "a b", "a b", "c d"]),
    })
    out = (
        line_dedup(ray.data.from_arrow(t), words_per_line=8, max_docs=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["text_clean"].tolist() == ["", "", "", "c d"]
    assert out["n_removed"].tolist() == [1, 1, 1, 0]


def test_unicode_stats_scalar_twin_and_layout():
    import numpy as np
    import pyarrow as pa

    from luzzu_ray.ops.textstats import unicode_stats_batch, unicode_stats_py

    texts = [
        "hello", "héllo wörld", "naïve — café ✓ 😀", "", None,
        "漢字テスト", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢", "mixed é漢😀 ascii", "߿ࠀ￿\U00010000",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = unicode_stats_batch(t)
    cols = ["n_bytes", "n_cp", "n_ascii", "n_2byte", "n_3byte", "n_4byte",
            "nonascii_frac_q4"]
    for i, txt in enumerate(texts):
        want = unicode_stats_py(txt)
        got = {k: out[k][i].as_py() for k in cols}
        assert got == want, (txt, got, want)
    # layout invariance: any batch split yields identical per-row stats
    parts = [unicode_stats_batch(t.slice(0, 4)), unicode_stats_batch(t.slice(4))]
    merged = pa.concat_tables(parts)
    assert merged.equals(out)
    # sliced-offset view (non-zero arrow offset) also agrees
    assert unicode_stats_batch(t.slice(3)).equals(out.slice(3))


def test_pagerank_plans_agree_and_match_scalar_twin(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.graph import PAGERANK_BASE, PAGERANK_SCALE, pagerank

    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, 500)
    b = rng.integers(0, 60, 500)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    m = lo != hi
    packed = np.unique((lo[m].astype(np.int64) << 8) | hi[m])
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(packed >> 8, pa.int64()),
        "b": pa.array(packed & 255, pa.int64()),
    })).repartition(num_blocks=3)
    fast = pagerank(ds, n_iter=3, num_partitions=3)
    slow = pagerank(ds, n_iter=3, num_partitions=3, broadcast_max_nodes=0)
    fd = dict(zip(fast["node"].to_pylist(), fast["rank_q"].to_pylist()))
    sd = dict(zip(slow["node"].to_pylist(), slow["rank_q"].to_pylist()))
    assert fd == sd
    # single-process integer twin
    deg = collections.Counter()
    adj = collections.defaultdict(list)
    for p in packed:
        x, y = int(p >> 8), int(p & 255)
        adj[x].append(y)
        adj[y].append(x)
        deg[x] += 1
        deg[y] += 1
    r = {n: PAGERANK_SCALE for n in deg}
    for _ in range(3):
        s = {n: 0 for n in deg}
        for n in deg:
            c = r[n] // deg[n]
            for nb in adj[n]:
                s[nb] += c
        r = {n: PAGERANK_BASE + (85 * s[n]) // 100 for n in deg}
    assert r == fd


def test_bm25_topk_block_layout_invariance(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.vocab import bm25_topk

    docs = [
        "hash join probe build", "vector scan filter", "hash hash hash",
        "nothing relevant here", "join order join", "", "scan",
        "vector vector hash join scan merge",
    ] * 4
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    outs = []
    for nb in (1, 3, 7):
        ds = ray.data.from_arrow(t).repartition(num_blocks=nb)
        out = bm25_topk(ds, ["hash", "join", "vector", "scan"], k=10)
        df = out.to_pandas().sort_values(["score_q6", "doc_id"],
                                         ascending=[False, True])
        outs.append(list(map(tuple, df.values)))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 10
    # the all-terms doc repeats rank at the top tier
    top_scores = {s for _, s in outs[0][:4]}
    assert len(top_scores) == 1


def test_bpe_train_matches_python_twin_any_layout(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.vocab import bpe_train, bpe_train_py

    texts = [
        "the cat sat on the mat", "the dog ate the food",
        "aaaaab banana bandana", "mississippi", "", None, "the the the",
    ] * 3
    t = pa.table({"text": pa.array(texts, pa.string())})
    want = bpe_train_py(texts, 10)
    assert want, "twin produced no merges"
    for nb in (1, 4):
        ds = ray.data.from_arrow(t).repartition(num_blocks=nb)
        out = bpe_train(ds, 10, num_partitions=3)
        got = list(zip(
            out["step"].to_pylist(), out["tok_a"].to_pylist(),
            out["tok_b"].to_pylist(), out["new_id"].to_pylist(),
            out["pair_count"].to_pylist(),
        ))
        assert got == want
    # run-overlap case: pair_count records all 8 adjacent (a,a)
    # positions; the apply step then merges greedily left-to-right
    aa = bpe_train_py(["aaa aaa aaaaa"], 1)
    assert aa[0][1] == aa[0][2] == ord("a") and aa[0][4] == 8


def test_distinct_set_op_semantics(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.relational import distinct_set_op

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "b", "c", None, None], pa.string()),
    })).repartition(num_blocks=3)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["b", "d", None], pa.string()),
    })).repartition(num_blocks=2)

    def vals(ds):
        out = []
        for b in ds.iter_batches(batch_format="pyarrow"):
            out.extend(b["k"].to_pylist())
        return sorted(out, key=lambda x: (x is None, x))

    inter = distinct_set_op(left, right, "k", "intersect", num_partitions=3)
    assert vals(inter) == ["b", None]      # NULL intersects with NULL
    exc = distinct_set_op(left, right, "k", "except", num_partitions=3)
    assert vals(exc) == ["a", "c"]         # distinct, NULL removed
    # no right-side nulls: left NULL survives EXCEPT
    right2 = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"], pa.string()),
    }))
    exc2 = distinct_set_op(left, right2, "k", "except", num_partitions=2)
    assert vals(exc2) == ["b", "c", None]


def test_validate_documents_counts(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.profile import DOC_RULES, validate_documents

    texts = ["ok text here", None, "", "ab", "x" * 25000,
             "!!!! ???? ####", "12345 67890 11 22 33"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    for nb in (1, 3):
        out = validate_documents(
            ray.data.from_arrow(t).repartition(num_blocks=nb))
        got = dict(zip(out["rule"].to_pylist(),
                       out["n_violations"].to_pylist()))
        assert set(got) == set(DOC_RULES)
        assert got["null_text"] == 1
        assert got["empty"] == 1
        assert got["too_short"] == 1      # "ab"
        assert got["too_long"] == 1       # 25k x
        assert got["symbol_heavy"] == 1   # punctuation row
        assert got["digit_heavy"] == 1    # digits row
        assert out["n_checked"].to_pylist() == [len(texts)] * len(DOC_RULES)


def test_sentence_stats_scalar_twin():
    import pyarrow as pa

    from luzzu_ray.ops.textstats import sentence_stats_batch

    texts = ["one. two. three", "nodots", "", None, "..", "a.b.c.", "x. "]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = sentence_stats_batch(t)
    for i, txt in enumerate(texts):
        tx = txt or ""
        sents = [s for s in tx.split(".") if s]
        n_chars = len(tx) - tx.count(".")
        assert out["n_sentences"][i].as_py() == len(sents), txt
        assert out["n_sentence_chars"][i].as_py() == n_chars
        assert (out["mean_sentence_len_q2"][i].as_py()
                == n_chars * 100 // max(len(sents), 1))


def test_user_growth_matches_scalar(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.events import DAY_US, user_growth

    rng = np.random.default_rng(5)
    uid = rng.integers(0, 40, 500)
    ts = rng.integers(0, 20 * DAY_US, 500)
    t = pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    first = {}
    for u, s in zip(uid.tolist(), ts.tolist()):
        d = s // DAY_US
        if u not in first or d < first[u]:
            first[u] = d
    counts = collections.Counter(first.values())
    days = sorted(counts)
    cum = np.cumsum([counts[d] for d in days]).tolist()
    for nb in (1, 4):
        out = user_growth(
            ray.data.from_arrow(t).repartition(num_blocks=nb),
            num_partitions=3)
        assert out["day"].to_pylist() == days
        assert out["n_new"].to_pylist() == [counts[d] for d in days]
        assert out["n_cum"].to_pylist() == cum


def test_bigram_surprisal_scalar_twin_any_layout(ray_session):
    import collections

    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.vocab import bigram_surprisal

    texts = ["the cat sat", "the cat ran", "cat the cat", "solo", "",
             None, "the the the cat"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    # scalar twin: explicit dict-based bigram model
    cb = collections.Counter()
    cp = collections.Counter()
    for tx in texts:
        ws = (tx or "").split(" ")
        for a, b in zip(ws, ws[1:]):
            cb[(a, b)] += 1
            cp[a] += 1
    want = {}
    for i, tx in enumerate(texts):
        ws = (tx or "").split(" ")
        prs = list(zip(ws, ws[1:]))
        if not prs:
            continue
        want[i] = (len(prs),
                   sum((10**9 * cb[p]) // cp[p[0]] for p in prs))
    for nb in (1, 3):
        ds = ray.data.from_arrow(t).repartition(num_blocks=nb)
        out = bigram_surprisal(ds, num_partitions=2)
        got = {}
        for b in out.iter_batches(batch_format="pyarrow"):
            for j in range(b.num_rows):
                got[b["doc_id"][j].as_py()] = (
                    b["n_bigrams"][j].as_py(), b["score_q9"][j].as_py())
        assert got == want, (nb, got, want)


def test_ccnet_ppl_buckets_scalar_twin_any_layout(ray_session):
    import collections
    import math

    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.vocab import ccnet_ppl_buckets

    texts = ["the cat sat", "the cat ran", "cat the cat", "solo", "",
             None, "the the the cat", "a b", "b a", "a a a",
             "x y z x y", "z z z"]
    langs = ["en", "en", "en", "en", "en", "en", "en",
             "fr", "fr", "fr", "de", "de"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    # scalar twin: corpus-wide LM, per-lang quantile_disc cutoffs
    cb, cp = collections.Counter(), collections.Counter()
    for tx in texts:
        ws = (tx or "").split(" ")
        for a, b in zip(ws, ws[1:]):
            cb[(a, b)] += 1
            cp[a] += 1
    avg = {}
    for i, tx in enumerate(texts):
        ws = (tx or "").split(" ")
        prs = list(zip(ws, ws[1:]))
        if prs:
            avg[i] = sum(
                (10**9 * cb[p]) // cp[p[0]] for p in prs) // len(prs)
    fh, fm = 0.2, 0.3
    c_head, c_mid = 1.0 - fh, 1.0 - fh - fm
    want = {}
    for lg in set(langs):
        vals = sorted(avg[i] for i in avg if langs[i] == lg)
        if not vals:
            continue
        n = len(vals)
        qh = vals[max(math.ceil(c_head * n) - 1, 0)]
        qm = vals[max(math.ceil(c_mid * n) - 1, 0)]
        for i in avg:
            if langs[i] != lg:
                continue
            b = ("head" if avg[i] >= qh
                 else "middle" if avg[i] >= qm else "tail")
            want[i] = (lg, avg[i], b)
    for nb in (1, 4):
        ds = ray.data.from_arrow(t).repartition(num_blocks=nb)
        out = ccnet_ppl_buckets(ds, frac_head=fh, frac_middle=fm)
        got = {}
        for blk in out.iter_batches(batch_format="pyarrow"):
            for j in range(blk.num_rows):
                got[blk["doc_id"][j].as_py()] = (
                    blk["lang"][j].as_py(), blk["avg_q9"][j].as_py(),
                    blk["bucket"][j].as_py())
        assert got == want, (nb, got, want)


def test_doc_novelty_frac_scalar_twin_any_layout(ray_session):
    import collections
    import re

    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.dedup import SHINGLE_K, doc_novelty_frac

    texts = [
        "click here to subscribe now please",   # boilerplate base
        "click here to subscribe now thanks",   # shares 3 shingles
        "entirely novel prose about marmots eating clover",
        "short doc",                            # < K tokens -> no row
        "",
        None,
        "click here to subscribe now please",   # exact dup of 0
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    df = collections.Counter()
    per_doc = {}
    for i, tx in enumerate(texts):
        ws = re.findall(r"[a-z0-9]+", (tx or "").lower())
        sh = {
            " ".join(ws[j:j + SHINGLE_K])
            for j in range(len(ws) - SHINGLE_K + 1)
        }
        if sh:
            per_doc[i] = sh
            for s in sh:
                df[s] += 1
    want = {}
    for i, sh in per_doc.items():
        n = len(sh)
        u = sum(1 for s in sh if df[s] == 1)
        want[i] = (n, u, 10**6 * u // n)
    for nb in (1, 4):
        ds = ray.data.from_arrow(t).repartition(num_blocks=nb)
        out = doc_novelty_frac(ds, num_partitions=3)
        got = {}
        for blk in out.iter_batches(batch_format="pyarrow"):
            for j in range(blk.num_rows):
                got[blk["doc_id"][j].as_py()] = (
                    blk["n_shingles"][j].as_py(),
                    blk["n_unique"][j].as_py(),
                    blk["novelty_q6"][j].as_py())
        assert got == want, (nb, got, want)


def test_token_diversity_scalar_twin(ray_session):
    import collections
    import re

    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.textstats import token_diversity_batch

    texts = ["the the the", "a b c d", "one", "", None,
             "spam spam eggs spam", "x X x!"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    want = {}
    for i, tx in enumerate(texts):
        ws = re.findall(r"[a-z0-9]+", (tx or "").lower())
        if not ws:
            continue
        c = collections.Counter(ws)
        n = len(ws)
        rp = sum(v * (v - 1) for v in c.values())
        s = (10**9 * rp) // (n * (n - 1)) if n >= 2 else 0
        want[i] = (n, len(c), rp, s)
    for nb in (1, 3):
        ds = ray.data.from_arrow(t).repartition(num_blocks=nb)
        out = ds.map_batches(token_diversity_batch,
                             batch_format="pyarrow")
        got = {}
        for blk in out.iter_batches(batch_format="pyarrow"):
            for j in range(blk.num_rows):
                got[blk["doc_id"][j].as_py()] = (
                    blk["n_tokens"][j].as_py(),
                    blk["n_distinct"][j].as_py(),
                    blk["rep_pairs"][j].as_py(),
                    blk["simpson_q9"][j].as_py())
        assert got == want, (nb, got, want)


def test_small_group_rows_twin_any_layout(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.relational import small_group_rows

    rng = np.random.default_rng(7)
    n = 400
    lang = rng.choice(["en", "fr", "de", "es"], n)
    band = rng.integers(0, 6, n)
    t = pa.table({
        "rid": pa.array(range(n), pa.int64()),
        "lang": pa.array(lang.tolist(), pa.string()),
        "band": pa.array(band.astype(np.int64)),
    })
    sizes = collections.Counter(zip(lang.tolist(), band.tolist()))
    k = 12
    want = {
        i: sizes[(lang[i], band[i])]
        for i in range(n) if sizes[(lang[i], band[i])] < k
    }
    for nb in (1, 5):
        ds = ray.data.from_arrow(t).repartition(num_blocks=nb)
        out = small_group_rows(ds, ["lang", "band"], k,
                               num_partitions=3)
        got = {}
        for blk in out.iter_batches(batch_format="pyarrow"):
            for j in range(blk.num_rows):
                got[blk["rid"][j].as_py()] = blk["k"][j].as_py()
        assert got == want, (nb, len(got), len(want))


def test_random_walks_deterministic_twin(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.graph import WALK_A, WALK_B, WALK_MOD, random_walks

    rng = np.random.default_rng(13)
    a = rng.integers(0, 50, 400)
    b = rng.integers(0, 50, 400)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    m = lo != hi
    packed = np.unique((lo[m].astype(np.int64) << 8) | hi[m])
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(packed >> 8, pa.int64()),
        "b": pa.array(packed & 255, pa.int64()),
    })).repartition(num_blocks=3)
    out = random_walks(ds, walk_len=3, num_partitions=2)
    got = {}
    for blk in out.iter_batches(batch_format="pyarrow"):
        for i in range(blk.num_rows):
            got[(blk["start"][i].as_py(), blk["step"][i].as_py())] = (
                blk["node"][i].as_py())
    # scalar twin: adjacency dict with ascending-id neighbors
    adj = {}
    for p in packed:
        x, y = int(p >> 8), int(p & 255)
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    for u in adj:
        adj[u].sort()
    want = {}
    for u in adj:
        cur = u
        want[(u, 0)] = u
        for k in range(1, 4):
            nbrs = adj[cur]
            cur = nbrs[((cur * WALK_A + k * WALK_B) % WALK_MOD) % len(nbrs)]
            want[(u, k)] = cur
    assert got == want


def test_term_positions_twin(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.vocab import term_positions

    texts = ["a b a c", "b", "", None, "a a a"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = term_positions(
        ray.data.from_arrow(t).repartition(num_blocks=2), ["a", "b"])
    got = set()
    for blk in out.iter_batches(batch_format="pyarrow"):
        for i in range(blk.num_rows):
            got.add((blk["word"][i].as_py(), blk["doc_id"][i].as_py(),
                     blk["pos"][i].as_py()))
    want = set()
    for d, tx in enumerate(texts):
        for p, w in enumerate((tx or "").split(" ")):
            if w in ("a", "b"):
                want.add((w, d, p))
    assert got == want


def test_bpe_encode_counts_twin(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.vocab import bpe_encode_counts, bpe_encode_py

    texts = ["the cat sat on the mat", "the dog ate the food",
             "aaaaab banana bandana", "", None, "the the the"] * 2
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    want = bpe_encode_py(texts, 8)
    out = bpe_encode_counts(
        ray.data.from_arrow(t).repartition(num_blocks=3), 8,
        num_partitions=2)
    got = {}
    for blk in out.iter_batches(batch_format="pyarrow"):
        for i in range(blk.num_rows):
            got[blk["doc_id"][i].as_py()] = (
                blk["n_bytes"][i].as_py(), blk["n_tokens"][i].as_py())
    assert got == {i: w for i, w in enumerate(want)}
    # merges actually compress
    assert any(got[i][1] < got[i][0] for i in got)


def test_bpe_train_checkpoint_resume(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.vocab import bpe_train

    texts = ["the cat sat on the mat", "the dog ate the food",
             "aaaaab banana bandana", "mississippi", "the the the"] * 3
    t = pa.table({"text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(num_blocks=3)
    full = bpe_train(ds, 8, num_partitions=2)
    ck = str(tmp_path / "bpe_ckpt")
    # stage 1: train only 4 merges with checkpointing
    part = bpe_train(ds, 4, num_partitions=2, checkpoint_dir=ck)
    assert part.num_rows == 4
    # stage 2: a fresh call resumes at step 4 and finishes to 8
    resumed = bpe_train(ds, 8, num_partitions=2, checkpoint_dir=ck)
    assert resumed.equals(full)
    # a third call with no remaining work replays from state alone
    again = bpe_train(ds, 8, num_partitions=2, checkpoint_dir=ck)
    assert again.equals(full)


def test_count_upper_bound_walks_the_dag(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from luzzu_ray.ops.dedup import count_upper_bound_if_cheap

    p = str(tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(100), pa.int64()),
        "o_orderpriority": pa.array(
            [f"P{i % 3}" for i in range(100)], pa.string()),
    }), p)
    ds = ray.data.read_parquet(p)
    n = ds.count()
    assert n == 100
    # bare read: exact
    assert count_upper_bound_if_cheap(ds) == n
    # read -> map/filter/project chains: bounded by the read count
    mapped = ds.map_batches(lambda t: t.slice(0, max(t.num_rows - 1, 0)),
                            batch_format="pyarrow")
    assert count_upper_bound_if_cheap(mapped) == n
    proj = mapped.select_columns(["o_orderkey"])
    assert count_upper_bound_if_cheap(proj) == n
    # union sums both sides
    assert count_upper_bound_if_cheap(proj.union(ds)) == 2 * n
    # non-walkable node (groupby) gives up
    agg = ds.groupby("o_orderpriority", num_partitions=2).count()
    assert count_upper_bound_if_cheap(agg) is None
    # in-memory table: known row count
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    assert count_upper_bound_if_cheap(ray.data.from_arrow(t)) == 3


def test_grouped_pct_rank_layout_invariance(ray_session):
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.relational import grouped_pct_rank

    t = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 3 + ["c"], pa.string()),
        "v": pa.array([5, 1, 3, 3, 2, 9, 9, 1, 7], pa.int64()),
        "i": pa.array(list(range(9)), pa.int64()),
    })
    outs = []
    for nb in (1, 4):
        ds = ray.data.from_arrow(t).repartition(num_blocks=nb)
        out = grouped_pct_rank(ds, "g", "v", "i", num_partitions=3)
        rows = set()
        for b in out.iter_batches(batch_format="pyarrow"):
            for j in range(b.num_rows):
                rows.add((b["g"][j].as_py(), b["i"][j].as_py(),
                          b["pct_q4"][j].as_py()))
        outs.append(rows)
    assert outs[0] == outs[1]
    got = dict(((g, i), p) for g, i, p in outs[0])
    # group a sorted by (v, i): ids 1(v1),4(v2),2(v3),3(v3),0(v5)
    assert got[("a", 1)] == 0
    assert got[("a", 4)] == 2500
    assert got[("a", 2)] == 5000
    assert got[("a", 3)] == 7500
    assert got[("a", 0)] == 10000
    # ties in b break by id: 7(v1)=0, 5(v9)=5000, 6(v9)=10000
    assert got[("b", 7)] == 0 and got[("b", 5)] == 5000 and got[("b", 6)] == 10000
    assert got[("c", 8)] == 0  # singleton


def test_walk_skipgram_counts_twin(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.graph import (
        WALK_A, WALK_B, WALK_MOD, walk_skipgram_counts,
    )

    rng = np.random.default_rng(21)
    a = rng.integers(0, 40, 300)
    b = rng.integers(0, 40, 300)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    m = lo != hi
    packed = np.unique((lo[m].astype(np.int64) << 8) | hi[m])
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(packed >> 8, pa.int64()),
        "b": pa.array(packed & 255, pa.int64()),
    })).repartition(num_blocks=3)
    out = walk_skipgram_counts(ds, walk_len=3, window=2, num_partitions=2)
    got = {}
    for blk in out.iter_batches(batch_format="pyarrow"):
        for i in range(blk.num_rows):
            got[(blk["center"][i].as_py(), blk["context"][i].as_py())] = (
                blk["n"][i].as_py())
    # twin: replay walks and count ordered pairs within window 2
    adj = {}
    for p in packed:
        x, y = int(p >> 8), int(p & 255)
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    for u in adj:
        adj[u].sort()
    want = collections.Counter()
    for u in adj:
        seq = [u]
        cur = u
        for k in range(1, 4):
            nbrs = adj[cur]
            cur = nbrs[((cur * WALK_A + k * WALK_B) % WALK_MOD) % len(nbrs)]
            seq.append(cur)
        for i in range(len(seq)):
            for j in range(len(seq)):
                if i != j and abs(i - j) <= 2:
                    want[(seq[i], seq[j])] += 1
    assert got == dict(want)


def test_lsh_neardup_equals_exact_sweep_high_threshold(ray_session):
    """On the twin-augmented fixture corpus, banded-LSH near-dup pairs
    EQUAL the exact tiled sweep at cos >= 0.9: verified candidates are
    always a subset of the true pairs (exact in-bucket verify), and the
    required superset direction (VERDICT r03 #1) holds because banding
    recall is 1.0 here (deterministic seeds — measured, then pinned)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    import __ray_entry__ as E
    from luzzu_ray.ops.similarity import (
        _as_matrix,
        embedding_neardup_pairs,
        lsh_neardup_pairs,
    )

    aug = E._augment_embeddings("/root/testdata/sf0.001").materialize()

    def pairs_of(ds_out):
        t = pa.Table.from_pylist(
            ds_out.select_columns(["a", "b"]).take_all())
        return set(zip(t["a"].to_pylist(), t["b"].to_pylist()))

    lsh = pairs_of(lsh_neardup_pairs(aug, threshold=0.9))
    exact = pairs_of(embedding_neardup_pairs(aug, threshold=0.9))
    assert lsh >= exact  # the brief's requirement: no missed near-dup
    assert lsh == exact  # and precision is exact by construction
    assert len(exact) > 20  # the corpus genuinely exercises the regime

    # salt-split path: a tiny bucket_cap may only LOSE pairs, and every
    # surviving pair is still a true pair
    capped = pairs_of(lsh_neardup_pairs(aug, threshold=0.9, bucket_cap=4))
    assert capped <= lsh

    # band codes are scale-invariant (signs), so a rescaled corpus
    # yields identical pairs
    def rescale(t: pa.Table) -> pa.Table:
        M = _as_matrix(t["embedding"].combine_chunks()) * 3.0
        d = M.shape[1]
        offs = pa.array(np.arange(t.num_rows + 1, dtype=np.int32) * d)
        return pa.table({
            "vec_id": t["vec_id"],
            "embedding": pa.ListArray.from_arrays(
                offs, pa.array(M.reshape(-1), pa.float64())),
        })

    scaled = aug.map_batches(rescale, batch_format="pyarrow").materialize()
    assert pairs_of(lsh_neardup_pairs(scaled, threshold=0.9)) == lsh


def test_lsh_neardup_sq8_payload(ray_session):
    """The SQ8-compressed band payload (margin-lowered dequantized
    candidates + exact rescore joins) yields the IDENTICAL pair set to
    the raw-embedding payload at the fixture thresholds, with exact
    cosine values on the surviving pairs; bucket_cap salt-splitting
    composes with the compressed path."""
    import pyarrow as pa

    import __ray_entry__ as E
    from luzzu_ray.ops.similarity import lsh_neardup_pairs

    aug = E._augment_embeddings("/root/testdata/sf0.001").materialize()

    def rows_of(ds_out):
        t = pa.Table.from_pylist(ds_out.take_all())
        return {(a, b): c for a, b, c in zip(
            t["a"].to_pylist(), t["b"].to_pylist(), t["cos"].to_pylist())}

    for thr in (0.85, 0.9):
        raw = rows_of(lsh_neardup_pairs(aug, threshold=thr, payload="raw"))
        sq8 = rows_of(lsh_neardup_pairs(aug, threshold=thr, payload="sq8"))
        assert set(raw) == set(sq8), thr
        for k in raw:
            assert abs(raw[k] - sq8[k]) < 1e-12, (thr, k)
    capped = rows_of(lsh_neardup_pairs(
        aug, threshold=0.9, payload="sq8", bucket_cap=4))
    assert set(capped) <= set(raw)


def test_tfidf_vocab_cap_bounds_driver_pull(ray_session):
    """With vocab > vocab_cap the driver holds only the top-cap df rows
    and every out-of-cap word scores with df = 1; with cap >= vocab the
    result is exact.  Twin: pure-Python capped tf-idf."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.vocab import tfidf_top_terms

    rng = np.random.default_rng(31)
    vocab = [f"w{i:02d}" for i in range(30)]
    docs = []
    for i in range(60):
        n = rng.integers(3, 12)
        docs.append(" ".join(rng.choice(vocab, size=n)))
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })

    def twin(cap, k=3):
        df = collections.Counter()
        for d in docs:
            df.update(set(d.split(" ")))
        kept = dict(sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:cap])
        out = set()
        for i, d in enumerate(docs):
            tf = collections.Counter(d.split(" "))
            scores = sorted(
                ((w, tf[w] * len(docs) * 10_000 // kept.get(w, 1))
                 for w in tf),
                key=lambda ws: (-ws[1], ws[0]),
            )[:k]
            for r, (w, s) in enumerate(scores, 1):
                out.add((i, w, s, r))
        return out

    for cap in (10, 1000):  # vocab(30) > 10, and cap >= vocab
        ds = ray.data.from_arrow(t).repartition(num_blocks=4)
        got = {
            (r["doc_id"], r["term"], r["tfidf_score"], r["rnk"])
            for r in tfidf_top_terms(ds, k=3, vocab_cap=cap).take_all()
        }
        assert got == twin(cap), f"cap={cap}"


def test_bpe_train_sampled_layout_invariant_and_matches_twin(ray_session):
    """The hash-sample is deterministic across block layouts, so sampled
    training yields identical merge tables however the corpus is split;
    and it equals the Python twin trained on the same explicit sample."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from luzzu_ray.ops.vocab import bpe_train_py, bpe_train_sampled

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    a, b = 6364136223846793005, 1442695040888963407
    ranked = sorted(
        ((i * a + b) % (1 << 64), i, t)
        for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    )
    want = bpe_train_py([t for _, _, t in ranked[:80]], 6)
    outs = []
    for blocks in (2, 7):
        ds = ray.data.from_arrow(docs).repartition(num_blocks=blocks)
        got = bpe_train_sampled(ds, 6, 80, hash_a=a, hash_b=b)
        outs.append(got.to_pylist())
    assert outs[0] == outs[1]
    assert [tuple(r.values()) for r in outs[0]] == [tuple(m) for m in want]


def test_grouped_quantiles_cont_matches_duckdb(ray_session):
    """Interpolated quantiles are bit-exact vs DuckDB quantile_cont,
    including 1-row groups (f collapses to v[0]) and odd fractions."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.relational import grouped_quantiles_cont

    rng = np.random.default_rng(11)
    n = 900
    key = rng.integers(0, 40, size=n)
    key[0] = 999  # a singleton group
    val = rng.uniform(-50, 50, size=n)
    t = pa.table({"k": pa.array(key, pa.int64()),
                  "v": pa.array(val, pa.float64())})
    ds = ray.data.from_arrow(t).repartition(num_blocks=5)
    got = pa.Table.from_pylist(grouped_quantiles_cont(
        ds, "k", "v", quantiles={"med": 0.5, "p90": 0.9, "odd": 0.123},
        num_partitions=3,
    ).take_all()).sort_by("k")
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT k, quantile_cont(CAST(floor(v * 10000.0) AS BIGINT), 0.5) "
        "AS med_cont, "
        "quantile_cont(CAST(floor(v * 10000.0) AS BIGINT), 0.9) AS p90_cont, "
        "quantile_cont(CAST(floor(v * 10000.0) AS BIGINT), 0.123) "
        "AS odd_cont, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY k"
    ).arrow().sort_by("k")
    assert got.to_pylist() == want.to_pylist()


def test_multibyte_corpus_stats_quality_scrub_vs_oracle(ray_session, tmp_path):
    """doc_stats / doc_quality / doc_scrub are hash-exact vs their
    DuckDB oracles on a NON-ASCII corpus — the widened UTF-8 domain of
    the case-insensitive kernels (domain note in __ray_entry__.py)."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    texts = [
        "élève café, naïve — «quoted» text…",
        "日本語のテキスト 123 abc! reach me at bob@exämple.com",
        "emoji \U0001f389\U0001f38a party!! call 555-867-5309 now",
        "nbsp a b and ssn 123-45-6789 über alles",
        "pure ascii fallback row 42% (control)",
        "",
        "ümlaut Über ÉLÈVE mixed CASE frakking rant",
        "tabs\tand\nnewlines plus LS",
    ]
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{i % 2}" for i in range(n)]),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.register("documents", t)
    sqls = E.oracle_sql()
    for name, q in (
        ("doc_stats", E.q_doc_stats),
        ("doc_quality", E.q_doc_quality),
        ("doc_scrub", E.q_doc_scrub),
    ):
        got = q(str(tmp_path)).to_pandas()
        got = got[sorted(got.columns)].sort_values(
            sorted(got.columns)).reset_index(drop=True)
        want = con.execute(sqls[name]).fetchdf()
        want = want[sorted(want.columns)].sort_values(
            sorted(want.columns)).reset_index(drop=True)
        assert list(got.columns) == list(want.columns), name
        assert got.equals(want), (name, got.compare(want))


def test_semantic_dedup_matches_brute_twin(ray_session):
    """semantic_dedup equals the numpy brute-force twin (same-cluster,
    smaller-id neighbor at cos >= thr) across block layouts and with a
    tiny matmul_chunk (exercises the chunked score strips), including
    planted near-duplicate vectors."""
    import ray.data

    from luzzu_ray.ops.similarity import (
        _normalize, kmeans_centroids, semantic_dedup,
    )

    rng = np.random.default_rng(11)
    n, d = 400, 16
    E = rng.normal(size=(n, d))
    # plant near-dups: rows 50/51 and 300/301/302 nearly identical
    E[51] = E[50] + rng.normal(scale=1e-3, size=d)
    E[301] = E[300] + rng.normal(scale=1e-3, size=d)
    E[302] = E[300] + rng.normal(scale=1e-3, size=d)
    C = kmeans_centroids(E[:128], k=8, iters=5)
    thr = 0.8

    N = _normalize(E.astype(np.float64))
    code = np.argmax(E @ C.T, axis=1)
    want = np.zeros(n, dtype=bool)
    for c in range(len(C)):
        idx = np.where(code == c)[0]  # ascending == vec_id order
        G = N[idx] @ N[idx].T
        want[idx] = (np.tril(G, -1) >= thr).any(axis=1)
    assert want[[51, 301, 302]].all() and not want[50]

    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(E.astype(np.float32))),
    })
    for parts, chunk in ((1, 4096), (7, 3)):
        got = (
            semantic_dedup(
                ray.data.from_arrow(t).repartition(parts),
                C, threshold=thr, num_partitions=4, matmul_chunk=chunk,
            )
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        assert list(got["cluster"]) == list(code.astype(np.int64)), (parts, chunk)
        assert list(got["is_semdup"]) == list(want), (parts, chunk)


def test_hll_mergeable_layoutproof_and_accurate(ray_session):
    """HLL registers are layout-invariant, merge by per-register max
    (sketch(A ∪ B) == merge(sketch(A), sketch(B))), and the raw
    estimate lands within the ~3 sigma HLL error bound."""
    import ray.data

    from luzzu_ray.ops.sketch import HLL_P, hll_estimate, hll_registers

    n = 20_000
    ids = np.arange(n, dtype=np.int64) * 7 + 3  # distinct, non-sequential
    t = pa.table({"k": pa.array(ids)})

    def regs_of(tbl, parts):
        df = hll_registers(
            ray.data.from_arrow(tbl).repartition(parts), "k"
        ).to_pandas().sort_values("register").reset_index(drop=True)
        return df

    whole1 = regs_of(t, 1)
    whole8 = regs_of(t, 8)
    assert whole1.equals(whole8)

    # mergeability: per-register max of the halves == whole
    a = regs_of(t.slice(0, n // 2), 3).set_index("register")["rho"]
    b = regs_of(t.slice(n // 2), 3).set_index("register")["rho"]
    merged = a.to_frame().join(b, how="outer", lsuffix="_a", rsuffix="_b")
    merged = merged.max(axis=1).astype(np.int64).sort_index()
    got = whole1.set_index("register")["rho"].sort_index()
    assert merged.equals(got)

    est = hll_estimate(ray.data.from_arrow(t), "k").take_all()[0]
    m = 1 << HLL_P
    assert est["m"] == m
    sigma = 1.04 / np.sqrt(m)
    assert abs(est["est_raw"] - n) <= 3 * sigma * n, est


def test_pq_ann_topk_twin_match_and_partition_invariance(ray_session):
    """PQ/ADC ANN: byte-identical across block layouts (the integer
    LUT score removes float merge-order risk), exactly equal to a
    per-row scalar twin (encode -> integer LUT sum -> lexsort rank),
    and semantically sane: every top-5 hit lands in the query's true
    cluster.  Strict self-hit is NOT asserted — PQ code ties are
    broken by vec_id, so a same-code lower-id neighbor may outrank
    the query itself; that's correct ADC semantics."""
    import ray.data

    from luzzu_ray.ops.similarity import (
        _normalize, _pq_assign, pq_ann_topk, pq_codebooks, pq_query_luts,
    )

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((5, 32)) * 4
    E = np.concatenate(
        [centers[i] + 0.3 * rng.standard_normal((80, 32)) for i in range(5)]
    ).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(E), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(E.reshape(-1)), 32
            ).cast(pa.list_(pa.float32())),
        }
    )
    books = pq_codebooks(E[rng.choice(len(E), 200, replace=False)])
    Q = E[[3, 200]].astype(np.float64)

    runs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        runs.append(pq_ann_topk(ds, Q, [3, 200], books, k=5).to_pylist())
    assert runs[0] == runs[1]
    got = runs[0]

    # scalar twin: same codebooks, same integer LUTs, lexsort ranking
    X = _normalize(E.astype(np.float64))
    luts = pq_query_luts(books, Q)
    m, ksub, dsub = books.shape
    score = np.zeros((2, len(X)), np.int64)
    for j in range(m):
        code = _pq_assign(X[:, j * dsub:(j + 1) * dsub], books[j])
        score += luts[:, j, code]
    want = []
    for qi, qid in enumerate((3, 200)):
        order = np.lexsort((np.arange(len(X)), -score[qi]))[:5]
        want += [{"query_id": qid, "rank": r + 1, "vec_id": int(v)}
                 for r, v in enumerate(order)]
    assert got == want

    # top-5 hits stay inside the query's true cluster (80-row groups)
    for qid in (3, 200):
        hits = [r["vec_id"] for r in got if r["query_id"] == qid]
        assert all(v // 80 == qid // 80 for v in hits), (qid, hits)


def test_context_examples_matches_pandas_twin(ray_session):
    """context_examples == a pandas groupby-shift twin on a multi-conv
    fixture, invariant to block layout; openers get NULL context."""
    import pandas as pd
    import ray.data

    from luzzu_ray.ops.vocab import context_examples

    rows = []
    rng = np.random.default_rng(11)
    for conv in range(25):
        for i in range(int(rng.integers(1, 8))):
            rows.append({"doc_id": conv, "chunk_idx": i,
                         "chunk_text": f"c{conv}t{i}"})
    t = pa.Table.from_pylist(rows)

    def twin(df: pd.DataFrame, w: int) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
        parts = [df.groupby("doc_id")["chunk_text"].shift(k)
                 for k in range(w, 0, -1)]
        ctx = [
            " | ".join(p.iloc[i] for p in parts if isinstance(p.iloc[i], str))
            or None
            for i in range(len(df))
        ]
        return pd.DataFrame({
            "doc_id": df["doc_id"], "chunk_idx": df["chunk_idx"],
            "target_text": df["chunk_text"], "context_text": ctx,
        })

    want = twin(t.to_pandas(), 2)
    outs = []
    for parts_n in (1, 6):
        ds = ray.data.from_arrow(t).repartition(parts_n)
        got = context_examples(ds, 2).to_pandas().sort_values(
            ["doc_id", "chunk_idx"]).reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    assert outs[0].equals(want), (outs[0].head(), want.head())


def test_funnel_k_steps_chain_gating(ray_session):
    """funnel_k_steps: step i only counts at/after step i-1, a broken
    chain NULLs all later steps, non-entrants are dropped, and the
    result is invariant to block layout."""
    import datetime as dt

    import ray.data

    from luzzu_ray.ops.events import funnel_k_steps

    T0 = dt.datetime(2024, 1, 1)

    def ev(uid, kind, sec):
        return {"user_id": uid, "event_type": kind,
                "ts": T0 + dt.timedelta(seconds=sec)}

    rows = [
        # user 1: full ordered chain
        ev(1, "view", 10), ev(1, "click", 20), ev(1, "purchase", 30),
        # user 2: click BEFORE the first view -> chain breaks at step 2
        ev(2, "click", 5), ev(2, "view", 10), ev(2, "purchase", 20),
        # user 3: purchase before click -> step 3 NULL
        ev(3, "view", 1), ev(3, "purchase", 2), ev(3, "click", 3),
        # user 4: never viewed -> dropped
        ev(4, "click", 1), ev(4, "purchase", 2),
        # user 5: simultaneous view+click (ts >= is inclusive)
        ev(5, "view", 7), ev(5, "click", 7), ev(5, "purchase", 9),
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     t["ts"].cast(pa.timestamp("us")))

    outs = []
    for parts in (1, 5):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = {r["user_id"]: r for r in funnel_k_steps(
            ds, ["view", "click", "purchase"]).take_all()}
        outs.append(got)
    assert outs[0] == outs[1]
    got = outs[0]
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["n_completed"] == 3
    assert got[2]["n_completed"] == 1 and got[2]["ts_2"] is None \
        and got[2]["ts_3"] is None
    assert got[3]["n_completed"] == 2 and got[3]["ts_3"] is None
    assert got[5]["n_completed"] == 3  # inclusive >= at equal ts


def test_kmeans_lloyd_int_layout_invariant_and_converges(ray_session):
    """Integer Lloyd over the full dataset: byte-identical assignments
    across block layouts (all arithmetic int64), and on well-separated
    clusters the assignment recovers the true partition."""
    import ray.data

    from luzzu_ray.ops.similarity import kmeans_lloyd_int

    rng = np.random.default_rng(31)
    centers = rng.uniform(-0.4, 0.4, (3, 16))
    # ids 0..2 are one seed per true cluster (the deterministic
    # lowest-id init must start in distinct basins), then 40 members
    # per cluster interleaved
    true_lab = np.concatenate(
        ([0, 1, 2], np.arange(120) % 3)).astype(np.int64)
    E = (centers[true_lab]
         + rng.uniform(-0.02, 0.02, (len(true_lab), 16))).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(E), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(E.reshape(-1)), 16).cast(pa.list_(pa.float32())),
    })
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = kmeans_lloyd_int(ds, 3, 3).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    lab = outs[0]["cluster"].to_numpy()
    # the assignment is exactly the true partition (up to the id map
    # fixed by the seeds: seed i -> cluster label lab[i])
    assert len({lab[0], lab[1], lab[2]}) == 3
    assert (lab == np.array([lab[0], lab[1], lab[2]])[true_lab]).all()


def test_kmeans_checkpoint_resume(ray_session, tmp_path):
    """kmeans_lloyd_int checkpoint/resume (the bpe_train pattern):
    a run killed after a partial iteration count resumes from
    state.json and finishes bit-identical to an uninterrupted run; a
    checkpoint holding MORE iterations than asked truncates exactly;
    a mismatched k raises."""
    import pytest
    import ray.data

    from luzzu_ray.ops.similarity import kmeans_lloyd_int

    rng = np.random.default_rng(47)
    E = rng.uniform(-0.5, 0.5, (90, 8)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(E), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(E.reshape(-1)), 8).cast(pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    full = kmeans_lloyd_int(ds, 3, 4).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    ck = str(tmp_path / "km_ckpt")
    # stage 1: "crash" after 2 of 4 iterations (the checkpoint commits
    # per iteration, so stopping at iters=2 == a mid-run kill)
    part = kmeans_lloyd_int(ds, 3, 2, checkpoint_dir=ck).to_pandas()
    assert len(part) == len(E)
    # stage 2: fresh call resumes at iteration 2, finishes to 4
    resumed = kmeans_lloyd_int(ds, 3, 4, checkpoint_dir=ck).to_pandas(
    ).sort_values("vec_id").reset_index(drop=True)
    assert resumed.equals(full)
    # a deeper checkpoint truncates to this call's prefix exactly
    two = kmeans_lloyd_int(ds, 3, 2).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    replay2 = kmeans_lloyd_int(ds, 3, 2, checkpoint_dir=ck).to_pandas(
    ).sort_values("vec_id").reset_index(drop=True)
    assert replay2.equals(two)
    with pytest.raises(ValueError, match="k=3"):
        kmeans_lloyd_int(ds, 4, 2, checkpoint_dir=ck)


def test_knn_graph_matches_brute_twin(ray_session):
    """knn_graph equals the numpy per-cell brute-force twin (top-k by
    cosine DESC, nbr_id ASC within each coarse cell) across block
    layouts, tiny matmul chunks, and cells smaller than k."""
    import ray.data

    from luzzu_ray.ops.similarity import (
        _normalize, kmeans_centroids, knn_graph,
    )

    rng = np.random.default_rng(23)
    n, d, k = 300, 12, 4
    E = rng.normal(size=(n, d))
    C = kmeans_centroids(E[:96], k=24, iters=5)  # many cells -> some tiny

    N = _normalize(E.astype(np.float64))
    code = np.argmax(E @ C.T, axis=1)
    want = []
    for c in range(len(C)):
        idx = np.where(code == c)[0]
        if len(idx) < 2:
            continue
        G = N[idx] @ N[idx].T
        np.fill_diagonal(G, -np.inf)
        for r, i in enumerate(idx):
            order = sorted(range(len(idx)),
                           key=lambda j: (-G[r, j], idx[j]))
            for rank, j in enumerate(order[: min(k, len(idx) - 1)], 1):
                want.append((int(i), rank, int(idx[j])))
    want = sorted(want)
    assert len({c for c in code}) > 5 and len(want) > 200

    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(E.astype(np.float32))),
    })
    for parts, chunk in ((1, 4096), (6, 7)):
        got = knn_graph(
            ray.data.from_arrow(t).repartition(parts),
            C, k=k, num_partitions=3, matmul_chunk=chunk,
        ).to_pandas()
        got_rows = sorted(
            (int(a), int(r), int(b))
            for a, r, b in zip(got["vec_id"], got["rank"], got["nbr_id"])
        )
        assert got_rows == want, (parts, chunk)


def test_hll_estimate_by_matches_global_per_group(ray_session):
    """Grouped HLL: each group's (n_zero, est_raw) equals the GLOBAL
    estimator run on that group's rows alone, and the result is
    layout-invariant across block splits."""
    import ray.data

    from luzzu_ray.ops.sketch import hll_estimate, hll_estimate_by

    rng = np.random.default_rng(5)
    n = 30_000
    g = rng.integers(0, 7, size=n).astype(np.int64)
    k = (rng.integers(0, 1 << 40, size=n)).astype(np.int64)
    t = pa.table({"grp": pa.array(g), "key": pa.array(k)})

    def by(parts):
        return (
            hll_estimate_by(
                ray.data.from_arrow(t).repartition(parts), "grp", "key",
                num_partitions=3,
            )
            .to_pandas().sort_values("grp").reset_index(drop=True)
        )

    got1, got8 = by(1), by(8)
    assert got1.equals(got8)
    for gi in range(7):
        sub = t.filter(pa.array(g == gi))
        want = hll_estimate(
            ray.data.from_arrow(sub), "key"
        ).to_pandas().iloc[0]
        row = got1[got1["grp"] == gi].iloc[0]
        assert row["n_zero_registers"] == want["n_zero_registers"], gi
        assert row["est_raw"] == want["est_raw"], gi
        # sanity: estimate lands near the true distinct count
        true = len(np.unique(k[g == gi]))
        assert abs(row["est_raw"] - true) < 0.2 * true


def test_running_user_total_matches_pandas_twin(ray_session):
    import pandas as pd
    import ray.data

    from luzzu_ray.ops.events import running_user_total

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, size=n).astype(np.int64),
        "ts": rng.integers(0, 10**9, size=n).astype("datetime64[us]"),
        "value": rng.uniform(0, 100, size=n),
    })
    vq = np.floor(df["value"].to_numpy() * 10_000.0).astype(np.int64)
    d2 = df.assign(vq=vq).sort_values(["user_id", "ts", "event_id"])
    want = d2.assign(
        run_sum_q4=d2.groupby("user_id")["vq"].cumsum(),
        run_n=d2.groupby("user_id").cumcount() + 1,
    )[["event_id", "run_sum_q4", "run_n"]].sort_values("event_id")

    for parts in (1, 7):
        got = (
            running_user_total(
                ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                num_partitions=4,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        assert list(got["run_sum_q4"]) == list(want["run_sum_q4"]), parts
        assert list(got["run_n"]) == list(want["run_n"]), parts


def test_binary_auc_matches_sklearn_style_twin(ray_session):
    """binary_auc equals a rank-based scalar twin (average-rank
    Mann-Whitney) on random tied integer scores, for any layout, and
    the Python-int fallback path agrees with the vectorized path."""
    import ray.data

    from luzzu_ray.ops.relational import binary_auc

    rng = np.random.default_rng(17)
    n = 4000
    s = rng.integers(0, 50, size=n).astype(np.int64)  # heavy ties
    # label correlated with score so AUC is informative
    lab = (s + rng.integers(0, 30, size=n)) > 40

    # scalar twin: average ranks
    order = np.argsort(s, kind="stable")
    ranks = np.empty(n, dtype=np.float64)
    sv = s[order]
    i = 0
    r = 1
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (r + (r + (j - i) - 1)) / 2.0
        r += j - i
        i = j
    n_pos = int(lab.sum())
    n_neg = n - n_pos
    u = ranks[lab].sum() - n_pos * (n_pos + 1) / 2.0
    want_u2 = int(round(2 * u))
    want_auc = (want_u2 * 1_000_000) // (2 * n_pos * n_neg)

    t = pa.table({"sc": pa.array(s), "lb": pa.array(lab)})
    for parts in (1, 9):
        got = binary_auc(
            ray.data.from_arrow(t).repartition(parts), "sc", "lb"
        ).to_pandas().iloc[0]
        assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
        assert got["u2"] == want_u2, parts
        assert got["auc_q6"] == want_auc, parts


def test_session_hours_layout_invariance_and_span(ray_session):
    import pandas as pd
    import ray.data

    from luzzu_ray.ops.events import SESSION_GAP_US, session_hours

    rng = np.random.default_rng(9)
    n = 3000
    HOUR = 3_600_000_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, size=n).astype(np.int64),
        "ts": rng.integers(0, 50 * HOUR, size=n).astype("datetime64[us]"),
    })
    t = pa.Table.from_pandas(df)
    outs = []
    for parts in (1, 8):
        got = (
            session_hours(
                ray.data.from_arrow(t).repartition(parts), num_partitions=4
            )
            .to_pandas()
            .sort_values(["user_id", "session_idx", "hour_us"])
            .reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    # scalar twin per user
    us = df.sort_values(["user_id", "ts", "event_id"])
    want = []
    for uid, grp in us.groupby("user_id"):
        tsv = grp["ts"].astype("int64").to_numpy()
        sidx = -1
        prev = None
        spans = []
        for x in tsv:
            if prev is None or x - prev > SESSION_GAP_US:
                sidx += 1
                spans.append([x, x])
            else:
                spans[-1][1] = x
            prev = x
        for i, (a, b) in enumerate(spans):
            for h in range(a // HOUR, b // HOUR + 1):
                want.append((int(uid), i, h * HOUR))
    want = sorted(want)
    got_rows = sorted(
        (int(a), int(b), int(c))
        for a, b, c in zip(
            outs[0]["user_id"], outs[0]["session_idx"], outs[0]["hour_us"]
        )
    )
    assert got_rows == want


def test_centered_user_window_matches_pandas_twin(ray_session):
    import pandas as pd
    import ray.data

    from luzzu_ray.ops.events import centered_user_window

    rng = np.random.default_rng(21)
    n, w = 4000, 3
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 30, size=n).astype(np.int64),
        "ts": rng.integers(0, 10**9, size=n).astype("datetime64[us]"),
        "value": rng.uniform(0, 10, size=n),
    })
    vq = np.floor(df["value"].to_numpy() * 10_000.0).astype(np.int64)
    d2 = df.assign(vq=vq).sort_values(["user_id", "ts", "event_id"])
    roll = d2.groupby("user_id")["vq"].rolling(
        window=2 * w + 1, center=True, min_periods=1
    ).sum().reset_index(level=0, drop=True)
    cnt = d2.groupby("user_id")["vq"].rolling(
        window=2 * w + 1, center=True, min_periods=1
    ).count().reset_index(level=0, drop=True)
    want = d2.assign(cwsum=roll.astype(np.int64), cwn=cnt.astype(np.int64))
    want = want.sort_values("event_id")

    for parts in (1, 6):
        got = (
            centered_user_window(
                ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(parts),
                w, num_partitions=4,
            )
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        assert list(got["cwsum_q4"]) == list(want["cwsum"]), parts
        assert list(got["cwn"]) == list(want["cwn"]), parts


def test_source_divergence_layout_invariance_and_zero_source(ray_session):
    """Identical-to-corpus sources score ~0; a skewed source scores
    higher; results are block-layout invariant."""
    import ray.data

    from luzzu_ray.ops.vocab import source_divergence

    rows = []
    for i in range(200):
        rows.append(("mix", "alpha beta gamma delta"))
    for i in range(200):
        rows.append(("same", "alpha beta gamma delta"))
    for i in range(200):
        rows.append(("skew", "alpha alpha alpha alpha"))
    t = pa.table(
        {"source": pa.array([r[0] for r in rows]),
         "text": pa.array([r[1] for r in rows])}
    )
    outs = []
    for parts in (1, 8):
        got = (
            source_divergence(
                ray.data.from_arrow(t).repartition(parts), 4,
                num_partitions=3,
            )
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    d = outs[0].set_index("source")["chi2_q6"]
    assert d["mix"] == d["same"]
    assert d["skew"] > d["mix"] * 2


def test_knn_graph_tie_break_at_k_boundary(ray_session):
    """Equal-cosine candidates at the k-boundary resolve by LOWEST
    vec_id (the SQL row_number tie rule): 50 identical vectors must
    each pick neighbors with the 5 smallest other ids."""
    import ray.data

    from luzzu_ray.ops.similarity import knn_graph

    n, d, k = 50, 8, 5
    E = np.tile(np.arange(1, d + 1, dtype=np.float64), (n, 1))
    C = np.ones((1, d))  # one cell
    t = pa.table({
        "vec_id": pa.array(np.arange(100, 100 + n, dtype=np.int64)),
        "embedding": pa.array(list(E.astype(np.float32))),
    })
    got = knn_graph(
        ray.data.from_arrow(t).repartition(3), C, k=k, num_partitions=2
    ).to_pandas()
    for vid, grp in got.groupby("vec_id"):
        others = [x for x in range(100, 100 + n) if x != vid][:k]
        assert sorted(grp["nbr_id"]) == others, vid


def test_source_vocab_overlap_matches_bruteforce(ray_session):
    """Pairwise vocabulary Jaccard equals a pure-Python set sweep and
    is block-layout invariant (the word-keyed bitmask OR-combine must
    not depend on which blocks a source's docs land in)."""
    import ray.data

    from luzzu_ray.ops.vocab import source_vocab_overlap

    corpora = {
        "a": ["red green blue", "blue cyan", "red red red"],
        "b": ["green blue yellow", "yellow pink"],
        "c": ["violet", "violet ultra", ""],
        "d": ["red green blue cyan yellow pink violet ultra"],
    }
    rows_s, rows_t = [], []
    for s, docs in corpora.items():
        for d in docs:
            rows_s.append(s)
            rows_t.append(d)
    t = pa.table({"source": pa.array(rows_s), "text": pa.array(rows_t)})

    vocab = {
        s: set(w for d in docs for w in d.split(" "))
        for s, docs in corpora.items()
    }
    outs = []
    for parts in (1, 7):
        got = (
            source_vocab_overlap(ray.data.from_arrow(t).repartition(parts))
            .to_pandas()
            .sort_values(["source_a", "source_b"])
            .reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got = outs[0]
    names = sorted(corpora)
    want_pairs = [
        (a, b) for i, a in enumerate(names) for b in names[i + 1:]
    ]
    assert list(zip(got["source_a"], got["source_b"])) == want_pairs
    for _, r in got.iterrows():
        va, vb = vocab[r["source_a"]], vocab[r["source_b"]]
        assert r["n_a"] == len(va) and r["n_b"] == len(vb)
        assert r["n_common"] == len(va & vb)
        assert r["n_union"] == len(va | vb)
        assert r["jaccard_q6"] == len(va & vb) * 1_000_000 // len(va | vb)


def test_grouped_ks_vs_rest_matches_bruteforce(ray_session):
    """Exact KS-vs-rest equals the quadratic ECDF sweep; an
    identically-distributed group scores 0; layout invariant."""
    import ray.data

    from luzzu_ray.ops.relational import grouped_ks_vs_rest

    rng = np.random.default_rng(7)
    # 'same' mirrors the pooled rest exactly when paired with 'twin'
    vals_a = rng.integers(0, 40, 300)
    groups = ["a"] * 300 + ["b"] * 200 + ["c"] * 100
    vals = np.concatenate([vals_a,
                           rng.integers(20, 60, 200),
                           rng.integers(0, 5, 100)])
    t = pa.table({
        "g": pa.array(groups),
        "x": pa.array(vals, pa.int64()),
    })

    def brute(g):
        mine = vals[np.array(groups) == g]
        rest = vals[np.array(groups) != g]
        grid = np.unique(vals)
        best = 0
        for v in grid:
            num = abs(
                int((mine <= v).sum()) * len(rest)
                - int((rest <= v).sum()) * len(mine)
            )
            best = max(best, num)
        return best * 1_000_000 // (len(mine) * len(rest))

    outs = []
    for parts in (1, 6):
        got = (
            grouped_ks_vs_rest(
                ray.data.from_arrow(t).repartition(parts), "g", "x",
                num_partitions=3,
            )
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got = outs[0].set_index("g")
    for g, n in (("a", 300), ("b", 200), ("c", 100)):
        assert got.loc[g, "n_group"] == n
        assert got.loc[g, "n_rest"] == 600 - n
        assert got.loc[g, "ks_q6"] == brute(g)
    # disjoint supports => c is far from the rest; a overlaps heavily
    assert got.loc["c", "ks_q6"] > got.loc["a", "ks_q6"]


def test_cluster_size_hist_table_and_dataset_paths_agree(ray_session):
    """The Arrow-table fast path and the Dataset groupby path produce
    the same (cluster_size, n_clusters) histogram."""
    import ray.data

    from luzzu_ray.ops.dedup import cluster_size_hist

    labeling = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(10)]),
        "cluster": pa.array(
            ["c0", "c0", "c0", "c1", "c1", "c2", "c2", "c3", "c4", "c5"]
        ),
        "is_dup": pa.array([False, True, True, False, True,
                            False, True, False, False, False]),
    })
    want = {3: 1, 2: 2, 1: 3}
    tbl = cluster_size_hist(labeling)
    got_t = dict(zip(tbl["cluster_size"].to_pylist(),
                     tbl["n_clusters"].to_pylist()))
    assert got_t == want
    ds_out = cluster_size_hist(
        ray.data.from_arrow(labeling).repartition(4)
    ).to_pandas()
    got_d = dict(zip(ds_out["cluster_size"], ds_out["n_clusters"]))
    assert got_d == want


def test_binary_pr_curve_matches_bruteforce(ray_session):
    """The threshold sweep equals a per-threshold brute-force confusion
    count, layout invariant, with exact q6 floor-divided metrics."""
    import ray.data

    from luzzu_ray.ops.relational import binary_pr_curve

    rng = np.random.default_rng(11)
    scores = rng.integers(-50, 50, 400)
    labels = (scores + rng.integers(-30, 30, 400)) > 0
    t = pa.table({"s": pa.array(scores, pa.int64()),
                  "lab": pa.array(labels)})
    outs = []
    for parts in (1, 5):
        got = (
            binary_pr_curve(
                ray.data.from_arrow(t).repartition(parts), "s", "lab")
            .to_pandas().sort_values("score").reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got = outs[0]
    n_pos = int(labels.sum())
    assert list(got["score"]) == sorted(set(scores.tolist()))
    for _, r in got.iterrows():
        v = r["score"]
        tp = int((labels & (scores >= v)).sum())
        fp = int((~labels & (scores >= v)).sum())
        assert r["tp"] == tp and r["fp"] == fp
        assert r["fn"] == n_pos - tp
        assert r["tn"] == int((~labels).sum()) - fp
        assert r["precision_q6"] == tp * 1_000_000 // (tp + fp)
        assert r["recall_q6"] == tp * 1_000_000 // n_pos
        assert r["f1_q6"] == 2 * tp * 1_000_000 // (2 * tp + fp + n_pos - tp)


def test_rater_agreement_kappa_including_negative(ray_session):
    """Cohen's kappa matches hand arithmetic; a below-chance pairing
    yields a NEGATIVE kappa floor-divided like Python (the SQL twin
    reproduces floor semantics via positive-mod), layout invariant."""
    import ray.data

    from luzzu_ray.ops.relational import rater_agreement

    def run(a_vals, b_vals, parts):
        t = pa.table({"a": pa.array(a_vals), "b": pa.array(b_vals)})
        return (
            rater_agreement(
                ray.data.from_arrow(t).repartition(parts), "a", "b")
            .to_pandas().iloc[0]
        )

    def kappa_brute(a_vals, b_vals):
        n11 = sum(1 for x, y in zip(a_vals, b_vals) if x and y)
        n10 = sum(1 for x, y in zip(a_vals, b_vals) if x and not y)
        n01 = sum(1 for x, y in zip(a_vals, b_vals) if not x and y)
        n00 = sum(1 for x, y in zip(a_vals, b_vals) if not (x or y))
        n = n11 + n10 + n01 + n00
        pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
        den = n * n - pe
        return ((n * (n11 + n00) - pe) * 1_000_000 // den
                if den else None)

    rng = np.random.default_rng(3)
    a = rng.random(500) < 0.6
    agree = (rng.random(500) < 0.8)
    b = np.where(agree, a, ~a)
    r1 = run(a.tolist(), b.tolist(), 1)
    r7 = run(a.tolist(), b.tolist(), 7)
    assert dict(r1) == dict(r7)
    assert r1["kappa_q6"] == kappa_brute(a.tolist(), b.tolist())
    assert r1["kappa_q6"] > 0
    # below-chance: b is mostly the negation of a -> negative kappa,
    # floor division must round toward -inf (Python semantics)
    b_neg = np.where(rng.random(500) < 0.9, ~a, a)
    r = run(a.tolist(), b_neg.tolist(), 4)
    want = kappa_brute(a.tolist(), b_neg.tolist())
    assert r["kappa_q6"] == want and want < 0


def test_containment_pairs_catches_asymmetric_neardups(ray_session):
    """A short doc quoted whole inside a long one has high containment
    but low Jaccard: containment_pairs must find it (recall 1 via the
    prefix filter), match a brute-force shingle sweep exactly, and be
    block-layout invariant."""
    import ray.data

    from luzzu_ray.ops.dedup import containment_pairs

    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(400)]

    def mk(n):
        return " ".join(rng.choice(words, n))

    quote = mk(12)                       # 10 trigram shingles
    long_host = mk(150) + " " + quote + " " + mk(150)
    docs = {
        1: quote,                        # contained in 2 (low jaccard)
        2: long_host,
        3: mk(40),
        4: mk(40),
        5: quote + " " + mk(3),          # mostly the quote
    }
    t = pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    })

    def shingles(text):
        import re
        ts = re.findall(r"[a-z0-9]+", text.lower())
        return {" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)}

    thr = 0.8
    want = {}
    for a, ta in docs.items():
        for b, tb in docs.items():
            if a == b:
                continue
            sa, sb = shingles(ta), shingles(tb)
            cq6 = len(sa & sb) * 1_000_000 // len(sa)
            if cq6 >= int(thr * 1e6):
                want[(a, b)] = cq6
    assert (1, 2) in want                 # the asymmetric case exists
    sa, sb = shingles(docs[1]), shingles(docs[2])
    assert len(sa & sb) / len(sa | sb) < 0.2   # and jaccard is low

    outs = []
    for parts in (1, 4):
        got = (
            containment_pairs(
                ray.data.from_arrow(t).repartition(parts),
                threshold=thr, num_partitions=3)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got_map = {(r["a"], r["b"]): r["containment_q6"]
               for _, r in outs[0].iterrows()}
    assert got_map == want


def test_cross_source_dup_matrix_counts_and_orientation(ray_session):
    """Pair counts land under the (least, greatest) source pair and
    the diagonal counts within-source duplication; layout invariant."""
    import ray.data

    from luzzu_ray.ops.dedup import cross_source_dup_matrix

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen")
    docs = [
        (1, base, "web"),
        (2, base + " phi", "web"),           # near-dup of 1 (web-web)
        (3, base + " chi", "books"),         # near-dup of 1,2 (cross)
        (4, other, "books"),
        (5, other + " x y", "web"),          # near-dup of 4 (cross)
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs]),
        "source": pa.array([d[2] for d in docs]),
    })
    want = {("books", "web"): 3, ("web", "web"): 1}
    for parts in (1, 4):
        got = cross_source_dup_matrix(
            ray.data.from_arrow(t).repartition(parts),
            jaccard_threshold=0.6, num_partitions=3,
        ).to_pandas()
        got_map = {(r["source_a"], r["source_b"]): r["n_pairs"]
                   for _, r in got.iterrows()}
        assert got_map == want, parts


def test_bucketed_join_equals_plain_join_and_validates(ray_session, tmp_path):
    """bucket_write + bucketed_join == pyarrow plain join (any bucket
    count, including buckets with rows on only one side), and a layout
    mismatch raises instead of joining wrong."""
    import pytest
    import ray

    from luzzu_ray.ops.bucketed import (
        bucket_write, bucketed_join, read_manifest)

    left = pa.table({
        "k": pa.array([1, 2, 3, 5, 8, 13, 21, 34], pa.int64()),
        "lv": pa.array(list(range(8)), pa.int64()),
    })
    right = pa.table({
        "k2": pa.array([2, 2, 3, 34, 34, 34, 99], pa.int64()),
        "rv": pa.array([10, 11, 12, 13, 14, 15, 16], pa.int64()),
    })
    expect = left.join(right, keys=["k"], right_keys=["k2"],
                       join_type="inner")
    expect = expect.to_pandas().sort_values(
        ["k", "lv", "rv"]).reset_index(drop=True)

    for nb in (2, 7):
        ld = str(tmp_path / f"l{nb}")
        rd = str(tmp_path / f"r{nb}")
        bucket_write(ray.data.from_arrow(left), "k", nb, ld)
        bucket_write(ray.data.from_arrow(right), "k2", nb, rd)
        assert read_manifest(ld)["n_buckets"] == nb
        got = bucketed_join(ld, rd, "k", "k2").to_pandas()
        got = got[["k", "lv", "rv"]].sort_values(
            ["k", "lv", "rv"]).reset_index(drop=True)
        assert got.equals(expect[["k", "lv", "rv"]]), nb

    # mismatched bucket counts must refuse to join
    ld = str(tmp_path / "l_a")
    rd = str(tmp_path / "r_b")
    bucket_write(ray.data.from_arrow(left), "k", 4, ld)
    bucket_write(ray.data.from_arrow(right), "k2", 8, rd)
    with pytest.raises(ValueError, match="n_buckets"):
        bucketed_join(ld, rd, "k", "k2")
    # and so must a key that differs from the layout's bucketing key
    with pytest.raises(ValueError, match="keys"):
        bucketed_join(ld, ld, "lv", "k")


def test_doc_len_outliers_exact_tie_and_fire(ray_session, tmp_path):
    """Pins the integer-cutoff derivation of q_doc_len_outliers: one
    outlier among m equal peers sits at exactly z^2 = m, so a group of
    4 peers + 1 extreme is an EXACT 2-sigma tie (must NOT flag — the
    predicate is strict, and K is a perfect square, exercising the
    isqrt tie branch), while 6 peers + 1 extreme (z^2 = 6 > 4) must
    flag exactly the extreme doc."""
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    rows = []
    # group "tie": 4 equal + 1 extreme -> exact 2-sigma, no outlier
    for i, ln in enumerate([5, 5, 5, 5, 13]):
        rows.append((i, "tie", ln))
    # group "fire": 6 equal + 1 extreme -> z^2 = 6, outlier fires
    for i, ln in enumerate([7, 7, 7, 7, 7, 7, 400]):
        rows.append((100 + i, "fire", ln))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows]),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        "text": pa.array(["x" * r[2] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = E.q_doc_len_outliers(str(tmp_path)).to_pandas()
    flagged = sorted(got[got["is_outlier"]]["doc_id"].tolist())
    assert flagged == [106]


def test_neardup_probe_reuses_persisted_index(ray_session, tmp_path):
    """neardup_probe_index(reuse_index=True): the second probe must
    consume the index built by the first call WITHOUT rewriting it
    (byte mtimes untouched), return identical pairs, and refuse an
    index whose layout disagrees with the requested bucketing."""
    import os

    import pytest
    import ray

    import pyarrow.compute as pc

    from luzzu_ray.ops.bucketed import MANIFEST_NAME
    from luzzu_ray.ops.dedup import neardup_probe_index

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pa.table({
        "doc_id": pa.array([0, 2, 4, 1, 3], pa.int64()),
        "text": pa.array([
            base, base + " extra", "completely different words here now",
            base + " indeed", "nothing shared with anything else at all",
        ]),
    })
    ds = ray.data.from_arrow(docs)
    corpus = ds.map_batches(
        lambda t: t.filter(pc.equal(
            pc.bit_wise_and(t["doc_id"], pa.scalar(1, pa.int64())), 0)),
        batch_format="pyarrow")
    new = ds.map_batches(
        lambda t: t.filter(pc.equal(
            pc.bit_wise_and(t["doc_id"], pa.scalar(1, pa.int64())), 1)),
        batch_format="pyarrow")
    idx, pr = str(tmp_path / "idx"), str(tmp_path / "probe")

    got1 = neardup_probe_index(
        corpus, new, idx, pr, jaccard_threshold=0.6, n_buckets=4,
    ).to_pandas().sort_values(["corpus_id", "new_id"]).reset_index(
        drop=True)
    assert len(got1) >= 1  # doc 1 is a near-dup of docs 0 and 2
    mtime = os.path.getmtime(os.path.join(idx, MANIFEST_NAME))

    got2 = neardup_probe_index(
        corpus, new, idx, str(tmp_path / "probe2"),
        jaccard_threshold=0.6, n_buckets=4, reuse_index=True,
    ).to_pandas().sort_values(["corpus_id", "new_id"]).reset_index(
        drop=True)
    assert got2.equals(got1)
    assert os.path.getmtime(os.path.join(idx, MANIFEST_NAME)) == mtime

    with pytest.raises(ValueError, match="layout"):
        neardup_probe_index(
            corpus, new, idx, str(tmp_path / "probe3"),
            jaccard_threshold=0.6, n_buckets=8, reuse_index=True,
        )


def test_grouping_sets_counts_matches_twin(ray_session):
    """GROUPING SETS grains equal the Counter twin (incl. the () grain
    and full-grain reuse), layout-invariant; duplicate sets rejected."""
    import collections

    import pytest
    import ray.data

    from luzzu_ray.ops.relational import grouping_sets_counts

    rng = np.random.default_rng(91)
    n = 1500
    a = rng.choice(["x", "y", "z"], n)
    b = rng.choice(["p", "q"], n)
    t = pa.table({"a": pa.array(a), "b": pa.array(b)})
    sets = [("a", "b"), ("b",), ()]
    want: collections.Counter = collections.Counter()
    for ai, bi in zip(a, b):
        want[(ai, bi)] += 1
        want[(None, bi)] += 1
        want[(None, None)] += 1
    for parts in (1, 6):
        rows = grouping_sets_counts(
            ray.data.from_arrow(t).repartition(parts), ["a", "b"],
            sets, 3,
        ).take_all()
        got = {(r["a"], r["b"]): r["n"] for r in rows}
        assert got == dict(want), parts
        assert len(rows) == len(want)  # no duplicate grain rows
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_counts(
            ray.data.from_arrow(t), ["a", "b"], [("b",), ("b",)])
    with pytest.raises(ValueError, match="subset"):
        grouping_sets_counts(
            ray.data.from_arrow(t), ["a", "b"], [("c",)])


def test_equidepth_calibration_matches_twin(ray_session):
    """Calibration bins equal the pure-Python discrete-quantile twin
    (heavy ties included), layout-invariant."""
    import ray.data

    from luzzu_ray.ops.relational import equidepth_calibration

    rng = np.random.default_rng(92)
    n = 3000
    # heavy-tie score domain so some decile edges coincide
    score = rng.integers(0, 12, n).astype(np.int64) * 100
    keep = (score + rng.integers(0, 600, n)) > 700
    t = pa.table({"s": pa.array(score), "keep": pa.array(keep)})
    n_bins = 10
    # twin: discrete-quantile edges, first-matching-bin assignment
    sv = np.sort(score)
    edges = [int(sv[-((-k * n) // n_bins) - 1]) for k in range(1, n_bins)]
    edges.append(int(sv[-1]))
    want = {}
    lo = -(2**63)
    for bidx, hi in enumerate(edges):
        m = ((score > lo) & (score <= hi)) if bidx < n_bins - 1 else (
            score > lo)
        cnt, pos = int(m.sum()), int(keep[m].sum())
        rate = (pos * 10**6) // cnt if cnt else None
        want[bidx] = (hi, cnt, pos, rate)
        lo = max(lo, hi)
    for parts in (1, 7):
        out = equidepth_calibration(
            ray.data.from_arrow(t).repartition(parts), "s", "keep",
            n_bins=n_bins, num_partitions=4,
        )
        got = {r["bin"]: (r["hi_q"], r["n"], r["n_keep"], r["keep_rate_q6"])
               for r in out.to_pylist()}
        assert got == want, parts


def test_skyline_mask_matches_bruteforce():
    """Vectorized 2-D skyline mask == literal dominance twin, across
    random int grids dense with ties and duplicate points."""
    from luzzu_ray.ops.skyline import skyline_mask_2d, skyline_py

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 120))
        # small value domain => many exact ties and duplicate vectors
        x = rng.integers(0, 8, n).astype(np.int64)
        y = rng.integers(0, 8, n).astype(np.int64)
        mask = skyline_mask_2d(x, y)
        rows = [{"i": i, "x": int(x[i]), "y": int(y[i])} for i in range(n)]
        want = {r["i"] for r in skyline_py(rows, ("x", "y"), ())}
        assert set(np.flatnonzero(mask)) == want, (trial, x, y)
    assert skyline_mask_2d(
        np.empty(0, np.int64), np.empty(0, np.int64)).tolist() == []


def test_skyline_dataset_two_phase(ray_session):
    """Distributed two-phase skyline over many small blocks equals the
    single-pass twin, including minimize criteria and duplicates."""
    import ray.data

    from luzzu_ray.ops.skyline import skyline, skyline_py

    rng = np.random.default_rng(11)
    n = 400
    a = rng.integers(0, 50, n).astype(np.int64)
    b = rng.integers(0, 50, n).astype(np.int64)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "a": pa.array(a), "b": pa.array(b),
    })
    ds = ray.data.from_arrow(t).repartition(13)
    got = sorted(
        skyline(ds, maximize=("a",), minimize=("b",)).take_all(),
        key=lambda r: r["doc_id"],
    )
    rows = [{"doc_id": i, "a": int(a[i]), "b": int(b[i])}
            for i in range(n)]
    want = sorted(skyline_py(rows, ("a",), ("b",)),
                  key=lambda r: r["doc_id"])
    assert got == want


def test_morton2_matches_scalar_twin():
    """Vectorized bit interleave == scalar twin, incl. bit-width mask."""
    from luzzu_ray.ops.zorder import morton2, morton2_py

    rng = np.random.default_rng(3)
    for bits in (1, 4, 16, 32):
        x = rng.integers(0, 1 << min(bits + 2, 63), 200).astype(np.int64)
        y = rng.integers(0, 1 << min(bits + 2, 63), 200).astype(np.int64)
        z = morton2(x, y, bits)
        for i in range(len(x)):
            assert int(z[i]) == morton2_py(
                int(x[i]) & ((1 << bits) - 1),
                int(y[i]) & ((1 << bits) - 1), bits), (bits, i)
    # locality sanity: interleave of (1,0) and (0,1) differ in adjacent bits
    assert morton2_py(1, 0, 4) == 1 and morton2_py(0, 1, 4) == 2


def test_zorder_layout_prunes_and_is_transparent(ray_session, tmp_path):
    """zorder_layout + zorder_prune_read: the pruned-and-filtered result
    equals the plain full-scan filter (layout transparency), AND the
    zone maps actually skip files for a tight 2-D box (the point of the
    layout) — including a box matching nothing (0 files read)."""
    import ray.data

    from luzzu_ray.ops.zorder import zorder_layout, zorder_prune_read

    rng = np.random.default_rng(5)
    n = 20_000
    x = rng.integers(0, 1000, n).astype(np.int64)
    y = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.table({
        "rid": pa.array(range(n), pa.int64()),
        "x": pa.array(x), "y": pa.array(y),
    })
    out = str(tmp_path / "zl")
    manifest = zorder_layout(
        ray.data.from_arrow(t).repartition(16), out, "x", "y", bits=10)
    assert len(manifest["zones"]) > 4  # enough files for skipping to mean something
    assert sum(z["n_rows"] for z in manifest["zones"]) == n

    box_x, box_y = (100, 160), (400, 460)
    pruned, n_read, n_total = zorder_prune_read(out, box_x, box_y)
    assert 0 < n_read < n_total  # zone maps skipped files
    got = pruned.to_pandas()
    got = got[(got["x"].between(*box_x)) & (got["y"].between(*box_y))]
    want = (x >= box_x[0]) & (x <= box_x[1]) & (y >= box_y[0]) & (y <= box_y[1])
    assert sorted(got["rid"].tolist()) == sorted(np.flatnonzero(want).tolist())

    # a box outside the data domain reads zero files and yields a typed
    # empty dataset with the layout's schema
    empty, n_read0, _ = zorder_prune_read(out, (5000, 6000), (0, 10))
    assert n_read0 == 0
    assert empty.count() == 0
    assert set(empty.schema().names) >= {"rid", "x", "y"}


def test_nfc_normalize_batch_matches_scalar_twin():
    """Batch NFC kernel == row twin on nulls, ASCII fast-path rows,
    already-composed text and decomposed sequences; layout-invariant."""
    from luzzu_ray.ops.textstats import nfc_normalize_batch, nfc_normalize_py

    texts = [
        None, "", "plain ascii",
        "café",            # decomposed -> composes
        "café",             # already NFC, non-ASCII (fast path miss)
        "Århus über",  # two combining marks
        "́leading mark", "mixed café café",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    for split in (1, 3):
        tt = pa.concat_tables(
            [t.slice(i, split) for i in range(0, len(texts), split)])
        got = nfc_normalize_batch(tt).to_pylist()
        for row, txt in zip(got, texts):
            norm, changed, n_cp = nfc_normalize_py(txt)
            assert row["text_nfc"] == norm, txt
            assert row["changed"] == changed, txt
            assert row["n_cp"] == n_cp, txt


def test_mutual_knn_pairs_matches_brute_twin(ray_session):
    """mutual_knn_pairs == brute-force per-cell mutual-best twin
    (ties to lowest id), regardless of block layout, incl. cells with
    one side empty and exact-duplicate vectors (the tie case)."""
    import ray.data

    from luzzu_ray.ops.similarity import mutual_knn_pairs

    rng = np.random.default_rng(17)
    n, d = 240, 8
    V = rng.normal(size=(n, d))
    V[50] = V[52]  # exact duplicates on the odd side of some cell
    C = rng.normal(size=(4, d))

    def norm(M):
        return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)

    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, row)) for row in V],
                              pa.list_(pa.float32())),
    })
    # float32 storage: recompute the twin from the float32-rounded matrix
    V32 = np.asarray(t["embedding"].combine_chunks().flatten(), np.float32)
    V32 = V32.reshape(n, d).astype(np.float64)
    cells = np.argmax(V32 @ C.T, axis=1)
    Nv = norm(V32)
    want = set()
    for c in range(4):
        ids = np.flatnonzero(cells == c)
        a = ids[ids % 2 == 0]
        b = ids[ids % 2 == 1]
        if len(a) == 0 or len(b) == 0:
            continue
        G = Nv[a] @ Nv[b].T
        fwd = np.argmax(G, axis=1)
        bwd = np.argmax(G, axis=0)
        for i in range(len(a)):
            if bwd[fwd[i]] == i:
                want.add((int(a[i]), int(b[fwd[i]])))

    for nblocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        got = {(r["src_id"], r["tgt_id"])
               for r in mutual_knn_pairs(ds, C).take_all()}
        assert got == want, nblocks


def test_lpa_communities_matches_python_twin(ray_session):
    """Synchronous LPA == pure-Python round twin on random graphs and
    a crafted tie case (mode tie -> smallest label), for any block
    layout; the over-cap JOIN FALLBACK (one hash join on dst + one
    src-keyed exchange per round) is bit-equal to the broadcast plan."""
    import ray.data

    from luzzu_ray.ops.graph import lpa_communities

    def twin(edge_list, rounds):
        nbrs = {}
        for a, b in edge_list:
            nbrs.setdefault(a, []).append(b)
            nbrs.setdefault(b, []).append(a)
        lbl = {v: v for v in nbrs}
        for _ in range(rounds):
            new = {}
            for v, ns in nbrs.items():
                cnt = {}
                for u in ns:
                    cnt[lbl[u]] = cnt.get(lbl[u], 0) + 1
                best = min(cnt, key=lambda c: (-cnt[c], c))
                new[v] = best
            lbl = new
        return lbl

    rng = np.random.default_rng(23)
    cases = [
        # two triangles bridged by one edge
        [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)],
        # star: all leaves adopt the hub's label, hub ties to min leaf
        [(10, i) for i in range(11, 18)],
    ]
    for _ in range(3):
        n = 60
        es = {tuple(sorted(p)) for p in
              rng.integers(0, n, size=(150, 2)).tolist() if p[0] != p[1]}
        cases.append(sorted(es))
    for rounds in (1, 3):
        for ci, edge_list in enumerate(cases):
            t = pa.table({
                "a": pa.array([e[0] for e in edge_list], pa.int64()),
                "b": pa.array([e[1] for e in edge_list], pa.int64()),
            })
            want = twin(edge_list, rounds)
            for nb in (1, 5):
                ds = ray.data.from_arrow(t).repartition(nb)
                got = lpa_communities(ds, rounds=rounds)
                gm = dict(zip(got["node"].to_pylist(),
                              got["community"].to_pylist()))
                assert gm == want, (ci, rounds, nb)
                # join fallback (forced by a tiny broadcast cap) must
                # be bit-equal to the broadcast plan
                fb = lpa_communities(
                    ray.data.from_arrow(t).repartition(nb),
                    rounds=rounds, broadcast_max_nodes=1)
                fm = dict(zip(fb["node"].to_pylist(),
                              fb["community"].to_pylist()))
                assert fm == want, ("fallback", ci, rounds, nb)


def test_line_rule_filter_block_matches_twin():
    """C4 rule line filter == pure-Python twin: word-window split,
    min-words/terminal/banned rules, ordered reassembly, zero-kept
    docs, NULL/empty docs dropped; invariant to batch splits."""
    from luzzu_ray.ops.lines import line_rule_filter_block

    W, MINW = 3, 2
    texts = [
        "one two. three four five. six",     # lines of 3 words
        None, "",
        "bad spark line. keep me now. x",
        "short.",                              # 1-word line, < min
        "a b c d e f g h i",                  # no terminals -> 0 kept
    ]
    ids = list(range(len(texts)))

    def twin(doc, text):
        if not text:
            return None
        words = text.split(" ")
        lines = [" ".join(words[i:i + W]) for i in range(0, len(words), W)]
        kept = [ln for ln in lines
                if len(ln.split(" ")) >= MINW and ln.endswith(".")
                and "spark" not in ln]
        return (doc, len(lines), len(kept), " ".join(kept))

    want = [r for r in (twin(i, tx) for i, tx in zip(ids, texts)) if r]
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    for split in (len(texts), 2):
        parts = [
            line_rule_filter_block(
                t.slice(i, split), words_per_line=W, min_words=MINW,
                banned="spark")
            for i in range(0, len(texts), split)
        ]
        got = [tuple(r.values()) for p in parts for r in p.to_pylist()]
        assert got == want, (split, got)


def test_kcenter_select_matches_greedy_twin(ray_session):
    """Distributed greedy k-center == the single-process greedy twin
    (seed = min id, farthest-point rounds, ties to min id), for any
    block layout; k > n truncates; duplicate-vector corpus degrades
    deterministically on both sides."""
    import ray.data

    from luzzu_ray.ops.similarity import kcenter_select

    def twin(V, ids, k):
        N = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        sel = [int(ids[np.argmin(ids)])]
        dmin = np.full(len(ids), np.inf)
        for _ in range(1, min(k, len(ids))):
            c = N[np.flatnonzero(ids == sel[-1])[0]]
            dmin = np.minimum(dmin, 1.0 - N @ c)
            i = np.lexsort((ids, -dmin))[0]
            sel.append(int(ids[i]))
        return sel

    rng = np.random.default_rng(29)
    n, d = 120, 6
    V = rng.normal(size=(n, d)).astype(np.float32).astype(np.float64)
    V[7] = V[3]  # duplicate vectors
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in V],
                              pa.list_(pa.float32())),
    })
    for k in (1, 5):
        want = twin(V, ids, k)
        for nb in (1, 6):
            got = kcenter_select(
                ray.data.from_arrow(t).repartition(nb), k)
            assert got["vec_id"].to_pylist() == want, (k, nb)
            assert got["sel_rank"].to_pylist() == list(range(len(want)))
    # k beyond n truncates at n selections
    tiny = ray.data.from_arrow(t.slice(0, 3))
    got = kcenter_select(tiny, 10)
    assert got.num_rows == 3


def test_kcenter_select_sampled(ray_session):
    """Memory-bounded sampled k-center: with sample_k >= n it is
    bit-identical to the full selection; with sample_k < n it equals
    the full selection restricted to the bottom-k-by-hash sample
    (computed independently here), for any block layout."""
    import ray.data

    from luzzu_ray.ops.similarity import (
        kcenter_select, kcenter_select_sampled)

    rng = np.random.default_rng(31)
    n, d = 90, 5
    V = rng.normal(size=(n, d)).astype(np.float32).astype(np.float64)
    ids = np.arange(n, dtype=np.int64) * 3 + 1  # non-contiguous ids
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in V],
                              pa.list_(pa.float32())),
    })
    A, B = 6364136223846793005, 1442695040888963407
    for nb in (1, 6):
        ds = ray.data.from_arrow(t).repartition(nb)
        full = kcenter_select(ray.data.from_arrow(t), 7)
        over = kcenter_select_sampled(ds, 7, sample_k=n + 10)
        assert over.equals(full), nb
        # sample_k < n: equal to the full greedy over the hash sample
        sk = 40
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(A) + np.uint64(B)
        keep = np.sort(np.argsort(h)[:sk])
        want = kcenter_select(
            ray.data.from_arrow(t.take(pa.array(keep))), 7)
        got = kcenter_select_sampled(
            ray.data.from_arrow(t).repartition(nb), 7, sample_k=sk)
        assert got.equals(want), nb


def test_hard_negatives_matches_brute_twin(ray_session):
    """hard_negatives == per-cell brute twin (nearest different-label,
    ties to lowest id); single-label cells emit nothing; layout-
    invariant."""
    import ray.data

    from luzzu_ray.ops.similarity import hard_negatives

    rng = np.random.default_rng(31)
    n, d = 200, 6
    V = rng.normal(size=(n, d)).astype(np.float32).astype(np.float64)
    lab = (np.arange(n) % 3).astype(np.int64)
    lab[:40] = 7  # make one cell possibly single-label heavy
    C = rng.normal(size=(4, d))

    N = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
    cells = np.argmax(V @ C.T, axis=1)
    want = {}
    for c in range(4):
        ids = np.flatnonzero(cells == c)
        if len(ids) < 2 or len(set(lab[ids])) < 2:
            continue
        G = N[ids] @ N[ids].T
        G[lab[ids][:, None] == lab[ids][None, :]] = -np.inf
        best = np.argmax(G, axis=1)
        for i in range(len(ids)):
            if np.isfinite(G[i, best[i]]):
                want[int(ids[i])] = int(ids[best[i]])

    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "label": pa.array(lab, pa.int32()),
        "embedding": pa.array([list(map(float, r)) for r in V],
                              pa.list_(pa.float32())),
    })
    for nb in (1, 7):
        got = {r["vec_id"]: r["neg_id"]
               for r in hard_negatives(
                   ray.data.from_arrow(t).repartition(nb), C).take_all()}
        assert got == want, nb


def test_preference_pairs_matches_twin(ray_session):
    """preference_pairs == row twin: chosen (score DESC, idx ASC),
    rejected (score ASC, idx DESC), all-tied convs yield (min, max),
    single-assistant convs drop, NULL/empty text scores 0; invariant
    to block layout."""
    import ray.data

    from luzzu_ray.ops.transcripts import preference_pairs

    rows = [
        # conv, idx, role, text
        ("a", 0, "user", "q"), ("a", 1, "assistant", "one two three"),
        ("a", 2, "user", "q"), ("a", 3, "assistant", "one"),
        ("b", 0, "assistant", "same same"), ("b", 1, "assistant", "x y"),
        ("c", 0, "assistant", "only one assistant turn"),
        ("d", 0, "assistant", None), ("d", 1, "assistant", ""),
        ("e", 0, "user", "no assistant here"),
    ]
    want = {
        "a": (1, 3, 3, 1),
        "b": (0, 1, 2, 2),   # tie: chosen min idx, rejected max idx
        "d": (0, 1, 0, 0),   # null/empty both score 0
    }
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows], pa.string()),
    })
    for nb in (1, 4):
        got = {
            r["conv_id"]: (r["chosen_idx"], r["rejected_idx"],
                           r["chosen_score"], r["rejected_score"])
            for r in preference_pairs(
                ray.data.from_arrow(t).repartition(nb)).take_all()
        }
        assert got == want, nb


def test_daily_span_window_overlap_twin(ray_session):
    """Span/window overlap join == row twin: closed-interval semantics
    (touching endpoint => 0-us overlap row), multi-day users, windows
    matching nothing, layout invariance."""
    import ray.data

    from luzzu_ray.ops.events import US_PER_DAY, daily_span_window_overlap

    D = US_PER_DAY
    rows = [  # (user, ts_us)
        (1, 100), (1, 500), (1, D + 50),      # day 0 span [100,500]; day 1 [50+D]
        (2, 1000), (2, 1000),                 # single-point span
        (3, 2 * D + 10), (3, 2 * D + 900),
    ]
    windows = [(0, 200), (500, 600), (10_000, 20_000), (2 * D, 2 * D + 10)]

    def twin():
        spans = {}
        for u, ts in rows:
            key = (u, ts // D)
            lo, hi = spans.get(key, (ts, ts))
            spans[key] = (min(lo, ts), max(hi, ts))
        out = set()
        for (u, day), (lo, hi) in spans.items():
            for wi, (ws, we) in enumerate(windows):
                if ws <= hi and lo <= we:
                    out.add((u, day, wi, min(hi, we) - max(lo, ws)))
        return out

    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    want = twin()
    assert any(o[3] == 0 for o in want)  # the touching-endpoint case exists
    for nb in (1, 3):
        got = {
            (r["user_id"], r["day"], r["window_id"], r["overlap_us"])
            for r in daily_span_window_overlap(
                ray.data.from_arrow(t).repartition(nb), windows).take_all()
        }
        assert got == want, nb


def test_orc_roundtrip_nulls_and_unicode(ray_session, tmp_path):
    """ORC custom-source roundtrip pins null text (coalesced to '' on
    both sides), multibyte text and the multi-file split."""
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    t = pa.table({
        "doc_id": pa.array(range(9), pa.int64()),
        "text": pa.array(
            [None, "", "plain", "café 漢字 😀", "a,b\"c", "x"] + ["y"] * 3),
        "lang": pa.array(["en"] * 9),
        "source": pa.array(["s"] * 9),
        "n_chars": pa.array([0] * 9, pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = E.q_documents_orc_roundtrip(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    texts = t["text"].to_pylist()
    want = [len(x) if x else 0 for x in texts]
    assert got["n_chars"].tolist() == want
    assert got["doc_id"].tolist() == list(range(9))


def test_poisson_bootstrap_sums_properties(ray_session):
    """Bootstrap partials: layout-invariant (block splits never change
    any replica), multiplicity distribution ~ Poisson(1) (mean n per
    replica within 5% of row count on 20k rows), and the scalar hash
    twin agrees with the batch path."""
    import ray.data

    from luzzu_ray.ops.bootstrap import (
        POISSON1_CDF_Q53, poisson_bootstrap_sums, poisson_multiplicity)
    from luzzu_ray.ops.sketch import splitmix64

    n, B = 20_000, 4
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(["a" if i % 3 else "b" for i in range(n)]),
        "value": pa.array([float(i % 50) for i in range(n)]),
    })

    def run(nb):
        ds = ray.data.from_arrow(t).repartition(nb)
        out = poisson_bootstrap_sums(
            ds, "event_type", "value", "event_id", n_replicas=B)
        return sorted(
            (r["key"], r["replica"], r["n"], r["sum_v_q2"])
            for r in out.take_all())

    one = run(1)
    assert one == run(7)
    per_replica_n = {}
    for k, b, cnt, sv in one:
        per_replica_n[b] = per_replica_n.get(b, 0) + cnt
    for b, tot in per_replica_n.items():
        assert abs(tot - n) < 0.05 * n, (b, tot)

    # scalar twin of the multiplicity draw
    ids = np.array([0, 1, 12345], dtype=np.int64)
    for b in range(B):
        w = poisson_multiplicity(ids, b, B)
        for i, rid in enumerate(ids):
            h = int(splitmix64(np.array(
                [np.uint64(rid) * np.uint64(B) + np.uint64(b)],
                dtype=np.uint64))[0])
            u = h >> 11
            expect = sum(u >= thr for thr in POISSON1_CDF_Q53)
            assert w[i] == expect


def test_dedup_bow_detects_shuffled_copies(ray_session, tmp_path):
    """Bag-of-words dedup flags word-order-shuffled copies (keeping the
    min doc_id) and leaves distinct multisets alone; NULL == '' under
    the shared key; duplicate tokens preserved (multiset, not set)."""
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    texts = [
        "alpha beta gamma",     # 0: base
        "gamma alpha beta",     # 1: shuffled copy -> dup of 0
        "alpha beta",           # 2: subset, NOT a dup
        "alpha alpha beta gamma",  # 3: different multiset
        "alpha gamma beta alpha",  # 4: same multiset as 3 -> dup
        "beta alpha alpha gamma",  # 5: same multiset as 3 -> dup
        None, "",               # 6, 7: both key '' -> 7 dups 6
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([0] * len(texts), pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = E.q_dedup_bow(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["is_dup"].tolist() == [
        False, True, False, False, True, True, False, True]


def test_grouped_kendall_counts_matches_twin(ray_session):
    """Kendall pair counts == brute itertools twin (conc/disc/tie-x/
    tie-y/tie-both partition all pairs), layout-invariant; over-cap
    groups raise loudly."""
    import itertools

    import pytest
    import ray.data

    from luzzu_ray.ops.relational import grouped_kendall_counts

    rng = np.random.default_rng(41)
    n = 150
    key = np.array(["s%d" % (i % 3) for i in range(n)])
    x = rng.integers(0, 12, n).astype(np.int64)  # small domain => many ties
    y = rng.integers(0, 12, n).astype(np.int64)
    want = {}
    for g in set(key):
        idx = np.flatnonzero(key == g)
        conc = disc = tx = ty = tb = 0
        for i, j in itertools.combinations(idx, 2):
            dx, dy = int(x[i] - x[j]), int(y[i] - y[j])
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
            elif dx == 0 and dy == 0:
                tb += 1
            elif dx == 0:
                tx += 1
            else:
                ty += 1
        m = len(idx)
        want[g] = (m * (m - 1) // 2, conc, disc, tx, ty, tb)
    t = pa.table({
        "k": pa.array(key), "x": pa.array(x), "y": pa.array(y),
    })
    for nb in (1, 5):
        got = {
            r["key"]: (r["n"], r["n_conc"], r["n_disc"], r["n_tie_x"],
                       r["n_tie_y"], r["n_tie_both"])
            for r in grouped_kendall_counts(
                ray.data.from_arrow(t).repartition(nb),
                "k", "x", "y").take_all()
        }
        assert got == want, nb
    # the in-task ValueError surfaces Ray-wrapped; match on the message
    with pytest.raises(Exception, match="group_cap"):
        grouped_kendall_counts(
            ray.data.from_arrow(t), "k", "x", "y", group_cap=10).take_all()


def test_url_normalize_rules():
    """Each canonicalization rule fires: case fold, www strip, default
    vs non-default port, fragment/utm/trailing-slash removal; rows not
    shaped like scheme://host pass through with empty host."""
    from luzzu_ray.ops.web import normalize_url_batch, resource_key_batch

    t = pa.table({"url": pa.array([
        "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&id=3#frag",
        "http://ex.com:80/a/b?id=3&utm_medium=y",
        "http://ex.com:8080/a/b/",
        "not a url",
        None,
    ])})
    out = normalize_url_batch(t)
    # NOTE: a '/' BEFORE the query string is path content and is kept;
    # only a trailing '/' at the very end of the URL is stripped.
    assert out["url_norm"].to_pylist() == [
        "https://ex.com/a/b/?id=3",
        "http://ex.com/a/b?id=3",
        "http://ex.com:8080/a/b",
        "not a url",
        "",
    ]
    assert out["host"].to_pylist() == [
        "ex.com", "ex.com", "ex.com", "", ""]
    rk = resource_key_batch(t)["resource_key"].to_pylist()
    # scheme ignored, query/fragment ignored, non-default port kept
    assert rk[0] == rk[1] == "ex.com/a/b"
    assert rk[2] == "ex.com:8080/a/b"


def test_strip_html_single_pass_entities():
    """Tags -> spaces (word boundaries kept), entities decode in the
    fixed order so '&amp;lt;' yields the LITERAL '&lt;' (no re-decode),
    n_tags counts removed tags, whitespace collapses."""
    from luzzu_ray.ops.web import strip_html_batch

    t = pa.table({"html": pa.array([
        "<p>a<br>b</p>  <div>c &amp;lt; d &quot;q&quot;</div>",
        "plain",
        None,
    ])})
    out = strip_html_batch(t)
    assert out["text_extracted"].to_pylist() == [
        'a b c &lt; d "q"', "plain", ""]
    assert out["n_tags"].to_pylist() == [5, 0, 0]


def test_filter_hosts_batch_blocklist():
    from luzzu_ray.ops.web import filter_hosts_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "host": pa.array(["a.com", "b.com", None]),
    })
    out = filter_hosts_batch(t, {"b.com"})
    assert out["doc_id"].to_pylist() == [1, 3]  # NULL host is not blocked


def test_grouped_top_fraction_matches_qualify(ray_session):
    """grouped_top_fraction_by_score == DuckDB QUALIFY row_number()
    OVER (PARTITION BY key ORDER BY score DESC, id) <= ceil(n_k/denom)
    — exact, tie-broken by id, layout-invariant."""
    import duckdb
    import ray.data

    from luzzu_ray.ops.relational import grouped_top_fraction_by_score

    rng = np.random.default_rng(7)
    n = 2000
    t = pa.table({
        "k": pa.array(["s%d" % (i % 5) for i in range(n)]),
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "score": pa.array(rng.integers(0, 40, n).astype(np.int64)),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
      SELECT k, doc_id, score FROM t
      QUALIFY row_number() OVER (PARTITION BY k ORDER BY score DESC, doc_id)
        <= CAST(ceil(0.1 * count(*) OVER (PARTITION BY k)) AS BIGINT)
      ORDER BY doc_id
    """).df().reset_index(drop=True)
    for nb in (1, 7):
        got = grouped_top_fraction_by_score(
            ray.data.from_arrow(t).repartition(nb),
            "k", "score", "doc_id", 1, 10,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got.shape == want.shape, nb
        assert (got.values == want.values).all(), nb


def test_cdc_chunk_stats_insertion_robust(ray_session):
    """CDC boundaries are window-local: inserting a run into the middle
    of a long doc re-chunks only the neighborhood, so the copy shares
    most chunk instances with the original (the property fixed shingles
    lose); exact counts match a pure-Python twin; short (<W) docs are
    one chunk; empty docs emit no row; layout-invariant."""
    import ray.data

    from luzzu_ray.ops.dedup import CDC_B, CDC_D, CDC_M, CDC_W, cdc_chunk_stats

    rng = np.random.default_rng(11)
    base = "".join(rng.choice(list("abcdefgh ")) for _ in range(4000))
    edited = base[:2000] + "INSERTED RUN " + base[2000:]
    texts = [base, edited, "tiny", "", None, base[:500]]
    ids = list(range(len(texts)))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })

    def twin(s: str):
        n = len(s)
        cuts = []
        for i in range(0, n - CDC_W + 1):
            h = 0
            for ch in s[i:i + CDC_W]:
                h = (h * CDC_B + ord(ch)) % CDC_M
            if h % CDC_D == 0:
                cuts.append(i + CDC_W)
        bl = sorted(set([0] + cuts + [n]))
        return [s[a:b] for a, b in zip(bl, bl[1:]) if b > a]

    chunks = {i: twin(s or "") for i, s in zip(ids, texts)}
    from collections import Counter
    df = Counter()
    for i, cs in chunks.items():
        for c in set(cs):
            df[c] += 1
    want = {
        i: (len(cs), sum(1 for c in cs if df[c] >= 2))
        for i, cs in chunks.items() if cs
    }
    for nb in (1, 4):
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_shared"])
            for r in cdc_chunk_stats(
                ray.data.from_arrow(t).repartition(nb)).take_all()
        }
        assert got == want, nb
    # the robustness property itself: >60% of the original's chunk
    # instances survive in the edited copy
    n0, sh0 = want[0]
    assert n0 > 20 and sh0 / n0 > 0.6, want[0]
    assert want[2][0] == 1  # 'tiny' (< W bytes) is exactly one chunk


def test_conv_retry_stats_detects_rephrase(ray_session):
    """Retry detection fires on a near-identical same-role adjacent
    pair, not on a dissimilar one or a role-alternating pair; both
    turns under SHINGLE_K tokens count as identical (0/0 Jaccard);
    layout-invariant."""
    import ray.data

    from luzzu_ray.ops.transcripts import conv_retry_stats

    rows = [
        # c1: user REPEATS themself (near-identical same-role pair)
        ("c1", 0, "user", "please convert the csv file to parquet now"),
        ("c1", 1, "user", "please convert the csv file to parquet today"),
        ("c1", 2, "assistant", "done"),
        # c2: same-role adjacent but DISSIMILAR -> same_role only
        ("c2", 0, "assistant", "alpha beta gamma delta epsilon zeta"),
        ("c2", 1, "assistant", "one two three four five six seven"),
        # c3: alternating roles, near-identical text -> no candidate
        ("c3", 0, "user", "please convert the csv file to parquet now"),
        ("c3", 1, "assistant", "please convert the csv file to parquet now"),
        # c4: two same-role turns both too short for a trigram
        ("c4", 0, "tool", "ok"),
        ("c4", 1, "tool", "no"),
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
    })
    want = {
        "c1": (2, 1, 1),
        "c2": (1, 1, 0),
        "c3": (1, 0, 0),
        "c4": (1, 1, 1),
    }
    for nb in (1, 3):
        got = {
            r["conv_id"]: (r["n_pairs"], r["n_same_role"], r["n_retry"])
            for r in conv_retry_stats(
                ray.data.from_arrow(t).repartition(nb)).take_all()
        }
        assert got == want, (nb, got)


def test_topic_bucket_declaration_order_tiebreak():
    """Equal hit counts route to the FIRST declared topic; zero hits
    route to 'other'; NULL text is zero hits; counts are exact."""
    from luzzu_ray.ops.textstats import topic_bucket_batch

    topics = {"a": ("cat", "dog"), "b": ("dog", "fox")}
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "dog dog fox",      # a: 2 hits (dog x2), b: 3 -> b
            "cat dog",          # a: 2, b: 1 -> a
            "dog",              # a: 1, b: 1 -> tie -> a (declared first)
            "emu kiwi",         # 0 hits -> other
            None,               # -> other
        ]),
    })
    out = topic_bucket_batch(t, topics)
    assert out["topic"].to_pylist() == ["b", "a", "a", "other", "other"]
    assert out["n_hits"].to_pylist() == [3, 2, 1, 0, 0]


def test_watermark_stats_flags_greedy_green_text():
    """A text GENERATED by always picking a green continuation flags
    (z >= 2 exactly, integer form == float z-test), random text with
    the same words does not; docs with < 2 tokens never flag."""
    import math

    from luzzu_ray.ops.textstats import (WM_A, WM_B, WM_GAMMA_DEN,
                                         WM_GAMMA_NUM, WM_Z,
                                         watermark_stats_batch,
                                         word_hashes)

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta",
             "eta", "theta", "iota", "kappa"]
    hs = {w: h for w, h in zip(vocab, word_hashes(vocab))}

    def is_green(w1, w2):
        h2 = (int(hs[w1]) * int(WM_A) + int(hs[w2]) * int(WM_B)) % (1 << 64)
        return h2 % WM_GAMMA_DEN < WM_GAMMA_NUM

    # greedy watermarked generation: always continue with a green word
    words = ["alpha"]
    for _ in range(60):
        nxt = next(w for w in vocab if is_green(words[-1], w))
        words.append(nxt)
    wm_text = " ".join(words)

    rng = np.random.default_rng(5)
    rand_text = " ".join(rng.choice(vocab) for _ in range(61))

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([wm_text, rand_text, "single"]),
    })
    out = watermark_stats_batch(t)
    rows = {r["doc_id"]: r for b in [out.to_pylist()] for r in b}
    assert rows[0]["n_green"] == rows[0]["n_scored"] == 60
    assert rows[0]["wm_flag"] is True or rows[0]["wm_flag"]
    assert rows[2] == {"doc_id": 2, "n_scored": 0, "n_green": 0,
                       "wm_flag": False}
    # integer z-form == float z-test on every row
    for r in rows.values():
        n, g = r["n_scored"], r["n_green"]
        if n == 0:
            assert not r["wm_flag"]
            continue
        gam = WM_GAMMA_NUM / WM_GAMMA_DEN
        zf = (g - gam * n) / math.sqrt(n * gam * (1 - gam))
        assert r["wm_flag"] == (zf >= WM_Z or math.isclose(zf, WM_Z)), r


def test_perceptron_train_matches_scalar_twin(ray_session):
    """Distributed batch-perceptron weights == a pure-Python
    row-at-a-time twin (independent control flow, shared constants
    only); layout-invariant; a linearly separable toy actually
    separates after training."""
    import ray.data

    from luzzu_ray.ops.classifier import perceptron_train
    from luzzu_ray.ops.vocab import DSIR_BASE

    D, E, TH = 8, 3, 10
    texts = [
        "aaa bbb ccc", "aaa aaa", "", "bbb  ccc", None,
        "xx yy zz xx", "longword" * 4, "aaa bbb", "zz zz zz zz zz",
        "q w e r t y",
    ]
    n_chars = [3, 20, 1, 50, 0, 9, 40, 2, 15, 8]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array(n_chars, pa.int32()),
    })

    def bucket(tok: str) -> int:
        h = 0
        for byt in tok.encode():
            h = (h * int(DSIR_BASE) + byt) % (1 << 64)
        return h % D

    def twin() -> list[int]:
        w = [0] * (D + 1)
        feats = []
        for txt, nc in zip(texts, n_chars):
            toks = (txt or "").split(" ")
            xs = {}
            for tok in toks:
                b = bucket(tok)
                xs[b] = xs.get(b, 0) + 1
            feats.append((xs, 1 if nc >= TH else -1))
        for _ in range(E):
            g = [0] * (D + 1)
            for xs, y in feats:
                sc = w[D] + sum(c * w[b] for b, c in xs.items())
                pred = 1 if sc > 0 else -1
                if pred != y:
                    for b, c in xs.items():
                        g[b] += y * c
                    g[D] += y
            w = [a + b for a, b in zip(w, g)]
        return w

    want = twin()
    for parts in (1, 4):
        got = perceptron_train(
            ray.data.from_arrow(t).repartition(parts),
            n_buckets=D, n_epochs=E, label_threshold=TH,
        ).to_pandas().sort_values("b")
        assert got["w"].tolist() == want, parts


def test_readability_stats_scalar_twin():
    """Engine readability counts == a pure-Python row twin (regex-free
    manual segmentation); the rational reconstructs the float score;
    NULL/empty/no-sentence edges covered."""
    from luzzu_ray.ops.textstats import readability_stats_batch

    texts = ["Hello world. Two birds.", "", None, "xyz", "a.e.i",
             "The quick brown fox jumps. It is easy to read."]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    got = readability_stats_batch(t).to_pandas()

    def runs(s, pred):
        n, inr = 0, False
        for ch in s:
            if pred(ch):
                if not inr:
                    n += 1
                inr = True
            else:
                inr = False
        return n

    for i, txt in enumerate(texts):
        s = txt or ""
        W = runs(s, lambda c: c != " ")
        S = runs(s, lambda c: c != ".")
        V = runs(s.lower(), lambda c: c in "aeiouy")
        r = got.iloc[i]
        assert (r["n_words"], r["n_sentences"], r["n_vowel_groups"]) \
            == (W, S, V), i
        assert r["flesch_num"] == 206835 * S * W - 1015 * W * W \
            - 84600 * V * S, i
        assert r["flesch_den"] == 1000 * S * W, i
        if W and S:
            flesch = 206.835 - 1.015 * W / S - 84.6 * V / W
            assert abs(r["flesch_num"] / r["flesch_den"] - flesch) < 1e-9, i


def test_decayed_user_value_scalar_twin(ray_session):
    """Integer powers-of-two recency decay == a row-at-a-time twin;
    events beyond the horizon contribute 0; layout-invariant."""
    import ray.data

    from luzzu_ray.ops.events import US_PER_DAY, decayed_user_value

    H = 5
    base_day = 1000
    rows = [  # (user, day, value)
        (1, base_day, 3.00),       # age 4 -> w 2
        (1, base_day + 4, 1.50),   # age 0 -> w 32
        (1, base_day - 3, 9.99),   # age 7 > H -> 0
        (2, base_day + 4, 0.01),   # age 0 -> w 32
        (2, base_day + 2, 2.00),   # age 2 -> w 8
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * US_PER_DAY + 17 for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    want = {
        1: (2 * 300 + 32 * 150, 2),
        2: (32 * 1 + 8 * 200, 2),
    }
    for parts in (1, 3):
        got = decayed_user_value(
            ray.data.from_arrow(t).repartition(parts),
            horizon_days=H, num_partitions=2,
        ).to_pandas().sort_values("user_id")
        gm = {int(r["user_id"]): (int(r["decayed_q2"]), int(r["n_recent"]))
              for _, r in got.iterrows()}
        assert gm == want, parts


def test_perceptron_confusion_consistent(ray_session):
    """Train-then-apply confusion counts at sf0.001: totals equal the
    document count, keys live in {-1,1}^2, and the diagonal dominates
    (length-derived labels are nearly linearly separable in hashed
    token counts)."""
    import __ray_entry__ as E

    got = E.q_perceptron_confusion("/root/testdata/sf0.001").to_pandas()
    assert set(got["y"]).issubset({-1, 1})
    assert set(got["pred"]).issubset({-1, 1})
    import duckdb
    n_docs = duckdb.connect().execute(
        "SELECT count(*) FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert int(got["n"].sum()) == n_docs
    diag = int(got[got["y"] == got["pred"]]["n"].sum())
    assert diag * 2 > n_docs


def test_edge_common_neighbors_plans_and_twin(ray_session):
    """Broadcast and wedge-join link-prediction plans agree on a random
    graph and both match a brute-force Python twin; zero-common edges
    appear with n_common = 0."""
    import ray.data

    from luzzu_ray.ops.graph import (
        _edge_common_neighbors_join,
        edge_common_neighbors,
    )

    rng = np.random.default_rng(11)
    n_nodes, n_edges = 40, 160
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    pairs = sorted(set(zip(lo.tolist(), hi.tolist())))
    # an isolated-pair edge with no common neighbors
    pairs.append((1000, 1001))
    t = pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64()),
    })

    nbrs: dict[int, set] = {}
    for x, y in pairs:
        nbrs.setdefault(x, set()).add(y)
        nbrs.setdefault(y, set()).add(x)
    want = {
        (x, y): (len(nbrs[x] & nbrs[y]), len(nbrs[x]), len(nbrs[y]))
        for x, y in pairs
    }

    ds = ray.data.from_arrow(t).repartition(3)
    for got_ds in (
        edge_common_neighbors(ds, num_partitions=2),
        _edge_common_neighbors_join(ds.materialize(), 2),
    ):
        got = got_ds.to_pandas().sort_values(["a", "b"])
        gm = {
            (int(r["a"]), int(r["b"])):
                (int(r["n_common"]), int(r["deg_a"]), int(r["deg_b"]))
            for _, r in got.iterrows()
        }
        assert gm == want
    assert want[(1000, 1001)][0] == 0


def test_minhash_recall_eval_on_duplicates(ray_session, tmp_path):
    """On a corpus with known near-dups the LSH-verified pair set
    equals the prefix-filter ground truth (n_true == n_found ==
    n_overlap > 0) — a banding regression would break this first."""
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    texts = [base, base + " extra", "totally different words here now",
             base.replace("quick", "swift")]
    texts += [f"unrelated document number {i} with filler words {i}"
              for i in range(20)]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = E.q_minhash_recall_eval(str(d)).to_pandas().iloc[0]
    assert got["n_true"] > 0
    assert got["n_true"] == got["n_found"] == got["n_overlap"]


def test_interarrival_histogram_twin(ray_session):
    """log2 gap buckets == a row twin with int.bit_length(); zero gaps
    bucket 0; first-per-user excluded; layout-invariant."""
    import ray.data

    from luzzu_ray.ops.events import interarrival_histogram

    US = 1_000_000
    rows = [  # (user, ts_us)
        (1, 0), (1, 1 * US), (1, 1 * US), (1, 10 * US),
        (2, 5), (2, 6), (2, 1 << 40),
    ]
    t = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    want: dict[int, int] = {}
    by_user: dict[int, list] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        tss.sort()
        for a, b in zip(tss, tss[1:]):
            g = b - a
            k = g.bit_length() if g > 0 else 0
            want[k] = want.get(k, 0) + 1
    for parts in (1, 3):
        got = interarrival_histogram(
            ray.data.from_arrow(t).repartition(parts), num_partitions=2
        ).to_pandas()
        gm = {int(r["bucket"]): int(r["n"]) for _, r in got.iterrows()}
        assert gm == want, parts


def test_window_dup_events_twin(ray_session):
    """Within-window same-(user,type,value) duplicate marks == a row
    twin; window boundary inclusive; different type/value never dups;
    layout-invariant."""
    import ray.data

    from luzzu_ray.ops.events import window_dup_events

    W = 100
    rows = [  # (eid, user, type, ts_us, value)
        (0, 1, "a", 0, 1.0),
        (1, 1, "a", 100, 1.0),    # gap == W -> dup (inclusive)
        (2, 1, "a", 201, 1.0),    # gap 101 > W -> not dup
        (3, 1, "b", 202, 1.0),    # different type
        (4, 1, "a", 202, 2.0),    # different value
        (5, 2, "a", 250, 1.0),    # different user
        (6, 1, "a", 250, 1.0),    # gap 49 from eid2 -> dup
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    want = {0: False, 1: True, 2: False, 3: False, 4: False,
            5: False, 6: True}
    for parts in (1, 3):
        got = window_dup_events(
            ray.data.from_arrow(t).repartition(parts),
            window_us=W, num_partitions=2,
        ).to_pandas()
        gm = {int(r["event_id"]): bool(r["is_dup"])
              for _, r in got.iterrows()}
        assert gm == want, parts


def test_split_leakage_audit_detects_cross_split_pair(ray_session, tmp_path):
    """A near-dup pair planted across two sources that hash to
    DIFFERENT splits shows up as an off-diagonal (split_a != split_b)
    row; within-split dups stay on the diagonal."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from luzzu_ray.functions.text import token_hash_py

    def split_of(src: str) -> str:
        b = (token_hash_py(src.encode()) & ((1 << 64) - 1)) % 10_000
        return "train" if b < 8000 else ("val" if b < 9000 else "test")

    # find two sources in different splits
    cands = [f"s{i}" for i in range(200)]
    by_split: dict[str, str] = {}
    for s in cands:
        by_split.setdefault(split_of(s), s)
        if len(by_split) >= 2:
            break
    (sp1, src1), (sp2, src2) = list(by_split.items())[:2]
    assert sp1 != sp2
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "into the deep dark forest tonight again and again")
    texts = [base, base + " extra"]
    srcs = [src1, src2]
    texts += [f"unrelated filler document number {i} {i}" for i in range(20)]
    srcs += [src1] * 20
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(srcs),
    })
    d = tmp_path / "leak"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = E.q_split_leakage_audit(str(d)).to_pandas()
    off = got[got["split_a"] != got["split_b"]]
    assert len(off) == 1
    assert int(off.iloc[0]["n_pairs"]) == 1


def test_sliding_chunk_stats_twin(ray_session):
    """Chunk-granularity dedup == a pure-Python twin (chunking + df
    over chunk text); partial duplication is visible (shared section
    -> shared chunks); layout-invariant."""
    import ray.data

    from luzzu_ray.ops.vocab import sliding_chunk_stats

    W, S = 4, 2
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        shared + " one two",
        "prefix words " + shared,  # 2-word (== stride) offset: aligned
        "totally different content with many unique words inside",
        "",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })

    def chunks_of(txt: str) -> list[str]:
        w = txt.split(" ")
        T = len(w)
        nk = 1 + max(0, -(-(T - W) // S)) if T > W else 1
        out = []
        for i in range(nk):
            out.append(" ".join(w[i * S: min(i * S + W, T)]))
        return out

    alls: dict[str, set] = {}
    per_doc = []
    for d, txt in enumerate(texts):
        cs = chunks_of(txt)
        per_doc.append(cs)
        for c in cs:
            alls.setdefault(c, set()).add(d)
    want = {
        d: (len(cs), sum(1 for c in cs if len(alls[c]) >= 2))
        for d, cs in enumerate(per_doc)
    }
    for parts in (1, 3):
        got = sliding_chunk_stats(
            ray.data.from_arrow(t).repartition(parts), W, S,
            num_partitions=2,
        ).to_pandas()
        gm = {int(r["doc_id"]): (int(r["n_chunks"]), int(r["n_shared"]))
              for _, r in got.iterrows()}
        assert gm == want, parts
    # the two docs sharing the section really do share chunks
    assert want[0][1] > 0 and want[1][1] > 0 and want[2][1] == 0


def test_length_bucket_batches_matches_twin(ray_session):
    """length_bucket_batches == pandas row_number twin for any block
    layout; per-bucket capacity derives from the bucket's padded top
    edge; zero-length rows land in bucket 0."""
    import ray.data

    from luzzu_ray.ops.relational import length_bucket_batches

    rng = np.random.default_rng(53)
    n = 300
    ids = np.arange(n, dtype=np.int64) * 2 + 1
    ln = rng.integers(0, 120, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "n_words": pa.array(ln)})
    BS, BB = 8, 256

    def twin():
        rows = sorted(zip(ids, ln), key=lambda r: (r[1] // BS, r[0]))
        out, seen = {}, {}
        for i, l in rows:
            b = l // BS
            r = seen.get(b, 0)
            seen[b] = r + 1
            cap = max(1, BB // ((b + 1) * BS))
            out[i] = (l, b, r // cap)
        return out

    want = twin()
    for nb in (1, 7):
        got = pa.Table.from_pylist(length_bucket_batches(
            ray.data.from_arrow(t).repartition(nb),
            "doc_id", "n_words", BS, BB).take_all())
        gm = {i: (l, b, x) for i, l, b, x in zip(
            got["doc_id"].to_pylist(), got["n_words"].to_pylist(),
            got["bucket"].to_pylist(), got["batch_idx"].to_pylist())}
        assert gm == want, nb


def test_borda_rank_fusion_matches_twin(ray_session):
    """borda_rank_fusion == numpy rank-sum twin (per-signal
    row_number DESC with id tiebreak, top-k by fused sum ASC)."""
    import ray.data

    from luzzu_ray.ops.relational import borda_rank_fusion

    rng = np.random.default_rng(59)
    n = 200
    ids = np.arange(n, dtype=np.int64)
    a = rng.integers(0, 50, n).astype(np.int64)   # heavy ties
    b = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "s1": pa.array(a),
                  "s2": pa.array(b)})

    def ranks(v):
        order = np.lexsort((ids, -v))
        r = np.empty(n, dtype=np.int64)
        r[order] = np.arange(1, n + 1)
        return r

    r1, r2 = ranks(a), ranks(b)
    borda = r1 + r2
    pick = np.lexsort((ids, borda))[:15]
    for nb in (1, 6):
        got = borda_rank_fusion(
            ray.data.from_arrow(t).repartition(nb),
            "doc_id", ["s1", "s2"], 15)
        assert got["doc_id"].to_pylist() == ids[pick].tolist(), nb
        assert got["borda"].to_pylist() == borda[pick].tolist(), nb
        assert got["rnk_s1"].to_pylist() == r1[pick].tolist(), nb


def test_temperature_mixture_matches_rebalance_with_sqrt_shares(
        ray_session):
    """temperature_mixture == rebalance_mixture fed the sqrt-share
    dict computed the same way (sorted-order sum), for any layout;
    small sources gain share vs their raw proportion."""
    import ray.data

    from luzzu_ray.ops.relational import (
        rebalance_mixture, temperature_mixture)

    n_by = {"big": 600, "mid": 150, "small": 24}
    srcs = [s for s, c in n_by.items() for _ in range(c)]
    ids = np.arange(len(srcs), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "source": pa.array(srcs, pa.string())})
    A, B = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    roots = {s: float(np.sqrt(float(c))) for s, c in n_by.items()}
    denom = 0.0
    for s in sorted(roots):
        denom += roots[s]
    shares = {s: roots[s] / denom for s in roots}

    def key_set(ds_out):
        return {r["doc_id"] for r in ds_out.take_all()}

    want = key_set(rebalance_mixture(
        ray.data.from_arrow(t), "source", "doc_id", shares, 0.5, A, B))
    for nb in (1, 5):
        got = key_set(temperature_mixture(
            ray.data.from_arrow(t).repartition(nb),
            "source", "doc_id", 0.5, A, B))
        assert got == want, nb
    # flattening property: 'small' keeps a larger fraction than 'big'
    kept = pa.Table.from_pylist(temperature_mixture(
        ray.data.from_arrow(t), "source", "doc_id", 0.5, A, B).take_all())
    frac = {
        s: sum(1 for v in kept["source"].to_pylist() if v == s) / c
        for s, c in n_by.items()
    }
    assert frac["small"] > frac["big"]


def test_fim_examples_matches_substr_twin(ray_session):
    """fim_examples == the scalar substr twin: segments non-empty,
    concatenation restores the text, short/NULL docs emit nothing,
    layout-invariant."""
    import ray.data

    from luzzu_ray.ops.vocab import FIM_A1, FIM_A2, fim_examples

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "short",                      # < 8 chars: dropped
        None,                         # dropped
        "exactly8",                   # boundary: kept
        "a" * 100,
        "",                           # dropped
        "zw" * 13,
    ]
    ids = [3, 10, 20, 31, 47, 55, 68]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})

    def twin():
        out = {}
        for i, tx in zip(ids, texts):
            if tx is None or len(tx) < 8:
                continue
            n = len(tx)
            c1 = 1 + (i * FIM_A1) % (n - 2)
            c2 = c1 + 1 + (i * FIM_A2) % (n - c1 - 1)
            out[i] = (tx[:c1], tx[c1:c2], tx[c2:])
        return out

    want = twin()
    for nb in (1, 4):
        got = pa.Table.from_pylist(fim_examples(
            ray.data.from_arrow(t).repartition(nb)).take_all())
        gm = {i: (p, m, s) for i, p, m, s in zip(
            got["doc_id"].to_pylist(), got["prefix"].to_pylist(),
            got["middle"].to_pylist(), got["suffix"].to_pylist())}
        assert gm == want, nb
        for i, (p, m, s) in gm.items():
            assert p and m and s
            orig = texts[ids.index(i)]
            assert p + m + s == orig


def test_winnowing_fingerprints_matches_twin(ray_session):
    """winnowing_fingerprints == a pure-Python robust-winnowing twin
    (window min, rightmost tie) over the shared token hash, for any
    block layout; the k+w-1 coverage guarantee holds on a planted
    shared substring."""
    import re

    import ray.data

    from luzzu_ray import constants as C
    from luzzu_ray.functions.text import token_hash_py
    from luzzu_ray.ops.dedup import (
        WINNOW_FP_MOD, WINNOW_K, WINNOW_W, winnowing_fingerprints)

    def twin(text):
        if text is None:
            return set()
        toks = re.findall(rb"[A-Za-z0-9\x80-\xff]+", text.encode())
        hs = [token_hash_py(t) for t in toks]
        k, w = WINNOW_K, WINNOW_W
        if len(hs) < k:
            return set()
        gs = []
        for i in range(len(hs) - k + 1):
            g = 0
            for j in range(k):
                g = (g + hs[i + j] * int(C.NGRAM_MIX[j])) % (1 << 64)
            gs.append(g)
        out = set()
        for e in range(w - 1, len(gs)):
            window = gs[e - w + 1: e + 1]
            mn = min(window)
            rpos = e - w + 1 + max(
                i for i, v in enumerate(window) if v == mn)
            out.add((rpos, gs[rpos] % WINNOW_FP_MOD))
        return out

    texts = [
        "the cat sat on the mat and the cat sat on the mat again ok",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "x " * 30,          # all-equal hashes: rightmost-tie stress
        "short one",        # < k grams after window: empty
        None,
        "shared marker one two three four five six tail A",
        "prefix shared marker one two three four five six B end",
    ]
    ids = list(range(0, len(texts) * 3, 3))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    want = {}
    for i, tx in zip(ids, texts):
        for pos, fp in twin(tx):
            want[(i, pos)] = fp
    for nb in (1, 4):
        got = pa.Table.from_pylist(winnowing_fingerprints(
            ray.data.from_arrow(t).repartition(nb)).take_all())
        gm = {(d, p): f for d, p, f in zip(
            got["doc_id"].to_pylist(), got["pos"].to_pylist(),
            got["fp"].to_pylist())}
        assert gm == want, nb
    # coverage guarantee: the two docs sharing >= k+w-1 tokens share
    # at least one fingerprint VALUE
    f5 = {v for (d, p), v in want.items() if d == ids[5]}
    f6 = {v for (d, p), v in want.items() if d == ids[6]}
    assert f5 & f6


def test_canned_phrase_stats_matches_twin(ray_session):
    """canned_phrase_stats == per-row Python twin (literal substring,
    role filter, any-phrase OR); NULL text never matches; layout-
    invariant."""
    import ray.data

    from luzzu_ray.ops.transcripts import canned_phrase_stats

    rows = [
        ("c1", "assistant", "I cannot help with that request"),
        ("c1", "user", "I cannot believe it"),          # wrong role
        ("c1", "assistant", "sure, here is the answer"),
        ("c2", "assistant", None),                       # null text
        ("c2", "assistant", "As an AI I apologize"),
        ("c3", "user", "hello"),                         # zero role turns
    ]
    phrases = ["I cannot", "As an AI"]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "role": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })
    want = {}
    for c, r, tx in rows:
        a, h = want.get(c, (0, 0))
        if r == "assistant":
            a += 1
            if tx is not None and any(p in tx for p in phrases):
                h += 1
        want[c] = (a, h)
    for nb in (1, 3):
        got = pa.Table.from_pylist(canned_phrase_stats(
            ray.data.from_arrow(t).repartition(nb), phrases).take_all())
        gm = {c: (a, h) for c, a, h in zip(
            got["conv_id"].to_pylist(), got["n_role_turns"].to_pylist(),
            got["n_canned"].to_pylist())}
        assert gm == want, nb


def test_curriculum_interleave_matches_twin(ray_session):
    """curriculum_interleave == numpy NTILE twin: rank/tile/key match
    for uneven tile sizes and heavy score ties; keys are unique and
    round-robin across tiles."""
    import ray.data

    from luzzu_ray.ops.relational import curriculum_interleave

    rng = np.random.default_rng(61)
    n, k = 137, 5  # 137 % 5 != 0: uneven NTILE sizes
    ids = np.arange(n, dtype=np.int64) * 7
    sc = rng.integers(0, 30, n).astype(np.int64)  # heavy ties
    t = pa.table({"doc_id": pa.array(ids), "s": pa.array(sc)})
    order = np.lexsort((ids, -sc))
    rnk = np.empty(n, dtype=np.int64)
    rnk[order] = np.arange(1, n + 1)
    # SQL NTILE: first (n % k) tiles get ceil(n/k) rows
    big, small = -(-n // k), n // k
    nbig = n % k
    tile = np.empty(n, dtype=np.int64)
    for i in range(n):
        r0 = rnk[i] - 1
        tile[i] = (r0 // big + 1 if r0 < nbig * big
                   else nbig + (r0 - nbig * big) // small + 1)
    mins = {int(x): int(rnk[tile == x].min()) for x in np.unique(tile)}
    rit = rnk - np.array([mins[int(x)] for x in tile])
    key = rit * k + tile
    assert len(np.unique(key)) == n
    for nb in (1, 6):
        got = pa.Table.from_pylist(curriculum_interleave(
            ray.data.from_arrow(t).repartition(nb),
            "s", "doc_id", k).take_all())
        gm = {i: (tl, r, ck) for i, tl, r, ck in zip(
            got["doc_id"].to_pylist(), got["tile"].to_pylist(),
            got["rank_in_tile"].to_pylist(),
            got["curriculum_key"].to_pylist())}
        want = {int(i): (int(tl), int(r), int(ck))
                for i, tl, r, ck in zip(ids, tile, rit, key)}
        assert gm == want, nb


def test_jl_project_matches_integer_twin(ray_session):
    """jl_project_q == numpy integer twin (quantize inputs and matrix,
    int64 dot), layout-invariant."""
    import ray.data

    from luzzu_ray.ops.similarity import JL_SEED, jl_project_q, lsh_planes

    rng = np.random.default_rng(67)
    n, d, od = 120, 16, 4
    E = rng.normal(scale=0.3, size=(n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64) * 5
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(E.reshape(-1)), d).cast(pa.list_(pa.float32())),
    })
    P = lsh_planes(d, od, JL_SEED) / np.sqrt(float(od))
    Pq = np.floor(P * 1e6).astype(np.int64)
    qx = np.floor(E.astype(np.float64) * 1000.0).astype(np.int64)
    want = qx @ Pq.T
    for nb in (1, 5):
        got = pa.Table.from_pylist(jl_project_q(
            ray.data.from_arrow(t).repartition(nb), od, dim=d).take_all())
        gm = {(v, c): p for v, c, p in zip(
            got["vec_id"].to_pylist(), got["comp"].to_pylist(),
            got["proj_q"].to_pylist())}
        for i, vid in enumerate(ids):
            for c in range(od):
                assert gm[(vid, c)] == int(want[i, c]), (vid, c)


def test_contrastive_crops_matches_twin(ray_session):
    """contrastive_crops == substr twin; views overlap >= n/2 bytes;
    short/NULL docs emit nothing."""
    import ray.data

    from luzzu_ray.ops.vocab import CROP_A1, CROP_A2, contrastive_crops

    texts = ["the quick brown fox jumps over the lazy dog",
             "tiny", None, "abcdefghijklmnopqrstuvwxyz0123456789"]
    ids = [2, 9, 14, 21]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    want = {}
    for i, tx in zip(ids, texts):
        if tx is None or len(tx) < 8:
            continue
        n = len(tx)
        L = max(1, (3 * n) // 4)
        s1 = (i * CROP_A1) % (n - L + 1)
        s2 = (i * CROP_A2) % (n - L + 1)
        want[i] = (tx[s1:s1 + L], tx[s2:s2 + L])
    for nb in (1, 3):
        got = pa.Table.from_pylist(contrastive_crops(
            ray.data.from_arrow(t).repartition(nb)).take_all())
        gm = {i: (a, b) for i, a, b in zip(
            got["doc_id"].to_pylist(), got["view1"].to_pylist(),
            got["view2"].to_pylist())}
        assert gm == want, nb
    for i, (v1, v2) in want.items():
        n = len(texts[ids.index(i)])
        assert len(v1) + len(v2) - n >= n // 2  # overlap bound


def test_ordered_prefix_pack_offsets(ray_session):
    """emit_offset=True: offset_in_pack == exclusive cumsum -
    pack_id * budget, in [0, budget), for any layout."""
    import ray.data

    from luzzu_ray.ops.relational import ordered_prefix_pack

    rng = np.random.default_rng(71)
    n, budget = 150, 64
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 30, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "n_words": pa.array(w)})
    excl = np.cumsum(w) - w
    for nb in (1, 6):
        got = pa.Table.from_pylist(ordered_prefix_pack(
            ray.data.from_arrow(t).repartition(nb),
            "doc_id", "n_words", budget, num_buckets=8,
            emit_offset=True).take_all())
        gm = {i: (p, o) for i, p, o in zip(
            got["doc_id"].to_pylist(), got["pack_id"].to_pylist(),
            got["offset_in_pack"].to_pylist())}
        for i in range(n):
            p, o = gm[i]
            assert p == excl[i] // budget
            assert o == excl[i] - p * budget
            assert 0 <= o < budget


def test_ntriples_roundtrip_and_malformed(ray_session, tmp_path):
    """N-Triples file round-trip (write_ntriples -> read_ntriples) is
    lossless for the supported grammar; malformed lines surface with
    the flag instead of crashing; subject stats match a dict twin."""
    import ray.data

    from luzzu_ray.ops.rdf import (
        parse_ntriples_batch, rdf_subject_stats, read_ntriples,
        write_ntriples)

    triples = [
        ("http://ex.com/a", "http://ex.com/p/x", "hello world", True),
        ("http://ex.com/a", "http://ex.com/p/x", "dup pred", True),
        ("http://ex.com/a", "http://ex.com/p/y", "http://ex.com/b", False),
        ("http://ex.com/b", "http://ex.com/p/x", "", True),
    ]
    t = pa.table({
        "subj": pa.array([x[0] for x in triples]),
        "pred": pa.array([x[1] for x in triples]),
        "obj": pa.array([x[2] for x in triples]),
        "is_literal": pa.array([x[3] for x in triples]),
    })
    out = str(tmp_path / "nt")
    write_ntriples(ray.data.from_arrow(t).repartition(2), out)
    back = pa.Table.from_pylist(read_ntriples(out).take_all())
    assert not any(back["malformed"].to_pylist())
    got = sorted(zip(back["subj"].to_pylist(), back["pred"].to_pylist(),
                     back["obj"].to_pylist(),
                     back["is_literal"].to_pylist()))
    assert got == sorted(triples)

    # malformed lines: flagged, never raised; stats exclude them
    bad = str(tmp_path / "bad.nt")
    with open(bad, "w") as f:
        f.write('<http://ex.com/c> <http://ex.com/p/x> "v" .\n')
        f.write("this is not a triple\n")
        f.write('<http://ex.com/c> <http://ex.com/p/z> <http://ex.com/a> .\n')
    parsed = read_ntriples(bad)
    rows = parsed.take_all()
    assert sum(r["malformed"] for r in rows) == 1
    stats = pa.Table.from_pylist(
        rdf_subject_stats(parsed).take_all()).sort_by("subj")
    m = {r["subj"]: (r["n_triples"], r["n_preds"], r["n_literals"])
         for r in stats.to_pylist()}
    assert m == {"http://ex.com/c": (2, 2, 1)}


def test_punct_normalize_matches_twin():
    """punct_normalize_batch == python replace-chain twin; NULL stays
    NULL; multibyte-noise text folds to ASCII."""
    from luzzu_ray.ops.textstats import PUNCT_MAP, punct_normalize_batch

    texts = ['“quoted” text', "it’s — fine…", None, "plain", "",
             'mix “a”–‘b’ c']
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = punct_normalize_batch(t).to_pydict()
    for i, tx in enumerate(texts):
        if tx is None:
            assert out["text_norm"][i] is None
            assert out["changed"][i] is None
            continue
        cur = tx
        for a, b in PUNCT_MAP:
            cur = cur.replace(a, b)
        assert out["text_norm"][i] == cur, tx
        assert out["changed"][i] == (cur != tx), tx
    assert out["text_norm"][0] == '"quoted" text'
    assert out["text_norm"][1] == "it's - fine..."


def test_event_type_bigrams_matches_twin(ray_session):
    """event_type_bigrams == python lead() twin (per-user ts order,
    event_id tiebreak), layout-invariant; cross-user pairs never
    counted."""
    import ray.data

    from luzzu_ray.ops.events import event_type_bigrams

    rng = np.random.default_rng(73)
    n = 400
    uid = rng.integers(0, 25, n).astype(np.int64)
    ts = rng.integers(0, 10**6, n).astype(np.int64)
    types = np.array(["view", "click", "buy", "quit"])[
        rng.integers(0, 4, n)]
    t = pa.table({
        "user_id": pa.array(uid),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(types.tolist(), pa.string()),
    })
    from collections import Counter
    cnt = Counter()
    for u in np.unique(uid):
        idx = np.flatnonzero(uid == u)
        order = idx[np.lexsort((idx, ts[idx]))]
        for i in range(len(order) - 1):
            cnt[f"{types[order[i]]}>{types[order[i + 1]]}"] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    for nb in (1, 6):
        got = pa.Table.from_pylist(event_type_bigrams(
            ray.data.from_arrow(t).repartition(nb), k=5).take_all())
        assert list(zip(got["pair"].to_pylist(),
                        got["n"].to_pylist())) == want, nb


def test_winnow_candidate_pairs_matches_twin(ray_session):
    """winnow_candidate_pairs == python twin (distinct per-doc fps,
    df-cap suppression, shared-count threshold), layout-invariant;
    planted overlapping docs pair up."""
    import ray.data

    from luzzu_ray.ops.dedup import (
        winnow_candidate_pairs, winnowing_fingerprints)

    base = "shared overlap marker one two three four five six seven"
    texts = [
        base + " tail alpha beta gamma extra words here now",
        "prefix words " + base + " ending differs completely here",
        "totally different content nothing in common at all here",
        base + " yet another continuation of the same shared block",
    ]
    ids = [1, 5, 9, 13]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})

    fps = pa.Table.from_pylist(winnowing_fingerprints(
        ray.data.from_arrow(t)).take_all())
    per_doc = {}
    for d, f in zip(fps["doc_id"].to_pylist(), fps["fp"].to_pylist()):
        per_doc.setdefault(d, set()).add(f)
    from collections import Counter
    df = Counter(f for s in per_doc.values() for f in s)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = {f for f in per_doc.get(a, set())
                      & per_doc.get(b, set()) if df[f] <= 50}
            if len(shared) >= 2:
                want[(a, b)] = len(shared)
    assert want  # the planted overlap genuinely pairs
    for nb in (1, 3):
        got = pa.Table.from_pylist(winnow_candidate_pairs(
            winnowing_fingerprints(
                ray.data.from_arrow(t).repartition(nb))).take_all())
        gm = {(a, b): n for a, b, n in zip(
            got["a"].to_pylist(), got["b"].to_pylist(),
            got["n_shared"].to_pylist())}
        assert gm == want, nb


def test_grouped_mode_matches_twin(ray_session):
    """grouped_mode == Counter twin (count DESC, value ASC ties),
    layout-invariant."""
    import ray.data
    from collections import Counter

    from luzzu_ray.ops.relational import grouped_mode

    rng = np.random.default_rng(79)
    n = 500
    uid = rng.integers(0, 40, n).astype(np.int64)
    vals = np.array(["aa", "bb", "cc", "dd"])[rng.integers(0, 4, n)]
    t = pa.table({"user_id": pa.array(uid),
                  "event_type": pa.array(vals.tolist(), pa.string())})
    want = {}
    for u in np.unique(uid):
        c = Counter(vals[uid == u].tolist())
        v, cnt = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[int(u)] = (v, cnt)
    for nb in (1, 6):
        got = pa.Table.from_pylist(grouped_mode(
            ray.data.from_arrow(t).repartition(nb),
            "user_id", "event_type").take_all())
        gm = {u: (v, c) for u, v, c in zip(
            got["user_id"].to_pylist(), got["mode_value"].to_pylist(),
            got["n_mode"].to_pylist())}
        assert gm == want, nb


def test_source_centroid_dots_matches_twin(ray_session):
    """source_centroid_dots == numpy integer twin (quantized sums,
    exact pair dots/norms/counts), layout-invariant."""
    import ray.data

    from luzzu_ray.ops.similarity import source_centroid_dots

    rng = np.random.default_rng(83)
    n, d = 120, 6
    E = rng.normal(scale=0.4, size=(n, d)).astype(np.float32)
    grp = np.array(["s1", "s2", "s3"])[rng.integers(0, 3, n)]
    t = pa.table({
        "grp": pa.array(grp.tolist(), pa.string()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(E.reshape(-1)), d).cast(pa.list_(pa.float32())),
    })
    q = np.floor(E.astype(np.float64) * 1000.0).astype(np.int64)
    names = sorted(set(grp.tolist()))
    sums = {g: q[grp == g].sum(axis=0) for g in names}
    cnts = {g: int((grp == g).sum()) for g in names}
    want = {}
    for i, a in enumerate(names):
        for b in names[i:]:
            want[(a, b)] = (int(sums[a] @ sums[b]),
                            int(sums[a] @ sums[a]),
                            int(sums[b] @ sums[b]),
                            cnts[a], cnts[b])
    for nb in (1, 5):
        got = source_centroid_dots(
            ray.data.from_arrow(t).repartition(nb), group_col="grp")
        gm = {}
        for r in got.to_pylist():
            gm[(r["src_a"], r["src_b"])] = (
                r["dot_sums"], r["norm2_a"], r["norm2_b"],
                r["n_a"], r["n_b"])
        assert gm == want, nb


def test_script_mix_matches_python_twin():
    """script_mix_batch == per-codepoint Python twin on mixed-script
    text, including 3/4-byte chars and sliced arrays."""
    from luzzu_ray.ops.textstats import script_mix_batch

    texts = ["ascii", "αβγ café", "дом Здесь", "日本語 mix é",
             None, "", "emoji 🎉 Ω ж"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    def twin(tx):
        out = [0, 0, 0, 0]
        for ch in (tx or ""):
            cp = ord(ch)
            if cp < 0x80:
                continue
            if cp <= 0x24F:
                out[0] += 1
            elif 0x370 <= cp <= 0x3FF:
                out[1] += 1
            elif 0x400 <= cp <= 0x4FF:
                out[2] += 1
            else:
                out[3] += 1
        return out

    for tab in (t, t.slice(2, 4)):
        got = script_mix_batch(tab).to_pydict()
        for i, did in enumerate(got["doc_id"]):
            w = twin(texts[did])
            assert [got["n_latin_ext"][i], got["n_greek"][i],
                    got["n_cyrillic"][i],
                    got["n_other_nonascii"][i]] == w, did


def test_cluster_safe_split_property(ray_session):
    """Every member of a near-dup cluster receives the SAME split; the
    split of un-clustered docs is their own keyed-hash bucket."""
    import ray.data

    from luzzu_ray.ops.dedup import cluster_safe_split

    A, B = 6364136223846793005, 1442695040888963407
    docs = pa.table({"doc_id": pa.array(range(30), pa.int64())})
    labels = pa.table({
        "doc_id": pa.array([3, 7, 11, 20, 21], pa.int64()),
        "cluster": pa.array([3, 3, 3, 20, 20], pa.int64()),
        "is_dup": pa.array([False, True, True, False, True]),
    })
    got = pa.Table.from_pylist(cluster_safe_split(
        ray.data.from_arrow(docs).repartition(3), labels, A, B
    ).take_all())
    m = dict(zip(got["doc_id"].to_pylist(), got["split"].to_pylist()))
    assert len(m) == 30
    assert m[3] == m[7] == m[11]
    assert m[20] == m[21]
    for i in (0, 5, 29):
        bp = ((i * A + B) % (1 << 64)) % 10000
        want = "train" if bp < 8000 else ("val" if bp < 9000 else "test")
        assert m[i] == want, i


def test_corpus_quality_card_matches_twin(ray_session):
    """corpus_quality_card == python twin over a crafted corpus with
    dups, NULLs and multiple langs; layout-invariant."""
    import ray.data

    from luzzu_ray import constants as C
    from luzzu_ray.ops.profile import corpus_quality_card

    texts = ["hello world one two three", "hello world one two three",
             None, "", "short doc here", "x" * 30000,  # over MAX_CHARS
             "another unique doc with words"]
    langs = ["en", "en", "de", None, "fr", "en", "de"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    n_docs = len(texts)
    kept = sum(
        1 for tx in texts
        if C.MIN_CHARS <= len(tx or "") <= C.MAX_CHARS)
    words = sum(len((tx or "").split()) for tx in texts)
    # NULL is its own distinct value (dedup-family key semantics)
    distinct = len({tx for tx in texts if tx is not None}) + (
        1 if any(tx is None for tx in texts) else 0)
    want = {
        "n_docs": n_docs, "n_kept": kept,
        "keep_rate_q6": (10**6 * kept) // n_docs,
        "total_words": words,
        "mean_words_q2": (100 * words) // n_docs,
        "n_distinct_texts": distinct,
        "n_exact_dup_docs": n_docs - distinct,
        "n_langs": len({g for g in langs if g is not None}),
    }
    for nb in (1, 4):
        got = corpus_quality_card(
            ray.data.from_arrow(t).repartition(nb))
        gm = dict(zip(got["metric"].to_pylist(),
                      got["value"].to_pylist()))
        assert gm == want, nb


def test_top_boilerplate_lines_matches_twin(ray_session):
    """top_boilerplate_lines == python df-count twin (W-word line
    derivation, distinct docs per line, count DESC / line ASC ties),
    layout-invariant."""
    import ray.data
    from collections import defaultdict

    from luzzu_ray.ops.lines import top_boilerplate_lines

    boiler = "copyright acme corp all rights reserved footer text"
    texts = [boiler + " alpha one two three four five six seven",
             "unique content here " + boiler,
             boiler + " " + boiler,  # same line twice in one doc
             "totally different words in this one here now ok",
             None, ""]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    W = 8
    df = defaultdict(set)
    for i, tx in zip(ids, texts):
        if not tx:
            continue
        ws = tx.split(" ")
        for s in range(0, len(ws), W):
            df[" ".join(ws[s:s + W])].add(i)
    want = sorted(((ln, len(ds_)) for ln, ds_ in df.items()),
                  key=lambda kv: (-kv[1], kv[0]))[:5]
    for nb in (1, 3):
        got = pa.Table.from_pylist(top_boilerplate_lines(
            ray.data.from_arrow(t).repartition(nb), k=5,
            words_per_line=W).take_all())
        assert list(zip(got["line"].to_pylist(),
                        got["n_docs"].to_pylist())) == want, nb


def test_doc_hapax_rate_matches_twin(ray_session):
    """doc_hapax_rate == Counter twin (corpus-wide occurrence count 1,
    case-folded tokens), layout-invariant; zero-token and NULL docs
    emit n_tokens 0."""
    import re

    import ray.data
    from collections import Counter

    from luzzu_ray.ops.vocab import doc_hapax_rate

    texts = ["the cat sat on the mat", "a unique zebra walked by",
             "The CAT returned quietly", None, "", "zebra again here"]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})

    def toks(tx):
        return re.findall(r"[a-z0-9]+", (tx or "").lower())

    tf = Counter(w for tx in texts for w in toks(tx))
    want = {}
    for i, tx in zip(ids, texts):
        ws = toks(tx)
        want[i] = (len(ws), sum(1 for w in ws if tf[w] == 1))
    for nb in (1, 4):
        got = pa.Table.from_pylist(doc_hapax_rate(
            ray.data.from_arrow(t).repartition(nb)).take_all())
        gm = {i: (n, h) for i, n, h in zip(
            got["doc_id"].to_pylist(), got["n_tokens"].to_pylist(),
            got["n_hapax"].to_pylist())}
        assert gm == want, nb
