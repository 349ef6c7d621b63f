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
    res = minhash_dedup(ds, sim_threshold=0.5).to_pylist()
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
        for r in ngram_jaccard_pairs(ds, jaccard_threshold=0.3,
                                     sim_threshold=0.3).to_pylist()
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
