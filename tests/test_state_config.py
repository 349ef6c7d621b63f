"""Shared-state Bloom dedup actor, JSONL source, config-driven pipeline."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest


def test_bloom_index_actor(ray_session):
    import ray

    from luzzu_ray.state import BloomDedupIndex

    idx = BloomDedupIndex.remote(n_bits_log2=20, k=4)
    a = np.array([1, 2, 3, 2, 1], dtype=np.uint64)
    seen1 = ray.get(idx.seen_and_add.remote(a))
    assert seen1.tolist() == [False, False, False, True, True]
    seen2 = ray.get(idx.seen_and_add.remote(np.array([3, 4], dtype=np.uint64)))
    assert seen2.tolist() == [True, False]
    stats = ray.get(idx.stats.remote())
    assert stats["n_inserted"] == 4


def test_streaming_dedup_marker(ray_session):
    import ray
    import ray.data

    from luzzu_ray.state import BloomDedupIndex, StreamingDedupMarker

    idx = BloomDedupIndex.remote(n_bits_log2=20, k=4)
    t = pa.table(
        {"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
         "text": pa.array(["aa bb cc", "dd ee ff", "aa bb cc", "gg hh"])}
    )
    out = ray.data.from_arrow(t).map_batches(
        StreamingDedupMarker,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=1,
        fn_constructor_kwargs={"index_handle": idx},
    ).take_all()
    by_id = {r["doc_id"]: r["seen_before"] for r in out}
    assert by_id[1] is False or by_id[3] is False
    assert by_id[1] != by_id[3] or by_id[1] is False  # exactly one first
    assert by_id[3] or by_id[1]  # the duplicate pair has one seen_before
    assert by_id[2] is False and by_id[4] is False


def test_jsonl_source_roundtrip(ray_session, tmp_path):
    import json

    import ray.data

    from luzzu_ray.sources import read_transcripts_jsonl
    from luzzu_ray.stages.turn_stages import normalize_batch

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello there",
         "tool": None, "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "hi, how can i help", "tool": None,
         "ts": "2026-01-01T00:00:30"},
    ]
    p = tmp_path / "part-0.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = read_transcripts_jsonl(str(tmp_path))
    out = ds.map_batches(normalize_batch, batch_format="pyarrow").take_all()
    assert len(out) == 2
    assert all(not r["malformed"] for r in out)


def test_config_pipeline_matches_default(ray_session, smoke_corpus_dir):
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from luzzu_ray.pipelines.config import build_pipeline
    from luzzu_ray.pipelines.filter_pipeline import turn_level

    files = sorted(glob.glob(os.path.join(smoke_corpus_dir, "*.parquet")))[:1]
    t = pq.read_table(files[0])
    cfg = {
        "pipeline": {
            "stages": ["normalize", "heuristics", "model_scorer", "scrub",
                       "verdict"]
        }
    }
    a = build_pipeline(ray.data.from_arrow(t), cfg).to_pandas()
    b = turn_level(ray.data.from_arrow(t)).to_pandas()
    key = ["conv_id", "turn_idx", "ts", "text"]
    a = a.sort_values(key, na_position="first").reset_index(drop=True)
    b = b.sort_values(key, na_position="first").reset_index(drop=True)
    assert (a["drop_reason"].fillna("") == b["drop_reason"].fillna("")).all()
    assert (a["text_scrubbed"].fillna("") == b["text_scrubbed"].fillna("")).all()


def test_sharded_bloom_matches_single(ray_session):
    """ShardedBloom(K=4) gives the same first-seen semantics as one
    actor on a sequential key stream, and shards actually split load."""
    import numpy as np

    from luzzu_ray.state import BloomDedupIndex, ShardedBloom

    rng = np.random.default_rng(23)
    keys = rng.integers(0, 2**62, size=3000, dtype=np.uint64)
    keys[1000:1500] = keys[:500]          # repeats of earlier keys
    single = BloomDedupIndex.remote(n_bits_log2=22, k=6)
    sharded = ShardedBloom(n_shards=4, n_bits_log2=20, k=6)
    import ray as _ray

    got_single = np.concatenate([
        _ray.get(single.seen_and_add.remote(keys[i:i + 500]))
        for i in range(0, len(keys), 500)
    ])
    got_sharded = np.concatenate([
        sharded.seen_and_add(keys[i:i + 500])
        for i in range(0, len(keys), 500)
    ])
    assert (got_single == got_sharded).all()
    assert got_sharded[1000:1500].all()   # repeats flagged
    stats = sharded.stats()
    per = [p["n_inserted"] for p in stats["shards"]]
    assert sum(per) == stats["n_inserted"]
    assert min(per) > 0  # hash actually spreads keys over all shards


def test_sharded_bloom_throughput(ray_session):
    """One large stream through 4 shards completes promptly (round-trips
    are issued concurrently, not serially per shard)."""
    import time

    import numpy as np

    from luzzu_ray.state import ShardedBloom

    sharded = ShardedBloom(n_shards=4, n_bits_log2=22, k=6)
    rng = np.random.default_rng(29)
    keys = rng.integers(0, 2**62, size=200_000, dtype=np.uint64)
    t0 = time.monotonic()
    seen = sharded.seen_and_add(keys)
    took = time.monotonic() - t0
    assert not seen[np.sort(np.unique(keys, return_index=True)[1])].all()
    assert took < 30, took


def test_sql_source_feeds_pipeline(ray_session, smoke_corpus_dir, tmp_path):
    """S2: a DuckDB 'endpoint' feeds the identical normalize + verdict
    chain and labels match the Parquet-source run row for row."""
    import duckdb
    import pyarrow as pa

    from luzzu_ray.sources import read_transcripts, read_transcripts_sql
    from luzzu_ray.stages.turn_stages import normalize_batch

    db = str(tmp_path / "endpoint.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE transcripts AS SELECT * FROM read_parquet(?)",
        [smoke_corpus_dir + "/*.parquet"],
    )
    n = con.execute("SELECT count(*) FROM transcripts").fetchone()[0]
    con.close()

    ds = read_transcripts_sql(
        "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
        db_path=db,
    )
    norm_sql = ds.map_batches(normalize_batch, batch_format="pyarrow")
    norm_pq = read_transcripts(smoke_corpus_dir).map_batches(
        normalize_batch, batch_format="pyarrow"
    )
    key = [("conv_id", "ascending"), ("turn_idx", "ascending"),
           ("ts", "ascending"), ("text", "ascending")]
    a = pa.Table.from_pylist(norm_sql.take_all()).sort_by(key)
    b = pa.Table.from_pylist(norm_pq.take_all()).sort_by(key)
    assert a.num_rows == n == b.num_rows
    for col in ("conv_id", "turn_idx", "role", "text", "malformed"):
        assert a[col].equals(b[col]), col


def test_aggregator_cap_override_survives_ensure(ray_session):
    """The parallel-shard runner's divided aggregator cap must not be
    clobbered when shard pipelines re-declare the shuffle context."""
    import ray.data

    from luzzu_ray.pipelines import filter_pipeline as FP

    ctx = ray.data.DataContext.get_current()
    try:
        FP.set_aggregator_cap_override(3)
        FP._ensure_hash_shuffle()  # what every shard pipeline calls
        assert ctx.max_hash_shuffle_aggregators == 3
    finally:
        FP.set_aggregator_cap_override(None)
    FP._ensure_hash_shuffle()
    assert ctx.max_hash_shuffle_aggregators >= 2


def test_streaming_dedup_totals_order_invariant(ray_session):
    """The oracle contract behind streaming_dedup_counts: each group of
    k rows sharing a content fingerprint yields exactly k-1 marks
    regardless of stream order or batch boundaries."""
    import numpy as np
    import pyarrow as pa

    from luzzu_ray.state import ShardedBloom, StreamingDedupMarker

    texts = (["same text here"] * 5 + ["Another doc!"] * 3
             + [f"unique {i}" for i in range(10)])
    rng = np.random.default_rng(7)
    totals = []
    for trial in range(3):
        order = rng.permutation(len(texts))
        t = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array([texts[i] for i in order], pa.string())}
        )
        marker = StreamingDedupMarker(
            index_handle=ShardedBloom(n_shards=2, n_bits_log2=20, k=6)
        )
        # feed in two batches split at a different point each trial
        cut = 4 + trial * 3
        seen = sum(
            (marker(part)["seen_before"].to_pylist()
             for part in (t.slice(0, cut), t.slice(cut))),
            [],
        )
        totals.append(int(np.sum(seen)))
    # (5-1) + (3-1) + 0 = 6 marks, whatever the order/batching
    assert totals == [6, 6, 6]


def test_bloom_save_load_roundtrip(ray_session, tmp_path):
    """Persisted Bloom state resumes cross-run dedup: keys inserted
    before save are still (probably) seen after reload; corrupt state
    refuses to load."""
    import numpy as np
    import pytest
    import ray

    from luzzu_ray.state import BloomDedupIndex

    b = BloomDedupIndex.remote(n_bits_log2=16, k=4)
    keys = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    first = ray.get(b.seen_and_add.remote(keys))
    assert not first.any()
    path = str(tmp_path / "bloom.parquet")
    ray.get(b.save.remote(path))
    b2 = BloomDedupIndex.remote(state_path=path)
    again = ray.get(b2.seen_and_add.remote(keys))
    assert again.all()  # everything from run 1 still marks duplicate
    fresh = ray.get(b2.seen_and_add.remote(
        np.arange(5000, 5100, dtype=np.uint64) * np.uint64(0x9E3779B1)))
    assert fresh.mean() < 0.2  # new keys mostly unseen (fp-rate bound)
    # corrupt state refuses to load
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pq.read_table(path)
    bad = t.set_column(0, "mask", pa.array([12345], pa.uint64()))
    pq.write_table(bad, path)
    b3 = BloomDedupIndex.remote(state_path=path)
    with pytest.raises(Exception, match="corrupt"):
        ray.get(b3.seen_and_add.remote(keys))


def test_deterministic_streaming_dedup_layout_invariant(ray_session):
    """Marks depend only on (fingerprint, order_col) — identical across
    block layouts, and equal to the first-seen-by-doc_id twin."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.state import deterministic_streaming_dedup

    texts = ["alpha beta", "gamma", "alpha beta", "delta", "gamma",
             "epsilon", "alpha   BETA!"]  # last normalizes to a dup
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    want = {0: False, 1: False, 2: True, 3: False, 4: True,
            5: False, 6: True}
    results = []
    for blocks in (1, 3, 7):
        ds = ray.data.from_arrow(t).random_shuffle(seed=blocks).repartition(
            num_blocks=blocks)
        out = deterministic_streaming_dedup(
            ds, order_col="doc_id", n_bits_log2=20)
        got = {r["doc_id"]: r["seen_before"] for r in
               out.select_columns(["doc_id", "seen_before"]).take_all()}
        results.append(got)
    assert results[0] == want
    assert results[1] == want and results[2] == want
