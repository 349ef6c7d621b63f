"""Summaries (G2-G4), lineage and resume (S4/S5) — vs oracle aggregates."""

from __future__ import annotations

import glob
import os
import shutil
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

CLUSTERED_DIR = "/tmp/luzzu_test_corpora/clustered"


@pytest.fixture(scope="module")
def clustered_corpus_dir() -> str:
    from luzzu_ray.datagen import generate_corpus

    marker = os.path.join(CLUSTERED_DIR, ".complete-v1")
    if not os.path.exists(marker):
        shutil.rmtree(CLUSTERED_DIR, ignore_errors=True)
        generate_corpus(
            CLUSTERED_DIR, n_convs=180, n_giants=1, giant_turns=600,
            n_files=8, clustered=True,
        )
        open(marker, "w").close()
    return CLUSTERED_DIR


@pytest.fixture(scope="module")
def run_out(ray_session, clustered_corpus_dir):
    from luzzu_ray.pipelines.runner import run_assessment

    out = "/tmp/luzzu_test_out/run1"
    shutil.rmtree(out, ignore_errors=True)
    report = run_assessment(
        clustered_corpus_dir, out, shards=4, giant_min_turns=500,
        num_partitions=8,
    )
    return out, report


def _read_turns(out):
    import pyarrow.dataset as pads

    return pads.dataset(os.path.join(out, "turns"), format="parquet").to_table()


def _oracle_for(corpus_dir):
    import pyarrow as pa
    import oracle

    tbl = pa.concat_tables(
        pq.read_table(f) for f in sorted(glob.glob(corpus_dir + "/*.parquet"))
    )
    return oracle.assess_table(tbl)


def test_lineage_complete(run_out):
    out, report = run_out
    assert sorted(report["shards_run"]) == [0, 1, 2, 3]
    files = glob.glob(os.path.join(out, "lineage", "part-*.parquet"))
    assert len(files) == 4
    lin = pq.read_table(files[0])
    assert set(lin.column_names) >= {
        "part_id", "input_files", "rows_in", "rows_kept", "stage_versions",
        "wall_ms",
    }


def test_output_matches_oracle(run_out, clustered_corpus_dir):
    out, _ = run_out
    t = _read_turns(out)
    want = _oracle_for(clustered_corpus_dir)
    got = {
        (r["conv_id"], r["turn_idx"], r["ts"], r["text"]): (
            r["keep"], r["drop_reason"], r["text_scrubbed"]
        )
        for r in t.to_pylist()
    }
    assert len(got) == len(want)  # keys unique in this corpus slice
    mism = 0
    for r in want:
        k = (r["conv_id"], r["turn_idx"], r["ts"].replace(tzinfo=None)
             if hasattr(r["ts"], "replace") else r["ts"], r["text"])
        g = got.get(k) or got.get((r["conv_id"], r["turn_idx"], r["ts"], r["text"]))
        assert g is not None, k
        if g != (r["keep"], r["drop_reason"], r["text_scrubbed"]):
            mism += 1
    assert mism == 0


def test_summaries_match_oracle(run_out, clustered_corpus_dir):
    out, _ = run_out
    want = _oracle_for(clustered_corpus_dir)

    lang_tbl = []
    for f in glob.glob(os.path.join(out, "metrics", "lang_keep", "*.parquet")):
        lang_tbl.extend(pq.read_table(f).to_pylist())
    want_lang = defaultdict(lambda: [0, 0])
    for r in want:
        want_lang[r["lang"]][0] += 1
        want_lang[r["lang"]][1] += int(r["keep"])
    got_lang = {r["lang"]: (r["n_turns"], r["n_kept"]) for r in lang_tbl}
    assert got_lang == {k: (v[0], v[1]) for k, v in want_lang.items()}

    reasons = {}
    for f in glob.glob(os.path.join(out, "metrics", "reasons", "*.parquet")):
        for r in pq.read_table(f).to_pylist():
            reasons[r["drop_reason"]] = r["n"]
    want_reasons = Counter(r["drop_reason"] or "kept" for r in want)
    assert reasons == dict(want_reasons)

    scrub = pq.read_table(
        os.path.join(out, "metrics", "scrub", "totals.parquet")
    ).to_pylist()
    want_scrub = Counter()
    for r in want:
        for c in [k for k in r if k.startswith("scrub_")]:
            want_scrub[c[len("scrub_"):]] += r[c]
    got_scrub = {r["scrub_class"]: r["n_matches"] for r in scrub}
    assert got_scrub == {k: want_scrub.get(k, 0) for k in got_scrub}


def test_resume_skips_done_and_repairs_partial(run_out, clustered_corpus_dir):
    from luzzu_ray.pipelines.runner import run_assessment

    out, _ = run_out
    full = _read_turns(out).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"),
         ("ts", "ascending"), ("text", "ascending")]
    )
    # simulate a crash: shard 2's lineage missing + partial turns output
    os.remove(os.path.join(out, "lineage", "part-2.parquet"))
    part_dir = os.path.join(out, "turns", "part_id=2")
    for f in sorted(glob.glob(os.path.join(part_dir, "*.parquet")))[1:]:
        os.remove(f)
    report = run_assessment(
        clustered_corpus_dir, out, shards=4, resume=True,
        giant_min_turns=500, num_partitions=8,
    )
    assert report["shards_run"] == [2]
    assert report["shards_skipped"] == [0, 1, 3]
    again = _read_turns(out).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"),
         ("ts", "ascending"), ("text", "ascending")]
    )
    assert again.num_rows == full.num_rows
    for col in ("conv_id", "turn_idx", "keep", "drop_reason", "text_scrubbed"):
        assert again[col].equals(full[col]), col


def test_unit_resume_reruns_only_missing_files(ray_session, clustered_corpus_dir):
    """Kill-mid-shard at FILE granularity: with per-unit lineage, a
    resume re-processes ONLY the units whose lineage is missing (the
    untouched units' outputs are not rewritten — checked by mtime) and
    the final table is byte-identical to the uninterrupted run."""
    from luzzu_ray.pipelines.runner import run_assessment

    out = "/tmp/luzzu_test_out/run_units"
    shutil.rmtree(out, ignore_errors=True)
    run_assessment(
        clustered_corpus_dir, out, shards=2, parallel_shards=1,
        giant_min_turns=500, num_partitions=8, write_summaries=False,
    )
    key = [("conv_id", "ascending"), ("turn_idx", "ascending"),
           ("ts", "ascending"), ("text", "ascending")]
    full = _read_turns(out).sort_by(key)
    # shard 0 has 4 of the 8 files = 4 units (files_per_unit=1)
    unit_lineage = sorted(
        glob.glob(os.path.join(out, "lineage", "files", "part-0-unit-*.parquet"))
    )
    assert len(unit_lineage) >= 2
    # simulate a crash mid-shard-0: shard lineage gone, last unit's
    # lineage + output gone, earlier units intact
    os.remove(os.path.join(out, "lineage", "part-0.parquet"))
    victim = unit_lineage[-1]
    vu = victim[victim.rindex("-unit-") + 6: -len(".parquet")]
    os.remove(victim)
    shutil.rmtree(
        os.path.join(out, "turns", "part_id=0", f"unit={vu}"),
        ignore_errors=True,
    )
    survivor_files = glob.glob(
        os.path.join(out, "turns", "part_id=0", "unit=0", "*.parquet")
    )
    mtimes = {f: os.path.getmtime(f) for f in survivor_files}
    report = run_assessment(
        clustered_corpus_dir, out, shards=2, parallel_shards=1, resume=True,
        giant_min_turns=500, num_partitions=8, write_summaries=False,
    )
    assert report["shards_run"] == [0] and report["shards_skipped"] == [1]
    for f, m in mtimes.items():  # untouched units were NOT re-processed
        assert os.path.getmtime(f) == m, f
    again = _read_turns(out).sort_by(key)
    assert again.num_rows == full.num_rows
    for col in ("conv_id", "turn_idx", "keep", "drop_reason", "text_scrubbed"):
        assert again[col].equals(full[col]), col


def test_resume_refuses_config_mismatch(run_out, clustered_corpus_dir):
    from luzzu_ray.pipelines.runner import run_assessment

    out, _ = run_out
    with pytest.raises(ValueError, match="config mismatch"):
        run_assessment(
            clustered_corpus_dir, out, shards=8, resume=True,
            giant_min_turns=500, num_partitions=8,
        )


def test_parallel_shards_match_serial(run_out, clustered_corpus_dir):
    """parallel_shards=2 overlaps shard pipelines (divided pools +
    aggregators) and produces byte-identical output to the serial run."""
    from luzzu_ray.pipelines.runner import run_assessment

    out_serial, _ = run_out
    out = "/tmp/luzzu_test_out/run_parallel"
    shutil.rmtree(out, ignore_errors=True)
    report = run_assessment(
        clustered_corpus_dir, out, shards=4, parallel_shards=2,
        giant_min_turns=500, num_partitions=8,
    )
    assert sorted(report["shards_run"]) == [0, 1, 2, 3]
    key = [("conv_id", "ascending"), ("turn_idx", "ascending"),
           ("ts", "ascending"), ("text", "ascending")]
    a = _read_turns(out_serial).sort_by(key)
    b = _read_turns(out).sort_by(key)
    assert a.num_rows == b.num_rows
    for col in ("conv_id", "turn_idx", "keep", "drop_reason", "text_scrubbed"):
        assert a[col].equals(b[col]), col


def test_weighted_conv_ranking(run_out, clustered_corpus_dir):
    """Facet-weighted ranking: scores match a manual recompute, and
    shifting all weight onto one facet reorders by exactly that facet."""
    import math

    import ray.data

    from luzzu_ray.pipelines.summaries import weighted_conv_ranking

    out, _ = run_out
    labeled = ray.data.read_parquet(os.path.join(out, "turns"))
    rows = weighted_conv_ranking(
        labeled, {"keep_rate": 2.0, "ppl_score": 1.0, "clean_rate": 1.0},
        k=20,
    ).take_all()
    assert len(rows) == 20
    for r in rows:
        want = (2.0 * r["keep_rate"] + r["ppl_score"] + r["clean_rate"]) / 4.0
        assert math.isclose(r["score"], want, rel_tol=1e-12)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)

    only_clean = weighted_conv_ranking(
        labeled, {"clean_rate": 1.0}, k=20
    ).take_all()
    cleans = [r["clean_rate"] for r in only_clean]
    assert cleans == sorted(cleans, reverse=True)
    assert all(math.isclose(r["score"], r["clean_rate"], rel_tol=1e-12)
               for r in only_clean)


def test_conv_ranking_executes(run_out):
    """conv_ranking's sort path (previously untested) executes and is
    ordered desc by keep_rate with conv_id tie-break."""
    import ray.data

    from luzzu_ray.pipelines.summaries import conv_ranking

    out, _ = run_out
    labeled = ray.data.read_parquet(os.path.join(out, "turns"))
    rows = conv_ranking(labeled, k=15).take_all()
    assert len(rows) == 15
    keyed = [(-r["keep_rate"], r["conv_id"]) for r in rows]
    assert keyed == sorted(keyed)


def test_config_hash_stable_for_opaque_kwargs():
    """Opaque runtime objects (handles, callables) hash by type so
    --resume accepts semantically identical configs across processes."""
    from luzzu_ray.pipelines.runner import run_config_hash

    class FakeRef:
        def __repr__(self):  # per-process id, like ray.ObjectRef
            import random

            return f"ObjectRef({random.random()})"

    a = run_config_hash(4, {"model_ref": FakeRef(), "conv_min_turns": 2})
    b = run_config_hash(4, {"model_ref": FakeRef(), "conv_min_turns": 2})
    assert a == b
    assert a != run_config_hash(4, {"model_ref": FakeRef(),
                                    "conv_min_turns": 3})
    assert a != run_config_hash(8, {"model_ref": FakeRef(),
                                    "conv_min_turns": 2})
