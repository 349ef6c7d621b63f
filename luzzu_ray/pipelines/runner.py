"""Assessment run driver: sharded, lineage-tracked, resumable (S4/S5).

Luzzu's daQ observations carry ``computedOn`` + timestamp provenance and a
crashed run restarts from scratch `[paper]` (/root/reference/README.md:8);
the north rule instead requires "checkpointed resumability keyed on
partition id" (BASELINE.json:north_rule).  Design:

- The input file list is split into ``shards`` deterministic shards
  (stable hash of file basename).  ``part_id`` == shard index.
- Each shard runs the full flagship pipeline and writes
  ``out/turns/part_id=<k>/``.  The shard's lineage row
  (part_id, files, rows_in, rows_kept, stage_versions, wall_ms) is
  written LAST, to ``out/lineage/part-<k>.parquet`` — a shard is
  complete iff its lineage file exists.
- ``--resume`` skips shards whose lineage file exists and deletes any
  partial output dir of unfinished shards before re-running (idempotent
  retries; SURVEY.md §4.2 "resume" row).

PARTITIONING ASSUMPTION (documented per SURVEY.md §2 custom-operator
rule): conversation-level rules are computed within a shard, so all
turns of one conversation must live in the same shard.  At production
scale the corpus is laid out with conversations hash-bucketed into
files (the datagen ``clustered=True`` layout); sharding by file then
preserves conversation locality.  ``shards=1`` removes the assumption.

Summary tables are recomputed at the end of a (re)run from the written
turn table with column-pruned reads — cheap, and always consistent with
the final output.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from luzzu_ray import constants as C
from luzzu_ray.pipelines import summaries as S
from luzzu_ray.pipelines.filter_pipeline import run_flagship
from luzzu_ray.sources import transcript_paths

def _patch_ray_fsspec_probe() -> None:
    """Make Ray's HTTP-filesystem probe thread-safe for this install.

    ``path_util._is_http_filesystem`` catches only ModuleNotFoundError
    around ``from fsspec.implementations.http import HTTPFileSystem``;
    with aiohttp absent, two driver threads resolving paths concurrently
    can race the failed import and the loser sees a bare ImportError
    ("cannot import name HTTPFileSystem"), crashing a parallel shard.
    Any ImportError here means "not an HTTP filesystem"."""
    from ray.data.datasource import path_util

    orig = path_util._is_http_filesystem
    if getattr(orig, "_luzzu_safe", False):  # pragma: no cover - idempotent
        return

    def safe(fs):
        try:
            return orig(fs)
        except ImportError:
            return False

    safe._luzzu_safe = True
    path_util._is_http_filesystem = safe


_patch_ray_fsspec_probe()


LINEAGE_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("input_files", pa.list_(pa.string())),
        ("rows_in", pa.int64()),
        ("rows_kept", pa.int64()),
        ("stage_versions", pa.string()),  # JSON
        ("config_hash", pa.string()),  # shard layout + pipeline kwargs + versions
        ("wall_ms", pa.int64()),
    ]
)

UNIT_LINEAGE_SCHEMA = pa.schema(
    [("unit", pa.int32())] + list(LINEAGE_SCHEMA)
)


def _stable_repr(v) -> str:
    """Deterministic-across-processes representation for config hashing.

    Plain values and (nested) containers/dataclasses hash by content;
    opaque runtime objects (ObjectRef handles, callables, open models)
    hash by TYPE only — their repr embeds per-process ids that would
    make --resume reject semantically identical configs."""
    import dataclasses

    if isinstance(v, (str, int, float, bool, type(None))):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_stable_repr(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k!r}:{_stable_repr(x)}" for k, x in sorted(v.items())
        ) + "}"
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return repr(v)  # dataclass repr is content-based and stable
    return f"<{type(v).__module__}.{type(v).__qualname__}>"


def run_config_hash(shards: int, pipeline_kwargs: dict) -> str:
    """Stable hash of everything that determines a shard's output.

    Recorded in every lineage row; ``--resume`` refuses to mix lineage
    written under a different shard count, rule pack or pipeline kwargs
    (old-layout shards would otherwise silently count as complete and
    orphan ``part_id=k`` dirs for k >= shards would leak into summaries).
    """
    import hashlib

    payload = json.dumps(
        {
            "shards": shards,
            "pipeline_kwargs": {
                k: _stable_repr(v) for k, v in sorted(pipeline_kwargs.items())
            },
            "stage_versions": C.STAGE_VERSIONS,
            "lineage_layout": 2,  # per-unit sub-dirs under each shard
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def shard_files(paths: list[str], shards: int) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {k: [] for k in range(shards)}
    for p in sorted(paths):
        out[zlib.crc32(os.path.basename(p).encode()) % shards].append(p)
    return out


def completed_parts(out_dir: str) -> set[int]:
    done = set()
    for f in glob.glob(os.path.join(out_dir, "lineage", "part-*.parquet")):
        stem = os.path.basename(f)[len("part-"):-len(".parquet")]
        done.add(int(stem))
    return done


def completed_units(out_dir: str, part_id: int, cfg_hash: str) -> set[int]:
    """Unit indices of shard ``part_id`` whose per-unit lineage file
    exists AND was written under the current config hash (file-level
    resume granularity — VERDICT.md round-2 ask #7).  A unit lineage
    from a different config is ignored, so its unit re-runs."""
    done: set[int] = set()
    for f in glob.glob(
        os.path.join(out_dir, "lineage", "files", f"part-{part_id}-unit-*.parquet")
    ):
        stem = os.path.basename(f)
        u = int(stem[stem.rindex("-unit-") + 6: -len(".parquet")])
        try:
            t = pq.read_table(f, columns=["config_hash"])
            if t.num_rows and t["config_hash"][0].as_py() == cfg_hash:
                done.add(u)
        except Exception:  # corrupt partial write -> re-run the unit
            continue
    return done


def _count_written(turns_dir: str) -> tuple[int, int]:
    """(rows, kept) from the freshly written shard output.

    Row count comes from parquet footers (no data read); kept count is a
    column-pruned streaming aggregate.
    """
    import pyarrow.dataset as pads

    dset = pads.dataset(turns_dir, format="parquet")
    rows = dset.count_rows()
    kept = 0
    for frag_batch in dset.to_batches(columns=["keep"]):
        import pyarrow.compute as pc

        kept += int(pc.sum(frag_batch["keep"]).as_py() or 0)
    return rows, kept


def run_shard(files: list[str], turns_dir: str, **pipeline_kwargs) -> tuple[int, int]:
    ds = run_flagship(files, **pipeline_kwargs)
    ds.write_parquet(turns_dir)
    return _count_written(turns_dir)


def _shard_resources(parallel: int, pipeline_kwargs: dict) -> dict:
    """Per-shard pool/shuffle sizing when `parallel` shard pipelines run
    concurrently: divide the cluster so the concurrent pipelines' actor
    pools + shuffle aggregators can all schedule at once (an undivided
    pool spanning the CPUs deadlocks against the other shards'
    aggregators — the same failure mode as a fixed full-width pool).
    Caller-supplied kwargs win."""
    import ray
    import ray.data

    from luzzu_ray.pipelines.filter_pipeline import cluster_cpus

    out = dict(pipeline_kwargs)
    if parallel <= 1:
        return out
    cpus = cluster_cpus()
    if "actor_pool" not in out:
        hi = max(1, (cpus - max(2, cpus // 4)) // parallel)
        out["actor_pool"] = (max(1, hi // 2), max(2, hi))
    if "num_partitions" not in out:
        out["num_partitions"] = max(8, 4 * cpus // parallel)
    # the aggregator cap is a global DataContext knob snapshotted per
    # dataset; _ensure_hash_shuffle (called by every shard pipeline
    # before dataset creation) would clobber a direct assignment, so
    # divide it via the override it respects
    from luzzu_ray.pipelines import filter_pipeline as FP

    FP.set_aggregator_cap_override(max(1, cpus // (2 * parallel)))
    ctx = ray.data.DataContext.get_current()
    ctx.max_hash_shuffle_aggregators = max(1, cpus // (2 * parallel))
    return out


def run_assessment(
    input_dir: str,
    out_dir: str,
    *,
    shards: int = 8,
    resume: bool = False,
    write_summaries: bool = True,
    parallel_shards: int | None = None,
    files_per_unit: int = 1,
    **pipeline_kwargs,
) -> dict:
    """Entry point 2/3 of SURVEY.md §3.2.  Returns a small run report.

    ``parallel_shards`` > 1 overlaps that many shard pipelines (each a
    full flagship run over its file subset) from driver threads, with
    per-shard resources divided so the cluster never drains between
    shards.  Within a shard, files are processed in units of
    ``files_per_unit`` with a per-unit lineage row written after each
    unit's output, so a crash mid-shard resumes at FILE granularity
    (only unfinished units re-run) — at 10^4 files per shard raise
    ``files_per_unit`` to amortize per-unit pipeline startup against
    retry cost.  The shard lineage row is still written last; its
    presence marks the whole shard complete."""
    paths = transcript_paths(input_dir)
    by_shard = shard_files(paths, shards)
    lineage_dir = os.path.join(out_dir, "lineage")
    os.makedirs(lineage_dir, exist_ok=True)
    cfg_hash = run_config_hash(shards, dict(pipeline_kwargs,
                                            files_per_unit=files_per_unit))
    done = completed_parts(out_dir) if resume else set()
    if resume:
        for k in sorted(done):
            prev = pq.read_table(
                os.path.join(lineage_dir, f"part-{k}.parquet")
            )
            old = (
                prev["config_hash"][0].as_py()
                if "config_hash" in prev.column_names else None
            )
            if old != cfg_hash:
                raise ValueError(
                    f"--resume config mismatch: lineage part-{k} was written "
                    f"with config_hash={old!r}, current run is {cfg_hash!r} "
                    "(different --shards, rule pack or pipeline kwargs). "
                    "Re-run without --resume to restart cleanly."
                )
    if not resume:
        shutil.rmtree(os.path.join(out_dir, "turns"), ignore_errors=True)
        shutil.rmtree(lineage_dir, ignore_errors=True)
        os.makedirs(lineage_dir, exist_ok=True)

    todo = [k for k in range(shards) if k not in done]
    if parallel_shards is None:
        from luzzu_ray.pipelines.filter_pipeline import cluster_cpus

        parallel_shards = min(4, len(todo)) if cluster_cpus() >= 8 else 1
    parallel_shards = max(1, min(parallel_shards, len(todo) or 1))
    shard_kwargs = _shard_resources(parallel_shards, pipeline_kwargs)

    file_lineage_dir = os.path.join(lineage_dir, "files")
    os.makedirs(file_lineage_dir, exist_ok=True)

    def _lineage_row(files: list[str], rows_in: int, rows_kept: int,
                     k: int, wall_ms: int, unit: int | None) -> pa.Table:
        cols = {
            "part_id": pa.array([k], pa.int32()),
            "input_files": pa.array([files], pa.list_(pa.string())),
            "rows_in": pa.array([rows_in], pa.int64()),
            "rows_kept": pa.array([rows_kept], pa.int64()),
            "stage_versions": pa.array(
                [json.dumps(C.STAGE_VERSIONS, sort_keys=True)], pa.string()
            ),
            "config_hash": pa.array([cfg_hash], pa.string()),
            "wall_ms": pa.array([wall_ms], pa.int64()),
        }
        if unit is None:
            return pa.table(cols, schema=LINEAGE_SCHEMA)
        cols = {"unit": pa.array([unit], pa.int32()), **cols}
        return pa.table(cols, schema=UNIT_LINEAGE_SCHEMA)

    def run_one(k: int) -> int:
        files = by_shard[k]
        shard_dir = os.path.join(out_dir, "turns", f"part_id={k}")
        units = [files[i: i + files_per_unit]
                 for i in range(0, len(files), files_per_unit)]
        units_done = completed_units(out_dir, k, cfg_hash) if resume else set()
        t0 = time.monotonic()
        tot_in = tot_kept = 0
        for u, ufiles in enumerate(units):
            unit_dir = os.path.join(shard_dir, f"unit={u}")
            unit_lineage = os.path.join(
                file_lineage_dir, f"part-{k}-unit-{u}.parquet"
            )
            if u in units_done:
                # completed unit: reuse its output and lineage counts
                prev = pq.read_table(unit_lineage)
                tot_in += prev["rows_in"][0].as_py()
                tot_kept += prev["rows_kept"][0].as_py()
                continue
            u0 = time.monotonic()
            shutil.rmtree(unit_dir, ignore_errors=True)  # idempotent retry
            rows_in, rows_kept = run_shard(ufiles, unit_dir, **shard_kwargs)
            # unit lineage written LAST: presence == unit complete
            pq.write_table(
                _lineage_row(ufiles, rows_in, rows_kept, k,
                             int((time.monotonic() - u0) * 1000), u),
                unit_lineage,
            )
            tot_in += rows_in
            tot_kept += rows_kept
        # drop any stale unit output/lineage beyond the current unit list
        # (a prior run under another layout would otherwise leak rows)
        for d in glob.glob(os.path.join(shard_dir, "unit=*")):
            if int(os.path.basename(d)[5:]) >= len(units):
                shutil.rmtree(d, ignore_errors=True)
        wall_ms = int((time.monotonic() - t0) * 1000)
        # shard lineage written LAST: presence == whole shard complete
        pq.write_table(
            _lineage_row(files, tot_in, tot_kept, k, wall_ms, None),
            os.path.join(lineage_dir, f"part-{k}.parquet"),
        )
        return k

    if parallel_shards <= 1:
        ran = [run_one(k) for k in todo]
    else:
        from concurrent.futures import ThreadPoolExecutor

        from luzzu_ray.pipelines import filter_pipeline as FP

        try:
            with ThreadPoolExecutor(max_workers=parallel_shards) as ex:
                ran = sorted(ex.map(run_one, todo))
        finally:
            FP.set_aggregator_cap_override(None)
            # restore the live DataContext too — the divided cap would
            # otherwise throttle the (full-cluster) summaries phase and
            # any later datasets in this process
            FP._ensure_hash_shuffle()

    if write_summaries:
        labeled = ray.data.read_parquet(
            os.path.join(out_dir, "turns"),
            columns=["conv_id", "lang", "ppl", "keep", "drop_reason"]
            + [f"scrub_{c}" for c in C.SCRUB_CLASSES],
        )
        S.write_all(labeled, os.path.join(out_dir, "metrics"))

    return {"shards_run": ran, "shards_skipped": sorted(done)}


def main() -> None:  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser(
        description="Run the transcript quality-filter assessment"
    )
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--parallel-shards", type=int, default=None,
                    help="concurrent shard pipelines (default: auto)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-summaries", action="store_true")
    ap.add_argument("--rules", help="JSON rule-pack path (declarative verdict)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    extra = {}
    if args.rules:
        from luzzu_ray.rules import load_rule_pack

        extra["rule_pack"] = load_rule_pack(args.rules)
    report = run_assessment(
        args.input,
        args.output,
        shards=args.shards,
        parallel_shards=args.parallel_shards,
        resume=args.resume,
        write_summaries=not args.no_summaries,
        **extra,
    )
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":  # pragma: no cover
    main()
