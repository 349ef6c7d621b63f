"""Bucketed (hash-co-partitioned) Parquet layout + shuffle-free joins.

The 100-TB join story this repo's in-memory hash joins cannot tell on
their own: when two fact tables are PRE-BUCKETED on the same key with
the same hash and bucket count, joining them needs ZERO exchange — one
task per bucket streams exactly two bucket directories, joins locally,
and (because a key's rows are fully co-located) any per-key aggregation
of the join result is FINAL inside the task.  Buckets double as the
resume unit: a failed run re-does single ``bucket=N`` directories.

Layout contract (persisted in a ``_buckets.json`` manifest next to the
data, validated at join time):

- ``bucket = splitmix64(uint64(key)) % n_buckets`` (full-avalanche mix
  from :mod:`luzzu_ray.ops.sketch`, so sequential int keys spread);
- hive layout ``out_dir/bucket=N/*.parquet`` via
  ``Dataset.write_parquet(partition_cols=["bucket"])``;
- joining requires manifests to agree on (hash, n_buckets, seed) —
  a mismatch raises instead of silently producing a wrong join.

PARTITIONING ASSUMPTION: int64 join keys.  String keys would need a
byte-wise hash twin; every join key in the reference surface (order,
part, user, doc ids) is an integer.  Paths must be visible to every
worker (shared filesystem / object storage on a real cluster — the
same contract as any Parquet source/sink path).
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from .sketch import splitmix64

MANIFEST_NAME = "_buckets.json"


def _bucket_of(keys: np.ndarray, n_buckets: int, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = splitmix64(
            keys.astype(np.int64).view(np.uint64)
            + np.uint64(seed % (1 << 64))
        )
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucket_write(
    ds: ray.data.Dataset,
    key: str,
    n_buckets: int,
    out_dir: str,
    seed: int = 0,
) -> str:
    """Write ``ds`` hash-bucketed by ``key`` into ``out_dir`` (hive
    ``bucket=N`` directories) and persist the layout manifest.  Streams:
    the tagging map is stateless and the sink is Ray's parallel
    partitioned writer."""

    def tag(t: pa.Table) -> pa.Table:
        v = pc.cast(t[key], pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(_bucket_of(v, n_buckets, seed))
        )

    ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(
            {"key": key, "n_buckets": int(n_buckets),
             "hash": "splitmix64", "seed": int(seed)},
            f,
        )
    return out_dir


def read_manifest(bucket_dir: str) -> dict:
    with open(os.path.join(bucket_dir, MANIFEST_NAME)) as f:
        return json.load(f)


def _bucket_table(bucket_dir: str, b: int) -> pa.Table | None:
    """One bucket's rows, or None when the bucket directory is absent
    (hash ranges with no keys produce no directory)."""
    path = os.path.join(bucket_dir, f"bucket={b}")
    if not os.path.isdir(path):
        return None
    return pq.ParquetDataset(path).read()


def _dir_schema(bucket_dir: str) -> pa.Schema:
    for sub in sorted(os.listdir(bucket_dir)):
        path = os.path.join(bucket_dir, sub)
        if sub.startswith("bucket=") and os.path.isdir(path):
            return pq.ParquetDataset(path).schema
    raise FileNotFoundError(f"no bucket=N directories under {bucket_dir}")


def bucketed_join(
    left_dir: str,
    right_dir: str,
    left_key: str,
    right_key: str,
    per_bucket: Callable[[pa.Table], pa.Table] | None = None,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Shuffle-free join of two bucket layouts written by
    :func:`bucket_write` with IDENTICAL (hash, n_buckets, seed).

    One Ray task per bucket: read the two ``bucket=N`` directories,
    ``pyarrow.Table.join`` locally, then apply ``per_bucket`` (e.g. a
    per-key aggregation — final within the task because a key's rows
    never span buckets).  The result Dataset is the union of per-bucket
    outputs; no all-to-all exchange anywhere.
    """
    ml, mr = read_manifest(left_dir), read_manifest(right_dir)
    for field in ("n_buckets", "hash", "seed"):
        if ml[field] != mr[field]:
            raise ValueError(
                f"bucket layouts disagree on {field}: "
                f"{ml[field]!r} vs {mr[field]!r} — co-partitioned join "
                "requires identical hashing; rewrite one side"
            )
    if ml["key"] != left_key or mr["key"] != right_key:
        raise ValueError(
            "join keys do not match the keys the layouts were "
            f"bucketed on ({ml['key']!r} / {mr['key']!r})"
        )
    n_buckets = int(ml["n_buckets"])
    schema_l = _dir_schema(left_dir)
    schema_r = _dir_schema(right_dir)

    def join_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for b in batch["id"].to_pylist():
            lt = _bucket_table(left_dir, int(b))
            rt = _bucket_table(right_dir, int(b))
            if lt is None:
                lt = schema_l.empty_table()
            if rt is None:
                rt = schema_r.empty_table()
            j = lt.join(
                rt, keys=[left_key], right_keys=[right_key],
                join_type=join_type,
            )
            outs.append(per_bucket(j) if per_bucket is not None else j)
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.range(
        n_buckets, override_num_blocks=n_buckets
    ).map_batches(join_bucket, batch_format="pyarrow", batch_size=None)
