"""Z-order (Morton-curve) clustering layout + zone-map pruning.

Multi-column data skipping for the 100-TB posture: a table range-
partitioned on ONE column prunes reads on that column only; sorting by
the MORTON INTERLEAVING of two columns' bits keeps rows that are close
in BOTH dimensions physically adjacent, so every written file covers a
tight (min, max) box in each dimension simultaneously (Morton, "A
computer oriented geodetic data base", 1966; the same layout Delta
Lake / Iceberg expose as ``OPTIMIZE ZORDER BY``).  A 2-D range query
then skips every file whose zone box misses the query box — pruning on
BOTH predicates from one layout.

Pieces:

- :func:`morton2` — vectorized bit interleave (uint64 in, uint64 out),
  one shift-or pass per bit, no Python loop over rows;
- :func:`zorder_layout` — compute z, RANGE-partition on it (Dataset
  ``sort`` — the one wide exchange, same cost class as any clustering
  rewrite), write hive files + a ``_zones.json`` manifest of per-file
  (min, max) boxes;
- :func:`zorder_prune_read` — read back only the files whose box
  intersects the query box (zone-map skip; the manifest is tiny and
  driver-resident).

The layout contract mirrors :mod:`luzzu_ray.ops.bucketed`: paths must
be visible to every worker (shared FS / object storage), and the
manifest is written LAST so a complete manifest implies complete data
(resume unit = the whole layout).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

ZONES_NAME = "_zones.json"


def morton2(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleave the low ``bits`` of x (even positions) and y (odd).

    Vectorized over the arrays: ``bits`` shift-mask-or steps total,
    independent of row count.  Values must already fit ``bits`` bits
    (callers quantize first); higher bits are masked off.
    """
    if bits < 1 or bits > 32:
        raise ValueError("morton2: bits must be in [1, 32]")
    xv = x.astype(np.uint64) & np.uint64((1 << bits) - 1)
    yv = y.astype(np.uint64) & np.uint64((1 << bits) - 1)
    z = np.zeros(len(xv), dtype=np.uint64)
    for i in range(bits):
        z |= ((xv >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        z |= ((yv >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
    return z


def morton2_py(x: int, y: int, bits: int = 16) -> int:
    """Scalar twin of :func:`morton2` for tests/oracles."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _footer_box(path: str, x_col: str, y_col: str):
    """(n_rows, x_min, x_max, y_min, y_max) from Parquet FOOTER
    statistics — zone maps must come from metadata, not a data read
    (at 100 TB the layout step may not re-scan what it just wrote).
    Returns None when any row group lacks stats for either column."""
    md = pq.ParquetFile(path).metadata
    if md.num_rows == 0:
        return (0, None, None, None, None)
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    try:
        xi, yi = names.index(x_col), names.index(y_col)
    except ValueError:
        return None
    xs, ys = [], []
    for rg in range(md.num_row_groups):
        for idx, acc in ((xi, xs), (yi, ys)):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            acc.append((st.min, st.max))
    return (
        md.num_rows,
        min(lo for lo, _ in xs), max(hi for _, hi in xs),
        min(lo for lo, _ in ys), max(hi for _, hi in ys),
    )


def zorder_layout(
    ds: ray.data.Dataset,
    out_dir: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
) -> dict:
    """Sort ``ds`` by ``morton2(x_col, y_col)`` and write a zoned layout.

    ``x_col``/``y_col`` must be int64 columns already quantized to
    ``bits`` bits.  One range exchange (the sort) — the unavoidable
    cost of any clustering rewrite; everything else streams.  Returns
    the manifest (also persisted as ``_zones.json``).
    """
    def add_z(t: pa.Table) -> pa.Table:
        z = morton2(
            t[x_col].combine_chunks().to_numpy(zero_copy_only=False),
            t[y_col].combine_chunks().to_numpy(zero_copy_only=False),
            bits,
        )
        return t.append_column("_z", pa.array(z.astype(np.int64)))

    zsorted = ds.map_batches(
        add_z, batch_format="pyarrow", zero_copy_batch=True
    ).sort("_z")
    os.makedirs(out_dir, exist_ok=True)
    zsorted.write_parquet(out_dir)
    zones = []
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(out_dir, name)
        box = _footer_box(path, x_col, y_col)
        if box is not None:
            n_rows, x_min, x_max, y_min, y_max = box
        else:  # stats absent: fall back to a two-column read
            t = pq.read_table(path, columns=[x_col, y_col])
            if t.num_rows == 0:
                continue
            n_rows = t.num_rows
            x_min, x_max = (s.as_py() for s in pc.min_max(t[x_col]).values())
            y_min, y_max = (s.as_py() for s in pc.min_max(t[y_col]).values())
        if n_rows == 0:
            continue
        zones.append({
            "file": name,
            "n_rows": n_rows,
            "x_min": x_min,
            "x_max": x_max,
            "y_min": y_min,
            "y_max": y_max,
        })
    manifest = {
        "x_col": x_col, "y_col": y_col, "bits": bits, "zones": zones,
    }
    # manifest last: its presence implies the layout is complete
    with open(os.path.join(out_dir, ZONES_NAME), "w") as f:
        json.dump(manifest, f)
    return manifest


def zorder_prune_read(
    out_dir: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
) -> tuple[ray.data.Dataset, int, int]:
    """Read only the files whose zone box intersects the query box.

    Returns ``(dataset, files_read, files_total)``; the dataset still
    needs the exact row filter (zone maps prune FILES, not rows).
    """
    with open(os.path.join(out_dir, ZONES_NAME)) as f:
        manifest = json.load(f)
    zones = manifest["zones"]
    if not zones:
        raise ValueError(f"zorder_prune_read: empty layout at {out_dir}")
    keep = [
        z for z in zones
        if not (z["x_max"] < x_range[0] or z["x_min"] > x_range[1]
                or z["y_max"] < y_range[0] or z["y_min"] > y_range[1])
    ]
    paths = [os.path.join(out_dir, z["file"]) for z in keep]
    if not paths:
        # typed empty dataset with the layout's schema
        first = os.path.join(out_dir, zones[0]["file"])
        empty = pq.read_table(first).schema.empty_table()
        return ray.data.from_arrow(empty), 0, len(zones)
    return ray.data.read_parquet(paths), len(keep), len(zones)
