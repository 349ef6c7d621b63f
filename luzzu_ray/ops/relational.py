"""Relational patterns used by the conformance queries: broadcast hash
join, partial+final aggregation, deterministic top-k.

Luzzu analogues: vocabulary map-joins (J1, /root/reference/README.md:14),
metric finalization aggregates (G2, README.md:7-8), dataset ranking
(O1, README.md:15).  The join broadcasts the SMALL side once via
``ray.put`` and probes it inside ``map_batches`` — no shuffle of the big
side, the 100TB-safe shape for dimension joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


class BroadcastJoiner:
    """Actor-pool map-join: big-side batches probe a broadcast small table."""

    def __init__(self, small_ref, key: str, small_cols: list[str]):
        small: pa.Table = ray.get(small_ref)
        self.key = key
        self.small = small.select([key] + small_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.join(self.small, keys=[self.key], join_type="inner")


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table,
    key: str,
    small_cols: list[str],
    concurrency=(1, 8),
) -> ray.data.Dataset:
    ref = ray.put(small)
    return big.map_batches(
        BroadcastJoiner,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"small_ref": ref, "key": key, "small_cols": small_cols},
    )


def grouped_sum_q(
    ds: ray.data.Dataset,
    keys: list[str],
    float_cols: dict[str, str],
    int_cols: dict[str, str] | None = None,
    count_as: str | None = None,
    q: int = 4,
) -> ray.data.Dataset:
    """Partial+final grouped sums with fixed-point floats.

    ``float_cols``: {src_col: out_name} — summed as integer multiples of
    10^-q (floor at the ROW level, then integer-summed), so the result is
    exactly reproducible regardless of summation order, and a DuckDB
    oracle matches it bit-for-bit via
    ``SUM(CAST(FLOOR(x * 10^q) AS BIGINT))`` (floor is unambiguous across
    engines; round differs in half-even vs half-away ties).
    """
    int_cols = int_cols or {}
    scale = float(10 ** q)

    def partial(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        agg_src = {}
        for src, out in float_cols.items():
            v = pc.floor(pc.multiply(pc.cast(t[src], pa.float64()), scale))
            agg_src[out] = pc.cast(v, pa.int64())
        for src, out in int_cols.items():
            agg_src[out] = pc.cast(t[src], pa.int64())
        if count_as:
            agg_src[count_as] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        g = pa.table({**cols, **agg_src}).group_by(keys).aggregate(
            [(c, "sum") for c in agg_src]
        )
        return g.rename_columns(keys + list(agg_src))

    from ray.data.aggregate import Sum

    sum_cols = list(float_cols.values()) + list(int_cols.values()) + (
        [count_as] if count_as else []
    )
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(keys).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols]
    )


def topk(
    ds: ray.data.Dataset, order_col: str, k: int, tie_col: str
) -> ray.data.Dataset:
    """Deterministic global top-k: sort desc on order_col, ties by tie_col."""
    return ds.sort([order_col, tie_col], descending=[True, False]).limit(k)
