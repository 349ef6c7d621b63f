"""Deterministic Poisson bootstrap — error bars for pipeline metrics.

The resampling scheme large-scale systems actually run (Chamandy et al.,
"Estimating Uncertainty for Massive Data Streams", Google 2012): a
bootstrap replica with replacement over n rows is approximated by giving
every row an independent Poisson(1) multiplicity per replica — no global
coordination, so replicas stream with the data.  Here the Poisson draw
is a PURE FUNCTION of (row id, replica): splitmix64(id * B + b)'s top
53 bits against the quantized Poisson(1) CDF — deterministic,
layout-independent, and bit-reproducible by a SQL twin that refolds the
same hash in HUGEINT and compares the same integer thresholds.

The op emits per-(key, replica) exact integer (n, sum) partials; the
replica spread (percentile CI over the B replica means) is a trivial
O(B) consumer-side step — keeping floats out of the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .sketch import splitmix64

# floor(CDF_Poisson(1)(k) * 2^53) for k = 0..3; draws above the last
# threshold cap at multiplicity 4 (P ~ 1.9%, quantization-exact)
POISSON1_CDF_Q53 = (
    3313563428353948,
    6627126856707896,
    8283908570884870,
    8836169142277195,
)
POISSON_MAX_W = 4


def poisson_multiplicity(ids: np.ndarray, b: int, n_replicas: int) -> np.ndarray:
    """Deterministic Poisson(1) multiplicity of each row in replica b."""
    with np.errstate(over="ignore"):
        h = splitmix64(
            ids.astype(np.int64).view(np.uint64)
            * np.uint64(n_replicas) + np.uint64(b)
        )
    u = (h >> np.uint64(11)).astype(np.int64)  # top 53 bits
    return np.searchsorted(
        np.asarray(POISSON1_CDF_Q53, dtype=np.int64), u, side="right"
    ).astype(np.int64)


def poisson_bootstrap_sums(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    id_col: str,
    n_replicas: int = 16,
    q: int = 2,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(key, replica, n, sum_v_q) exact-integer bootstrap partials.

    Per batch: ONE dictionary encode of the key, then n_replicas
    vectorized hash->multiplicity passes accumulated with unbuffered
    ``np.add.at`` int64 scatters — rows are never replicated, so the
    exchange carries (#keys x B) partial rows per block regardless of
    B.  Final combine is one keyed grouped sum.
    """
    from .relational import grouped_sum_q

    scale = float(10 ** q)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "key": pa.array([], pa.string()),
            "replica": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sv": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        keys = t[key_col].combine_chunks()
        code = pc.dictionary_encode(keys)
        if isinstance(code, pa.ChunkedArray):
            code = code.combine_chunks()
        cd = code.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dic = code.dictionary
        k = len(dic)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        vq = pc.cast(pc.floor(pc.multiply(
            pc.cast(t[value_col], pa.float64()), scale)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        n_acc = np.zeros((n_replicas, k), dtype=np.int64)
        s_acc = np.zeros((n_replicas, k), dtype=np.int64)
        for b in range(n_replicas):
            w = poisson_multiplicity(ids, b, n_replicas)
            np.add.at(n_acc[b], cd, w)
            np.add.at(s_acc[b], cd, w * vq)
        rep = np.repeat(np.arange(n_replicas, dtype=np.int64), k)
        key_idx = pa.array(np.tile(np.arange(k, dtype=np.int64), n_replicas))
        return pa.table({
            "key": dic.take(key_idx),
            "replica": pa.array(rep),
            "n": pa.array(n_acc.ravel()),
            "sv": pa.array(s_acc.ravel()),
        })

    parts = ds.select_columns([key_col, value_col, id_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_sum_q(
        parts, ["key", "replica"], float_cols={},
        int_cols={"n": "n", "sv": f"sum_v_q{q}"},
        num_partitions=num_partitions,
    )
