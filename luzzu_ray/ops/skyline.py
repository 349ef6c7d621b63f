"""Distributed Pareto-frontier (skyline) computation.

The skyline of a table under criteria (maximize / minimize per column)
is the set of rows not DOMINATED by any other row — q dominates p when
q is at-least-as-good on every criterion and strictly better on at
least one (Borzsony, Kossmann, Stocker, "The Skyline Operator",
ICDE 2001).  Duplicate criterion vectors never dominate each other, so
all copies of a frontier point survive.

Distribution uses the classic two-phase identity
``skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B))``:

- phase 1: a stateless vectorized ``map_batches`` pass computes each
  block's LOCAL skyline (O(n log n) lexsort + suffix-max, no Python
  row loop) — on real data this collapses a block to a handful of
  rows, so the phase is a pure streaming pass at 100 TB;
- phase 2: the surviving candidates (tiny) coalesce to one block and
  the same kernel runs once more for the global answer.

SCALE ASSUMPTION: the global frontier (phase-2 input = union of local
frontiers) fits one worker block.  For d=2 criteria over real-valued
data the expected frontier is O(log n); the adversarial worst case
(perfectly anti-correlated criteria) is O(n), where a skyline is the
whole input and no algorithm helps.  If local frontiers ever exceed a
block, insert additional phase-1 rounds (the identity composes) before
the final coalesce.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def skyline_mask_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D skyline MAXIMIZING both int64 arrays.

    lexsort ascending by (x, y); per distinct-x group take the max y
    (lower-y ties in a group are dominated by that group's max);
    a group survives iff its max y strictly exceeds the best max y of
    any LARGER x (suffix max, exclusive) — equality loses because the
    larger x is the one strict coordinate.  Vectorized: one lexsort,
    one ``maximum.reduceat``, one reversed ``maximum.accumulate``.
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    group_start = np.ones(n, dtype=bool)
    group_start[1:] = xs[1:] != xs[:-1]
    starts = np.flatnonzero(group_start)
    # sorted asc by y within each x group => group max is the last row
    ends = np.append(starts[1:], n) - 1
    ymax = ys[ends]
    # best ymax among groups with strictly larger x (exclusive suffix max)
    best_above = np.empty(len(ymax), dtype=np.int64)
    best_above[-1] = np.iinfo(np.int64).min
    if len(ymax) > 1:
        np.maximum.accumulate(ymax[:0:-1], out=best_above[-2::-1])
    group_keep = ymax > best_above
    gid = np.cumsum(group_start) - 1
    keep_sorted = group_keep[gid] & (ys == ymax[gid])
    mask = np.zeros(n, dtype=bool)
    mask[order[keep_sorted]] = True
    return mask


def _criteria_views(
    t: pa.Table, maximize: tuple[str, ...], minimize: tuple[str, ...]
) -> list[np.ndarray]:
    views: list[np.ndarray] = []
    for c in maximize:
        views.append(
            t[c].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    for c in minimize:
        v = (
            t[c].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        views.append(-v)  # minimize == maximize the negation
    return views


def _skyline_block(
    t: pa.Table, maximize: tuple[str, ...], minimize: tuple[str, ...]
) -> pa.Table:
    if t.num_rows == 0:
        return t
    views = _criteria_views(t, maximize, minimize)
    if len(views) != 2:
        raise ValueError("skyline: exactly two criteria supported")
    return t.filter(pa.array(skyline_mask_2d(views[0], views[1])))


def skyline(
    ds: ray.data.Dataset,
    maximize: tuple[str, ...] = (),
    minimize: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Two-phase distributed skyline over int64 criterion columns.

    Exactly two criteria total (any mix of ``maximize`` / ``minimize``);
    all input columns ride through to the output rows.
    """
    mx, mn = tuple(maximize), tuple(minimize)
    local = ds.map_batches(
        lambda t: _skyline_block(t, mx, mn),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # phase 2: candidates are tiny (see module SCALE ASSUMPTION) —
    # coalesce to one block and run the same kernel once globally.
    return local.repartition(1).map_batches(
        lambda t: _skyline_block(t, mx, mn),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def skyline_py(
    rows: list[dict], maximize: tuple[str, ...], minimize: tuple[str, ...]
) -> list[dict]:
    """O(n^2) scalar twin for tests: literal dominance definition."""
    def better(q: dict, p: dict) -> bool:
        ge = all(q[c] >= p[c] for c in maximize) and all(
            q[c] <= p[c] for c in minimize
        )
        gt = any(q[c] > p[c] for c in maximize) or any(
            q[c] < p[c] for c in minimize
        )
        return ge and gt

    return [p for p in rows if not any(better(q, p) for q in rows)]
