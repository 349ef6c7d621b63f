"""luzzu_ray: a Ray-Data-native transcript quality-filter engine.

The engine's wide operations are all key-based hash shuffles
(conversation reassembly, dedup bucketing, sessionization), so the
hash-shuffle strategy is declared once at import — a Dataset snapshots
its DataContext at creation time, so this must happen before any
``read_parquet``/``from_arrow``, not at the ``repartition`` call.
"""

from __future__ import annotations

import os


def _tune_allocator() -> None:
    """Keep large numpy temporaries on the (reused) heap.

    glibc mmap()s any allocation above its threshold and munmap()s it on
    free; the dynamic threshold tops out at 32MB, so the scorers' larger
    per-batch temporaries would pay full first-touch page-fault cost on
    EVERY batch — on the target hosts page faults cost ~100x a warm
    page.  Setting the threshold explicitly (no cap applies to the env
    var) makes the heap grow once per worker and stay warm.  Must run
    before ``ray.init`` so forked raylet/worker processes inherit it.
    """
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")


_tune_allocator()


def _declare_shuffle_strategy() -> None:
    try:
        import ray.data
        from ray.data.context import ShuffleStrategy

        ray.data.DataContext.get_current().shuffle_strategy = (
            ShuffleStrategy.HASH_SHUFFLE
        )
    except Exception:  # pragma: no cover - ray.data always importable here
        pass


_declare_shuffle_strategy()
