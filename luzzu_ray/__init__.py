"""luzzu_ray: a Ray-Data-native transcript quality-filter engine.

The engine's wide operations are all key-based hash shuffles
(conversation reassembly, dedup bucketing, sessionization), so the
hash-shuffle strategy is declared once at import — a Dataset snapshots
its DataContext at creation time, so this must happen before any
``read_parquet``/``from_arrow``, not at the ``repartition`` call.
"""

from __future__ import annotations


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
