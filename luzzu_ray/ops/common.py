"""Shared helpers for the ops modules."""

from __future__ import annotations


def pool() -> tuple[int, int]:
    """Cluster-sized autoscaling pool for full-scan map stages (a fixed
    (1, 8) cap starves >8-CPU clusters).  Deferred import keeps ops
    modules importable without the pipelines package loaded."""
    from luzzu_ray.pipelines.filter_pipeline import default_actor_pool

    return default_actor_pool()
