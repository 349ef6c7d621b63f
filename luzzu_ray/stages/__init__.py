"""Quality-stage plugin surface (Luzzu ``QualityMetric`` analogue).

Luzzu's extension point is a JAR-dropped ``QualityMetric`` with
``compute(quad)`` / ``metricValue()`` (/root/reference/README.md:13,
".gitignore:20" /luzzu-plugins/); ours is a registered stage: either a
stateless batch transform ``fn(pa.Table) -> pa.Table`` or a callable class
whose instances run in a Ray actor pool.  The pipeline is an ordered list
of registered stage names — "metric-per-processor" composability
(BASELINE.json:north_star).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

_REGISTRY: dict[str, "StageSpec"] = {}


@dataclass
class StageSpec:
    name: str
    version: str
    fn: Any                      # callable (stateless) or callable class (actor)
    stateful: bool = False       # True -> actor pool via map_batches(Cls, ...)
    batch_size: int | None = None
    default_kwargs: dict = field(default_factory=dict)


def register_stage(
    name: str,
    version: str = "1.0",
    stateful: bool = False,
    batch_size: int | None = None,
    **default_kwargs,
) -> Callable:
    def deco(fn):
        _REGISTRY[name] = StageSpec(
            name=name,
            version=version,
            fn=fn,
            stateful=stateful,
            batch_size=batch_size,
            default_kwargs=default_kwargs,
        )
        return fn

    return deco


def get_stage(name: str) -> StageSpec:
    return _REGISTRY[name]


def all_stages() -> dict[str, StageSpec]:
    # import for registration side effects
    from luzzu_ray.stages import actors, turn_stages  # noqa: F401

    return dict(_REGISTRY)
