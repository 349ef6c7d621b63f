"""Shared helpers for the ops modules."""

from __future__ import annotations

import numpy as np


def year_from_epoch_us(us: np.ndarray) -> np.ndarray:
    """Calendar year from epoch microseconds with pure integer
    arithmetic (no datetime library in the hot path) — Howard Hinnant's
    civil-from-days algorithm ("chrono-Compatible Low-Level Date
    Algorithms", public domain).  Matches DuckDB ``year(ts)`` exactly
    for any proleptic-Gregorian timestamp; numpy ``//`` is floor
    division, so pre-1970 dates are handled too."""
    days = np.asarray(us, dtype=np.int64) // 86_400_000_000
    z = days + 719_468
    era = z // 146_097
    doe = z - era * 146_097
    yoe = (doe - doe // 1460 + doe // 36_524 - doe // 146_096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    m = mp + 3 - 12 * (mp // 10)
    return y + (m <= 2)


def pool() -> tuple[int, int]:
    """Cluster-sized autoscaling pool for full-scan map stages (a fixed
    (1, 8) cap starves >8-CPU clusters).  Deferred import keeps ops
    modules importable without the pipelines package loaded."""
    from luzzu_ray.pipelines.filter_pipeline import default_actor_pool

    return default_actor_pool()
