"""Config-driven pipeline assembly (X1: Luzzu's pluggable-metric
composability — /root/reference/README.md:13 — as an ordered stage list
in a TOML/dict config).

Config shape::

    [pipeline]
    stages = ["normalize", "heuristics", "model_scorer", "scrub", "verdict"]

    [rules]                      # optional: declarative pack (X2)
    pack = [ {reason="too_short", signal="n_chars", op="lt", value=5}, ... ]

    [tuning]                     # optional
    model_batch = 0              # 0 -> whole blocks
    num_partitions = 0           # 0 -> derived from cluster

Stages resolve from the ``@register_stage`` registry: stateless entries
become fused ``map_batches`` tasks; ``stateful=True`` entries become
actor pools with their registered batch size.
"""

from __future__ import annotations

from typing import Any

import ray.data

from luzzu_ray.stages import all_stages


def load_config(path: str) -> dict:
    import tomllib

    with open(path, "rb") as f:
        return tomllib.load(f)


def build_pipeline(
    ds: ray.data.Dataset, config: dict[str, Any], model_ref=None
) -> ray.data.Dataset:
    """Apply the configured stage chain to ``ds`` (turn-level only; the
    conversation shuffle is added by the caller / runner)."""
    from luzzu_ray.pipelines.filter_pipeline import default_actor_pool
    from luzzu_ray.rules import Rule, compile_rules

    registry = all_stages()
    tuning = config.get("tuning", {})
    model_batch = tuning.get("model_batch", 0) or None
    rule_rows = config.get("rules", {}).get("pack")

    for name in config["pipeline"]["stages"]:
        if name == "verdict" and rule_rows:
            pack = [Rule.from_dict(d) for d in rule_rows]
            ds = ds.map_batches(
                compile_rules(pack), batch_format="pyarrow", zero_copy_batch=True
            )
            continue
        spec = registry[name]
        if spec.stateful:
            ds = ds.map_batches(
                spec.fn,
                batch_format="pyarrow",
                batch_size=model_batch or spec.batch_size,
                concurrency=default_actor_pool(),
                fn_constructor_kwargs={"model_ref": model_ref},
            )
        else:
            ds = ds.map_batches(
                spec.fn, batch_format="pyarrow", zero_copy_batch=True
            )
    return ds
