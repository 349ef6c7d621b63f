"""The flagship assessment pipeline (SURVEY.md §3.2, entry point 1).

    read_parquet -> TurnLevelActor pool (normalize + heuristics +
    langid/ppl + scrub + verdict + group key, fused; SURVEY.md §8.1) ->
    repartition(keys=[group_key]) -> conversation rules -> labeled turns

One actor-pool pass over the bytes, exactly ONE wide shuffle
(conversation reassembly).  Default is one-pass with group_key =
conv_id; opt-in giant-conversation handling is a three-phase protocol
(SURVEY.md §4.2, enabled by ``giant_min_turns``):

  phase 0  detect_giants      — conv_id column only, partial-aggregated
                                counts (bytes moved ~ #convs, not #turns)
  phase 1  giant verdict pass — full signals on ONLY the giant subset,
                                per-chunk partials -> tiny driver merge
  phase 2  main run           — every row labeled in one pass; giant
                                conv-verdicts applied from the broadcast map

Giant rows are read/scored twice; by the skew assumption giants are a
small fraction, and this keeps the main pass single-shuffle, streaming and
never materializes anything large.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from luzzu_ray import constants as C
from luzzu_ray import models
from luzzu_ray.sources import read_transcripts
from luzzu_ray.stages.actors import ModelScorer
from luzzu_ray.stages.conversation import conv_block_fn, reduce_giant_partials
from luzzu_ray.stages.turn_stages import (
    normalize_batch,
    scrub_batch,
    signals_batch,
    verdict_batch,
)

DEFAULT_ACTOR_POOL = None  # resolved from cluster size at build time
# whole blocks: the scorer chunks internally to cache-resident slices
DEFAULT_MODEL_BATCH = None


def cluster_cpus() -> int:
    return max(1, int(ray.cluster_resources().get("CPU", 1)))


def default_actor_pool() -> tuple[int, int]:
    """Autoscaling (1, hi) with hi < cluster CPUs.

    MUST stay autoscaling and leave headroom: a fixed pool spanning every
    CPU deadlocks against the hash-shuffle aggregator actors downstream.
    """
    cpus = cluster_cpus()
    hi = max(2, cpus - max(2, cpus // 4))
    # autoscaling ramps too slowly from min=1 (observed ~2 effective
    # actors on an 8-CPU run); start at half the ceiling
    return (max(1, hi // 2), hi)


def default_num_partitions() -> int:
    """Shuffle width ≈ 4x cluster CPUs: bounds reduce-block size (cheap
    per-block sorts, fine-grained stragglers) without outrunning the
    aggregator pool on small sessions."""
    return min(512, max(8, 4 * cluster_cpus()))


# When set, _ensure_hash_shuffle uses this aggregator cap instead of the
# cluster-derived default — the parallel-shard runner divides the cap
# across concurrent pipelines and MUST NOT be clobbered by the pipelines
# themselves re-declaring the context (every run_flagship calls
# _ensure_hash_shuffle before creating datasets).
_AGGREGATOR_CAP_OVERRIDE: int | None = None


def set_aggregator_cap_override(cap: int | None) -> None:
    global _AGGREGATOR_CAP_OVERRIDE
    _AGGREGATOR_CAP_OVERRIDE = cap


def _ensure_hash_shuffle() -> None:
    """Key-based repartition requires the hash-shuffle strategy.

    Cap shuffle-aggregator actors to a fraction of cluster CPUs: the
    default (64) deadlocks a small session where aggregators + the two
    scoring actor pools cannot all schedule at once.
    """
    from ray.data.context import ShuffleStrategy

    ctx = ray.data.DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if _AGGREGATOR_CAP_OVERRIDE is not None:
        ctx.max_hash_shuffle_aggregators = _AGGREGATOR_CAP_OVERRIDE
    else:
        ctx.max_hash_shuffle_aggregators = max(2, cluster_cpus() // 2)
    # groupby/aggregate default to 200 partitions (DEFAULT_MIN_PARALLELISM);
    # on a small cluster that is pure aggregator-actor churn
    ctx.default_hash_shuffle_parallelism = default_num_partitions()


def put_models():
    """Broadcast the model weights once (ray.put -> zero-copy in actors)."""
    return ray.put(models.get_models())


def turn_level(
    ds: ray.data.Dataset,
    model_ref=None,
    *,
    model_batch: int = DEFAULT_MODEL_BATCH,
    actor_pool=DEFAULT_ACTOR_POOL,
    rule_pack=None,
    scorer_kwargs: dict | None = None,
) -> ray.data.Dataset:
    """All per-turn stages (no shuffle): signals, models, scrub, verdict.

    ``rule_pack`` (list[luzzu_ray.rules.Rule]) swaps the hand-written
    verdict for a compiled declarative pack (LQML analogue, X2).
    """
    if actor_pool is None:
        actor_pool = default_actor_pool()
    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(normalize_batch, **kw)
    ds = ds.map_batches(signals_batch, **kw)
    ds = ds.map_batches(
        ModelScorer,
        batch_format="pyarrow",
        batch_size=model_batch,
        concurrency=actor_pool,
        fn_constructor_kwargs={"model_ref": model_ref, **(scorer_kwargs or {})},
    )
    ds = ds.map_batches(scrub_batch, **kw)
    if rule_pack is not None:
        from luzzu_ray.rules import compile_rules

        ds = ds.map_batches(compile_rules(rule_pack), **kw)
    else:
        ds = ds.map_batches(verdict_batch, **kw)
    return ds


def detect_giants(paths, giant_min_turns: int = C.GIANT_MIN_TURNS) -> list[str]:
    """Phase 0: conv_ids with >= giant_min_turns rows.

    Reads ONLY the conv_id column; per-batch partial counts are combined by
    a small groupby over (conv_id, n) partial rows — the shuffle moves one
    row per conversation per batch, never the turns themselves.
    """
    _ensure_hash_shuffle()
    ds = read_transcripts(paths, columns=["conv_id"])

    def partial_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("conv_id").aggregate([("conv_id", "count")])
        return pa.table(
            {"conv_id": g["conv_id"], "n": pc.cast(g["conv_id_count"], pa.int64())}
        )

    parts = ds.map_batches(partial_counts, batch_format="pyarrow")

    # repartition + per-block sum instead of groupby().aggregate(): the
    # generic hash-aggregate pays per-row actor overhead that dwarfs this
    # tiny (conv_id, n) table; a plain hash exchange + one pyarrow
    # group_by per block is ~10x cheaper at the same scalability
    def block_sum(t: pa.Table) -> pa.Table:
        g = t.group_by("conv_id").aggregate([("n", "sum")])
        return g.rename_columns(["conv_id", "n"])

    # width sized to the partial table (~#convs rows, estimated from the
    # metadata turn count / typical turns-per-conv), clamped to the
    # cluster cap — never a fixed constant (at 10^11 convs the partials
    # are no longer tiny)
    from luzzu_ray.ops.dedup import _size_partitions, count_if_cheap

    n_turns = count_if_cheap(ds)
    width = (
        _size_partitions(max(1, n_turns // 6), default_num_partitions())
        if n_turns is not None else default_num_partitions()
    )
    counts = parts.repartition(num_blocks=width, keys=["conv_id"]).map_batches(
        block_sum, batch_format="pyarrow", batch_size=None
    )
    big = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], giant_min_turns)),
        batch_format="pyarrow",
    )
    return [r["conv_id"] for r in big.take_all()]


def compute_giant_verdicts(
    paths,
    giants: list[str],
    model_ref=None,
    *,
    num_partitions: int | None = None,
    actor_pool=DEFAULT_ACTOR_POOL,
    conv_min_turns: int = C.CONV_MIN_TURNS,
) -> dict[str, str]:
    """Phase 1: conversation-level verdicts for giant convs (two-level agg)."""
    if not giants:
        return {}
    _ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = default_num_partitions()
    giant_arr = pa.array(giants, pa.string())
    ds = read_transcripts(paths)
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["conv_id"], value_set=giant_arr)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # the giant subset is small: skip actor warm-up, keep the pool narrow
    if actor_pool is None:
        actor_pool = (1, max(2, cluster_cpus() // 4))
    from luzzu_ray.stages.actors import TurnLevelActor

    ds = ds.map_batches(
        TurnLevelActor,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=actor_pool,
        fn_constructor_kwargs={
            "model_ref": model_ref, "warmup": False, "giant_ids": giants,
        },
    )
    ds = ds.repartition(num_blocks=num_partitions, keys=["group_key"])
    partials = ds.map_batches(
        conv_block_fn, fn_kwargs={"emit": "partials"},
        batch_format="pyarrow", batch_size=None,
    )
    # one row per chunk — tiny
    tbl = pa.Table.from_pylist(
        partials.take_all(),
        schema=pa.schema(
            [("conv_id", pa.string()), ("valid", pa.int64()), ("total", pa.int64())]
        ),
    )
    return reduce_giant_partials(tbl, conv_min_turns=conv_min_turns)


def build_labeled(
    paths_or_ds,
    *,
    model_ref=None,
    giants: list[str] | None = None,
    giant_verdicts: dict[str, str] | None = None,
    num_partitions: int | None = None,
    model_batch: int = DEFAULT_MODEL_BATCH,
    actor_pool=DEFAULT_ACTOR_POOL,
    conv_min_turns: int = C.CONV_MIN_TURNS,
    rule_pack=None,
) -> ray.data.Dataset:
    """Phase 2: the full labeled-turns dataset (lazy; one shuffle)."""
    _ensure_hash_shuffle()
    if isinstance(paths_or_ds, ray.data.Dataset):
        ds = paths_or_ds
        if num_partitions is None:
            num_partitions = default_num_partitions()
    else:
        ds = read_transcripts(paths_or_ds)
        if num_partitions is None:
            # size the conversation shuffle to the corpus (~50k turn rows
            # ≈ 50MB per reduce block), floored at the CPU count so the
            # conv stage keeps full parallelism, capped at the cluster
            # width; counted only when metadata-cheap (bare read)
            from luzzu_ray.ops.dedup import count_if_cheap

            n_turns = count_if_cheap(ds)
            cap = default_num_partitions()
            if n_turns is None:
                num_partitions = cap
            else:
                num_partitions = max(
                    min(cluster_cpus(), cap),
                    min(cap, -(-n_turns // 50_000)),
                )
    if actor_pool is None:
        actor_pool = default_actor_pool()
    from luzzu_ray.stages.actors import TurnLevelActor

    ds = ds.map_batches(
        TurnLevelActor,
        batch_format="pyarrow",
        batch_size=model_batch,
        concurrency=actor_pool,
        fn_constructor_kwargs={
            "model_ref": model_ref,
            "giant_ids": giants or None,
            "rule_pack": rule_pack,
        },
    )
    ds = ds.repartition(num_blocks=num_partitions, keys=["group_key"])
    ds = ds.map_batches(
        conv_block_fn,
        fn_kwargs={
            "giant_verdicts": giant_verdicts or {},
            "conv_min_turns": conv_min_turns,
        },
        batch_format="pyarrow",
        batch_size=None,
    )
    return ds


def run_flagship(
    input_dir_or_paths,
    *,
    giant_min_turns: int | None = None,
    num_partitions: int | None = None,
    model_batch: int = DEFAULT_MODEL_BATCH,
    actor_pool=DEFAULT_ACTOR_POOL,
    skip_giant_detection: bool = False,
    conv_min_turns: int = C.CONV_MIN_TURNS,
    rule_pack=None,
) -> ray.data.Dataset:
    """The flagship pipeline; returns the lazy labeled dataset.

    Default is ONE PASS with ``group_key = conv_id`` (no giant-conv
    pre-detection): a reduce block holds every turn of its conversations,
    which is fine up to conversations of ~1M turns (~1GB block).  For
    corpora that can exceed that, pass ``giant_min_turns`` to enable the
    three-phase salted protocol (detect -> per-chunk verdicts -> main
    pass with broadcast giant verdicts) documented in the module header.
    """
    model_ref = put_models()
    if skip_giant_detection or giant_min_turns is None:
        giants, verdicts = [], {}
    else:
        giants = detect_giants(input_dir_or_paths, giant_min_turns)
        verdicts = compute_giant_verdicts(
            input_dir_or_paths, giants, model_ref,
            num_partitions=num_partitions, actor_pool=actor_pool,
            conv_min_turns=conv_min_turns,
        )
    return build_labeled(
        input_dir_or_paths,
        model_ref=model_ref,
        giants=giants,
        giant_verdicts=verdicts,
        num_partitions=num_partitions,
        model_batch=model_batch,
        actor_pool=actor_pool,
        conv_min_turns=conv_min_turns,
        rule_pack=rule_pack,
    )
