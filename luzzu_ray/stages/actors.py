"""Stateful actor-pool stages: langid (T1) and perplexity (T2).

Each is a callable CLASS passed to ``map_batches(Cls, concurrency=...,
batch_format="pyarrow")`` — Ray Data runs an actor pool; ``__init__`` loads
model weights ONCE per actor, ``__call__`` scores a batch vectorized.
Weights are broadcast once from the driver via ``ray.put`` and passed as an
ObjectRef in ``fn_constructor_kwargs`` (zero-copy numpy views out of the
object store on every node) — Luzzu's loaded-vocabulary side-data pattern
(/root/reference/README.md:14), T4 in SURVEY.md §2.3.

``ModelScorer`` fuses langid + perplexity into ONE actor stage: the
perplexity LM needs the langid verdict, and fusing avoids shipping the
full batch (including the text payload) through the object store between
two separate actor pools.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from luzzu_ray import constants as C
from luzzu_ray import models
from luzzu_ray.functions import text as TX
from luzzu_ray.stages import register_stage

# lang string lookup: index -1 (und) maps to the final element
_LANG_LOOKUP = np.array(list(models.LANGS) + [C.LANG_UND])


def _resolve_models(model_ref):
    if model_ref is None:
        return models.get_models()
    import ray

    if isinstance(model_ref, ray.ObjectRef):
        return ray.get(model_ref)
    return model_ref


@register_stage("langid", version=C.STAGE_VERSIONS["langid"], stateful=True,
                batch_size=4096)
class LangIdScorer:
    """fastText-style hashed char-trigram language ID (T1)."""

    def __init__(self, model_ref=None):
        self.W = _resolve_models(model_ref)["langid_W"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offs = TX.utf8_view(batch["text"])
        idx, conf = models.langid_scores(data, offs, self.W)
        lang = _LANG_LOOKUP[idx]
        return (
            batch.append_column("lang", pa.array(lang))
            .append_column("lang_conf", pa.array(conf))
            .append_column("lang_idx", pa.array(idx.astype(np.int8)))
        )


@register_stage("perplexity", version=C.STAGE_VERSIONS["perplexity"],
                stateful=True, batch_size=4096)
class PerplexityScorer:
    """KenLM-style hashed char-trigram LM perplexity, stupid backoff (T2)."""

    def __init__(self, model_ref=None):
        self.models = _resolve_models(model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offs = TX.utf8_view(batch["text"])
        lang_idx = (
            batch["lang_idx"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ppl = models.ppl_scores(data, offs, lang_idx, self.models)
        return batch.append_column("ppl", pa.array(ppl))


@register_stage("model_scorer", version=C.STAGE_VERSIONS["langid"],
                stateful=True, batch_size=4096)
class ModelScorer:
    """Fused langid + perplexity (one actor pool, one pass over the bytes).

    ``__init__`` runs a synthetic warm-up batch through every fused
    kernel: on hosts where first-touch page faults dominate (fresh heap
    pages cost ~100x a warm page), this moves the entire allocator
    warm-up into actor startup, which overlaps with the upstream read.
    """

    # with cache-resident chunking the steady working set is small, so a
    # modest warm-up suffices to prime the allocator
    WARMUP_BYTES = 1_500_000

    def __init__(self, model_ref=None, warmup: bool = True):
        self.models = _resolve_models(model_ref)
        if warmup:
            self._warmup()

    def _warmup(self) -> None:
        rng = np.random.default_rng(0)
        words = np.array(
            "alpha bravo charlie delta echo foxtrot golf hotel india".split()
        )
        row = " ".join(rng.choice(words, 160))
        n = max(1, self.WARMUP_BYTES // (len(row) + 1))
        fake = pa.table({"text": pa.array([row] * n)})
        from luzzu_ray.stages.turn_stages import scrub_batch, signals_batch

        signals_batch(fake)
        scrub_batch(fake)
        self(fake)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._score(batch)

    @staticmethod
    def _score_impl(batch: pa.Table, *, mdl) -> pa.Table:
        data, offs = TX.utf8_view(batch["text"])
        idx, conf = models.langid_scores(data, offs, mdl["langid_W"])
        ppl = models.ppl_scores(data, offs, idx, mdl)
        lang = _LANG_LOOKUP[idx]
        return (
            batch.append_column("lang", pa.array(lang))
            .append_column("lang_conf", pa.array(conf))
            .append_column("lang_idx", pa.array(idx.astype(np.int8)))
            .append_column("ppl", pa.array(ppl))
        )

    def _score(self, batch: pa.Table) -> pa.Table:
        return TX.chunked(self._score_impl)(batch, mdl=self.models)


class TurnLevelActor(ModelScorer):
    """The ENTIRE turn-level chain fused into one actor stage:

        normalize -> signals -> langid+ppl -> scrub -> verdict -> group key

    Used by the flagship fast path: with separate task-based stages the
    actor pool holds most CPUs while scrub/verdict tasks starve on the
    remainder, and every full batch (text + scrubbed text + signals)
    makes an extra object-store hop between stages.  Fusing keeps all
    per-turn CPU inside one pool and ships each batch through plasma
    once.  Stage composability is preserved at the config level
    (pipelines.config builds the unfused chain from the registry).
    """

    def __init__(self, model_ref=None, warmup: bool = True, giant_ids=None,
                 rule_pack=None):
        self.giant_arr = (
            pa.array(giant_ids, pa.string()) if giant_ids else None
        )
        self.verdict_fn = None
        if rule_pack is not None:
            from luzzu_ray.rules import compile_rules

            self.verdict_fn = compile_rules(rule_pack)
        super().__init__(model_ref=model_ref, warmup=warmup)

    def _warmup(self) -> None:  # cover the fused kernels too
        rng = np.random.default_rng(0)
        words = np.array(
            "alpha bravo charlie delta echo foxtrot golf hotel india".split()
        )
        row = " ".join(rng.choice(words, 160))
        n = max(1, self.WARMUP_BYTES // (len(row) + 1))
        fake = pa.table(
            {
                "conv_id": pa.array([f"w{i}" for i in range(n)]),
                "turn_idx": pa.array(np.zeros(n, np.int32)),
                "role": pa.array(["user"] * n),
                "text": pa.array([row] * n),
                "tool": pa.nulls(n, pa.string()),
                "ts": pa.array(np.zeros(n, np.int64), pa.timestamp("us")),
            }
        )
        self(fake)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from luzzu_ray.stages.conversation import add_group_key
        from luzzu_ray.stages.turn_stages import (
            normalize_batch,
            scrub_batch,
            signals_batch,
            verdict_batch,
        )

        t = normalize_batch(batch)
        t = signals_batch(t)
        t = self._score(t)
        t = scrub_batch(t)
        t = self.verdict_fn(t) if self.verdict_fn else verdict_batch(t)
        return add_group_key(t, self.giant_arr)
