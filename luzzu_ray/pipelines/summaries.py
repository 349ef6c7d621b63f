"""Quality-metric summary tables (G2-G4) — the daQ metadata analogue.

Luzzu finalizes each metric to a queryable quality-metadata graph
(/root/reference/README.md:8,14); here the equivalents are small Parquet
tables computed with partial+final aggregation over the labeled turn
table: per-language keep rates, perplexity histograms, scrub-class
counts, drop-reason counts and a keep-rate ranking (README.md:15 —
"quality-driven dataset ranking").

Every summary is a ``map_batches`` partial aggregate (one tiny row set
per block) followed by a small ``groupby`` over the partials — bytes
moved scale with #groups, never with #turns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from luzzu_ray import constants as C

PPL_HIST_LOG_BASE = 2.0  # bucket = floor(log2(ppl)); ppl<=0 -> bucket -1


def _partial_then_sum(
    ds: ray.data.Dataset, partial_fn, group_keys: list[str], sum_cols: list[str]
) -> ray.data.Dataset:
    """Common partial+final combine: per-batch groupby -> global groupby-sum."""
    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial_fn, batch_format="pyarrow")
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    return parts.groupby(group_keys).aggregate(*aggs)


def lang_keep_rates(labeled: ray.data.Dataset) -> ray.data.Dataset:
    """Per-language (n_turns, n_kept, keep_rate), one row per lang."""

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": t["lang"], "kept": pc.cast(t["keep"], pa.int64())})
            .group_by("lang")
            .aggregate([("kept", "sum"), ("kept", "count")])
        )
        return pa.table(
            {"lang": g["lang"], "n_kept": g["kept_sum"],
             "n_turns": pc.cast(g["kept_count"], pa.int64())}
        )

    agg = _partial_then_sum(labeled, partial, ["lang"], ["n_kept", "n_turns"])
    return agg.map_batches(
        lambda t: t.append_column(
            "keep_rate",
            pc.divide(pc.cast(t["n_kept"], pa.float64()),
                      pc.cast(t["n_turns"], pa.float64())),
        ),
        batch_format="pyarrow",
    )


def ppl_histogram(labeled: ray.data.Dataset) -> ray.data.Dataset:
    """log2-bucketed perplexity histogram over kept-eligible rows (ppl>0)."""

    def partial(t: pa.Table) -> pa.Table:
        ppl = t["ppl"].combine_chunks().to_numpy(zero_copy_only=False)
        valid = ppl > 0
        bucket = np.full(len(ppl), -1, dtype=np.int64)
        bucket[valid] = np.floor(
            np.log(ppl[valid]) / np.log(PPL_HIST_LOG_BASE)
        ).astype(np.int64)
        return (
            pa.table({"bucket": pa.array(bucket)})
            .group_by("bucket")
            .aggregate([("bucket", "count")])
            .rename_columns(["bucket", "n"])
        )

    return _partial_then_sum(labeled, partial, ["bucket"], ["n"]).sort("bucket")


def scrub_totals(labeled: ray.data.Dataset) -> pa.Table:
    """Global per-class scrub counts (one tiny row per scrub class)."""
    from ray.data.aggregate import Sum

    cols = [f"scrub_{k}" for k in C.SCRUB_CLASSES]
    res = labeled.aggregate(*[Sum(c, alias_name=c) for c in cols])
    return pa.table(
        {"scrub_class": pa.array(list(C.SCRUB_CLASSES)),
         "n_matches": pa.array([int(res[c] or 0) for c in cols], pa.int64())}
    )


def reason_counts(labeled: ray.data.Dataset) -> ray.data.Dataset:
    """Drop-reason distribution (QPRO problem-report rollup analogue)."""

    def partial(t: pa.Table) -> pa.Table:
        r = pc.fill_null(t["drop_reason"], "kept")
        return (
            pa.table({"drop_reason": r})
            .group_by("drop_reason")
            .aggregate([("drop_reason", "count")])
            .rename_columns(["drop_reason", "n"])
        )

    return _partial_then_sum(labeled, partial, ["drop_reason"], ["n"]).sort(
        "drop_reason"
    )


def conv_ranking(labeled: ray.data.Dataset, k: int = 100) -> ray.data.Dataset:
    """Top-k conversations by keep rate (O1 dataset-ranking analogue).

    Partial per-batch rollup -> small groupby over (conv, partials) ->
    score sort -> limit.  Ties broken by conv_id for determinism.
    """

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"conv_id": t["conv_id"], "kept": pc.cast(t["keep"], pa.int64())}
            )
            .group_by("conv_id")
            .aggregate([("kept", "sum"), ("kept", "count")])
        )
        return pa.table(
            {"conv_id": g["conv_id"], "n_kept": g["kept_sum"],
             "n_turns": pc.cast(g["kept_count"], pa.int64())}
        )

    agg = _partial_then_sum(labeled, partial, ["conv_id"], ["n_kept", "n_turns"])
    scored = agg.map_batches(
        lambda t: t.append_column(
            "keep_rate",
            pc.divide(pc.cast(t["n_kept"], pa.float64()),
                      pc.cast(t["n_turns"], pa.float64())),
        ),
        batch_format="pyarrow",
    )
    return scored.sort(
        ["keep_rate", "conv_id"], descending=[True, False]
    ).limit(k)


RANK_FACETS = ("keep_rate", "ppl_score", "clean_rate")


def weighted_conv_ranking(
    labeled: ray.data.Dataset,
    weights: dict[str, float] | None = None,
    k: int = 100,
) -> ray.data.Dataset:
    """User-weighted multi-facet ranking — Luzzu's facet-weighted
    dataset ranking (/root/reference/README.md:15, "allows users to
    define the ranking weights") over conversations.

    Facets, each in [0, 1]: ``keep_rate`` (kept / turns), ``ppl_score``
    (1 / (1 + mean ppl over scored turns)), ``clean_rate``
    (1 - scrubbed-turn fraction).  score = Σ w_f · f, normalized by
    Σ w — one partial+final aggregation, then a tiny sort+limit.
    """
    weights = weights or {f: 1.0 for f in RANK_FACETS}
    unknown = set(weights) - set(RANK_FACETS)
    if unknown:
        raise ValueError(f"unknown ranking facets: {sorted(unknown)}")
    wsum = sum(weights.values()) or 1.0
    scrub_cols = [f"scrub_{c}" for c in C.SCRUB_CLASSES]

    def partial(t: pa.Table) -> pa.Table:
        ppl = t["ppl"].combine_chunks().to_numpy(zero_copy_only=False)
        valid = ppl > 0
        scrubbed = np.zeros(t.num_rows, dtype=bool)
        for c in scrub_cols:
            scrubbed |= (
                t[c].combine_chunks().to_numpy(zero_copy_only=False) > 0
            )
        g = (
            pa.table(
                {
                    "conv_id": t["conv_id"],
                    "kept": pc.cast(t["keep"], pa.int64()),
                    "n_scrubbed": pa.array(scrubbed.astype(np.int64)),
                    "ppl_sum": pa.array(np.where(valid, ppl, 0.0)),
                    "n_ppl": pa.array(valid.astype(np.int64)),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                }
            )
            .group_by("conv_id")
            .aggregate([("kept", "sum"), ("n_scrubbed", "sum"),
                        ("ppl_sum", "sum"), ("n_ppl", "sum"), ("n", "sum")])
        )
        return g.rename_columns(
            ["conv_id", "kept", "n_scrubbed", "ppl_sum", "n_ppl", "n"]
        )

    agg = _partial_then_sum(
        labeled, partial, ["conv_id"],
        ["kept", "n_scrubbed", "ppl_sum", "n_ppl", "n"],
    )

    def score(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        kept = t["kept"].to_numpy(zero_copy_only=False)
        nscr = t["n_scrubbed"].to_numpy(zero_copy_only=False)
        psum = t["ppl_sum"].to_numpy(zero_copy_only=False)
        nppl = t["n_ppl"].to_numpy(zero_copy_only=False)
        # conversations with NO scoreable turns get ppl_score 0 (worst):
        # 1/(1+0) would rank unscoreable gibberish above every genuinely
        # scored conversation
        mean_ppl = psum / np.maximum(nppl, 1)
        facets = {
            "keep_rate": kept / n,
            "clean_rate": 1.0 - nscr / n,
            "ppl_score": np.where(nppl > 0, 1.0 / (1.0 + mean_ppl), 0.0),
        }
        s = np.zeros(len(n))
        for f, w in weights.items():
            s += w * facets[f]
        out = pa.table({"conv_id": t["conv_id"]})
        for f in RANK_FACETS:
            out = out.append_column(f, pa.array(facets[f]))
        return out.append_column("score", pa.array(s / wsum))

    scored = agg.map_batches(score, batch_format="pyarrow")
    return scored.sort(
        ["score", "conv_id"], descending=[True, False]
    ).limit(k)


def write_all(labeled: ray.data.Dataset, out_dir: str) -> None:
    """Write every summary family under ``out_dir`` (S3)."""
    import os

    lang_keep_rates(labeled).write_parquet(os.path.join(out_dir, "lang_keep"))
    ppl_histogram(labeled).write_parquet(os.path.join(out_dir, "ppl_hist"))
    reason_counts(labeled).write_parquet(os.path.join(out_dir, "reasons"))
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(out_dir, "scrub"), exist_ok=True)
    pq.write_table(
        scrub_totals(labeled), os.path.join(out_dir, "scrub", "totals.parquet")
    )
