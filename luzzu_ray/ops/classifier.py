"""Hashed-linear document quality classifier (fastText-style scorer).

The quality_filter tier's model-based keep/drop signal beyond heuristic
rules: a linear classifier over HASHED word unigram + bigram features
(the fastText trick — no vocabulary, a fixed-size weight table indexed
by a 64-bit polynomial hash of each token), mirroring the reference's
pluggable metric-processor architecture (reference README.md:7) as one
more independent composable scoring stage.

Everything is integer-exact and deterministic so the result is
hash-verifiable: weights are seeded int64 in [-50, 50], the score is a
pure integer sum, and keep = score > 0.  Two independent control flows
compute it:

- ``QualityClassifierStage`` — the engine path: an actor pool that
  builds the weight table once per actor in ``__init__`` and scores
  whole Arrow batches with vectorized byte kernels (per-word polynomial
  hashes via one ``reduceat`` pass over the batch's bytes, per-doc
  score via a second ``reduceat``) — no Python loop over rows, words
  or bytes.
- ``classify_row`` — the scalar twin: a row-at-a-time pure-Python loop
  used for the committed expected-output fixture and the pytest parity
  check, sharing only the model CONSTANTS (seed, table size, hash
  bases) with the engine, never its kernels.

Scale posture: the weight table is ~1 MB (2^17 int64) built from the
seed inside each actor — nothing is shipped per batch; the stage is
embarrassingly parallel with zero exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

CLF_BITS = 17
CLF_SIZE = 1 << CLF_BITS
CLF_MASK = np.uint64(CLF_SIZE - 1)
CLF_SEED = 0xC1A551F1E5
CLF_HASH_BASE = np.uint64(1099511628211)     # FNV-ish multiplier
CLF_HASH_SEED = np.uint64(14695981039346656037)
CLF_BIGRAM_MIX = np.uint64(0x9E3779B97F4A7C15)
CLF_BIAS = -8                                 # slight drop prior
_SPACE = 32


def build_weights() -> tuple[np.ndarray, np.ndarray]:
    """(unigram_weights, bigram_weights): seeded int64 in [-50, 50]."""
    rng = np.random.default_rng(CLF_SEED)
    w_uni = rng.integers(-50, 51, size=CLF_SIZE, dtype=np.int64)
    w_bi = rng.integers(-50, 51, size=CLF_SIZE, dtype=np.int64)
    return w_uni, w_bi


def _word_hash_py(word: bytes) -> int:
    h = int(CLF_HASH_SEED)
    for b in word:
        h = (h * int(CLF_HASH_BASE) + b) % (1 << 64)
    return h


def classify_row(text: str | None) -> tuple[int, bool]:
    """Scalar twin: (score, keep) for one document."""
    score = CLF_BIAS
    if text:
        w_uni, w_bi = build_weights()
        hashes = [_word_hash_py(w.encode("utf-8"))
                  for w in text.split(" ") if w]
        for h in hashes:
            score += int(w_uni[h & int(CLF_MASK)])
        for h1, h2 in zip(hashes, hashes[1:]):
            hb = (h1 * int(CLF_BIGRAM_MIX) + h2) % (1 << 64)
            score += int(w_bi[hb & int(CLF_MASK)])
    return score, score > 0


class QualityClassifierStage:
    """Actor-pool batch scorer: (doc_id, clf_score, clf_keep)."""

    def __init__(self):
        self.w_uni, self.w_bi = build_weights()
        # powers of the hash base, grown on demand (see _ensure_pows)
        self.max_len = 256
        self.pows = self._cumpows(self.max_len)

    @staticmethod
    def _cumpows(n: int) -> np.ndarray:
        pows = np.empty(n + 1, dtype=np.uint64)
        pows[0] = np.uint64(1)
        with np.errstate(over="ignore"):
            np.cumprod(
                np.full(n, CLF_HASH_BASE, dtype=np.uint64), out=pows[1:]
            )
        return pows

    def _ensure_pows(self, need: int) -> None:
        """Grow the base-power table to cover tokens of ``need`` bytes.

        Real quality-filter input (URLs, base64 blobs, unsegmented CJK)
        routinely exceeds any fixed cap, and the scalar twin
        ``classify_row`` scores arbitrary lengths — so the batch kernel
        must too (degrade-not-die; ADVICE r03 low).  uint64 cumprod
        wraps mod 2^64, exactly matching the twin's ``% (1 << 64)``."""
        if need > self.max_len:
            self.max_len = max(need, self.max_len * 2)
            self.pows = self._cumpows(self.max_len)

    def _word_hashes(
        self, data: np.ndarray, offsets: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-word 64-bit hashes + the word→row mapping, one pass.

        Returns (hashes, word_row) where word_row[i] is the batch row
        of word i; words are maximal non-space byte runs.
        """
        lo, hi = int(offsets[0]), int(offsets[-1])
        b = data[lo:hi]
        n_rows = len(offsets) - 1
        if len(b) == 0:
            return (np.empty(0, np.uint64), np.empty(0, np.int64))
        nonsp = b != _SPACE
        rel_off = offsets - lo
        # a word starts at a non-space byte that is preceded by a space
        # or by a row boundary
        prev_nonsp = np.empty(len(b), dtype=bool)
        prev_nonsp[0] = False
        prev_nonsp[1:] = nonsp[:-1]
        is_row_start = np.zeros(len(b) + 1, dtype=bool)
        is_row_start[rel_off[:-1]] = True
        starts = nonsp & (~prev_nonsp | is_row_start[:-1])
        word_id = np.cumsum(starts) - 1
        valid = nonsp
        # word lengths via counts of valid bytes per word
        n_words = int(starts.sum())
        if n_words == 0:
            return (np.empty(0, np.uint64), np.empty(0, np.int64))
        wlen = np.bincount(word_id[valid], minlength=n_words)
        self._ensure_pows(int(wlen.max()))
        # position of each byte within its word
        start_pos = np.flatnonzero(starts)
        pos = np.arange(len(b), dtype=np.int64) - start_pos[word_id]
        exp = wlen[word_id] - 1 - pos
        with np.errstate(over="ignore"):
            contrib = b.astype(np.uint64) * self.pows[np.where(valid, exp, 0)]
            sums = np.add.reduceat(
                np.where(valid, contrib, np.uint64(0)), start_pos
            )
            hashes = CLF_HASH_SEED * self.pows[wlen] + sums
        # row of each word from the row of its first byte
        byte_row = np.searchsorted(rel_off, start_pos, side="right") - 1
        return hashes, byte_row

    def __call__(self, t: pa.Table) -> pa.Table:
        from luzzu_ray.functions.text import utf8_view

        n = t.num_rows
        data, offsets = utf8_view(t["text"])
        hashes, word_row = self._word_hashes(data, offsets)
        score = np.full(n, np.int64(CLF_BIAS))
        if len(hashes):
            # bincount-with-weights sums in float64: exact while each
            # per-doc |sum| < 2^53 (weights are <= 50, so fine for any
            # document under ~10^11 tokens)
            uni = self.w_uni[(hashes & CLF_MASK).astype(np.int64)]
            score += np.bincount(word_row, weights=uni, minlength=n).astype(np.int64)
            same_row = word_row[1:] == word_row[:-1]
            if same_row.any():
                with np.errstate(over="ignore"):
                    hb = hashes[:-1] * CLF_BIGRAM_MIX + hashes[1:]
                bi = self.w_bi[(hb[same_row] & CLF_MASK).astype(np.int64)]
                score += np.bincount(
                    word_row[1:][same_row], weights=bi, minlength=n
                ).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "clf_score": pa.array(score),
            "clf_keep": pa.array(score > 0),
        })


def classify_documents(
    ds: ray.data.Dataset,
    concurrency: tuple[int, int] | None = None,
    stage_cls: type = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Actor-pool classifier run; ``stage_cls`` swaps in a
    QualityClassifierStage subclass (the one place the pool wiring and
    sizing convention live), ``columns`` widens the projection when the
    subclass consumes extra input columns."""
    from luzzu_ray.pipelines.filter_pipeline import cluster_cpus

    if concurrency is None:
        concurrency = (1, max(2, cluster_cpus() // 2))
    return ds.select_columns(columns or ["doc_id", "text"]).map_batches(
        stage_cls or QualityClassifierStage,
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
    )


class AgreementStage(QualityClassifierStage):
    """Classifier verdict + heuristic C4-rule verdict from the SAME
    input batch (row-aligned by construction — no join needed): adds
    ``heur_keep`` from :func:`luzzu_ray.ops.textstats.quality_score_batch`
    next to (doc_id, clf_score, clf_keep)."""

    def __call__(self, t: pa.Table) -> pa.Table:  # noqa: D102
        from luzzu_ray.ops.textstats import quality_score_batch

        out = super().__call__(t)
        return out.append_column(
            "heur_keep", quality_score_batch(t)["keep"])


def classify_with_heuristic(
    ds: ray.data.Dataset, concurrency: tuple[int, int] | None = None
) -> ray.data.Dataset:
    """(doc_id, clf_score, clf_keep, heur_keep) per document — the
    input to filter-agreement evals (:func:`rater_agreement`)."""
    return classify_documents(ds, concurrency, stage_cls=AgreementStage)


# ---------------------------------------------------------------------------
# Distributed batch-perceptron TRAINING (the in-engine complement of the
# fixed-weight scorer above): learn integer weights over hashed token
# buckets with the classic batch perceptron rule
#     w_{e+1} = w_e + sum_{misclassified docs} y * x
# (Rosenblatt 1958; batch variant).  Everything is int64-exact and
# order-independent (the update sums over the FULL pass), so the DuckDB
# oracle unrolls the epochs and matches bit-for-bit.
# ---------------------------------------------------------------------------

PERC_BUCKETS = 32          # hashed feature buckets; bucket PERC_BUCKETS = bias
PERC_EPOCHS = 3


def perceptron_score_batch(
    t: pa.Table,
    w: np.ndarray,
    n_buckets: int,
    label_threshold: int,
    text_col: str,
    label_col: str,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """The SINGLE definition of the train/apply scoring contract:
    hashed-token bucket features (DSIR polynomial hash), bias at index
    ``n_buckets``, int64 ``score = w . x``, ``y = +1 iff label >=
    threshold``.  Returns ``(y, score, bucket_per_token,
    row_per_token)`` for one batch — training's gradient and the
    apply/eval passes both consume this, so the feature/tokenization/
    sign conventions can never desynchronize."""
    from luzzu_ray.ops.vocab import _dsir_bucket_block

    col = t[text_col]
    b, rid = _dsir_bucket_block(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col,
        n_buckets)
    lab = t[label_col].to_numpy(zero_copy_only=False)
    y = np.where(lab >= label_threshold, np.int64(1), np.int64(-1))
    score = np.full(t.num_rows, w[n_buckets], dtype=np.int64)
    np.add.at(score, rid, w[b])
    return y, score, b, rid


def perceptron_train(
    ds,
    n_buckets: int = PERC_BUCKETS,
    n_epochs: int = PERC_EPOCHS,
    label_threshold: int = 300,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "n_chars",
) -> pa.Table:
    """Train a linear keep/drop classifier IN the engine: hashed-token
    bucket counts (+ bias) as features, ``y = +1 iff label_col >=
    label_threshold``, ``n_epochs`` batch-perceptron updates.  Returns
    the DENSE final weight table ``(b, w)`` with ``b = n_buckets`` the
    bias row — ``n_buckets + 1`` rows total.

    Exactness: predictions are ``sign(w . x)`` with ``sign(0) = -1``;
    the epoch update sums integer ``y * x`` over misclassified docs —
    order-independent, so block layout never matters.  A-priori int64
    bound: ``|w| <= n_epochs * total_tokens`` and per-doc ``|w . x| <=
    |w| * doc_tokens`` — safe below ~10^15 corpus tokens per epoch;
    the conformance corpus is ~10^4.

    Scale shape: per epoch ONE streamed map pass over the corpus (the
    weight vector rides in the task closure — ``n_buckets + 1`` ints,
    nothing per batch) emitting <= ``n_buckets + 1`` sparse gradient
    rows per block, then a constant-bounded keyed reduce whose
    ``n_buckets + 1`` rows come to the driver.  Features are
    recomputed per pass instead of materializing a (doc, bucket)
    table — at 10^12 turns the recompute is one read-through, the
    materialization is a corpus-sized intermediate.  The bucket hash
    is the DSIR one (`ops/vocab._dsir_bucket_block`): a SQL-foldable
    polynomial, so the oracle rebuilds features with no fixture.
    """
    from luzzu_ray.ops.relational import grouped_sum_q

    bias = n_buckets
    w = np.zeros(n_buckets + 1, dtype=np.int64)
    picked = ds.select_columns([id_col, text_col, label_col])

    for _ in range(n_epochs):
        w_now = w.copy()

        def grad_partial(t: pa.Table, w_now=w_now) -> pa.Table:
            empty = pa.table({"b": pa.array([], pa.int64()),
                              "g": pa.array([], pa.int64())})
            if t.num_rows == 0:
                return empty
            y, score, b, rid = perceptron_score_batch(
                t, w_now, n_buckets, label_threshold, text_col, label_col)
            # pred = sign(score), sign(0) = -1; misclassified iff
            # pred != y  <=>  (score > 0) != (y == 1)
            mis = (score > 0) != (y == 1)
            g = np.zeros(n_buckets + 1, dtype=np.int64)
            tok_mis = mis[rid]
            np.add.at(g, b[tok_mis], y[rid[tok_mis]])
            g[bias] = y[mis].sum()
            nz = np.flatnonzero(g)
            if not len(nz):
                return empty
            return pa.table({"b": pa.array(nz.astype(np.int64)),
                             "g": pa.array(g[nz])})

        rows = grouped_sum_q(
            picked.map_batches(
                grad_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["b"], float_cols={}, int_cols={"g": "g"}, num_partitions=2,
        ).take_all()  # bounded: <= n_buckets + 1 rows by construction
        for r in rows:
            w[int(r["b"])] += int(r["g"])

    return pa.table({
        "b": pa.array(np.arange(n_buckets + 1, dtype=np.int64)),
        "w": pa.array(w),
    })
