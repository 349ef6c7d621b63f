"""Generate committed expected-output Parquet fixtures for queries whose
semantics SQL cannot express (model weights, binary codecs), so the
driver's DuckDB oracle can still HARD-verify them via read_parquet().

Each fixture is produced by an INDEPENDENT scalar twin of the engine
path, chosen so the component under test cannot self-confirm:

- ``langid_docs``           — row-at-a-time ``models.langid_row`` (the
  engine runs the batched ``langid_scores`` kernel in an actor pool;
  the two are separate control flows, pinned bit-exact in
  tests/test_models.py).
- ``image_features``        — pixels straight from the seeded generator
  (``image_pixels_for_doc``), NEVER through the PNG codec the engine
  decodes with; features via the shared feature-mix constants.
- ``image_resize_features`` — generator pixels resampled with
  independent index math, again bypassing the codec entirely.

Usage (from the repo root):
    python tools/make_fixtures.py /root/testdata/sf0.01

Outputs land in tests/fixtures/*_sf001.parquet and are committed; the
driver compares them only at sf0.01 (the correctness-gate scale).
Regenerate whenever the langid model, feature mix, or corpus seeds
change.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)


def make_langid(sf_dir: str) -> pa.Table:
    from luzzu_ray import models

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs, confs = [], []
    for t in texts:
        lang, conf = models.langid_row(t)
        langs.append(lang)
        confs.append(int(np.floor(np.float64(conf) * 1_000_000.0)))
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "lang": pa.array(langs, pa.string()),
         "conf_q6": pa.array(confs, pa.int64())}
    )


def make_ppl(sf_dir: str) -> pa.Table:
    """Row-at-a-time langid + perplexity twin (``models.langid_row`` /
    ``models.ppl_row`` — independent control flow from the batched
    engine kernels, which tests pin bit-identical)."""
    from luzzu_ray import models

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs, ppls = [], []
    for t in texts:
        lang, _ = models.langid_row(t)
        langs.append(lang)
        ppls.append(int(np.floor(np.float64(models.ppl_row(t, lang))
                                 * 10_000.0)))
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "lang": pa.array(langs, pa.string()),
         "ppl_q4": pa.array(ppls, pa.int64())}
    )


def _feat_table(ids, pixel_fn, width: int, height: int) -> pa.Table:
    from luzzu_ray.ops.multimodal import _payload_features

    q = np.zeros((len(ids), 8), dtype=np.int64)
    for i, d in enumerate(ids):
        f = _payload_features(pixel_fn(d).reshape(-1))
        q[i] = np.rint(f.astype(np.float64) * 10_000.0).astype(np.int64)
    cols = {
        "id": pa.array(ids, pa.int64()),
        "width": pa.array(np.full(len(ids), width, dtype=np.int32)),
        "height": pa.array(np.full(len(ids), height, dtype=np.int32)),
    }
    for j in range(8):
        cols[f"f{j}_q4"] = pa.array(q[:, j])
    return pa.table(cols)


def make_image_features(sf_dir: str) -> pa.Table:
    from __ray_entry__ import IMG_H, IMG_W, image_pixels_for_doc

    ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()
    return _feat_table(ids, image_pixels_for_doc, IMG_W, IMG_H)


def make_image_resize_features(sf_dir: str) -> pa.Table:
    from __ray_entry__ import IMG_RH, IMG_RW, image_pixels_for_doc

    ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()

    def resampled(d: int) -> np.ndarray:
        px = image_pixels_for_doc(d)
        h, w = px.shape[:2]
        ys = (np.arange(IMG_RH, dtype=np.int64) * h) // IMG_RH
        xs = (np.arange(IMG_RW, dtype=np.int64) * w) // IMG_RW
        return px[ys][:, xs]

    return _feat_table(ids, resampled, IMG_RW, IMG_RH)


def make_video_frame_features(sf_dir: str) -> pa.Table:
    from __ray_entry__ import (
        VID_EVERY_K, VID_FH, VID_FW, VID_N_FRAMES, video_frame_pixels,
    )
    from luzzu_ray.ops.multimodal import _payload_features

    ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()
    rows_id, rows_frame, rows_q = [], [], []
    for d in ids:
        for f in range(0, VID_N_FRAMES, VID_EVERY_K):
            feat = _payload_features(video_frame_pixels(d, f).reshape(-1))
            rows_id.append(d)
            rows_frame.append(f)
            rows_q.append(
                np.rint(feat.astype(np.float64) * 10_000.0).astype(np.int64)
            )
    q = np.array(rows_q, dtype=np.int64).reshape(len(rows_id), 8)
    cols = {
        "id": pa.array(rows_id, pa.int64()),
        "frame_idx": pa.array(rows_frame, pa.int32()),
        "width": pa.array(np.full(len(rows_id), VID_FW, dtype=np.int32)),
        "height": pa.array(np.full(len(rows_id), VID_FH, dtype=np.int32)),
    }
    for j in range(8):
        cols[f"f{j}_q4"] = pa.array(q[:, j])
    return pa.table(cols)


def make_compression(sf_dir: str) -> pa.Table:
    """Row-at-a-time zlib twin of the engine's batched
    compression_ratio_batch kernel (separate control flow; the shared
    constant is only the zlib level)."""
    from luzzu_ray.ops.textstats import compression_ratio_py

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    rows = [compression_ratio_py(t) for t in texts]
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "raw_len": pa.array([r[0] for r in rows], pa.int64()),
         "comp_len": pa.array([r[1] for r in rows], pa.int64()),
         "ratio_q4": pa.array([r[2] for r in rows], pa.int64()),
         "is_null_text": pa.array([t is None for t in texts])}
    )


def make_quality_clf(sf_dir: str) -> pa.Table:
    """Row-at-a-time scalar twin of the hashed-linear classifier (the
    engine scores whole batches with reduceat kernels; this loop shares
    only the model constants)."""
    from luzzu_ray.ops.classifier import classify_row

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    rows = [classify_row(t) for t in texts]
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "clf_score": pa.array([r[0] for r in rows], pa.int64()),
         "clf_keep": pa.array([r[1] for r in rows])}
    )


def make_bpe(sf_dir: str) -> pa.Table:
    """Row-at-a-time BPE trainer (explicit Python scan, independent of
    the distributed kernels' vectorized merge application)."""
    from luzzu_ray.ops.vocab import bpe_train_py

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_by("doc_id")
    rows = bpe_train_py(docs["text"].to_pylist(), 12)
    return pa.table({
        "step": pa.array([r[0] for r in rows], pa.int64()),
        "tok_a": pa.array([r[1] for r in rows], pa.int64()),
        "tok_b": pa.array([r[2] for r in rows], pa.int64()),
        "new_id": pa.array([r[3] for r in rows], pa.int64()),
        "pair_count": pa.array([r[4] for r in rows], pa.int64()),
    })


def make_bpe_sampled(sf_dir: str) -> pa.Table:
    """Twin of bpe_train_sampled: the bottom-k-by-hash sample drawn
    with explicit Python integer arithmetic (same (h, doc_id) order as
    relational.bottom_k_by_hash), then the row-at-a-time trainer."""
    from luzzu_ray.ops.vocab import bpe_train_py

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    a, b = 6364136223846793005, 1442695040888963407
    ranked = sorted(
        ((i * a + b) % (1 << 64), i, t)
        for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    )
    sample = [t for _, _, t in ranked[:120]]
    rows = bpe_train_py(sample, 12)
    return pa.table({
        "step": pa.array([r[0] for r in rows], pa.int64()),
        "tok_a": pa.array([r[1] for r in rows], pa.int64()),
        "tok_b": pa.array([r[2] for r in rows], pa.int64()),
        "new_id": pa.array([r[3] for r in rows], pa.int64()),
        "pair_count": pa.array([r[4] for r in rows], pa.int64()),
    })


def _audio_feature_row(rate: int, s) -> tuple[int, int, int]:
    """Independent scalar twin of AudioDecodeStage._decode_wav: ssq via
    a sequential Python loop (exact int), same IEEE final expression."""
    import math

    n = len(s)
    if n == 0:
        return rate, 0, 0
    ssq = 0
    for v in s.tolist():
        ssq += v * v
    return (rate, n * 1000 // rate,
            int(math.floor(math.sqrt(ssq / n) / 32768.0 * 1000000.0)))


def make_audio_features(sf_dir: str) -> pa.Table:
    """Samples straight from the seeded generator — never through the
    WAV codec the engine decodes with."""
    from __ray_entry__ import audio_samples_for_doc

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    ids = docs["doc_id"].to_pylist()
    rows = [_audio_feature_row(*audio_samples_for_doc(d)) for d in ids]
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "sample_rate": pa.array([r[0] for r in rows], pa.int32()),
        "duration_ms": pa.array([r[1] for r in rows], pa.int64()),
        "rms_q6": pa.array([r[2] for r in rows], pa.int64()),
    })


def make_audio_resample_features(sf_dir: str) -> pa.Table:
    """Generator samples resampled by an INDEPENDENT scalar loop over
    output positions (exact rational position arithmetic), bypassing
    both the codec and the vectorized resampler."""
    from __ray_entry__ import AUDIO_RESAMPLE_RATE, audio_samples_for_doc

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    ids = docs["doc_id"].to_pylist()
    out = []
    dst = AUDIO_RESAMPLE_RATE
    for d in ids:
        src, s = audio_samples_for_doc(d)
        sl = s.tolist()
        n = len(sl)
        if src == dst:
            rs = sl
        else:
            m = max(1, (n * dst) // src)
            rs = []
            for i in range(m):
                num = i * src
                idx = num // dst
                fn = num - idx * dst
                idx = min(idx, n - 1)
                nxt = min(idx + 1, n - 1)
                a, b = sl[idx], sl[nxt]
                v = a + ((b - a) * fn) // dst
                # int16 wrap like the engine's astype(np.int16)
                v = ((v + 2**15) % 2**16) - 2**15
                rs.append(v)
        out.append(_audio_feature_row(dst, np.array(rs, dtype=np.int64)))
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "sample_rate": pa.array([r[0] for r in out], pa.int32()),
        "duration_ms": pa.array([r[1] for r in out], pa.int64()),
        "rms_q6": pa.array([r[2] for r in out], pa.int64()),
    })


def make_bpe_encode(sf_dir: str) -> pa.Table:
    """Pure-Python train + encode twin (explicit scans, independent of
    the distributed vectorized kernels)."""
    from luzzu_ray.ops.vocab import bpe_encode_py

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_by("doc_id")
    rows = bpe_encode_py(docs["text"].to_pylist(), 12)
    return pa.table({
        "doc_id": pa.array(docs["doc_id"].to_pylist(), pa.int64()),
        "n_bytes": pa.array([r[0] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
    })


def make_image_phash(sf_dir: str) -> pa.Table:
    """Scalar twin of image_phash_dedup: hashes from GENERATOR pixels
    (``neardup_pixels_for_doc`` — never the PNG codec the engine
    decodes with), keep = lowest id per hash via plain python."""
    from __ray_entry__ import neardup_pixels_for_doc
    from luzzu_ray.ops.multimodal import ahash_from_pixels

    doc_ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()
    hashes = [int(np.uint64(ahash_from_pixels(
        neardup_pixels_for_doc(d))).view(np.int64)) for d in doc_ids]
    mins: dict[int, int] = {}
    for d, h in zip(doc_ids, hashes):
        mins[h] = min(mins.get(h, d), d)
    return pa.table({
        "id": pa.array(doc_ids, pa.int64()),
        "ahash": pa.array(hashes, pa.int64()),
        "keep": pa.array([mins[h] == d for d, h in zip(doc_ids, hashes)]),
    })


def make_audio_fp(sf_dir: str) -> pa.Table:
    """Scalar twin of audio_fp_dedup: fingerprints from GENERATOR
    samples (``neardup_samples_for_doc`` — never the WAV codec)."""
    from __ray_entry__ import neardup_samples_for_doc
    from luzzu_ray.ops.multimodal import afp_from_samples

    doc_ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()
    hashes = []
    for d in doc_ids:
        _rate, s = neardup_samples_for_doc(d)
        hashes.append(int(np.uint64(afp_from_samples(s)).view(np.int64)))
    mins: dict[int, int] = {}
    for d, h in zip(doc_ids, hashes):
        mins[h] = min(mins.get(h, d), d)
    return pa.table({
        "id": pa.array(doc_ids, pa.int64()),
        "afp": pa.array(hashes, pa.int64()),
        "keep": pa.array([mins[h] == d for d, h in zip(doc_ids, hashes)]),
    })


def make_video_fp(sf_dir: str) -> pa.Table:
    """Scalar twin of video_fp_dedup: fingerprints from GENERATOR frame
    pixels (``neardup_video_frames_for_doc`` — never the codec)."""
    from __ray_entry__ import VID_EVERY_K, neardup_video_frames_for_doc
    from luzzu_ray.ops.multimodal import vfp_from_frame_pixels

    doc_ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()
    hashes = [int(np.uint64(vfp_from_frame_pixels(
        neardup_video_frames_for_doc(d), VID_EVERY_K)).view(np.int64))
        for d in doc_ids]
    mins: dict[int, int] = {}
    for d, h in zip(doc_ids, hashes):
        mins[h] = min(mins.get(h, d), d)
    return pa.table({
        "id": pa.array(doc_ids, pa.int64()),
        "vfp": pa.array(hashes, pa.int64()),
        "keep": pa.array([mins[h] == d for d, h in zip(doc_ids, hashes)]),
    })


def make_conv_turn_langs(sf_dir: str) -> pa.Table:
    """Row-at-a-time twin of langid over the MULTITURN corpus slices:
    the turn derivation is reconstructed independently (Python string
    slicing == SQL ``substr`` on the ASCII fixtures — never the
    engine's adapter), then ``models.langid_row`` labels each turn.
    Feeds the ``conv_lang_switches`` oracle."""
    from luzzu_ray import models
    from luzzu_ray.sources import MULTITURN_SLICE_STEP, MULTITURN_SLICE_W

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    conv_ids, turn_idxs, langs = [], [], []
    for did, text in zip(docs["doc_id"].to_pylist(),
                         docs["text"].to_pylist()):
        for i in range(2 + did % 3):
            s = (text or "")[
                MULTITURN_SLICE_STEP * i:
                MULTITURN_SLICE_STEP * i + MULTITURN_SLICE_W]
            lang, _ = models.langid_row(s)
            conv_ids.append(str(did))
            turn_idxs.append(i)
            langs.append(lang)
    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "lang": pa.array(langs, pa.string()),
    })


def main(sf_dir: str) -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name, fn in (
        ("langid_docs", make_langid),
        ("conv_turn_langs", make_conv_turn_langs),
        ("ppl_docs", make_ppl),
        ("image_phash_dedup", make_image_phash),
        ("audio_fp_dedup", make_audio_fp),
        ("video_fp_dedup", make_video_fp),
        ("bpe_merges", make_bpe),
        ("bpe_merges_sampled", make_bpe_sampled),
        ("bpe_encode_counts", make_bpe_encode),
        ("audio_features", make_audio_features),
        ("audio_resample_features", make_audio_resample_features),
        ("quality_classifier", make_quality_clf),
        ("image_features", make_image_features),
        ("image_resize_features", make_image_resize_features),
        ("video_frame_features", make_video_frame_features),
        ("doc_compression_ratio", make_compression),
    ):
        t = fn(sf_dir)
        path = os.path.join(FIXTURE_DIR, f"{name}_sf001.parquet")
        pq.write_table(t, path)
        print(f"{name}: {t.num_rows} rows -> {path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
