"""Multimodal column plumbing: image / audio / video as opaque binary
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the decode kernels are STUBBED exactly as documented in
the build brief: ``mode="strict"`` raises ``NotImplementedError`` at the
decode step; ``mode="fake"`` decodes a deterministic synthetic container
format so the Ray-side plumbing — schema handling, small-batch actor
stages, flat-map frame sampling, output layout — is real and tested.
``mode="auto"`` uses the real library when importable, else the fake.

Synthetic container format (FAKEIMG / FAKEAUD / FAKEVID):
    magic(7s) | width:uint16 | height:uint16 | payload bytes
(audio: sample_rate:uint32 | n_samples:uint32; video: n_frames:uint16
frames of FAKEIMG records).

Batch-size guidance: binary payloads are large; callers should pass
``batch_size<=256`` so batch x concurrency stays inside worker heaps.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

IMG_MAGIC = b"FAKEIMG"
AUD_MAGIC = b"FAKEAUD"
VID_MAGIC = b"FAKEVID"
N_FEATURES = 8

_FEAT_MIX = np.random.Generator(np.random.PCG64(424242)).integers(
    1, 2**63, size=N_FEATURES, dtype=np.uint64
) * np.uint64(2) + np.uint64(1)


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    payload = rng.integers(0, 256, size=min(width * height, 4096),
                           dtype=np.uint8).tobytes()
    return IMG_MAGIC + struct.pack("<HH", width, height) + payload


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    payload = rng.integers(-(2**15), 2**15, size=min(n_samples, 4096),
                           dtype=np.int16).tobytes()
    return AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + payload


def encode_fake_video(n_frames: int, width: int, height: int, seed: int) -> bytes:
    frames = b"".join(
        encode_fake_image(width, height, seed * 1000 + i) for i in range(n_frames)
    )
    return VID_MAGIC + struct.pack("<H", n_frames) + frames


# REAL-frame video container: a length-prefixed sequence of genuine PNG
# frames (the MJPEG idea with the one codec this container ships).
# Layout: magic(7s) | n_frames:uint16 | { frame_len:uint32 | png bytes }*
VIDPNG_MAGIC = b"VIDPNG1"


def encode_png_video(frames: list) -> bytes:
    """List of (h, w[, c]) uint8 arrays -> VIDPNG container of real PNGs."""
    from luzzu_ray.ops.png import encode_png

    recs = []
    for f in frames:
        png = encode_png(f)
        recs.append(struct.pack("<I", len(png)) + png)
    return VIDPNG_MAGIC + struct.pack("<H", len(frames)) + b"".join(recs)


def _payload_features(payload: np.ndarray) -> np.ndarray:
    """Deterministic 8-dim feature vector from payload bytes (stand-in for
    a model embedding; vectorized, shared with the test twin)."""
    with np.errstate(over="ignore"):
        acc = np.zeros(N_FEATURES, dtype=np.uint64)
        x = payload.astype(np.uint64)
        for i in range(N_FEATURES):
            acc[i] = (x * _FEAT_MIX[i]).sum()
    return (acc % np.uint64(10_000)).astype(np.float32) / np.float32(10_000.0)


class ImageDecodeStage:
    """Actor-pool stage: binary image column -> width/height/features.

    Input columns: (id:int64, image:binary).  Output adds
    width:int32, height:int32, features:list<float32>[8].

    The PNG path is a REAL codec (``luzzu_ray.ops.png``: stdlib zlib +
    NumPy defilter — bit depth 8, color types 0/2/4/6), so image decode
    on genuine container bytes is no longer stubbed.  Modes:

    - ``auto``  — PNG bytes decode for real, FAKEIMG via the stub,
      anything else degrades to zeros
    - ``real``  — PNG only; non-PNG bytes degrade to zeros
    - ``strict``— PNG only; non-PNG/undecodable bytes RAISE
    - ``fake``  — FAKEIMG stub only
    """

    def __init__(self, mode: str = "auto"):
        if mode not in ("auto", "real", "strict", "fake"):
            raise ValueError(f"unknown decode mode {mode!r}")
        self.mode = mode

    def _decode_fake(self, buf: bytes):
        if not buf.startswith(IMG_MAGIC):
            return 0, 0, np.zeros(N_FEATURES, dtype=np.float32)
        w, h = struct.unpack_from("<HH", buf, len(IMG_MAGIC))
        payload = np.frombuffer(buf, dtype=np.uint8, offset=len(IMG_MAGIC) + 4)
        return w, h, _payload_features(payload)

    def _decode(self, buf: bytes):
        from luzzu_ray.ops.png import PNG_SIG, decode_png

        if buf.startswith(PNG_SIG) and self.mode != "fake":
            try:
                px = decode_png(buf)
            except ValueError:
                if self.mode == "strict":
                    raise
                return 0, 0, np.zeros(N_FEATURES, dtype=np.float32)
            h, w = px.shape[:2]
            return w, h, _payload_features(px.reshape(-1))
        if self.mode == "strict":
            raise ValueError("non-PNG bytes in strict decode mode")
        if self.mode == "real":
            return 0, 0, np.zeros(N_FEATURES, dtype=np.float32)
        return self._decode_fake(buf)

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = t["image"].combine_chunks()
        ws = np.zeros(t.num_rows, dtype=np.int32)
        hs = np.zeros(t.num_rows, dtype=np.int32)
        feats = np.zeros((t.num_rows, N_FEATURES), dtype=np.float32)
        for i in range(t.num_rows):  # binary decode is inherently per-item
            v = bufs[i].as_py()
            if v is None:
                continue
            ws[i], hs[i], feats[i] = self._decode(v)
        return (
            t.append_column("width", pa.array(ws))
            .append_column("height", pa.array(hs))
            .append_column(
                "features",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), N_FEATURES
                ),
            )
        )


class AudioDecodeStage:
    """Actor-pool stage: binary audio column -> sample_rate / duration /
    loudness features.

    The WAV path is a REAL codec (``luzzu_ray.ops.wav``: RIFF chunk
    walker, PCM16, integer stereo downmix — stdlib-interop pinned in
    tests), so audio decode on genuine container bytes is no longer
    stubbed.  Modes mirror ImageDecodeStage:

    - ``auto``  — RIFF bytes decode for real, FAKEAUD via the stub,
      anything else degrades to zeros
    - ``real``  — WAV only; non-WAV bytes degrade to zeros
    - ``strict``— WAV only; non-WAV/undecodable bytes RAISE
    - ``fake``  — FAKEAUD stub only

    Input columns: (id:int64, audio:binary).  Output adds
    sample_rate:int32, duration_ms:int64, rms_q6:int64.  The WAV
    loudness is floor(sqrt(ssq/n) / 32768 * 1e6) with ssq an EXACT
    int64 sum of squares, so the value is IEEE-deterministic and a
    row-at-a-time twin reproduces it bit-for-bit.
    """

    def __init__(self, mode: str = "auto"):
        if mode not in ("auto", "real", "strict", "fake"):
            raise ValueError(f"unknown decode mode {mode!r}")
        self.mode = mode

    @staticmethod
    def _decode_wav(buf: bytes):
        import math

        from luzzu_ray.ops.wav import decode_wav

        rate, s = decode_wav(buf)
        n = len(s)
        if n == 0:
            return rate, 0, 0
        ssq = int(np.dot(s.astype(np.int64), s.astype(np.int64)))
        rms_q6 = int(math.floor(
            math.sqrt(ssq / n) / 32768.0 * 1000000.0))
        return rate, int(n * 1000 // max(rate, 1)), rms_q6

    def _decode_fake(self, buf: bytes):
        # any malformed container (bad magic, truncated header, odd
        # payload length) degrades to zeros — never kills the task
        off = len(AUD_MAGIC) + 8
        if not buf.startswith(AUD_MAGIC) or len(buf) < off:
            return 0, 0, 0
        rate, n = struct.unpack_from("<II", buf, len(AUD_MAGIC))
        even_end = off + (len(buf) - off) // 2 * 2
        payload = np.frombuffer(buf[off:even_end], dtype=np.int16)
        if len(payload) == 0:
            return rate, 0, 0
        rms = float(np.sqrt(np.mean(payload.astype(np.float64) ** 2)))
        dur_ms = int(n * 1000 // max(rate, 1))
        return rate, dur_ms, int(rms / 32768.0 * 1e6)

    def _decode(self, buf: bytes):
        if buf[:4] == b"RIFF" and self.mode != "fake":
            try:
                return self._decode_wav(buf)
            except ValueError:
                if self.mode == "strict":
                    raise
                return 0, 0, 0
        if self.mode == "strict":
            raise ValueError("non-WAV bytes in strict decode mode")
        if self.mode == "real":
            return 0, 0, 0
        return self._decode_fake(buf)

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = t["audio"].combine_chunks()
        rates = np.zeros(t.num_rows, dtype=np.int32)
        durs = np.zeros(t.num_rows, dtype=np.int64)
        rms = np.zeros(t.num_rows, dtype=np.int64)
        for i in range(t.num_rows):  # binary decode is inherently per-item
            v = bufs[i].as_py()
            if v is None:
                continue
            rates[i], durs[i], rms[i] = self._decode(v)
        return (
            t.append_column("sample_rate", pa.array(rates))
            .append_column("duration_ms", pa.array(durs))
            .append_column("rms_q6", pa.array(rms))
        )


class FrameSampleStage:
    """Actor-pool flat-map: video binary -> one row per sampled frame.

    Handles BOTH containers: VIDPNG (length-prefixed REAL PNG frames —
    sampled frames re-enter ``ImageDecodeStage``'s real codec path) and
    the FAKEVID stub; unknown bytes are skipped."""

    def __init__(self, every_k: int = 2, mode: str = "auto"):
        self.every_k = every_k
        self.img = ImageDecodeStage(mode=mode)

    def _frames_vidpng(self, buf: bytes):
        (n_frames,) = struct.unpack_from("<H", buf, len(VIDPNG_MAGIC))
        off = len(VIDPNG_MAGIC) + 2
        for f in range(n_frames):
            (rec_len,) = struct.unpack_from("<I", buf, off)
            off += 4
            yield f, buf[off: off + rec_len]
            off += rec_len

    def _frames_fake(self, buf: bytes):
        (n_frames,) = struct.unpack_from("<H", buf, len(VID_MAGIC))
        off = len(VID_MAGIC) + 2
        for f in range(n_frames):
            # FAKEIMG record: magic + 4 header bytes + min(w*h,4096) payload
            w, h = struct.unpack_from("<HH", buf, off + len(IMG_MAGIC))
            rec_len = len(IMG_MAGIC) + 4 + min(w * h, 4096)
            yield f, buf[off: off + rec_len]
            off += rec_len

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        vids = t["video"].combine_chunks()
        id_col = t["id"].to_pylist()
        for i in range(t.num_rows):
            buf = vids[i].as_py()
            if buf is None:
                continue
            if buf.startswith(VIDPNG_MAGIC):
                it = self._frames_vidpng(buf)
            elif buf.startswith(VID_MAGIC):
                it = self._frames_fake(buf)
            else:
                continue
            for f, rec in it:
                if f % self.every_k == 0:
                    ids.append(id_col[i])
                    frame_idx.append(f)
                    frames.append(rec)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "image": pa.array(frames, pa.binary()),
            }
        )


class ResizeImageStage:
    """Actor-pool stage: nearest-neighbor image resize, re-encoded.

    The resize itself is REAL for both containers: PNG bytes decode via
    the dependency-free codec (``luzzu_ray.ops.png``), resample through
    the same nearest-neighbor index grid per channel, and re-encode as
    PNG; the fake container carries the first ``min(w*h, 4096)`` pixels
    of the row-major grid, and each target pixel (x, y) samples source
    pixel ``(floor(y*h/th)*w + floor(x*w/tw))`` — vectorized index math
    per image, sources beyond the stored payload read as 0.  Modes
    mirror ImageDecodeStage: ``auto`` handles both containers,
    ``real``/``strict`` are PNG-only (strict raises on non-PNG),
    ``fake`` is FAKEIMG-only.

    Input (id:int64, image:binary) -> output with ``image`` replaced by
    the resized container plus new width/height columns.
    """

    def __init__(self, width: int, height: int, mode: str = "auto"):
        if mode not in ("auto", "real", "strict", "fake"):
            raise ValueError(f"unknown resize mode {mode!r}")
        self.mode = mode
        self.tw, self.th = int(width), int(height)
        # target index grid is identical for every image of a given
        # source size; tiny cache avoids rebuilding it per row
        self._grid_cache: dict[tuple[int, int], np.ndarray] = {}

    def _src_index(self, w: int, h: int) -> np.ndarray:
        key = (w, h)
        g = self._grid_cache.get(key)
        if g is None:
            ys = (np.arange(self.th, dtype=np.int64) * h) // self.th
            xs = (np.arange(self.tw, dtype=np.int64) * w) // self.tw
            g = (ys[:, None] * w + xs[None, :]).reshape(-1)
            self._grid_cache[key] = g
        return g

    def _resize_png(self, buf: bytes) -> tuple[bytes, int, int]:
        from luzzu_ray.ops.png import decode_png, encode_png

        try:
            px = decode_png(buf)
        except ValueError:
            if self.mode == "strict":
                raise
            return b"", 0, 0
        h, w = px.shape[:2]
        ys = (np.arange(self.th, dtype=np.int64) * h) // self.th
        xs = (np.arange(self.tw, dtype=np.int64) * w) // self.tw
        resized = px[ys][:, xs]  # (th, tw, c) nearest-neighbor
        return encode_png(resized), self.tw, self.th

    def _resize_one(self, buf: bytes) -> tuple[bytes, int, int]:
        from luzzu_ray.ops.png import PNG_SIG

        if buf.startswith(PNG_SIG) and self.mode != "fake":
            return self._resize_png(buf)
        if self.mode == "strict":
            raise ValueError("non-PNG bytes in strict resize mode")
        if self.mode == "real":
            return b"", 0, 0
        if not buf.startswith(IMG_MAGIC) or len(buf) < len(IMG_MAGIC) + 4:
            return b"", 0, 0  # junk/truncated header degrades, never raises
        w, h = struct.unpack_from("<HH", buf, len(IMG_MAGIC))
        if w == 0 or h == 0:
            return b"", 0, 0
        payload = np.frombuffer(buf, dtype=np.uint8, offset=len(IMG_MAGIC) + 4)
        idx = self._src_index(w, h)
        out = np.zeros(len(idx), dtype=np.uint8)
        valid = idx < len(payload)
        out[valid] = payload[idx[valid]]
        out = out[: 4096]  # container stores at most 4096 pixels
        rec = IMG_MAGIC + struct.pack("<HH", self.tw, self.th) + out.tobytes()
        return rec, self.tw, self.th

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = t["image"].combine_chunks()
        recs: list[bytes] = []
        ws = np.zeros(t.num_rows, dtype=np.int32)
        hs = np.zeros(t.num_rows, dtype=np.int32)
        for i in range(t.num_rows):  # binary payloads are per-item
            v = bufs[i].as_py()
            if v is None:
                recs.append(b"")
                continue
            rec, w, h = self._resize_one(v)
            recs.append(rec)
            ws[i], hs[i] = w, h
        t = t.drop_columns(["image"])
        return (
            t.append_column("image", pa.array(recs, pa.binary()))
            .append_column("width", pa.array(ws))
            .append_column("height", pa.array(hs))
        )


def resize_images(
    ds: ray.data.Dataset, width: int, height: int, mode: str = "auto",
    batch_size: int = 256, concurrency=(1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        ResizeImageStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"width": width, "height": height, "mode": mode},
    )


def decode_images(
    ds: ray.data.Dataset, mode: str = "auto", batch_size: int = 256,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"mode": mode},
    )


def decode_audio(
    ds: ray.data.Dataset, mode: str = "auto", batch_size: int = 256,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        AudioDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"mode": mode},
    )


def sample_frames(
    ds: ray.data.Dataset, every_k: int = 2, mode: str = "auto",
    batch_size: int = 64, concurrency=(1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampleStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"every_k": every_k, "mode": mode},
    )


class ResampleAudioStage:
    """Actor-pool stage: REAL WAV resampling to a target rate.

    Decodes via the dependency-free RIFF/PCM16 codec, resamples with
    EXACT fixed-point linear interpolation (``wav.resample_linear_q``:
    int64 rational positions, bit-reproducible by any twin), and
    re-encodes as WAV.  Modes mirror the decode stage: ``strict``
    raises on non-WAV bytes, otherwise they pass through as empty.

    Input (id:int64, audio:binary) -> ``audio`` replaced by the
    resampled container, plus sample_rate:int32 (the new rate).
    """

    def __init__(self, target_rate: int, mode: str = "auto"):
        if mode not in ("auto", "real", "strict"):
            raise ValueError(f"unknown resample mode {mode!r}")
        self.mode = mode
        self.rate = int(target_rate)

    def _one(self, buf: bytes) -> bytes:
        from luzzu_ray.ops.wav import (
            decode_wav, encode_wav, resample_linear_q,
        )

        if buf[:4] != b"RIFF":
            if self.mode == "strict":
                raise ValueError("non-WAV bytes in strict resample mode")
            return b""
        try:
            src_rate, s = decode_wav(buf)
        except ValueError:
            if self.mode == "strict":
                raise
            return b""
        return encode_wav(
            resample_linear_q(s, src_rate, self.rate), self.rate
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        bufs = t["audio"].combine_chunks()
        out = []
        for i in range(t.num_rows):  # binary decode is inherently per-item
            v = bufs[i].as_py()
            out.append(self._one(v) if v is not None else b"")
        cols = {c: t[c] for c in t.column_names if c != "audio"}
        cols["audio"] = pa.array(out, pa.binary())
        cols["sample_rate"] = pa.array(
            np.full(t.num_rows, self.rate, dtype=np.int32))
        return pa.table(cols)


def resample_audio(
    ds: ray.data.Dataset, target_rate: int, mode: str = "auto",
    batch_size: int = 256, concurrency=(1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        ResampleAudioStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"target_rate": target_rate, "mode": mode},
    )


# ---------------------------------------------------------------------------
# perceptual-hash (aHash) image dedup
# ---------------------------------------------------------------------------

AHASH_GRID = 8


def ahash_from_pixels(px: np.ndarray, grid: int = AHASH_GRID) -> np.uint64:
    """64-bit average hash of an (H, W, 3) uint8 pixel grid — the
    classic near-duplicate image fingerprint: integer BT.601 luma
    (299R + 587G + 114B, kept UNDIVIDED), exact grid x grid tile sums,
    bit i set iff tile i's mean luma exceeds the global mean, compared
    as the exact cross-product ``tile_sum * n_tiles > total_sum`` so
    no division ever happens.  All arithmetic is int64 (well under
    2^63 for any real image) and shared verbatim by the engine stage
    and the committed-fixture scalar twin.  Dims are cropped to the
    largest grid multiple."""
    h, w = px.shape[:2]
    th, tw = h // grid, w // grid
    if th == 0 or tw == 0:
        return np.uint64(0)
    px = px[: th * grid, : tw * grid]
    p = px.astype(np.int64)
    y = 299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]
    tiles = y.reshape(grid, th, grid, tw).sum(axis=(1, 3)).reshape(-1)
    total = int(y.sum())
    bits = tiles * (grid * grid) > total
    hval = np.uint64(0)
    for i in np.flatnonzero(bits):
        hval |= np.uint64(1) << np.uint64(i)
    return hval


class ImageAHashStage:
    """Actor-pool stage: (id, image:binary PNG) -> (id, ahash:int64).

    Real PNG decode per item (binary decode is inherently per-item;
    the hash kernel itself is vectorized over pixels), undecodable
    bytes degrade to hash 0 in 'real' mode / raise in 'strict'."""

    def __init__(self, mode: str = "real"):
        if mode not in ("real", "strict"):
            raise ValueError(f"unknown ahash mode {mode!r}")
        self.mode = mode

    def __call__(self, t: pa.Table) -> pa.Table:
        from luzzu_ray.ops.png import PNG_SIG, decode_png

        bufs = t["image"].combine_chunks()
        out = np.zeros(t.num_rows, dtype=np.uint64)
        for i in range(t.num_rows):
            v = bufs[i].as_py()
            if v is None or not v.startswith(PNG_SIG):
                if self.mode == "strict":
                    raise ValueError("non-PNG bytes in strict ahash mode")
                continue
            try:
                px = decode_png(v)
            except ValueError:
                if self.mode == "strict":
                    raise
                continue
            if px.ndim == 2:  # grayscale -> replicate channels
                px = np.repeat(px[:, :, None], 3, axis=2)
            out[i] = ahash_from_pixels(px[:, :, :3])
        return pa.table(
            {"id": t["id"], "ahash": pa.array(out.view(np.int64))}
        )


def image_ahash(
    ds: "ray.data.Dataset", mode: str = "real", batch_size: int = 128,
) -> "ray.data.Dataset":
    """Perceptual hashes for a binary-PNG column: one actor-pool pass,
    no exchange; compose with a hash-keyed group for exact-aHash dedup
    or with the simhash banding machinery for hamming-tolerant
    candidate pairs."""
    from luzzu_ray.ops.common import pool

    return ds.map_batches(
        ImageAHashStage, fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow", batch_size=batch_size, concurrency=pool(),
    )


AFP_WINDOWS = 64


def afp_from_samples(s: np.ndarray, windows: int = AFP_WINDOWS) -> np.uint64:
    """64-bit audio energy fingerprint: the aHash idea transplanted to
    PCM — `windows` equal sample windows (crop remainder), window
    energy = sum |sample| in int64, bit i set iff window i's mean
    energy exceeds the clip mean via the exact cross-product
    ``win_sum * n_windows > total`` (no division).  Shared verbatim by
    the engine stage and the committed-fixture scalar twin."""
    n = len(s) // windows
    if n == 0:
        return np.uint64(0)
    e = np.abs(s[: n * windows].astype(np.int64)).reshape(
        windows, n).sum(axis=1)
    total = int(e.sum())
    bits = e * windows > total
    hval = np.uint64(0)
    for i in np.flatnonzero(bits):
        hval |= np.uint64(1) << np.uint64(i)
    return hval


class AudioFingerprintStage:
    """Actor-pool stage: (id, audio:binary WAV) -> (id, afp:int64);
    undecodable bytes degrade to 0 in 'real' mode / raise in 'strict'."""

    def __init__(self, mode: str = "real"):
        if mode not in ("real", "strict"):
            raise ValueError(f"unknown afp mode {mode!r}")
        self.mode = mode

    def __call__(self, t: pa.Table) -> pa.Table:
        from luzzu_ray.ops.wav import decode_wav

        bufs = t["audio"].combine_chunks()
        out = np.zeros(t.num_rows, dtype=np.uint64)
        for i in range(t.num_rows):
            v = bufs[i].as_py()
            if v is None:
                continue
            try:
                _rate, s = decode_wav(v)
            except ValueError:
                if self.mode == "strict":
                    raise
                continue
            out[i] = afp_from_samples(s)
        return pa.table(
            {"id": t["id"], "afp": pa.array(out.view(np.int64))}
        )


def audio_fingerprint(
    ds: "ray.data.Dataset", mode: str = "real", batch_size: int = 128,
) -> "ray.data.Dataset":
    """Energy fingerprints for a binary-WAV column — one actor-pool
    pass, no exchange; compose with signature_neardup_pairs for
    hamming-tolerant audio near-dup candidates."""
    from luzzu_ray.ops.common import pool

    return ds.map_batches(
        AudioFingerprintStage, fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow", batch_size=batch_size, concurrency=pool(),
    )


VFP_POLY = np.uint64(1099511628211)  # FNV-64 prime: frame-order combine


class VideoFingerprintStage:
    """Actor-pool stage: (id, video:binary VIDPNG) -> (id, vfp:int64).

    Per-video 64-bit fingerprint = Horner polynomial (mod 2^64, FNV-64
    prime) over the aHashes of every SAMPLED frame, in frame order —
    frame-order-sensitive by design (a reversed clip is a different
    video).  Sampling stride mirrors FrameSampleStage so the decode
    cost is 1/every_k of the frame count."""

    def __init__(self, every_k: int = 2, mode: str = "real"):
        self.every_k = every_k
        self.sampler = FrameSampleStage(every_k=every_k, mode=mode)
        self.mode = mode

    def __call__(self, t: pa.Table) -> pa.Table:
        from luzzu_ray.ops.png import PNG_SIG, decode_png

        vids = t["video"].combine_chunks()
        out = np.zeros(t.num_rows, dtype=np.uint64)
        for i in range(t.num_rows):
            buf = vids[i].as_py()
            if buf is None or not buf.startswith(VIDPNG_MAGIC):
                if self.mode == "strict":
                    raise ValueError("non-VIDPNG bytes in strict mode")
                continue
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for f, rec in self.sampler._frames_vidpng(buf):
                    if f % self.every_k:
                        continue
                    if not rec.startswith(PNG_SIG):
                        if self.mode == "strict":
                            raise ValueError("non-PNG frame in strict mode")
                        continue
                    px = decode_png(rec)
                    if px.ndim == 2:
                        px = np.repeat(px[:, :, None], 3, axis=2)
                    fh = ahash_from_pixels(px[:, :, :3])
                    h = h * VFP_POLY + fh
            out[i] = h
        return pa.table(
            {"id": t["id"], "vfp": pa.array(out.view(np.int64))}
        )


def video_fingerprint(
    ds: "ray.data.Dataset", every_k: int = 2, mode: str = "real",
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Frame-order-sensitive video fingerprints for a VIDPNG column."""
    from luzzu_ray.ops.common import pool

    return ds.map_batches(
        VideoFingerprintStage,
        fn_constructor_kwargs={"every_k": every_k, "mode": mode},
        batch_format="pyarrow", batch_size=batch_size, concurrency=pool(),
    )


def vfp_from_frame_pixels(frames: list, every_k: int = 2) -> np.uint64:
    """Scalar twin of VideoFingerprintStage over raw frame pixel
    arrays (generator side — never the codec)."""
    h = np.uint64(0)
    with np.errstate(over="ignore"):
        for f, px in enumerate(frames):
            if f % every_k:
                continue
            h = h * VFP_POLY + ahash_from_pixels(px)
    return h
