"""Multimodal plumbing tests (decode stubbed; Ray-side flow real)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _image_table(n=6):
    from luzzu_ray.ops.multimodal import encode_fake_image

    return pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "image": pa.array(
                [encode_fake_image(4 + i, 3 + i, seed=i) for i in range(n)],
                pa.binary(),
            ),
        }
    )


def test_image_decode_pipeline(ray_session):
    import ray.data

    from luzzu_ray.ops.multimodal import N_FEATURES, decode_images

    out = decode_images(ray.data.from_arrow(_image_table()), mode="fake").take_all()
    assert len(out) == 6
    for i, r in enumerate(sorted(out, key=lambda r: r["id"])):
        assert (r["width"], r["height"]) == (4 + i, 3 + i)
        assert len(r["features"]) == N_FEATURES
        assert all(0.0 <= f < 1.0 for f in r["features"])


def test_image_decode_deterministic(ray_session):
    import ray.data

    from luzzu_ray.ops.multimodal import decode_images

    a = decode_images(ray.data.from_arrow(_image_table()), mode="fake").take_all()
    b = decode_images(ray.data.from_arrow(_image_table()), mode="fake").take_all()
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_strict_mode_raises_on_non_png():
    """strict mode now means "real PNG bytes or die": construction is
    fine (the PNG codec IS available), non-PNG bytes raise at decode."""
    from luzzu_ray.ops.multimodal import ImageDecodeStage, encode_fake_image

    stage = ImageDecodeStage(mode="strict")
    with pytest.raises(ValueError):
        stage._decode(encode_fake_image(4, 3, seed=1))
    with pytest.raises(ValueError):
        ImageDecodeStage(mode="bogus")


def test_png_decode_stage_real_bytes(ray_session):
    """The image decode stage decodes REAL PNG containers (stdlib-zlib
    codec): width/height from IHDR, features from the decoded pixels —
    verified against an in-process scalar twin."""
    import ray.data

    from luzzu_ray.ops.multimodal import (
        N_FEATURES, _payload_features, decode_images,
    )
    from luzzu_ray.ops.png import encode_png

    rng = np.random.default_rng(17)
    pixels = [rng.integers(0, 256, (12 + i, 20 + i, 3), dtype=np.uint8)
              for i in range(4)]
    t = pa.table(
        {"id": pa.array(range(4), pa.int64()),
         "image": pa.array([encode_png(p, filter_type="mixed") for p in pixels]
                           + [],
                           pa.binary())}
    )
    out = {r["id"]: r for r in
           decode_images(ray.data.from_arrow(t), mode="real").take_all()}
    for i, p in enumerate(pixels):
        r = out[i]
        assert (r["width"], r["height"]) == (p.shape[1], p.shape[0])
        want = _payload_features(p.reshape(-1))
        assert np.allclose(r["features"], want, atol=0), i
        assert len(r["features"]) == N_FEATURES


def test_png_resize_stage_real_bytes(ray_session):
    """PNG resize: decode -> nearest-neighbor grid -> re-encode; the
    output is a valid PNG whose pixels equal the scalar resample."""
    import ray.data

    from luzzu_ray.ops.multimodal import resize_images
    from luzzu_ray.ops.png import decode_png, encode_png

    rng = np.random.default_rng(18)
    px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    t = pa.table(
        {"id": pa.array([0], pa.int64()),
         "image": pa.array([encode_png(px)], pa.binary())}
    )
    out = resize_images(ray.data.from_arrow(t), 6, 4, mode="real").take_all()[0]
    assert (out["width"], out["height"]) == (6, 4)
    got = decode_png(out["image"])
    ys = (np.arange(4) * 16) // 4
    xs = (np.arange(6) * 24) // 6
    assert np.array_equal(got, px[ys][:, xs])


def test_frame_sampling(ray_session):
    import ray.data

    from luzzu_ray.ops.multimodal import (
        decode_images,
        encode_fake_video,
        sample_frames,
    )

    t = pa.table(
        {
            "id": pa.array([7, 8], pa.int64()),
            "video": pa.array(
                [encode_fake_video(5, 4, 4, seed=1),
                 encode_fake_video(3, 2, 2, seed=2)],
                pa.binary(),
            ),
        }
    )
    frames = sample_frames(ray.data.from_arrow(t), every_k=2, mode="fake")
    decoded = decode_images(frames, mode="fake").take_all()
    got = {(r["id"], r["frame_idx"]): (r["width"], r["height"]) for r in decoded}
    # video 7: frames 0,2,4 of 5; video 8: frames 0,2 of 3
    assert set(got) == {(7, 0), (7, 2), (7, 4), (8, 0), (8, 2)}
    assert got[(7, 0)] == (4, 4) and got[(8, 2)] == (2, 2)


def test_png_video_frame_sampling(ray_session):
    """VIDPNG container: every-k-th REAL PNG frame sampled out and
    decoded bit-exactly back to the source pixels."""
    import ray.data

    from luzzu_ray.ops.multimodal import (
        decode_images, encode_png_video, sample_frames,
    )
    from luzzu_ray.ops.png import decode_png

    rng = np.random.default_rng(23)
    frames = [rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
              for _ in range(5)]
    t = pa.table(
        {"id": pa.array([42], pa.int64()),
         "video": pa.array([encode_png_video(frames)], pa.binary())}
    )
    sampled = sample_frames(ray.data.from_arrow(t), every_k=2)
    rows = {r["frame_idx"]: r["image"] for r in sampled.take_all()}
    assert set(rows) == {0, 2, 4}
    for f, buf in rows.items():
        assert np.array_equal(decode_png(buf), frames[f])
    decoded = decode_images(sample_frames(ray.data.from_arrow(t), every_k=2),
                            mode="real").take_all()
    assert all((r["width"], r["height"]) == (8, 6) for r in decoded)


def test_audio_decode_stage(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from luzzu_ray.ops.multimodal import (
        AudioDecodeStage, decode_audio, encode_fake_audio,
    )

    rows = [encode_fake_audio(16000, 32000, seed=i) for i in range(5)]
    rows.append(b"not-audio")
    t = pa.table(
        {"id": pa.array(range(6), pa.int64()),
         "audio": pa.array(rows, pa.binary())}
    )
    got = {r["id"]: (r["sample_rate"], r["duration_ms"], r["rms_q6"])
           for r in decode_audio(ray.data.from_arrow(t)).take_all()}
    assert got[5] == (0, 0, 0)  # junk container -> zeros, no crash
    for i in range(5):
        rate, dur, rms = got[i]
        assert rate == 16000 and dur == 2000
        assert 400_000 < rms < 700_000  # uniform int16 RMS ~ 0.577 fullscale
    # scalar twin parity
    stage = AudioDecodeStage(mode="fake")
    for i in range(5):
        assert stage._decode_fake(rows[i]) == got[i]
    # strict mode is WAV-only now: non-WAV bytes raise at decode time
    strict = AudioDecodeStage(mode="strict")
    with pytest.raises(ValueError):
        strict._decode(rows[0])


def test_audio_decode_malformed_containers(ray_session):
    """Truncated headers and odd-length payloads degrade to zeros."""
    import pyarrow as pa

    from luzzu_ray.ops.multimodal import AUD_MAGIC, AudioDecodeStage

    stage = AudioDecodeStage(mode="fake")
    assert stage._decode_fake(AUD_MAGIC) == (0, 0, 0)           # no header
    assert stage._decode_fake(AUD_MAGIC + b"\x01\x02") == (0, 0, 0)
    import struct

    odd = AUD_MAGIC + struct.pack("<II", 8000, 3) + b"\x01\x02\x03"
    rate, dur, rms = stage._decode_fake(odd)  # odd tail trimmed, no crash
    assert rate == 8000 and rms >= 0


def test_resize_images(ray_session):
    """Nearest-neighbor resize: identity at same dims, scalar-twin parity
    at new dims, and a resized container round-trips through decode."""
    import struct

    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.multimodal import (
        IMG_MAGIC,
        ImageDecodeStage,
        ResizeImageStage,
        encode_fake_image,
        resize_images,
    )

    rows = [encode_fake_image(32, 16, seed=i) for i in range(4)]
    t = pa.table(
        {"id": pa.array(range(4), pa.int64()),
         "image": pa.array(rows, pa.binary())}
    )
    # identity: 32x16 -> 32x16 (payload fits fully: 512 <= 4096)
    same = ResizeImageStage(32, 16, mode="fake")(t)
    for i in range(4):
        assert same["image"][i].as_py() == rows[i]

    # real resize via the Dataset path
    out = {r["id"]: r for r in
           resize_images(ray.data.from_arrow(t), 8, 4).take_all()}
    stage = ResizeImageStage(8, 4, mode="fake")
    for i in range(4):
        rec, w, h = stage._resize_one(rows[i])
        assert out[i]["image"] == rec and (w, h) == (8, 4)
        # scalar twin: target (x,y) samples source floor(y*16/4)*32 + floor(x*32/8)
        src = np.frombuffer(rows[i], np.uint8, offset=len(IMG_MAGIC) + 4)
        want = bytes(
            src[(y * 16 // 4) * 32 + (x * 32 // 8)]
            for y in range(4) for x in range(8)
        )
        assert rec == IMG_MAGIC + struct.pack("<HH", 8, 4) + want
        # resized record decodes like any image
        dw, dh, _ = ImageDecodeStage(mode="fake")._decode_fake(rec)
        assert (dw, dh) == (8, 4)

    # junk / null tolerated
    bad = pa.table(
        {"id": pa.array([9], pa.int64()),
         "image": pa.array([b"junk"], pa.binary())}
    )
    r = ResizeImageStage(8, 4, mode="fake")(bad)
    assert r["width"][0].as_py() == 0 and r["image"][0].as_py() == b""
    # truncated header (magic matches, header incomplete) degrades too
    stage = ResizeImageStage(8, 4, mode="fake")
    assert stage._resize_one(IMG_MAGIC + b"\x01\x02") == (b"", 0, 0)
    # strict refuses non-PNG bytes at resize time, mirroring decode
    with pytest.raises(ValueError):
        ResizeImageStage(8, 4, mode="strict")._resize_one(rows[0])


def test_wav_codec_roundtrip_and_stdlib_interop():
    """Encode->decode identity, interop BOTH directions with the stdlib
    wave module, stereo integer downmix, malformed rejection."""
    import io
    import wave

    import numpy as np
    import pytest

    from luzzu_ray.ops.wav import decode_wav, encode_wav, resample_linear_q

    rng = np.random.default_rng(3)
    s = rng.integers(-2**15, 2**15, 1000).astype(np.int16)
    buf = encode_wav(s, 16000)
    rate, s2 = decode_wav(buf)
    assert rate == 16000 and np.array_equal(s, s2)
    w = wave.open(io.BytesIO(buf))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (16000, 1, 2)
    assert np.array_equal(np.frombuffer(w.readframes(1000), dtype="<i2"), s)
    bio = io.BytesIO()
    ww = wave.open(bio, "wb")
    ww.setnchannels(2)
    ww.setsampwidth(2)
    ww.setframerate(8000)
    st = rng.integers(-2**15, 2**15, (300, 2)).astype(np.int16)
    ww.writeframes(st.tobytes())
    ww.close()
    r2, mono = decode_wav(bio.getvalue())
    want = (st.astype(np.int32).sum(axis=1) // 2).astype(np.int16)
    assert r2 == 8000 and np.array_equal(mono, want)
    for bad in (b"", b"RIFFxxxx", buf[:20]):
        with pytest.raises(ValueError):
            decode_wav(bad)
    # fixed-point resample: scalar twin agreement on a few positions
    rs = resample_linear_q(s, 16000, 8000)
    assert len(rs) == 500
    for i in (0, 7, 499):
        num = i * 16000
        idx = num // 8000
        fn = num - idx * 8000
        idx = min(idx, len(s) - 1)
        nxt = min(idx + 1, len(s) - 1)
        a, b = int(s[idx]), int(s[nxt])
        assert int(rs[i]) == a + ((b - a) * fn) // 8000


def test_audio_decode_real_wav_and_resample(ray_session):
    """Real WAV corpus through the decode actor pool; resample chain
    re-enters the real decode path; deterministic integer rms."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from luzzu_ray.ops.multimodal import decode_audio, resample_audio
    from luzzu_ray.ops.wav import encode_wav

    rng = np.random.default_rng(9)
    rows, want = [], {}
    for i in range(6):
        rate = (8000, 16000, 22050)[i % 3]
        n = 400 + i * 150
        s = rng.integers(-2**15, 2**15, n).astype(np.int16)
        rows.append(encode_wav(s, rate))
        ssq = int((s.astype(np.int64) ** 2).sum())
        want[i] = (rate, n * 1000 // rate,
                   int(math.floor(math.sqrt(ssq / n) / 32768.0 * 1e6)))
    t = pa.table({"id": pa.array(range(6), pa.int64()),
                  "audio": pa.array(rows, pa.binary())})
    got = {r["id"]: (r["sample_rate"], r["duration_ms"], r["rms_q6"])
           for r in decode_audio(
               ray.data.from_arrow(t), mode="real").take_all()}
    assert got == want
    # resample to 8k, decode again for real: new rate everywhere,
    # duration preserved within rounding
    res = resample_audio(ray.data.from_arrow(t), 8000, mode="real")
    out = {r["id"]: (r["sample_rate"], r["duration_ms"])
           for r in decode_audio(
               res.select_columns(["id", "audio"]), mode="real").take_all()}
    for i in range(6):
        assert out[i][0] == 8000
        assert abs(out[i][1] - want[i][1]) <= 2


def test_wav_rejects_zero_sample_rate():
    """A parseable WAV advertising rate 0 raises ValueError (it would
    divide-by-zero in duration/resample), and non-strict stages degrade
    instead of dying."""
    import struct

    import numpy as np
    import pytest

    from luzzu_ray.ops.multimodal import AudioDecodeStage, ResampleAudioStage
    from luzzu_ray.ops.wav import decode_wav, encode_wav

    buf = bytearray(encode_wav(np.zeros(10, dtype=np.int16), 8000))
    # sample_rate field sits at offset 12(riff)+8(fmt hdr)+4
    struct.pack_into("<I", buf, 24, 0)
    bad = bytes(buf)
    with pytest.raises(ValueError):
        decode_wav(bad)
    assert AudioDecodeStage(mode="real")._decode(bad) == (0, 0, 0)
    assert ResampleAudioStage(8000, mode="real")._one(bad) == b""


def test_image_ahash_codec_path_matches_pixel_kernel(ray_session):
    """aHash through the REAL PNG encode->decode round trip equals the
    hash of the raw generator pixels (the codec is lossless), tile
    ties behave deterministically, and the keep flag marks exactly the
    lowest id per hash group."""
    import ray.data

    from luzzu_ray.ops.multimodal import ahash_from_pixels, image_ahash
    from luzzu_ray.ops.png import encode_png

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    variants = []
    for k in range(6):
        px = base.copy()
        px[k, k, 0] = np.uint8(min(255, int(px[k, k, 0]) + 1))
        variants.append(px)
    want = [int(np.uint64(ahash_from_pixels(p)).view(np.int64))
            for p in [base] + variants]
    t = pa.table({
        "id": pa.array(range(len(want)), pa.int64()),
        "image": pa.array(
            [encode_png(p, filter_type="mixed") for p in [base] + variants],
            pa.binary()),
    })
    got = image_ahash(
        ray.data.from_arrow(t).repartition(3), mode="real"
    ).to_pandas().sort_values("id")
    assert list(got["ahash"]) == want
    # a +-1 single-pixel nudge keeps the hash equal off exact ties
    assert len(set(want)) <= 2
