"""PNG codec tests: roundtrip across every filter type and channel
count, interop with an externally-produced PNG, and error scope."""

from __future__ import annotations

import base64

import numpy as np
import pytest

from luzzu_ray.ops.png import PNG_SIG, decode_png, encode_png

# widely-published minimal externally-encoded PNG (1x1 RGBA)
_EXTERNAL_1x1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQ"
    "DwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def test_roundtrip_all_filters_all_channels():
    rng = np.random.default_rng(7)
    for trial in range(10):
        h, w = rng.integers(1, 40, 2)
        for c in (1, 2, 3, 4):
            px = rng.integers(0, 256, (int(h), int(w), c), dtype=np.uint8)
            for ft in (0, 1, 2, 3, 4, "mixed"):
                out = decode_png(encode_png(px, filter_type=ft))
                assert np.array_equal(out, px), (trial, c, ft)


def test_gray_2d_input_roundtrip():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (10, 13), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, "mixed"))[:, :, 0], px)


def test_decodes_external_png():
    px = decode_png(_EXTERNAL_1x1)
    assert px.shape == (1, 1, 4)
    assert px.reshape(-1).tolist() == [255, 0, 0, 127]


def test_error_scope():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        decode_png(PNG_SIG)  # no chunks
    # truncated IDAT -> zlib/scanline error surfaces as an exception
    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(Exception):
        decode_png(good[: len(good) // 2])
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 5), np.uint8))  # 5 channels
