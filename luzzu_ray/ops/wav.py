"""Dependency-free WAV (RIFF / PCM) codec — the audio analogue of the
stdlib PNG path (``luzzu_ray.ops.png``): makes the audio family REAL
end-to-end without soundfile/torchaudio (absent in this container).

Scope: canonical RIFF/WAVE files, PCM integer 16-bit, mono or
multi-channel (decoded to mono by exact integer averaging).  The
chunk walker skips unknown chunks (LIST/fact/cue) per the RIFF spec,
so externally produced PCM16 files parse.  Anything else (float PCM,
compressed codecs, truncated chunks) raises ``ValueError`` — callers
in the decode stages degrade malformed payloads to zeros instead of
killing the task.

Luzzu analogue: syntactic-validity + accessibility metric processors
over opaque payloads (/root/reference/README.md:7).
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"
_FMT = b"fmt "
_DATA = b"data"
WAV_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono sample array -> canonical 44-byte-header WAV bytes."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    payload = s.tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack(
        "<HHIIHH", WAV_PCM, 1, sample_rate, byte_rate, 2, 16
    )
    body = (
        _WAVE
        + _FMT + struct.pack("<I", len(fmt)) + fmt
        + _DATA + struct.pack("<I", len(payload)) + payload
    )
    return _RIFF + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 mono samples).

    Multi-channel input is downmixed by exact integer mean (floor
    toward -inf via numpy int32 floor division) so the result is
    deterministic and reproducible by a row-at-a-time twin.
    """
    if len(buf) < 12 or buf[:4] != _RIFF or buf[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    n_channels = sample_rate = bits = None
    audio_format = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated chunk")
        if cid == _FMT:
            if clen < 16:
                raise ValueError("short fmt chunk")
            audio_format, n_channels, sample_rate, _br, _ba, bits = (
                struct.unpack_from("<HHIIHH", body)
            )
        elif cid == _DATA:
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if audio_format is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if audio_format != WAV_PCM or bits != 16 or n_channels < 1:
        raise ValueError(
            f"unsupported wav: format={audio_format} bits={bits} "
            f"channels={n_channels}"
        )
    if not 0 < sample_rate <= 2**31 - 1:
        # rate 0 would divide-by-zero downstream (duration, resample);
        # > int31 would wrap the int32 sample_rate output column
        raise ValueError(f"invalid wav sample rate {sample_rate}")
    usable = len(data) // (2 * n_channels) * (2 * n_channels)
    s = np.frombuffer(data[:usable], dtype="<i2")
    if n_channels > 1:
        s = (
            s.reshape(-1, n_channels).astype(np.int32).sum(axis=1)
            // n_channels
        ).astype(np.int16)
    return int(sample_rate), s


def resample_linear_q(samples: np.ndarray, src_rate: int,
                      dst_rate: int) -> np.ndarray:
    """Exact fixed-point linear resampling to ``dst_rate``.

    Output position i maps to source time i * src/dst; the sample is
    the integer-rounded linear interpolation computed entirely in
    int64 (position and fraction as exact rationals over dst_rate), so
    any two implementations agree bit-for-bit.  Fully vectorized.
    """
    n = len(samples)
    if n == 0 or src_rate == dst_rate:
        return samples.astype(np.int16, copy=False)
    m = max(1, (n * dst_rate) // src_rate)
    i = np.arange(m, dtype=np.int64)
    num = i * src_rate          # source position as a rational num/dst
    idx = num // dst_rate
    frac_num = num - idx * dst_rate          # in [0, dst_rate)
    idx = np.minimum(idx, n - 1)
    nxt = np.minimum(idx + 1, n - 1)
    a = samples.astype(np.int64)[idx]
    b = samples.astype(np.int64)[nxt]
    # floor of a + (b-a) * frac  — exact integer arithmetic
    out = a + ((b - a) * frac_num) // dst_rate
    return out.astype(np.int16)
