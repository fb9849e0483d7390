"""Stdlib PNG/WAV codecs (functions/codecs.py): golden fixtures + filter
inverses + round-trips — the real multimodal decode path's foundation."""

import os
import struct
import zlib

import numpy as np
import pytest

from mel_spark.functions.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _golden_pixels():
    px = np.zeros((8, 8, 3), np.uint8)
    for y in range(8):
        for x in range(8):
            px[y, x] = ((y * 8 + x) * 3 % 256, (y * 31 + x * 7) % 256,
                        (255 - y * x) % 256)
    return px


def test_golden_png_decodes_to_known_pixels():
    """The checked-in fixture bytes are FROZEN: decode must reproduce the
    formula-defined pixel array regardless of how the encoder evolves."""
    data = open(os.path.join(FIX, "golden_rgb_8x8.png"), "rb").read()
    assert np.array_equal(decode_png(data), _golden_pixels())


def test_golden_wav_decodes_to_known_tone():
    data = open(os.path.join(FIX, "golden_tone_440.wav"), "rb").read()
    samples, rate = decode_wav(data)
    assert rate == 8000 and samples.shape == (800, 1)
    t = np.arange(800) / 8000.0
    want = 0.5 * np.sin(2 * np.pi * 440 * t)
    assert np.abs(samples[:, 0] - want).max() < 1.0 / 32000  # 16-bit quantum


@pytest.mark.parametrize("shape", [(1, 1, 1), (5, 3, 2), (7, 4, 3), (6, 6, 4)])
def test_png_roundtrip_all_channel_counts(shape):
    rng = np.random.default_rng(sum(shape))
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@pytest.mark.parametrize("filt", [1, 2, 3, 4])
def test_png_defilters_every_filter_type(filt):
    """Apply PNG filter ``filt`` FORWARD in the test (per the spec's
    definitions, independent code), then the decoder's inverse must recover
    the exact pixels — our encoder only emits filter 0, so this is the only
    coverage of Sub/Up/Average/Paeth streams from other encoders."""
    rng = np.random.default_rng(filt)
    h, w, ch = 6, 5, 3
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    stride = w * ch
    flat = px.reshape(h, stride).astype(int)
    raw = b""
    for y in range(h):
        line = bytearray()
        for x in range(stride):
            cur = flat[y][x]
            a = flat[y][x - ch] if x >= ch else 0
            b = flat[y - 1][x] if y >= 1 else 0
            c = flat[y - 1][x - ch] if (y >= 1 and x >= ch) else 0
            if filt == 1:
                pred = a
            elif filt == 2:
                pred = b
            elif filt == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line.append((cur - pred) & 0xFF)
        raw += bytes([filt]) + bytes(line)

    def chunk(ctype, payload):
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px)


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(9)
    s = (rng.standard_normal((500, 2)) * 0.4).astype(np.float32)
    out, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and out.shape == (500, 2)
    assert np.abs(out - np.clip(s, -1, 1)).max() < 1.0 / 16000


def test_unsupported_inputs_raise_clearly():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")
    # interlaced flag set → named rejection, not silent garbage
    px = _golden_pixels()
    data = bytearray(encode_png(px))
    # IHDR payload starts at offset 16; interlace byte is its 13th byte
    data[16 + 12] = 1
    # CRC now wrong too, but IHDR is parsed before any CRC concern
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bytes(data))
