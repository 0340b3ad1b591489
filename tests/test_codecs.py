"""Unit contracts for the stdlib container codecs: golden bytes for
BMP (spec layout, not just self-inversion), cross-implementation WAV
round trip (stdlib wave writes, our struct walker reads), and the
malformed-input rejections a real reader needs."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from lenses_topology_example_spark.functions.codecs import (
    BMP_HEADER_SIZE,
    bmp_row_size,
    make_bmp,
    make_wav,
    parse_bmp,
    parse_wav,
)


def test_bmp_golden_bytes_2x1():
    """Hand-computed spec layout for a 2x1 24-bit BMP: row = 8 bytes
    (6 pixel + 2 pad), file = 54 + 8."""
    b = make_bmp(2, 1, b"\xaa")
    assert len(b) == 62
    assert b[:2] == b"BM"
    assert struct.unpack("<I", b[2:6])[0] == 62          # bfSize
    assert struct.unpack("<I", b[10:14])[0] == 54        # bfOffBits
    assert struct.unpack("<I", b[14:18])[0] == 40        # biSize
    assert struct.unpack("<ii", b[18:26]) == (2, 1)      # dims
    assert struct.unpack("<H", b[28:30])[0] == 24        # bpp
    assert struct.unpack("<I", b[30:34])[0] == 0         # BI_RGB
    assert struct.unpack("<I", b[34:38])[0] == 8         # biSizeImage
    assert b[54:] == b"\xaa" * 8
    assert parse_bmp(b) == (2, 1, 24)


def test_bmp_row_padding_cases():
    # widths 1..8: rows pad to 4-byte boundaries
    assert [bmp_row_size(w) for w in range(1, 9)] == [
        4, 8, 12, 12, 16, 20, 24, 24
    ]
    for w, h in ((1, 1), (3, 7), (16, 16), (255, 2)):
        b = make_bmp(w, h, b"xyz")
        assert parse_bmp(b) == (w, h, 24)
        assert len(b) == BMP_HEADER_SIZE + bmp_row_size(w) * h


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError, match="magic"):
        parse_bmp(b"PNG" + b"\x00" * 60)
    with pytest.raises(ValueError, match="truncated"):
        parse_bmp(b"BM\x00")
    good = make_bmp(2, 2)
    with pytest.raises(ValueError, match="size field"):
        parse_bmp(good + b"\x00")  # trailing garbage changes length


def test_wav_cross_implementation_roundtrip():
    """stdlib wave is the WRITER; our struct chunk walker is the
    READER. Then invert the roles: our make_wav output must be readable
    by stdlib wave with identical parameters."""
    for n_frames, rate in ((1, 8000), (100, 8000), (977, 44100)):
        payload = make_wav(n_frames, rate, b"qrs")
        assert parse_wav(payload) == (1, 2, rate, n_frames)
        with wave.open(io.BytesIO(payload), "rb") as r:
            assert r.getnchannels() == 1
            assert r.getsampwidth() == 2
            assert r.getframerate() == rate
            assert r.getnframes() == n_frames


def test_wav_parser_skips_unknown_chunks_and_odd_padding():
    """A real reader must skip LIST/fact/odd-length chunks. Build a
    RIFF file by hand with an odd-length junk chunk (padded to even per
    spec) BEFORE fmt/data."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = b"\x01\x02" * 5
    junk = b"J"  # odd length -> 1 pad byte
    chunks = (
        struct.pack("<4sI", b"junk", len(junk)) + junk + b"\x00"
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    assert parse_wav(payload) == (1, 2, 8000, 5)


def test_wav_rejects_malformed():
    with pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"OggS" + b"\x00" * 40)
    # PCM-only: build a fmt chunk claiming IEEE float (tag 3)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="PCM"):
        parse_wav(payload)
