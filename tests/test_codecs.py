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


# --- round 9: parse_wav malformed-input bounds (r8 ADVICE) -------------------


def test_wav_rejects_chunk_running_past_end():
    good = make_wav(10, 8000, b"ab")
    # inflate the data chunk's length field so it points past the payload
    bad = bytearray(good)
    pos = bad.find(b"data")
    struct.pack_into("<I", bad, pos + 4, 10_000)
    with pytest.raises(ValueError, match="runs past"):
        parse_wav(bytes(bad))


def test_wav_rejects_short_fmt_chunk():
    # hand-build a RIFF/WAVE whose fmt chunk is 8 bytes (< the 16 a PCM
    # fmt needs) — must raise the documented ValueError, not struct.error
    fmt_body = struct.pack("<HHI", 1, 1, 8000)  # truncated: no rates/bits
    fmt = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    data = b"data" + struct.pack("<I", 4) + b"\x00" * 4
    payload = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(data)) + b"WAVE" + fmt + data
    with pytest.raises(ValueError, match="fmt chunk"):
        parse_wav(payload)


# --- round 9: PNG — compressed container, full stdlib decode -----------------

import zlib

from lenses_topology_example_spark.functions.codecs import (
    PNG_SIG,
    _deflate_stored,
    make_png,
    parse_png,
    png_stream_size,
)


def test_png_golden_bytes_1x1():
    """Hand-computed layout for a 1x1 fill=7 PNG: sig 8 + IHDR 25 +
    IDAT 12+15 + IEND 12 = 72 bytes; the one scanline is filter-0 over
    3 pixel bytes, so the stored zlib stream is 2+5+4+4=15 bytes."""
    p = make_png(1, 1, 7)
    assert len(p) == 72
    assert p[:8] == PNG_SIG
    # IHDR: 1x1, depth 8, color 2, no compression/filter/interlace
    assert struct.unpack(">I4s", p[8:16]) == (13, b"IHDR")
    assert struct.unpack(">IIBBBBB", p[16:29]) == (1, 1, 8, 2, 0, 0, 0)
    w, h, depth, ctype, raw = parse_png(p)
    assert (w, h, depth, ctype) == (1, 1, 8, 2)
    assert raw == b"\x07\x07\x07"


def test_png_independent_construction_decodes():
    """A reference PNG assembled by explicit bytes (zlib.compress for
    the IDAT — the OTHER deflate implementation) decodes identically:
    2x2 RGB, both rows filter 0, distinct per-pixel bytes."""
    pixels = bytes(range(12))  # 2 rows x 2 px x 3 bytes
    scan = b"\x00" + pixels[:6] + b"\x00" + pixels[6:]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b)
        )

    p = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan, 6))
        + chunk(b"IEND", b"")
    )
    assert parse_png(p) == (2, 2, 8, 2, pixels)


def test_png_filters_are_exercised_and_undone():
    """make_png cycles filters None/Sub/Up; with a constant fill the
    SERIALIZED scanlines differ per filter (Sub rows carry zeros after
    the first pixel, Up rows are all zero), so only a correct unfilter
    pass reconstructs the flat raster."""
    p = make_png(4, 6, 200)
    # pull the raw filtered bytes back out of the stored zlib stream
    idat_at = p.find(b"IDAT") + 4
    idat_len = struct.unpack(">I", p[idat_at - 8 : idat_at - 4])[0]
    filtered = zlib.decompress(p[idat_at : idat_at + idat_len])
    stride = 13  # 1 filter byte + 12 pixel bytes
    rows = [filtered[i : i + stride] for i in range(0, len(filtered), stride)]
    assert [r[0] for r in rows] == [0, 1, 2, 0, 1, 2]
    assert rows[0] == b"\x00" + b"\xc8" * 12          # None: verbatim
    assert rows[1] == b"\x01" + b"\xc8" * 3 + b"\x00" * 9  # Sub
    assert rows[2] == b"\x02" + b"\x00" * 12          # Up
    # and the decode undoes all three
    assert parse_png(p)[4] == b"\xc8" * (3 * 4 * 6)


def test_png_multiblock_stored_stream():
    """>64 KiB of filtered data spans multiple stored DEFLATE blocks;
    the size formula stays exact and zlib's C inflate (an independent
    implementation) accepts our hand-rolled stream."""
    p = make_png(300, 80, 42)          # filtered = 80*901 = 72 080 bytes
    n = 80 * (1 + 3 * 300)
    assert png_stream_size(n) == 2 + 5 * 2 + n + 4   # exactly 2 blocks
    assert len(p) == 8 + 25 + 12 + png_stream_size(n) + 12
    w, h, _, _, raw = parse_png(p)
    assert (w, h) == (300, 80) and raw == b"\x2a" * (3 * 300 * 80)
    data = bytes(range(256)) * 512     # also: raw stream round trip
    assert zlib.decompress(_deflate_stored(data)) == data


def test_png_rejects_malformed():
    good = make_png(4, 4, 9)
    with pytest.raises(ValueError, match="signature"):
        parse_png(b"JFIF" + good[4:])
    with pytest.raises(ValueError, match="truncated|runs past"):
        parse_png(good[:30])
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF                # IEND CRC byte
    with pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(bad_crc))
    with pytest.raises(ValueError, match="missing"):
        parse_png(PNG_SIG)             # no chunks at all
    # grayscale (color type 0) is a valid PNG but outside this decoder's
    # declared truecolor-8 support — must refuse, not mis-decode
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b)
        )

    gray = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x55", 6))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        parse_png(gray)
    with pytest.raises(ValueError, match="dimensions"):
        make_png(0, 5, 1)
    with pytest.raises(ValueError, match="byte value"):
        make_png(1, 1, 300)


# --- GIF / LZW (round 10) ------------------------------------------------------


def test_lzw_round_trips_random_and_repetitive():
    """The REAL table-growing encoder through the general decoder:
    pseudo-random data (forces width growth to 12 bits and table-full
    CLEAR rebuilds) and repetitive data (exercises long dictionary
    hits), plus the KwKwK-heavy pattern."""
    import hashlib

    from lenses_topology_example_spark.functions.codecs import (
        lzw_decode,
        lzw_encode,
    )

    rnd = b"".join(
        hashlib.md5(bytes([i % 256, i // 256])).digest() for i in range(3000)
    )
    assert lzw_decode(lzw_encode(rnd)) == rnd
    rep = b"abcabcabd" * 5000
    enc = lzw_encode(rep)
    assert lzw_decode(enc) == rep
    assert len(enc) < len(rep) // 10  # the dictionary actually compresses
    # KwKwK: aaa... makes the decoder hit code == len(table)
    kwk = b"a" * 1000
    assert lzw_decode(lzw_encode(kwk)) == kwk
    for n in range(0, 40):
        data = bytes((i * 31 + n) % 256 for i in range(n * 13))
        assert lzw_decode(lzw_encode(data)) == data


def test_make_gif_size_is_arithmetic_and_decodes():
    from lenses_topology_example_spark.functions.codecs import (
        gif_total_bytes,
        make_gif,
        parse_gif,
    )

    for w, h, idx in [(1, 1, 0), (16, 16, 250), (7, 13, 42), (16, 1, 255)]:
        g = make_gif(w, h, idx)
        assert len(g) == gif_total_bytes(w * h)
        pw, ph, nc, raster = parse_gif(g)
        assert (pw, ph, nc) == (w, h, 256)
        assert raster == bytes([idx]) * (w * h)


def test_parse_gif_rejects_malformed():
    import pytest

    from lenses_topology_example_spark.functions.codecs import (
        make_gif,
        parse_gif,
    )

    g = bytearray(make_gif(5, 4, 9))
    with pytest.raises(ValueError):
        parse_gif(b"NOTGIF" + bytes(g[6:]))
    # corrupt a byte inside the LZW data region -> bad code / size
    bad = bytearray(g)
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError):
        parse_gif(bytes(bad))
    # truncated stream
    with pytest.raises((ValueError, IndexError)):
        parse_gif(bytes(g[:-8]))


def test_parse_gif_skips_extension_blocks():
    """A real reader walks 0x21 extensions (GCE, comments) before the
    image descriptor — splice one in and decode through it."""
    from lenses_topology_example_spark.functions.codecs import (
        make_gif,
        parse_gif,
    )

    g = make_gif(3, 3, 7)
    head, rest = g[: 13 + 768], g[13 + 768 :]
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    w, h, nc, raster = parse_gif(head + gce + rest)
    assert (w, h, nc) == (3, 3, 256) and raster == bytes([7]) * 9
