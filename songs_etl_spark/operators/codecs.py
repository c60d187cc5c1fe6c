"""Dependency-free binary codecs for the multimodal operators.

The reference's multimodal surface is pass-through album-art metadata
(`cf_extract/main.py:270` — ``album.images: [{url, height, width}]``); it
never decodes a byte. This module supplies the real byte→pixels/samples step
for the Arrow ``mapInPandas`` operators in ``operators/multimodal.py`` using
only the standard library:

- **WAV**: stdlib ``wave`` (RIFF/WAVE, 16-bit PCM) for both encode and
  decode — real container parsing, real sample extraction.
- **BMP**: hand-written Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
  24-bit uncompressed, bottom-up, 4-byte row padding) encoder/decoder.

Determinism note: both decoders return integers (raw PCM samples, raw RGB
bytes) so every downstream float is derived by one exact-integer-sum →
single-division chain, reproducible bit-for-bit by a SQL oracle.
"""

from __future__ import annotations

import io
import struct
import wave

# ---------------------------------------------------------------------------
# WAV (stdlib wave module)
# ---------------------------------------------------------------------------


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE bytes from raw int samples (each in
    [-32768, 32767]). Produced with stdlib ``wave`` — a fully standard
    44-byte-header file any audio tool can open."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Parse RIFF/WAVE bytes → ``{n_channels, sample_rate, n_samples,
    samples}`` with raw int16 samples (mono or channel-0 of interleaved).
    Raises ``ValueError`` on anything that isn't 16-bit PCM WAV."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            sample_rate = w.getframerate()
            n_frames = w.getnframes()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError, struct.error) as exc:
        raise ValueError(f"not a WAV payload: {exc}") from exc
    if sampwidth != 2:
        raise ValueError(f"unsupported sample width {sampwidth} (16-bit PCM only)")
    raw = struct.unpack(f"<{n_frames * n_channels}h", frames[: 2 * n_frames * n_channels])
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_samples": n_frames,
        "samples": list(raw[::n_channels]),  # channel 0
    }


# ---------------------------------------------------------------------------
# BMP (hand-written 24-bit uncompressed)
# ---------------------------------------------------------------------------

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, data offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)


def encode_bmp(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """24-bit uncompressed BMP from row-major (r, g, b) tuples (row 0 = top).
    Stored bottom-up with rows padded to 4 bytes, per the format spec."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\0" * (row_stride - width * 3)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            r, g, b = pixels[y * width + x]
            body += bytes((b, g, r))  # BGR on disk
        body += pad
    data_offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
    info = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    head = _BMP_FILE_HEADER.pack(b"BM", data_offset + len(body), 0, 0, data_offset)
    return head + info + bytes(body)


def decode_bmp(payload: bytes) -> dict:
    """Parse 24-bit BMP bytes → ``{width, height, pixels}`` with row-major
    (r, g, b) int tuples (row 0 = top). Raises ``ValueError`` on wrong magic,
    truncation, or unsupported depth/compression."""
    if len(payload) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise ValueError("truncated BMP header")
    magic, _, _, _, data_offset = _BMP_FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError(f"bad BMP magic {magic!r}")
    (
        hdr_size,
        width,
        height,
        _planes,
        depth,
        compression,
        _img_size,
        _ppm_x,
        _ppm_y,
        _colors,
        _important,
    ) = _BMP_INFO_HEADER.unpack_from(payload, _BMP_FILE_HEADER.size)
    if hdr_size < _BMP_INFO_HEADER.size or depth != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (depth={depth}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    if len(payload) < data_offset + row_stride * height:
        raise ValueError("truncated BMP pixel data")
    pixels: list[tuple[int, int, int]] = []
    for row in range(height):
        disk_row = (height - 1 - row) if bottom_up else row
        off = data_offset + disk_row * row_stride
        for x in range(width):
            b, g, r = payload[off + 3 * x : off + 3 * x + 3]
            pixels.append((r, g, b))
    return {"width": width, "height": height, "pixels": pixels}


# ---------------------------------------------------------------------------
# PNG (hand-written: stdlib zlib, 8-bit RGB color type 2, filters 0-4)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: list[tuple[int, int, int]],
    filter_type: int = 0,
) -> bytes:
    """8-bit RGB (color type 2) non-interlaced PNG from row-major (r, g, b)
    tuples. ``filter_type`` applies the same PNG filter (0 None, 1 Sub,
    2 Up, 3 Average, 4 Paeth) to every scanline — the knob the decoder
    tests use to exercise each unfilter path. Real CRCs, one IDAT, real
    zlib stream: any PNG viewer opens the output."""
    import zlib

    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")
    bpp = 3
    raw = bytearray()
    prev = bytes(width * bpp)
    for y in range(height):
        line = bytearray()
        for x in range(width):
            line += bytes(pixels[y * width + x])
        filt = bytearray()
        for i, cur in enumerate(line):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if filter_type == 0:
                filt.append(cur)
            elif filter_type == 1:
                filt.append((cur - a) & 0xFF)
            elif filter_type == 2:
                filt.append((cur - b) & 0xFF)
            elif filter_type == 3:
                filt.append((cur - (a + b) // 2) & 0xFF)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt.append((cur - pred) & 0xFF)
        raw.append(filter_type)
        raw += filt
        prev = bytes(line)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Parse PNG bytes → ``{width, height, pixels}`` with row-major
    (r, g, b) int tuples. Supports the baseline still-image profile this
    repo emits — 8-bit RGB (color type 2), non-interlaced — with ALL five
    scanline filters unfiltered per spec and chunk CRCs verified. Raises
    ``ValueError`` on wrong magic, CRC mismatch, truncation, or an
    unsupported profile."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("bad PNG signature")
    pos = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG profile (depth={depth}, color={ctype}, "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + ln
    if width is None or not seen_end:
        raise ValueError("missing IHDR/IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"bad PNG IDAT stream: {exc}") from exc
    bpp = 3
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    pixels: list[tuple[int, int, int]] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        for x in range(width):
            pixels.append((line[3 * x], line[3 * x + 1], line[3 * x + 2]))
        prev = line
    return {"width": width, "height": height, "pixels": pixels}


# ---------------------------------------------------------------------------
# JPEG (hand-written baseline JFIF: DCT + quant + huffman, public JPEG spec
# ITU-T T.81; tables are the spec's own Annex K examples)
# ---------------------------------------------------------------------------

#: Annex K.1 luminance quantization table, natural (row-major) order.
JPEG_STD_LUMA_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K.3.1 luminance DC huffman spec: (BITS counts per code length 1-16,
#: HUFFVAL symbols) — symbols are the DC difference categories 0-11.
JPEG_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
JPEG_STD_DC_VALS = list(range(12))

#: Annex K.3.2 luminance AC huffman spec.
JPEG_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
JPEG_STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: Zigzag scan: ZIGZAG[k] = natural index of the k-th zigzag coefficient.
JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def jpeg_quality_scale(base: list[int], quality: int) -> list[int]:
    """IJG quality scaling: 50 → base table, 100 → all-ones (lossless
    quantization), values clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * scale + 50) // 100)) for q in base]


def _dct_matrix():
    """Row u = 0.5·C(u)·cos((2x+1)uπ/16): forward DCT is M @ block @ M.T,
    inverse is M.T @ coef @ M."""
    import numpy as np

    c = np.ones(8) * 0.5
    c[0] = 0.5 / np.sqrt(2.0)
    x = np.arange(8)
    return c[:, None] * np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG code assignment: symbol → (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (spec F.1.2.3)
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def encode_jpeg_gray(
    width: int, height: int, gray: list[int], quality: int = 100
) -> bytes:
    """Baseline JFIF encoder, 8-bit grayscale single component: level shift →
    float 2D DCT → quantize (quality-scaled Annex K luminance table) →
    zigzag → DC-diff/AC-runlength huffman (Annex K tables) with byte
    stuffing. Edge blocks replicate the last row/column (standard practice);
    the decoder crops back to (width, height)."""
    import numpy as np

    if len(gray) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(gray)}")
    qtab = jpeg_quality_scale(JPEG_STD_LUMA_QUANT, quality)
    qmat = np.array(qtab, dtype=np.float64).reshape(8, 8)
    try:
        img = np.asarray(gray, dtype=np.float64).reshape(height, width)
    except (TypeError, ValueError) as exc:
        raise ValueError(f"pixels must be numeric: {exc}") from exc
    # Out-of-range or fractional samples would otherwise surface as an
    # opaque KeyError deep in the huffman category lookup.
    bad = ~((img >= 0) & (img <= 255) & (img == np.floor(img)))
    if bad.any():
        i = int(np.flatnonzero(bad.ravel())[0])
        raise ValueError(f"pixel {i} not an integer in 0..255: {gray[i]!r}")
    bh, bw = -(-height // 8), -(-width // 8)
    padded = np.pad(img, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge")
    dctm = _dct_matrix()

    dc_codes = _build_huffman_codes(JPEG_STD_DC_BITS, JPEG_STD_DC_VALS)
    ac_codes = _build_huffman_codes(JPEG_STD_AC_BITS, JPEG_STD_AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = dctm @ block @ dctm.T
            q = np.rint(coef / qmat).astype(np.int64)
            zz = [int(q.flat[JPEG_ZIGZAG[k]]) for k in range(64)]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            s = _category(diff)
            code, length = dc_codes[s]
            w.write(code, length)
            if s:
                w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = ac_codes[0xF0]  # ZRL
                    w.write(zc, zl)
                    run -= 16
                s = _category(zz[k])
                code, length = ac_codes[(run << 4) | s]
                w.write(code, length)
                w.write(zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                w.write(code, length)
    entropy = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, bytes([0x00]) + bytes(qtab[JPEG_ZIGZAG[k]] for k in range(64)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00]) + bytes(JPEG_STD_DC_BITS) + bytes(JPEG_STD_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(JPEG_STD_AC_BITS) + bytes(JPEG_STD_AC_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy data")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Malformed-input contract wrapper over ``_decode_jpeg``: any parse
    failure — including truncation (IndexError), short headers
    (struct.error), or references to undeclared tables (KeyError) —
    surfaces as ``ValueError`` like decode_bmp/decode_png, so
    ``image_features`` turns a corrupt asset into an error ROW instead of
    a task-killing exception inside the Arrow batch."""
    try:
        return _decode_jpeg(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error) as err:
        raise ValueError(f"malformed JPEG: {type(err).__name__}: {err}") from err


def _decode_jpeg(payload: bytes) -> dict:
    """Baseline (SOF0) JPEG decoder — general huffman/dequant/IDCT path, not
    a fixture-shaped shortcut: parses DQT/DHT/SOF0/SOS segments, entropy-
    decodes DC-diff + AC run-length per MCU with byte unstuffing, dequantizes,
    de-zigzags, applies the float separable IDCT, level-shifts, clamps, and
    crops to the declared dimensions.

    Supported: 8-bit baseline, grayscale (1 component) or 4:4:4 color
    (3 components, 1×1 sampling, JFIF YCbCr→RGB). Raises ``ValueError`` on
    progressive scans, subsampling, 16-bit quant tables, or restart
    intervals — the documented envelope, matching the encoder half.

    Returns ``{width, height, pixels}`` with row-major (r, g, b) tuples
    (grayscale replicated across channels) — the shared decoded-pixel
    contract of decode_bmp/decode_png."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG magic (no SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab id)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc tab, ac tab)
    width = height = 0
    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: no body
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported (baseline)")
                zz = body[off + 1 : off + 65]
                nat = [0] * 64
                for k in range(64):
                    nat[JPEG_ZIGZAG[k]] = zz[k]
                qtabs[tq] = nat
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_huffman_decoder(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("chroma subsampling not supported (4:4:4 only)")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) is supported")
        elif marker == 0xDD:  # DRI
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                idx = next((j for j, c in enumerate(comps) if c[0] == cs), None)
                if idx is None:
                    raise ValueError(f"SOS references undeclared component {cs}")
                scan.append((idx, tabs >> 4, tabs & 0xF))
            break
        # other segments (APPn, COM): skipped
    if not comps or not scan:
        raise ValueError("missing SOF0/SOS")
    ncomp = len(comps)
    if ncomp not in (1, 3):
        raise ValueError(f"unsupported component count {ncomp}")
    bh, bw = -(-height // 8), -(-width // 8)
    dctm = _dct_matrix()
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(ncomp)]
    r = _BitReader(payload, pos)
    prev_dc = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci, dci, aci in scan:
                zz = [0] * 64
                s = _huff_decode(r, dc_tabs[dci])
                diff = _extend(r.bits(s), s) if s else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = _huff_decode(r, ac_tabs[aci])
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    s = rs & 0xF
                    if k > 63:
                        raise ValueError("AC coefficient index out of range")
                    zz[k] = _extend(r.bits(s), s)
                    k += 1
                qtab = qtabs[comps[ci][2]]
                coef = np.zeros(64)
                for k in range(64):
                    coef[JPEG_ZIGZAG[k]] = zz[k] * qtab[JPEG_ZIGZAG[k]]
                block = dctm.T @ coef.reshape(8, 8) @ dctm
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    pixels: list[tuple[int, int, int]] = []
    if ncomp == 1:
        y = np.clip(np.rint(planes[0] + 128.0), 0, 255).astype(np.int64)
        for yy in range(height):
            for xx in range(width):
                v = int(y[yy, xx])
                pixels.append((v, v, v))
    else:
        # JFIF YCbCr -> RGB (round, clamp) on the un-shifted planes
        yf = planes[0] + 128.0
        cb = planes[1]
        cr = planes[2]
        rr = np.clip(np.rint(yf + 1.402 * cr), 0, 255).astype(np.int64)
        gg = np.clip(np.rint(yf - 0.344136 * cb - 0.714136 * cr), 0, 255).astype(np.int64)
        bb = np.clip(np.rint(yf + 1.772 * cb), 0, 255).astype(np.int64)
        for yy in range(height):
            for xx in range(width):
                pixels.append((int(rr[yy, xx]), int(gg[yy, xx]), int(bb[yy, xx])))
    return {"width": width, "height": height, "pixels": pixels}
