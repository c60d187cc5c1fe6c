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
