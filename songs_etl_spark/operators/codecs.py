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
