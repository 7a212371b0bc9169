"""Deterministic writers for the real media containers the multimodal
decoder parses (operators/multimodal.py): BMP, PPM, WAV, Y4M, PNG. Same
bounded-scope pattern as fixtures/pdf_writer.py — the writers emit
spec-conformant files from the published public formats, the decoder
handles the full header grammar, and tests feed it both these outputs
and corrupt variants. Pixel/sample content is a pure function of the
seed so every kernel stays partition-invariant.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _pattern(n: int, seed: int) -> np.ndarray:
    """Deterministic byte pattern: linear-congruential ramp, cheap and
    collision-free enough that distinct seeds give distinct digests."""
    i = np.arange(n, dtype=np.int64)
    return ((seed * 131 + i * 31 + (i >> 5) * 7) % 256).astype(np.uint8)


def make_bmp(width: int, height: int, seed: int = 0,
             top_down: bool = False) -> bytes:
    """Uncompressed 24-bit BI_RGB BMP with BITMAPINFOHEADER. Positive
    height = bottom-up pixel storage (the common case); top_down=True
    writes the negative-height variant."""
    stride = (width * 3 + 3) & ~3
    px = _pattern(height * width * 3, seed).reshape(height, width * 3)
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, :width * 3] = px
    stored = rows if top_down else rows[::-1]  # bottom-up storage
    pixel_bytes = stored.tobytes()
    file_size = 54 + len(pixel_bytes)
    header = (b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width,
                            -height if top_down else height,
                            1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0))
    return header + pixel_bytes


def make_ppm(width: int, height: int, seed: int = 0,
             comment: str | None = None) -> bytes:
    """Netpbm P6 binary RGB, maxval 255; optional header comment to
    exercise the `#` grammar."""
    head = b"P6\n"
    if comment is not None:
        head += b"# " + comment.encode() + b"\n"
    head += f"{width} {height}\n255\n".encode()
    return head + _pattern(width * height * 3, seed).tobytes()


def make_wav(sample_rate: int, n_frames: int, seed: int = 0,
             channels: int = 1, bits: int = 16) -> bytes:
    """RIFF/WAVE integer PCM (format tag 1)."""
    block_align = channels * bits // 8
    data = _pattern(n_frames * block_align, seed).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _png_filter_rows(px: np.ndarray, ch: int,
                     filters: list[int]) -> bytes:
    """Apply the spec §9 scanline filters for encoding. Unlike decoding,
    every predictor reads TRUE neighbor values, so all five filters
    vectorize whole-row."""
    height, rowlen = px.shape
    width = rowlen // ch
    out = []
    prev = np.zeros(rowlen, np.int32)
    for y in range(height):
        cur = px[y].astype(np.int32)
        left = np.zeros(rowlen, np.int32)
        left[ch:] = cur[:-ch]
        upleft = np.zeros(rowlen, np.int32)
        upleft[ch:] = prev[:-ch]
        f = filters[y % len(filters)]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:
            pa = np.abs(prev - upleft)
            pb = np.abs(left - upleft)
            pc = np.abs(left + prev - 2 * upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        out.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return b"".join(out)


def make_png(width: int, height: int, seed: int = 0, color_type: int = 2,
             filters: tuple[int, ...] = (0, 1, 2, 3, 4),
             interlace: int = 0, level: int = 6,
             value: int | None = None) -> bytes:
    """Non-interlaced 8-bit PNG (color types 0/2/3/4/6), real zlib IDAT.
    `filters` cycles per scanline so decoders must handle every filter
    type; palette images (type 3) get a 16-entry PLTE and indices
    bounded to it. `interlace` is written into IHDR verbatim so tests
    can emit the unsupported Adam7 flag. `value` makes every sample that
    one byte (the filtered STREAM still varies by filter type) so an
    oracle can state the decoded content arithmetically — any unfilter
    defect scrambles it."""
    ch = _PNG_CHANNELS[color_type]
    px = (np.full(height * width * ch, value, np.uint8)
          if value is not None
          else _pattern(height * width * ch, seed)).reshape(
              height, width * ch)
    chunks = [_png_chunk(b"IHDR", struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, interlace))]
    if color_type == 3:
        px = (px % 16).astype(np.uint8)  # indices into the palette
        chunks.append(_png_chunk(b"PLTE", _pattern(48, seed + 7).tobytes()))
    raw = _png_filter_rows(px, ch, list(filters))
    chunks.append(_png_chunk(b"IDAT", zlib.compress(raw, level)))
    chunks.append(_png_chunk(b"IEND", b""))
    return b"\x89PNG\r\n\x1a\n" + b"".join(chunks)


def png_expected_samples(width: int, height: int, seed: int = 0,
                         color_type: int = 2) -> np.ndarray:
    """The sample bytes make_png encodes, as the decoder must emit them
    (palette indices expanded through PLTE) — the round-trip ground truth."""
    ch = _PNG_CHANNELS[color_type]
    px = _pattern(height * width * ch, seed)
    if color_type == 3:
        pal = _pattern(48, seed + 7).reshape(16, 3)
        return pal[(px % 16).astype(np.int64)].reshape(-1)
    return px


def make_y4m(width: int, height: int, n_frames: int, seed: int = 0,
             fps: tuple[int, int] = (25, 1)) -> bytes:
    """YUV4MPEG2 stream, C420 planar (frame size w*h*3/2). Each frame's
    bytes derive from (seed, frame index) so per-frame digests differ."""
    frame_size = width * height * 3 // 2
    out = [f"YUV4MPEG2 W{width} H{height} "
           f"F{fps[0]}:{fps[1]} Ip A1:1 C420\x0a".encode()]
    for f in range(n_frames):
        out.append(b"FRAME\x0a")
        out.append(_pattern(frame_size, seed + f * 97).tobytes())
    return b"".join(out)
