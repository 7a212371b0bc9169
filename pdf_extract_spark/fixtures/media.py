"""Deterministic writers for the real media containers the multimodal
decoder parses (operators/multimodal.py): BMP, PPM, WAV, Y4M. Same
bounded-scope pattern as fixtures/pdf_writer.py — the writers emit
spec-conformant files from the published public formats, the decoder
handles the full header grammar, and tests feed it both these outputs
and corrupt variants. Pixel/sample content is a pure function of the
seed so every kernel stays partition-invariant.
"""

from __future__ import annotations

import struct

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
