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


def g711_ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """ITU-T G.711 μ-law compressor (numpy): PCM16 → codewords. Exact
    inverse-on-codewords of the decoder (encode∘decode == identity over
    all 256 codes — exhaustively pytest-asserted)."""
    x = pcm.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x) + 0x84, 0x7FFF)
    exp = np.floor(np.log2(mag)).astype(np.int64) - 7
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def g711_alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law compressor (numpy): PCM16 → codewords (sign bit
    SET for non-negative input, per the spec's toggled convention)."""
    x = pcm.astype(np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    ix = np.minimum(np.abs(x), 0x7FFF) >> 4  # 13-bit alignment (×16)
    exp = np.zeros_like(ix)
    nz = ix >= 16
    exp[nz] = np.floor(np.log2(ix[nz])).astype(np.int64) - 3
    mant = np.where(exp == 0, ix & 0x0F,
                    (ix >> np.maximum(exp - 1, 0)) & 0x0F)
    return (((sign | (exp << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)


def make_wav(sample_rate: int, n_frames: int, seed: int = 0,
             channels: int = 1, bits: int = 16,
             codec: str = "pcm") -> bytes:
    """RIFF/WAVE. `codec` selects the data encoding: "pcm" (format
    tag 1, `bits` 8/16, LCG byte pattern), "float" (tag 3, float32 in
    [-1, 1] derived from the pattern), "ulaw"/"alaw" (G.711 tags 7/6,
    codewords straight from the pattern — every value is a valid
    codeword)."""
    if codec == "pcm":
        tag = 1
        block_align = channels * bits // 8
        data = _pattern(n_frames * block_align, seed).tobytes()
    elif codec == "float":
        tag, bits = 3, 32
        block_align = channels * 4
        x = (_pattern(n_frames * channels, seed).astype(np.float64)
             - 127.5) / 127.5
        data = x.astype("<f4").tobytes()
    elif codec in ("ulaw", "alaw"):
        tag, bits = (7 if codec == "ulaw" else 6), 8
        block_align = channels
        data = _pattern(n_frames * channels, seed).tobytes()
    else:  # pragma: no cover - fixture misuse
        raise ValueError(f"unknown wav codec {codec!r}")
    fmt = struct.pack("<HHIIHH", tag, channels, sample_rate,
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


_PNG_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def make_png(width: int, height: int, seed: int = 0, color_type: int = 2,
             filters: tuple[int, ...] = (0, 1, 2, 3, 4),
             interlace: int = 0, level: int = 6,
             value: int | None = None, depth: int = 8) -> bytes:
    """PNG (color types 0/2/3/4/6, depth 8 or 16), real zlib IDAT.
    `filters` cycles per scanline so decoders must handle every filter
    type; palette images (type 3) get a 16-entry PLTE and indices
    bounded to it. `interlace=1` emits REAL Adam7 data: the seven
    reduced images, each independently filtered. `value` makes every
    sample that one byte (the filtered STREAM still varies by filter
    type) so an oracle can state the decoded content arithmetically —
    any unfilter defect scrambles it."""
    ch = _PNG_CHANNELS[color_type]
    unit = ch * (depth // 8)
    px = (np.full(height * width * unit, value, np.uint8)
          if value is not None
          else _pattern(height * width * unit, seed)).reshape(
              height, width * unit)
    chunks = [_png_chunk(b"IHDR", struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, interlace))]
    if color_type == 3:
        px = (px % 16).astype(np.uint8)  # indices into the palette
        chunks.append(_png_chunk(b"PLTE", _pattern(48, seed + 7).tobytes()))
    if interlace:
        parts = []
        cube = px.reshape(height, width, unit)
        for i, (x0, y0, dx, dy) in enumerate(_PNG_ADAM7):
            sub = cube[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.append(_png_filter_rows(
                sub.reshape(sub.shape[0], sub.shape[1] * unit), unit,
                [filters[i % len(filters)]]))
        raw = b"".join(parts)
    else:
        raw = _png_filter_rows(px, unit, list(filters))
    chunks.append(_png_chunk(b"IDAT", zlib.compress(raw, level)))
    chunks.append(_png_chunk(b"IEND", b""))
    return b"\x89PNG\r\n\x1a\n" + b"".join(chunks)


def png_expected_samples(width: int, height: int, seed: int = 0,
                         color_type: int = 2,
                         depth: int = 8) -> np.ndarray:
    """The sample bytes make_png encodes, as the decoder must emit them
    (palette indices expanded through PLTE; depth 16 canonicalized to
    the high byte per sample) — the round-trip ground truth."""
    ch = _PNG_CHANNELS[color_type]
    unit = ch * (depth // 8)
    px = _pattern(height * width * unit, seed)
    if color_type == 3:
        pal = _pattern(48, seed + 7).reshape(16, 3)
        return pal[(px % 16).astype(np.int64)].reshape(-1)
    if depth == 16:
        return px.reshape(-1, 2)[:, 0].copy()
    return px


# --- baseline JPEG writer (ITU-T T.81) -------------------------------------
#
# A REAL encoder: level shift → (optional 4:2:0 box downsample) → 8×8 FDCT →
# quantization → zigzag → canonical Huffman entropy coding with byte
# stuffing, emitting SOI/APP0/DQT/SOF0/DHT/(DRI)/SOS/EOI. The decoder
# (operators/multimodal._decode_jpeg) trusts only the tables carried in the
# stream's own DQT/DHT segments, so the writer's table choice exercises the
# same path a real camera/browser JPEG would. Default quant tables are all
# ones (near-lossless: constant-value images reconstruct EXACTLY, which is
# what the arithmetic oracle states); quality_tables=True switches to the
# Annex K example tables for the lossy round-trip bound tests.

_ZIGZAG = [(r, d - r) for d in range(15)
           for r in (range(max(0, d - 7), min(d, 7) + 1) if d % 2 else
                     reversed(range(max(0, d - 7), min(d, 7) + 1)))]
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZIGZAG], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    a[0, :] = 1.0 / np.sqrt(8.0)
    j = np.arange(8)
    for k in range(1, 8):
        a[k, :] = 0.5 * np.cos((2 * j + 1) * k * np.pi / 16.0)
    return a


_DCT_A = _dct_matrix()

# ITU-T T.81 Annex K example Huffman tables: (bits[1..16], symbol list).
JPEG_STD_HUFF = {
    ("dc", 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12))),
    ("dc", 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12))),
    ("ac", 0): ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]),
    ("ac", 1): ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]),
}

# Annex K example quantization tables (luminance, chrominance).
JPEG_STD_QUANT = (
    np.array([16, 11, 10, 16, 24, 40, 51, 61,
              12, 12, 14, 19, 26, 58, 60, 55,
              14, 13, 16, 24, 40, 57, 69, 56,
              14, 17, 22, 29, 51, 87, 80, 62,
              18, 22, 37, 56, 68, 109, 103, 77,
              24, 35, 55, 64, 81, 104, 113, 92,
              49, 64, 78, 87, 103, 121, 120, 101,
              72, 92, 95, 98, 112, 100, 103, 99]).reshape(8, 8),
    np.array([17, 18, 24, 47, 99, 99, 99, 99,
              18, 21, 26, 66, 99, 99, 99, 99,
              24, 26, 56, 99, 99, 99, 99, 99,
              47, 66, 99, 99, 99, 99, 99, 99,
              99, 99, 99, 99, 99, 99, 99, 99,
              99, 99, 99, 99, 99, 99, 99, 99,
              99, 99, 99, 99, 99, 99, 99, 99,
              99, 99, 99, 99, 99, 99, 99, 99]).reshape(8, 8),
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 Annex C): symbol → (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (FF → FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category: value → (size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted planes → (n, 64) quantized zigzag coefs."""
    s = np.einsum("ij,njk,kl->nil", _DCT_A, plane - 128.0, _DCT_A.T)
    return np.round(s / q).astype(np.int64).reshape(-1, 64)[:, _ZZ_FLAT]


def _plane_blocks(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Pad a plane (edge-replicate) to (bh*8, bw*8) and cut 8×8 blocks,
    returning (bh, bw, 8, 8) in raster order."""
    h, w = plane.shape
    padded = np.pad(plane.astype(np.float64),
                    ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    return padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF (BT.601 full-range) forward transform, rounded to uint8."""
    r, g, b = (px[..., 0].astype(np.float64), px[..., 1].astype(np.float64),
               px[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)),
                   0, 255).astype(np.uint8)


def make_jpeg(width: int, height: int, seed: int = 0, gray: bool = False,
              subsampling: str = "444", value: int | None = None,
              quality_tables: bool = False,
              restart_interval: int = 0,
              pixels: np.ndarray | None = None) -> bytes:
    """Baseline JFIF JPEG (SOF0, Huffman, 8-bit). `gray` emits a
    1-component stream; otherwise 3-component YCbCr with 4:4:4 or 4:2:0
    (`subsampling`). `value` makes every source pixel that byte so the
    decode is arithmetically predictable (all-ones quant tables make
    constant images reconstruct exactly); `pixels` supplies an explicit
    (h, w) gray or (h, w, 3) RGB array; otherwise the LCG pattern.
    `restart_interval` > 0 emits DRI and RSTn markers every that many
    MCUs — the marker machinery real encoders use for error resilience."""
    if pixels is not None:
        px = np.asarray(pixels, dtype=np.uint8)
    elif value is not None:
        px = np.full((height, width) if gray else (height, width, 3),
                     value, np.uint8)
    else:
        n = width * height * (1 if gray else 3)
        px = _pattern(n, seed).reshape(
            (height, width) if gray else (height, width, 3))
    qt = (JPEG_STD_QUANT if quality_tables
          else (np.ones((8, 8), np.int64), np.ones((8, 8), np.int64)))

    if gray:
        comps = [(1, 1, 1, 0)]  # (id, h, v, tq)
        planes = [px.astype(np.float64)]
    else:
        ycc = rgb_to_ycbcr(px).astype(np.float64)
        yp, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsampling == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            eh, ew = (height + 1) & ~1, (width + 1) & ~1
            cb = np.pad(cb, ((0, eh - height), (0, ew - width)), mode="edge")
            cr = np.pad(cr, ((0, eh - height), (0, ew - width)), mode="edge")
            cb = np.round(cb.reshape(eh // 2, 2, ew // 2, 2)
                          .mean(axis=(1, 3)))
            cr = np.round(cr.reshape(eh // 2, 2, ew // 2, 2)
                          .mean(axis=(1, 3)))
        elif subsampling == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:  # pragma: no cover - fixture misuse
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        planes = [yp, cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    # per component: quantized zigzag coefs laid out (mcuy, v, 8)×(mcux, h, 8)
    coefs = []
    for (cid, ch_, cv, tq), plane in zip(comps, planes):
        blocks = _plane_blocks(plane, mcux * ch_, mcuy * cv)
        q = qt[tq][np.newaxis]
        zz = _encode_blocks(blocks.reshape(-1, 8, 8), q)
        coefs.append(zz.reshape(mcuy * cv, mcux * ch_, 64))

    huff = {k: _huff_codes(*v) for k, v in JPEG_STD_HUFF.items()}
    writer = _BitWriter()
    scan_parts: list[bytes] = []
    pred = [0] * len(comps)
    mcu_in_seg = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_in_seg == restart_interval):
                scan_parts.append(writer.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                writer = _BitWriter()
                pred = [0] * len(comps)
                mcu_in_seg = 0
            for ci, (cid, ch_, cv, tq) in enumerate(comps):
                tid = 0 if ci == 0 else 1
                dc_codes, ac_codes = huff[("dc", tid)], huff[("ac", tid)]
                for by in range(cv):
                    for bx in range(ch_):
                        zz = coefs[ci][my * cv + by, mx * ch_ + bx]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size, bits = _mag_bits(diff)
                        code, ln = dc_codes[size]
                        writer.put(code, ln)
                        if size:
                            writer.put(bits, size)
                        run = 0
                        last = 63
                        while last > 0 and zz[last] == 0:
                            last -= 1
                        for k in range(1, last + 1):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[0xF0]  # ZRL
                                writer.put(code, ln)
                                run -= 16
                            size, bits = _mag_bits(int(zz[k]))
                            code, ln = ac_codes[(run << 4) | size]
                            writer.put(code, ln)
                            writer.put(bits, size)
                            run = 0
                        if last < 63:
                            code, ln = ac_codes[0x00]  # EOB
                            writer.put(code, ln)
            mcu_in_seg += 1
    scan_parts.append(writer.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = [b"\xff\xd8",
           seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    n_qt = 1 if gray else 2
    for t in range(n_qt):
        out.append(seg(0xDB, bytes([t]) + bytes(
            int(qt[t].reshape(-1)[_ZZ_FLAT][i]) for i in range(64))))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(comps)])
    for cid, ch_, cv, tq in comps:
        sof += bytes([cid, (ch_ << 4) | cv, tq])
    out.append(seg(0xC0, sof))
    for tid in range(n_qt):
        for tc, kind in ((0, "dc"), (1, "ac")):
            bits, vals = JPEG_STD_HUFF[(kind, tid)]
            out.append(seg(0xC4, bytes([(tc << 4) | tid]) + bytes(bits)
                           + bytes(vals)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([len(comps)])
    for ci, (cid, _, _, _) in enumerate(comps):
        tid = 0 if ci == 0 else 1
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out.append(seg(0xDA, sos))
    out.append(scan)
    out.append(b"\xff\xd9")
    return b"".join(out)


# --- GIF writer (GIF87a/GIF89a) ---------------------------------------------

_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_encode(indices: bytes, mcs: int) -> bytes:
    """Real GIF LZW: dictionary compression with variable code width.
    The emission width must track the DECODER's table (which lags the
    encoder's by one entry — it creates each entry only when it reads
    the following code), so the width bump here is driven by a simulated
    decoder table size, not the encoder dictionary. When the dictionary
    fills (4096) a Clear code resets both sides."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = nacc = 0
    width = mcs + 1
    dec_size = clear + 2
    n_in_seg = 0

    def put(code: int, is_data: bool) -> None:
        nonlocal acc, nacc, width, dec_size, n_in_seg
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
        if is_data:
            # decoder adds one entry per data code after a segment's first
            n_in_seg += 1
            if n_in_seg >= 2 and dec_size < 4096:
                dec_size += 1
                if dec_size == (1 << width) and width < 12:
                    width += 1

    def reset() -> None:
        nonlocal width, dec_size, n_in_seg
        width = mcs + 1
        dec_size = clear + 2
        n_in_seg = 0

    put(clear, False)
    reset()
    dictionary = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in dictionary:
            w = wk
            continue
        put(dictionary[w], True)
        if next_code < 4096:
            dictionary[wk] = next_code
            next_code += 1
        else:
            put(clear, False)
            reset()
            dictionary = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
        w = bytes([b])
    if w:
        put(dictionary[w], True)
    put(end, False)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_frame_indices(width: int, height: int, seed: int,
                       palette_size: int, value: int | None) -> np.ndarray:
    if value is not None:
        return np.zeros(height * width, np.uint8)
    return (_pattern(height * width, seed) % palette_size).astype(np.uint8)


def make_gif(width: int, height: int, n_frames: int = 1, seed: int = 0,
             value: int | None = None, palette_size: int = 16,
             interlace: bool = False, delay_cs: int = 4,
             version: bytes = b"89a") -> bytes:
    """GIF87a/89a with a real LZW-compressed index stream per frame and a
    global color table. `value` puts (v, v, v) at palette slot 0 and all
    indices there, so decoded content is arithmetically predictable;
    otherwise indices and palette come from the LCG pattern (per-frame
    seeds so animation frames differ). `interlace` stores rows in the
    4-pass order; n_frames > 1 emits GCE delay blocks and multiple
    full-canvas image descriptors (an animation)."""
    ctbits = max(1, (palette_size - 1).bit_length())
    n_entries = 1 << ctbits
    pal = np.zeros((n_entries, 3), np.uint8)
    pat = _pattern(3 * palette_size, seed + 7).reshape(-1, 3)
    pal[:palette_size] = pat
    if value is not None:
        pal[0] = value
    out = [b"GIF" + version, struct.pack("<HH", width, height),
           bytes([0x80 | (ctbits - 1), 0, 0]), pal.tobytes()]
    mcs = max(2, ctbits)
    for f in range(n_frames):
        if n_frames > 1:
            out.append(b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs)
                       + b"\x00\x00")
        rows = _gif_frame_indices(width, height, seed + f * 97,
                                  palette_size, value).reshape(height, width)
        flags = 0
        if interlace:
            order = np.concatenate(
                [np.arange(s, height, st) for s, st in _GIF_INTERLACE])
            rows = rows[order]
            flags |= 0x40
        out.append(b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
                   + bytes([flags]) + bytes([mcs]))
        data = _gif_lzw_encode(rows.reshape(-1).tobytes(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(bytes([len(chunk)]) + chunk)
        out.append(b"\x00")
    out.append(b"\x3b")
    return b"".join(out)


def gif_expected_samples(width: int, height: int, n_frames: int = 1,
                         seed: int = 0, palette_size: int = 16) -> np.ndarray:
    """The RGB bytes make_gif encodes in pattern mode, frame-concatenated
    in display row order — the decoder's round-trip ground truth."""
    pal = _pattern(3 * palette_size, seed + 7).reshape(-1, 3)
    frames = [pal[_gif_frame_indices(width, height, seed + f * 97,
                                     palette_size, None)].reshape(-1)
              for f in range(n_frames)]
    return np.concatenate(frames)


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
