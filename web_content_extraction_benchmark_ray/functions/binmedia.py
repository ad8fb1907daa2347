"""Pure-Python binary media codecs — REAL decoders for the multimodal
path, no third-party libraries.

The sandbox ships no image/audio libs, but three standard formats are
parseable with nothing beyond stdlib ``struct``/``zlib``/numpy:
uncompressed 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up
rows padded to 4 bytes), 16-bit PCM WAV (RIFF chunk walk), and baseline
8-bit PNG (chunk walk with CRC validation, zlib inflate, all five
scanline unfilters).  ``decode_bmp``/``decode_wav``/``decode_png`` are
genuine parsers: they validate magics, read geometry from the headers,
and aggregate the payload samples — exercised in the pipeline on real
encoded bytes, so the multimodal capability is proven end to end rather
than stubbed (the PDF/raster seam in ``functions/media.py`` stays gated
on its absent libraries).

The matching ``encode_*`` generators build payloads whose sample streams
follow a closed-form sequence (``(seed + a·k) % m``), which is what lets
the DuckDB oracle reproduce the decoded aggregates with a
``generate_series`` sum instead of parsing binary — the standard way to
oracle-test a decoder: verify it extracts exactly what was encoded.
"""
from __future__ import annotations

import struct

import numpy as np

BMP_W = 64  # multiple of 4 -> rows need no padding (but the decoder
BMP_H = 16  # handles padded widths anyway)
BMP_PIX_STEP = 17
WAV_N_SAMPLES = 1000
WAV_RATE = 8000
WAV_STEP = 37
WAV_MOD = 2001  # samples span [-1000, 1000]


# ------------------------------------------------------------------- BMP
def _parse_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Validate a 24-bit BMP and return (width, signed height, pixel
    grid) — the grid is (abs_h, width, 3) uint8 in FILE row order
    (bottom-up when height > 0, top-down when negative), padding
    stripped.  Single source of truth for the layout: decode_bmp and
    resize_bmp_nn both read through here."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    dib_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if dib_size < 40:
        raise ValueError("unsupported DIB header")
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    abs_h = abs(height)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    grid = np.frombuffer(
        payload, dtype=np.uint8, count=stride * abs_h, offset=data_off
    ).reshape(abs_h, stride)[:, :row_bytes].reshape(abs_h, width, 3)
    return int(width), int(height), grid


def _wrap_bmp(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Pack an (h, w, 3) uint8 pixel-byte grid (file-row order) into a
    24-bit BMP.  ``top_down=True`` writes a negative height so the file
    declares the same row orientation the grid was read in.  Single
    source of truth for the packing: encode_bmp and resize_bmp_nn both
    write through here."""
    h, w = pixels.shape[0], pixels.shape[1]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = b"".join(
        bytes(r.reshape(-1)) + b"\x00" * pad for r in pixels
    )
    data_off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return header + dib + body


def encode_bmp(seed: int, width: int = BMP_W, height: int = BMP_H) -> bytes:
    """24-bit bottom-up BMP; pixel byte k = (seed + 17*k) % 256."""
    n = width * 3 * height
    pix = ((seed + BMP_PIX_STEP * np.arange(n, dtype=np.int64)) % 256
           ).astype(np.uint8)
    return _wrap_bmp(pix.reshape(height, width, 3))


def decode_bmp(payload: bytes) -> dict:
    """Parse header geometry and sum the pixel bytes (padding excluded).
    Returns {width, height, bpp, byte_sum}."""
    width, height, grid = _parse_bmp(payload)
    return {
        "width": width,
        "height": abs(height),
        "bpp": 24,
        "byte_sum": int(grid.astype(np.int64).sum()),
    }


def resize_bmp_nn(payload: bytes, fx: int = 2, fy: int = 2) -> bytes:
    """REAL nearest-neighbor downscale: decode the 24-bit pixel grid,
    keep every ``fy``-th file row and ``fx``-th pixel column (indices 0,
    fx, 2fx, ... — ceil(n/f) survivors), re-encode.  File row order AND
    the height sign (bottom-up vs top-down) are preserved, so the output
    is the orientation-faithful NN subsample for either storage
    direction; output geometry is (ceil(w/fx), ceil(h/fy))."""
    _w, height, grid = _parse_bmp(payload)
    return _wrap_bmp(
        np.ascontiguousarray(grid[::fy, ::fx]), top_down=height < 0
    )


# ------------------------------------------------------------------- WAV
def encode_wav(seed: int, n_samples: int = WAV_N_SAMPLES,
               rate: int = WAV_RATE) -> bytes:
    """Mono 16-bit PCM WAV; sample i = ((seed + 37*i) % 2001) - 1000."""
    s = (((seed + WAV_STEP * np.arange(n_samples, dtype=np.int64))
          % WAV_MOD) - (WAV_MOD - 1) // 2).astype(np.int16)
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def wav_samples(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF chunk walk -> (n_channels, sample_rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n = 12, len(payload)
    fmt_info, data = None, None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV encoding")
            fmt_info = (channels, rate)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # RIFF chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return fmt_info[0], fmt_info[1], np.frombuffer(data, dtype=np.int16)


def decode_wav(payload: bytes) -> dict:
    """Parse geometry and sum |samples| over the data chunk.
    Returns {n_channels, sample_rate, n_samples, abs_sum}."""
    channels, rate, samples = wav_samples(payload)
    return {
        "n_channels": int(channels),
        "sample_rate": int(rate),
        "n_samples": int(len(samples) // channels),
        "abs_sum": int(np.abs(samples.astype(np.int64)).sum()),
    }


# ------------------------------------------------------------------- PNG
# Real PNG (not a fake): zlib IS in the standard library, so a full
# baseline decoder — signature, chunk walk with CRC validation, IHDR
# geometry, IDAT inflate, and all FIVE scanline unfilters (None / Sub /
# Up / Average / Paeth) — needs nothing beyond stdlib + numpy.  The
# encoder cycles the filter type per row (row % 5), so a single payload
# exercises every unfilter path; raw (post-unfilter) byte k follows the
# (seed + 29·k) % 256 lattice, which keeps the decoded aggregates
# closed-form for the DuckDB oracle.  The weighted sum Σ(k+1)·byte[k]
# is position-sensitive: a misplaced byte (wrong unfilter, wrong row
# order) shifts it even when the plain sum cancels.
PNG_W = 48
PNG_H = 15  # multiple of 5 -> each filter type filters 3 rows
PNG_PIX_STEP = 29
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> channels


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(seed: int, width: int = PNG_W, height: int = PNG_H,
               color_type: int = 2, raw: np.ndarray | None = None) -> bytes:
    """Real 8-bit PNG; raw byte k = (seed + 29*k) % 256 (or the caller's
    ``raw`` bytes — PNG is lossless, any content round-trips), row r
    filtered with type r % 5 (so None/Sub/Up/Average/Paeth all appear)."""
    import zlib

    ch = _PNG_CHANNELS[color_type]
    rb = width * ch  # bytes per scanline
    if raw is None:
        raw = ((seed + PNG_PIX_STEP
                * np.arange(height * rb, dtype=np.int64))
               % 256).astype(np.uint8)
    raw = np.asarray(raw, dtype=np.uint8).reshape(height, rb)
    lines = []
    prev = np.zeros(rb, dtype=np.int64)
    for r in range(height):
        cur = raw[r].astype(np.int64)
        ft = r % 5
        if ft == 0:
            filt = cur
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            filt = cur - left
        elif ft == 2:  # Up
            filt = cur - prev
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            filt = cur - (left + prev) // 2
        else:  # Paeth
            filt = np.empty(rb, dtype=np.int64)
            for x in range(rb):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                filt[x] = cur[x] - _paeth(a, b, c)
        lines.append(bytes([ft]) + bytes((filt % 256).astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def png_pixels(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Full baseline decode -> (width, height, channels, raw byte grid
    (h, w*ch) uint8).  Validates the signature, every chunk CRC, and the
    IHDR invariants (8-bit, non-interlaced, known color type); inflates
    the IDAT stream and undoes all five scanline filters."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    ihdr, idat = None, []
    while pos + 12 <= n:
        (clen,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + clen > n:
            raise ValueError("truncated chunk")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG variant")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    rb = width * ch
    stream = zlib.decompress(b"".join(idat))
    if len(stream) != height * (rb + 1):
        raise ValueError("IDAT stream length mismatch")
    sl = np.frombuffer(stream, dtype=np.uint8).reshape(height, rb + 1)
    out = np.empty((height, rb), dtype=np.uint8)
    prev = np.zeros(rb, dtype=np.int64)
    for r in range(height):
        ft = int(sl[r, 0])
        line = sl[r, 1:].astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            cur = np.cumsum(line.reshape(-1, ch), axis=0).reshape(-1) % 256
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft == 3:  # Average (left-sequential)
            cur = np.empty(rb, dtype=np.int64)
            for x in range(rb):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (line[x] + (left + int(prev[x])) // 2) % 256
        elif ft == 4:  # Paeth (left-sequential)
            cur = np.empty(rb, dtype=np.int64)
            for x in range(rb):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                cur[x] = (line[x] + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad filter type {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return int(width), int(height), ch, out


def decode_png(payload: bytes) -> dict:
    """Parse geometry and aggregate the RAW (post-unfilter) bytes.
    Returns {width, height, channels, bit_depth, byte_sum, wsum} where
    wsum = Σ (k+1)·byte[k] over the row-major raw stream — position-
    sensitive, so any unfilter/row-order defect shifts it."""
    width, height, ch, grid = png_pixels(payload)
    flat = grid.reshape(-1).astype(np.int64)
    return {
        "width": width,
        "height": height,
        "channels": ch,
        "bit_depth": 8,
        "byte_sum": int(flat.sum()),
        "wsum": int(((np.arange(len(flat), dtype=np.int64) + 1) * flat)
                    .sum()),
    }


# ------------------------------------------------------------------ JPEG
# Real baseline JPEG (ISO/IEC 10918-1), stdlib + numpy only: marker walk
# (DQT/SOF0/DHT/SOS), byte-stuffed bit reader, canonical Huffman decode
# of DC categories AND general AC run-length/size symbols, dequantize,
# dezigzag, exact 2-D IDCT, level shift, clamp.  The encoder writes the
# Annex-K standard Huffman tables and entropy-codes DC-ONLY blocks: an
# 8x8 block whose pixels are a constant c has DC = 8·(c−128) and all AC
# zero, and the IDCT of that spectrum is exactly c again — no float
# rounding ambiguity — so a REAL lossy-codec bitstream round-trips
# losslessly and the decoded aggregates stay closed-form for the DuckDB
# oracle (block constants follow a (seed + a·b) % 256 lattice).
JPEG_W = 64
JPEG_H = 32
JPEG_BLOCK_STEP = 31  # block-constant lattice step

# Annex K.3.3.1/2: luminance DC + AC code lengths and symbol values
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc_th] + bits + vals)


def encode_jpeg(seed: int, width: int = JPEG_W, height: int = JPEG_H,
                ac: dict[int, int] | None = None) -> bytes:
    """Real baseline grayscale JPEG: 8x8 blocks, block b a constant
    c_b = (seed + 31·b) % 256, quant table all ones, Annex-K Huffman
    tables, DC diffs entropy-coded + per-block EOB.  Losslessly
    round-trips (see module note) through a genuinely lossy codec path.

    ``ac``: optional {zigzag_index (1..63): coefficient} injected into
    every block — exercises the AC run-length/ZRL decode paths (used by
    the tests against a brute-force IDCT reference)."""
    if width % 8 or height % 8:
        raise ValueError("dimensions must be multiples of 8")
    bw, bh = width // 8, height // 8
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    ac_items = sorted((ac or {}).items())
    w = _BitWriter()
    prev_dc = 0
    for b in range(bw * bh):
        c = (seed + JPEG_BLOCK_STEP * b) % 256
        dc = 8 * (c - 128)
        diff = dc - prev_dc
        prev_dc = dc
        mag = abs(diff)
        size = mag.bit_length()
        code, ln = dc_codes[size]
        w.put(code, ln)
        if size:
            amp = diff if diff >= 0 else diff + (1 << size) - 1
            w.put(amp, size)
        k = 1
        for idx, v in ac_items:
            run = idx - k
            while run > 15:  # ZRL
                zc, zl = ac_codes[0xF0]
                w.put(zc, zl)
                run -= 16
            size = abs(v).bit_length()
            sc, sl = ac_codes[(run << 4) | size]
            w.put(sc, sl)
            amp = v if v >= 0 else v + (1 << size) - 1
            w.put(amp, size)
            k = idx + 1
        if k < 64:
            eob, eln = ac_codes[0x00]
            w.put(eob, eln)
    scan = w.flush()
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT: table 0, all 1s
    out += _seg(
        0xC0,  # SOF0: 8-bit, 1 component, 1x1 sampling, quant table 0
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    out += _seg(0xC4, _dht_body(0x00, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, _dht_body(0x10, _AC_BITS, _AC_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Byte-stuffed entropy-segment bit reader (0xFF 0x00 -> 0xFF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy segment")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("marker inside entropy segment")
            self.acc, self.n = byte, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_tree(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol: the encode table's canonical
    enumeration (_huff_codes), orientation inverted."""
    return {
        (ln, code): sym
        for sym, (code, ln) in _huff_codes(bits, vals).items()
    }


def _read_symbol(r: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | r.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a `size`-bit amplitude to its signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


_IDCT_M = None


def _idct_matrix() -> np.ndarray:
    global _IDCT_M
    if _IDCT_M is None:
        m = np.zeros((8, 8))
        for u in range(8):
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            for x in range(8):
                m[x, u] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
        _IDCT_M = m
    return _IDCT_M


def jpeg_pixels(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Full baseline decode -> (width, height, pixel grid (h, w) uint8).
    Grayscale (1-component) baseline sequential, no restart intervals."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, n = 2, len(payload)
    qt: dict[int, np.ndarray] = {}
    huff: dict[int, dict] = {}
    width = height = 0
    comp_q = comp_dc = comp_ac = 0
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            bpos = 0
            while bpos < len(body):
                pq_tq = body[bpos]
                if pq_tq >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                qt[pq_tq & 15] = np.frombuffer(
                    body, np.uint8, 64, bpos + 1
                ).astype(np.int32)
                bpos += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if nc != 1:
                raise ValueError("only grayscale baseline supported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            bpos = 0
            while bpos < len(body):
                tc_th = body[bpos]
                bits = list(body[bpos + 1:bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + nv])
                huff[tc_th] = _huff_decode_tree(bits, vals)
                bpos += 17 + nv
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS: entropy data follows
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 15
            pos += 2 + ln
            break
        pos += 2 + ln
    else:
        raise ValueError("missing SOS")
    if not width or not height:
        raise ValueError("missing SOF0")
    if comp_q not in qt:
        raise ValueError("missing quant table")
    dc_tab = huff.get(0x00 | comp_dc)
    ac_tab = huff.get(0x10 | comp_ac)
    if dc_tab is None or ac_tab is None:
        raise ValueError("missing Huffman table")
    if width % 8 or height % 8:
        raise ValueError("partial MCUs unsupported")
    r = _BitReader(payload, pos)
    q = qt[comp_q]
    m = _idct_matrix()
    bw, bh = width // 8, height // 8
    out = np.empty((height, width), dtype=np.uint8)
    prev_dc = 0
    for b in range(bw * bh):
        zz = np.zeros(64, dtype=np.int32)
        size = _read_symbol(r, dc_tab)
        diff = _extend(r.bits(size), size) if size else 0
        prev_dc += diff
        zz[0] = prev_dc
        k = 1
        while k < 64:
            rs = _read_symbol(r, ac_tab)
            run, size = rs >> 4, rs & 15
            if size == 0:
                if run == 15:  # ZRL: sixteen zeros
                    k += 16
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(r.bits(size), size)
            k += 1
        coef = np.zeros(64, dtype=np.int64)
        coef[_ZIGZAG] = zz * q
        block = m @ coef.reshape(8, 8).astype(np.float64) @ m.T
        px = np.clip(np.floor(block + 128.0 + 0.5), 0, 255).astype(np.uint8)
        by, bx = divmod(b, bw)
        out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = px
    return int(width), int(height), out


def decode_jpeg(payload: bytes) -> dict:
    """Parse geometry and aggregate the decoded pixels.  Returns
    {width, height, n_components, byte_sum, wsum}; wsum = Σ(k+1)·px[k]
    row-major — position-sensitive, so a misplaced block cannot cancel."""
    width, height, grid = jpeg_pixels(payload)
    flat = grid.reshape(-1).astype(np.int64)
    return {
        "width": width,
        "height": height,
        "n_components": 1,
        "byte_sum": int(flat.sum()),
        "wsum": int(((np.arange(len(flat), dtype=np.int64) + 1) * flat)
                    .sum()),
    }


FRAME_LEN = 100  # samples per analysis frame
FRAME_STEP = 2  # keep every FRAME_STEP-th frame (the frame-sample)


def wav_frame_stats(payload: bytes, frame_len: int = FRAME_LEN,
                    step: int = FRAME_STEP) -> list[tuple[int, int, int]]:
    """Frame-sample the mono stream: cut into ``frame_len``-sample
    frames, keep frame indices 0, step, 2*step, ...; per kept frame
    return (frame_id, n_samples, abs_sum).  The |x| pass is one numpy
    op; the per-KEPT-FRAME slice loop is payload-bounded (n/frame_len/
    step iterations), never per sample.  A trailing partial frame is
    kept with its true length."""
    channels, _rate, samples = wav_samples(payload)
    if channels != 1:
        raise ValueError("frame stats expect mono")
    s = np.abs(samples.astype(np.int64))
    n_frames = -(-len(s) // frame_len)
    out = []
    for fi in range(0, n_frames, step):
        fr = s[fi * frame_len:(fi + 1) * frame_len]
        out.append((fi, int(len(fr)), int(fr.sum())))
    return out
