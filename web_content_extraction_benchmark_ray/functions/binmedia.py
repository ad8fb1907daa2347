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
               color_type: int = 2) -> bytes:
    """Real 8-bit PNG; raw byte k = (seed + 29*k) % 256, row r filtered
    with type r % 5 (so None/Sub/Up/Average/Paeth all appear)."""
    import zlib

    ch = _PNG_CHANNELS[color_type]
    rb = width * ch  # bytes per scanline
    raw = ((seed + PNG_PIX_STEP * np.arange(height * rb, dtype=np.int64))
           % 256).astype(np.uint8).reshape(height, rb)
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
