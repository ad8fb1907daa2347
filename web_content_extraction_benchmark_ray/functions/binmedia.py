"""Pure-Python binary media codecs — REAL decoders for the multimodal
path, no third-party libraries.

The sandbox ships no image/audio libs, but two standard formats are
parseable with nothing beyond ``struct``/numpy: uncompressed 24-bit BMP
(BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows padded to 4 bytes)
and 16-bit PCM WAV (RIFF chunk walk).  ``decode_bmp``/``decode_wav`` are
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


def _wrap_bmp(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Pack an (h, w, 3) uint8 pixel-byte grid (file-row order) into a
    24-bit BMP with the same header layout encode_bmp emits.
    ``top_down=True`` writes a negative height so the file declares the
    same row orientation the grid was read in."""
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
