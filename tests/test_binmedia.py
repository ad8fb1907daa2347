"""Pure-Python binary media codecs + the real decode stage
(functions/binmedia.py, stages/media.py:BinaryMediaDecodeStage)."""
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_bmp_roundtrip_and_padding():
    from web_content_extraction_benchmark_ray.functions.binmedia import (
        BMP_PIX_STEP,
        decode_bmp,
        encode_bmp,
    )

    for seed, w, h in ((0, 64, 16), (255, 31, 3), (77, 5, 9)):
        d = decode_bmp(encode_bmp(seed, width=w, height=h))
        n = w * h * 3
        expect = int(
            ((seed + BMP_PIX_STEP * np.arange(n, dtype=np.int64)) % 256).sum()
        )
        assert d == {
            "width": w, "height": h, "bpp": 24, "byte_sum": expect,
        }


def test_wav_roundtrip():
    from web_content_extraction_benchmark_ray.functions.binmedia import (
        WAV_MOD,
        WAV_RATE,
        WAV_STEP,
        decode_wav,
        encode_wav,
    )

    for seed in (0, 1000, 2000):
        d = decode_wav(encode_wav(seed))
        s = ((seed + WAV_STEP * np.arange(1000, dtype=np.int64)) % WAV_MOD
             ) - (WAV_MOD - 1) // 2
        assert d["n_channels"] == 1
        assert d["sample_rate"] == WAV_RATE
        assert d["n_samples"] == 1000
        assert d["abs_sum"] == int(np.abs(s).sum())


def test_decoders_reject_garbage():
    from web_content_extraction_benchmark_ray.functions.binmedia import (
        decode_bmp,
        decode_wav,
        encode_bmp,
    )

    with pytest.raises(ValueError):
        decode_bmp(b"GIF89a not a bmp")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI LIST")
    # bpp guard
    bad = bytearray(encode_bmp(1))
    bad[28] = 8
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))


def test_media_decode_stage_isolates_errors(ray_session):
    import pyarrow as pa
    import ray.data

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        encode_bmp,
        encode_wav,
    )
    from web_content_extraction_benchmark_ray.stages.media import (
        decode_binary_media,
    )

    rows = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "fmt": pa.array(["bmp", "wav", "bmp", "png"], pa.string()),
            "payload": pa.array(
                [encode_bmp(3), encode_wav(9), b"corrupt", b"\x89PNG"],
                pa.binary(),
            ),
        }
    )
    out = (
        decode_binary_media(ray.data.from_arrow(rows))
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert out.loc[1, "error"] == "" and out.loc[1, "width"] == 64
    assert out.loc[2, "error"] == "" and out.loc[2, "n_samples"] == 1000
    # corrupt payload and unknown format error per-item, job completes
    assert out.loc[3, "error"] != ""
    assert out.loc[4, "error"] != ""


def test_media_decode_query_matches_oracle(ray_session):
    import duckdb

    from web_content_extraction_benchmark_ray.pipelines.dataops import (
        media_decode,
    )
    from web_content_extraction_benchmark_ray.pipelines.dataops_oracles import (
        dataops_oracle_sql,
    )

    df = media_decode(SF).to_pandas().sort_values("media_id").reset_index(
        drop=True
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    odf = (
        con.sql(dataops_oracle_sql()["media_decode"])
        .df()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert df.sort_index(axis=1).equals(odf.sort_index(axis=1))


# ------------------------------------------------------------------- PDF
def test_pdf_roundtrip_compressed_and_raw():
    from web_content_extraction_benchmark_ray.functions.pdf import (
        decode_pdf_text,
        encode_pdf,
    )

    lines = [
        "hello world one",
        "two (parens) and \\ backslash",
        "third line here",
        "x",
    ]
    for compress in (True, False):
        payload = encode_pdf(lines, compress=compress)
        assert payload.startswith(b"%PDF-1.4")
        assert b"%%EOF" in payload
        assert decode_pdf_text(payload) == "\n".join(lines)
    # compressed payload must not contain the plaintext
    assert b"hello world" not in encode_pdf(lines, compress=True)


def test_pdf_decodes_foreign_fixture():
    """A hand-written PDF the encoder did not produce: uncompressed
    stream, escaped parens, octal escape, TJ kerning array."""
    from web_content_extraction_benchmark_ray.functions.pdf import (
        decode_pdf_text,
    )

    foreign = (
        b"%PDF-1.1\n1 0 obj\n<< /Length 90 >>\nstream\n"
        b"BT /F1 10 Tf 50 700 Td (First \\(foreign\\) \\101 line) Tj "
        b"0 -12 Td [(A) -50 (B C)] TJ ET\nendstream\nendobj\n%%EOF\n"
    )
    assert decode_pdf_text(foreign) == "First (foreign) A line\nAB C"


def test_pdf_crlf_separator_honors_length():
    """CRLF stream/endstream separators (spec-legal) must not defeat the
    /Length validation: this fixture's Flate data is a stored-block
    deflate that contains the literal bytes b'endstream', so the
    find()-based fallback scan would truncate it — the decode only
    succeeds if the declared /Length is trusted."""
    import zlib as _zlib

    from web_content_extraction_benchmark_ray.functions.pdf import (
        decode_pdf_text,
    )

    content = b"BT /F1 10 Tf 50 700 Td (endstream inside) Tj ET"
    data = _zlib.compress(content, 0)  # stored block: raw bytes verbatim
    assert b"endstream" in data
    pdf = (
        b"%PDF-1.2\n1 0 obj\n<< /Length "
        + str(len(data)).encode()
        + b" /Filter /FlateDecode >>\nstream\r\n"
        + data
        + b"\r\nendstream\nendobj\n%%EOF\n"
    )
    assert decode_pdf_text(pdf) == "endstream inside"


def test_pdf_decoder_rejects_garbage():
    import pytest as _pytest

    from web_content_extraction_benchmark_ray.functions.pdf import (
        decode_pdf_text,
    )

    with _pytest.raises(ValueError):
        decode_pdf_text(b"not a pdf at all")
    with _pytest.raises(ValueError):
        # valid header, corrupt Flate stream
        decode_pdf_text(
            b"%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /FlateDecode >>\n"
            b"stream\n\x00\x01\x02\x03\nendstream\nendobj\n"
        )


def test_pdf_roundtrip_property():
    """Hypothesis: any printable line set (incl. parens, backslashes,
    escape-lookalikes) round-trips exactly through encode -> decode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web_content_extraction_benchmark_ray.functions.pdf import (
        decode_pdf_text,
        encode_pdf,
    )

    line = st.text(
        alphabet=st.characters(
            min_codepoint=0x20, max_codepoint=0x7E
        ),
        min_size=1,
        max_size=60,
    )

    @given(st.lists(line, min_size=1, max_size=6), st.booleans())
    @settings(max_examples=60, deadline=None)
    def check(lines, compress):
        payload = encode_pdf(lines, compress=compress)
        assert decode_pdf_text(payload) == "\n".join(lines)

    check()


def test_resize_bmp_nn_odd_geometry_roundtrip():
    """NN downscale of a padded odd-width BMP: output equals the direct
    numpy subsample of the decoded pixel grid (ceil survivors, padding
    re-derived for the new width)."""
    import numpy as np

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        decode_bmp,
        encode_bmp,
        resize_bmp_nn,
    )

    src = encode_bmp(seed=123, width=5, height=3)  # stride padding != 0
    out = resize_bmp_nn(src, 2, 2)
    d = decode_bmp(out)
    assert (d["width"], d["height"]) == (3, 2)  # ceil(5/2), ceil(3/2)
    # expected: rows 0,2 and pixel columns 0,2,4 of the source grid
    n = 5 * 3 * 3
    pix = ((123 + 17 * np.arange(n, dtype=np.int64)) % 256).reshape(3, 5, 3)
    expect = pix[::2, ::2]
    assert d["byte_sum"] == int(expect.sum())


def test_resize_bmp_nn_rejects_non_bmp():
    import pytest

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        resize_bmp_nn,
    )

    with pytest.raises(ValueError):
        resize_bmp_nn(b"GIF89a not a bmp")


def test_wav_frame_stats_trailing_partial_frame():
    """A 250-sample stream at frame_len=100, step=2 keeps frames 0 and 2;
    frame 2 is the 50-sample tail."""
    import numpy as np

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        encode_wav,
        wav_frame_stats,
    )

    payload = encode_wav(seed=5, n_samples=250)
    got = wav_frame_stats(payload, frame_len=100, step=2)
    s = np.abs((((5 + 37 * np.arange(250, dtype=np.int64)) % 2001) - 1000))
    assert got == [
        (0, 100, int(s[0:100].sum())),
        (2, 50, int(s[200:250].sum())),
    ]


def test_wav_frame_stats_matches_decode_totals():
    """Step=1 frames partition the stream: their abs_sums add up to the
    whole-stream abs_sum the decoder reports."""
    from web_content_extraction_benchmark_ray.functions.binmedia import (
        decode_wav,
        encode_wav,
        wav_frame_stats,
    )

    payload = encode_wav(seed=77)
    frames = wav_frame_stats(payload, step=1)
    assert sum(s for _, _, s in frames) == decode_wav(payload)["abs_sum"]
    assert sum(n for _, n, _ in frames) == decode_wav(payload)["n_samples"]


def test_resize_bmp_nn_preserves_top_down_orientation():
    """A negative-height (top-down) BMP must resize to a top-down BMP
    whose kept rows are the top-down grid's rows 0, 2, ..."""
    import struct

    import numpy as np

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        _parse_bmp,
        _wrap_bmp,
        resize_bmp_nn,
    )

    grid = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    src = _wrap_bmp(grid, top_down=True)
    assert struct.unpack_from("<Iii", src, 14)[2] == -4  # declared top-down
    out = resize_bmp_nn(src, 2, 2)
    w, h, got = _parse_bmp(out)
    assert (w, h) == (3, -2)  # orientation survives
    assert np.array_equal(got, grid[::2, ::2])


def test_media_frames_stage_skips_bad_payloads(ray_session):
    """One malformed payload contributes zero rows; the good one still
    explodes into frames."""
    import pyarrow as pa

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        encode_wav,
    )
    from web_content_extraction_benchmark_ray.stages.media import (
        MediaFramesStage,
    )

    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [b"not a wav at all", encode_wav(seed=3)], pa.binary()
            ),
        }
    )
    out = MediaFramesStage()(batch)
    assert set(out.column("media_id").to_pylist()) == {2}
    assert out.num_rows == 5  # frames 0,2,4,6,8 of the 1000-sample wav


def test_bloom_normalizes_odd_bit_counts(ray_session):
    """m values that are not word multiples must not crash and must stay
    consistent between build and probe (both normalize)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from web_content_extraction_benchmark_ray.stages.bloom import (
        bloom_contains,
        bloom_from_hashes,
    )

    hs = np.arange(1, 300, dtype=np.int64) * 7919
    ds = rd.from_arrow(pa.table({"h": hs}))
    for m in (1, 63, 100, 130):
        bloom = bloom_from_hashes(ds, "h", m)
        assert bloom_contains(bloom, hs, m).all(), m


def test_png_roundtrip_all_filters():
    """encode_png filters row r with type r % 5, so one payload covers
    every unfilter path; the decoded raw stream must equal the lattice."""
    import numpy as np

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        PNG_H,
        PNG_PIX_STEP,
        PNG_W,
        decode_png,
        encode_png,
        png_pixels,
    )

    for seed in (0, 7, 200):
        payload = encode_png(seed)
        w, h, ch, grid = png_pixels(payload)
        assert (w, h, ch) == (PNG_W, PNG_H, 3)
        n = w * h * ch
        raw = ((seed + PNG_PIX_STEP * np.arange(n, dtype=np.int64)) % 256
               ).astype(np.uint8)
        assert (grid.reshape(-1) == raw).all()
        d = decode_png(payload)
        assert d["byte_sum"] == int(raw.astype(np.int64).sum())
        assert d["wsum"] == int(
            ((np.arange(n, dtype=np.int64) + 1) * raw).sum()
        )


def test_png_color_types_and_rejections():
    from web_content_extraction_benchmark_ray.functions.binmedia import (
        decode_png,
        encode_png,
    )

    # grayscale and RGBA variants decode with the right channel count
    for ct, ch in ((0, 1), (6, 4)):
        d = decode_png(encode_png(42, width=20, height=10, color_type=ct))
        assert (d["width"], d["height"], d["channels"]) == (20, 10, ch)
    # CRC corruption, truncation, and non-PNG bytes all raise ValueError
    import pytest

    good = bytearray(encode_png(9))
    good[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(good))
    with pytest.raises(ValueError):
        decode_png(encode_png(9)[:30])
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")


def test_png_decode_stage_isolates_errors(ray_session):
    import pyarrow as pa

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        encode_png,
    )
    from web_content_extraction_benchmark_ray.stages.media import (
        PngDecodeStage,
    )

    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [b"garbage bytes", encode_png(seed=5)], pa.binary()
            ),
        }
    )
    out = PngDecodeStage()(batch)
    rows = {r["media_id"]: r for r in out.to_pylist()}
    assert rows[1]["error"] and rows[1]["width"] == 0
    assert not rows[2]["error"] and rows[2]["width"] > 0


def test_jpeg_dconly_roundtrip_exact():
    """DC-only blocks survive the lossy codec path exactly: block b
    decodes to its constant (seed + 31b) % 256 for any correct IDCT."""
    import numpy as np

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        JPEG_BLOCK_STEP,
        JPEG_H,
        JPEG_W,
        decode_jpeg,
        encode_jpeg,
        jpeg_pixels,
    )

    for seed in (0, 7, 129, 255):
        w, h, grid = jpeg_pixels(encode_jpeg(seed))
        assert (w, h) == (JPEG_W, JPEG_H)
        bw = w // 8
        for b in range(bw * (h // 8)):
            c = (seed + JPEG_BLOCK_STEP * b) % 256
            by, bx = divmod(b, bw)
            assert (grid[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] == c).all()
        d = decode_jpeg(encode_jpeg(seed))
        exp = sum(
            64 * ((seed + JPEG_BLOCK_STEP * b) % 256)
            for b in range(bw * (h // 8))
        )
        assert d["byte_sum"] == exp
        # the closed-form block position weight the oracle uses
        exp_w = sum(
            ((seed + JPEG_BLOCK_STEP * b) % 256)
            * (32768 * (b // 8) + 512 * (b % 8) + 14624)
            for b in range(bw * (h // 8))
        )
        assert d["wsum"] == exp_w
        assert np.int64(d["wsum"]) > 0


def test_jpeg_ac_paths_match_brute_idct():
    """General AC decode (runs, ZRL, negative amplitudes, size-10
    coefficients, a k=63 coefficient) against an independent brute-force
    IDCT restatement."""
    import numpy as np

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        _ZIGZAG,
        JPEG_BLOCK_STEP,
        encode_jpeg,
        jpeg_pixels,
    )

    def brute(dc_vals, ac):
        m = np.zeros((8, 8))
        for u in range(8):
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            for x in range(8):
                m[x, u] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
        out = []
        for dc in dc_vals:
            coef = np.zeros(64)
            coef[_ZIGZAG[0]] = dc
            for idx, v in ac.items():
                coef[_ZIGZAG[idx]] = v
            blk = m @ coef.reshape(8, 8) @ m.T
            out.append(np.clip(np.floor(blk + 128.5), 0, 255).astype(np.uint8))
        return out

    seed = 11
    for ac in ({1: 5}, {1: -3, 5: 7}, {2: 4, 20: -9, 40: 12}, {63: 3},
               {17: -1000}):
        w, h, grid = jpeg_pixels(encode_jpeg(seed, width=32, height=16, ac=ac))
        bw = w // 8
        dcs = [
            8 * (((seed + JPEG_BLOCK_STEP * b) % 256) - 128)
            for b in range(bw * (h // 8))
        ]
        ref = brute(dcs, ac)
        for b in range(len(dcs)):
            by, bx = divmod(b, bw)
            assert (
                grid[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] == ref[b]
            ).all(), (ac, b)


def test_jpeg_rejections():
    import pytest

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(1)[:40])


def test_jpeg_decode_stage_isolates_errors(ray_session):
    import pyarrow as pa

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        encode_jpeg,
    )
    from web_content_extraction_benchmark_ray.stages.media import (
        JpegDecodeStage,
    )

    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [b"garbage", encode_jpeg(seed=5)], pa.binary()
            ),
        }
    )
    out = JpegDecodeStage()(batch)
    rows = {r["media_id"]: r for r in out.to_pylist()}
    assert rows[1]["error"] and rows[1]["width"] == 0
    assert not rows[2]["error"] and rows[2]["width"] == 64


def test_png_property_arbitrary_content_roundtrips():
    """PNG is lossless: ANY byte content survives the filter pipeline
    (all five types across the rows) — hypothesis over random grids,
    geometries and color types."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        encode_png,
        png_pixels,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(0, 2**32 - 1),
        st.sampled_from([(1, 5), (3, 7), (8, 8), (16, 5), (5, 16)]),
        st.sampled_from([0, 2, 4, 6]),
    )
    def check(rng_seed, wh, color_type):
        w, h = wh
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
        rng = np.random.default_rng(rng_seed)
        raw = rng.integers(0, 256, size=h * w * ch, dtype=np.int64).astype(
            np.uint8
        )
        payload = encode_png(0, width=w, height=h, color_type=color_type,
                             raw=raw)
        dw, dh, dch, grid = png_pixels(payload)
        assert (dw, dh, dch) == (w, h, ch)
        assert (grid.reshape(-1) == raw).all()

    check()


def test_jpeg_property_random_spectra_match_brute_idct():
    """Hypothesis over random AC coefficient sets (random positions incl.
    long zero runs, random signs/magnitudes up to size-10) and random
    geometries: the Huffman+IDCT decode equals the brute restatement."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web_content_extraction_benchmark_ray.functions.binmedia import (
        _ZIGZAG,
        JPEG_BLOCK_STEP,
        encode_jpeg,
        jpeg_pixels,
    )

    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[x, u] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(0, 255),
        st.dictionaries(
            st.integers(1, 63),
            st.integers(-1000, 1000).filter(lambda v: v != 0),
            max_size=6,
        ),
        st.sampled_from([(8, 8), (16, 8), (32, 16)]),
    )
    def check(seed, ac, wh):
        w, h = wh
        _, _, grid = jpeg_pixels(encode_jpeg(seed, width=w, height=h, ac=ac))
        bw = w // 8
        for b in range(bw * (h // 8)):
            coef = np.zeros(64)
            coef[_ZIGZAG[0]] = 8 * (((seed + JPEG_BLOCK_STEP * b) % 256)
                                    - 128)
            for idx, v in ac.items():
                coef[_ZIGZAG[idx]] = v
            blk = m @ coef.reshape(8, 8) @ m.T
            ref = np.clip(np.floor(blk + 128.5), 0, 255).astype(np.uint8)
            by, bx = divmod(b, bw)
            assert (grid[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                    == ref).all()

    check()
