"""Multimodal plumbing tests: schema, batch shape, determinism, stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dazzleduck_sql_duckdb_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    deterministic_fake_decoder,
    extract_features,
    frame_sample_plan,
    media_dedup_keys,
    stub_decoder,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "jpeg", 64, 48, None, b"\xff\xd8fakejpegbytes"),
        (2, "image", "png", 32, 32, None, b"\x89PNGfakepngbytes"),
        (3, "audio", "wav", None, None, 2500, b"RIFFfakewavbytes"),
        (4, "video", "mp4", 640, 360, 3200, b"\x00\x00ftypfakemp4"),
        (5, "image", "jpeg", 64, 48, None, b"\xff\xd8fakejpegbytes"),  # dup of 1
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_stub_decoder_is_gated():
    with pytest.raises(NotImplementedError):
        stub_decoder(b"anything")


def test_extract_features_stub_surfaces_in_spark(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media).collect()


def test_extract_features_fake_decoder(spark, media):
    out = extract_features(media, decoder=deterministic_fake_decoder)
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert out.columns == [
        "media_id", "kind", "n_bytes", "content_sha256", "feature",
    ]
    for r in rows.values():
        assert len(r.feature) == 16
    # deterministic: same payload -> same sha + same feature
    assert rows[1].content_sha256 == rows[5].content_sha256
    assert rows[1].feature == rows[5].feature
    assert rows[1].feature != rows[2].feature
    # sha matches hashlib ground truth
    want = hashlib.sha256(b"\xff\xd8fakejpegbytes").hexdigest()
    assert rows[1].content_sha256 == want
    assert rows[1].n_bytes == len(b"\xff\xd8fakejpegbytes")


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # only the video row expands; 3200ms -> 3 frames at 0/1000/2000
    assert {(r.media_id, r.frame_idx, r.frame_ts_ms) for r in frames} == {
        (4, 0, 0), (4, 1, 1000), (4, 2, 2000),
    }


def test_media_dedup_keys_jvm_side(spark, media):
    keys = media_dedup_keys(media)
    rows = {r.media_id: r.content_sha256 for r in keys.collect()}
    assert rows[1] == rows[5]
    assert rows[1] != rows[2]
    dupes = (
        keys.groupBy("content_sha256")
        .agg(F.count(F.lit(1)).alias("n"))
        .where("n > 1")
        .collect()
    )
    assert len(dupes) == 1 and dupes[0].n == 2
    # plan check: no Python UDF in the exact-dedup path (stays JVM-side)
    plan = keys._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_resize_block_mean_exact(spark, media):
    """Resize kernel law: an 8x8 fake-decoded image block-mean'd to 4x4
    equals the numpy reference computed locally, byte for byte."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        resize_images,
    )

    out = {
        r.media_id: r
        for r in resize_images(
            media, out_hw=(4, 4), decoder=deterministic_fake_decoder
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    payload = b"\xff\xd8fakejpegbytes"
    img = deterministic_fake_decoder(payload).astype(np.float64)
    want = (
        img.reshape(4, 2, 4, 2).mean(axis=(1, 3)).round().astype(np.uint8)
    )
    got = np.frombuffer(out[1].pixels, dtype=np.uint8).reshape(4, 4)
    assert (got == want).all()
    assert out[1].out_h == 4 and out[1].out_w == 4
    # exact duplicate payloads resize identically
    assert out[5].pixels == out[1].pixels


def test_resize_handles_non_divisible_shapes(spark):
    """5x7 -> 2x3: integer bucketing puts every source pixel in exactly
    one output cell and each cell averages only its own pixels."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    img = np.arange(35, dtype=np.uint8).reshape(5, 7)
    df = spark.createDataFrame(
        [(9, "image", "raw", 7, 5, None, b"irrelevant")], schema=MEDIA_SCHEMA
    )
    out = resize_images(df, out_hw=(2, 3), decoder=lambda b: img).collect()[0]
    got = np.frombuffer(out.pixels, dtype=np.uint8).reshape(2, 3)
    oh, ow = 2, 3
    ri = (np.arange(5) * oh) // 5
    ci = (np.arange(7) * ow) // 7
    want = np.zeros((oh, ow)); cnt = np.zeros((oh, ow))
    np.add.at(want, (ri[:, None], ci[None, :]), img.astype(float))
    np.add.at(cnt, (ri[:, None], ci[None, :]), 1)
    assert (got == (want / cnt).round().astype(np.uint8)).all()


# ----------------------------------------------- real pure-numpy codecs


def test_ppm_golden_and_roundtrip():
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        decode_ppm, encode_ppm,
    )

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    assert (decode_ppm(encode_ppm(gray)) == gray).all()
    # header comments + golden bytes: 1x1 red pixel
    p = b"P6\n# comment line\n1 1\n255\n\xff\x00\x00"
    got = decode_ppm(p)
    assert got.shape == (1, 1, 3) and tuple(got[0, 0]) == (255, 0, 0)


def test_bmp_golden_and_roundtrip():
    """w=3 exercises the 4-byte row stride padding; encode is bottom-up
    BGR (the format's quirks), decode must undo both."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        decode_bmp, encode_bmp,
    )

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_bmp(encode_bmp(img)) == img).all()
    one = np.array([[[255, 0, 0]]], dtype=np.uint8)
    raw = encode_bmp(one)
    # golden: BGR on disk -> blue byte first in the raster
    assert raw[54:57] == b"\x00\x00\xff"
    assert (decode_bmp(raw) == one).all()


def test_wav_pcm_roundtrip_and_8bit():
    import struct

    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        decode_wav, encode_wav,
    )

    s = np.linspace(-0.9, 0.9, 32).reshape(16, 2)
    out = decode_wav(encode_wav(s, sample_rate=8000))
    assert out.shape == (16, 2)
    assert np.abs(out - s).max() < 1 / 32768 + 1e-6
    assert decode_wav(encode_wav(np.array([0.0, 0.5]))).shape == (2, 1)
    # hand-built 8-bit mono file (unsigned samples centered at 128)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255])
    wav8 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    o = decode_wav(wav8)
    assert abs(o[0, 0] + 1.0) < 1e-6 and abs(o[1, 0]) < 1e-6


def test_decode_media_dispatch():
    import numpy as np
    import pytest as _pytest

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        decode_media, encode_png, encode_ppm,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_media(encode_ppm(img), "ppm").shape == (2, 2, 3)
    assert decode_media(encode_png(img), "png").shape == (2, 2, 3)
    from dazzleduck_sql_duckdb_spark.operators.jpeg import encode_jpeg

    assert decode_media(encode_jpeg(img), "jpeg").shape == (2, 2, 3)
    with _pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"\x00\x00\x00\x18ftypmp42", "mp4")


def test_png_roundtrip_gray_rgb_rgba():
    """encode_png (filter-0 rows, zlib IDAT) -> decode_png is identity
    for gray/(h,w), RGB/(h,w,3), RGBA/(h,w,4) at every tested shape —
    the REAL stdlib-zlib DEFLATE path, no codec library."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        decode_png, encode_png,
    )

    rng = np.random.default_rng(7)
    for shape in [(5, 7), (8, 8, 3), (4, 6, 4), (1, 1), (3, 2, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape and (out == img).all(), shape


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    crc = zlib.crc32(typ + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + typ + body + struct.pack(">I", crc)


def _filter_row(row, prev, bpp: int, t: int):
    """Reference per-byte PNG row filter (RFC 2083 §6), the encoder
    side of each filter type — deliberately independent code from the
    decoder's unfilter loop."""
    import numpy as np

    row = row.astype(np.int64)
    prev = prev.astype(np.int64)
    if t == 0:
        return row.astype(np.uint8)
    out = np.empty_like(row)
    for x in range(len(row)):
        left = row[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if t == 1:
            pred = left
        elif t == 2:
            pred = up
        elif t == 3:
            pred = (left + up) // 2
        else:
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
        out[x] = (row[x] - pred) & 0xFF
    return out.astype(np.uint8)


def test_png_unfilters_all_five_row_filters():
    """Hand-filter rows with every filter type (independent reference
    implementation) and require decode_png to reconstruct the exact
    pixels — covers none/sub/up/average/paeth across gray, RGB, RGBA,
    and gray+alpha."""
    import struct
    import zlib

    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        _PNG_SIG, decode_png,
    )

    rng = np.random.default_rng(11)
    for ch, ctype in [(1, 0), (3, 2), (4, 6), (2, 4)]:
        h, w = 6, 5
        img = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
        raw = b""
        prev = np.zeros(w * ch, np.uint8)
        for y in range(h):
            t = [1, 2, 3, 4, 0, 4][y]
            raw += bytes([t]) + _filter_row(img[y], prev, ch, t).tobytes()
            prev = img[y]
        payload = (
            _PNG_SIG
            + _png_chunk(
                b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
            )
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )
        out = decode_png(payload)
        want = img.reshape(h, w) if ch == 1 else img.reshape(h, w, ch)
        assert (out == want).all(), f"ctype={ctype}"


def test_png_palette_and_split_idat():
    """Palette PNGs resolve through PLTE to (h,w,3); IDAT may arrive as
    several chunks whose concatenation is one DEFLATE stream."""
    import struct
    import zlib

    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        _PNG_SIG, decode_png,
    )

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(3, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == pal[idx]).all()

    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + img.reshape(4, 12)[y].tobytes() for y in range(4))
    comp = zlib.compress(raw)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", comp[:10])
        + _png_chunk(b"IDAT", comp[10:])
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == img).all()


def test_png_rejects_malformed():
    import pytest as _pytest

    from dazzleduck_sql_duckdb_spark.operators.multimodal import decode_png

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n1 1\n255\nabc")
    with _pytest.raises(ValueError, match="missing IHDR"):
        decode_png(b"\x89PNG\r\n\x1a\n")


def test_extract_features_real_ppm_decode(spark):
    """End-to-end REAL decode in the Spark pipeline: encode known pixel
    arrays as P6, run extract_features with decode_ppm, and match the
    numpy-reference pooled features exactly."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_ppm, encode_ppm, extract_features,
    )

    imgs = {
        11: np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3),
        12: np.full((4, 4, 3), 200, dtype=np.uint8),
    }
    rows = [
        (mid, "image", "ppm", img.shape[1], img.shape[0], None,
         encode_ppm(img))
        for mid, img in imgs.items()
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r.media_id: r
        for r in extract_features(df, decoder=decode_ppm).collect()
    }
    for mid, img in imgs.items():
        flat = img.astype(np.float64).ravel()
        pad = (-len(flat)) % 16
        if pad:
            flat = np.pad(flat, (0, pad))
        want = flat.reshape(16, -1).mean(axis=1).astype(np.float32)
        assert got[mid].feature == list(want)


def test_resize_real_rgb_ppm(spark):
    """resize_images over a REAL-decoded RGB image: channels are
    averaged to one plane, then block-mean'd."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        MEDIA_SCHEMA, encode_ppm, decode_ppm, resize_images,
    )

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    df = spark.createDataFrame(
        [(21, "image", "ppm", 8, 8, None, encode_ppm(img))],
        schema=MEDIA_SCHEMA,
    )
    out = resize_images(df, out_hw=(4, 4), decoder=decode_ppm).collect()[0]
    plane = img.astype(np.float64).mean(axis=2)
    want = plane.reshape(4, 2, 4, 2).mean(axis=(1, 3)).round().astype(np.uint8)
    got = np.frombuffer(out.pixels, dtype=np.uint8).reshape(4, 4)
    assert (got == want).all()


# --------------------------------------------------------- baseline JPEG


# ------------------------------------------------------------- MP4 boxes


def test_mp4_skeleton_round_trip_and_size_law():
    from dazzleduck_sql_duckdb_spark.operators.mp4 import (
        AUDIO_TRAK_BYTES, VIDEO_SKELETON_BYTES, encode_mp4_skeleton,
        parse_mp4_metadata,
    )

    p = encode_mp4_skeleton(123456, 640, 360, codec="hev1", mdat=b"hi")
    m = parse_mp4_metadata(p)
    assert m == {
        "major_brand": "isom",
        "timescale": 1000,
        "duration_ms": 123456,
        "n_tracks": 1,
        "codec": "hev1",
        "width": 640,
        "height": 360,
    }
    assert len(p) == VIDEO_SKELETON_BYTES + 2
    pa = encode_mp4_skeleton(
        7_200_000, 1920, 1080, codec="av01", with_audio=True, mdat=b"x" * 9
    )
    ma = parse_mp4_metadata(pa)
    assert (ma["n_tracks"], ma["codec"], ma["width"]) == (2, "av01", 1920)
    assert len(pa) == VIDEO_SKELETON_BYTES + AUDIO_TRAK_BYTES + 9
    # the audio trak must not shadow the video trak's codec/dims
    assert ma["duration_ms"] == 7_200_000


def test_mp4_parser_largesize_and_v1_and_corrupt():
    import struct

    from dazzleduck_sql_duckdb_spark.operators.mp4 import (
        encode_mp4_skeleton, parse_mp4_metadata,
    )

    p = encode_mp4_skeleton(500, 32, 16, mdat=b"abc")
    # rewrite the trailing mdat as a size==1 largesize box
    body = p[-3:]
    big = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 3) + body
    m = parse_mp4_metadata(p[: -(8 + 3)] + big)
    assert m["duration_ms"] == 500 and m["width"] == 32
    # version-1 mvhd (64-bit times) parses via the v1 offsets
    i = p.index(b"mvhd") - 4
    (size,) = struct.unpack_from(">I", p, i)
    v1_body = (
        b"\x01\x00\x00\x00"
        + struct.pack(">QQIQ", 0, 0, 90000, 90000 * 7)
        + p[i + 8 + 4 + 16 :i + size]
    )
    v1 = struct.pack(">I", 8 + len(v1_body)) + b"mvhd" + v1_body
    patched = p[:i] + v1 + p[i + size :]
    # fix the enclosing moov/total sizes: moov grew by len(v1) - size
    grow = len(v1) - size
    j = p.index(b"moov") - 4
    (moov_size,) = struct.unpack_from(">I", p, j)
    patched = (
        patched[:j]
        + struct.pack(">I", moov_size + grow)
        + patched[j + 4 :]
    )
    m1 = parse_mp4_metadata(patched)
    assert m1["timescale"] == 90000 and m1["duration_ms"] == 7000
    # corrupt: declared size overruns the buffer
    bad = struct.pack(">I", 9999) + b"free" + b"\x00" * 8
    with pytest.raises(ValueError):
        parse_mp4_metadata(p + bad)


def test_video_metadata_operator(spark):
    from dazzleduck_sql_duckdb_spark.operators.mp4 import (
        encode_mp4_skeleton, video_metadata,
    )

    rows = [
        (1, encode_mp4_skeleton(1000, 64, 32, codec="avc1")),
        (2, encode_mp4_skeleton(2000, 128, 64, codec="mp4v",
                                with_audio=True, mdat=b"y" * 5)),
    ]
    df = spark.createDataFrame(rows, "media_id BIGINT, payload BINARY")
    got = {r.media_id: r for r in video_metadata(df).collect()}
    assert got[1].codec == "avc1" and got[1].n_tracks == 1
    assert got[2].codec == "mp4v" and got[2].n_tracks == 2
    assert got[2].duration_ms == 2000 and got[2].width == 128
    assert got[2].n_bytes == len(rows[1][1])


def test_jpeg_uniform_blocks_byte_exact():
    """quant=1 + uniform 8x8 blocks: DC-only coefficients survive
    encode->huffman->decode->IDCT byte-exactly (the property the
    multimodal_jpeg_features oracle gate relies on)."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.default_rng(42)
    vals = rng.integers(0, 256, size=(8, 8)).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quant=1)), img)


def test_jpeg_accepts_ff_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; our encoder never pads but other baseline encoders do."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 256, size=(8, 8)).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    enc = encode_jpeg(img, quant=1)
    # pad before the first post-SOI marker and before EOI
    padded = (
        enc[:2] + b"\xff\xff\xff" + enc[2:-2] + b"\xff" + enc[-2:]
    )
    assert np.array_equal(decode_jpeg(padded), img)


def test_jpeg_gray_near_lossless_and_nonmultiple_size():
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(21, 37)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quant=1))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_rgb_444_and_420_and_dri():
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    xx, yy = np.meshgrid(np.arange(48), np.arange(32))
    smooth = np.stack(
        [(xx * 2 + yy) % 256, (xx + yy * 3) % 256, (yy * 2) % 256], axis=2
    ).astype(np.uint8)
    d444 = decode_jpeg(encode_jpeg(smooth, quant=1))
    assert np.abs(d444.astype(int) - smooth.astype(int)).max() <= 2
    d420 = decode_jpeg(encode_jpeg(smooth, quant=1, subsample=True))
    assert d420.shape == smooth.shape
    # chroma is 2x2 block-mean'd; a gradient loses little
    assert np.abs(d420.astype(int) - smooth.astype(int)).max() <= 4
    # DRI restart markers every 2 MCUs: decode resets DC predictors
    ddri = decode_jpeg(encode_jpeg(smooth, quant=1, restart_interval=2))
    assert np.abs(ddri.astype(int) - smooth.astype(int)).max() <= 2
    # constant image: 4:2:0 costs nothing -> exact
    const = np.full((32, 32, 3), 200, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(const, quant=1, subsample=True)), const
    )


def test_jpeg_rgb_422_roundtrip():
    """4:2:2 encode (2x1 luma sampling, horizontal chroma pair-mean —
    r10 verdict #7): gradients survive near-losslessly, a
    non-16-multiple width exercises the wide-MCU padding, and the
    gate fixture's r=g=b uniform-block construction (Y=v exactly,
    Cb=Cr=128 exactly) round-trips BIT-exactly — the law the
    multimodal_jpeg_features / multimodal_video_frames oracles rely
    on."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    smooth = np.stack(
        [(xx * 2 + yy) % 256, (xx + yy * 3) % 256, (yy * 2) % 256], axis=2
    ).astype(np.uint8)
    d422 = decode_jpeg(encode_jpeg(smooth, quant=1, subsample="422"))
    assert d422.shape == smooth.shape
    assert np.abs(d422.astype(int) - smooth.astype(int)).max() <= 4
    # the oracle-exactness law: uniform 8x8 blocks with r=g=b
    rng = np.random.RandomState(11)
    blocks = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    rgb = np.repeat(img[:, :, None], 3, 2)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb, quant=1, subsample="422")), rgb
    )
    # unknown modes refuse loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="subsample"):
        encode_jpeg(rgb, quant=1, subsample="411")


def test_jpeg_subsampled_uniform_block_exactness_property():
    """Property form of the gate-fixture exactness law, across random
    geometries: for ANY uniform-8x8-block image with r=g=b channels,
    encode at 4:2:2 or 4:2:0 with quant=1 round-trips BIT-exactly —
    including heights/widths that force MCU edge-replicate padding
    (the padded region replicates constant blocks, so every luma
    block stays constant and chroma stays exactly 128)."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.RandomState(20260816)
    for trial in range(6):
        bh, bw = rng.randint(1, 5), rng.randint(1, 5)
        blocks = rng.randint(0, 256, (bh, bw)).astype(np.uint8)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        rgb = np.repeat(img[:, :, None], 3, 2)
        for mode in ("422", "420"):
            out = decode_jpeg(encode_jpeg(rgb, quant=1, subsample=mode))
            assert out.shape == rgb.shape, (trial, mode, out.shape)
            assert np.array_equal(out, rgb), (trial, mode, bh, bw)


def test_jpeg_rejects_non_baseline():
    import numpy as np
    import pytest as _pytest

    from dazzleduck_sql_duckdb_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # flip SOF0 -> SOF2 (progressive) in a real stream: must raise
    enc = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(enc))


def test_jpeg_registered_as_real_decoder(spark):
    """decode_media('jpeg') goes through the real codec; the media
    feature pipeline decodes it end-to-end in mapInPandas."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.jpeg import encode_jpeg
    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_media, extract_features,
    )

    img = np.repeat(
        np.repeat(np.arange(64, dtype=np.uint8).reshape(8, 8), 8, 0), 8, 1
    )
    payload = encode_jpeg(img, quant=1)
    assert np.array_equal(decode_media(payload, "jpeg"), img)
    df = spark.createDataFrame(
        [(31, "image", "jpeg", 64, 64, None, payload)],
        schema=MEDIA_SCHEMA,
    )
    row = extract_features(
        df, decoder=lambda b: decode_media(b, "jpeg")
    ).collect()[0]
    flat = img.astype(np.float64).ravel()
    want = flat.reshape(16, -1).mean(axis=1).astype(np.float32)
    assert row.feature == list(want)


def test_mjpeg_mux_demux_roundtrip():
    """encode_mjpeg_mp4 <-> extract_video_samples: byte-exact frame
    recovery through REAL sample tables (stsz/stco/stsc), decodable
    pixels via the pure-python JPEG path, and container metadata
    (codec fourcc 'jpeg', 40 ms/frame duration) readable by the
    existing walker."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg,
    )
    from dazzleduck_sql_duckdb_spark.operators.mp4 import (
        encode_mjpeg_mp4, extract_video_samples, parse_mp4_metadata,
    )

    rng = np.random.default_rng(11)
    imgs, frames = [], []
    for _ in range(3):
        blocks = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
        imgs.append(img)
        frames.append(encode_jpeg(img, quant=1))
    payload = encode_mjpeg_mp4(64, 64, frames)

    codec, got = extract_video_samples(payload)
    assert codec == "jpeg"
    assert [bytes(g) for g in got] == frames  # byte-exact demux
    for img, fb in zip(imgs, got):
        assert np.array_equal(decode_jpeg(fb), img)  # pixel-exact

    meta = parse_mp4_metadata(payload)
    assert meta["codec"] == "jpeg"
    assert meta["duration_ms"] == 40 * len(frames)
    assert (meta["width"], meta["height"]) == (64, 64)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        extract_video_samples(b"\x00\x00\x00\x08free")


def test_video_frame_features_operator(spark):
    """One row per (media_id, frame_idx); MJPEG frames decode through
    the real codec path, non-MJPEG fourccs raise through stub_decoder
    (the per-codec boundary)."""
    import numpy as np

    from dazzleduck_sql_duckdb_spark.operators.jpeg import encode_jpeg
    from dazzleduck_sql_duckdb_spark.operators.mp4 import (
        encode_mjpeg_mp4,
    )
    from dazzleduck_sql_duckdb_spark.operators.multimodal import (
        video_frame_features,
    )

    def clip(n_frames, base):
        frames = []
        for f in range(n_frames):
            blocks = np.full((8, 8), base + f, dtype=np.uint8)
            img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
            frames.append(encode_jpeg(img, quant=1))
        return encode_mjpeg_mp4(64, 64, frames)

    media = spark.createDataFrame(
        [(1, clip(2, 10)), (2, clip(1, 99))],
        schema="media_id LONG, payload BINARY",
    )
    rows = video_frame_features(media).collect()
    got = {
        (r.media_id, r.frame_idx): (r.codec, [round(x) for x in r.feature])
        for r in rows
    }
    assert set(got) == {(1, 0), (1, 1), (2, 0)}
    # a constant image pools to the constant in every chunk
    assert got[(1, 0)] == ("jpeg", [10] * 16)
    assert got[(1, 1)] == ("jpeg", [11] * 16)
    assert got[(2, 0)] == ("jpeg", [99] * 16)


def test_mjpeg_roundtrip_property():
    """Property: ANY frame list (arbitrary counts and byte contents —
    the demuxer never looks inside a sample) round-trips byte-exactly
    through mux -> sample-table demux, and the container metadata
    holds duration = 40 ms * n. Driver-only (no Spark), so hypothesis
    can afford many examples."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dazzleduck_sql_duckdb_spark.operators.mp4 import (
        encode_mjpeg_mp4, extract_video_samples, parse_mp4_metadata,
    )

    frames_st = st.lists(
        st.binary(min_size=0, max_size=4096), min_size=1, max_size=12
    )

    @given(frames=frames_st, w=st.integers(1, 4096), h=st.integers(1, 4096))
    @settings(max_examples=120, deadline=None)
    def law(frames, w, h):
        payload = encode_mjpeg_mp4(w, h, frames)
        codec, got = extract_video_samples(payload)
        assert codec == "jpeg"
        assert [bytes(g) for g in got] == frames
        meta = parse_mp4_metadata(payload)
        assert meta["duration_ms"] == 40 * len(frames)
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["n_tracks"] == 1

    law()


def test_extract_video_samples_reads_co64():
    """Large/foreign MP4s carry 64-bit co64 chunk offsets instead of
    stco (advisor finding r7: these were rejected as 'no video track'
    before). Surgically rewrite a muxed file's stco into co64 — fixing
    every ancestor box size and the +4 payload shift — and demux it
    byte-exactly."""
    import struct

    from dazzleduck_sql_duckdb_spark.operators.mp4 import (
        _boxes, encode_mjpeg_mp4, extract_video_samples,
    )

    frames = [b"\xff\xd8frame-%d\xff\xd9" % i for i in range(5)]
    mp4 = encode_mjpeg_mp4(32, 16, frames)
    codec, got = extract_video_samples(mp4)
    assert codec == "jpeg" and got == frames

    # locate the stco box and every ancestor box containing it
    containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

    def find_stco(buf, start, end, ancestors):
        for typ, b0, b1 in _boxes(buf, start, end):
            if typ == b"stco":
                return b0 - 8, ancestors  # box start incl. header
            if typ in containers:
                hit = find_stco(buf, b0, b1, ancestors + [b0 - 8])
                if hit:
                    return hit
        return None

    stco_at, ancestors = find_stco(mp4, 0, len(mp4), [])
    (old_off,) = struct.unpack_from(">I", mp4, stco_at + 16)
    co64 = (
        struct.pack(">I", 24) + b"co64" + struct.pack(">I", 0)
        + struct.pack(">IQ", 1, old_off + 4)  # box grows by 4 bytes
    )
    buf = bytearray(mp4[:stco_at] + co64 + mp4[stco_at + 20:])
    for a in ancestors:  # moov/trak/mdia/minf/stbl each grow by 4
        (sz,) = struct.unpack_from(">I", buf, a)
        struct.pack_into(">I", buf, a, sz + 4)
    codec2, got2 = extract_video_samples(bytes(buf))
    assert codec2 == "jpeg" and got2 == frames
