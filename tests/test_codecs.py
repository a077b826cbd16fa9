"""Stdlib media codecs (operators/codecs.py): WAV/BMP round-trips,
feature extraction, real BMP resize, and the Spark mapInPandas
integration."""

import math

import numpy as np
import pytest

from vscode_parquet_visualizer_spark.operators import codecs
from vscode_parquet_visualizer_spark.operators.codecs import (
    bmp_features,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    media_features,
    resize_bmp,
    sniff_format,
    wav_features,
)


def _sine(freq=440.0, rate=16000, secs=0.25):
    t = np.arange(int(rate * secs)) / rate
    return np.sin(2 * math.pi * freq * t)


def _gradient(h=16, w=24):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    img[:, :, 2] = 7
    return img


def test_wav_round_trip():
    x = _sine()
    payload = encode_wav(x, 16000)
    assert sniff_format(payload) == "wav"
    back, rate = decode_wav(payload)
    assert rate == 16000
    assert back.shape == (len(x), 1)
    assert np.abs(back[:, 0] - x).max() < 1e-3  # PCM16 quantization


def test_wav_features_values():
    payload = encode_wav(_sine(secs=0.5), 16000)
    f = wav_features(payload)
    assert len(f) == 8
    assert abs(f[0] - 0.5) < 1e-6  # duration
    assert abs(f[1] - 1 / math.sqrt(2)) < 0.01  # sine RMS
    assert 0.99 <= f[2] <= 1.0  # peak
    assert 0.04 < f[3] < 0.07  # zcr ≈ 2*440/16000


def test_bmp_round_trip_and_padding():
    for w in (24, 25, 26, 27):  # exercise 4-byte row padding
        img = _gradient(w=w)
        payload = encode_bmp(img)
        assert sniff_format(payload) == "bmp"
        back = decode_bmp(payload)
        assert back.shape == img.shape
        assert np.array_equal(back, img)


def test_bmp_features_values():
    img = _gradient()
    f = bmp_features(encode_bmp(img))
    assert f[0] == 24.0 and f[1] == 16.0
    assert abs(f[4] - 7 / 255) < 1e-4  # blue channel constant
    assert f[7] == pytest.approx(1.5)  # aspect


def test_resize_bmp_real():
    img = _gradient(h=16, w=24)
    small = decode_bmp(resize_bmp(encode_bmp(img), 12, 8))
    assert small.shape == (8, 12, 3)
    # nearest-neighbor keeps exact source values
    assert all(v in img[:, :, 0] for v in np.unique(small[:, :, 0]))


def test_media_features_dispatch_and_fallback():
    wavf = media_features(encode_wav(_sine()))
    bmpf = media_features(encode_bmp(_gradient()))
    other = media_features(b"\x00" * 64)
    assert len(wavf) == len(bmpf) == len(other) == 8
    assert wavf != bmpf != other


def test_extract_features_with_real_codecs(spark):
    """The full Arrow-batched pipeline over a table of REAL wav/bmp
    payloads — codec decode happens inside mapInPandas workers."""
    from vscode_parquet_visualizer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_images,
    )

    rows = []
    for i in range(6):
        if i % 2 == 0:
            payload = encode_wav(_sine(freq=200 + 100 * i), 8000)
            rows.append((i, payload, "audio", (None, None, 8000, 250)))
        else:
            payload = encode_bmp(_gradient(h=8 + i, w=12))
            rows.append((i, payload, "image", (12, 8 + i, None, None)))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(2)
    out = {
        r["id"]: r["feature"]
        for r in extract_features(df, decode_fn=media_features).collect()
    }
    assert len(out) == 6
    assert abs(out[1][0] - 12.0) < 1e-6  # bmp width feature
    assert out[0][2] > 0.9  # wav peak
    # real resize through the pipeline (BMP rows only)
    resized = resize_images(
        df.filter("media_type = 'image'"), 6, 4
    ).collect()
    assert all(
        decode_bmp(bytes(r["media"])).shape == (4, 6, 3) for r in resized
    )


# ------------------------------------------------------------------ netpbm


def test_ppm_roundtrip():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = codecs.encode_ppm(img)
    assert payload.startswith(b"P6\n3 2\n255\n")
    assert np.array_equal(codecs.decode_pnm(payload), img)


def test_pgm_decodes_to_three_channels():
    gray = np.array([[0, 128], [255, 64]], dtype=np.uint8)
    payload = codecs.encode_pgm(gray)
    img = codecs.decode_pnm(payload)
    assert img.shape == (2, 2, 3)
    assert np.array_equal(img[:, :, 0], gray)
    assert np.array_equal(img[:, :, 1], gray)


def test_pnm_header_comments_and_whitespace():
    raw = b"P5 # a comment\n# another\n 2\t2 \n255\n" + bytes([1, 2, 3, 4])
    img = codecs.decode_pnm(raw)
    assert img.shape == (2, 2, 3) and img[1, 1, 0] == 4


def test_pnm_features_and_resize():
    img = np.zeros((4, 8, 3), dtype=np.uint8)
    img[:, 4:, :] = 255  # left black, right white
    payload = codecs.encode_ppm(img)
    feats = codecs.pnm_features(payload)
    assert feats[0] == 8.0 and feats[1] == 4.0
    assert feats[2] == pytest.approx(0.5, abs=0.01)  # half white
    small = codecs.resize_pnm(payload, 4, 2)
    simg = codecs.decode_pnm(small)
    assert simg.shape == (2, 4, 3)
    assert simg[0, 0, 0] == 0 and simg[0, 3, 0] == 255


def test_sniff_and_dispatch_pnm():
    img = np.full((3, 3, 3), 7, dtype=np.uint8)
    payload = codecs.encode_ppm(img)
    assert codecs.sniff_format(payload) == "pnm"
    feats = codecs.media_features(payload)
    assert feats[0] == 3.0 and feats[2] == pytest.approx(7 / 255, abs=1e-4)


def test_pnm_rejects_bad_inputs():
    with pytest.raises(ValueError):
        codecs.decode_pnm(b"P3\n1 1\n255\n1 2 3")  # ASCII netpbm: unsupported
    with pytest.raises(ValueError):
        codecs.encode_ppm(np.zeros((2, 2), dtype=np.uint8))


# ------------------------------------------------------------------ PNG


def _grad_img(h, w):
    rr = np.arange(h)[:, None, None]
    cc = np.arange(w)[None, :, None]
    kk = np.arange(3)[None, None, :]
    return ((rr * 37 + cc * 11 + kk * 71) % 256).astype(np.uint8)


def test_png_round_trip():
    from vscode_parquet_visualizer_spark.operators.codecs import (
        decode_png,
        encode_png,
        sniff_format,
    )

    img = _grad_img(9, 13)
    payload = encode_png(img)
    assert sniff_format(payload) == "png"
    assert np.array_equal(decode_png(payload), img)


def test_png_all_filter_types_decode():
    """Hand-build a PNG whose five scanlines use filter types 0-4 and
    check the unfilter math byte-for-byte against the spec recurrences."""
    import struct
    import zlib

    from vscode_parquet_visualizer_spark.operators.codecs import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
    )

    w, h, bpp = 4, 5, 3
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(h, w, bpp), dtype=np.uint16).astype(np.uint8)

    def paeth(a, b, c):
        p = int(a) + int(b) - int(c)
        pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
        if pa <= pb and pa <= pc:
            return int(a)
        return int(b) if pb <= pc else int(c)

    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        ftype = y % 5
        cur = img[y].reshape(-1).astype(np.int64)
        filt = np.zeros(w * bpp, dtype=np.int64)
        for i in range(w * bpp):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                filt[i] = cur[i]
            elif ftype == 1:
                filt[i] = (cur[i] - a) % 256
            elif ftype == 2:
                filt[i] = (cur[i] - b) % 256
            elif ftype == 3:
                filt[i] = (cur[i] - (a + b) // 2) % 256
            else:
                filt[i] = (cur[i] - paeth(a, b, c)) % 256
        raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_png_rgba_and_gray_decode():
    import struct
    import zlib

    from vscode_parquet_visualizer_spark.operators.codecs import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
    )

    # RGBA (color type 6): alpha dropped
    w, h = 3, 2
    rgba = np.arange(w * h * 4, dtype=np.uint8).reshape(h, w, 4)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    p = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(p), rgba[:, :, :3])
    # grayscale (color type 0): broadcast to RGB
    gray = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    p = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(p)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_png_resize_and_features():
    from vscode_parquet_visualizer_spark.operators.codecs import (
        decode_png,
        encode_png,
        media_features,
        png_features,
        resize_png,
    )

    img = _grad_img(6, 8)
    payload = encode_png(img)
    f = png_features(payload)
    assert f[0] == 8.0 and f[1] == 6.0
    assert media_features(payload) == f  # dispatch reaches the PNG codec
    small = resize_png(payload, 4, 3)
    assert decode_png(small).shape == (3, 4, 3)


def test_png_unsupported_loud():
    import struct
    import zlib

    import pytest as _pytest

    from vscode_parquet_visualizer_spark.operators.codecs import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
    )

    # 16-bit depth must fail loudly, not silently misdecode
    p = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError):
        decode_png(p)
