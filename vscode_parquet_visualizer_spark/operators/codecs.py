"""Real media codecs with zero external dependencies.

The multimodal pipeline (operators/multimodal.py) treats media as opaque
binary columns with injectable decoders. Two real formats are decodable
with the standard library alone, so they get first-class codecs here —
turning the "codec injection point" from a stub into a working path:

- **WAV** (RIFF PCM) via the stdlib ``wave`` module → samples → audio
  features (duration, RMS, peak, zero-crossing rate, coarse energy
  envelope).
- **BMP** (uncompressed 24/32-bit BITMAPINFOHEADER) via ``struct`` →
  HxWx3 array → image features (dimensions, channel means, grayscale
  std) and a real nearest-neighbor resize (decode → index-sample →
  re-encode).
- **PNG** (8-bit RGB/RGBA/gray, non-interlaced) via ``zlib`` + ``struct``:
  chunk walk, IDAT inflate, per-scanline unfilter (all five filter
  types — None/Sub/Up/Average/Paeth) → HxWx3 array; encoder emits
  filter-0 RGB with proper CRCs.

JPEG/MP4 still require Pillow/ffmpeg (absent from this container) and
keep the loud NotImplementedError injection points. Encoders for the
decodable formats are included so tests and synthetic pipelines
round-trip real bytes.

Everything here is per-payload pure Python/NumPy and runs inside the
Arrow-batched ``mapInPandas`` workers — no driver involvement, scales
with partitions.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """PCM16 mono/stereo WAV bytes from float samples in [-1, 1]
    (shape: (n,) or (n, channels))."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(arr * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float samples in [-1, 1] shaped (n, channels),
    sample_rate). PCM 8/16/32-bit."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, nch), rate


def wav_features(payload: bytes, dim: int = 8) -> list[float]:
    """Fixed-dim audio feature: [duration_s, rms, peak, zero-crossing
    rate, 4 coarse energy-envelope quarters]. ``dim`` >= 8; extra slots
    zero-padded so features align with other modalities."""
    samples, rate = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = len(mono)
    if n == 0:
        return [0.0] * dim
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    quarters = [
        float(np.sqrt(np.mean(q**2))) if len(q) else 0.0
        for q in np.array_split(mono, 4)
    ]
    feats = [n / rate, rms, peak, zcr, *quarters]
    feats = [round(f, 6) for f in feats]
    return (feats + [0.0] * dim)[:dim]


# --------------------------------------------------------------------------
# BMP (uncompressed BITMAPINFOHEADER, 24- or 32-bit)
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array → 24-bit uncompressed BMP bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp expects an HxWx3 RGB array")
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up rows
        row = arr[y][:, ::-1]  # RGB → BGR
        body += row.tobytes() + pad
    return header + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24/32-bit uncompressed BMP bytes → HxWx3 uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    flip = h > 0
    h = abs(h)
    nb = bpp // 8
    row_size = (w * nb + 3) & ~3
    rows = []
    for y in range(h):
        off = data_off + y * row_size
        row = np.frombuffer(payload, dtype=np.uint8, count=w * nb, offset=off)
        rows.append(row.reshape(w, nb)[:, :3][:, ::-1])  # BGR → RGB
    img = np.stack(rows)
    return img[::-1] if flip else img


def bmp_features(payload: bytes, dim: int = 8) -> list[float]:
    """Fixed-dim image feature: [width, height, mean_r, mean_g, mean_b,
    grayscale std, edge-energy proxy, aspect ratio]."""
    img = decode_bmp(payload).astype(np.float64)
    h, w, _ = img.shape
    gray = img.mean(axis=2)
    dx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    feats = [
        float(w),
        float(h),
        float(img[:, :, 0].mean() / 255.0),
        float(img[:, :, 1].mean() / 255.0),
        float(img[:, :, 2].mean() / 255.0),
        float(gray.std() / 255.0),
        float(dx / 255.0),
        float(w / h if h else 0.0),
    ]
    feats = [round(f, 6) for f in feats]
    return (feats + [0.0] * dim)[:dim]


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor BMP resize: decode → index-sample →
    re-encode. The injectable ``resize_fn`` for BMP media."""
    img = decode_bmp(payload)
    h, w, _ = img.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_bmp(img[ys][:, xs])


# --------------------------------------------------------------------------
# netpbm (PGM P5 grayscale / PPM P6 RGB) — the simplest real image
# container: ASCII header (magic, width, height, maxval) + raw samples.
# Widely produced by scientific tooling; stdlib-decodable.
# --------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 → binary PPM (P6, maxval 255)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_ppm expects an HxWx3 array")
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_pgm(pixels: np.ndarray) -> bytes:
    """HxW uint8 → binary PGM (P5, maxval 255)."""
    if pixels.ndim != 2:
        raise ValueError("encode_pgm expects an HxW array")
    h, w = pixels.shape
    return b"P5\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a P5/P6 header (whitespace/comment tolerant) → (magic, w, h,
    maxval, data_offset)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    return magic, w, h, maxval, i


def decode_pnm(payload: bytes) -> np.ndarray:
    """P6 → HxWx3 uint8; P5 → HxWx3 (grayscale replicated) so every
    image codec yields the same array contract as decode_bmp."""
    magic, w, h, _maxval, off = _pnm_header(payload)
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    img = raw.reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def pnm_features(payload: bytes, dim: int = 8) -> list[float]:
    """Same feature contract as bmp_features, over the decoded array."""
    img = decode_pnm(payload).astype(np.float64)
    h, w, _ = img.shape
    gray = img.mean(axis=2)
    dx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    feats = [
        float(w),
        float(h),
        float(img[:, :, 0].mean() / 255.0),
        float(img[:, :, 1].mean() / 255.0),
        float(img[:, :, 2].mean() / 255.0),
        float(gray.std() / 255.0),
        float(dx / 255.0),
        float(w / h if h else 0.0),
    ]
    return ([round(f, 6) for f in feats] + [0.0] * dim)[:dim]


def resize_pnm(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize; always re-encodes as P6 (the decode
    contract is 3-channel)."""
    img = decode_pnm(payload)
    h, w, _ = img.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_ppm(img[ys][:, xs])


# --------------------------------------------------------------------------
# PNG (8-bit RGB / RGBA / grayscale, non-interlaced — stdlib zlib only)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array → PNG bytes (8-bit truecolor, filter 0,
    non-interlaced, one zlib-deflated IDAT)."""
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects an HxWx3 RGB array")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8 RGB array. Supports 8-bit color types
    0 (gray, broadcast to RGB), 2 (RGB) and 6 (RGBA, alpha dropped),
    non-interlaced, all five scanline filters. Anything else (palette,
    16-bit, Adam7) raises loudly."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    w = h = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace != 0:
                raise NotImplementedError("interlaced (Adam7) PNG")
            channels = {0: 1, 2: 3, 6: 4}.get(ctype)
            if channels is None:
                raise NotImplementedError(f"PNG color type {ctype}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    data = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(data) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    bpp = channels
    for y in range(h):
        ftype = data[y * (stride + 1)]
        row = np.frombuffer(
            data, dtype=np.uint8,
            count=stride, offset=y * (stride + 1) + 1,
        ).astype(np.int64)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub: cumulative per channel offset
            cur = row.reshape(w, bpp).cumsum(axis=0).reshape(stride) % 256
        elif ftype == 2:  # Up
            cur = (row + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: sequential per byte
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ftype == 3:
                    cur[i] = (row[i] + (a + b) // 2) % 256
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    cur[i] = (row[i] + _paeth(int(a), int(b), int(c))) % 256
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3].copy()


def png_features(payload: bytes, dim: int = 8) -> list[float]:
    """Same feature contract as bmp_features, over the decoded array."""
    img = decode_png(payload).astype(np.float64)
    h, w, _ = img.shape
    gray = img.mean(axis=2)
    dx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    feats = [
        float(w),
        float(h),
        float(img[:, :, 0].mean() / 255.0),
        float(img[:, :, 1].mean() / 255.0),
        float(img[:, :, 2].mean() / 255.0),
        float(gray.std() / 255.0),
        float(dx / 255.0),
        float(w / h if h else 0.0),
    ]
    return ([round(f, 6) for f in feats] + [0.0] * dim)[:dim]


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize; re-encodes as 8-bit RGB filter-0 PNG."""
    img = decode_png(payload)
    h, w, _ = img.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_png(img[ys][:, xs])


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte sniffing: 'wav' | 'bmp' | 'pnm' | None (unknown)."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return "pnm"
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    return None


def media_features(payload: bytes, dim: int = 8) -> list[float]:
    """Codec-backed feature extraction: real decode for WAV/BMP/netpbm,
    the deterministic byte-histogram fallback for unknown formats (so
    mixed tables never fail mid-job)."""
    from vscode_parquet_visualizer_spark.operators.multimodal import (
        deterministic_fake_decode,
    )

    fmt = sniff_format(payload)
    if fmt == "wav":
        return wav_features(payload, dim)
    if fmt == "bmp":
        return bmp_features(payload, dim)
    if fmt == "pnm":
        return pnm_features(payload, dim)
    if fmt == "png":
        return png_features(payload, dim)
    return deterministic_fake_decode(payload, dim)
