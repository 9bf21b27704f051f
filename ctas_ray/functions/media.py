"""[graft] Pure-numpy media codecs: WAV/PCM audio and BMP/PPM images.

No third-party media library exists in this environment, but these
container formats are simple public standards (RIFF/WAVE, Windows
BITMAPINFOHEADER, netpbm P6) decodable with numpy alone — so the
multimodal pipeline's decode step is REAL for image and audio, not a
stub. Video stays stubbed (no container/codec parsing is feasible in
numpy); its frame-sampling plumbing is exercised via multi-frame BMP
concatenation (see stages/multimodal.py).

Encoders exist only to synthesize deterministic test/benchmark payloads
(the driver testdata has no media column); decoders are the product.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_wav",
    "decode_wav",
    "encode_bmp",
    "decode_bmp",
    "encode_ppm",
    "decode_ppm",
    "resize_area",
    "rgb_to_luma",
    "audio_features",
    "image_features",
]


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE. ``samples`` is float in [-1, 1] or
    int16."""
    if samples.dtype != np.int16:
        samples = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
        samples = np.round(samples * 32767.0).astype("<i2")
    else:
        samples = samples.astype("<i2", copy=False)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    out = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )
    return out


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> (float64 samples in [-1, 1], sample_rate).

    Supports PCM (format 1) 8/16/32-bit mono or multichannel (channels
    are averaged to mono). Walks RIFF chunks, so extra chunks (LIST,
    fact, ...) are fine.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    rate = channels = bits = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAVE format code {audio_fmt} (PCM only)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:  # 8-bit WAV is unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    if channels and channels > 1:
        n = (len(x) // channels) * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    return x, int(rate)


def audio_features(samples: np.ndarray, rate: int) -> dict[str, float]:
    """Vectorized descriptors of one PCM clip: duration, RMS energy,
    peak, zero-crossing rate, dominant frequency and spectral centroid
    (rFFT)."""
    n = len(samples)
    if n == 0:
        return {
            "duration_s": 0.0, "rms": 0.0, "peak": 0.0,
            "zcr": 0.0, "dominant_hz": 0.0, "centroid_hz": 0.0,
        }
    rms = float(np.sqrt(np.mean(samples * samples)))
    peak = float(np.max(np.abs(samples)))
    zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
    spec = np.abs(np.fft.rfft(samples))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    power = spec * spec
    tot = power.sum()
    centroid = float((freqs * power).sum() / tot) if tot > 0 else 0.0
    dominant = float(freqs[int(np.argmax(spec))]) if tot > 0 else 0.0
    return {
        "duration_s": n / rate,
        "rms": rms,
        "peak": peak,
        "zcr": zcr,
        "dominant_hz": dominant,
        "centroid_hz": centroid,
    }


# ---------------------------------------------------------------- BMP

def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> uncompressed 24-bit BI_RGB BMP (bottom-up
    rows, BGR byte order, 4-byte row padding — per the public format)."""
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    bgr = img[::-1, :, ::-1]  # bottom-up, RGB->BGR
    if pad:
        rows = np.zeros((h, row + pad), dtype=np.uint8)
        rows[:, :row] = bgr.reshape(h, row)
    else:
        rows = bgr.reshape(h, row)
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> HxWx3 uint8 RGB array.

    Handles both bottom-up (positive height) and top-down (negative
    height) images and the 4-byte row padding."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError("unsupported BMP header (pre-BITMAPINFOHEADER)")
    planes, bits = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bits != 24 or compression != 0:
        raise ValueError(f"unsupported BMP ({bits}-bit, compression {compression})")
    top_down = h < 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    img = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------- PPM

def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> binary netpbm P6."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm P6 -> HxWx3 uint8 RGB (comments supported)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens; '#' starts a comment to end of line
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 P6 supported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3).copy()


# ------------------------------------------------------- image kernels

def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize (the right kernel for thumbnail/feature
    downscale). Fully vectorized: each output pixel averages the
    box-overlapped input pixels via a separable cumulative-sum pass."""
    img_f = img.astype(np.float64)
    h, w = img.shape[:2]

    def axis_weights(n_in: int, n_out: int) -> np.ndarray:
        # (n_out, n_in) row-stochastic box-overlap matrix — built from
        # interval intersections, exact for any ratio
        edges_in = np.arange(n_in + 1)
        edges_out = np.linspace(0, n_in, n_out + 1)
        lo = np.maximum.outer(edges_out[:-1], edges_in[:-1])
        hi = np.minimum.outer(edges_out[1:], edges_in[1:])
        wts = np.clip(hi - lo, 0, None)
        return wts / wts.sum(axis=1, keepdims=True)

    wy = axis_weights(h, out_h)
    wx = axis_weights(w, out_w)
    # (out_h, w, c) then (out_h, out_w, c)
    tmp = np.tensordot(wy, img_f, axes=(1, 0))
    out = np.tensordot(tmp, wx, axes=(1, 1))
    if out.ndim == 3:
        out = np.moveaxis(out, 2, 1)
    return out


def rgb_to_luma(img: np.ndarray) -> np.ndarray:
    """Rec. 601 luma."""
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def image_features(img: np.ndarray, thumb: int = 8) -> dict[str, object]:
    """Descriptors of one RGB image: per-channel means/stds, luma
    stats, edge energy (finite differences) and a thumb x thumb luma
    thumbnail (the embedding-ish vector downstream stages consume)."""
    f = img.astype(np.float64)
    luma = rgb_to_luma(f)
    gy = np.abs(np.diff(luma, axis=0)).mean() if img.shape[0] > 1 else 0.0
    gx = np.abs(np.diff(luma, axis=1)).mean() if img.shape[1] > 1 else 0.0
    thumb_v = resize_area(luma[..., None], thumb, thumb)[..., 0].ravel() / 255.0
    return {
        "height": int(img.shape[0]),
        "width": int(img.shape[1]),
        "mean_r": float(f[..., 0].mean()),
        "mean_g": float(f[..., 1].mean()),
        "mean_b": float(f[..., 2].mean()),
        "std_luma": float(luma.std()),
        "edge_energy": float(gx + gy),
        "thumb": thumb_v.astype(np.float32),
    }
