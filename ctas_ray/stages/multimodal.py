"""[graft] Multimodal columns: image/audio/video as opaque ``binary``
columns with typed metadata, processed by map_batches stages over
pyarrow batches (binary payloads must NOT round-trip through pandas
object arrays).

The decode step is REAL for image and audio — pure-numpy decoders for
the public BMP / netpbm-P6 / RIFF-WAVE formats live in
``functions/media.py`` (no third-party media library exists in this
container, but those containers are numpy-decodable standards). Video
payloads are a concatenation of BMP frames (each BMP is self-framing
via its file-size header field, so the splitter parses the public
format, no custom container): frame-splitting, evenly-spaced frame
SAMPLING and per-frame decode are all real; a compressed-codec video
decoder (H.264 etc.) is the one thing that stays out of scope, and
``decode_video_frames`` raises a clear error on non-BMP frame data.

Scale notes (100 TB of media): payloads dominate block size, so the
stage runs with small ``batch_size`` and ``batch_format="pyarrow"``;
feature extraction is per-payload numpy (vectorized inside each
payload); the output drops the payload column so only small typed
features flow downstream.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.media import (
    audio_features,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    image_features,
)

__all__ = [
    "MEDIA_SCHEMA",
    "MediaFeatureStage",
    "extract_media_features",
    "fake_media_table",
    "split_bmp_frames",
    "decode_video_frames",
    "collect_features",
]

# one row per media object; payload is opaque binary + typed metadata
MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
        pa.field("mime", pa.string()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("payload_bytes", pa.int64()),
        pa.field("ok", pa.bool_()),
        # audio
        pa.field("duration_s", pa.float64()),
        pa.field("rms", pa.float64()),
        pa.field("zcr", pa.float64()),
        pa.field("dominant_hz", pa.float64()),
        pa.field("centroid_hz", pa.float64()),
        # image / video (video: averaged over sampled frames)
        pa.field("height", pa.int32()),
        pa.field("width", pa.int32()),
        pa.field("mean_r", pa.float64()),
        pa.field("mean_g", pa.float64()),
        pa.field("mean_b", pa.float64()),
        pa.field("std_luma", pa.float64()),
        pa.field("edge_energy", pa.float64()),
        pa.field("n_frames", pa.int32()),
        pa.field("thumb", pa.list_(pa.float32())),
    ]
)


def split_bmp_frames(payload: bytes) -> list[bytes]:
    """Split concatenated BMP frames. Each BMP carries its own byte
    length at offset 2 (BITMAPFILEHEADER.bfSize), so the stream is
    self-framing."""
    frames, pos, end = [], 0, len(payload)
    while pos + 6 <= end:
        if payload[pos : pos + 2] != b"BM":
            raise ValueError(f"video frame at byte {pos} is not BMP data")
        (size,) = struct.unpack_from("<I", payload, pos + 2)
        if size < 54 or pos + size > end:
            raise ValueError(f"corrupt BMP frame length {size} at byte {pos}")
        frames.append(payload[pos : pos + size])
        pos += size
    if pos != end:
        raise ValueError("trailing bytes after last BMP frame")
    return frames


def decode_video_frames(payload: bytes, sample: int | None = None) -> list[np.ndarray]:
    """Concatenated-BMP video -> decoded RGB frames. ``sample`` keeps
    only that many evenly-spaced frames (first and last included) —
    the frame-sampling operator a training pipeline needs."""
    frames = split_bmp_frames(payload)
    if sample is not None and 0 < sample < len(frames):
        idx = np.unique(np.linspace(0, len(frames) - 1, sample).round().astype(int))
        frames = [frames[i] for i in idx]
    return [decode_bmp(f) for f in frames]


def fake_media_table(n: int = 64, seed: int = 3) -> pa.Table:
    """Deterministic REAL media payloads (BMP images, PCM WAV clips,
    concatenated-BMP videos) for tests and benchmarks — synthesized,
    never read from disk, so the decode stage is genuinely exercised."""
    rng = np.random.default_rng(seed)
    kinds, payloads, widths, heights, durs, mimes = [], [], [], [], [], []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        kinds.append(kind)
        if kind == "image":
            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = (
                np.add.outer(np.arange(h) * 3, np.arange(w) * 5)[..., None]
                + np.array([0, 60, 120])
                + rng.integers(0, 32, (h, w, 3))
            ).astype(np.uint8)
            payloads.append(encode_bmp(img))
            widths.append(w); heights.append(h); durs.append(0)
            mimes.append("image/bmp")
        elif kind == "audio":
            rate = 8000
            n_s = int(rng.integers(rate // 4, rate))
            t = np.arange(n_s) / rate
            f0 = float(rng.integers(100, 2000))
            sig = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.1 * rng.standard_normal(n_s)
            payloads.append(encode_wav(sig / max(1.0, np.abs(sig).max()), rate))
            widths.append(0); heights.append(0); durs.append(int(1000 * n_s / rate))
            mimes.append("audio/wav")
        else:
            h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            k = int(rng.integers(2, 6))
            base = rng.integers(0, 200, (h, w, 3))
            frames = [
                encode_bmp(np.clip(base + 10 * j, 0, 255).astype(np.uint8))
                for j in range(k)
            ]
            payloads.append(b"".join(frames))
            widths.append(w); heights.append(h); durs.append(k * 40)
            mimes.append("video/x-bmp-frames")
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.array(widths, dtype=np.int32)),
            "height": pa.array(np.array(heights, dtype=np.int32)),
            "duration_ms": pa.array(np.array(durs, dtype=np.int32)),
            "mime": pa.array(mimes),
        }
    )


def _decode_one(kind: str, payload: bytes, frame_sample: int) -> dict | None:
    """Decode + featurize one payload; None on undecodable input."""
    if kind == "audio":
        x, rate = decode_wav(payload)
        return audio_features(x, rate)
    if kind == "image":
        img = decode_bmp(payload)
        f = image_features(img)
        f["n_frames"] = 1
        return f
    if kind == "video":
        imgs = decode_video_frames(payload, sample=frame_sample)
        feats = [image_features(im) for im in imgs]
        out: dict = {
            "height": feats[0]["height"],
            "width": feats[0]["width"],
            "n_frames": len(imgs),
            "thumb": np.mean([f["thumb"] for f in feats], axis=0).astype(np.float32),
        }
        for k in ("mean_r", "mean_g", "mean_b", "std_luma", "edge_energy"):
            out[k] = float(np.mean([f[k] for f in feats]))
        return out
    raise ValueError(f"unknown media kind {kind!r}")


class MediaFeatureStage:
    """map_batches stage: pyarrow in, pyarrow out; real decode per
    payload. ``strict=True`` raises on undecodable payloads; otherwise
    they become ``ok=False`` rows with null features. Batches must stay
    SMALL for large binary payloads (the caller sets batch_size)."""

    def __init__(self, strict: bool = False, frame_sample: int = 4) -> None:
        self.strict = strict
        self.frame_sample = frame_sample

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows: list[dict] = []
        for k, p in zip(kinds, payloads):
            try:
                f = _decode_one(k, p, self.frame_sample)
                f["ok"] = True
            except (ValueError, struct.error):
                if self.strict:
                    raise
                f = {"ok": False}
            rows.append(f)
        cols: dict[str, pa.Array] = {
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
        for field in FEATURE_SCHEMA:
            if field.name in cols:
                continue
            vals = [r.get(field.name) for r in rows]
            if field.name == "thumb":
                vals = [None if v is None else np.asarray(v) for v in vals]
            cols[field.name] = pa.array(vals, field.type)
        return pa.table(cols, schema=FEATURE_SCHEMA)


def collect_features(ds: rd.Dataset):
    """Materialize a (small) feature Dataset to pandas THROUGH pyarrow:
    ``Dataset.to_pandas`` casts list columns to Ray's tensor extension,
    which rejects nullable fixed-length lists (audio rows have null
    ``thumb``); pyarrow's own conversion keeps them as object lists."""
    tables = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        return FEATURE_SCHEMA.empty_table().to_pandas()
    return pa.concat_tables(tables).to_pandas(maps_as_pydicts="strict")


def extract_media_features(
    media: rd.Dataset,
    strict: bool = False,
    frame_sample: int = 4,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> rd.Dataset:
    """Decode/feature-extract pipeline: pyarrow batches end to end,
    small batch_size so payload_bytes x batch x concurrency fits worker
    heaps; the payload column is dropped at the stage boundary so only
    small typed features continue downstream."""
    return media.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"strict": strict, "frame_sample": frame_sample},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
