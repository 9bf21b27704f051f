"""[graft] Multimodal column plumbing: image/audio/video as opaque
``binary`` columns with typed metadata, processed by actor-pool
map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container — clearly marked below); everything Ray-side is real and
tested: schema, batch sizing, actor signature, output layout. Swapping
the stub for a real decoder (PIL / torchaudio / pyav) changes only the
body of ``_decode_impl``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

__all__ = ["MEDIA_SCHEMA", "MediaFeatureStage", "extract_media_features", "fake_media_table"]

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


def fake_media_table(n: int = 64, seed: int = 3) -> pa.Table:
    """Deterministic fake media payloads for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(16, 4096, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 4096, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 600_000, n).astype(np.int32)),
            "mime": pa.array(["application/octet-stream"] * n),
        }
    )


def _decode_impl(kind: str, payload: bytes, strict: bool) -> np.ndarray:
    """STUB — the real decoder is not available in this container.

    strict=True raises NotImplementedError (the honest production
    behaviour until a codec library is installed); strict=False returns
    a deterministic fake feature vector derived from the payload bytes
    so the distributed plumbing can be exercised end to end.
    """
    if strict:
        raise NotImplementedError(
            f"no {kind} decoder available in this environment; "
            "install PIL/torchaudio/pyav and replace _decode_impl"
        )
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0


class MediaFeatureStage:
    """Actor-pool stage: decoder/model state loads ONCE per actor.
    Batches must stay SMALL for large binary payloads (the caller sets
    batch_size; see extract_media_features)."""

    def __init__(self, strict: bool = False) -> None:
        # real implementation: load the decoder + feature model here
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats = [
            _decode_impl(k, p, self.strict) for k, p in zip(kinds, payloads)
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def extract_media_features(
    media: rd.Dataset,
    strict: bool = False,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 16,
) -> rd.Dataset:
    """Decode/feature-extract pipeline: pyarrow batches end to end
    (binary columns must NOT round-trip through pandas), small
    batch_size so payload_bytes x batch x concurrency fits worker
    heaps."""
    return media.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
