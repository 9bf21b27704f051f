"""Real-decode multimodal pipeline: pure-numpy WAV/BMP/PPM codecs
(functions/media.py) and the Ray feature stage (stages/multimodal.py).

Value-exact oracles: synthesized sine -> known dominant frequency/RMS,
constant-color BMP -> exact channel means, block image -> exact area
resize, concatenated-BMP video -> frame count and sampling pattern.
"""

from __future__ import annotations

import numpy as np
import pytest

from ctas_ray.functions.media import (
    audio_features,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    image_features,
    resize_area,
)
from ctas_ray.stages.multimodal import (
    collect_features,
    decode_video_frames,
    fake_media_table,
    split_bmp_frames,
)


class TestWav:
    def test_roundtrip_16bit(self):
        rng = np.random.default_rng(1)
        sig = np.clip(rng.standard_normal(5000) * 0.3, -1, 1)
        x, rate = decode_wav(encode_wav(sig, 16000))
        assert rate == 16000
        # quantization + the asymmetric 32767/32768 scale bound the error
        assert np.max(np.abs(x - sig)) < 1.5 / 32768

    def test_sine_features_exact(self):
        rate = 8000
        t = np.arange(rate) / rate
        x, _ = decode_wav(encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), rate))
        f = audio_features(x, rate)
        assert abs(f["dominant_hz"] - 440.0) < 1.0
        assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
        assert abs(f["duration_s"] - 1.0) < 1e-9

    def test_stereo_averaged_and_8bit(self):
        import struct

        # stereo 16-bit: two constant channels -> mono mean
        left = np.full(100, 0.25)
        right = np.full(100, -0.25)
        inter = np.empty(200)
        inter[0::2], inter[1::2] = left, right
        mono_bytes = encode_wav(inter, 8000)
        # patch channels=2 in fmt chunk (offset 12+8+2)
        b = bytearray(mono_bytes)
        struct.pack_into("<H", b, 22, 2)
        x, _ = decode_wav(bytes(b))
        assert np.allclose(x, 0.0, atol=1e-4)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_wav(b"not a wav at all")


class TestImages:
    def test_bmp_roundtrip_padded(self):
        rng = np.random.default_rng(2)
        for h, w in [(5, 3), (7, 7), (1, 9), (16, 2)]:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_ppm_roundtrip_and_comment(self):
        img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        with_comment = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
        assert np.array_equal(decode_ppm(with_comment), img)

    def test_constant_image_features_exact(self):
        img = np.zeros((10, 10, 3), dtype=np.uint8)
        img[..., 0], img[..., 1], img[..., 2] = 10, 20, 30
        f = image_features(decode_bmp(encode_bmp(img)))
        assert (f["mean_r"], f["mean_g"], f["mean_b"]) == (10.0, 20.0, 30.0)
        assert f["std_luma"] < 1e-12 and f["edge_energy"] == 0.0

    def test_resize_area_exact_blocks(self):
        a = np.zeros((4, 4, 1))
        a[:2, :2], a[:2, 2:], a[2:, :2], a[2:, 2:] = 1, 5, 7, 3
        assert np.allclose(resize_area(a, 2, 2)[..., 0], [[1, 5], [7, 3]])

    def test_resize_preserves_mean(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (17, 11, 3)).astype(np.float64)
        out = resize_area(img, 5, 4)
        # area resize is mean-preserving up to box-weight rounding
        assert np.allclose(out.mean(axis=(0, 1)), img.mean(axis=(0, 1)), rtol=0.02)


class TestVideo:
    def test_split_and_sample(self):
        imgs = [np.full((4, 4, 3), 10 * i, dtype=np.uint8) for i in range(7)]
        payload = b"".join(encode_bmp(im) for im in imgs)
        assert len(split_bmp_frames(payload)) == 7
        sampled = decode_video_frames(payload, sample=3)
        # evenly spaced: first, middle, last
        assert [int(f[0, 0, 0]) for f in sampled] == [0, 30, 60]
        assert len(decode_video_frames(payload)) == 7

    def test_corrupt_stream_raises(self):
        with pytest.raises(ValueError):
            split_bmp_frames(b"BMxxxx")


class TestMediaStage:
    def test_real_decode_end_to_end(self, ray_session):
        import ray.data as rd
        from ctas_ray.stages.multimodal import extract_media_features

        media = fake_media_table(n=33, seed=3)
        out = (
            collect_features(extract_media_features(rd.from_arrow(media), strict=True))
            .sort_values("media_id")
            .reset_index(drop=True)
        )
        assert len(out) == 33 and bool(out["ok"].all())
        # every modality present and featurized per its kind
        audio = out[out["kind"] == "audio"]
        image = out[out["kind"] == "image"]
        video = out[out["kind"] == "video"]
        assert len(audio) and len(image) and len(video)
        assert (audio["dominant_hz"] > 0).all() and audio["height"].isna().all()
        assert (image["n_frames"] == 1).all() and image["rms"].isna().all()
        assert (video["n_frames"] >= 2).all()
        assert (out[out["kind"] != "audio"]["thumb"].apply(len) == 64).all()
        # metadata columns agree with the decoded geometry
        meta = media.to_pandas()
        merged = image.merge(meta[["media_id", "width", "height"]], on="media_id", suffixes=("", "_meta"))
        assert (merged["width"] == merged["width_meta"]).all()
        assert (merged["height"] == merged["height_meta"]).all()

    def test_lenient_flags_bad_payloads(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from ctas_ray.stages.multimodal import extract_media_features

        media = fake_media_table(n=6, seed=4).to_pydict()
        media["payload"][2] = b"garbage bytes"
        tbl = pa.table(media)
        out = collect_features(extract_media_features(rd.from_arrow(tbl), strict=False))
        bad = out[out["media_id"] == 2].iloc[0]
        assert not bad["ok"] and bad["thumb"] is None
        assert out["ok"].sum() == 5

    def test_strict_raises_on_bad_payload(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from ctas_ray.stages.multimodal import extract_media_features

        media = fake_media_table(n=3, seed=5).to_pydict()
        media["payload"][1] = b"garbage"
        with pytest.raises(Exception):
            extract_media_features(
                rd.from_arrow(pa.table(media)), strict=True
            ).to_pandas()
