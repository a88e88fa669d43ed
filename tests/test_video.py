"""MJPEG-in-AVI video (functions/video.py): RIFF container + the in-repo
baseline JPEG codec = real video decode/frame-sampling, no external libs."""

import numpy as np
import pyarrow as pa
import pytest

from airbyte_ray.functions.video import (
    VideoFrameSample,
    decode_avi_frames,
    encode_avi_mjpeg,
    iter_avi_jpeg_chunks,
)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _frames(n=12, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        np.stack([(yy * 3 + i * 7) % 256, (xx * 2 + i * 11) % 256,
                  ((yy + xx) + i * 5) % 256], -1)
        for i in range(n)]).astype(np.uint8)


def test_roundtrip_all_frames():
    frames = _frames()
    avi = encode_avi_mjpeg(frames, fps=5, quality=95)
    dec = decode_avi_frames(avi)
    assert [i for i, _ in dec] == list(range(len(frames)))
    assert min(_psnr(frames[i], px) for i, px in dec) > 35


def test_flat_frames_bit_exact():
    flat = np.full((4, 16, 16, 3), 99, np.uint8)
    dec = decode_avi_frames(encode_avi_mjpeg(flat, quality=95))
    assert all(np.array_equal(px, flat[i]) for i, px in dec)


def test_sampling_skips_without_decoding():
    frames = _frames(10)
    avi = encode_avi_mjpeg(frames)
    s = decode_avi_frames(avi, every=3, max_frames=3)
    assert [i for i, _ in s] == [0, 3, 6]
    # the chunk scan alone sees every frame without inflating any
    assert sum(1 for _ in iter_avi_jpeg_chunks(avi)) == 10


def test_not_avi_raises():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_frames(b"RIFFxxxxWAVE")


def test_frame_sample_stage(ray_session):
    import ray.data as rd

    frames = _frames(6, 16, 16)
    avi = encode_avi_mjpeg(frames, quality=95)
    t = pa.table({
        "media_id": pa.array(["v-0", "skip-me"]),
        "payload": pa.array([avi, b"not a video"], pa.binary()),
        "mime": pa.array(["video/x-msvideo", "text/plain"]),
    })
    out = (
        rd.from_arrow(t)
        .map_batches(VideoFrameSample(every=2), batch_format="pyarrow",
                     batch_size=2)
        .to_pandas()
        .sort_values("frame_idx")
    )
    assert list(out.media_id.unique()) == ["v-0"]
    assert list(out.frame_idx) == [0, 2, 4]
    assert (out.img_w == 16).all() and (out.img_h == 16).all()
    # strict mode raises on the non-video row
    with pytest.raises(NotImplementedError):
        VideoFrameSample(strict=True)(t)
