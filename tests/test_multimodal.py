"""Multimodal plumbing (stubbed decode — FIXTURES-style deterministic fake):
schema round-trip, actor-pool stage signatures, 1→N frame sampling."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from airbyte_ray.functions.multimodal import (
    MEDIA_SCHEMA,
    FrameSample,
    ImageDecode,
    decode_pipeline,
    gen_media,
)


def test_media_gen_schema():
    t = gen_media(16, seed=1)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert gen_media(16, seed=1).equals(t)  # deterministic


def test_decode_pipeline_through_ray():
    ds = ray.data.from_arrow(gen_media(32, seed=2))
    out = decode_pipeline(ds, concurrency=2, batch_size=8)
    rows = out.take_all()
    assert len(rows) == 32
    r = rows[0]
    assert len(r["pixels"]) == 8 * 8 * 3
    assert len(r["feat_mean"]) == 3 and len(r["feat_std"]) == 3
    # deterministic fake decode: same payload → same tensor
    again = decode_pipeline(ray.data.from_arrow(gen_media(32, seed=2)), concurrency=2, batch_size=8)
    assert sorted(rows[0]["pixels"]) == sorted(again.take_all()[0]["pixels"])


def test_strict_mode_raises_without_library():
    with pytest.raises(NotImplementedError):
        ImageDecode(fake=False)


def test_frame_sample_flatmap():
    t = gen_media(5, seed=3)
    out = FrameSample(n_frames=3)(t)
    assert out.num_rows == 15
    assert out["frame_idx"].to_pylist()[:3] == [0, 1, 2]


def test_image_resize_nearest_neighbour():
    from airbyte_ray.functions.multimodal import ImageDecode, ImageResize, gen_media
    import numpy as np

    t = gen_media(6, seed=5)
    decoded = ImageDecode()(t)
    resized = ImageResize(side=4)(decoded)
    flat = np.asarray(resized["pixels"].combine_chunks().flatten(), np.uint8)
    out = flat.reshape(6, 4, 4, 3)
    src = np.asarray(decoded["pixels"].combine_chunks().flatten(), np.uint8).reshape(6, 8, 8, 3)
    # nearest-neighbour: out[i, y, x] == src[i, 2y, 2x]
    assert (out == src[:, ::2, ::2]).all()


def test_audio_chunk_explosion():
    from airbyte_ray.functions.multimodal import AudioChunk, gen_media

    t = gen_media(3, seed=6, payload_bytes=2500)
    out = AudioChunk(chunk_s=1.0, bytes_per_s=1000)(t)
    assert out.num_rows == 9  # ceil(2500/1000)=3 chunks per row
    per = out.filter(pa.compute.equal(out["media_id"], "m-000000"))
    assert per["chunk_idx"].to_pylist() == [0, 1, 2]
    assert per["byte_start"].to_pylist() == [0, 1000, 2000]
    assert per["byte_end"].to_pylist() == [1000, 2000, 2500]
