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
