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


# -- REAL stdlib decoders ----------------------------------------------------

def test_ppm_roundtrip():
    import numpy as np

    from airbyte_ray.functions.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    # header with comment
    with_comment = b"P6\n# a comment\n7 13\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(with_comment), px)


def test_bmp_roundtrip_incl_padding():
    import numpy as np

    from airbyte_ray.functions.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(4)
    for w, h in [(5, 3), (4, 4), (7, 2)]:  # odd widths exercise row padding
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_png_roundtrip_filters_and_crc():
    import numpy as np
    import pytest as _pytest

    from airbyte_ray.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    # ≥3 rows exercises all three encoder filter types (None/Sub/Up)
    for w, h in [(1, 1), (5, 3), (23, 17), (48, 64)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)
    # gradient: Sub/Up filters produce non-trivial deltas
    g = (np.arange(40 * 60 * 3, dtype=np.uint32).reshape(40, 60, 3) % 256).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(g)), g)
    # Average + Paeth filters (the per-byte fallback path): hand-build a
    # 2-row image whose second scanline uses filter 3 then 4
    import struct
    import zlib

    from airbyte_ray.functions.multimodal import _png_chunk, _PNG_SIG

    base = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)

    def filt_avg_paeth(px):
        h, w, _ = px.shape
        raw = bytearray()
        prev = np.zeros(w * 3, int)
        for r in range(h):
            row = px[r].reshape(-1).astype(int)
            f = [0, 3, 4][r % 3]
            raw.append(f)
            rec_prev = prev
            for x in range(w * 3):
                a = int(row[x - 3]) if x >= 3 else 0
                b = int(rec_prev[x])
                if f == 0:
                    pred = 0
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(rec_prev[x - 3]) if x >= 3 else 0
                    p = a + b - c
                    da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (da <= db and da <= dc) else (b if db <= dc else c)
                raw.append((row[x] - pred) & 0xFF)
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png_chunk(b"IEND", b""))

    assert np.array_equal(decode_png(filt_avg_paeth(base)), base)
    # corrupted CRC must raise, not mis-decode
    bad = bytearray(encode_png(base))
    bad[30] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # unsupported color type (3 = palette) raises loudly
    ihdr_pal = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    pal = _PNG_SIG + _png_chunk(b"IHDR", ihdr_pal) + _png_chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="unsupported"):
        decode_png(pal)
    # grayscale (type 0): replicated to RGB
    gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    dg = decode_png(encode_png(gray))
    assert np.array_equal(dg, np.repeat(gray[:, :, None], 3, axis=2))
    # gray+alpha (4) and RGBA (6): alpha dropped, color exact
    ga = rng.integers(0, 256, (7, 5, 2), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(ga)),
                          np.repeat(ga[:, :, :1], 3, axis=2))
    rgba_px = rng.integers(0, 256, (6, 8, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba_px)), rgba_px[:, :, :3])


def test_wav_roundtrip_and_features():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from airbyte_ray.functions.multimodal import WavDecode, audio_features, encode_wav

    rate = 8000
    t = np.arange(4000) / rate
    sig = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    tbl = pa.table({
        "media_id": pa.array(["a"]),
        "payload": pa.array([encode_wav(sig, rate)], pa.binary()),
    })
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(WavDecode(), batch_format="pyarrow")
        .map_batches(audio_features(), batch_format="pyarrow")
        .to_pandas()
    )
    r = out.iloc[0]
    assert r.sample_rate == rate and r.duration_ms == 500
    assert np.array_equal(np.asarray(list(r.samples), np.int16), sig)
    # RMS of a sine ~ amplitude/sqrt(2); ZCR ~ 2*freq/rate
    assert abs(r.rms - 8000 / np.sqrt(2)) < 100
    assert abs(r.zcr - 2 * 440 / rate) < 0.01


def test_media_decode_dispatch_and_ragged_resize():
    import numpy as np
    import ray.data

    from airbyte_ray.functions.multimodal import (
        MediaDecode,
        RaggedResize,
        decode_bmp,
        decode_ppm,
        gen_real_media,
    )

    media = gen_real_media(12, seed=9)
    imgs = media.filter(
        __import__("pyarrow.compute", fromlist=["pc"]).not_equal(media["mime"], "audio/wav")
    )
    out = (
        ray.data.from_arrow(imgs)
        .map_batches(MediaDecode(), batch_format="pyarrow", batch_size=4)
        .map_batches(RaggedResize(8), batch_format="pyarrow")
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert all(len(p) == 8 * 8 * 3 for p in out.pixels)
    # resize of a real decode must equal resize computed directly
    row = out.iloc[0]
    src = media.filter(
        __import__("pyarrow.compute", fromlist=["pc"]).equal(media["media_id"], row.media_id)
    )
    payload = src["payload"][0].as_py()
    px = decode_ppm(payload) if src["mime"][0].as_py().endswith("pixmap") else decode_bmp(payload)
    h, w, _ = px.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    expect = px[ys][:, xs].reshape(-1)
    assert np.array_equal(np.asarray(list(row.pixels), np.uint8), expect)


def test_media_decode_strict_raises_on_unknown_mime():
    import pyarrow as pa
    import pytest as _pytest

    from airbyte_ray.functions.multimodal import MediaDecode

    t = pa.table({"payload": pa.array([b"xx"], pa.binary()), "mime": pa.array(["video/mp4"])})
    with _pytest.raises(NotImplementedError):
        MediaDecode()(t)
    out = MediaDecode(strict=False)(t)
    assert out["pixels"].to_pylist() == [None]


def test_spectrogram_stage():
    """Vectorized STFT: bin-centered tones peak at their bin; short clips
    zero-pad to one frame; null clips survive; frame math matches."""
    import numpy as np
    import pyarrow as pa

    from airbyte_ray.functions.multimodal import Spectrogram

    rate, n_fft, hop = 8000, 256, 128
    tt = np.arange(2000) / rate

    def tone(k):
        return (12000 * np.sin(2 * np.pi * (k * rate / n_fft) * tt)).astype(np.int16)

    t = pa.table({
        "clip_id": pa.array([0, 1, 2, 3]),
        "samples": pa.array(
            [tone(7), tone(31), np.arange(100, dtype=np.int16), None],
            pa.list_(pa.int16())),
    })
    out = Spectrogram(n_fft=n_fft, hop=hop)(t)
    assert out["peak_bin"].to_pylist()[:2] == [7, 31]
    nf = out["n_frames"].to_pylist()
    assert nf[0] == nf[1] == (2000 - n_fft) // hop + 1
    assert nf[2] == 1 and nf[3] == 1  # short + null → one (padded/zero) frame
    spec = out["spec"].to_pylist()
    n_bins = n_fft // 2 + 1
    assert all(len(s) == f * n_bins for s, f in zip(spec, nf))
    # empty batch keeps the schema
    empty = Spectrogram(n_fft=n_fft, hop=hop)(t.slice(0, 0))
    assert empty.schema.names == list(t.schema.names) + ["spec", "n_frames", "peak_bin"]
