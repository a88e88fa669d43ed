"""Baseline JPEG codec (functions/jpeg.py): pure-numpy T.81 baseline
sequential — round-trips are LOSSY (PSNR bounds + determinism), unlike
the bit-exact PPM/BMP/PNG codecs; flat fills are DC-only and decode
bit-exact, which is what lets JPEG join the media_decode oracle."""

import numpy as np
import pytest

from airbyte_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 + 20) % 256, (xx * 2 + 80) % 256, ((yy + xx) * 2) % 256], -1
    ).astype(np.uint8)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("dri", [0, 3])
def test_roundtrip_psnr_all_modes(sub, dri):
    img = _gradient(37, 50)  # non-multiple-of-8/16 dims exercise padding
    enc = encode_jpeg(img, quality=92, subsampling=sub, restart_interval=dri)
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape
    assert _psnr(img, dec) > 32


def test_flat_fill_bit_exact():
    # DC-only blocks survive quantization exactly — the media_decode
    # oracle's contract (checked for EVERY fill the oracle can plant)
    for fill in range(0, 251, 25):
        px = np.full((5, 7, 3), fill, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(px, quality=95)), px)


def test_determinism():
    img = _gradient(16, 16)
    assert encode_jpeg(img, 90) == encode_jpeg(img, 90)
    enc = encode_jpeg(img, 90)
    assert np.array_equal(decode_jpeg(enc), decode_jpeg(enc))


def test_quality_monotone():
    img = _gradient(32, 32)
    p_lo = _psnr(img, decode_jpeg(encode_jpeg(img, quality=30)))
    p_hi = _psnr(img, decode_jpeg(encode_jpeg(img, quality=95)))
    assert p_hi > p_lo
    assert len(encode_jpeg(img, 30)) < len(encode_jpeg(img, 95))


def test_unsupported_modes_raise():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG")
    img = _gradient(8, 8)
    enc = bytearray(encode_jpeg(img, 90))
    # flip SOF0 (0xC0) to SOF2 (0xC2 progressive) → loud failure
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, 90, subsampling="422")


def test_media_decode_dispatches_jpeg():
    import pyarrow as pa

    from airbyte_ray.functions.multimodal import MediaDecode

    px = np.full((6, 9, 3), 133, np.uint8)
    t = pa.table({
        "payload": pa.array([encode_jpeg(px, 95)], pa.binary()),
        "mime": pa.array(["image/jpeg"]),
    })
    out = MediaDecode()(t)
    assert out["img_w"].to_pylist() == [9]
    assert out["img_h"].to_pylist() == [6]
    assert sum(out["pixels"].to_pylist()[0]) == 6 * 9 * 3 * 133
