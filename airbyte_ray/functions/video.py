"""Motion-JPEG-in-AVI video codec — pure Python/numpy, no external libs.

The AVI container is a RIFF file (the public Microsoft 'AVI ' spec):
``RIFF('AVI ' LIST('hdrl' avih [LIST('strl' strh strf)]) LIST('movi'
chunks) idx1?)``.  With the MJPG fourcc every ``00dc`` chunk inside
``movi`` is a standalone baseline JPEG — which
:mod:`airbyte_ray.functions.jpeg` already decodes.  Together they make
the VIDEO column real end-to-end: ``encode_avi_mjpeg`` (fixture
generation / round-trip tests) and ``decode_avi_frames`` /
``sample_avi_frames`` (the frame-sampling stage a training pipeline
needs: sample every k-th frame, decode only those — a 1-in-30 sample
inflates 1/30th of the entropy bytes, never the whole clip).

:class:`VideoFrameSample` is the batch stage: one media row → N frame
rows (frame_idx, pixels, img_w, img_h) — the real replacement for the
synthetic ``multimodal.FrameSample`` stub.  Same batch-size guidance as
all binary stages: payloads are large, keep batches small.

Reference analog: none (the reference ingests opaque blobs); this is
brief-driven multimodal plumbing.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 10, quality: int = 90) -> bytes:
    """(n, h, w, 3) uint8 → MJPEG AVI bytes (one JPEG per '00dc' chunk)."""
    n, h, w, _ = frames.shape
    payloads = [encode_jpeg(frames[i], quality=quality) for i in range(n)]
    maxb = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I", 1_000_000 // fps, maxb * fps, 0, 0x10,  # us/frame, rate, pad, HASINDEX
        n, 0, 1, maxb, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                            0, n, maxb, 0xFFFFFFFF, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00dc", p) for p in payloads)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to 'movi' list-type field)
    idx, off = bytearray(), 4
    for p in payloads:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) % 2)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def iter_avi_jpeg_chunks(payload: bytes):
    """Yield (frame_idx, jpeg_bytes) WITHOUT decoding — the cheap scan a
    sampler uses to skip frames it will not inflate."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    def walk(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            fourcc = payload[i: i + 4]
            (size,) = struct.unpack_from("<I", payload, i + 4)
            body_lo = i + 8
            if fourcc == b"LIST":
                yield from walk(body_lo + 4, body_lo + size)
            else:
                yield fourcc, body_lo, size
            i = body_lo + size + (size % 2)
    frame = 0
    for fourcc, lo, size in walk(12, 8 + struct.unpack_from("<I", payload, 4)[0]):
        if fourcc[2:4] in (b"dc", b"db"):  # compressed / uncompressed video
            yield frame, payload[lo: lo + size]
            frame += 1


def decode_avi_frames(payload: bytes, every: int = 1,
                      max_frames: int | None = None) -> list[tuple[int, np.ndarray]]:
    """Decode every ``every``-th MJPEG frame → [(frame_idx, (h,w,3) u8)].
    Skipped frames are never inflated (chunk scan only)."""
    out = []
    for idx, jpg in iter_avi_jpeg_chunks(payload):
        if idx % every:
            continue
        out.append((idx, decode_jpeg(jpg)))
        if max_frames is not None and len(out) >= max_frames:
            break
    return out


class VideoFrameSample:
    """Batch stage: media row → sampled frame rows (flat-map shape).

    Emits (media_id, frame_idx, pixels ragged list<uint8>, img_w, img_h)
    for every ``every``-th frame of each ``video/x-msvideo`` payload;
    non-video rows are dropped (or raise under ``strict=True``).  Decode
    is per-frame by nature; the Ray-side contract is the actor/task
    signature and small byte-sized batches."""

    def __init__(self, payload_col: str = "payload", mime_col: str = "mime",
                 id_col: str = "media_id", every: int = 1,
                 max_frames: int | None = None, strict: bool = False):
        self.payload_col, self.mime_col, self.id_col = payload_col, mime_col, id_col
        self.every, self.max_frames, self.strict = every, max_frames, strict

    MIMES = ("video/x-msvideo", "video/avi")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, pix, ws, hs = [], [], [], [], []
        mimes = (t[self.mime_col].to_pylist()
                 if self.mime_col in t.schema.names else [None] * t.num_rows)
        for mid, payload, mime in zip(
                t[self.id_col].to_pylist(), t[self.payload_col].to_pylist(), mimes):
            if payload is None or (mime or "") not in self.MIMES:
                if self.strict:
                    raise NotImplementedError(f"no video decoder for mime {mime!r}")
                continue
            for idx, px in decode_avi_frames(payload, self.every, self.max_frames):
                ids.append(mid)
                fidx.append(idx)
                pix.append(px.reshape(-1))
                hs.append(px.shape[0])
                ws.append(px.shape[1])
        return pa.table({
            self.id_col: pa.array(ids, t[self.id_col].type),
            "frame_idx": pa.array(fidx, pa.int32()),
            "pixels": pa.array([p.tolist() for p in pix], pa.list_(pa.uint8())),
            "img_w": pa.array(ws, pa.int32()),
            "img_h": pa.array(hs, pa.int32()),
        })
