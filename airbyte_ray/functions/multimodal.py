"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as ``binary`` columns with a sibling
metadata struct; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages.  The decode kernels themselves are
STUBBED (no image/audio libraries in this container): each stage either
raises ``NotImplementedError`` (strict mode) or produces a deterministic
fake derived from the payload bytes (test mode) — the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is real and tested.

Batch-size guidance for binary payloads: blocks are sized by bytes, so set
``batch_size`` low (e.g. 64 for ~1 MiB images) and keep
``batch_format="pyarrow"`` — binary columns round-trip Arrow zero-copy but
degrade to object dtype through pandas.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),  # null for stills
    ]
)


def gen_media(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (seeded) for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    w = rng.integers(64, 1024, n).astype(np.int32)
    h = rng.integers(64, 1024, n).astype(np.int32)
    return pa.table(
        {
            "media_id": pa.array([f"m-{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * n),
            "width": pa.array(w),
            "height": pa.array(h),
            "duration_ms": pa.nulls(n, pa.int32()),
        }
    )


class ImageDecode:
    """Actor-pool decode stage: payload → dense uint8 tensor column.

    Real implementation would ``import PIL.Image`` in ``__init__`` (once per
    actor) and decode per batch.  STUB: ``fake=True`` produces a
    deterministic 8×8×3 tensor from the payload digest; ``fake=False``
    raises NotImplementedError at the first batch (the library is absent)."""

    SIDE = 8

    def __init__(self, payload_col: str = "payload", out: str = "pixels", fake: bool = True):
        self.payload_col, self.out, self.fake = payload_col, out, fake
        if not fake:
            try:
                import PIL.Image  # noqa: F401  (absent in this container)
            except ImportError as e:
                raise NotImplementedError("image decoding requires Pillow") from e

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        d = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(int.from_bytes(d[:8], "little"))
        return rng.integers(0, 256, (self.SIDE, self.SIDE, 3), dtype=np.uint8)

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real decode path needs Pillow")
        if t.num_rows == 0:
            empty = pa.FixedSizeListArray.from_arrays(
                pa.array([], pa.uint8()), self.SIDE * self.SIDE * 3
            )
            return t.drop_columns([self.payload_col]).append_column(self.out, empty)
        tensors = np.stack(
            [self._fake_decode(p if p is not None else b"") for p in t[self.payload_col].to_pylist()]
        )
        flat = pa.array(tensors.reshape(t.num_rows, -1).ravel(), pa.uint8())
        pixels = pa.FixedSizeListArray.from_arrays(flat, self.SIDE * self.SIDE * 3)
        return t.drop_columns([self.payload_col]).append_column(self.out, pixels)


class ImageFeatures:
    """Feature extraction over decoded tensors: per-channel mean/std —
    vectorized numpy over the fixed-size-list column."""

    def __init__(self, pixels_col: str = "pixels"):
        self.pixels_col = pixels_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e3 = pa.FixedSizeListArray.from_arrays(pa.array([], pa.float64()), 3)
            return t.append_column("feat_mean", e3).append_column("feat_std", e3)
        flat = np.asarray(t[self.pixels_col].combine_chunks().flatten(), np.float32)
        px = flat.reshape(t.num_rows, -1, 3)
        mean = px.mean(axis=1)
        std = px.std(axis=1)
        t = t.append_column("feat_mean", pa.FixedSizeListArray.from_arrays(pa.array(mean.ravel()), 3))
        return t.append_column("feat_std", pa.FixedSizeListArray.from_arrays(pa.array(std.ravel()), 3))


class FrameSample:
    """Video frame sampling stub: emits ``n_frames`` synthetic frame rows per
    media row (flat-map shape: 1 → N rows with frame_idx)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = np.repeat(np.arange(n), self.n_frames)
        out = t.take(pa.array(idx))
        frame = np.tile(np.arange(self.n_frames), n).astype(np.int32)
        return out.append_column("frame_idx", pa.array(frame))


def decode_pipeline(ds, concurrency=(1, 4), batch_size: int = 64):
    """media table → decoded tensors → features (two actor-pool stages,
    small batches for large binary rows)."""
    decoded = ds.map_batches(
        ImageDecode, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
    return decoded.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=batch_size * 4, concurrency=concurrency
    )


class ImageResize:
    """Resize decoded tensors with a REAL vectorized nearest-neighbour
    kernel (pure numpy index gather — no Pillow needed): the whole batch
    resizes in one fancy-index operation."""

    def __init__(self, side: int, pixels_col: str = "pixels", src_side: int = ImageDecode.SIDE):
        self.side, self.pixels_col, self.src_side = side, pixels_col, src_side
        # nearest-neighbour source coordinates, computed once per actor
        self.src_idx = (np.arange(side) * src_side // side).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        flat = np.asarray(t[self.pixels_col].combine_chunks().flatten(), np.uint8)
        px = flat.reshape(t.num_rows, self.src_side, self.src_side, 3)
        out = px[:, self.src_idx][:, :, self.src_idx]  # (n, side, side, 3)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(t.num_rows, -1).ravel(), pa.uint8()),
            self.side * self.side * 3,
        )
        return t.drop_columns([self.pixels_col]).append_column(self.pixels_col, arr)


class AudioChunk:
    """Audio chunking stage: each payload explodes into fixed-duration
    chunk rows (1 → N flat-map shape with chunk_idx + byte offsets).  The
    DECODE is stubbed (no audio libs here — chunk boundaries are computed
    on the raw payload bytes at a declared bytes-per-second rate); the Ray
    plumbing — explosion, offsets, schema — is real and tested."""

    def __init__(self, chunk_s: float = 1.0, bytes_per_s: int = 1024,
                 payload_col: str = "payload"):
        self.step = max(1, int(chunk_s * bytes_per_s))
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            t = t.append_column("chunk_idx", pa.array([], pa.int64()))
            t = t.append_column("byte_start", pa.array([], pa.int64()))
            return t.append_column("byte_end", pa.array([], pa.int64()))
        payload = t[self.payload_col].combine_chunks()
        lengths = np.array(
            [len(p) if p is not None else 0 for p in payload.to_pylist()], np.int64
        )
        n_chunks = np.maximum(1, -(-lengths // self.step))
        row_idx = np.repeat(np.arange(t.num_rows), n_chunks)
        out = t.take(pa.array(row_idx))
        cidx = np.concatenate([np.arange(k) for k in n_chunks]).astype(np.int64)
        starts = cidx * self.step
        ends = np.minimum(starts + self.step, lengths[row_idx])
        out = out.append_column("chunk_idx", pa.array(cidx))
        out = out.append_column("byte_start", pa.array(starts.astype(np.int64)))
        return out.append_column("byte_end", pa.array(ends.astype(np.int64)))
