"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as ``binary`` columns with a sibling
metadata struct; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages.

Decode status by format:

* **REAL, no external libs** — PPM "P6", uncompressed 24-bit BMP, and
  8-bit truecolor PNG images (:func:`decode_ppm` / :func:`decode_bmp` —
  pure byte parsing + numpy; :func:`decode_png` — stdlib ``zlib`` inflate
  + full scanline-filter reconstruction with CRC checks) and PCM WAV
  audio (:class:`WavDecode` — stdlib ``wave``), with seeded encoders
  (:func:`encode_ppm` / :func:`encode_bmp` / :func:`encode_png` /
  :func:`encode_wav`) for round-trip tests.  :class:`MediaDecode`
  dispatches on the mime column and emits ragged ``pixels`` +
  ``img_w``/``img_h``; :class:`RaggedResize` is a fully vectorized
  nearest-neighbour resize over ragged inputs.  Baseline JPEG decode
  (huffman + vectorized IDCT, 4:4:4 and 4:2:0, restart markers) lives in
  the sibling :mod:`airbyte_ray.functions.jpeg` module, and REAL video
  (MJPEG-in-AVI: RIFF parsing + per-frame JPEG, lazy frame sampling) in
  :mod:`airbyte_ray.functions.video` — no declared decode stubs remain.
* :class:`ImageDecode` and :class:`FrameSample` below are retained as
  the EXTERNAL-LIBRARY actor shapes (how a Pillow/ffmpeg-backed stage
  would slot in): ``ImageDecode(fake=False)`` raises
  ``NotImplementedError`` when the library is absent, ``fake=True``
  produces a deterministic digest-derived tensor for plumbing tests.

Batch-size guidance for binary payloads: blocks are sized by bytes, so set
``batch_size`` low (e.g. 64 for ~1 MiB images) and keep
``batch_format="pyarrow"`` — binary columns round-trip Arrow zero-copy but
degrade to object dtype through pandas.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import jpeg as _jpeg

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


def gen_real_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL media table: rows cycle PPM / BMP / PNG / JPEG
    images (random sizes, seeded noise pixels) and PCM WAV clips (seeded
    sine + noise) — every payload decodes with the in-repo kernels."""
    rng = np.random.default_rng(seed)
    ids, payloads, mimes, ws, hs, durs = [], [], [], [], [], []
    img_enc = [
        (encode_ppm, "image/x-portable-pixmap"),
        (encode_bmp, "image/bmp"),
        (encode_png, "image/png"),
        (_jpeg.encode_jpeg, "image/jpeg"),
    ]
    for i in range(n):
        ids.append(f"m-{i:06d}")
        kind = i % 5
        if kind < 4:
            w = int(rng.integers(4, 40))
            h = int(rng.integers(4, 40))
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            enc, mime = img_enc[kind]
            payloads.append(enc(px))
            mimes.append(mime)
            ws.append(w)
            hs.append(h)
            durs.append(None)
        else:
            rate = 8000
            n_samp = int(rng.integers(rate // 4, rate))
            tt = np.arange(n_samp) / rate
            freq = float(rng.uniform(100, 1000))
            sig = 8000 * np.sin(2 * np.pi * freq * tt) + rng.normal(0, 100, n_samp)
            payloads.append(encode_wav(sig.astype(np.int16), rate))
            mimes.append("audio/wav")
            ws.append(None)
            hs.append(None)
            durs.append(int(n_samp * 1000 / rate))
    return pa.table({
        "media_id": pa.array(ids),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(mimes),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    })


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
            # float32, matching the non-empty branch (mean/std of float32
            # pixels) — a float64 empty block made schemas data-dependent
            e3 = pa.FixedSizeListArray.from_arrays(pa.array([], pa.float32()), 3)
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


# ---------------------------------------------------------------------------
# REAL decoders: PPM / BMP images, WAV audio — stdlib + numpy only
# ---------------------------------------------------------------------------

def encode_ppm(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM "P6"."""
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM "P6" → (h, w, 3) uint8.  Handles whitespace/comment
    headers per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    vals, i, n = [], 2, len(payload)
    while len(vals) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to EOL
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    px = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3)


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP."""
    import struct

    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), np.uint8)
    img[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = img.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB (top-down)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0  # positive height = bottom-up
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=h * stride, offset=off).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return px[::-1] if flip else px


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


#: PNG color type → channels per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(px: np.ndarray) -> bytes:
    """uint8 image → 8-bit PNG (stdlib ``zlib``/``struct``).  The color
    type follows the input shape: (h, w) or (h, w, 1) → grayscale (0),
    (h, w, 2) → gray+alpha (4), (h, w, 3) → truecolor (2), (h, w, 4) →
    RGBA (6).  Rows cycle filter types None/Sub/Up so a decoder must
    genuinely unfilter, not just inflate — round-trips exercise those
    paths."""
    import struct
    import zlib

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, np.uint8)
    for r in range(h):
        row = np.ascontiguousarray(px[r].reshape(-1), dtype=np.uint8)
        f = r % 3
        if f == 0:  # None
            filt = row
        elif f == 1:  # Sub: delta vs the pixel ch bytes left
            d = row.reshape(w, ch).astype(np.int16)
            d = d - np.vstack([np.zeros((1, ch), np.int16), d[:-1]])
            filt = (d % 256).astype(np.uint8).reshape(-1)
        else:  # Up: delta vs the row above
            filt = ((row.astype(np.int16) - prev.astype(np.int16)) % 256).astype(np.uint8)
        raw.append(f)
        raw.extend(filt.tobytes())
        prev = row
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → (h, w, 3) uint8 RGB — stdlib ``zlib``
    inflate + full filter reconstruction.  Color types 0 (grayscale,
    replicated to RGB), 2 (truecolor), 4 (gray+alpha) and 6 (RGBA) are
    supported; the alpha channel is DROPPED (compositing against a
    background is a pipeline policy, not a codec concern — documented).
    All five scanline filters decode: None/Sub/Up are vectorized numpy
    (Sub is a modular ``cumsum`` with pixel stride), Average/Paeth fall
    back to a per-byte loop (spec-complete; rare in practice — our
    encoder never emits them).  CRCs are verified; palette / 16-bit /
    interlaced files raise loudly rather than mis-decode."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, n = 8, len(payload)
    idat = bytearray()
    w = h = ch = None
    while i + 12 <= n:
        ln, typ = struct.unpack_from(">I4s", payload, i)
        data = payload[i + 8: i + 8 + ln]
        crc = struct.unpack_from(">I", payload, i + 8 + ln)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            ch = _PNG_CHANNELS.get(ctype)
            if depth != 8 or ch is None or comp or filt or inter:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color_type={ctype}, "
                    f"interlace={inter}) — stdlib baseline decodes 8-bit "
                    "gray/truecolor/alpha non-interlaced only")
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        i += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = raw.reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(h):
        f, line = int(filters[r]), rows[r]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-ch] ⇒ mod-256 cumsum
            rec = np.cumsum(line.reshape(w, ch), axis=0, dtype=np.uint8).reshape(-1)
        elif f == 2:  # Up: uint8 add wraps mod 256 by itself
            rec = line + prev
        elif f in (3, 4):
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 3:  # Average
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (da <= db and da <= dc) else (b if db <= dc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[r] = rec
        prev = rec
    img = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 2:  # gray + alpha → replicate gray, drop alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    if ch == 4:  # RGBA → drop alpha
        return np.ascontiguousarray(img[:, :, :3])
    return img


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → PCM WAV bytes (stdlib ``wave``)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


class Spectrogram:
    """STFT magnitude spectrogram over ragged int16 ``samples`` — the
    audio-frontend stage a training pipeline runs after :class:`WavDecode`.

    Per clip: frame (``n_fft`` window, ``hop`` stride; clips shorter than
    one window get a single zero-padded frame), Hann window, rfft.  The
    framing builds cheap strided VIEWS per clip, then ALL frames of the
    batch go through ONE ``np.fft.rfft`` call — the O(n log n) hot part
    is a single vectorized kernel, never per-clip Python.  The window is
    built once per actor/worker in ``__init__``.

    Emits ``spec`` (ragged list<float32>, row-major n_frames × n_bins
    magnitudes), ``n_frames`` (int32), and ``peak_bin`` (int32, argmax of
    the mean magnitude across frames) — a bin-centered pure tone at
    ``k·rate/n_fft`` Hz peaks at exactly bin ``k``, which is what lets a
    SQL oracle verify the whole decode→frame→FFT chain from doc_id alone
    (driver query ``audio_spectrogram``)."""

    def __init__(self, samples_col: str = "samples", n_fft: int = 256,
                 hop: int = 128, out: str = "spec"):
        self.samples_col, self.n_fft, self.hop, self.out = samples_col, n_fft, hop, out
        self.window = np.hanning(n_fft).astype(np.float64)

    def __call__(self, t: pa.Table) -> pa.Table:
        n_fft, hop = self.n_fft, self.hop
        n_bins = n_fft // 2 + 1
        if t.num_rows == 0:
            return (t.append_column(self.out, pa.array([], pa.list_(pa.float32())))
                    .append_column("n_frames", pa.array([], pa.int32()))
                    .append_column("peak_bin", pa.array([], pa.int32())))
        la = t[self.samples_col].combine_chunks()
        frames_per_clip, views = [], []
        for clip in la:
            x = (np.asarray(clip.values, np.float64)
                 if clip.is_valid and clip.values is not None else np.zeros(0))
            if len(x) < n_fft:
                pad = np.zeros(n_fft, np.float64)
                pad[: len(x)] = x
                views.append(pad[None, :])
                frames_per_clip.append(1)
                continue
            nf = 1 + (len(x) - n_fft) // hop
            v = np.lib.stride_tricks.as_strided(
                x, shape=(nf, n_fft),
                strides=(x.strides[0] * hop, x.strides[0]))
            views.append(v)
            frames_per_clip.append(nf)
        stacked = np.concatenate(views, axis=0) * self.window[None, :]
        mags = np.abs(np.fft.rfft(stacked, axis=1)).astype(np.float32)
        nf_arr = np.array(frames_per_clip, np.int64)
        bounds = np.concatenate([[0], np.cumsum(nf_arr)])
        # per-clip mean magnitude across frames → peak bin
        sums = np.add.reduceat(mags.astype(np.float64), bounds[:-1], axis=0)
        peak = np.argmax(sums, axis=1).astype(np.int32)
        offsets = pa.array(np.concatenate([[0], np.cumsum(nf_arr * n_bins)]).astype(np.int32))
        spec = pa.ListArray.from_arrays(offsets, pa.array(mags.ravel()))
        t = t.append_column(self.out, spec)
        t = t.append_column("n_frames", pa.array(nf_arr.astype(np.int32)))
        return t.append_column("peak_bin", pa.array(peak))


class MediaDecode:
    """REAL format-dispatching image decode (PPM/BMP — the formats this
    container can decode without external libs): emits ragged ``pixels``
    (list<uint8>, row-major RGB) plus ``img_w``/``img_h``.  Unsupported
    mimes raise (strict) or pass through as null pixels.  Actor-pool or
    task stage — stateless besides config."""

    DECODERS = {
        "image/x-portable-pixmap": decode_ppm,
        "image/bmp": decode_bmp,
        "image/png": decode_png,
        "image/jpeg": _jpeg.decode_jpeg,
    }

    def __init__(self, payload_col: str = "payload", mime_col: str = "mime",
                 out: str = "pixels", strict: bool = True):
        self.payload_col, self.mime_col, self.out = payload_col, mime_col, out
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        pixels, ws, hs = [], [], []
        mimes = t[self.mime_col].to_pylist() if self.mime_col in t.schema.names else [None] * t.num_rows
        for payload, mime in zip(t[self.payload_col].to_pylist(), mimes):
            dec = self.DECODERS.get(mime or "")
            if dec is None or payload is None:
                if self.strict:
                    raise NotImplementedError(f"no stdlib decoder for mime {mime!r}")
                pixels.append(None)
                ws.append(None)
                hs.append(None)
                continue
            px = dec(payload)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            pixels.append(px.reshape(-1))
        t = t.drop_columns([self.payload_col])
        t = t.append_column(self.out, pa.array(
            [p.tolist() if p is not None else None for p in pixels], pa.list_(pa.uint8())
        ))
        t = t.append_column("img_w", pa.array(ws, pa.int32()))
        return t.append_column("img_h", pa.array(hs, pa.int32()))


class RaggedResize:
    """Vectorized nearest-neighbour resize of RAGGED decoded images to a
    fixed (side, side, 3): one fancy-index gather over the whole batch —
    per-row source coordinates computed by broadcasting, no per-image
    Python work beyond the offsets.

    Rows that are not resizable images — null ``pixels`` (the
    ``MediaDecode(strict=False)`` pass-through for non-image media) or a
    zero ``img_w``/``img_h`` — are DROPPED, not crashed on: a null width
    cast to int64 previously produced a garbage gather index (review
    finding)."""

    def __init__(self, side: int, pixels_col: str = "pixels"):
        self.side, self.pixels_col = side, pixels_col

    def __call__(self, t: pa.Table) -> pa.Table:
        side = self.side
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array([], pa.uint8()), side * side * 3
        )
        if t.num_rows:
            ok = pc.and_(
                pc.is_valid(t[self.pixels_col]),
                pc.and_(
                    pc.greater(pc.fill_null(t["img_w"], 0), 0),
                    pc.greater(pc.fill_null(t["img_h"], 0), 0),
                ),
            )
            t = t.filter(ok)
        n = t.num_rows
        if n == 0:
            return t.drop_columns([self.pixels_col]).append_column(self.pixels_col, arr)
        la = t[self.pixels_col].combine_chunks()
        flat = la.flatten().to_numpy(zero_copy_only=False)
        offs = la.offsets.to_numpy().astype(np.int64)
        base = (offs[:-1] - offs[0])[:, None, None]
        w = t["img_w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["img_h"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.arange(side, dtype=np.int64)
        ys = (r[None, :] * h[:, None]) // side          # (n, side)
        xs = (r[None, :] * w[:, None]) // side          # (n, side)
        idx = base + (ys[:, :, None] * w[:, None, None] + xs[:, None, :]) * 3
        out = flat[idx[..., None] + np.arange(3)]        # (n, side, side, 3)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(n, -1).ravel(), pa.uint8()), side * side * 3
        )
        return t.drop_columns([self.pixels_col]).append_column(self.pixels_col, arr)


class WavDecode:
    """REAL PCM-WAV audio decode via stdlib ``wave``: emits int16 mono
    ``samples`` (first channel), ``sample_rate``, and the TRUE
    ``duration_ms`` (overwriting the metadata column if present)."""

    def __init__(self, payload_col: str = "payload", out: str = "samples"):
        self.payload_col, self.out = payload_col, out

    def __call__(self, t: pa.Table) -> pa.Table:
        import io
        import wave

        samples, rates, durs = [], [], []
        for payload in t[self.payload_col].to_pylist():
            if payload is None:
                samples.append(None)
                rates.append(None)
                durs.append(None)
                continue
            with wave.open(io.BytesIO(payload), "rb") as w:
                nch, sw, rate, nframes = (
                    w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
                )
                if sw != 2:
                    raise NotImplementedError(f"only 16-bit PCM supported (got {sw*8}-bit)")
                raw = np.frombuffer(w.readframes(nframes), "<i2")
            samples.append(raw[::nch])  # first channel
            rates.append(rate)
            durs.append(int(nframes * 1000 / rate))
        t = t.drop_columns([self.payload_col])
        if "duration_ms" in t.schema.names:
            t = t.drop_columns(["duration_ms"])
        t = t.append_column(self.out, pa.array(
            [s.tolist() if s is not None else None for s in samples], pa.list_(pa.int16())
        ))
        t = t.append_column("sample_rate", pa.array(rates, pa.int32()))
        return t.append_column("duration_ms", pa.array(durs, pa.int32()))


def audio_features(samples_col: str = "samples"):
    """Vectorized per-clip features over ragged int16 samples: RMS and
    zero-crossing rate, via the flatten-plus-offsets trick (one pass,
    ``np.add.reduceat``)."""

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            z = pa.array([], pa.float64())
            return t.append_column("rms", z).append_column("zcr", z)
        la = t[samples_col].combine_chunks()
        flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offs = la.offsets.to_numpy().astype(np.int64)
        offs0 = offs[:-1] - offs[0]
        lens = np.diff(offs)
        safe = np.maximum(lens, 1)
        sq = np.add.reduceat(flat * flat, offs0) * (lens > 0)
        rms = np.sqrt(sq / safe)
        sign_change = (np.signbit(flat[1:]) != np.signbit(flat[:-1])).astype(np.float64)
        # zero out changes that straddle clip boundaries
        boundary = np.zeros(len(flat) - 1, bool) if len(flat) > 1 else np.zeros(0, bool)
        if len(flat) > 1:
            b = offs0[1:] - 1  # last sample index of each clip but the final
            boundary[b[(b >= 0) & (b < len(boundary))]] = True
        sign_change[boundary] = 0.0
        cs = np.concatenate([[0.0], np.cumsum(sign_change)])
        starts, ends = offs0, offs0 + lens
        zc = cs[np.maximum(ends - 1, starts)] - cs[starts]
        zcr = zc / np.maximum(lens - 1, 1)
        return t.append_column("rms", pa.array(rms)).append_column("zcr", pa.array(zcr))

    return fn


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
