"""Multimodal columns: image/audio/video as opaque BINARY columns
with typed metadata, processed via Arrow-batched pandas UDFs.

``decode=real`` pixel kernels run WITHOUT any external codec for PNG
payloads: PNG is DEFLATE (stdlib zlib) behind five per-row byte
filters, so decode_png/encode_png below do true pixel decode/encode
with the standard library only (canonical, deterministic across
worker images). Non-PNG payloads fall back to Pillow behind a
RUNTIME import probe (the same pattern as the protobuf gate in
streaming/stateful.py) and raise NotImplementedError at the exact
codec call site when it is absent. ``decode=fake`` produces
deterministic synthetic outputs either way, so the Spark-side
plumbing — schema, batch shape, partitioning — is always real and
testable. Audio ``decode=real`` parses WAV with the stdlib ``wave``
module (also codec-free).

Scale notes: binary payloads ride in Arrow record batches between
JVM and Python — the per-row cost is amortized over the batch. The
operators are narrow (mapInPandas): no shuffle, linear scale-out.
The probe runs INSIDE the UDF, i.e. on the executor — on a real
cluster it is the worker image, not the driver, that must carry the
codec. Payloads should be size-capped per row (parquet/arrow
practical limits); large assets belong in object storage with a URI
column, fetched inside the UDF (the plumbing is identical).
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "asset_id long, width int, height int, channels int, format string"
)


def pil_image():
    """Import-probe for Pillow: the PIL.Image module, or None when the
    codec is absent. Called inside UDFs so the probe happens on the
    executor (worker image decides, not the driver)."""
    try:
        from PIL import Image
        return Image
    except Exception:
        return None


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions derived from a content
    digest. Replaced by a real codec in production."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240


def attach_binary(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Make an opaque binary column (testdata has no real blobs; the
    UTF-8 bytes of a text column stand in — plumbing is identical)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def image_metadata(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload",
                   decode: str = "fake") -> DataFrame:
    """Per-asset metadata extraction (decode header only).

    decode='real' decodes headers with Pillow when the executor has
    it (import-probed at run time); NotImplementedError otherwise."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = pil_image() if decode == "real" else None
        for b in batches:
            if decode == "real":
                if Image is None:
                    raise NotImplementedError(
                        "decode='real' needs Pillow on the executor; "
                        "install it or use decode='fake'")
                ws, hs, chans, fmts = [], [], [], []
                for p in b[payload_col]:
                    with Image.open(io.BytesIO(bytes(p))) as im:
                        ws.append(im.size[0])
                        hs.append(im.size[1])
                        chans.append(len(im.getbands()))
                        fmts.append((im.format or "unknown").lower())
                yield pd.DataFrame({
                    "asset_id": b[id_col].astype("int64"),
                    "width": ws, "height": hs, "channels": chans,
                    "format": fmts,
                })
                continue
            dims = [_fake_dims(bytes(p)) for p in b[payload_col]]
            yield pd.DataFrame({
                "asset_id": b[id_col].astype("int64"),
                "width": [w for w, _ in dims],
                "height": [h for _, h in dims],
                "channels": 3,
                "format": "fake/raw",
            })

    return df.select(id_col, payload_col).mapInPandas(
        extract, schema=IMAGE_META_SCHEMA)


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  id_col: str = "doc_id", payload_col: str = "payload",
                  decode: str = "fake") -> DataFrame:
    """Batch resize: binary in → binary out, with new dims recorded."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = pil_image() if decode == "real" else None
        for b in batches:
            if decode == "real":
                out = []
                for p in b[payload_col]:
                    raw = bytes(p)
                    try:
                        # canonical REAL path (PNG, codec-free):
                        # stdlib decode → pinned nearest resample
                        # (src = floor(dst*src_dim/dst_dim)) →
                        # stdlib re-encode. Deterministic across
                        # worker images — PIL only handles payload
                        # formats the stdlib kernel can't.
                        arr = decode_png(raw)
                        out.append(encode_png(
                            resize_nearest(arr, target_w, target_h)))
                    except NotImplementedError:
                        if Image is None:
                            raise
                        with Image.open(io.BytesIO(raw)) as im:
                            buf = io.BytesIO()
                            im.resize((target_w, target_h)).save(buf, "PNG")
                            out.append(buf.getvalue())
            else:
                out = [bytes(p)[: max(1, target_w * target_h // 8)]
                       for p in b[payload_col]]
            yield pd.DataFrame({
                "asset_id": b[id_col].astype("int64"),
                "payload": out,
                "width": target_w,
                "height": target_h,
            })

    return df.select(id_col, payload_col).mapInPandas(
        op, schema="asset_id long, payload binary, width int, height int")


def sample_frames(df: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8,
                  id_col: str = "doc_id", payload_col: str = "payload",
                  decode: str = "fake") -> DataFrame:
    """Frame sampling for "video" payloads: 1 row in → up to
    ``max_frames`` rows out (the UDTF/flat_map shape over binary).
    Fake decode slices the byte stream at fixed strides."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = pil_image() if decode == "real" else None
        for b in batches:
            ids, idxs, frames = [], [], []
            if decode == "real":
                if Image is None:
                    raise NotImplementedError(
                        "decode='real' frame extraction needs Pillow "
                        "(animated GIF/WebP) or ffmpeg for true video")
                for aid, p in zip(b[id_col], b[payload_col]):
                    with Image.open(io.BytesIO(bytes(p))) as im:
                        n = min(max_frames, getattr(im, "n_frames", 1))
                        for i in range(n):
                            im.seek(i)
                            buf = io.BytesIO()
                            im.convert("RGB").save(buf, "PNG")
                            ids.append(int(aid))
                            idxs.append(i)
                            frames.append(buf.getvalue())
                yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs,
                                    "frame": frames})
                continue
            for aid, p in zip(b[id_col], b[payload_col]):
                raw = bytes(p)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(int(aid))
                    idxs.append(i)
                    frames.append(raw[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(
        op, schema="asset_id long, frame_idx int, frame binary")


def feature_extract(df: DataFrame, dim: int = 16,
                    id_col: str = "doc_id", payload_col: str = "payload",
                    decode: str = "fake") -> DataFrame:
    """Binary → embedding (the model-inference slot). Fake path emits
    a deterministic content-derived vector so downstream similarity
    plumbing is exercisable end-to-end."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = pil_image() if decode == "real" else None
        for b in batches:
            vecs = []
            if decode == "real":
                for p in b[payload_col]:
                    raw = bytes(p)
                    try:
                        # canonical REAL path (PNG, codec-free):
                        # stdlib pixel decode → pinned luma → 16x16
                        # nearest resample. Model encoders slot in
                        # here for learned embeddings; the histogram
                        # is a true decode-derived feature.
                        g = to_grayscale(decode_png(raw))
                        px = [int(v) for v in
                              resize_nearest(g[:, :, None], 16, 16)
                              .ravel()]
                    except NotImplementedError:
                        if Image is None:
                            raise
                        with Image.open(io.BytesIO(raw)) as im:
                            px = list(im.convert("L").resize((16, 16))
                                      .getdata())
                    # normalized grayscale histogram: a real, deterministic
                    # decode-based feature (model encoders slot in here)
                    hist = [0] * dim
                    for v in px:
                        hist[min(dim - 1, v * dim // 256)] += 1
                    total = float(len(px)) or 1.0
                    vecs.append([h / total for h in hist])
                yield pd.DataFrame({"asset_id": b[id_col].astype("int64"),
                                    "embedding": vecs})
                continue
            for p in b[payload_col]:
                d = hashlib.sha256(bytes(p)).digest()
                vecs.append([((d[i % 32] / 255.0) * 2 - 1) for i in range(dim)])
            yield pd.DataFrame({"asset_id": b[id_col].astype("int64"),
                                "embedding": vecs})

    return df.select(id_col, payload_col).mapInPandas(
        op, schema="asset_id long, embedding array<float>")


# --- audio columns ---------------------------------------------------------

AUDIO_META_SCHEMA = ("asset_id long, sample_rate int, n_channels int, "
                     "n_frames long, duration_ms double")


def audio_metadata(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload",
                   decode: str = "fake") -> DataFrame:
    """Per-asset audio header metadata. decode='real' parses WAV
    containers with the STDLIB ``wave`` module (no external codec
    needed — this real path always works for RIFF/WAV payloads;
    non-WAV bytes raise the normal wave.Error). decode='fake'
    derives deterministic pseudo-metadata from a content digest, so
    plumbing tests run on arbitrary binary stand-ins."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import wave

        for b in batches:
            if decode == "real":
                srs, chs, nfs, durs = [], [], [], []
                for p in b[payload_col]:
                    with wave.open(io.BytesIO(bytes(p))) as w:
                        sr, ch, nf = (w.getframerate(), w.getnchannels(),
                                      w.getnframes())
                    srs.append(sr)
                    chs.append(ch)
                    nfs.append(nf)
                    durs.append(1000.0 * nf / sr)
                yield pd.DataFrame({
                    "asset_id": b[id_col].astype("int64"),
                    "sample_rate": srs, "n_channels": chs,
                    "n_frames": nfs, "duration_ms": durs})
                continue
            metas = []
            for p in b[payload_col]:
                d = hashlib.sha256(bytes(p)).digest()
                sr = (8000, 16000, 44100)[d[2] % 3]
                nf = len(bytes(p)) * 16
                metas.append((sr, 1 + d[3] % 2, nf, 1000.0 * nf / sr))
            yield pd.DataFrame({
                "asset_id": b[id_col].astype("int64"),
                "sample_rate": [m[0] for m in metas],
                "n_channels": [m[1] for m in metas],
                "n_frames": [m[2] for m in metas],
                "duration_ms": [m[3] for m in metas]})

    return df.select(id_col, payload_col).mapInPandas(
        extract, schema=AUDIO_META_SCHEMA)


def audio_frame_energy(df: DataFrame, window: int = 32, stride: int = 64,
                       max_frames: int = 8,
                       id_col: str = "doc_id",
                       payload_col: str = "payload",
                       decode: str = "fake") -> DataFrame:
    """Framed energy features (1 asset row → ≤ ``max_frames`` frame
    rows — the flat_map shape that feeds VAD gates and audio dedup).

    decode='real': int16 PCM from a WAV container (stdlib wave +
    numpy), energy = per-window RMS. decode='fake': frame i covers
    payload bytes [i*stride, i*stride+window) and energy is their
    MEAN BYTE VALUE — chosen deliberately so an external engine can
    replay it from the raw bytes (the registry oracle recomputes it
    from ASCII codes in SQL)."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import wave

        for b in batches:
            ids, idxs, starts, energies = [], [], [], []
            for aid, p in zip(b[id_col], b[payload_col]):
                raw = bytes(p)
                if decode == "real":
                    with wave.open(io.BytesIO(raw)) as w:
                        pcm = np.frombuffer(
                            w.readframes(w.getnframes()), dtype="<i2")
                    for i in range(max_frames):
                        s = i * stride
                        if s + window > len(pcm):
                            break
                        seg = pcm[s:s + window].astype("float64")
                        ids.append(int(aid))
                        idxs.append(i)
                        starts.append(s)
                        energies.append(float(np.sqrt((seg * seg).mean())))
                else:
                    for i in range(max_frames):
                        s = i * stride
                        if s + window > len(raw):
                            break
                        seg = raw[s:s + window]
                        ids.append(int(aid))
                        idxs.append(i)
                        starts.append(s)
                        energies.append(sum(seg) / float(window))
            yield pd.DataFrame({
                "asset_id": ids, "frame_idx": idxs,
                "start": starts, "energy": energies})

    return df.select(id_col, payload_col).mapInPandas(
        op, schema="asset_id long, frame_idx int, start long, energy double")


def speech_activity_ratio(frames: DataFrame,
                          threshold: float) -> DataFrame:
    """Energy-gate VAD summary over `audio_frame_energy` output: per
    asset, the fraction of frames above ``threshold`` (the
    keep/drop signal an audio curation pipeline filters on). One
    keyed aggregate."""
    return (frames.groupBy("asset_id")
            .agg(F.count(F.lit(1)).alias("n_frames"),
                 F.sum(F.when(F.col("energy") > threshold, 1)
                       .otherwise(0)).alias("n_active"))
            .withColumn("active_ratio",
                        F.round(F.col("n_active") / F.col("n_frames"), 4)))


# --- codec-free REAL header parsing (PNG/GIF/JPEG/BMP) -----------------------
# Closes the gap between decode='fake' and Pillow-gated decode='real':
# image dimensions/format live in the first bytes of the container and
# are parsed with pure stdlib struct math — runnable on ANY executor,
# no codec dependency, and exactly what a 100 TB ingest census needs
# (dims/format filtering happens long before pixel decode).

def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from container magic bytes, or None
    for unrecognized payloads. PNG: IHDR fixed offset; GIF: logical
    screen descriptor (LE); BMP: BITMAPINFOHEADER (LE); JPEG: walk
    the marker stream to the first SOFn frame header (BE)."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    if len(payload) >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return ("bmp", w, abs(h))
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
    return None


def image_header_metadata(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload") -> DataFrame:
    """REAL container-header decode (no codec needed): per asset,
    (format, width, height, n_bytes) parsed from PNG/GIF/JPEG/BMP
    magic structures; unrecognized payloads report format='unknown'
    with NULL dims instead of failing the batch (a corpus census
    must survive garbage bytes). Arrow-batched mapInPandas, narrow,
    schema-stable — the same plumbing contract as image_metadata."""
    schema = ("asset_id long, format string, width int, height int, "
              "n_bytes long")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fmts, ws, hs, ns = [], [], [], []
            for p in b[payload_col]:
                raw = bytes(p)
                parsed = parse_image_header(raw)
                if parsed is None:
                    fmts.append("unknown")
                    ws.append(None)
                    hs.append(None)
                else:
                    fmts.append(parsed[0])
                    ws.append(parsed[1])
                    hs.append(parsed[2])
                ns.append(len(raw))
            yield pd.DataFrame({
                "asset_id": b[id_col].astype("int64"),
                "format": fmts,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "n_bytes": ns,
            })

    return df.select(id_col, payload_col).mapInPandas(
        extract, schema=schema)


# --- codec-free REAL pixel decode (stdlib-PNG) ------------------------------
# Closes the last decode='real' gap: PNG pixel data is DEFLATE (stdlib
# zlib) behind five per-row predictive filters (pure byte arithmetic),
# so full pixel decode needs no external codec at all. These kernels
# are the executor-side fallback when Pillow is absent: the pixel
# paths (resize_images / feature_extract / image_pixel_stats) stay
# REAL for PNG payloads on any worker image. 8-bit, non-interlaced,
# color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA) — the shapes a
# curation pipeline normalizes to anyway.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_row(ft: int, cur: bytearray, prev: bytes, bpp: int) -> None:
    """Reconstruct one scanline in place (PNG filters 0-4). Byte
    arithmetic is mod-256 per the spec."""
    n = len(cur)
    if ft == 0:
        return
    if ft == 1:  # Sub
        for x in range(bpp, n):
            cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
    elif ft == 2:  # Up
        for x in range(n):
            cur[x] = (cur[x] + prev[x]) & 0xFF
    elif ft == 3:  # Average
        for x in range(n):
            left = cur[x - bpp] if x >= bpp else 0
            cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
    elif ft == 4:  # Paeth
        for x in range(n):
            left = cur[x - bpp] if x >= bpp else 0
            ul = prev[x - bpp] if x >= bpp else 0
            cur[x] = (cur[x] + _paeth(left, prev[x], ul)) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter type {ft}")


def _filter_row(ft: int, raw: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply one PNG filter to a raw scanline (encoder side)."""
    n = len(raw)
    out = bytearray(n)
    for x in range(n):
        left = raw[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if ft == 0:
            v = raw[x]
        elif ft == 1:
            v = raw[x] - left
        elif ft == 2:
            v = raw[x] - up
        elif ft == 3:
            v = raw[x] - ((left + up) >> 1)
        elif ft == 4:
            v = raw[x] - _paeth(left, up, ul)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[x] = v & 0xFF
    return bytes(out)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(arr) -> bytes:
    """Encode a uint8 numpy array (HxW gray or HxWx{2,3,4}) as a
    valid 8-bit PNG — stdlib only. Filter type rotates per row
    (row % 5), deliberately exercising every unfilter path on the
    decode side; a production encoder would pick per-row minimal-
    entropy filters, same container either way."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    bpp = ch
    prev = bytes(w * ch)
    body = bytearray()
    for y in range(h):
        raw = a[y].tobytes()
        ft = y % 5
        body.append(ft)
        body += _filter_row(ft, raw, prev, bpp)
        prev = raw
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes):
    """Full PNG pixel decode with stdlib zlib + pure byte math:
    returns an HxWxC uint8 numpy array. Supports bit depth 8,
    color types 0/2/4/6, non-interlaced (the normalized-corpus
    shapes); anything else raises NotImplementedError so callers
    can route to a real codec."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG payload (stdlib decode "
                                  "handles PNG only; use Pillow for "
                                  "other formats)")
    pos, idat, meta = 8, bytearray(), None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or color not in _PNG_CHANNELS or interlace:
                raise NotImplementedError(
                    "stdlib PNG decode supports 8-bit non-interlaced "
                    "gray/RGB/GA/RGBA only")
            meta = (w, h, _PNG_CHANNELS[color])
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    stream = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(stream) != h * (stride + 1):
        raise ValueError("PNG pixel stream length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytes(stride)
    for y in range(h):
        off = y * (stride + 1)
        row = bytearray(stream[off + 1:off + 1 + stride])
        _unfilter_row(stream[off], row, prev, ch)
        prev = bytes(row)
        out[y] = np.frombuffer(prev, dtype=np.uint8)
    return out.reshape(h, w, ch)


def resize_nearest(arr, target_w: int, target_h: int):
    """Nearest-neighbor resample of an HxWxC uint8 array (numpy
    fancy indexing — one gather, no Python per pixel)."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return arr[ys[:, None], xs[None, :]]


def to_grayscale(arr):
    """Luma conversion (ITU-R 601 integer weights) for 1/2/3/4-channel
    uint8 arrays; alpha is ignored."""
    import numpy as np

    ch = arr.shape[2]
    if ch <= 2:
        return arr[:, :, 0]
    rgb = arr[:, :, :3].astype(np.uint32)
    return ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2])
            // 1000).astype(np.uint8)


def make_pattern_png(width: int, height: int) -> bytes:
    """Deterministic grayscale test image: pixel(x, y) =
    (31x + 57y) mod 256 — wraps mod 256 (so a decoder that drops
    carries fails), replayable by an external engine from (w, h)
    alone (the registry oracle recomputes the sum in SQL)."""
    import numpy as np

    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    return encode_png(((xs * 31 + ys * 57) % 256).astype(np.uint8))


def image_pixel_stats(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """REAL pixel-level decode census: per asset, pixel count and
    exact integer luma sum. Pillow when the executor has it, the
    stdlib PNG kernel otherwise — both paths are true decodes
    (inflate + unfilter), not digests. Arrow-batched mapInPandas,
    narrow, linear scale-out; per-asset cost is bounded by payload
    size, so partition sizing is byte-based like any blob scan."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = pil_image()
        for b in batches:
            ns, sums = [], []
            for p in b[payload_col]:
                raw = bytes(p)
                try:
                    # canonical path: stdlib PNG decode + pinned
                    # integer luma — deterministic across workers;
                    # PIL only covers non-PNG payload formats.
                    g = to_grayscale(decode_png(raw)).astype(np.uint32)
                except NotImplementedError:
                    if Image is None:
                        raise
                    with Image.open(io.BytesIO(raw)) as im:
                        g = np.asarray(im.convert("L"), dtype=np.uint32)
                ns.append(int(g.size))
                sums.append(int(g.sum()))
            yield pd.DataFrame({
                "asset_id": b[id_col].astype("int64"),
                "n_px": ns, "sum_px": sums})

    return df.select(id_col, payload_col).mapInPandas(
        op, schema="asset_id long, n_px long, sum_px long")


def image_dhash(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """REAL perceptual hashes per image: 64-bit difference hash
    (dHash) and average hash (aHash) computed from true pixel decode
    — the standard image near-dup signatures (robust to re-encode,
    resize, and mild edits, unlike byte digests).

    dHash: grayscale → 9x8 nearest resample → bit(y*8+x) set iff
    p(x,y) > p(x+1,y). aHash: 8x8 resample → bit set iff the pixel
    exceeds the image mean (64*p > sum(p) — exact integer compare,
    no float division). Both ride the pinned stdlib PNG decode /
    luma / nearest-resample kernels (Pillow only for non-PNG), so
    hashes are deterministic across worker images and externally
    replayable from the synthetic-pattern formula. Unsigned 64-bit
    values wrap to signed longs (two's complement) so downstream
    XOR/bit_count blocking stays JVM-native.

    Narrow mapInPandas — no shuffle; cost is the pixel decode."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = pil_image()

        def gray(raw: bytes):
            try:
                return to_grayscale(decode_png(raw))
            except NotImplementedError:
                if Image is None:
                    raise
                with Image.open(io.BytesIO(raw)) as im:
                    return np.asarray(im.convert("L"), dtype=np.uint8)

        def signed(u: int) -> int:
            return u - (1 << 64) if u >= (1 << 63) else u

        for b in batches:
            dhs, ahs = [], []
            for p in b[payload_col]:
                g = gray(bytes(p))
                d9 = resize_nearest(g[:, :, None], 9, 8)[:, :, 0]
                bits = (d9[:, :8] > d9[:, 1:]).astype(np.uint64)
                dh = int((bits.ravel()
                          << np.arange(64, dtype=np.uint64)).sum())
                a8 = resize_nearest(g[:, :, None], 8, 8)[:, :, 0]
                abits = ((a8.astype(np.int64) * 64) >
                         int(a8.sum())).astype(np.uint64)
                ah = int((abits.ravel()
                          << np.arange(64, dtype=np.uint64)).sum())
                dhs.append(signed(dh))
                ahs.append(signed(ah))
            yield pd.DataFrame({
                "asset_id": b[id_col].astype("int64"),
                "dhash": dhs, "ahash": ahs})

    return df.select(id_col, payload_col).mapInPandas(
        op, schema="asset_id long, dhash long, ahash long")


def hamming_near_dup_pairs(hashes: DataFrame, id_col: str = "asset_id",
                           hash_col: str = "dhash",
                           max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs over any 64-bit signature column via pigeonhole
    bit-chunk blocking (the simhash_near_pairs plan generalized to a
    precomputed hash — see functions/dedup.py): split the 64 bits
    into ``max_hamming + 1`` chunks, equi-join on (chunk, value) —
    any pair within the hamming budget must agree exactly on at
    least one chunk — then verify true XOR bit_count on candidates
    only. Linear candidate generation (never all-pairs), one
    shuffle on uniform chunk keys; everything JVM-side.

    The pigeonhole guarantee needs ``max_hamming + 1`` chunks of a
    64-bit signature; beyond 15 differing bits a capped chunk count
    would silently MISS pairs, so that budget is rejected instead."""
    if max_hamming + 1 > 16:
        raise ValueError(
            f"max_hamming={max_hamming} needs {max_hamming + 1} chunks; "
            "pigeonhole blocking over 64-bit signatures supports at most "
            "16 (max_hamming <= 15) — larger radii need a different "
            "blocking scheme (e.g. multi-index recursion)")
    n_chunks = max_hamming + 1
    bounds = [round(i * 64 / n_chunks) for i in range(n_chunks + 1)]
    fp = hashes.select(F.col(id_col).alias("doc"),
                       F.col(hash_col).alias("fp"))
    chunk_keys = []
    for i in range(n_chunks):
        start, width = bounds[i], bounds[i + 1] - bounds[i]
        chunk_keys.append(F.struct(
            F.lit(i).alias("chunk"),
            F.shiftright(F.col("fp"), start)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("key")))
    chunks = fp.select(
        "doc", "fp", F.explode(F.array(*chunk_keys)).alias("c"),
    ).select("doc", "fp", "c.chunk", "c.key")
    a = chunks.select("chunk", "key", F.col("doc").alias("doc_a"),
                      F.col("fp").alias("fp_a"))
    b = chunks.select("chunk", "key", F.col("doc").alias("doc_b"),
                      F.col("fp").alias("fp_b"))
    cand = (a.join(b, ["chunk", "key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "fp_a", "fp_b").distinct())
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def hamming_near_dup_pair_counts(hashes: DataFrame,
                                 id_col: str = "asset_id",
                                 hash_col: str = "dhash",
                                 max_hamming: int = 3) -> DataFrame:
    """Pair COUNTS per hamming distance — exactly
    ``hamming_near_dup_pairs(...).groupBy("hamming").count()`` —
    computed from collapsed signature classes, never enumerating
    doc-level pairs.

    Why (guide §2.5, hot keys; r9 opt round): identical signatures
    form classes, and the doc-level pigeonhole self-join emits g²
    candidates per class of size g — quadratic when signatures
    repeat (the 300x scale smoke measured 423x wall for 300x data on
    the 425-class synthetic image corpus). Counts only need class
    arithmetic: within a class every pair is hamming 0 (C(g,2)
    pairs); across two DISTINCT classes every doc pair shares the
    classes' fingerprint hamming (g_a·g_b pairs), which is >= 1. So
    the blocking runs over distinct signatures — bounded by the
    signature space, not the corpus — and the counts are identical
    to the pair-enumerating plan by construction (pinned by
    test_multimodal_streaming against the brute-force form).

    The class table is guide §8's 'decide on hashes' signature
    table: ONE linear groupBy over the corpus (partial-agg
    combinable, so hot classes never skew a reducer), materialized
    once (distinct fps × 16 bytes). Null signatures are excluded,
    matching the pair form (a null key never equi-joins).
    ``id_col`` is unused for counting but kept for signature parity
    with ``hamming_near_dup_pairs``.

    PRECONDITION (r9 ADVICE): rows must be distinct documents — one
    row per ``id_col`` value. A duplicated id contributes class
    multiplicity here (counted) but is dropped by the pair form's
    ``doc_a < doc_b`` / ``distinct()``, so the two plans diverge on
    non-unique ids. Callers with possibly-duplicated ids must dedup
    on (id_col, hash_col) first; every registry caller feeds one row
    per asset by construction."""
    classes = (hashes
               .filter(F.col(hash_col).isNotNull())
               .groupBy(F.col(hash_col).alias("__fp"))
               .agg(F.count(F.lit(1)).alias("__n"))
               .localCheckpoint(eager=True))
    cand = hamming_near_dup_pairs(
        classes.select(F.col("__fp").alias("asset_id"),
                       F.col("__fp").alias("dhash")),
        max_hamming=max_hamming)
    h_type = dict(cand.dtypes)["hamming"]
    cross = (cand
             .join(classes.select(F.col("__fp").alias("doc_a"),
                                  F.col("__n").alias("__na")), "doc_a")
             .join(classes.select(F.col("__fp").alias("doc_b"),
                                  F.col("__n").alias("__nb")), "doc_b")
             .select("hamming",
                     (F.col("__na") * F.col("__nb")).alias("__cnt")))
    within = (classes.filter(F.col("__n") >= 2)
              .select(F.lit(0).cast(h_type).alias("hamming"),
                      F.expr("(__n * (__n - 1)) DIV 2").alias("__cnt")))
    return (within.unionByName(cross)
            .groupBy("hamming")
            # coalesce with a non-null literal: sum() is declared
            # nullable but never null over a non-empty group — this
            # pins n_pairs back to count()'s non-nullable long so the
            # declared schema is BIT-identical to the pair plan's
            .agg(F.coalesce(F.sum("__cnt"), F.lit(0).cast("long"))
                 .alias("n_pairs")))


def make_test_png(width: int, height: int) -> bytes:
    """A minimal VALID 8-bit grayscale PNG of the given dims (stdlib
    zlib only) — deterministic synthetic payloads for exercising the
    real header/codec paths without shipping binary fixtures."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def make_test_wav(doc_id: int, sample_rate: int = 8000) -> bytes:
    """Deterministic mono 16-bit WAV: sample i =
    ((a*i + doc_id) mod 4096) - 2048 with a = 3 + doc_id % 5 and
    n = 256 + doc_id % 128 samples — a real RIFF container (stdlib
    ``wave``) whose PCM an external engine can replay from doc_id
    alone (the registry oracle recomputes ZCR / amplitude sums in
    SQL, like make_pattern_png's pixel formula)."""
    import struct
    import wave

    import numpy as np

    a = 3 + doc_id % 5
    n = 256 + doc_id % 128
    pcm = (((a * np.arange(n, dtype=np.int64) + doc_id) % 4096)
           - 2048).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    del struct
    return buf.getvalue()


def audio_zcr_fingerprint(df: DataFrame, frame: int = 64,
                          max_frames: int = 4,
                          id_col: str = "doc_id",
                          payload_col: str = "payload") -> DataFrame:
    """REAL audio fingerprint features from true WAV decode (stdlib
    ``wave`` — codec-free on any executor): per non-overlapping
    frame, the zero-crossing count (sign transitions between the
    frame's consecutive samples — the classic spectral-content
    proxy) and the exact integer sum of absolute amplitudes. These
    per-frame integer pairs are the quantized fingerprint rows that
    audio dedup / retrieval buckets on (two tracks matching on all
    frame features are duplicate candidates — same shape as the
    image dHash path).

    Narrow mapInPandas (1 asset row → ≤ max_frames feature rows, the
    flat_map shape); all arithmetic exact-integer so the output is
    engine-replayable."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import wave

        for b in batches:
            ids, idxs, zcrs, sums = [], [], [], []
            for aid, p in zip(b[id_col], b[payload_col]):
                with wave.open(io.BytesIO(bytes(p))) as w:
                    pcm = np.frombuffer(
                        w.readframes(w.getnframes()),
                        dtype="<i2").astype(np.int64)
                for fi in range(min(max_frames, len(pcm) // frame)):
                    seg = pcm[fi * frame:(fi + 1) * frame]
                    neg = seg < 0
                    ids.append(int(aid))
                    idxs.append(fi)
                    zcrs.append(int((neg[1:] != neg[:-1]).sum()))
                    sums.append(int(np.abs(seg).sum()))
            yield pd.DataFrame({
                "asset_id": ids, "frame_idx": idxs,
                "zcr": zcrs, "sum_abs": sums})

    return df.select(id_col, payload_col).mapInPandas(
        op, schema="asset_id long, frame_idx int, zcr int, sum_abs long")
