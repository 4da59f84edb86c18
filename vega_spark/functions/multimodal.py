"""Multimodal columns: image/audio/video as opaque BINARY columns
with typed metadata, processed via Arrow-batched pandas UDFs.

Decode kernels are gated on a RUNTIME import probe (the same pattern
as the protobuf gate in streaming/stateful.py): ``decode=real`` uses
Pillow when it imports, and raises NotImplementedError at the exact
codec call site otherwise (this container bundles no media libs).
``decode=fake`` produces deterministic synthetic outputs either way,
so the Spark-side plumbing — schema, batch shape, partitioning — is
always real and testable.

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
                if Image is None:
                    raise NotImplementedError(
                        "decode='real' resize needs Pillow on the executor")
                out = []
                for p in b[payload_col]:
                    with Image.open(io.BytesIO(bytes(p))) as im:
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
                if Image is None:
                    raise NotImplementedError(
                        "decode='real' feature extraction needs Pillow on "
                        "the executor (grayscale-histogram features); plug "
                        "a model encoder here for learned embeddings")
                for p in b[payload_col]:
                    with Image.open(io.BytesIO(bytes(p))) as im:
                        px = list(im.convert("L").resize((16, 16)).getdata())
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
