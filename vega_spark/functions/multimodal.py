"""Multimodal columns: image/audio/video as opaque BINARY columns
with typed metadata, processed via Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the decode kernels are
STUBBED: ``decode=fake`` produces deterministic synthetic outputs
(so the Spark-side plumbing — schema, batch shape, partitioning —
is real and testable); ``decode=real`` raises NotImplementedError
at the exact point a codec (PIL/ffmpeg/torchaudio) would be called.

Scale notes: binary payloads ride in Arrow record batches between
JVM and Python — the per-row cost is amortized over the batch. The
operators are narrow (mapInPandas): no shuffle, linear scale-out.
Payloads should be size-capped per row (parquet/arrow practical
limits); large assets belong in object storage with a URI column,
fetched inside the UDF (the plumbing is identical).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "asset_id long, width int, height int, channels int, format string"
)


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

    decode='real' is the integration point for PIL/libmagic — raises
    NotImplementedError in this container."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if decode == "real":
                raise NotImplementedError(
                    "image codec not available in this container; "
                    "plug PIL.Image.open(io.BytesIO(payload)) here")
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
        for b in batches:
            if decode == "real":
                raise NotImplementedError("resize kernel needs PIL/cv2")
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
        for b in batches:
            if decode == "real":
                raise NotImplementedError("frame extraction needs ffmpeg")
            ids, idxs, frames = [], [], []
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
        for b in batches:
            if decode == "real":
                raise NotImplementedError("feature extractor model not bundled")
            vecs = []
            for p in b[payload_col]:
                d = hashlib.sha256(bytes(p)).digest()
                vecs.append([((d[i % 32] / 255.0) * 2 - 1) for i in range(dim)])
            yield pd.DataFrame({"asset_id": b[id_col].astype("int64"),
                                "embedding": vecs})

    return df.select(id_col, payload_col).mapInPandas(
        op, schema="asset_id long, embedding array<float>")
