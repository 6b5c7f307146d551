"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. Two codecs:

- ``codec="fake"`` (default): deterministic synthetic payloads that
  exercise the full Spark-side contract — schema, partitioning, UDF
  signature, batch shapes — which is what the pipeline architecture
  actually depends on.
- ``codec="real"``: decodes REAL bytes. PNG (8-bit grey/RGB/RGBA,
  non-interlaced) is handled by the pure-stdlib decoder in
  ``reffy_spark.functions.png`` — no image libraries needed; any other
  format raises ``NotImplementedError`` naming the intended dependency
  (Pillow/libvips), since this container ships none.

Fake payload layout (deterministic, seed-free):
    bytes 0-3   magic b"FIMG"
    bytes 4-5   width  (uint16 LE)
    bytes 6-7   height (uint16 LE)
    byte  8     channels
    bytes 9+    row-major pixel bytes (width*height*channels)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FIMG"

META_SCHEMA = "struct<mime:string, width:int, height:int, channels:int>"


def fake_image_bytes(seed: int, width: int = 8, height: int = 6, channels: int = 3) -> bytes:
    """Deterministic fake image payload (pixel k = (seed*31+k) % 256)."""
    n = width * height * channels
    px = bytes((seed * 31 + k) % 256 for k in range(n))
    return MAGIC + struct.pack("<HHB", width, height, channels) + px


def attach_fake_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Add a deterministic binary image column + typed metadata struct to
    any table — the input-shape adapter for multimodal pipelines."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b[id_col].astype("int64")
            w = (ids % 5 + 4).astype("int64")  # 4..8
            h = (ids % 3 + 3).astype("int64")  # 3..5
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "image": [
                        fake_image_bytes(int(i), int(wi), int(hi))
                        for i, wi, hi in zip(ids, w, h)
                    ],
                    "mime": "image/x-fake",
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "channels": np.int32(3),
                }
            )

    out = docs.select(id_col).mapInPandas(
        gen,
        "doc_id long, image binary, mime string, width int, height int, channels int",
    )
    return out.select(
        "doc_id",
        "image",
        F.struct("mime", "width", "height", "channels").alias("meta"),
    )


def _decode(payload: bytes) -> np.ndarray:
    if payload[:4] != MAGIC:
        raise ValueError("not a fake image payload")
    w, h, c = struct.unpack("<HHB", payload[4:9])
    return np.frombuffer(payload[9 : 9 + w * h * c], dtype=np.uint8).reshape(h, w, c)


def _decoder(codec: str):
    """Codec dispatch shared by the mapInPandas stages. Returns a
    ``payload -> (h, w, c) uint8 ndarray`` callable."""
    if codec == "fake":
        return _decode
    if codec == "real":
        from reffy_spark.functions.png import decode_png, is_png

        def real(payload: bytes) -> np.ndarray:
            data = bytes(payload)
            if is_png(data):
                return decode_png(data)
            raise NotImplementedError(
                "codec='real' decodes PNG via the stdlib decoder; other "
                "formats (JPEG/WebP/...) require Pillow or libvips — not "
                "present in this container"
            )

        return real
    raise ValueError(f"unknown codec {codec!r} (expected 'fake' or 'real')")


def image_features(
    images: DataFrame,
    codec: str = "fake",
    id_col: str = "doc_id",
    bin_col: str = "image",
) -> DataFrame:
    """Decode + feature-extract (per-channel mean/std + a tiny 'embedding'
    of row means). Arrow-batched; decode cost is the dominating term at
    scale, so the stage is embarrassingly parallel over the binary column
    and should follow a repartition by id hash (no skew: payload sizes
    are bounded by the format, not the key distribution).

    ``codec="real"`` decodes PNG payloads via the stdlib decoder; grey
    images report the single channel as all three means, RGBA images
    report the color channels (alpha excluded from means, included in
    std/embedding).
    """
    decode = _decoder(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for i, payload in zip(b[id_col], b[bin_col]):
                arr = decode(bytes(payload)).astype(np.float64)
                means = arr.mean(axis=(0, 1))
                if means.shape[0] == 1:  # greyscale
                    m_r = m_g = m_b = float(means[0])
                else:  # RGB / RGBA: color channels only
                    m_r, m_g, m_b = (float(means[j]) for j in range(3))
                recs.append(
                    {
                        "doc_id": int(i),
                        "mean_r": round(m_r, 6),
                        "mean_g": round(m_g, 6),
                        "mean_b": round(m_b, 6),
                        "std_all": round(float(arr.std()), 6),
                        "embedding": [
                            round(float(x), 6) for x in arr.mean(axis=(1, 2))
                        ],
                    }
                )
            yield pd.DataFrame(
                recs,
                columns=["doc_id", "mean_r", "mean_g", "mean_b", "std_all", "embedding"],
            )

    return images.select(id_col, bin_col).mapInPandas(
        run,
        "doc_id long, mean_r double, mean_g double, mean_b double, "
        "std_all double, embedding array<double>",
    )


def resize_images(
    images: DataFrame,
    out_w: int,
    out_h: int,
    codec: str = "fake",
    id_col: str = "doc_id",
    bin_col: str = "image",
) -> DataFrame:
    """Nearest-neighbor resize + re-encode in the input's format (the
    decode→transform→encode roundtrip every multimodal pipeline needs).
    ``codec="real"`` round-trips PNG bytes via the stdlib codec."""
    decode = _decoder(codec)

    def encode(arr: np.ndarray, c: int) -> bytes:
        if codec == "fake":
            h, w = arr.shape[:2]
            return MAGIC + struct.pack("<HHB", w, h, c) + arr.tobytes()
        from reffy_spark.functions.png import encode_png

        return encode_png(arr)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_rows = []
            for i, payload in zip(b[id_col], b[bin_col]):
                arr = decode(bytes(payload))
                h, w, c = arr.shape
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = np.ascontiguousarray(arr[np.ix_(ys, xs)])
                out_rows.append({"doc_id": int(i), "image": encode(resized, c)})
            yield pd.DataFrame(out_rows, columns=["doc_id", "image"])

    return images.select(id_col, bin_col).mapInPandas(run, "doc_id long, image binary")
