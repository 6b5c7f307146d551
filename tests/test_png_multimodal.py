"""Pure-stdlib PNG codec + the multimodal codec='real' path."""

import struct
import zlib

import numpy as np
import pytest

from reffy_spark.functions.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    is_png,
)


def _rng_img(h, w, c, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(6, 9, 3), (5, 4, 1), (7, 3, 4)])
def test_png_roundtrip(shape):
    img = _rng_img(*shape)
    data = encode_png(img)
    assert is_png(data)
    out = decode_png(data)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def _filter_line(ftype, cur, prev, bpp):
    """Forward-apply a PNG filter (the encoder side of filters 1-4, which
    encode_png never emits) so the decoder's unfilter paths are tested
    against an independent implementation."""
    cur = cur.astype(np.int32)
    prev = prev.astype(np.int32)
    out = np.empty_like(cur)
    for x in range(len(cur)):
        a = cur[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[x] = (cur[x] - pred) & 0xFF
    return out.astype(np.uint8)


def _chunk(ctype, data):
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def test_png_decode_all_filter_types():
    img = _rng_img(5, 6, 3, seed=11)
    h, w, c = img.shape
    flat = img.reshape(h, w * c)
    body = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        ftype = y % 5  # none, sub, up, average, paeth across the rows
        body.append(ftype)
        body.extend(_filter_line(ftype, flat[y], prev, c).tobytes())
        prev = flat[y]
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(body)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    img16 = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(img16)


def test_multimodal_real_codec_decodes_png(spark):
    from reffy_spark.operators import multimodal as MM

    imgs = [_rng_img(6, 8, 3, seed=i) for i in range(4)]
    df = spark.createDataFrame(
        [(i, bytearray(encode_png(a))) for i, a in enumerate(imgs)],
        "doc_id long, image binary",
    )
    feats = {r["doc_id"]: r for r in MM.image_features(df, codec="real").collect()}
    for i, a in enumerate(imgs):
        means = a.astype(np.float64).mean(axis=(0, 1))
        assert feats[i]["mean_r"] == pytest.approx(means[0], abs=1e-5)
        assert feats[i]["mean_b"] == pytest.approx(means[2], abs=1e-5)
        assert len(feats[i]["embedding"]) == 6
    resized = {r["doc_id"]: r for r in MM.resize_images(df, 4, 4, codec="real").collect()}
    for i in range(4):
        out = decode_png(bytes(resized[i]["image"]))
        assert out.shape == (4, 4, 3)
        # nearest-neighbor: every output pixel exists in the source
        src_px = {tuple(p) for p in imgs[i].reshape(-1, 3)}
        assert all(tuple(p) in src_px for p in out.reshape(-1, 3))


def test_multimodal_real_codec_greyscale_means(spark):
    from reffy_spark.operators import multimodal as MM

    grey = _rng_img(5, 5, 1, seed=3)
    df = spark.createDataFrame(
        [(0, bytearray(encode_png(grey)))], "doc_id long, image binary"
    )
    row = MM.image_features(df, codec="real").collect()[0]
    m = grey.astype(np.float64).mean()
    assert row["mean_r"] == row["mean_g"] == row["mean_b"] == pytest.approx(m, abs=1e-5)


def test_multimodal_real_codec_rejects_non_png(spark):
    from reffy_spark.operators import multimodal as MM

    df = MM.attach_fake_images(spark.range(0, 1).withColumnRenamed("id", "doc_id"))
    with pytest.raises(Exception, match="Pillow|libvips"):
        MM.image_features(df, codec="real").collect()
