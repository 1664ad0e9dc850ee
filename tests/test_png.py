"""Pure-Python PNG codec tests (datapipe/png.py).

PNG is lossless, so the anchor is EXACT round-trip through every
scanline filter type and every supported color layout — a wrong
Paeth/Average reconstruction flips bytes and fails equality, no PSNR
slack needed. Palette and honesty gates (interlace, 16-bit) are pinned
separately."""

import struct
import zlib

import numpy as np
import pytest

from dask_ml_spark.datapipe.png import _SIG, _chunk, decode_png, encode_png


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "mixed"])
def test_exact_roundtrip_all_filters_and_layouts(channels, filter_type):
    rng = np.random.RandomState(channels * 7 + 1)
    img = rng.randint(0, 256, size=(11, 6, channels), dtype="uint8")
    out = decode_png(encode_png(img, filter_type))
    assert out.shape == img.shape
    assert (out == img).all()


def test_gradient_roundtrip_and_2d_input():
    y = np.linspace(0, 255, 16).astype("uint8")
    img = np.tile(y[:, None], (1, 9))  # 2-D grayscale in → (h, w, 1) out
    out = decode_png(encode_png(img, "mixed"))
    assert out.shape == (16, 9, 1)
    assert (out[:, :, 0] == img).all()


def test_palette_png_expands_to_rgb():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype="uint8")
    idx = np.array([[0, 1], [2, 3]], dtype="uint8")
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    data = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert (decode_png(data) == pal[idx]).all()


def test_honest_gates():
    img = np.zeros((4, 4, 3), dtype="uint8")
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    # ILLEGAL spec combos still raise (16-bit/Adam7 became real in r7;
    # what's rejected now is what the spec itself forbids)
    bad = bytearray(good)
    bad[24] = 16  # depth 16 ...
    bad[25] = 3   # ... with palette color type: illegal per §11.2.2
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bytes(bad))
    bad2 = bytearray(good)
    bad2[24] = 2  # depth 2 with RGB: illegal
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bytes(bad2))
    # flipping the depth/interlace bytes on an 8-bit sequential payload
    # now fails the payload-length consistency check instead
    deep = bytearray(good)
    deep[24] = 16
    with pytest.raises(ValueError, match="length"):
        decode_png(bytes(deep))
    # corrupt payload length
    short = struct.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", short)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="length"):
        decode_png(data)


def test_16bit_lowdepth_and_adam7_roundtrip():
    """r7 decode-matrix closure: 16-bit (all color types), 1/2/4-bit
    grayscale and palette, and Adam7 interlacing — every mode
    round-trips through the fixture encoder, interlaced output equals
    sequential output, and 16-bit v*257 folds back to v exactly."""
    rng = np.random.RandomState(3)
    # 16-bit: gray, gray+alpha, RGB, RGBA — v*257 has high byte v
    for chs in (None, 2, 3, 4):
        shape = (11, 13) if chs is None else (11, 13, chs)
        v8 = rng.randint(0, 256, shape, dtype=np.uint8)
        v16 = v8.astype(np.uint16) * 257
        out = decode_png(encode_png(v16, depth=16))
        np.testing.assert_array_equal(
            out, v8.reshape(11, 13, -1))
        # 16-bit + Adam7 together
        out_i = decode_png(encode_png(v16, depth=16, interlace=True))
        np.testing.assert_array_equal(out_i, out)
    # low-depth grayscale: values scale by 255/(2^d - 1)
    for d in (1, 2, 4):
        lv = rng.randint(0, 1 << d, (9, 17), dtype=np.uint8)
        out = decode_png(encode_png(lv, depth=d))
        np.testing.assert_array_equal(
            out[:, :, 0], lv * (255 // ((1 << d) - 1)))
        out_i = decode_png(encode_png(lv, depth=d, interlace=True))
        np.testing.assert_array_equal(out_i, out)
    # low-depth palette: indices expand through PLTE
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (10, 21), dtype=np.uint8)
    out = decode_png(encode_png(idx, depth=4, palette=pal))
    np.testing.assert_array_equal(out, pal[idx])
    # Adam7 on plain 8-bit across every filter type
    img = rng.randint(0, 256, (23, 19, 3), dtype=np.uint8)
    for ft in (0, 1, 2, 3, 4, "mixed"):
        out_i = decode_png(encode_png(img, filter_type=ft,
                                      interlace=True))
        np.testing.assert_array_equal(out_i, img)
    # tiny images where some Adam7 passes are EMPTY
    for shape in ((1, 1, 3), (2, 3), (5, 4, 4), (8, 1)):
        small = rng.randint(0, 256, shape, dtype=np.uint8)
        out_i = decode_png(encode_png(small, interlace=True))
        np.testing.assert_array_equal(out_i, small.reshape(
            shape[0], shape[1], -1))


def test_decode_image_features_real_png(spark):
    """The Spark plumbing path: PNG blobs through mapInPandas under
    stub=False produce the same mean-pooled features numpy computes."""
    from pyspark.sql import functions as F

    from dask_ml_spark.datapipe.multimodal import (_resize_nearest,
                                                   decode_image_features)

    rng = np.random.RandomState(5)
    imgs = {i: rng.randint(0, 256, size=(10, 8, 3), dtype="uint8")
            for i in range(4)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_png(img, "mixed"))) for i, img in imgs.items()],
        "doc_id long, blob binary")
    out = decode_image_features(df, resize=(4, 4), stub=False).toPandas()
    out = out.set_index("doc_id")
    for i, img in imgs.items():
        ref = _resize_nearest(img, 4, 4).mean(axis=2).ravel()
        assert np.allclose(np.asarray(out.loc[i, "features"]), ref)
        assert out.loc[i, "n_bytes"] == len(encode_png(img, "mixed"))
    # RGBA alpha is dropped, gray is replicated — both still decode
    rgba = rng.randint(0, 256, size=(6, 6, 4), dtype="uint8")
    gray = rng.randint(0, 256, size=(6, 6, 1), dtype="uint8")
    df2 = spark.createDataFrame(
        [(0, bytearray(encode_png(rgba))), (1, bytearray(encode_png(gray)))],
        "doc_id long, blob binary")
    o2 = decode_image_features(df2, resize=(3, 3), stub=False).toPandas()
    o2 = o2.set_index("doc_id")
    assert np.allclose(np.asarray(o2.loc[0, "features"]),
                       _resize_nearest(rgba[:, :, :3], 3, 3).mean(axis=2).ravel())
    assert np.allclose(np.asarray(o2.loc[1, "features"]),
                       _resize_nearest(np.repeat(gray, 3, axis=2), 3, 3)
                       .mean(axis=2).ravel())
