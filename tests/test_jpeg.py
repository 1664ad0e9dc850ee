"""Pure-Python baseline JPEG codec tests (datapipe/jpeg.py).

Round-trip alone can hide self-cancelling encoder/decoder bug pairs,
so the suite anchors on analytic facts: a uniform image is DC-only and
must decode EXACTLY to its quantized DC value; PSNR floors catch
coefficient/zigzag scrambles (a mis-ordered zigzag craters PSNR)."""

import numpy as np
import pytest

from dask_ml_spark.datapipe.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = float(((a.astype(float) - b.astype(float)) ** 2).mean())
    return 10 * np.log10(255**2 / mse) if mse else np.inf


def test_uniform_image_decodes_to_dc_exact():
    for val in (0, 77, 130, 255):
        img = np.full((16, 16, 3), val, np.uint8)
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == (16, 16, 3)
        # DC-only: every output pixel identical, within DC quant step
        assert dec.std() == 0.0
        assert abs(int(dec[0, 0, 0]) - val) <= 9


def test_gradient_roundtrip_psnr_444_and_420():
    h, w = 24, 40
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    img = np.clip(np.concatenate(
        [x * np.ones((h, 1, 1)), y * np.ones((1, w, 1)), (x + y) / 2],
        axis=2), 0, 255).astype(np.uint8)
    dec444 = decode_jpeg(encode_jpeg(img))
    assert dec444.shape == img.shape and _psnr(dec444, img) > 30
    dec420 = decode_jpeg(encode_jpeg(img, subsample=True))
    assert dec420.shape == img.shape and _psnr(dec420, img) > 27


def test_noise_and_odd_sizes():
    rng = np.random.RandomState(0)
    for shape, sub in [((17, 19, 3), False), ((19, 21, 3), True),
                       ((8, 8, 3), False), ((1, 1, 3), False)]:
        img = rng.randint(0, 256, shape, np.uint8)
        dec = decode_jpeg(encode_jpeg(img, subsample=sub))
        assert dec.shape == shape


def test_grayscale_roundtrip():
    # smooth gradient: high-frequency noise is (correctly) crushed by
    # the Annex-K quantizer, so PSNR floors only make sense on
    # low-frequency content
    img = (np.linspace(0, 255, 24)[None, :]
           * np.ones((16, 1))).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (16, 24, 1)
    assert _psnr(dec[:, :, 0], img) > 30


def test_luma_channel_tracks_brightness():
    """Cross-check against the color transform: a pure-red image must
    decode with R >> B (catches channel-order/YCbCr sign errors that a
    same-transform round trip cannot)."""
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0] = 200
    dec = decode_jpeg(encode_jpeg(img)).astype(float)
    assert dec[..., 0].mean() > 150
    assert dec[..., 2].mean() < 60


def test_non_baseline_rejected():
    img = np.full((8, 8, 3), 100, np.uint8)
    blob = bytearray(encode_jpeg(img))
    # flip SOF0 (0xC0) to SOF3 lossless (0xC3) — still unsupported
    # (SOF2 progressive became a real decode path in r7)
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_progressive_equals_baseline_exactly():
    """The progressive anchor: SOF2 scans (spectral selection +
    successive approximation) reconstruct the SAME quantized
    coefficients the baseline stream carries, so the decoded pixels
    must be bit-identical — across 4:4:4, 4:2:0, grayscale,
    non-multiple-of-8 dims, and restart intervals."""
    from dask_ml_spark.datapipe.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(7)
    cases = [((24, 33, 3), False, 0), ((24, 33, 3), True, 0),
             ((17, 19), False, 0), ((40, 40, 3), False, 3),
             ((40, 40, 3), True, 2)]
    for shape, sub, ri in cases:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(
            img, subsample=sub, restart_interval=ri))
        assert np.array_equal(base, prog), (shape, sub, ri)
    # smooth gradient: long EOB runs across blocks
    smooth = (np.add.outer(np.arange(40), np.arange(56)) * 2 % 256
              ).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(smooth)),
                          decode_jpeg(encode_jpeg_progressive(smooth)))


def test_progressive_uniform_analytic():
    """Uniform image decodes to exactly its DC-quantized value through
    the progressive path (DC-first at Al=1 + DC refinement), same
    analytic anchor the baseline decoder is pinned by."""
    from dask_ml_spark.datapipe.jpeg import encode_jpeg_progressive

    for v in (0, 77, 130, 255):
        img = np.full((16, 24), v, np.uint8)
        out = decode_jpeg(encode_jpeg_progressive(img))
        # DC-only: constant output, equal to the baseline decode of the
        # same coefficients, within the DC quant step of the input
        assert out.std() == 0.0
        assert np.array_equal(out, decode_jpeg(encode_jpeg(img)))
        assert abs(int(out[0, 0, 0]) - v) <= 3


def test_decode_image_features_stub_false_jpeg(spark):
    """Spark plumbing: baseline JPEGs decode for real inside
    mapInPandas and the features match a local decode oracle."""
    import pandas as pd

    from dask_ml_spark.datapipe.multimodal import (_decode_any,
                                                   _resize_nearest,
                                                   decode_image_features)

    rng = np.random.RandomState(5)
    imgs = {i: rng.randint(0, 256, (16, 12, 3), np.uint8) for i in range(3)}
    rows = [{"doc_id": i, "blob": bytearray(encode_jpeg(img))}
            for i, img in imgs.items()]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = decode_image_features(df, resize=(4, 4), stub=False).toPandas()
    assert len(out) == 3
    for _, r in out.iterrows():
        local = _decode_any(bytes(encode_jpeg(imgs[r.doc_id])))
        want = _resize_nearest(local, 4, 4).mean(axis=2).ravel()
        np.testing.assert_allclose(np.asarray(r.features), want)
    # progressive blobs flow through the same mapInPandas path and,
    # being the same quantized coefficients, yield identical features
    from dask_ml_spark.datapipe.jpeg import encode_jpeg_progressive

    prows = [{"doc_id": i, "blob": bytearray(encode_jpeg_progressive(img))}
             for i, img in imgs.items()]
    pout = decode_image_features(spark.createDataFrame(pd.DataFrame(prows)),
                                 resize=(4, 4), stub=False).toPandas()
    merged = out.merge(pout, on="doc_id", suffixes=("_b", "_p"))
    assert len(merged) == 3
    for _, r in merged.iterrows():
        np.testing.assert_array_equal(np.asarray(r.features_b),
                                      np.asarray(r.features_p))


def test_truncated_and_corrupt_inputs_fail_fast():
    """Malformed blobs must raise promptly — a decoder that hangs or
    spins on truncated entropy data would stall a whole mapInPandas
    task at scale."""
    import time

    from dask_ml_spark.datapipe.jpeg import encode_jpeg_progressive

    img = np.full((16, 16, 3), 90, np.uint8)
    blob = encode_jpeg(img)
    pblob = encode_jpeg_progressive(img)
    for data in (blob[: len(blob) // 2], blob[:20], blob[2:], b"\xff\xd8",
                 pblob[: len(pblob) // 2], pblob[:40]):
        t0 = time.time()
        with pytest.raises(Exception):
            decode_jpeg(data)
        assert time.time() - t0 < 2.0
    # bit corruption inside entropy data decodes to SOMETHING (JPEG has
    # no integrity check) or raises — either way, promptly
    corrupt = bytearray(blob)
    corrupt[len(blob) // 2] ^= 0xFF
    t0 = time.time()
    try:
        out = decode_jpeg(bytes(corrupt))
        assert out.shape == (16, 16, 3)
    except Exception:
        pass
    assert time.time() - t0 < 2.0
