"""Real pixel path for multimodal (r4 verdict item 4): the stdlib
PPM/PGM/BMP codec, and MediaFeatureExtractor / MediaResizer with
decoder="real" exercised through actual Ray actor-pool stages."""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from datacapsule_ray.functions.imagecodec import (
    ImageDecodeError, decode_bmp, decode_image, decode_ppm, encode_ppm,
    gray_luma, resize_nearest)
from datacapsule_ray.functions import multimodal as mm


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _bmp_bytes(px: np.ndarray, bottom_up=True, bpp=24) -> bytes:
    """Independent minimal BMP writer (the decoder must not be checked
    against itself)."""
    h, w = px.shape[:2]
    nb = bpp // 8
    stride = ((w * nb + 3) // 4) * 4
    rows = []
    ordered = px[::-1] if bottom_up else px
    for r in ordered:
        row = bytearray()
        for p in r:
            row += bytes([p[2], p[1], p[0]] + ([0] if nb == 4 else []))
        row += b"\0" * (stride - len(row))
        rows.append(bytes(row))
    raster = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h if bottom_up else -h,
                       1, bpp, 0, len(raster), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(raster), 0, 0, 54)
    return header + info + raster


# --- codec ---------------------------------------------------------------------

def test_ppm_round_trip():
    px = _img(7, 5, seed=3)
    assert np.array_equal(decode_image(encode_ppm(px)), px)


def test_ppm_header_comments_and_whitespace():
    px = _img(3, 2, seed=4)
    buf = b"P6 # a comment\n# another\n  3\t2\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(buf), px)


def test_pgm_decodes_to_replicated_gray():
    g = np.arange(6, dtype=np.uint8).reshape(2, 3)
    buf = b"P5\n3 2\n255\n" + g.tobytes()
    px = decode_image(buf)
    assert px.shape == (2, 3, 3)
    assert np.array_equal(px[:, :, 0], g)
    assert np.array_equal(px[:, :, 1], g)


@pytest.mark.parametrize("bottom_up", [True, False])
@pytest.mark.parametrize("bpp", [24, 32])
def test_bmp_decode_against_independent_writer(bottom_up, bpp):
    px = _img(5, 4, seed=9)  # w=5 → 24-bit stride padding exercised
    assert np.array_equal(decode_bmp(_bmp_bytes(px, bottom_up, bpp)), px)


def test_decode_rejects_garbage():
    for bad in (b"", b"JFIF....", b"P6\n-1 2\n255\nxxx",
                b"BM" + b"\0" * 20, b"P6\n2 2\n255\nab"):
        with pytest.raises(ImageDecodeError):
            decode_image(bad)


def test_resize_nearest_integer_rule():
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_nearest(px, 2, 2)
    # source index = (i * 4) // 2 → rows/cols 0 and 2
    assert np.array_equal(out, px[[0, 2]][:, [0, 2]])
    up = resize_nearest(px, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], px)  # (2i*4)//8 == i


def test_gray_luma_exact():
    px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], dtype=np.uint8)
    assert gray_luma(px).tolist() == [[(299 * 255) // 1000,
                                       (587 * 255) // 1000,
                                       (114 * 255) // 1000]]


# --- real pixel path through Ray -----------------------------------------------

def _media_ds(rows):
    return rd.from_arrow(pa.table({
        "media_ref": pa.array([r[0] for r in rows]),
        "kind": pa.array(["image"] * len(rows)),
        "payload": pa.array([r[1] for r in rows], type=pa.binary()),
        "meta": pa.array([r[2] for r in rows], type=mm.MEDIA_SCHEMA.field("meta").type),
    }, schema=mm.MEDIA_SCHEMA))


def test_real_feature_extractor_on_decoded_pixels():
    a, b = _img(16, 12, seed=1), _img(16, 12, seed=2)
    ds = _media_ds([
        ("img://a", encode_ppm(a), {"width": 16, "height": 12, "duration_ms": 0}),
        ("img://b", _bmp_bytes(b), {"width": 16, "height": 12, "duration_ms": 0}),
        ("img://corrupt", b"JFIF not decodable", {"width": 1, "height": 1, "duration_ms": 0}),
    ])
    out = (mm.extract_media_features(ds, out_dim=16, decoder="real")
           .to_pandas().set_index("media_ref"))
    fa = np.array(out.loc["img://a", "feature"])
    fb = np.array(out.loc["img://b", "feature"])
    fc = np.array(out.loc["img://corrupt", "feature"])
    assert abs(np.linalg.norm(fa) - 1.0) < 1e-5
    assert abs(np.linalg.norm(fb) - 1.0) < 1e-5
    assert not np.allclose(fa, fb)  # different pixels → different features
    assert np.linalg.norm(fc) == 0.0  # decode failure → zero vector
    # the feature is a pure function of the DECODED pixels, not the
    # bytes: the same image in PPM and BMP must featurize identically
    out2 = (mm.extract_media_features(
        _media_ds([("img://a2", _bmp_bytes(a),
                    {"width": 16, "height": 12, "duration_ms": 0})]),
        out_dim=16, decoder="real").to_pandas())
    assert np.allclose(np.array(out2["feature"].iloc[0]), fa, atol=1e-6)


def test_real_resizer_resamples_actual_pixels():
    px = _img(64, 48, seed=7)
    ds = _media_ds([
        ("img://big", encode_ppm(px), {"width": 999, "height": 1, "duration_ms": 0}),
        ("img://corrupt", b"\x89PNG not supported", {"width": 40, "height": 20, "duration_ms": 0}),
    ])
    out = (mm.resize_media(ds, max_w=16, max_h=16, decoder="real")
           .to_pandas().set_index("media_ref"))
    row = out.loc["img://big"]
    # decoded dims (64x48) override the lying metadata on the real path
    assert (row["in_w"], row["in_h"]) == (64, 48)
    assert (row["out_w"], row["out_h"]) == (16, 12)  # width binds
    got = decode_image(row["payload"])
    assert np.array_equal(got, resize_nearest(px, 16, 12))
    bad = out.loc["img://corrupt"]
    assert bad["payload"] is None  # errors-become-data
    assert (bad["in_w"], bad["in_h"]) == (40, 20)  # meta-planned geometry
    assert (bad["out_w"], bad["out_h"]) == (16, 8)


def test_real_flat_image_feature_is_e0():
    px = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = (mm.extract_media_features(
        _media_ds([("img://flat", encode_ppm(px),
                    {"width": 8, "height": 8, "duration_ms": 0})]),
        out_dim=9, decoder="real").to_pandas())
    f = np.array(out["feature"].iloc[0])
    assert f[0] == 1.0 and np.linalg.norm(f) == 1.0