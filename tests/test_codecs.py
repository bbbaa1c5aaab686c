import numpy as np
import pytest

from simple_osm_queries_spark.sources import codecs
from simple_osm_queries_spark.sources.datagen import image_pixels


@pytest.mark.parametrize("i", [0, 1, 7, 123])
def test_png_roundtrip_exact(i):
    px = image_pixels(i)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)


@pytest.mark.parametrize("i", [0, 2, 55])
def test_bmp_roundtrip_exact(i):
    px = image_pixels(i)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)


@pytest.mark.parametrize("i", [1, 4, 100])
def test_jpeg_lossy_psnr(i):
    """input_hint invariant: decoded pixels allclose, PSNR >= 40 dB for lossy."""
    px = image_pixels(i)
    out = codecs.decode_jpeg(codecs.encode_jpeg(px))
    assert out.shape == px.shape
    assert codecs.psnr(px, out) >= 40.0


def test_dispatch_matches_fmt_cycle():
    for i, fmt in [(0, "png"), (1, "jpeg"), (2, "bmp")]:
        px = image_pixels(i)
        data = codecs.encode_image(px, fmt)
        out = codecs.decode_image(data, fmt)
        if fmt == "jpeg":
            assert codecs.psnr(px, out) >= 40.0
        else:
            assert np.array_equal(out, px)
