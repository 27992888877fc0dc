"""IO layer: TIFF tag parsing, image loading, ply round trip, json helpers."""

import datetime
import os

import numpy as np
import pytest

from sat_bundleadjust_tpu.utils import io as loader
from sat_bundleadjust_tpu.utils import tiffmeta


@pytest.fixture()
def tiff_with_tags(tmp_path):
    from PIL import Image
    from PIL.TiffImagePlugin import ImageFileDirectory_v2

    im = Image.fromarray((np.random.RandomState(0).rand(40, 60) * 255).astype(np.uint8))
    ifd = ImageFileDirectory_v2()
    ifd[306] = "2020:04:13 15:14:08"  # TIFFTAG_DATETIME
    path = str(tmp_path / "img.tif")
    im.save(path, tiffinfo=ifd)
    return path


def test_tiff_size_and_datetime(tiff_with_tags):
    assert tiffmeta.image_size_from_tiff(tiff_with_tags) == (40, 60)
    dt = tiffmeta.datetime_from_tiff(tiff_with_tags)
    assert dt == datetime.datetime(2020, 4, 13, 15, 14, 8)


def test_read_image_size_fallback_from_rpc(tmp_path):
    from sat_bundleadjust_tpu.utils.demo import make_synthetic_rpc

    rpc = make_synthetic_rpc(img_halfsize=(100.0, 50.0))
    h, w = loader.read_image_size(str(tmp_path / "missing.tif"), rpc=rpc)
    assert (h, w) == (101, 201)


def test_load_image_band_average_and_crop(tmp_path):
    from PIL import Image

    arr = np.zeros((30, 40, 3), dtype=np.uint8)
    arr[..., 0] = 30
    arr[..., 1] = 60
    arr[..., 2] = 90
    path = str(tmp_path / "rgb.tif")
    Image.fromarray(arr).save(path)
    im = loader.load_image(path)
    assert im.shape == (30, 40)
    assert abs(float(im.mean()) - 60.0) < 1e-6
    crop = loader.load_image(path, offset={"row0": 5, "col0": 10, "height": 10, "width": 20})
    assert crop.shape == (10, 20)


def test_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(1).randn(25, 3) * 100
    path = str(tmp_path / "cloud.ply")
    loader.write_point_cloud_ply(path, pts)
    back = loader.read_point_cloud_ply(path)
    np.testing.assert_allclose(back, pts, rtol=1e-6)


def test_equalization_range():
    rng = np.random.RandomState(2)
    im = rng.randn(50, 50) * 10 + 100
    eq = loader.custom_equalization(im)
    assert eq.min() >= 0.0 and eq.max() <= 255.0


def test_geojson_roundtrip(tmp_path):
    from sat_bundleadjust_tpu.utils.geo import geojson_polygon

    poly = geojson_polygon(np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]))
    path = str(tmp_path / "aoi.json")
    loader.save_geojson(path, poly)
    back = loader.load_geojson(path)
    np.testing.assert_allclose(
        np.array(back["coordinates"][0]), np.array(poly["coordinates"][0])
    )
