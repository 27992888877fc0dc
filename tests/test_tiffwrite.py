"""GeoTIFF writer: raster round trip, geo keys, in-place RPC tag update,
and the .tif variant of the reprojection-error heatmap.

Reference behavior covered: loader.write_georeferenced_raster_utm_bbox
(loader.py:430-453), ba_utils.update_geotiff_rpc (ba_utils.py:42-48),
ba_core.save_heatmap_of_reprojection_error tif branch (ba_core.py:516-519).
"""

import numpy as np
import pytest

from sat_bundleadjust_tpu.utils import tiffmeta, tiffwrite


def _raster(h=13, w=17, seed=0):
    r = np.random.RandomState(seed).rand(h, w).astype(np.float32) * 10
    r[0, 0] = np.nan
    return r


def test_write_tiff_pil_roundtrip(tmp_path):
    from PIL import Image

    path = str(tmp_path / "r.tif")
    r = _raster()
    tiffwrite.write_tiff(path, r)
    back = np.asarray(Image.open(path))
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back, r)


def test_write_georeferenced_raster(tmp_path):
    path = str(tmp_path / "geo.tif")
    utm_bbx = {"xmin": 300000.0, "xmax": 300016.0, "ymin": 4000000.0, "ymax": 4000012.0}
    res = 1.0
    h, w = 13, 17  # utm_bbox_shape(utm_bbx, 1.0)
    r = _raster(h, w)
    tiffwrite.write_georeferenced_raster_utm_bbox(path, r, utm_bbx, epsg=32631, resolution=res)

    tags = tiffmeta.read_tiff_tags(
        path, wanted=(256, 257, 33550, 33922, 34735, 42113)
    )
    assert tags[256] == w and tags[257] == h
    assert tags[33550][:2] == [1.0, 1.0]  # pixel scale
    # tiepoint: raster (0,0) -> (west, north)
    assert tags[33922][3:5] == [300000.0, 4000012.0]
    geokeys = tags[34735]
    # ProjectedCSTypeGeoKey carries the epsg
    idx = geokeys.index(3072)
    assert geokeys[idx + 3] == 32631
    assert tags[42113] == "nan"

    from PIL import Image

    np.testing.assert_array_equal(np.asarray(Image.open(path)), r)


def _pil_tiff(tmp_path, name="img.tif", dtype=np.uint8, with_datetime=True):
    from PIL import Image
    from PIL.TiffImagePlugin import ImageFileDirectory_v2

    arr = (np.random.RandomState(1).rand(20, 30) * 255).astype(dtype)
    ifd = ImageFileDirectory_v2()
    if with_datetime:
        ifd[306] = "2021:06:01 10:00:00"
    path = str(tmp_path / name)
    Image.fromarray(arr).save(path, tiffinfo=ifd)
    return path, arr


def test_update_geotiff_rpc_roundtrip(tmp_path):
    from sat_bundleadjust_tpu.utils.demo import make_synthetic_rpc

    path, arr = _pil_tiff(tmp_path)
    rpc = make_synthetic_rpc()
    tiffwrite.update_geotiff_rpc(path, rpc)

    back = tiffmeta.rpc_from_tiff(path)
    assert back is not None
    r = rpc.to_numpy()
    for field in ("row_offset", "col_offset", "lat_offset", "lon_offset",
                  "alt_offset", "row_scale", "col_scale", "lat_scale",
                  "lon_scale", "alt_scale", "line_num", "line_den",
                  "samp_num", "samp_den"):
        np.testing.assert_allclose(
            np.asarray(getattr(back, field)), np.asarray(getattr(r, field)),
            rtol=0, atol=0, err_msg=field,
        )

    # pixels and other tags survive the rewrite
    from PIL import Image

    np.testing.assert_array_equal(np.asarray(Image.open(path)), arr)
    import datetime

    assert tiffmeta.datetime_from_tiff(path) == datetime.datetime(2021, 6, 1, 10, 0, 0)


def test_update_geotiff_rpc_replaces_existing(tmp_path):
    from sat_bundleadjust_tpu.utils.demo import make_synthetic_rpc

    path, _ = _pil_tiff(tmp_path)
    rpc1 = make_synthetic_rpc()
    rpc2 = rpc1.to_numpy()._replace(row_offset=np.float64(999.0))
    tiffwrite.update_geotiff_rpc(path, rpc1)
    tiffwrite.update_geotiff_rpc(path, rpc2)
    back = tiffmeta.rpc_from_tiff(path)
    assert float(np.asarray(back.row_offset)) == 999.0
    # still exactly one IFD pass: size should not balloon
    import os

    assert os.path.getsize(path) < 20 * 30 + 4000


def test_heatmap_tif_output(tmp_path):
    """The .tif heatmap path writes a georeferenced error surface."""
    from types import SimpleNamespace

    from sat_bundleadjust_tpu.models import ellipsoid
    from sat_bundleadjust_tpu.utils import geo as geo_utils
    from sat_bundleadjust_tpu.utils.viz import save_heatmap_of_reprojection_error

    rng = np.random.RandomState(0)
    n_pts, n_obs = 40, 80
    lon0, lat0 = 2.0, 48.0
    lons = lon0 + rng.rand(n_pts) * 0.01
    lats = lat0 + rng.rand(n_pts) * 0.01
    x, y, z = ellipsoid.latlon_to_ecef_np(lats, lons, np.zeros(n_pts))
    pts3d = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], axis=1)
    p = SimpleNamespace(
        pts_ind=rng.randint(0, n_pts, n_obs),
        n_pts=n_pts,
        pts3d=pts3d,
        pts3d_ba=pts3d,
    )
    err = rng.rand(n_obs)
    corners = np.array(
        [[lon0, lat0], [lon0 + 0.01, lat0], [lon0 + 0.01, lat0 + 0.01], [lon0, lat0 + 0.01]]
    )
    footprint = geo_utils.geojson_polygon(corners)
    out = str(tmp_path / "err.tif")
    save_heatmap_of_reprojection_error(out, p, err, [footprint], smooth=2)

    tags = tiffmeta.read_tiff_tags(out, wanted=(256, 257, 34735))
    assert 256 in tags and 34735 in tags
    from PIL import Image

    surface = np.asarray(Image.open(out))
    assert surface.dtype == np.float32
    assert np.isfinite(surface).all()
    assert surface.max() <= err.max() + 1e-3
