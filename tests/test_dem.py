"""DEM altitude source: GeoTiffDEM sampling + the pipeline alt_getter hook
(the reference's srtm4 counterpart, ba_pipeline.py:158-172)."""

import numpy as np
import pytest

from sat_bundleadjust_tpu.utils import dem as dem_mod
from sat_bundleadjust_tpu.utils import geo as geo_utils
from sat_bundleadjust_tpu.utils.tiffwrite import write_georeferenced_raster_utm_bbox


@pytest.fixture()
def utm_dem(tmp_path):
    """A 100 m resolution UTM DEM whose altitude is a known linear ramp."""
    lon0, lat0 = 2.0, 48.0
    e0, n0 = geo_utils.utm_from_lonlat(np.array([lon0]), np.array([lat0]))
    e0, n0 = float(e0[0]) - 2000, float(n0[0]) - 2000
    res = 100.0
    utm_bbx = {"xmin": e0, "xmax": e0 + 4000, "ymin": n0, "ymax": n0 + 4000}
    h, w = geo_utils.utm_bbox_shape(utm_bbx, res)
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    # altitude = 100 + east/100 + north/100 relative to the bbox corner
    east = utm_bbx["xmin"] + jj * res
    north = utm_bbx["ymax"] - ii * res
    z = 100.0 + (east - e0) / 100.0 + (north - n0) / 100.0
    path = str(tmp_path / "dem.tif")
    write_georeferenced_raster_utm_bbox(path, z.astype(np.float32), utm_bbx,
                                        epsg=32631, resolution=res)
    return path, (lon0, lat0), (e0, n0)


def test_geotiffdem_bilinear(utm_dem):
    path, (lon0, lat0), (e0, n0) = utm_dem
    d = dem_mod.GeoTiffDEM(path)
    z = d.altitudes(lon0, lat0)
    e, n = geo_utils.utm_from_lonlat(np.array([lon0]), np.array([lat0]))
    expect = 100.0 + (float(e[0]) - e0) / 100.0 + (float(n[0]) - n0) / 100.0
    assert abs(float(z[0]) - expect) < 0.5  # bilinear on a linear ramp

    # outside the raster -> NaN
    z_out = d.altitudes(lon0 + 10.0, lat0)
    assert np.isnan(z_out[0])


def test_make_alt_getter_with_dem(utm_dem):
    from sat_bundleadjust_tpu.utils.demo import make_synthetic_rpc

    path, (lon0, lat0), _ = utm_dem
    rpc = make_synthetic_rpc(lon0=lon0, lat0=lat0)

    class Im:
        pass

    im = Im()
    im.rpc = rpc
    getter = dem_mod.make_alt_getter(dem_path=path)
    z = getter(im)
    assert np.isfinite(z) and 50 < z < 300

    # out-of-raster RPC center falls back to clamped alt_offset
    rpc2 = make_synthetic_rpc(lon0=lon0 + 10.0, lat0=lat0)
    im2 = Im()
    im2.rpc = rpc2
    z2 = getter(im2)
    assert z2 == float(np.clip(float(np.asarray(rpc2.alt_offset)), -400.0, 8800.0))


def test_make_alt_getter_none_without_sources():
    assert dem_mod.make_alt_getter() is None or dem_mod.srtm4_available()
