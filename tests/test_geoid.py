"""GeographicLib .pgm geoid grid loader + geoid_to_ellipsoid plumbing
(reference API: bundle_adjust/s2p/geographiclib.py:16-37)."""

import struct

import numpy as np
import pytest

from sat_bundleadjust_tpu.utils import geo as geo_utils
from sat_bundleadjust_tpu.utils.geoid import geoid_undulation, load_geoid_pgm


def _write_pgm(path, grid, offset=-108.0, scale=0.003):
    """Synthetic GeographicLib-style geoid pgm encoding the given grid."""
    h, w = grid.shape
    pix = np.round((grid - offset) / scale).astype(">u2")
    with open(path, "wb") as f:
        f.write(b"P5\n")
        f.write(b"# Geoid file in PGM format for the GeographicLib::Geoid class\n")
        f.write("# Offset {}\n".format(offset).encode())
        f.write("# Scale {}\n".format(scale).encode())
        f.write("{} {}\n65535\n".format(w, h).encode())
        f.write(pix.tobytes())


@pytest.fixture()
def pgm(tmp_path):
    # a smooth analytic "geoid": N(lat, lon) = 10 sin(lat) + 5 cos(lon) - 20
    h, w = 181, 361
    lat = np.linspace(90, -90, h)[:, None] * np.pi / 180
    lon = np.linspace(0, 360, w)[None, :] * np.pi / 180
    grid = 10 * np.sin(lat) + 5 * np.cos(lon) - 20 + 0 * (lat + lon)
    path = str(tmp_path / "egm96-60.pgm")
    _write_pgm(path, grid)
    return path, grid


def test_load_geoid_pgm(pgm):
    path, grid = pgm
    g = load_geoid_pgm(path)
    assert g.shape == grid.shape
    np.testing.assert_allclose(g, grid, atol=0.003)  # quantization only


def test_geoid_undulation_bilinear(pgm):
    path, _ = pgm
    for lat, lon in ((45.0, 10.0), (-30.5, 123.25), (11.02, -72.71)):
        n = geoid_undulation(lat, lon, grid_path=path)
        expect = 10 * np.sin(np.radians(lat)) + 5 * np.cos(np.radians(lon % 360)) - 20
        assert abs(float(n[0]) - expect) < 0.05


def test_geoid_to_ellipsoid(pgm, monkeypatch):
    path, _ = pgm
    monkeypatch.setenv("SATBA_GEOID_PGM", path)
    z = geo_utils.geoid_to_ellipsoid(45.0, 10.0, 100.0)
    expect = 100.0 + 10 * np.sin(np.radians(45.0)) + 5 * np.cos(np.radians(10.0)) - 20
    assert abs(float(np.asarray(z)[0]) - expect) < 0.05


def test_missing_grid_raises(monkeypatch):
    monkeypatch.delenv("SATBA_GEOID_PGM", raising=False)
    with pytest.raises(FileNotFoundError):
        geoid_undulation(0.0, 0.0, grid_path="/nonexistent/egm96.pgm")
