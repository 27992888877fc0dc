"""Notebook visualization helpers (side layer).

Covers the reference's bundle_adjust/vistools.py:15-586 (ipyleaflet map
widgets and image galleries for notebooks — not on the main pipeline path,
SURVEY.md layer table). ipyleaflet/ipywidgets are not part of this
environment's base image, so the map widgets degrade gracefully: when
ipyleaflet is importable the same clickable/overlay maps are produced;
otherwise a matplotlib rendering of the footprints is returned."""

import numpy as np


def _have_ipyleaflet():
    try:
        import ipyleaflet  # noqa: F401

        return True
    except ImportError:
        return False


def clickablemap(center=(0.0, 0.0), zoom=10):
    """Interactive map widget (reference: vistools.py:15-111) or a
    matplotlib fallback handle."""
    if _have_ipyleaflet():
        from ipyleaflet import Map, basemaps

        return Map(center=list(center), zoom=zoom, basemap=basemaps.OpenStreetMap.Mapnik)
    return _StaticMap(center, zoom)


def overlaymap(aoi_lonlat_list, center=None, zoom=12):
    """Map with footprint overlays (reference: vistools.py:114-166)."""
    if center is None and aoi_lonlat_list:
        center = list(reversed(aoi_lonlat_list[0]["center"]))
    m = clickablemap(center=center or (0.0, 0.0), zoom=zoom)
    if _have_ipyleaflet():
        from ipyleaflet import Polygon as LeafletPolygon

        for aoi in aoi_lonlat_list:
            ring = [(lat, lon) for lon, lat in aoi["coordinates"][0]]
            m.add_layer(LeafletPolygon(locations=ring, color="blue", fill_opacity=0.1))
        return m
    for aoi in aoi_lonlat_list:
        m.add_polygon(np.array(aoi["coordinates"][0]))
    return m


class _StaticMap:
    """matplotlib fallback for the map widgets."""

    def __init__(self, center, zoom):
        self.center = center
        self.zoom = zoom
        self.polygons = []

    def add_polygon(self, lonlat_ring):
        self.polygons.append(np.asarray(lonlat_ring))

    # API-compat no-ops for common ipyleaflet calls
    def add_layer(self, *_, **__):
        pass

    def show(self, path=None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        ax.axis("equal")
        for ring in self.polygons:
            closed = np.vstack([ring, ring[:1]])
            ax.plot(closed[:, 0], closed[:, 1], color="blue")
        ax.set_xlabel("lon")
        ax.set_ylabel("lat")
        if path:
            fig.savefig(path, bbox_inches="tight")
            plt.close(fig)
            return path
        return fig


def display_gallery(images, titles=None, cols=4, path=None):
    """Image thumbnail gallery (reference: vistools.py:413-470), rendered
    with matplotlib instead of HTML widgets."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            ax.imshow(np.asarray(images[i]), cmap="gray")
            if titles:
                ax.set_title(str(titles[i]), fontsize=8)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
